#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative
queries, so the scale claims in SCALING.md can be checked against the
actual Catalyst output without running anything.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PICKS = [
    ("q01_pricing_summary",
     "filter pushed to the scan (PushedFilters), pruned ReadSchema, "
     "map-side partial HashAggregate before the single Exchange"),
    ("q03_region_revenue",
     "all four dimension joins are BroadcastHashJoin; one Exchange total "
     "(the final aggregation)"),
    ("q05_latest_order_per_customer",
     "WindowGroupLimit: per-partition partial top-1 before the shuffle"),
    ("q84_line_dedup",
     "duplicate-line set feeds a broadcast anti-join; order restored by "
     "array_sort over (pos, line) structs"),
    ("q86_zorder_cells",
     "Morton interleave is pure codegen arithmetic over the scan; one "
     "Exchange for the cell aggregate"),
    ("q88_profile_columns",
     "every per-column metric in ONE aggregation pass over one scan"),
    ("q101_unigram_logprob",
     "corpus (total, vocab) stats enter as a broadcast 1-row aggregate; "
     "both count passes partial-aggregate map-side"),
    ("q102_duplicated_spans",
     "gram frequency shuffles 8-byte md5 keys, the hot-gram filter is a "
     "LeftSemi join, island-merge windows are per-doc only"),
    ("q109_html_extract",
     "the whole strip_html chain is one codegen projection over the "
     "scan — zero Exchange"),
    ("q110_domain_curation",
     "census and quota share the domain-keyed exchange family; the "
     "quota window compiles to WindowGroupLimit"),
    ("q111_lm_perplexity",
     "1-row (N, V) stats and tercile thresholds join as broadcast "
     "nested-loop; vocabulary tables BroadcastHashJoin under AQE; no "
     "ntile/global sort"),
    ("q117_prefix_jaccard_pairs",
     "df-ordered prefix tokens feed the only equi-join; exact verify "
     "runs on candidates, never all pairs"),
    ("q120_waiting_suppliers",
     "both correlated subqueries collapse into ONE per-order aggregate "
     "joined back; no nested-loop anti-join"),
    ("q40_shipment_pipeline_full",
     "the whole T6/T7 narrative+content transform is a single Project "
     "pipeline over ONE parquet scan; the only Exchange is the final "
     "document-numbering window"),
    ("q116_pagerank",
     "edge/degree relations enter as checkpointed ExistingRDD scans on "
     "the STREAMING side of BroadcastHashJoins (never shuffled); the "
     "only shuffle Exchanges are the per-iteration contribution "
     "partial-sum HashAggregates; no SortMergeJoin anywhere"),
    ("q118_web_pipeline",
     "every funnel stage reads the previous stage's checkpoint "
     "(Scan ExistingRDD), so the union of per-stage counts re-scans "
     "parquet at most once (the raw-input count); the domain quota "
     "compiles to WindowGroupLimit"),
    ("q133_kmeans",
     "the final assignment is ONE parquet scan into a pure codegen "
     "Project (centroids are k*d literals at this k) — zero Exchange, "
     "zero join; per-iteration update shuffles only (cluster, dim) "
     "partial averages (not in this final-assignment plan)"),
    ("q142_bloom_membership",
     "build side: two aggregates into the one-row bitmap; probe side: "
     "BroadcastNestedLoopJoin of that row onto the customer scan + "
     "pure bitwise Project — the probe relation never shuffles"),
    ("q143_sequence_packing",
     "the document relation flows through a window PARTITIONED by "
     "prefix bucket (hashpartitioning(__b)); the only SinglePartition "
     "exchange carries the per-bucket totals (rows = n_buckets), "
     "which broadcast-join back — no global-sort window over data"),
    ("q155_ivfpq_codes",
     "IVF-PQ encoding (cell assignment + residual + m code argmins) is "
     "a single pure-Project pipeline over ONE parquet scan — zero "
     "Exchange, zero join; both quantizer levels ride as literals, so "
     "at scale the encoded table writes straight out bucketed by cell"),
    ("q156_ivfpq_adc",
     "IVFADC search: the nprobe cell predicate is an in-plan filter on "
     "the encode projection (partition-pruning when the table is "
     "stored bucketed by cell), per-cell lookup tables are literals, "
     "and the cut is TakeOrderedAndProject — no join, no global sort"),
    ("q158_rrf_fusion",
     "RRF fusion: contributions union into one groupBy-sum and the "
     "fused cut is TakeOrderedAndProject; the dense ranker's per-query "
     "top-k compiles to WindowGroupLimit — no global Sort of an uncut "
     "relation anywhere"),
    ("q159_corpus_divergence",
     "corpus divergence: two token-count aggregates full-outer-merge "
     "on token; the scalar stats row joins back as a one-row "
     "BroadcastNestedLoopJoin; the report cut is TakeOrderedAndProject "
     "over the vocab-sized frame — never a global window"),
    ("q166_interval_overlap",
     "interval-overlap join: both interval sets explode into fixed-"
     "width bins and hash-equi-join on the bin id (the overlap "
     "predicate is a post-join filter) — no CartesianProduct, no "
     "nested loop; multi-bin pairs dedup by key"),
    ("q167_traindata_export",
     "training-data export: each stage reads the previous stage's "
     "checkpoint (Scan ExistingRDD); packing keeps the q143 shape "
     "(the only SinglePartition exchange carries per-bucket totals); "
     "the shard window partitions by the md5 coin, never a global "
     "sort"),
    ("q172_constraint_audit",
     "constraint audit: the four row-local rules share ONE "
     "conditional-sum HashAggregate over one scan; unique is a "
     "keys-only groupBy; the FK check is a single anti-join of "
     "lineitem keys against deduplicated order keys"),
    ("q137_fuzzy_decontamination",
     "the benchmark side enters ONLY as one (shingle -> [bids], df) "
     "aggregate broadcast into the candidate join; the hot-shingle "
     "cap is an in-plan filter on df (no LeftAnti, no per-call count "
     "job — its census is memoized per benchmark plan, round 6); the "
     "corpus side is exploded once and its shuffles are the bounded "
     "candidate-pair and per-doc aggregates; the per-doc LeftOuter "
     "score join-back broadcasts too — no SortMergeJoin anywhere, "
     "and the corpus never self-joins"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from jsonl_dataingestion_pipeline_spark import get_spark

    spark = get_spark(
        app_name="plans",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries_full()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    out = [
        "# PLANS — formatted physical plans (generated by tools/dump_plans.py)",
        "",
        f"Source: `{sf_dir}`. Regenerate after plan-affecting changes:",
        "`python tools/dump_plans.py`. The operator-tree sections below are",
        "the evidence for SCALING.md's claims; `tests/test_plans.py` asserts",
        "the load-bearing properties so they cannot silently regress.",
        "",
    ]
    for name, why in PICKS:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jmode)
        blocks = plan.split("\n\n")
        tree = blocks[0]
        scans = [b for b in blocks[1:] if "Scan parquet" in b.split("\n", 1)[0]]
        body = tree.rstrip()
        if scans:
            body += "\n\n" + "\n\n".join(b.rstrip() for b in scans)
        out += [f"## {name}", "", f"*What to look for:* {why}", "",
                "```", body, "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(PICKS)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

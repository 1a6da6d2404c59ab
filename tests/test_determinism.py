"""Determinism + audit-quality gates for the ANN battery family
(VERDICT r6 items 1-2).

Round 6's one red driver row (q28_ann_topk) was a float-boundary
flip: a shuffle-order-dependent double sum landing within ulps of a
rounding-grid boundary printed differently between the driver's Spark
run and the DuckDB oracle, and no fixed local config reproduced it.
The fix is structural — integer-exact means/sums in kmeans/PQ/PCA
training and integer micro-unit outputs — and these tests enforce it:

- the STRESS test re-runs each rebalanced ANN battery under several
  ``spark.sql.shuffle.partitions`` settings with the trained-quantizer
  cache cleared between runs, and asserts bit-identical multisets —
  the run-to-run variance the driver box exhibited and a fixed-config
  pass cannot rule out;
- the FLOOR tests pin the two recall audits (q170/q171) at their
  measured operating bands minus a noise margin (VERDICT r7 item #4:
  a 2x recall regression must redden a test, not hide under a 0.5
  floor) on
  their planted corpora, so an LSH-banding or ADC-indexing bug can no
  longer hide behind an audit that matches the oracle at recall 0.0
  (measured healthy points: q170 ~0.91-0.94, q171 1.0).
"""
from __future__ import annotations

import importlib.util

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def em():
    spec = importlib.util.spec_from_file_location(
        "entry_determinism", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _collect_multiset(df):
    return sorted(tuple(row) for row in df.collect())


@pytest.mark.parametrize(
    "battery",
    ["q28_ann_topk", "q38_cosine_verify", "q39_embedding_neardup"],
)
def test_ann_battery_multiset_stable_across_shuffle_layouts(
    spark, em, battery
):
    """Every shuffle layout must produce the identical multiset: the
    integer-exact training means and micro-unit outputs make the
    result independent of partition count by construction."""
    fn = em.queries()[battery]
    results = []
    for parts in ("3", "17", "64"):
        # force a different shuffle layout AND retrain from scratch —
        # cached codebooks would hide training-order sensitivity
        em._TRAINED_CACHE.clear()
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            results.append(_collect_multiset(fn(spark, SF)))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert results[0] == results[1] == results[2], (
        f"{battery}: multiset differs across shuffle layouts"
    )


def test_q170_lsh_recall_audit_floor(spark, em):
    """The LSH audit must certify real retrieval on the planted
    corpus: recall >= 0.85 (SCALING.md measured band 0.91-0.94 minus
    noise margin) and exact/approx non-empty. An empty approximate
    side now reads precision 0, never 1."""
    row = em.q170_lsh_recall_audit(spark, SF).collect()[0]
    assert row.audit_exact > 0
    assert row.audit_approx > 0
    assert row.audit_recall_u >= 850000, row
    assert row.audit_precision_u == 1000000, row  # verify step is exact


def test_q171_ann_recall_audit_floor(spark, em):
    """The ANN audit must retrieve the planted near-neighbors:
    recall >= 0.9 (SCALING.md measured 1.0 at x1 and x10, minus noise
    margin). A broken ADC LUT / cell filter scores ~0 here — the bug
    class the r6 audit could not see."""
    em._TRAINED_CACHE.clear()
    row = em.q171_ann_recall_audit(spark, SF).collect()[0]
    assert row.ann_k == 10
    assert row.ann_recall_u >= 900000, row


def test_q174_split_never_straddles_neardup_pairs(spark, em):
    """The leakage-safe split's contract: assignment is by near-dup
    CLUSTER, so no near-dup pair may straddle splits — leak_pairs must
    be 0, and the split must cover the whole 300-id audit corpus."""
    rows = em.q174_leakage_safe_split(spark, SF).collect()
    assert rows and all(r.leak_pairs == 0 for r in rows)
    assert sum(r.n_docs for r in rows) == 300

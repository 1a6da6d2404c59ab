#!/usr/bin/env python
"""Cross-process determinism check: run a battery set in THIS process
under an arbitrary (cores, shuffle-partitions) config and emit one
md5 digest of the sorted result multiset per battery. Two invocations
with different configs must print identical digests — the cross-JVM
half of the determinism contract (SCALING.md), covering what the
in-session stress test (tests/test_determinism.py) cannot: a fresh
JVM, different core count, different input-split planning.

    python tools/cross_config_digest.py 8 13  /tmp/a.json
    python tools/cross_config_digest.py 32 200 /tmp/b.json
    diff <(jq -S . /tmp/a.json) <(jq -S . /tmp/b.json)
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATTERIES = (
    "q28_ann_topk", "q38_cosine_verify", "q39_embedding_neardup",
    "q25_ngram_jaccard_pairs", "q51_neardup_clusters_battery",
    "q53_sampling_suite", "q20_doc_quality", "q60_text_ranking",
    # round 8: classifier training (q177 leg rides q20, already above);
    # WARC census + unigram DP census
    "q33_text_extract_battery", "q19_corpus_stats",
    # round 8 cont.: PSI drift (q188) rides q88; chat/SFT (q184),
    # loss-mask spans (q189), vocab (q186), curriculum (q185) and rank
    # metrics (q187) ride the batteries above
    "q88_profile_battery",
    # round 9: substring-dedup spans + removal (q192/q193) — window
    # islands + per-fp keeper election must be layout-independent;
    # q191's zlib decision and q194's script argmax ride q20 above
    "q23_dedup_stats",
)


def main() -> int:
    cores, parts = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "/dev/stdout"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as em
    from jsonl_dataingestion_pipeline_spark import get_spark

    spark = get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=int(parts),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    digests = {}
    for name in BATTERIES:
        rows = sorted(
            repr(tuple(r)) for r in qs[name](spark, sf_dir).collect()
        )
        digests[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
        print(f"# {name}: {digests[name]}", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(digests, f, indent=0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

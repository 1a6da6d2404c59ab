"""Bloom-filter membership: exactness of misses, NULL handling, FPR
sanity, zero-shuffle probe plan."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.membership import (
    bloom_build,
    bloom_probe,
)


def test_bloom_no_false_negatives_and_bitmap_shape(spark):
    members = spark.range(0, 500).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=4096, k=3)
    row = bloom.collect()[0]
    assert len(row.bitmap) == 4096 // 64
    probed = bloom_probe(
        members, "v", bloom, m_bits=4096, k=3
    ).collect()
    assert all(r.maybe_member for r in probed)  # never a false negative


def test_bloom_misses_are_exact_and_fpr_small(spark):
    members = spark.range(0, 200).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=1 << 14, k=5)
    outside = spark.range(10_000, 12_000).select(F.col("id").alias("v"))
    probed = bloom_probe(outside, "v", bloom, m_bits=1 << 14, k=5).collect()
    fp = sum(1 for r in probed if r.maybe_member)
    # kn/m = 0.061 -> FPR ~ (0.059)^5 ~ 7e-7; allow generous slack
    assert fp <= 3


def test_bloom_null_probes_to_null_and_build_skips_null(spark):
    members = spark.createDataFrame(
        [(1,), (2,), (None,)], "v long"
    )
    bloom = bloom_build(members, "v", m_bits=1024, k=2)
    probe = spark.createDataFrame([(1,), (None,)], "v long")
    got = {r.v: r.maybe_member for r in bloom_probe(
        probe, "v", bloom, m_bits=1024, k=2
    ).collect()}
    assert got[1] is True
    assert got[None] is None


def test_bloom_probe_plan_is_broadcast_only(spark):
    """The probe side must not shuffle: one BroadcastNestedLoopJoin
    (the one-row bitmap) and zero hash-partition Exchanges."""
    members = spark.range(0, 100).select(F.col("id").alias("v"))
    bloom = bloom_build(members, "v", m_bits=2048, k=3)
    probe = spark.range(0, 1000).select(F.col("id").alias("v"))
    out = bloom_probe(probe, "v", bloom, m_bits=2048, k=3)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree, tree
    # the only Exchanges sit on the BUILD side (the tiny word aggregate
    # and the 1-row map assembly), never on the probe relation: walk the
    # tree and require every Exchange to be above an aggregate
    lines = tree.splitlines()
    for i, line in enumerate(lines):
        node = line.split("- ")[-1]
        if node.startswith("Exchange hashpartitioning"):
            child = lines[i + 1].split("- ")[-1]
            assert child.startswith(("HashAggregate", "ObjectHashAggregate",
                                     "SortAggregate")), tree

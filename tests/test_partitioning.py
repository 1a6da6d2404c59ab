"""Skew-salting and bucketed co-located join tests."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.partitioning import (
    repartition_for_output,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key + a long tail
    large = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 7, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (17, "cold17")], "k long, name string"
    )
    plain = large.join(small, "k").groupBy("name").count()
    salted = salted_join(large, small, "k").groupBy("name").count()
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_salted_join_left(spark):
    large = spark.range(0, 100).select((F.col("id") % 3).alias("k"), "id")
    small = spark.createDataFrame([(0, "zero")], "k long, name string")
    out = salted_join(large, small, "k", how="left")
    assert out.count() == 100
    assert out.filter(F.col("name").isNull()).count() == 66  # k in {1,2}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bkt_a_{suffix}", f"bkt_b_{suffix}"
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, ta, ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(b, tb, ["k"], num_buckets=8, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucketed distribution is used
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan  # no shuffle
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE {ta}")
        spark.sql(f"DROP TABLE {tb}")


def test_repartition_for_output(spark):
    df = spark.range(0, 1000).select(F.col("id"), F.lit("x" * 100).alias("pad"))
    out = repartition_for_output(df, target_bytes=20_000)
    assert out.rdd.getNumPartitions() >= 5
    assert out.count() == 1000


def test_zorder_key_rejects_sign_bit_overflow(spark):
    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.partitioning import zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key([F.col(c) for c in ("a", "b", "c", "d")], bits=16)
    # 4 dims fit at bits=15 (60 bits)
    zorder_key([F.col(c) for c in ("a", "b", "c", "d")], bits=15)


def test_shuffle_shards_is_a_permutation(spark):
    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.partitioning import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = shuffle_shards(df, "doc_id", n_shards=8, seed=1).collect()
    assert len(out) == 200
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense ranks
    # deterministic across runs / repartitionings
    again = shuffle_shards(
        df.repartition(7), "doc_id", n_shards=8, seed=1
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # different seed -> different permutation (epoch reshuffle)
    other = shuffle_shards(df, "doc_id", n_shards=8, seed=2).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    with pytest.raises(ValueError):
        shuffle_shards(out and df.withColumn("shard", df.doc_id) or df,
                       "doc_id", n_shards=8)

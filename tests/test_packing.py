"""Sequence packing: two-phase prefix sum equals the naive global
window; empty docs occupy no sequence; the data never passes through a
single-partition window."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.packing import (
    pack_sequences,
)


def _naive(rows, seq_len):
    rows = sorted(rows)
    off = 0
    out = {}
    for i, n in rows:
        if n > 0:
            out[i] = (n, off, off // seq_len, (off + n - 1) // seq_len,
                      (off + n - 1) // seq_len - off // seq_len + 1)
        else:
            out[i] = (n, off, None, None, 0)
        off += n
    return out


def test_pack_matches_naive_across_buckets_and_seq_boundaries(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice([0, 3, 17, 100, 511, 512, 513, 2000]))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, n int")
    got = {
        r.id: (r.n_tokens, r.tok_start, r.seq_first, r.seq_last, r.n_seqs)
        for r in pack_sequences(
            df, "n", "id", seq_len=512, bucket_size=37
        ).collect()
    }
    assert got == _naive(rows, 512)


def test_pack_bucket_size_irrelevant(spark):
    rows = [(i, (i * 13) % 700) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, n int")
    a = sorted(map(tuple, pack_sequences(
        df, "n", "id", seq_len=256, bucket_size=10
    ).collect()))
    b = sorted(map(tuple, pack_sequences(
        df, "n", "id", seq_len=256, bucket_size=10_000
    ).collect()))
    assert a == b


def test_pack_data_never_hits_single_partition_window(spark):
    """The only single-partition window runs over the per-bucket totals
    (rows = n_buckets, driver-scale); the document-sized relation flows
    through a PARTITIONED window. Detect by walking the plan: every
    Window node missing a partition spec must sit above the tiny
    aggregate, not above the scan."""
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).cast("int").alias("n")
    )
    out = pack_sequences(df, "n", "id", seq_len=128, bucket_size=500)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    # the partitioned (bucketed) window must exist: the data relation
    # shuffles by BUCKET hash, never into one partition
    assert "Window" in tree
    assert "hashpartitioning(__b" in plan, plan
    # exactly ONE SinglePartition exchange (the bucket-totals prefix
    # window), and it consumes the aggregate's output columns — the
    # per-bucket totals — not the document rows
    import re

    singles = [
        m.group(0)
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\n"
            r"Arguments: SinglePartition", plan
        )
    ]
    assert len(singles) == 1, plan
    assert "__bt" in singles[0], plan  # bucket totals, not data


class TestLengthBucketBatches:
    def _run(self, spark, rows, **kw):
        from jsonl_dataingestion_pipeline_spark.operators.packing import (
            length_bucket_batches,
        )

        df = spark.createDataFrame(rows, "id long, n long")
        return {
            r.id: r
            for r in length_bucket_batches(df, "id", "n", **kw).collect()
        }

    def test_bucketing_and_batching(self, spark):
        rows = [(i, 10 + i % 3) for i in range(10)] + [(100, 99)]
        out = self._run(spark, rows, bucket_width=16, batch_size=4)
        # lengths 10-12 -> bucket 0; 99 -> bucket 6
        assert all(out[i].bucket == 0 for i in range(10))
        assert out[100].bucket == 6 and out[100].batch_n == 1
        # ranks are 1..10 in id order, batches of 4: 4+4+2
        assert [out[i].batch for i in range(10)] == [0]*4 + [1]*4 + [2]*2
        assert out[9].batch_n == 2

    def test_padding_waste_exact(self, spark):
        rows = [(1, 5), (2, 7), (3, 6), (4, 7)]
        out = self._run(spark, rows, bucket_width=100, batch_size=4)
        r = out[1]
        assert r.batch_max == 7 and r.pad_waste == 7 * 4 - 25
        assert r.efficiency_u == 25 * 10**6 // 28

    def test_two_phase_rank_matches_naive(self, spark):
        # tiny sub_bucket forces many sub-buckets; rank must equal the
        # single-window answer
        rows = [(i, (i * 37) % 50) for i in range(200)]
        out = self._run(spark, rows, bucket_width=8, batch_size=8,
                        sub_bucket=7)
        import collections

        naive = collections.defaultdict(list)
        for i, n in rows:
            naive[n // 8].append(i)
        for b, ids in naive.items():
            for rank, i in enumerate(sorted(ids), 1):
                assert out[i].rank == rank, (b, i)

    def test_bucketing_beats_global_padding(self, spark):
        # the metric the operator exists for: bucketed waste < one
        # global batch-of-everything padded to corpus max
        rows = [(i, 4) for i in range(8)] + [(i + 8, 400) for i in range(8)]
        out = self._run(spark, rows, bucket_width=16, batch_size=8)
        waste = sum({(r.bucket, r.batch): r.pad_waste
                     for r in out.values()}.values())
        global_waste = 400 * 16 - (4 * 8 + 400 * 8)
        assert waste == 0 < global_waste


def test_length_bucket_batches_rejects_string_order(spark):
    import pytest as _pytest
    from jsonl_dataingestion_pipeline_spark.operators.packing import (
        length_bucket_batches,
    )

    df = spark.createDataFrame([("a", 5)], "id string, n long")
    with _pytest.raises(ValueError):
        length_bucket_batches(df, "id", "n", bucket_width=8, batch_size=4)

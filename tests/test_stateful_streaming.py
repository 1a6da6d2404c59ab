"""applyInPandasWithState custom operator: state survives across batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.streaming.stateful import running_user_stats

SCHEMA = "user_id long, ts timestamp, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [(u, t, v) for u, t, v in rows], "user_id long, ts_s string, value double"
    ).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    ).coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, indir, ckpt):
    """Run to completion, returning the last emitted row per user.

    foreachBatch (not the memory sink) because only it supports resuming
    from a checkpoint — which is the thing this test exercises.
    """
    collected: list = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["user_id"]: r for r in collected}


def test_state_survives_batches(tmp_path, spark):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(
        spark,
        indir,
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 2.0),  # same session
            (2, "2024-01-01 09:00:00", 5.0),
        ],
    )
    first = _run_stream(spark, indir, ckpt)
    assert first[1]["n_events"] == 2 and first[1]["n_sessions"] == 1
    assert first[2]["n_events"] == 1 and first[2]["n_sessions"] == 1

    # second batch: user 1 returns after > 30min -> new session; state kept
    _write_batch(spark, indir, [(1, "2024-01-01 11:30:00", 4.0)])
    second = _run_stream(spark, indir, ckpt)
    assert second[1]["n_events"] == 3
    assert second[1]["n_sessions"] == 2
    assert second[1]["total_value"] == 7.0

"""Structured Streaming variant tests (availableNow trigger, file source)."""

from __future__ import annotations

import csv
import json

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.schema import SOURCE_HEADERS
from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
    stream_shipment_csv,
    windowed_event_counts,
)


def test_stream_shipment_csv_incremental(tmp_path, spark):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    indir.mkdir()

    def write_csv(name: str, job_no: str):
        row = {h: "" for h in SOURCE_HEADERS}
        row["Job No."] = job_no
        row["ETD LP"] = "05/01/2024"
        with (indir / name).open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(SOURCE_HEADERS))
            w.writeheader()
            w.writerow(row)

    write_csv("batch1.csv", "J1")
    q = stream_shipment_csv(
        spark, str(indir), str(outdir), str(ckpt), as_of="2024-06-01"
    )
    q.awaitTermination(120)

    docs = [
        json.loads(line)
        for p in outdir.rglob("*.json")
        for line in p.read_text().splitlines()
    ]
    assert {d["document_id"] for d in docs} == {"J1"}

    # second file arrives -> only the increment is processed
    write_csv("batch2.csv", "J2")
    q2 = stream_shipment_csv(
        spark, str(indir), str(outdir), str(ckpt), as_of="2024-06-01"
    )
    q2.awaitTermination(120)
    docs = [
        json.loads(line)
        for p in outdir.rglob("*.json")
        for line in p.read_text().splitlines()
    ]
    assert sorted(d["document_id"] for d in docs) == ["J1", "J2"]


def test_watermark_drops_late_rows_in_streaming(tmp_path, spark):
    """True streaming semantics: a row older than watermark - delay is
    dropped once the watermark has advanced past its window."""
    indir = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()
    schema = "event_type string, ts timestamp, value double"

    def write(name, rows):
        spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
            "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(str(indir))

    collected = []

    def run():
        stream = spark.readStream.schema(schema).parquet(str(indir))
        agg = windowed_event_counts(
            stream, window_duration="1 hour", watermark="1 hour"
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, _: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 advances the watermark to 23:00 (max 24:00 - 1h delay)
    write("b1", [("a", "2024-01-01 10:05:00", 1.0), ("a", "2024-01-02 00:00:00", 1.0)])
    run()
    # batch 2: a row for the long-closed 10:00 window -> must be dropped
    write("b2", [("a", "2024-01-01 10:30:00", 99.0)])
    run()
    totals = {
        (str(r["window_start"]), r["event_type"]): r["total_value"] for r in collected
    }
    assert totals.get(("2024-01-01 10:00:00", "a")) == 1.0  # late 99.0 dropped


def test_windowed_event_counts_batch_parity(spark):
    e = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:05:00", 1.0),
            ("a", "2024-01-01 10:55:00", 2.0),
            ("a", "2024-01-01 11:05:00", 4.0),
            ("b", "2024-01-01 10:10:00", 8.0),
        ],
        "event_type string, ts_s string, value double",
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(e).collect()
    }
    assert got == {
        ("2024-01-01 10:00:00", "a"): (2, 3.0),
        ("2024-01-01 11:00:00", "a"): (1, 4.0),
        ("2024-01-01 10:00:00", "b"): (1, 8.0),
    }


def test_compact_stream_output(tmp_path, spark):
    """batch_id=N dirs -> flat source_group layout, one atomic publish."""
    import csv as _csv

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        compact_stream_output,
    )

    indir, outdir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    indir.mkdir()

    def write_csv(name, job_no):
        row = {h: "" for h in SOURCE_HEADERS}
        row["Job No."] = job_no
        row["ETD LP"] = "05/01/2024"
        with (indir / name).open("w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(SOURCE_HEADERS))
            w.writeheader()
            w.writerow(row)

    write_csv("b1.csv", "J1")
    stream_shipment_csv(
        spark, str(indir), str(outdir), str(ckpt), as_of="2024-06-01"
    ).awaitTermination(120)
    write_csv("b2.csv", "J2")
    stream_shipment_csv(
        spark, str(indir), str(outdir), str(ckpt), as_of="2024-06-01"
    ).awaitTermination(120)
    assert (outdir / "batch_id=0").exists()  # idempotent layout on disk

    final = tmp_path / "final"
    n = compact_stream_output(spark, str(outdir), str(final))
    assert n == 2
    docs = [
        json.loads(line)
        for p in final.rglob("*.json")
        for line in p.read_text().splitlines()
    ]
    assert sorted(d["document_id"] for d in docs) == ["J1", "J2"]
    assert all("batch_id" not in d for d in docs)
    assert any("source_group=" in str(p) for p in final.iterdir())


def test_stream_stream_join_true_streaming(tmp_path, spark):
    """Two file streams joined on key within (ts, ts+1h]: in-window click
    matches, out-of-window click doesn't; state stays bounded by the
    watermarks + two-sided time condition."""
    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_stream_join,
    )

    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts")).coalesce(
        1
    ).write.parquet(str(ldir))
    spark.createDataFrame(
        [(1, "2024-01-01 10:30:00"), (2, "2024-01-01 11:30:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts_r")).coalesce(
        1
    ).write.parquet(str(rdir))

    ls = spark.readStream.schema("user_id long, ts timestamp").parquet(str(ldir))
    rs = spark.readStream.schema("user_id long, ts_r timestamp").parquet(str(rdir))
    joined = stream_stream_join(ls, rs)
    collected = []
    q = (
        joined.writeStream.foreachBatch(lambda df, _: collected.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["ts_r"])) for r in collected}
    assert got == {(1, "2024-01-01 10:30:00")}  # user 2's click is 90min late

    # batch parity: same expression on static frames
    lb = spark.read.parquet(str(ldir))
    rb = spark.read.parquet(str(rdir))
    batch = {
        (r["user_id"], str(r["ts_r"]))
        for r in stream_stream_join(lb, rb).collect()
    }
    assert batch == got


def test_maintain_rollup_incremental_equals_batch(tmp_path, spark):
    """Two micro-batches maintained incrementally must equal the one-shot
    batch rollup over all events; the second batch only rewrites its own
    (resolution, bucket_date) partitions."""
    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        maintain_rollup,
        multi_resolution_rollup,
    )

    indir = tmp_path / "in"
    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_type string, ts timestamp, value double"

    def write(rows):
        spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
            "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value"
        ).coalesce(1).write.mode("append").parquet(str(indir))

    def run():
        stream = spark.readStream.schema(schema).parquet(str(indir))
        maintain_rollup(spark, stream, target, ckpt).awaitTermination(120)

    b1 = [("a", "2024-01-01 10:05:00", 1.25), ("a", "2024-01-01 11:10:00", 2.5)]
    b2 = [("a", "2024-01-01 10:40:00", 4.0), ("b", "2024-01-02 09:00:00", 8.0)]
    write(b1)
    run()
    write(b2)
    run()

    maintained = {
        (r["resolution"], str(r["bucket"]), r["event_type"]): (
            r["n_events"], round(r["total_value"], 2)
        )
        for r in spark.read.parquet(target).collect()
    }
    all_events = spark.createDataFrame(
        b1 + b2, "event_type string, ts_s string, value double"
    ).select("event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    expected = {
        (r["resolution"], str(r["bucket"]), r["event_type"]): (
            r["n_events"], r["total_value"]
        )
        for r in multi_resolution_rollup(all_events).collect()
    }
    assert maintained == expected
    # day-2 bucket exists only for 'b'; hour rollup has 3 distinct buckets
    assert ("day", "2024-01-02 00:00:00", "b") in maintained
    assert sum(1 for k in maintained if k[0] == "hour") == 3


def test_dedup_stream_within_watermark(tmp_path, spark):
    """Streaming dedup: duplicate keys within the watermark horizon are
    dropped; output carries each key once."""
    import json as _json

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        dedup_stream,
    )

    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    ckpt = tmp_path / "ck"
    indir.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01T10:00:00", "v": 1},
        {"k": "a", "ts": "2024-01-01T10:05:00", "v": 2},  # dup within wm
        {"k": "b", "ts": "2024-01-01T10:10:00", "v": 3},
        {"k": "b", "ts": "2024-01-01T10:11:00", "v": 4},  # dup within wm
        {"k": "c", "ts": "2024-01-01T10:12:00", "v": 5},
    ]
    (indir / "part1.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )
    src = (
        spark.readStream.schema("k string, ts string, v long")
        .json(str(indir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = dedup_stream(src, ["k"], ts_col="ts", watermark="30 minutes")
    q = (
        deduped.writeStream.format("json")
        .option("path", str(outdir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [
        _json.loads(line)
        for p in outdir.rglob("*.json")
        for line in p.read_text().splitlines()
    ]
    keys = sorted(r["k"] for r in out)
    assert keys == ["a", "b", "c"]


def test_ingest_stream_incremental_dedup(spark, tmp_path):
    """Streaming ingestion drops exact and near dups of the static base,
    keeps novel docs, and lands idempotent batch_id partitions."""
    import os

    from pyspark.sql import functions as F

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        ingest_stream_incremental_dedup,
    )

    base_path = os.path.join(str(tmp_path), "base")
    spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "m n o p q r s t u v w x")],
        "doc_id long, text string",
    ).write.parquet(base_path)

    in_dir = os.path.join(str(tmp_path), "in")
    spark.createDataFrame(
        [
            (10, "a b c d e f g h i j k l"),        # exact dup -> dropped
            (11, "a b c d e f g h i j k l extra"),  # near dup -> dropped
            (12, "totally novel content here with distinct words only"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.json(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").json(in_dir)
    out_dir = os.path.join(str(tmp_path), "out")
    q = ingest_stream_incremental_dedup(
        spark,
        stream,
        base_path,
        out_dir,
        os.path.join(str(tmp_path), "ckpt"),
        sample_hex_prefix="",
    )
    q.awaitTermination(120)
    back = spark.read.option("basePath", out_dir).parquet(out_dir + "/batch_id=*")
    assert [r.doc_id for r in back.select("doc_id").collect()] == [12]


def test_web_extraction_stages_run_on_a_stream(tmp_path, spark):
    """The web-funnel's narrow stages (strip_html -> C4 flags -> Gopher
    flags) are stateless projections, so they compose with a file-source
    stream unchanged — same expressions, availableNow trigger."""
    from jsonl_dataingestion_pipeline_spark.functions.web import strip_html
    from jsonl_dataingestion_pipeline_spark.operators.curation import (
        c4_quality_filter,
        gopher_quality_flags,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    body = "".join(
        f"<p>the quick brown fox number {i} jumps far today.</p>"
        for i in range(4)
    )
    rows = [
        {"page_id": i, "html": f"<html><body>{body}</body></html>"}
        for i in range(3)
    ]
    import json as _json

    (indir / "pages.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows)
    )

    src = (
        spark.readStream.format("json")
        .schema("page_id long, html string")
        .load(str(indir))
    )
    ext = src.select(
        "page_id",
        strip_html(F.col("html"), keep_line_breaks=True).alias("text"),
    )
    c4 = c4_quality_filter(ext, "text", "page_id")
    flags = gopher_quality_flags(
        c4.filter("c4_keep").select("page_id", F.col("c4_text").alias("text")),
        "text",
        "page_id",
        min_words=10,
        min_stopword_hits=1,
    )
    q = (
        flags.writeStream.format("memory")
        .queryName("web_stream_flags")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT page_id, keep FROM web_stream_flags ORDER BY page_id"
    ).collect()
    assert [r.page_id for r in got] == [0, 1, 2]
    assert all(r.keep for r in got)


def test_stream_incremental_components(spark, tmp_path):
    """Edge batches arrive as files; after the stream drains, the
    maintained labeling equals a from-scratch CC over ALL edges (the
    q160 theorem applied per micro-batch), including a cross-batch
    merge (edge 2-10 arrives in batch 2 and must fuse two batch-1
    components)."""
    import json as _json

    from jsonl_dataingestion_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_incremental_components,
    )
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "edges_in")
    import os

    os.makedirs(in_dir)
    batch1 = [(1, 2), (10, 11), (20, 21)]
    batch2 = [(2, 10), (30, 31)]
    with open(f"{in_dir}/b1.json", "w") as f:
        for a, b in batch1:
            f.write(_json.dumps({"id_l": a, "id_r": b}) + "\n")
    with open(f"{in_dir}/b2.json", "w") as f:
        for a, b in batch2:
            f.write(_json.dumps({"id_l": a, "id_r": b}) + "\n")

    stream = (
        spark.readStream.schema("id_l long, id_r long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    labels_path = str(tmp_path / "labels")
    q = stream_incremental_components(
        spark, stream, labels_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        r.id: r.comp
        for r in spark.read.parquet(labels_path).collect()
    }
    all_edges = spark.createDataFrame(
        batch1 + batch2, "id_l long, id_r long"
    )
    nodes = (
        all_edges.select(F.col("id_l").alias("id"))
        .unionAll(all_edges.select(F.col("id_r").alias("id")))
        .distinct()
    )
    want = {
        r.id: r.comp
        for r in connected_components(nodes, all_edges).collect()
    }
    assert got == want
    # the cross-batch merge actually happened
    assert got[11] == got[1] == 1


def test_stream_incremental_components_recovers_half_done_swap(
    spark, tmp_path
):
    """Crash-safety of the label swap (ADVICE r6): if a crash lands
    between 'rename old aside' and 'rename staging in', the newest
    complete labeling survives under labels_path.__old and the next
    batch RESTORES it before folding — no window ever exists in which
    the only complete labeling has been deleted."""
    import json as _json
    import os

    from jsonl_dataingestion_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_incremental_components,
    )
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "edges_in")
    os.makedirs(in_dir)
    batch1 = [(1, 2), (10, 11)]
    with open(f"{in_dir}/b1.json", "w") as f:
        for a, b in batch1:
            f.write(_json.dumps({"id_l": a, "id_r": b}) + "\n")
    labels_path = str(tmp_path / "labels")
    stream = (
        spark.readStream.schema("id_l long, id_r long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = stream_incremental_components(
        spark, stream, labels_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    # simulate the crash window: old labeling renamed aside, the new
    # rename never happened
    os.rename(labels_path, labels_path + ".__old")
    assert not os.path.isdir(labels_path)

    batch2 = [(2, 10)]
    with open(f"{in_dir}/b2.json", "w") as f:
        for a, b in batch2:
            f.write(_json.dumps({"id_l": a, "id_r": b}) + "\n")
    stream2 = (
        spark.readStream.schema("id_l long, id_r long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q2 = stream_incremental_components(
        spark, stream2, labels_path, str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)

    got = {
        r.id: r.comp for r in spark.read.parquet(labels_path).collect()
    }
    all_edges = spark.createDataFrame(
        batch1 + batch2, "id_l long, id_r long"
    )
    nodes = (
        all_edges.select(F.col("id_l").alias("id"))
        .unionAll(all_edges.select(F.col("id_r").alias("id")))
        .distinct()
    )
    want = {
        r.id: r.comp
        for r in connected_components(nodes, all_edges).collect()
    }
    assert got == want
    assert not os.path.isdir(labels_path + ".__old")  # cleaned up


def test_stream_incremental_components_posix_store_rejects_schemes(
    spark, tmp_path
):
    """Forcing the posix fast path (use_hadoop_fs=False) on an
    object-store URI must raise — os.rename on 's3a://…' would treat
    the URI as a literal relative path and silently break the swap."""
    import pytest

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_incremental_components,
    )

    stream = (
        spark.readStream.schema("id_l long, id_r long")
        .json(str(tmp_path))
    )
    with pytest.raises(ValueError, match="only valid for local"):
        stream_incremental_components(
            spark, stream, "s3a://bucket/labels", str(tmp_path / "c"),
            use_hadoop_fs=False,
        )


def test_stream_incremental_components_hadoop_fs_swap(spark, tmp_path):
    """The scheme-agnostic Hadoop FileSystem swap path (VERDICT r7
    item #1): exists/rename/delete go through
    org.apache.hadoop.fs.FileSystem resolved from the labels URI —
    driven here with the ``file:`` filesystem, the same code path an
    ``hdfs://``/``s3a://`` deployment exercises. Covers the end-to-end
    fold, half-done-swap crash recovery, and .old cleanup."""
    import json as _json
    import os

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_incremental_components,
    )

    in_dir = str(tmp_path / "edges_in")
    os.makedirs(in_dir)
    with open(f"{in_dir}/b1.json", "w") as f:
        f.write(_json.dumps({"id_l": 1, "id_r": 2}) + "\n")
        f.write(_json.dumps({"id_l": 3, "id_r": 4}) + "\n")
    labels_path = str(tmp_path / "labels")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("id_l long, id_r long")
            .option("maxFilesPerTrigger", 1)
            .json(in_dir)
        )
        q = stream_incremental_components(
            spark, stream, "file://" + labels_path,
            str(tmp_path / ckpt), use_hadoop_fs=True,
        )
        q.awaitTermination(120)

    run("ckpt1")
    got = {
        r.id: r.comp for r in spark.read.parquet(labels_path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
    assert not os.path.isdir(labels_path + ".__old")

    # simulate a crash between the two renames: only .old exists —
    # the next batch (through the Hadoop path) must restore it first
    os.rename(labels_path, labels_path + ".__old")
    with open(f"{in_dir}/b2.json", "w") as f:
        f.write(_json.dumps({"id_l": 2, "id_r": 3}) + "\n")
    run("ckpt2")
    got = {
        r.id: r.comp for r in spark.read.parquet(labels_path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}
    assert not os.path.isdir(labels_path + ".__old")


def test_stream_incremental_components_file_uri_forms(spark, tmp_path):
    """file:/// normalizes to the absolute posix path and works end to
    end; the ambiguous authority form file://host/path is rejected
    (silently stripping it would commit labels to a RELATIVE path)."""
    import json as _json
    import os

    import pytest

    from jsonl_dataingestion_pipeline_spark.streaming.pipeline import (
        stream_incremental_components,
    )

    in_dir = str(tmp_path / "edges_in")
    os.makedirs(in_dir)
    with open(f"{in_dir}/b1.json", "w") as f:
        f.write(_json.dumps({"id_l": 1, "id_r": 2}) + "\n")
    labels_path = str(tmp_path / "labels")
    stream = (
        spark.readStream.schema("id_l long, id_r long")
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = stream_incremental_components(
        spark, stream, "file://" + labels_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        r.id: r.comp for r in spark.read.parquet(labels_path).collect()
    }
    assert got == {1: 1, 2: 1}

    with pytest.raises(ValueError, match="empty-authority"):
        stream_incremental_components(
            spark, stream, "file://somehost/data/labels",
            str(tmp_path / "ckpt2"),
        )

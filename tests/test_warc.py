"""WARC container ingestion: record walk, gzip members, HTTP split,
quarantine, and the distributed read path."""
from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.sources.warc import (
    read_warc,
    records_from_blobs,
    walk_warc_records,
)


def _record(
    rec_type: str,
    block: bytes,
    *,
    uri: str = "http://example.com/x",
    ctype: str = "application/http;msgtype=response",
) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Record-ID: <urn:test:{rec_type}>\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


def _http_block(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _sample_warc() -> bytes:
    return (
        _record("response", _http_block(b"<html>hello</html>"))
        + _record(
            "request",
            b"GET /x HTTP/1.1\r\nHost: example.com\r\n\r\n",
            ctype="application/http;msgtype=request",
        )
        + _record(
            "metadata", b"fetchTimeMs: 12\n", ctype="application/warc-fields"
        )
    )


def test_walk_warc_records_plain_and_gzip_members():
    raw = _sample_warc()
    # member-per-record gzip, the crawl layout
    gz = b"".join(
        gzip.compress(_record("response", _http_block(b"a" * i)))
        for i in (1, 2, 3)
    )
    got = list(walk_warc_records(raw))
    assert [h.get("warc-type") for _, h, _, e in got] == [
        "response", "request", "metadata"
    ]
    assert all(e is None for *_ , e in got)
    gz_got = list(walk_warc_records(gz))
    assert len(gz_got) == 3
    assert [len(b) - len(_http_block(b"")) for _, _, b, _ in gz_got] == [
        1, 2, 3
    ]


def test_read_warc_end_to_end(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_sample_warc())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_sample_warc()))
    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 6
    by = {}
    for r in out:
        by.setdefault(r.warc_path.rsplit("/", 1)[-1], []).append(r)
    for fname in ("a.warc", "b.warc.gz"):
        rows = sorted(by[fname], key=lambda r: r.rec_idx)
        assert [r.warc_type for r in rows] == [
            "response", "request", "metadata"
        ]
        resp = rows[0]
        assert resp.rec_ok and resp.rec_err is None
        assert resp.http_status == 200
        assert resp.http_content_type == "text/html"
        assert bytes(resp.body) == b"<html>hello</html>"
        assert resp.target_uri == "http://example.com/x"
        assert resp.content_length == len(_http_block(b"<html>hello</html>"))
        # non-http blocks carry the raw block and no status
        meta = rows[2]
        assert meta.http_status is None
        assert bytes(meta.body) == b"fetchTimeMs: 12\n"


def test_read_warc_quarantines_truncated_file(spark, tmp_path):
    good = _sample_warc()
    (tmp_path / "good.warc").write_bytes(good)
    # cut INSIDE the last record's block (16-byte block + 4 trailing
    # CRLF bytes): the walker must report a truncated block
    (tmp_path / "bad.warc").write_bytes(good[: len(good) - 10])
    out = read_warc(spark, str(tmp_path)).collect()
    bad = [r for r in out if not r.rec_ok]
    ok = [r for r in out if r.rec_ok]
    assert len(bad) == 1
    assert "truncated" in bad[0].rec_err
    assert bad[0].warc_path.endswith("bad.warc")
    # the good file's records and the bad file's leading good records
    # all survive
    assert len(ok) == 5


def test_read_warc_max_bytes_filters_at_source(spark, tmp_path):
    (tmp_path / "small.warc").write_bytes(_sample_warc())
    (tmp_path / "big.warc").write_bytes(_sample_warc() * 50)
    out = read_warc(
        spark, str(tmp_path), max_bytes=len(_sample_warc())
    ).collect()
    assert {r.warc_path.rsplit("/", 1)[-1] for r in out} == {"small.warc"}


def test_records_from_blobs_arbitrary_frame(spark):
    df = spark.createDataFrame(
        [("mem://w/0", bytearray(_sample_warc()))],
        "path string, content binary",
    )
    out = records_from_blobs(df).collect()
    assert len(out) == 3
    assert out[0].record_id == "<urn:test:response>"


def test_walk_warc_rejects_non_warc_bytes():
    got = list(walk_warc_records(b"PK\x03\x04 definitely a zip\r\n\r\n"))
    assert len(got) == 1
    assert got[0][3] is not None and "WARC/" in got[0][3]


def test_read_warc_stream_ingests_new_files(spark, tmp_path):
    """Streaming WARC ingestion: files stream through the same record
    walk; a second availableNow pass picks up ONLY the new shard
    (exactly-once per file via the checkpoint)."""
    import os

    from jsonl_dataingestion_pipeline_spark.sources.warc import (
        read_warc_stream,
    )

    in_dir = tmp_path / "crawl"
    os.makedirs(in_dir)
    (in_dir / "shard1.warc").write_bytes(_sample_warc())
    out = str(tmp_path / "records")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            read_warc_stream(spark, str(in_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 3
    (in_dir / "shard2.warc.gz").write_bytes(
        gzip.compress(_sample_warc())
    )
    run()
    got = spark.read.parquet(out)
    assert got.count() == 6
    assert got.filter("rec_ok").count() == 6
    by_file = {
        r["f"]: r["n"]
        for r in got.groupBy(
            F.element_at(F.split("warc_path", "/"), -1).alias("f")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_file == {"shard1.warc": 3, "shard2.warc.gz": 3}


def test_walk_warc_rejects_negative_content_length():
    """A crafted negative Content-Length must quarantine, not move the
    cursor backward and loop forever (untrusted crawl data)."""
    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"Content-Length: -33\r\n\r\npayload\r\n\r\n"
    )
    got = list(walk_warc_records(rec))
    assert len(got) == 1
    assert got[0][3] is not None and "negative Content-Length" in got[0][3]

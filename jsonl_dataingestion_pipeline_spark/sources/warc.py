"""WARC container ingestion (ISO 28500) — the artifact web crawls
actually produce, feeding the q118 web funnel.

A WARC file is a sequence of records, each a CRLF-terminated header
block (``WARC/1.0`` version line + ``Name: value`` fields, blank-line
terminated) followed by exactly ``Content-Length`` bytes of block and a
``\\r\\n\\r\\n`` separator. Crawl WARCs ship gzipped with one gzip
MEMBER per record (``.warc.gz``); Python's ``gzip.decompress`` inflates
all concatenated members, so the same byte-walker handles both forms.

Scale shape (the AVI/GIF walker discipline, sources/formats.py): files
arrive through the distributed ``binaryFile`` source — one task per
file, nothing through the driver — and the record walk is an
Arrow-batched ``mapInPandas`` over the blob column. A WARC is not
splittable below file granularity without a member index, so one file =
one task; crawls shard WARCs at ~1 GB exactly so that this
file-per-task layout parallelizes. Cap stray oversized files with
``max_bytes`` at the source.

Corruption policy mirrors the JSONL readback quarantine (S9): good
records stream out with ``rec_ok = true``; at the first malformed
record the walker stops for THAT file and emits one ``rec_ok = false``
row carrying the parse error, so a truncated shard never poisons the
batch or silently vanishes.
"""

from __future__ import annotations

import gzip
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "warc_path string, rec_idx int, warc_type string, record_id string, "
    "warc_date string, target_uri string, content_type string, "
    "content_length long, http_status int, http_content_type string, "
    "body binary, rec_ok boolean, rec_err string"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _parse_http_block(
    block: bytes,
) -> Tuple[Optional[int], Optional[str], bytes]:
    """(status, content-type, body) from an HTTP message block; body
    falls back to the whole block when no header separator exists."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    status: Optional[int] = None
    ctype: Optional[str] = None
    first = lines[0].split(b" ", 2)
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def walk_warc_records(
    blob: bytes,
) -> Iterator[Tuple[int, dict, bytes, Optional[str]]]:
    """Yield ``(rec_idx, headers, block, err)`` per record of one WARC
    blob (plain or gzipped — multi-member gzip inflates whole).

    ``headers`` maps lower-cased field names to values. On a malformed
    record the iterator yields one final ``(idx, {}, b'', err)`` tuple
    and stops — callers surface it as a quarantine row.
    """
    if blob[:2] == _GZIP_MAGIC:
        try:
            blob = gzip.decompress(blob)
        except Exception as e:  # truncated/corrupt gzip member
            yield 0, {}, b"", f"gzip: {e}"
            return
    i, idx, n = 0, 0, len(blob)
    while i < n:
        while i < n and blob[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            return
        hdr_end = blob.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            yield idx, {}, b"", "unterminated record header"
            return
        lines = blob[i:hdr_end].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            yield idx, {}, b"", (
                "expected WARC/ version line, got "
                + repr(lines[0][:40])
            )
            return
        headers: dict = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                yield idx, {}, b"", f"malformed header line {ln[:40]!r}"
                return
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
        try:
            cl = int(headers["content-length"])
        except (KeyError, ValueError):
            yield idx, {}, b"", "missing/invalid Content-Length"
            return
        if cl < 0:
            # a negative length would move the cursor BACKWARD and
            # re-parse the same record forever (untrusted crawl data —
            # hang + unbounded rows, not just a bad record)
            yield idx, {}, b"", f"negative Content-Length {cl}"
            return
        block_start = hdr_end + 4
        if block_start + cl > n:
            yield idx, {}, b"", (
                f"truncated block: need {cl} bytes, have "
                f"{n - block_start}"
            )
            return
        yield idx, headers, blob[block_start : block_start + cl], None
        idx += 1
        i = block_start + cl


def _records_rows(warc_path: str, blob: bytes):
    """Row tuples in WARC_RECORD_SCHEMA order for one blob."""
    for idx, headers, block, err in walk_warc_records(blob):
        if err is not None:
            yield (
                warc_path, idx, None, None, None, None, None, None,
                None, None, None, False, err,
            )
            return
        ctype = headers.get("content-type")
        status = hct = None
        body = block
        if ctype and ctype.lower().startswith("application/http"):
            status, hct, body = _parse_http_block(block)
        yield (
            warc_path,
            idx,
            headers.get("warc-type"),
            headers.get("warc-record-id"),
            headers.get("warc-date"),
            headers.get("warc-target-uri"),
            ctype,
            int(headers["content-length"]),
            status,
            hct,
            body,
            True,
            None,
        )


def records_from_blobs(
    blobs: DataFrame, *, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """WARC blobs (any frame with a path + binary column) -> one row
    per record (WARC_RECORD_SCHEMA), via an Arrow-batched walk."""
    import pandas as pd

    cols = [path_col, content_col]
    names = [f.split(" ")[0] for f in WARC_RECORD_SCHEMA.split(", ")]

    def walk(batches):
        for pdf in batches:
            rows = []
            for p, c in zip(pdf[path_col], pdf[content_col]):
                rows.extend(_records_rows(p, bytes(c)))
            yield pd.DataFrame(rows, columns=names)

    return blobs.select(*cols).mapInPandas(walk, WARC_RECORD_SCHEMA)


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    glob: Optional[str] = None,
    recursive: bool = True,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Distributed WARC ingestion: ``binaryFile`` listing ->
    ``mapInPandas`` record walk -> one row per WARC record
    (WARC_RECORD_SCHEMA). HTTP response/request payloads are split into
    (http_status, http_content_type, body); other records carry the
    raw block as ``body``."""
    from jsonl_dataingestion_pipeline_spark.sources.formats import (
        read_binary_files,
    )

    blobs = read_binary_files(
        spark, path,
        glob=glob or "*.warc*", recursive=recursive, max_bytes=max_bytes,
    )
    return records_from_blobs(blobs)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    glob: Optional[str] = None,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Structured-Streaming WARC ingestion: crawl shards landing under
    ``path`` stream through the SAME Arrow-batched record walk as the
    batch reader — ``readStream.format("binaryFile")`` tracks which
    files are new (exactly-once per file via the sink's checkpoint),
    ``mapInPandas`` applies per micro-batch, and quarantine rows flow
    like any other record. This is the continuous-crawl front door: a
    fetcher drops ``*.warc.gz`` shards into object storage and the
    pipeline ingests them as they land, no batch scheduler.

    ``maxFileAge`` defaults apply (7d); callers resuming an old crawl
    should set ``spark.sql.streaming.fileSource.log.cleanupDelay`` /
    maxFileAge via session conf. One file = one task, as in batch."""
    reader = (
        spark.readStream.format("binaryFile")
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob or "*.warc*")
        .option("recursiveFileLookup", "true")
    )
    blobs = reader.load(path)
    if max_bytes is not None:
        from pyspark.sql import functions as F

        blobs = blobs.filter(F.col("length") <= max_bytes)
    return records_from_blobs(blobs)

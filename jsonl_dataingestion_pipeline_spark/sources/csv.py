"""S3 — all-string CSV scan + P1/P2 header validation + P3/P4 projection.

Reference: `/root/reference/src/ingestor.py:84-121` (all-string read,
BOM-tolerant) and `/root/reference/src/transformer.py:129-195`
(normalize + strict validation + rename).

Spark-first notes:
- The scan is lazy and splittable; no download step exists because Spark
  reads object-store URIs (abfss://, s3a://) directly in the scan (S2 of
  SURVEY.md §2.1 is eliminated by design).
- Header validation is a driver-side check on the reader schema — it runs
  before any job is launched, exactly like the reference's pre-flight
  validation, and costs one metadata read.
- The rename-to-canonical ``select`` IS the column-pruning contract;
  Catalyst pushes it into the scan.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import COLUMN_MAPPING, SOURCE_HEADERS


class HeaderValidationError(ValueError):
    """Strict-mode schema mismatch (missing/extra/misplaced headers)."""


def find_latest_file(
    spark: SparkSession, directory: str, suffix: str = ".csv", prefix: str = ""
) -> Optional[str]:
    """S1 — latest-batch discovery: newest matching file by mtime.

    Driver-side metadata listing through the Hadoop FS API, so it works
    unchanged against local paths, abfss://, s3a://, hdfs:// (reference
    polled an Azure container with the SDK, `src/ingestor.py:35-65`).
    Returns the fully-qualified path or None.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(directory)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return None
    best_name, best_mtime = None, -1
    for status in fs.listStatus(path):
        p = status.getPath()
        name = p.getName()
        if not name.endswith(suffix) or not name.startswith(prefix):
            continue
        mtime = status.getModificationTime()
        # ties broken by name so discovery is deterministic
        if mtime > best_mtime or (mtime == best_mtime and name > (best_name or "")):
            best_mtime = mtime
            best_name = p.toString()
    return best_name


_WS_RUN = re.compile(r"\s+")
_CTL = re.compile(r"[\r\n\t]+")


def normalize_headers(columns: Sequence[str]) -> list[str]:
    """P1 — collapse control chars / whitespace runs, strip (and BOM)."""
    out = []
    for c in columns:
        c = str(c).replace("\ufeff", "")
        c = _CTL.sub(" ", c)
        c = _WS_RUN.sub(" ", c).strip()
        out.append(c)
    return out


def validate_headers(columns: Sequence[str], strict: bool = True) -> None:
    """P2 — fail on any missing, extra, or out-of-position header.

    Mirrors `src/transformer.py:141-192`: name set equality first, then
    positional equality.
    """
    expected = list(SOURCE_HEADERS)
    actual = list(columns)
    missing = [c for c in expected if c not in actual]
    extra = [c for c in actual if c not in expected]
    if missing or extra:
        if not strict:
            return
        raise HeaderValidationError(
            f"HEADER VALIDATION FAILED: schema mismatch "
            f"(missing={len(missing)}, extra={len(extra)}). "
            f"missing={missing[:5]} extra={extra[:5]}"
        )
    mismatches = [
        (i, a, e) for i, (a, e) in enumerate(zip(actual, expected)) if a != e
    ]
    if mismatches and strict:
        i, a, e = mismatches[0]
        raise HeaderValidationError(
            f"HEADER VALIDATION FAILED: name/position mismatch "
            f"({len(mismatches)} mismatches; first at [{i}] '{a}' -> '{e}')."
        )


def read_shipment_csv(
    spark: SparkSession,
    path: str,
    *,
    strict: bool = True,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Read the shipment CSV all-strings and project to canonical names.

    Missing mapped columns (permissive mode only) are backfilled as null
    strings (P6, `src/transformer_old.py:80-88`); unmapped columns are
    dropped by the projection (P4).
    """
    df = (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    normalized = normalize_headers(df.columns)
    df = df.toDF(*normalized)
    validate_headers(normalized, strict=strict)

    present = set(normalized)
    projection = []
    for src, dst in COLUMN_MAPPING:
        if src in present:
            projection.append(F.col(f"`{src}`").alias(dst))
        else:
            projection.append(F.lit(None).cast("string").alias(dst))
    return df.select(*projection)


def detect_encoding(
    spark: SparkSession,
    path: str,
    *,
    candidates: Sequence[str] = ("UTF-8", "iso-8859-1"),
    probe_bytes: int = 8 << 20,
) -> str:
    """Pick the first candidate encoding that decodes the file's bytes.

    The reference retries the whole read with ``iso-8859-1`` when UTF-8
    raises ``UnicodeDecodeError`` (`/root/reference/src/ingestor.py:104-121`).
    Spark's CSV reader never raises — it substitutes malformed bytes — so
    the retry must be a driver-side pre-flight: probe up to ``probe_bytes``
    of the file (first file when ``path`` is a directory) through the
    Hadoop FS API (works for local / s3a:// / abfss://) and test-decode.
    An incremental decoder tolerates a multibyte char truncated at the
    probe boundary. The last candidate is the unconditional fallback,
    mirroring the reference's latin-1 catch-all (iso-8859-1 maps every
    byte, so it never fails).
    """
    import codecs

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    status = fs.getFileStatus(p)
    if status.isDirectory():
        files = sorted(
            (s.getPath() for s in fs.listStatus(p) if not s.isDirectory()),
            key=lambda q: q.getName(),
        )
        if not files:
            return candidates[0]
        p = files[0]
        status = fs.getFileStatus(p)
    n = int(min(status.getLen(), probe_bytes))
    stream = fs.open(p)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream, n))
    finally:
        stream.close()
    for enc in candidates[:-1]:
        dec = codecs.getincrementaldecoder(enc)()
        try:
            dec.decode(data, False)
            return enc
        except UnicodeDecodeError:
            continue
    return candidates[-1]


def read_shipment_csv_auto(
    spark: SparkSession,
    path: str,
    *,
    strict: bool = True,
    candidates: Sequence[str] = ("UTF-8", "iso-8859-1"),
    probe_bytes: int = 8 << 20,
) -> DataFrame:
    """S3 with the reference's fallback-encoding retry: probe, then read
    once with the detected encoding."""
    enc = detect_encoding(
        spark, path, candidates=candidates, probe_bytes=probe_bytes
    )
    return read_shipment_csv(spark, path, strict=strict, encoding=enc)

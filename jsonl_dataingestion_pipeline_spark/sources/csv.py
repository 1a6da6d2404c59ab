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

"""S4/S5/S6/S9 — JSONL document sink and readback.

Spark's JSON sink is exactly one-object-per-line JSONL with ISO date
serialization (reference `src/writer.py:143-183`); ``partitionBy`` replaces
the manual group-by-month write loop (`src/pipeline.py:108-113`); the 12 MB
file cap (`src/config.py:18-19`) is applied approximately through
``maxRecordsPerFile`` derived from a sampled average document size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import MAX_FILE_SIZE_BYTES


def estimate_max_records_per_file(
    df: DataFrame,
    cap_bytes: int = MAX_FILE_SIZE_BYTES,
    sample_rows: int = 256,
) -> int:
    """Estimate how many serialized docs fit in ``cap_bytes``.

    Samples serialized row sizes driver-side (bounded by ``sample_rows``).
    An exact byte cap would need a custom ``foreachPartition`` writer
    (SURVEY.md §4.2.2); the cap exists to satisfy an indexing-service file
    limit, so a conservative estimate is acceptable.
    """
    sizes = (
        df.limit(sample_rows)
        .select(F.octet_length(F.to_json(F.struct("*"))).alias("sz"))
        .agg(F.avg("sz").alias("avg_sz"))
        .first()
    )
    avg = (sizes and sizes["avg_sz"]) or 1024.0
    # leave 10% headroom for size skew
    return max(1, int(cap_bytes * 0.9 / float(avg)))


def write_documents(
    df: DataFrame,
    path: str,
    *,
    partition_by: Optional[str] = "source_group",
    mode: str = "overwrite",
    cap_file_bytes: Optional[int] = MAX_FILE_SIZE_BYTES,
) -> None:
    """Write normalized documents as partitioned JSONL."""
    writer = df.write.mode(mode)
    if cap_file_bytes:
        writer = writer.option(
            "maxRecordsPerFile", estimate_max_records_per_file(df, cap_file_bytes)
        )
    if partition_by and partition_by in df.columns:
        writer = writer.partitionBy(partition_by)
    writer.json(path)


def read_documents(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S9 — JSONL readback (validation path)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)

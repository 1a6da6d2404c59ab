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


def finalize_filenames(
    spark: SparkSession,
    output_dir: str,
    *,
    stem: str = "shipment",
    suffix: str = ".json",
) -> list[str]:
    """S7 — rename part-files to the reference's naming contract.

    ``<partition>/part-*.json`` -> ``<partition>/<stem>_<tag>_<n>.jsonl``
    where ``tag`` is derived from the partition directory value (e.g.
    ``source_group=2024-01`` -> ``202401``) and ``n`` is a 1-based counter
    continuing from any files already present (reference
    `src/writer.py:59-77`). Driver-side metadata operation via the Hadoop
    FS API — works on object stores as well as local paths.
    """
    import re

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(output_dir)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []

    renamed: list[str] = []
    dirs = [s.getPath() for s in fs.listStatus(root) if s.isDirectory()]
    for d in dirs or [root]:
        dname = d.getName()
        tag = dname.split("=", 1)[1] if "=" in dname else dname
        tag = re.sub(r"[^0-9A-Za-z]", "", tag).lower() or "all"
        pattern = re.compile(rf"^{re.escape(stem)}_{re.escape(tag)}_(\d+)\.jsonl$")
        existing = 0
        parts = []
        for s in fs.listStatus(d):
            name = s.getPath().getName()
            m = pattern.match(name)
            if m:
                existing = max(existing, int(m.group(1)))
            elif name.startswith("part-") and name.endswith(suffix):
                parts.append(s.getPath())
        for i, p in enumerate(sorted(parts, key=lambda x: x.getName()), start=existing + 1):
            target = jvm.org.apache.hadoop.fs.Path(d, f"{stem}_{tag}_{i}.jsonl")
            fs.rename(p, target)
            renamed.append(target.toString())
    return renamed


def read_documents(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S9 — JSONL readback (validation path)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)

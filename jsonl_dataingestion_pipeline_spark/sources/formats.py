"""Uniform multi-format table IO (parquet / orc / jsonl / csv).

One facade over Spark's native readers/writers so pipeline code is
format-agnostic: ``read_table(spark, path)`` sniffs the format from the
extension (or takes it explicitly), ``write_table`` round-trips with the
same conventions the dedicated shipment CSV / JSONL modules use.

Scale notes: parquet and ORC are the columnar paths (predicate pushdown,
column pruning, footer-stats file skipping — see `write_zordered` for
layout); JSONL/CSV scans are line-splittable so they parallelize, but
every query pays full-row parsing — land raw text data into parquet/ORC
early and keep JSONL for the document-interchange sink only.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "json", "csv")

_EXT_TO_FORMAT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
    ".csv": "csv",
}


def sniff_format(path: str, spark: Optional[SparkSession] = None) -> str:
    """Format from the file/dir extension; directories of part-files
    (a Spark output dir) are sniffed from their first data file.

    Extensionless directories on object storage (``s3a://``,
    ``abfss://``, ``hdfs://`` …) are probed through the Hadoop
    FileSystem API when ``spark`` is passed; without a session only the
    local filesystem can be listed, so remote callers must either pass
    ``spark`` or give ``format`` explicitly to :func:`read_table`."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXT_TO_FORMAT:
        return _EXT_TO_FORMAT[ext]
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.startswith(("_", ".")):
                continue
            sub = os.path.splitext(name)[1].lower()
            if sub in _EXT_TO_FORMAT:
                return _EXT_TO_FORMAT[sub]
    elif spark is not None:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory():
            names = sorted(
                st.getPath().getName() for st in fs.listStatus(jpath)
            )
            for name in names:
                if name.startswith(("_", ".")):
                    continue
                sub = os.path.splitext(name)[1].lower()
                if sub in _EXT_TO_FORMAT:
                    return _EXT_TO_FORMAT[sub]
    raise ValueError(f"cannot sniff table format from path: {path!r}")


def read_table(
    spark: SparkSession,
    path: str,
    *,
    format: Optional[str] = None,
    schema: Optional[StructType] = None,
    options: Optional[Mapping[str, str]] = None,
) -> DataFrame:
    """Read a table in any supported format with uniform defaults
    (CSV: header on; JSON: one object per line). Passing ``schema``
    skips inference — ALWAYS do this for JSON/CSV at scale (schema
    inference is an extra full scan of the data)."""
    fmt = format or sniff_format(path, spark)
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    *,
    format: Optional[str] = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    options: Optional[Mapping[str, str]] = None,
) -> None:
    """Write a table in any supported format; ``partition_by`` produces
    the hive-style directory layout every reader here prunes on."""
    fmt = format or sniff_format(path)
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)

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
from pyspark.sql import functions as F
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


def read_binary_files(
    spark: SparkSession,
    path: str,
    *,
    glob: Optional[str] = None,
    recursive: bool = True,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Read opaque blobs (images, audio, video, archives) via Spark's
    built-in ``binaryFile`` source: one row per file with
    (path, modificationTime, length, content).

    This is the 100 TB ingestion path for multimodal payloads sitting in
    object storage: the listing is distributed, each executor reads only
    its own files, and nothing round-trips through the driver.
    ``max_bytes`` filters oversized files at the SOURCE (pushed down by
    the binaryFile reader), protecting executor memory from a stray
    multi-GB blob — binary contents are not splittable, so one file must
    fit in one task.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_media_files(
    spark: SparkSession,
    path: str,
    *,
    glob: Optional[str] = None,
    recursive: bool = True,
    max_bytes: Optional[int] = None,
) -> DataFrame:
    """Blobs -> the package's media-struct convention:
    (path, media: struct<data, mime, width, height, duration_ms>).

    Mime is sniffed from magic bytes with a tiny codegen'd prefix check
    (PNG / WAV / JPEG / AVI — the formats ``operators/multimodal``
    carries real decoders for); anything else is
    ``application/octet-stream``. Width/height/duration stay NULL until
    a decode kernel fills them (``multimodal.media_stats``) — sniffing
    must not require decoding.
    """
    raw = read_binary_files(
        spark, path, glob=glob, recursive=recursive, max_bytes=max_bytes
    )
    head = F.substring(F.col("content"), 1, 12)
    mime = (
        F.when(
            F.substring(head, 1, 8)
            == F.lit(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])),
            F.lit("image/png"),
        )
        .when(
            (F.substring(head, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(head, 9, 4) == F.lit(b"WAVE")),
            F.lit("audio/wav"),
        )
        .when(
            (F.substring(head, 1, 4) == F.lit(b"RIFF"))
            & (F.substring(head, 9, 4) == F.lit(b"AVI ")),
            F.lit("video/avi"),
        )
        .when(
            F.substring(head, 1, 3) == F.lit(bytes([0xFF, 0xD8, 0xFF])),
            F.lit("image/jpeg"),
        )
        .when(
            (F.substring(head, 1, 6) == F.lit(b"GIF87a"))
            | (F.substring(head, 1, 6) == F.lit(b"GIF89a")),
            F.lit("image/gif"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )
    return raw.select(
        F.col("path"),
        F.struct(
            F.col("content").alias("data"),
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("media"),
    )

"""Round-trip tests for the uniform multi-format table IO facade."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.sources.formats import (
    read_table,
    sniff_format,
    write_table,
)


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)],
        "id long, s string, v double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_every_format(spark, tmp_path, fmt):
    df = _frame(spark)
    path = os.path.join(str(tmp_path), f"t_{fmt}")
    write_table(df, path, format=fmt)
    back = read_table(
        spark, path, format=fmt, schema=df.schema
    ).orderBy("id")
    assert [r.asDict() for r in back.collect()] == [
        r.asDict() for r in df.orderBy("id").collect()
    ]


def test_sniff_from_spark_output_dir(spark, tmp_path):
    df = _frame(spark)
    path = os.path.join(str(tmp_path), "out")
    write_table(df, path, format="orc")
    assert sniff_format(path) == "orc"
    assert read_table(spark, path, schema=df.schema).count() == 3


def test_partitioned_write_prunes(spark, tmp_path):
    df = _frame(spark).withColumn("part", F.col("id") % 2)
    path = os.path.join(str(tmp_path), "p")
    write_table(df, path, format="parquet", partition_by=["part"])
    assert os.path.isdir(os.path.join(path, "part=0"))
    back = read_table(spark, path, format="parquet")
    assert back.filter(F.col("part") == 1).count() == 2


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        sniff_format(os.path.join(str(tmp_path), "mystery.bin"))

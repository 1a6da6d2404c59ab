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


def test_read_binary_and_media_files(spark, tmp_path):
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.functions.media import (
        encode_png,
        encode_wav,
    )
    from jsonl_dataingestion_pipeline_spark.sources.formats import (
        read_binary_files,
        read_media_files,
    )

    d = tmp_path / "blobs"
    sub = d / "nested"
    sub.mkdir(parents=True)
    png = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros(64, dtype=np.int16), 8000)
    (d / "a.png").write_bytes(png)
    (sub / "b.wav").write_bytes(wav)
    (d / "c.bin").write_bytes(b"\x00\x01opaque")

    raw = read_binary_files(spark, str(d))
    assert raw.count() == 3  # recursive by default
    assert {"path", "modificationTime", "length", "content"} <= set(raw.columns)

    only_png = read_binary_files(spark, str(d), glob="*.png")
    assert only_png.count() == 1

    capped = read_binary_files(spark, str(d), max_bytes=10)
    assert capped.count() == 1  # only the 8-byte c.bin fits

    media = read_media_files(spark, str(d))
    got = {
        r.path.rsplit("/", 1)[-1]: r.media.mime for r in media.collect()
    }
    assert got == {
        "a.png": "image/png",
        "b.wav": "audio/wav",
        "c.bin": "application/octet-stream",
    }
    row = media.filter(F.col("media.mime") == "image/png").head()
    assert bytes(row.media.data) == png and row.media.width is None


def test_media_files_feed_decode_kernels(spark, tmp_path):
    """The binaryFile source composes with the real decode path."""
    import numpy as np

    from jsonl_dataingestion_pipeline_spark.functions.media import encode_png
    from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
        resize_images,
    )
    from jsonl_dataingestion_pipeline_spark.sources.formats import (
        read_media_files,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    (d / "x.png").write_bytes(encode_png(img))
    df = read_media_files(spark, str(d))
    out = resize_images(df, "media", width=2, height=2).head()
    assert out.media.width == 2 and out.media.height == 2
    assert out.media.mime == "image/png"

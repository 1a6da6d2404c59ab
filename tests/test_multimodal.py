

class TestSniffMime:
    def _sniff(self, spark, hexpay):
        from pyspark.sql import functions as F

        from jsonl_dataingestion_pipeline_spark.operators.multimodal import (
            sniff_mime,
        )

        df = spark.createDataFrame([(hexpay,)], "h string")
        return df.select(
            sniff_mime(F.unhex(F.col("h"))).alias("m")
        ).collect()[0].m

    def test_common_signatures(self, spark):
        assert self._sniff(spark, "ffd8ffe000104a46") == "image/jpeg"
        assert self._sniff(spark, "89504e470d0a1a0a0000") == "image/png"
        assert self._sniff(spark, "474946383961aaaa") == "image/gif"
        assert self._sniff(spark, "255044462d312e34") == "application/pdf"
        assert self._sniff(spark, "504b030414000000") == "application/zip"
        assert self._sniff(spark, "1f8b0800") == "application/gzip"

    def test_riff_disambiguation_needs_byte8_probe(self, spark):
        assert self._sniff(spark, "52494646112233445745425056503820") == "image/webp"
        assert self._sniff(spark, "524946461122334457415645666d7420") == "audio/wav"
        # bare RIFF with neither tag is NOT claimed as webp or wav
        assert self._sniff(spark, "52494646112233440000000000000000") == (
            "application/octet-stream"
        )

    def test_mp4_ftyp_at_offset_4_any_brand(self, spark):
        assert self._sniff(spark, "000000186674797069736f6d") == "video/mp4"
        assert self._sniff(spark, "ffffffff66747970333370") == "video/mp4"

    def test_truncated_and_unknown(self, spark):
        assert self._sniff(spark, "ff") == "application/octet-stream"
        assert self._sniff(spark, "deadbeefdeadbeef") == "application/octet-stream"

"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for a large multi-executor cluster but work unchanged
on ``local[*]``:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy).
- Broadcast threshold raised to 64 MB: every dimension table of the star
  schema (region/nation/customer/supplier/part at any sane SF) should
  broadcast rather than shuffle.
- Arrow enabled for the few pandas_udf paths (simhash, multimodal stubs).
- UTC session timezone so date semantics are reproducible and match the
  DuckDB correctness oracle.
- PySpark DataFrame-debugging origin capture DISABLED
  (``spark.python.sql.dataFrameDebugging.enabled=false``): it costs 3
  py4j round trips + a Python stack walk per DataFrame API call, pure
  driver overhead at any scale. The trade-off is that PySpark error
  messages lose the enriched "origin" call-site context — for ALL
  DataFrame code sharing the session, including the consumer's own.
  Re-enable while debugging via
  ``extra_conf={"spark.python.sql.dataFrameDebugging.enabled": "true"}``.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.session.timeZone": "UTC",
    # PySpark's DataFrame-debugging origin capture costs 3 py4j round
    # trips (conf.get + origin set/clear) plus a Python stack walk per
    # DataFrame API call; across this engine's large Column trees that
    # is pure driver-side overhead at ANY scale (measured: ~26s of a
    # ~90s plan-construction pass over the full headline set,
    # OPTIMIZATION_r10.md). Costs only error-message enrichment.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # One output file rarely needs >1M docs; keeps file sizes bounded for
    # the JSONL sink (reference caps files at 12 MB — see sinks.jsonl).
    "spark.sql.files.maxRecordsPerFile": "0",
}


def get_spark(
    app_name: str = "jsonl-ingestion-spark",
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    extra_conf: Optional[Mapping[str, str]] = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` should be sized to the cluster: ~2-3x total
    cores, or left to AQE coalescing at scale.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""Shared plan-shaping helpers used across operator modules.

``pipeline_break`` started life private to :mod:`operators.dedup`; five
other modules (similarity, vectorize, entity/traindata/webcorpus plans)
grew to need the same barrier, so it lives here as the one public copy
(ADVICE r7). ``operators.dedup._pipeline_break`` remains as an alias for
the existing call sites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pipeline_break(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Eager materialization barrier between pipeline stages.

    ``localCheckpoint`` (default) stores blocks on the executors — fast,
    but an executor loss mid-job kills the lineage and the job. On a real
    cluster pass ``reliable=True`` to use a fault-tolerant ``checkpoint``
    into ``spark.sparkContext.setCheckpointDir(...)`` storage (HDFS/object
    store), which survives executor loss at the cost of one write+read.
    """
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)

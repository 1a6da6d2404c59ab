"""Mergeable-sketch aggregates (Apache DataSketches HLL via Spark SQL).

The 100 TB cardinality pattern: compute a small fixed-size sketch per
fine-grained cell (partition / day / shard), persist it, then answer any
coarser-grained distinct-count by MERGING sketches — no raw-data rescan,
no giant count-distinct shuffle. Spark ships DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so
the whole rollup stays JVM-side with map-side partial aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    coarse_keys: Sequence[str],
    fine_keys: Sequence[str],
    value: str,
    *,
    lg_k: int = 12,
) -> DataFrame:
    """Two-level distinct-count rollup proving sketch mergeability.

    Builds one HLL sketch per (coarse, fine) cell, then merges the fine
    sketches into each coarse group with ``hll_union_agg`` — exactly the
    incremental/rollup path a warehouse takes over persisted sketches.
    Returns per-coarse-group ``estimate`` (from the merged sketch) next
    to ``exact`` (plain count-distinct, for the accuracy gate).
    """
    fine = df.groupBy(*coarse_keys, *fine_keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias("__sk")
    )
    merged = fine.groupBy(*coarse_keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("__sk"))).alias(
            "estimate"
        )
    )
    exact = df.groupBy(*coarse_keys).agg(
        F.count_distinct(F.col(value)).alias("exact")
    )
    return merged.join(exact, list(coarse_keys))

"""Data-repair operators: deterministic imputation, outlier clipping,
and entity-resolution survivorship.

The cleanup steps between profiling (``operators/profile.py`` tells you
a column is 3% null and skewed) and consumption:

- :func:`impute_mode` — fill NULLs with the per-group mode;
- :func:`winsorize` — clip a numeric column to per-group exact
  percentile bounds (the robust alternative to dropping outliers);
- :func:`golden_record` — survivorship after entity resolution: one
  row per cluster with each field's most frequent non-null value
  (majority vote, the standard MDM merge rule).

Every choice is deterministic (ties break toward the smallest value),
so all three replay in the DuckDB oracle. All shuffles are group-keyed
with map-side partials; per-group stats re-enter as AQE-chosen joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _group_mode(df: DataFrame, group: str, col: str, out: str) -> DataFrame:
    """(group, out): most frequent non-null ``col`` per group; ties go
    to the smallest value, so the answer is order-independent."""
    per = (
        df.filter(F.col(col).isNotNull())
        .groupBy(group, col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy(group).orderBy(
        F.col("__n").desc(), F.col(col).asc()
    )
    return (
        per.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col(group), F.col(col).alias(out))
    )


def impute_mode(
    df: DataFrame, value: str, group: str, *, out_col: str | None = None
) -> DataFrame:
    """Fill NULLs in ``value`` with its group's mode (deterministic
    tiebreak). Groups whose every value is NULL stay NULL. NULL group
    keys form their own group (null-safe join), mirroring SQL GROUP BY.
    """
    out_col = out_col or value
    # rename the stats side's key: ``modes`` derives from ``df``, and a
    # same-attribute self-join makes drop()/references ambiguous
    modes = _group_mode(df, group, value, "__mode").withColumnRenamed(
        group, "__g"
    )
    return (
        df.join(modes, on=df[group].eqNullSafe(F.col("__g")), how="left")
        .drop("__g")
        .withColumn(out_col, F.coalesce(F.col(value), F.col("__mode")))
        .drop("__mode")
    )


def winsorize(
    df: DataFrame,
    value: str,
    group: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
    scale: int = 6,
) -> DataFrame:
    """Clip ``value`` into its group's exact [``lo``, ``hi``] percentile
    interval (rounded to ``scale``). NULL values stay NULL — without the
    explicit guard Spark's NULL-skipping GREATEST would silently impute
    NULL to the group's lower bound. Exact percentiles keep it
    oracle-replayable; swap in ``percentile_approx`` at extreme group
    cardinality."""
    out_col = out_col or value
    bounds = df.groupBy(group).agg(
        F.percentile(F.col(value), F.lit(lo)).alias("__lo"),
        F.percentile(F.col(value), F.lit(hi)).alias("__hi"),
    ).withColumnRenamed(group, "__g")
    clipped = F.round(
        F.least(F.greatest(F.col(value), F.col("__lo")), F.col("__hi")),
        scale,
    )
    return (
        df.join(bounds, on=df[group].eqNullSafe(F.col("__g")), how="left")
        .drop("__g")
        .withColumn(
            out_col,
            F.when(F.col(value).isNull(), F.lit(None)).otherwise(clipped),
        )
        .drop("__lo", "__hi")
    )


def golden_record(
    df: DataFrame, cluster: str, fields: Sequence[str]
) -> DataFrame:
    """One survivor row per entity cluster: each field independently
    takes its cluster's most frequent non-null value (majority vote,
    smallest-value tiebreak) — the standard survivorship rule applied
    after duplicate clustering (e.g. ``neardup_clusters`` /
    ``fuzzy_match``). Fields whose cluster values are all NULL stay
    NULL. One mode aggregate per field, all on the cluster key."""
    out = df.select(cluster).distinct()
    for f in fields:
        out = out.join(_group_mode(df, cluster, f, f), on=cluster, how="left")
    return out

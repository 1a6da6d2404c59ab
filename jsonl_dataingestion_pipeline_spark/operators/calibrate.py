"""Per-group score calibration — percentile ranks that make quality
thresholds comparable across sources.

Raw quality scores (heuristic composites, classifier logits, LM
perplexities) are NOT comparable across sources: "keep quality > 0.6"
keeps 90% of one crawl and 4% of another, silently re-weighting the
mixture. The standard fix is rank calibration: replace each score with
its percentile WITHIN its source, then threshold on the percentile —
"keep the top 20% of every source" — so the cut means the same thing
everywhere. (Isotonic/Platt calibration needs labels; percentile
calibration is the label-free version every corpus pipeline actually
ships.)

Determinism: ``percent_rank`` is ``(rank - 1) / (n - 1)`` with
standard SQL tie semantics (ties share a rank) — no tiebreak to get
wrong, identical in Spark and DuckDB, and the emitted percentile is an
integer micro-unit so the oracle compares integers.

Scale: the exact path is one hash shuffle on the group key + a
per-group sort, and ``partitionBy(group)`` routes each ENTIRE source
through one task — fine at gate sizes, a straggler at 100 TB where one
source is terabytes. That is what :func:`bucket_calibrate` is for:
one pass computes ``k`` approximate quantile cuts per group
(fixed-size sketch state, map-side combine), and the calibrated value
is the bucket index — no sort anywhere, error <= 1/k + sketch error.
The exact path is the oracle-gated one; the bucket path is
differential-tested against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def percentile_calibrate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    *,
    threshold: float = 0.8,
    out_prefix: str = "cal",
) -> DataFrame:
    """Exact per-group percentile calibration.

    Appends ``{out_prefix}_pct_u`` (percent_rank in integer
    micro-units, 0..1,000,000) and ``{out_prefix}_pass`` (percentile >=
    ``threshold``). Ties share a percentile (SQL percent_rank
    semantics); a 1-row group calibrates to 0.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    pct = F.percent_rank().over(w)
    # integer-vs-integer comparison: a float literal like 1/3 * 1e6
    # (333333.333...) would flip the exact-boundary row that the
    # documented 'percentile >= threshold' semantics include
    thr_u = int(round(float(threshold) * 1e6))
    pct_u = F.round(pct * 1e6).cast("long")
    return df.select(
        "*",
        pct_u.alias(f"{out_prefix}_pct_u"),
        (pct_u >= F.lit(thr_u)).alias(f"{out_prefix}_pass"),
    )


def bucket_calibrate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    *,
    buckets: int = 100,
    accuracy: int = 10_000,
    out_col: str = "cal_bucket",
) -> DataFrame:
    """Approximate calibration for groups too large to sort: per-group
    ``approx_percentile`` computes ``buckets - 1`` quantile cuts (one
    aggregate, fixed sketch state per group), broadcast back onto the
    data; the calibrated value is the bucket index 0..buckets-1 ≈
    floor(percentile * buckets). No per-group sort anywhere — the 100
    TB path. Differential-tested against :func:`percentile_calibrate`
    (agreement within 1/buckets + sketch error)."""
    qs = [i / buckets for i in range(1, buckets)]
    cuts = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.percentile_approx(
            F.col(score_col), qs, accuracy
        ).alias("__cuts")
    )
    joined = df.join(
        F.broadcast(cuts), on=df[group_col] == F.col("__g")
    ).drop("__g")
    idx = F.aggregate(
        F.col("__cuts"),
        F.lit(0),
        lambda acc, c: acc
        + F.when(F.col(score_col) > c, F.lit(1)).otherwise(F.lit(0)),
    )
    return joined.withColumn(out_col, idx.cast("int")).drop("__cuts")


def group_zscore(
    df: DataFrame,
    value_u_col: str,
    group_col: str,
    *,
    out_col: str = "gz_u",
    scale: int = 6,
) -> DataFrame:
    """Within-group z-score normalization of an INTEGER-grid score —
    the GRPO-style advantage transform (normalize rewards within each
    prompt/source group before cross-group comparison or RL weighting).

    ``value_u_col`` must already be an integer-grid score (micro-units,
    the determinism contract); then the whole statistic reduces to ONE
    exact-integer identity per row:

        z = (v*n - sum) / sqrt(n*sumsq - sum^2)

    numerator and the sqrt argument are exact integer expressions
    (decimal accumulators — no int64 wrap at any corpus size), so the
    only float ops are one sqrt and one division per row — bit-equal on
    any engine and any shuffle layout. Emitted as micro-units.

    Groups with n = 1 or zero variance get NULL (the z-score is
    undefined — surfaced, never faked as 0). Plan: one per-group
    aggregate joined back on the group key (broadcast when the group
    alphabet is small; AQE otherwise), everything else projection.
    """
    v = F.col(value_u_col).cast("decimal(18,0)")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("__gn"),
        F.sum(v).alias("__gs"),
        F.sum(v * v).alias("__gss"),
    )
    j = df.join(stats, on=group_col)
    num = (
        F.col(value_u_col).cast("decimal(38,0)") * F.col("__gn")
        - F.col("__gs")
    )
    den2 = (
        F.col("__gn").cast("decimal(38,0)") * F.col("__gss")
        - F.col("__gs").cast("decimal(38,0)") * F.col("__gs")
    )
    z_u = F.when(
        (F.col("__gn") <= 1) | (den2 <= 0), F.lit(None).cast("long")
    ).otherwise(
        F.round(
            num.cast("double")
            / F.sqrt(den2.cast("double"))
            * F.lit(float(10**scale))
        ).cast("long")
    )
    return j.withColumn(out_col, z_u).drop("__gn", "__gs", "__gss")

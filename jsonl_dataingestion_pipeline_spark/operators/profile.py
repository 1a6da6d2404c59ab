"""Dataset profiling operators: the pre-flight checks for a 100 TB job.

- :func:`profile_columns` — one-pass per-column profile (null rate,
  distinct count, min/max) emitted long-form, one row per column. All
  aggregates ride a single scan with map-side partials — profiling a
  petabyte costs one pass, not one pass per column.
- :func:`key_skew_report` — per-key frequency skew diagnosis for a
  prospective join/groupBy key: top-key share, p50/p99/max counts and
  the max/mean ratio. This is the number you look at before deciding
  between a plain shuffle join, AQE skew handling, or an explicit salt
  (``partitioning.salted_join``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form column profile: (column, n_rows, n_null, null_rate,
    n_distinct, min_repr, max_repr), one row per profiled column.

    Single aggregation over one scan: every metric for every column is
    computed in the same partial-agg pass, then the wide result row is
    unpivoted with a stack/union of literal-named structs (driver-side
    metadata only — no second data pass). min/max are emitted as strings
    so heterogeneous column types share one output schema.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("long").alias(f"__null_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_null"),
            F.round(
                F.try_divide(F.col(f"__null_{c}"), F.col("__n")), 6
            ).alias("null_rate"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_repr"),
            F.col(f"__max_{c}").alias("max_repr"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


def key_skew_report(df: DataFrame, key: str) -> DataFrame:
    """Single-row skew report for a join/groupBy key.

    Two-level aggregate: per-key counts (one shuffle on the key), then a
    global summary (tiny). Returns n_keys, rows, max_count, p50_count,
    p99_count, top_share (heaviest key's fraction of all rows) and
    skew_ratio (max/mean) — skew_ratio >> 1 with a large max_count is
    the signature of a key that needs salting or AQE skew-join.
    """
    per_key = df.groupBy(F.col(key).alias("__k")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__c").cast("long").alias("rows"),
        F.max("__c").cast("long").alias("max_count"),
        F.expr("percentile(__c, 0.5)").cast("double").alias("p50_count"),
        F.expr("percentile(__c, 0.99)").cast("double").alias("p99_count"),
        F.round(F.try_divide(F.max("__c"), F.sum("__c")), 6).alias(
            "top_share"
        ),
        F.round(
            F.try_divide(
                F.max("__c"),
                F.try_divide(F.sum("__c"), F.count(F.lit(1))),
            ),
            6,
        ).alias("skew_ratio"),
    )


def mad_outliers(
    df: DataFrame,
    value: str,
    group: str,
    *,
    k: float = 3.0,
    consistency: float = 1.4826,
    scale: int = 6,
) -> DataFrame:
    """Robust per-group outlier census: median / MAD (median absolute
    deviation) and the count of values beyond ``k`` robust sigmas
    (``|x - med| > k * consistency * MAD``; 1.4826 makes MAD a
    consistent sigma estimator under normality). Median/MAD resist the
    very outliers a mean/stddev rule would absorb — this is the data-
    quality gate to run over a numeric column before trusting it.

    Plan: two group-keyed exact-percentile aggregations (median, then
    MAD over deviations) plus one final census — three shuffles on the
    same group key, each with map-side partials; the tiny per-group
    stats re-enter as group-keyed joins (AQE broadcasts them while
    |groups| is small and falls back to shuffle joins when it is not —
    deliberately NOT a forced broadcast). No global sort, no driver math.
    Exact percentiles keep the operator oracle-replayable; at extreme
    group cardinality swap ``percentile`` for ``percentile_approx``.

    Returns (group, n, med, mad, n_outliers, outlier_share) — values
    rounded to ``scale``.
    """
    g = F.col(group)
    v = F.col(value)
    med = df.groupBy(group).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    dev = df.join(med, on=group).withColumn(
        "__adev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(group).agg(
        F.percentile(F.col("__adev"), F.lit(0.5)).alias("mad")
    )
    flagged = dev.join(mad, on=group).withColumn(
        "__out",
        (F.col("__adev") > F.lit(k) * F.lit(consistency) * F.col("mad"))
        .cast("int"),
    )
    return flagged.groupBy(group).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.first("med"), scale).alias("med"),
        F.round(F.first("mad"), scale).alias("mad"),
        F.sum("__out").cast("long").alias("n_outliers"),
        F.round(F.sum("__out") / F.count(F.lit(1)), scale).alias(
            "outlier_share"
        ),
    )


def psi_report(
    cur: DataFrame,
    ref: DataFrame,
    bucket_col: str,
    *,
    out_col: str = "psi_u",
) -> DataFrame:
    """Population Stability Index drift report between a CURRENT and a
    REFERENCE snapshot of the same bucketed statistic — the standard
    "did this feed's distribution move under us" monitor a corpus
    pipeline runs between crawls/releases (PSI < 0.1 stable, 0.1-0.25
    drifting, > 0.25 act).

    Emits one row per bucket: counts, integer micro-unit shares and the
    bucket's signed PSI contribution ``(p_cur - p_ref) * ln(p_cur /
    p_ref)`` in micro-units (sum the column for the headline PSI).
    Shares are exact integer floor divisions floored at one micro-unit
    (the standard zero-bucket guard, so an empty bucket contributes a
    large-but-finite term instead of ±inf); the only float ops per
    bucket are one ln and one multiply — deterministic on any engine
    and layout.

    Scale: two bucket-key hash aggregates (map-side combine — shuffle
    volume = #buckets, not snapshot size), a full outer join on the
    bucket alphabet, and a one-row totals frame broadcast back. Raises
    (ANSI division) only if a snapshot is empty — an empty snapshot has
    no distribution to compare.

    Contracts: bucket values must be non-NULL (NULL keys do not equate
    under a full join, so a NULL bucket would surface as two
    half-counted rows — coalesce upstream). The share numerators widen
    to decimal(38,0) before the x1e6 scaling (round-9 accumulator
    sweep), so no snapshot row count an int64 can even hold gets near
    an overflow — under ANSI mode a raw int64 product past ~9.2e12
    rows would RAISE mid-job.
    """
    cagg = cur.groupBy(bucket_col).agg(
        F.count(F.lit(1)).cast("long").alias("cur_n")
    )
    ragg = ref.groupBy(bucket_col).agg(
        F.count(F.lit(1)).cast("long").alias("ref_n")
    )
    j = cagg.join(ragg, on=bucket_col, how="full").fillna(
        0, ["cur_n", "ref_n"]
    )
    tot = j.agg(
        F.sum("cur_n").alias("__ct"), F.sum("ref_n").alias("__rt")
    )
    j = j.crossJoin(F.broadcast(tot))
    one = F.lit(1).cast("long")
    pcu = F.greatest(
        one,
        F.expr("(CAST(cur_n AS DECIMAL(38,0)) * 1000000) div __ct"),
    )
    pru = F.greatest(
        one,
        F.expr("(CAST(ref_n AS DECIMAL(38,0)) * 1000000) div __rt"),
    )
    term = F.round(
        (pcu - pru).cast("double")
        * F.log(pcu.cast("double") / pru.cast("double"))
    ).cast("long")
    return j.select(
        bucket_col,
        "cur_n",
        "ref_n",
        pcu.alias("cur_p_u"),
        pru.alias("ref_p_u"),
        term.alias(out_col),
    )

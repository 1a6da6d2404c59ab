"""Deterministic sampling kernels for training-data curation.

``DataFrame.sample()`` draws per-partition, so its output changes with
partitioning, task retries, and engine — useless for reproducible corpus
curation or cross-engine verification. These kernels hash a *key* column
instead: membership is a pure function of the row's key and the seed,
identical on any cluster layout and replayable in the DuckDB oracle
(md5-based, like every other hash in this engine).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _bucket32(key: Column, seed: int) -> Column:
    """Uniform uint32 from md5(seed:key) — the sampling coin."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame,
    key: ColumnOrName,
    fraction: float,
    *,
    seed: int = 0,
) -> DataFrame:
    """Bernoulli sample keyed on ``key``: kept iff hash32 < fraction·2^32.

    Properties the pipeline relies on:
    - reproducible across runs, partitionings, engines;
    - *consistent*: the same key is always in or always out, so sampling
      two tables on a shared key yields joinable samples;
    - nested: a 1% sample is a subset of the 10% sample (same seed).
    Narrow filter — fully pushed into the scan stage, no shuffle.
    """
    threshold = int(fraction * (1 << 32))
    return df.filter(_bucket32(_col(key), seed) < threshold)


def stratified_sample(
    df: DataFrame,
    strata: ColumnOrName,
    fractions: Mapping[str, float],
    key: ColumnOrName,
    *,
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight boilerplate
    sources, keep all rare-language docs). ``fractions`` maps stratum
    value -> keep fraction; unlisted strata get ``default_fraction``.
    Same hash-keyed guarantees as :func:`deterministic_sample`; still a
    narrow filter, no shuffle."""
    h = _bucket32(_col(key), seed)
    thresh: Column = F.lit(int(default_fraction * (1 << 32)))
    for value, frac in sorted(fractions.items()):
        thresh = (
            F.when(_col(strata) == value, F.lit(int(frac * (1 << 32))))
            .otherwise(thresh)
        )
    return df.filter(h < thresh)


def temperature_sample(
    df: DataFrame,
    group: ColumnOrName,
    key: ColumnOrName,
    *,
    alpha: float = 0.5,
    target_n: int,
    seed: int = 0,
) -> DataFrame:
    """Temperature-balanced downsampling across groups (languages,
    domains): group g gets target share ``c_g^alpha / sum(c^alpha)`` of
    ``target_n`` rows — alpha < 1 flattens the distribution toward rare
    groups, the multilingual-LM resampling rule.

    Keep rates are computed from one tiny per-group count aggregate
    (broadcast back), membership is the same hash coin as
    :func:`deterministic_sample` — reproducible on any layout. Rates are
    capped at 1 (downsample-only) and rounded to 6 decimals so the
    float boundary is engine-independent. Adds a ``keep_rate`` column
    (``df`` must not already have one — that would be a silent
    collision, so it raises); a NULL group value is a group of its own
    (null-safe join), not silently dropped.
    """
    if "keep_rate" in df.columns:
        raise ValueError(
            "temperature_sample adds a 'keep_rate' column; input already "
            "has one — rename it first"
        )
    g = _col(group)
    counts = df.groupBy(g.alias("__g")).agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("__c"), F.lit(alpha))).alias("__z")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        F.col("__g"),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_n))
                * F.pow(F.col("__c"), F.lit(alpha))
                / F.col("__z")
                / F.col("__c"),
            ),
            6,
        ).alias("keep_rate"),
    )
    h = _bucket32(_col(key), seed).cast("double") / F.lit(4294967296.0)
    return (
        df.join(F.broadcast(rates), g.eqNullSafe(F.col("__g")))
        .filter(h < F.col("keep_rate"))
        .drop("__g")
    )


def quota_sample(
    df: DataFrame,
    group: ColumnOrName,
    key: ColumnOrName,
    *,
    max_per_group: int,
    seed: int = 0,
) -> DataFrame:
    """Cap each group's contribution at ``max_per_group`` rows (the
    C4-style per-host/per-domain quota that stops one boilerplate-heavy
    source from dominating the corpus).

    Which rows survive an over-quota group is decided by the
    deterministic hash coin (then key, as the total tiebreak), so the
    selection is reproducible on any layout and replayable in SQL. One
    window over the group — Spark compiles the rank+filter to a
    per-partition partial top-k (WindowGroupLimit) before the shuffle,
    so an over-quota group never materializes more than necessary.
    """
    from pyspark.sql.window import Window

    g = _col(group)
    k = _col(key)
    w = Window.partitionBy(g).orderBy(
        _bucket32(k, seed).asc(), k.asc()
    )
    return (
        df.withColumn("__qrk", F.row_number().over(w))
        .filter(F.col("__qrk") <= max_per_group)
        .drop("__qrk")
    )


def split_corpus(
    df: DataFrame,
    key: ColumnOrName,
    weights: Mapping[str, float],
    *,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment keyed on ``key``.

    Each row's uniform coin ``u = hash32(key, seed) / 2^32`` lands in a
    half-open cumulative-weight interval; the matching split name goes
    in ``split_col``. Same guarantees as :func:`deterministic_sample`:
    reproducible across runs/partitionings/engines, consistent per key
    (all rows sharing a key land in the same split — split BY DOCUMENT,
    not by row, by passing the document key), and a narrow projection —
    no shuffle, no driver state, so it costs one codegen'd expression
    at any corpus size.

    ``weights`` must sum to 1 (+-1e-9); iteration order defines the
    interval order, so pass a plain dict in the order you want
    documented. Raises if ``split_col`` already exists.
    """
    if split_col in df.columns:
        raise ValueError(f"column {split_col!r} already exists")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    coin = _bucket32(_col(key), seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        bound = int(acc * (1 << 32))
        cond_val = F.lit(name)
        expr = (
            F.when(coin < bound, cond_val)
            if expr is None
            else expr.when(coin < bound, cond_val)
        )
    last = F.lit(items[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def mix_sources(
    df: DataFrame,
    group: ColumnOrName,
    weight: ColumnOrName,
    key: ColumnOrName,
    targets: Mapping[str, float],
    *,
    seed: int = 0,
) -> DataFrame:
    """Pile-style mixture construction: downsample each group so the
    kept corpus matches the target WEIGHT proportions (tokens, bytes —
    whatever ``weight`` measures), at the largest total the data allows
    without upsampling any group.

    Math: with per-group weight totals ``W_g`` and target fractions
    ``f_g`` (must sum to 1), the max feasible mixture total is
    ``T = min_g(W_g / f_g)`` and each group keeps rate
    ``r_g = T * f_g / W_g`` (the argmin group keeps everything).
    Selection is the deterministic md5 hash coin on ``key`` — so the
    realized proportions converge to the targets in expectation while
    membership stays reproducible across partitionings and engines.

    Plan: one tiny per-group aggregate broadcast back onto the corpus,
    then a narrow filter — the 100 TB side is scanned once and never
    shuffled. Groups missing from ``targets`` are dropped (rate 0).
    Returns the kept subset with a ``keep_rate`` column appended.
    """
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target fractions must sum to 1, got {total}")
    if "keep_rate" in df.columns:
        raise ValueError("column 'keep_rate' already exists")
    g = _col(group)
    wsum = df.groupBy(g.alias("__g")).agg(F.sum(_col(weight)).alias("__w"))
    frac = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv]
    )[F.col("__g")]
    rates = wsum.select(
        "__g",
        F.coalesce(frac, F.lit(0.0)).alias("__f"),
        F.col("__w").cast("double").alias("__w"),
    )
    t_max = rates.filter(F.col("__f") > 0).agg(
        F.min(F.col("__w") / F.col("__f")).alias("__t")
    )
    rated = rates.crossJoin(F.broadcast(t_max)).select(
        "__g",
        F.when(F.col("__f") > 0, F.least(
            F.lit(1.0), F.col("__t") * F.col("__f") / F.col("__w")
        )).otherwise(F.lit(0.0)).alias("keep_rate"),
    )
    out = df.join(
        F.broadcast(rated), g.eqNullSafe(F.col("__g")), "inner"
    ).drop("__g")
    coin = _bucket32(_col(key), seed).cast("double")
    return out.filter(coin < F.col("keep_rate") * F.lit(float(1 << 32)))


def scaling_ladder(
    df: DataFrame,
    key_col: str,
    *,
    fractions: "Sequence[float]" = (0.01, 0.1, 0.5, 1.0),
    seed: int = 0,
) -> DataFrame:
    """Nested subset ladder for data-scaling ablations (the
    Kaplan/Chinchilla-style data ladder: every smaller training set
    must be CONTAINED in every larger one, or the ablation confounds
    data content with data quantity; the same consistent-hashing trick
    underlies consistent sampling generally).

    One md5 coin per row (``_bucket32``), one integer threshold per
    fraction — membership in fraction ``f`` is ``coin < floor(f *
    2^32)``, so nesting holds BY CONSTRUCTION (threshold
    monotonicity), retries and repartitions can't change membership,
    and adding a rung later never reshuffles existing rungs. Appends:

    - ``ladder_coin`` — the uint32 coin (auditable);
    - ``ladder_tier`` — index of the SMALLEST fraction containing the
      row (long; NULL if even the largest excludes it) — membership
      in ``fractions[i]`` is ``ladder_tier <= i``, a one-predicate
      filter the optimizer pushes into the scan.

    Zero-shuffle projection. ``fractions`` must be strictly
    increasing.
    """
    fr = list(fractions)
    if any(b <= a for a, b in zip(fr, fr[1:])):
        raise ValueError("fractions must be strictly increasing")
    coin = _bucket32(F.col(key_col), seed=seed)
    thresholds = [min(int(f * 2**32), 2**32) for f in fr]
    tier = F.lit(None).cast("long")
    for i in range(len(fr) - 1, -1, -1):
        tier = F.when(
            coin < F.lit(thresholds[i]), F.lit(i).cast("long")
        ).otherwise(tier)
    return df.select(
        "*", coin.alias("ladder_coin"), tier.alias("ladder_tier")
    )

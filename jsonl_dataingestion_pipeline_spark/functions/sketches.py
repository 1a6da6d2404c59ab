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

from pyspark.sql import Column, DataFrame, Window
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


def _cms_bucket(j, key, width: int):
    """Row ``j``'s bucket for ``key``: top-32-bits of md5(j:key) mod
    width — deterministic, engine-independent (the DuckDB oracle
    replays the identical arithmetic)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(j.cast("string"), F.lit(":"), key)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % F.lit(width)
    )


def cms_sketch(
    df: DataFrame,
    key: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of ``key``'s frequency distribution (Cormode &
    Muthukrishnan 2005): ``depth`` hash rows x ``width`` buckets, each
    cell the count of keys hashing into it.

    The 100 TB shape: the input is exploded ``depth``-fold but the
    aggregation state is FIXED at depth*width cells (map-side partial
    combine collapses everything before the shuffle), so the shuffle
    carries at most depth*width rows per map task no matter how many
    distinct keys exist — this is the sketch to use when even the HLL
    answer "how many" isn't enough and you need "how often" per key
    without materializing a full frequency table. Sketches are
    mergeable by summing cells (groupBy (j, bucket) over shards).

    Returns (j, bucket, cnt) — depth*width rows max.
    """
    k = F.col(key).cast("string")
    rows = df.select(
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("j"),
        k.alias("__k"),
    )
    return (
        rows.select(
            "j", _cms_bucket(F.col("j"), F.col("__k"), width).alias("bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: estimate(key) = min over hash rows of the
    key's cell. Guarantees estimate >= true count (never undercounts);
    overcounts by collision mass bounded by e*N/width w.p. 1-e^-depth.

    The sketch is depth*width rows — always the broadcast side; the
    probe is a narrow explode + broadcast join + min-aggregate, so
    estimating any number of keys costs one scan of the keys.
    """
    k = F.col(key).cast("string")
    probes = keys_df.select(
        F.col(key),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("j"), k, width))
    return (
        probes.join(F.broadcast(sketch), on=["j", "bucket"], how="left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002
# ---------------------------------------------------------------------------
_KMV_SPACE = float(16 ** 15)  # md5 15-hex-char prefix = 60-bit hash space


def _kmv_hash(c: Column) -> Column:
    """Deterministic 60-bit hash of a value (md5 prefix, as in the
    minhash/bloom family) — what makes the WHOLE sketch, including its
    estimate, bit-replayable by the DuckDB oracle (unlike HLL, whose
    register layout is library-private)."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    *,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct sketch: the ``k`` smallest distinct hash
    values of ``value_col``. Returns (``by``..., kmv: array<long>).

    Mergeable by construction — the union's k smallest is computable
    from the parts' k smallest (:func:`kmv_merge`), which is what makes
    per-partition/per-day sketches roll up without rescanning. Memory
    is bounded: after the (group, hash) dedup, the per-group cut is a
    rank-filter window that compiles to WindowGroupLimit (partial top-k
    per partition — a billion-member group never materializes).
    """
    gcols = list(by)
    hashed = (
        df.select(*gcols, _kmv_hash(F.col(value_col)).alias("__h"))
        .dropDuplicates([*gcols, "__h"])
    )
    w = Window.partitionBy(*gcols).orderBy(F.col("__h").asc())
    cut = hashed.withColumn("__r", F.row_number().over(w)).filter(
        F.col("__r") <= k
    )
    return cut.groupBy(*gcols).agg(
        F.array_sort(F.collect_list("__h")).alias("kmv")
    )


def kmv_merge(a: Column, b: Column, *, k: int = 64) -> Column:
    """Merge two KMV arrays: k smallest of the union (distinct)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(kmv: Column, *, k: int = 64, scale: int = 4) -> Column:
    """Distinct-count estimate from a KMV array.

    Exact when the group had fewer than ``k`` distinct values (the
    sketch IS the distinct hash set); otherwise the Bar-Yossef
    estimator (k-1)/u_k with u_k = kth-smallest hash normalized to
    (0,1]. Deterministic — the oracle replays the estimate itself.
    """
    n = F.size(kmv)
    # try_element_at: the < k branch leaves no valid kth element, and
    # when/otherwise does not guarantee lazy branch evaluation
    u_k = F.try_element_at(kmv, F.lit(k)).cast("double") / F.lit(_KMV_SPACE)
    return F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / u_k, scale)
    )


def kmv_intersect_count(a: Column, b: Column, *, k: int = 64) -> Column:
    """|{h in merge(a,b) : h in a AND h in b}| — the agreement count of
    the Beyer et al. (2007) KMV set-algebra estimators. Pure array
    expressions over two bounded sketches."""
    m = kmv_merge(a, b, k=k)
    return F.size(
        F.filter(
            m,
            lambda x: F.array_contains(a, x) & F.array_contains(b, x),
        )
    ).cast("int")


def kmv_jaccard_u(a: Column, b: Column, *, k: int = 64) -> Column:
    """Jaccard similarity estimate of the two sketched sets in integer
    micro-units: agreement count over merged-sketch size — exact
    integer arithmetic on two bounded arrays (NULL if both empty)."""
    m = kmv_merge(a, b, k=k)
    n = F.size(m)
    ic = kmv_intersect_count(a, b, k=k).cast("long")
    # floor of the double ratio is exact here: both operands are exact
    # ints < 2^53 and a non-integer p/q with q <= 2k can never sit
    # within a double ulp of an integer
    ratio = F.floor((ic * F.lit(1_000_000)).cast("double") / n).cast(
        "long"
    )
    return F.when(n > 0, ratio).otherwise(F.lit(None).cast("long"))


def kmv_union_estimate(
    a: Column, b: Column, *, k: int = 64, scale: int = 4
) -> Column:
    """|A ∪ B| estimate: the Bar-Yossef estimator applied to the merged
    sketch (k smallest of the union of distinct hashes)."""
    return kmv_estimate(kmv_merge(a, b, k=k), k=k, scale=scale)


def kmv_intersect_estimate(
    a: Column, b: Column, *, k: int = 64, scale: int = 4
) -> Column:
    """|A ∩ B| estimate = (agreement/|merge|) * |A ∪ B| — the KMV
    set-algebra composition: both factors come from the same two
    bounded sketches, no rescan of either snapshot."""
    m = kmv_merge(a, b, k=k)
    rho = kmv_intersect_count(a, b, k=k).cast("double") / F.greatest(
        F.size(m), F.lit(1)
    ).cast("double")
    return F.round(rho * kmv_estimate(m, k=k, scale=8), scale)

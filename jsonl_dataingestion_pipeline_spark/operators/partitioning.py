"""Partitioning utilities for 100 TB-scale joins and writes.

- :func:`salted_join` — break a skewed join key across ``n`` salted
  sub-keys: the skewed (large) side gets a random-but-seeded salt, the
  small side is replicated n times. Complements AQE skew-join (which
  splits oversized partitions at runtime) for the pathological case where
  a SINGLE key exceeds an executor.
- :func:`write_bucketed` / co-located joins — pre-shuffle once at write
  time so repeated joins/aggregations on the bucket key run shuffle-free.
- :func:`repartition_for_output` — size output partitions by target bytes
  (estimated from a sample) so sinks produce sanely-sized files.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ColumnOrName = Union[Column, str]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with key salting for single-hot-key skew.

    ``large`` rows get ``salt = floor(rand(seed)·n)``; ``small`` is
    exploded to every salt value; the join key becomes (key, salt), so one
    hot key spreads across ``n`` tasks. Result equals ``large.join(small,
    on, how)`` for inner/left joins (small-side rows are replicated, never
    multiplied per result row).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.floor(F.rand(seed) * salt_buckets).cast("int")
    l = large.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = l.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    *,
    num_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist a table hash-bucketed on ``bucket_cols``.

    Two tables bucketed identically join WITHOUT a shuffle (Spark reuses
    the on-disk hash distribution) — the right trade for fact tables that
    are joined on the same key repeatedly. ``sort_cols`` additionally
    pre-sorts within buckets, removing the sort from sort-merge joins.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def repartition_for_output(
    df: DataFrame,
    *,
    target_bytes: int = 128 * 1024 * 1024,
    sample_rows: int = 256,
    by: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Repartition so each output partition serializes to ~``target_bytes``.

    Estimates bytes/row from a bounded sample (driver-side, one small
    job), then repartitions to ceil(total/target). With ``by``, performs a
    hash repartition on those columns instead of round-robin — use for
    partitioned sinks so each writer task owns few partitions.
    """
    n = df.count()
    if n == 0:
        return df
    sample = (
        df.limit(sample_rows)
        .select(F.octet_length(F.to_json(F.struct("*"))).alias("sz"))
        .agg(F.avg("sz"))
        .first()[0]
        or 1024.0
    )
    parts = max(1, int(n * float(sample) // target_bytes) + 1)
    if by:
        return df.repartition(parts, *[F.col(c) for c in by])
    return df.repartition(parts)


def zorder_key(cols: Sequence[Column], *, bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave ``bits`` low bits of each
    column. Rows close in EVERY dimension get close keys, so range-
    partitioning + sorting on this key co-locates multidimensional
    neighborhoods — parquet row-group min/max stats then prune scans on
    ANY of the interleaved dimensions, not just the leading sort column
    (the Delta/Iceberg OPTIMIZE ZORDER layout trick, done with plain
    Column arithmetic).

    Inputs must be non-negative integers already bucketized to
    ``2^bits`` (caller picks the resolution). Pure shift/mask/sum tree —
    whole-stage codegen, replayable in any SQL engine.

    ``bits * len(cols)`` must fit in the 63 value bits of a signed long;
    beyond that the interleave would set the sign bit (negative keys
    that break range-partition ordering), so it raises instead. With
    the default ``bits=16`` that means at most 3 dimensions — pass a
    smaller ``bits`` for 4+.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits * n} exceeds the 63 "
            f"value bits of a signed long; lower bits (e.g. "
            f"bits={63 // n}) for {n} dimensions"
        )
    key: Column = F.lit(0).cast("long")
    for b in range(bits):
        for ci, c in enumerate(cols):
            key = key + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                b * n + ci,
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 16,
    num_files: int = 32,
) -> None:
    """Write parquet laid out by Z-order: range-partition on the Morton
    key (one skew-aware sampled shuffle), sort within each partition,
    drop the key. Each output file then covers a tight hyper-rectangle
    of the key space — selective filters on any ``cols`` dimension skip
    most files via footer stats."""
    zk = zorder_key([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("__zk", zk)
        .repartitionByRange(num_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
        .write.mode("overwrite")
        .parquet(path)
    )


def shuffle_shards(
    df: DataFrame,
    key: ColumnOrName,
    *,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training-data shuffle, sharded for parallel
    export: every row gets a ``(shard, pos)`` coordinate such that
    reading shard 0..n-1 each in ``pos`` order yields a fixed
    pseudo-random permutation of the corpus — the pre-training
    dataloader contract (shuffle once, globally, reproducibly), without
    ever running the global-ORDER-BY anti-pattern.

    Both coordinates derive from the same md5 coin as the sampling
    kernels (pure function of ``key`` and ``seed``): shard =
    ``hash32 mod n_shards``, pos = rank of ``(hash32, key)`` within the
    shard. A re-run, a different partitioning, or another engine
    (the DuckDB oracle) produces the identical permutation.

    Scale shape: ONE shuffle keyed on the shard (the per-shard
    ``row_number`` window), never a global sort — with ``n_shards``
    sized to the cluster (hundreds+), each window partition is
    corpus/n_shards rows and all shards rank in parallel. Epoch
    re-shuffles are free: bump ``seed``. Collisions on the 32-bit coin
    fall back to ``key`` order, so ties are still deterministic."""
    if shard_col in df.columns or pos_col in df.columns:
        raise ValueError(
            f"shuffle_shards adds {shard_col!r}/{pos_col!r}; input "
            "already has one — rename it first"
        )
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        _bucket32,
        _col,
    )

    k = _col(key)
    coin = _bucket32(k, seed)
    w = Window.partitionBy(F.col(shard_col)).orderBy(coin.asc(), k.asc())
    return (
        df.withColumn(shard_col, (coin % n_shards).cast("int"))
        .withColumn(pos_col, F.row_number().over(w))
    )

"""Distributed Bloom-filter membership — the crawl-frontier "URL seen?"
primitive and the generic big-set membership pre-filter.

Why Spark-shaped this way: the classic 100 TB membership problem is a
probe table too big to semi-join cheaply against a build set too big to
broadcast as rows — but whose BITMAP fits comfortably (1 Gbit = 128 MB
covers ~10^8 members at ~1% FPR with k=7). So:

- **Build** is two aggregates: explode each member into its k bit
  positions (md5-derived, so both engines and any future system compute
  identical positions), partial-aggregate ``bit_or`` per 64-bit word —
  at most m/64 groups — then assemble ONE row holding the dense
  ``array<long>`` bitmap via ``map_from_entries`` + ``transform``
  (missing words -> 0). No collect: the bitmap never touches the
  driver.
- **Probe** is zero-shuffle: the one-row bitmap crossJoins in as a
  broadcast (the same one-row-broadcast shape as the large-k k-means
  assignment) and membership is a pure projection — ``element_at`` +
  bitwise AND over the k positions. A "maybe" requires ALL k bits set;
  misses are EXACT (no false negatives), hits are probabilistic with
  the standard (1 - e^{-kn/m})^k FPR.

Determinism: positions are ``md5(value || '#' || i)`` truncated to 60
bits mod m — byte-identical in DuckDB SQL, so even the false positives
replay exactly cross-engine (the q142 oracle asserts them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(col, m_bits: int, k: int):
    """The k md5-derived bit positions of a value (deterministic,
    engine-portable 60-bit hash mod m)."""
    return [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(f"#{i}"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long") % m_bits
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, col: str, *, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the Bloom bitmap over ``df[col]``: returns ONE row with
    ``bitmap array<long>`` of length ceil(m_bits/64). NULL values are
    skipped (NULL is never a member). See module note for plan shape."""
    n_words = (m_bits + 63) // 64
    pos = F.explode(
        F.array(*_positions(F.col(col), m_bits, k))
    ).alias("__p")
    words = (
        df.filter(F.col(col).isNotNull())
        .select(pos)
        .selectExpr(
            "CAST(FLOOR(__p / 64) AS BIGINT) AS __w",
            "SHIFTLEFT(CAST(1 AS BIGINT), CAST(__p % 64 AS INT)) AS __b",
        )
        .groupBy("__w")
        .agg(F.bit_or("__b").alias("__bits"))
    )
    one = words.groupBy().agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__m")
    )
    return one.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("long")),
                F.lit(0).cast("long"),
            ),
        ).alias("bitmap")
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col`` (boolean): True iff ALL k bit positions of
    ``df[col]`` are set in ``bloom``'s bitmap (built with the SAME
    m_bits/k). Zero shuffle: one-row broadcast crossJoin + projection.
    NULL values probe to NULL."""
    joined = df.crossJoin(
        F.broadcast(bloom.select(F.col("bitmap").alias("__bloom_bitmap")))
    )
    tmp = joined
    for i, p in enumerate(_positions(F.col(col), m_bits, k)):
        tmp = tmp.withColumn(f"__bp{i}", p)
    maybe = F.expr(
        " AND ".join(
            f"(element_at(__bloom_bitmap, CAST(FLOOR(__bp{i} / 64) AS INT)"
            f" + 1) & SHIFTLEFT(CAST(1 AS BIGINT),"
            f" CAST(__bp{i} % 64 AS INT))) != 0"
            for i in range(k)
        )
    )
    return (
        tmp.withColumn(out_col, F.when(F.col(col).isNotNull(), maybe))
        .drop("__bloom_bitmap", *[f"__bp{i}" for i in range(k)])
    )

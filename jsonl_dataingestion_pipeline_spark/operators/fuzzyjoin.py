"""Deletion-neighborhood fuzzy join (FastSS, Bocek et al. 2007;
popularized as SymSpell): find all cross-frame string pairs within
Levenshtein distance ``k`` WITHOUT a quadratic comparison.

The FastSS property: if ``ed(a, b) <= k`` then the k-deletion
neighborhoods of ``a`` and ``b`` intersect — so generating every
string obtainable by deleting up to ``k`` characters, equi-joining on
those variants, and exact-verifying the survivors is COMPLETE (no
false negatives; the variant join only over-generates, and the
``levenshtein`` filter removes false positives). This is a genuinely
different scale shape from blocking + pairwise distance
(``plans/entity.py``): candidate volume is bounded by neighborhood
sizes (``O(len^k)`` variants per string, len choose k), not by block
population — the right tool for short strings (names, titles, codes)
where a popular block would otherwise go quadratic.

Plan: one Generate per side (the variant explode), one equi-join on
the variant, a distinct, and one codegen ``levenshtein`` verify — all
shuffles keyed by variant/pair, no window, no crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(c: Column, k: int) -> Column:
    """All strings obtainable from ``c`` by deleting AT MOST ``k``
    characters (including ``c`` itself), distinct. Built by ``k``
    rounds of single-deletion expansion — pure array HOFs."""
    vs = F.array(c)
    for _ in range(k):
        one_del = F.flatten(
            F.transform(
                vs,
                lambda s: F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
                    lambda i: F.concat(
                        F.substring(s, 1, (i - 1).cast("int")),
                        F.substring(
                            s.cast("string"),
                            (i + 1).cast("int"),
                            (F.length(s) - i).cast("int"),
                        ),
                    ),
                ),
            )
        )
        vs = F.array_distinct(F.concat(vs, one_del))
    return vs


def deletion_neighborhood_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """All cross-frame pairs with ``levenshtein(left.text, right.text)
    <= k``: ``(left_id, right_id, left_text, right_text, dist)``.

    - Complete by the FastSS property (pytest pins equality with the
      brute-force cross join on a planted corpus; the q221 oracle IS
      the brute force — a stronger gate than replaying the plan).
    - ``max_len`` guards the ``O(len^k)`` variant fanout: longer
      strings are dropped from BOTH sides (logged contract — fuzzy
      joins of this family are for short strings; document-scale
      near-dup belongs to the MinHash/substring operators).
    - Identical ids on both sides are NOT excluded — callers doing a
      self-join drop ``left_id = right_id`` themselves (and should
      also dedupe the symmetric pair).
    """
    if k < 1 or k > 2:
        raise ValueError("k must be 1 or 2 (variant fanout is len^k)")

    def side(df: DataFrame, tag: str) -> DataFrame:
        t = F.col(text_col)
        base = df.filter(F.length(t) <= max_len).select(
            F.col(id_col).alias(f"{tag}_id"), t.alias(f"{tag}_text")
        )
        # Parallelism floor (optimization guide §2.5 input skew): the
        # O(len^k) variant generation amplifies CPU well past its input
        # bytes, so it must not stay pipelined into a degenerate
        # few-split scan (one small single-row-group file = ONE task
        # generating every variant). Repartition ONLY when the input
        # has fewer partitions than defaultParallelism — a no-op on a
        # real many-split scan. (.rdd is safe here: the inputs are
        # scan-rooted projections, no AQE stages to trigger.)
        sc = base.sparkSession.sparkContext
        if base.rdd.getNumPartitions() < sc.defaultParallelism:
            base = base.repartition(sc.defaultParallelism)
        return base.select(
            f"{tag}_id",
            f"{tag}_text",
            F.explode(_deletion_variants(F.col(f"{tag}_text"), k))
            .alias("__v"),
        )

    l = side(left, "left")
    r = side(right, "right")
    # Verify BEFORE deduplicating (guide §2.3 shuffle fewer bytes): a
    # pair sharing m variants re-verifies m times (m is tiny — codegen
    # levenshtein on short strings), but the distinct then shuffles
    # only the SURVIVING matches instead of every candidate pair with
    # both text payloads attached. dist is a function of the pair, so
    # carrying it through distinct leaves the row set unchanged.
    dist = F.levenshtein(F.col("left_text"), F.col("right_text"))
    return (
        l.join(r, "__v")
        .select(
            "left_id", "right_id", "left_text", "right_text",
            dist.cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= k)
        .distinct()
    )

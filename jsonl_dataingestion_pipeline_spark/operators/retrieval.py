"""Hybrid-retrieval primitives: fusing independent ranked lists.

The standard shape of a modern retrieval stack is several independent
rankers over the same corpus — lexical BM25, dense cosine ANN, maybe a
recency or quality prior — fused into one list. Reciprocal-rank fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) is the robust default: each
list contributes ``1 / (k + rank)`` per document and the fused score is
the sum, so no score calibration across rankers is needed — only ranks.

Spark-first shape: each input list is already a per-query top-N (small
by construction — rankers cut to N before fusion), so fusion is a
union of narrow (id, contribution) projections, one groupBy-sum, and a
sort+limit (``TakeOrderedAndProject``) — never a global window over an
uncut relation. With ``by`` columns (per-query fusion over a batch of
queries), the cut is a rank-filter window that compiles to
``WindowGroupLimit`` (partial top-k per partition).

Determinism contract: contributions are exact IEEE divisions
``1/(k+rank)`` — identical in any engine; with two input lists the
per-document sum has a single association (addition is commutative), so
the fused score replays bit-for-bit in the DuckDB oracle; the rounding
(default 1e-9) guards the 3+-list case where partial-sum association
could differ. Ties break on document id.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
    by: Sequence[str] = (),
    scale: int = 9,
) -> DataFrame:
    """Fuse ranked lists by reciprocal-rank fusion.

    Each DataFrame in ``rankings`` needs ``id_col`` and an integer
    ``rank_col`` (1-based; documents absent from a list simply
    contribute nothing). Returns (``by``..., ``id_col``, rrf_score,
    fused_rank) cut to ``topk`` rows (per ``by`` group when given).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    bycols = list(by)
    contribs = [
        r.select(
            *bycols,
            F.col(id_col).alias("__id"),
            (
                F.lit(1.0)
                / (F.lit(float(k)) + F.col(rank_col).cast("double"))
            ).alias("__c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionAll(b), contribs)
    fused = u.groupBy(*bycols, "__id").agg(
        F.round(F.sum("__c"), scale).alias("rrf_score")
    )
    if bycols:
        w = Window.partitionBy(*bycols).orderBy(
            F.col("rrf_score").desc(), F.col("__id").asc()
        )
        return (
            fused.withColumn("fused_rank", F.row_number().over(w))
            .filter(F.col("fused_rank") <= topk)
            .select(
                *bycols,
                F.col("__id").alias(id_col),
                "rrf_score",
                F.col("fused_rank").cast("int").alias("fused_rank"),
            )
        )
    top = fused.orderBy(
        F.col("rrf_score").desc(), F.col("__id").asc()
    ).limit(topk)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("__id").asc())
    return top.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    ).select(F.col("__id").alias(id_col), "rrf_score", "fused_rank")

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


def negative_samples(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    *,
    k: int = 4,
    seed: int = 0,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Deterministic random negative sampling for contrastive training:
    ``k`` pseudo-random corpus rows per anchor, reproducible across
    runs, partitionings, and engines (md5-coin indexing — the sampling
    kernels' idiom).

    Spark-first shape: the corpus gets a contiguous 0-based global rank
    by ``id_col`` WITHOUT a global sort — the q143 two-phase prefix sum
    (per-bucket row_number + broadcast bucket-offset join). Each
    (anchor, slot) computes ``md5(seed:anchor:slot) mod N`` and
    equi-joins the rank index — anchors * k narrow rows against an
    |corpus|-row integer index, one shuffle. Anchors drawn as their own
    negative are dropped (deterministically), so callers get <= k
    negatives per anchor.

    Returns (anchor_id, slot, neg_id).

    ``id_col`` must be numeric: the bucket key is ``floor(id /
    bucket_size)`` (keeps the rank index identical to the ORDER BY id
    contract the oracle replays). A string id would cast to NULL and
    silently collapse every row into one bucket — the single-task
    global sort this operator exists to avoid — so it raises instead.
    """
    from pyspark.sql.types import NumericType

    id_type = corpus.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise ValueError(
            f"negative_samples: id_col {id_col!r} must be numeric for "
            f"bucketed ranking (got {id_type.simpleString()}); add a "
            "numeric surrogate (e.g. xxhash64(id)) upstream"
        )
    ids = corpus.select(F.col(id_col).alias("__nid"))
    b = F.floor(F.col("__nid") / F.lit(int(bucket_size))).cast("long")
    local_w = Window.partitionBy("__b").orderBy("__nid")
    local = ids.withColumn("__b", b).withColumn(
        "__local", F.row_number().over(local_w).cast("long")
    )
    totals = local.groupBy("__b").agg(F.count(F.lit(1)).alias("__bt"))
    prefix_w = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        "__b",
        F.coalesce(F.sum("__bt").over(prefix_w), F.lit(0)).alias("__pre"),
    )
    index = local.join(F.broadcast(prefix), on="__b").select(
        (F.col("__pre") + F.col("__local") - 1).alias("__rank"),
        "__nid",
    )
    n1 = F.broadcast(ids.agg(F.count(F.lit(1)).alias("__n")))
    cand = (
        anchors.select(F.col(id_col).alias("anchor_id"))
        .crossJoin(n1)
        .select(
            "anchor_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(int(k) - 1))
            ).alias("slot"),
            F.col("__n"),
        )
        .withColumn(
            "__rank",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(str(seed)),
                            F.col("anchor_id").cast("string"),
                            F.col("slot").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % F.col("__n"),
        )
    )
    return (
        cand.join(index, on="__rank")
        .filter(F.col("__nid") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("slot").cast("int").alias("slot"),
            F.col("__nid").alias("neg_id"),
        )
    )


def rank_metrics(
    df: DataFrame,
    query_col: str,
    id_col: str,
    score_col: str,
    rel_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Retrieval-quality metrics per query — MRR, hit/precision@k and
    nDCG@k — over a (query, candidate, score, binary relevance) frame.

    The evaluation loop every retrieval stack (BM25 / hashed cosine /
    ANN) runs against labeled judgments. Ranking is (score DESC, id
    ASC) — layout-independent under score ties. nDCG is STANDARD
    nDCG@k: the ideal ranking places min(k, total relevant in the
    judged pool) relevant docs first, so a query that retrieves 1 of
    its 5 judged-relevant docs at rank 1 scores nDCG < 1 (an earlier
    revision derived IDCG from the retrieved top-k only, which
    systematically flattered recall failures — ADVICE r8). Both
    engines still derive IDCG from one integer count.

    Determinism: every per-rank term is quantized to integer
    micro-units BEFORE summation (round(1e6·rel/log2(rank+1))), so the
    per-query sums are exact integer sums — shuffle-order independent;
    the only float op per rank is one IEEE log2. Divisions are integer
    floor divisions.

    Scale: the rank<=k cut compiles to WindowGroupLimit (a partial
    per-group top-k before and after the query-key shuffle — never a
    global sort); the metric aggregate then sees at most k rows per
    query. The pool-relevance count is a second query-keyed aggregate
    over the same input (map-side partial sums, same shuffle key) —
    this operator never joins or re-shuffles the corpus.
    """
    from pyspark.sql.window import Window

    judged = df.select(
        query_col,
        id_col,
        score_col,
        F.col(rel_col).cast("int").alias("__rel"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    top = judged.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    dcg_term = F.round(
        F.lit(1e6) * F.col("__rel") / F.log2(F.col("__rk") + 1)
    ).cast("long")
    agg = top.groupBy(query_col).agg(
        F.sum("__rel").cast("long").alias("hits"),
        F.min(
            F.when(F.col("__rel") == 1, F.col("__rk"))
        ).alias("__first_rel"),
        F.sum(dcg_term).alias("dcg_u"),
    )
    # standard nDCG@k: IDCG covers min(k, relevant in the FULL judged
    # pool) positions, counted over the input frame (not the top-k cut)
    pool = judged.groupBy(query_col).agg(
        F.sum("__rel").cast("long").alias("__pool_rel")
    )
    ideal = F.least(F.col("__pool_rel"), F.lit(int(k)).cast("long"))
    # sequence upper bound is floored at 1: Spark does not guarantee
    # when/otherwise branch laziness (see sketches.py kmv_estimate), and
    # sequence(1, 0) would step DOWN to [1, 0] whose i=1 term divides by
    # log2(1) = 0 — the when-guard below already zeroes the ideal=0 case
    idcg = F.aggregate(
        F.sequence(
            F.lit(1), F.greatest(ideal, F.lit(1).cast("long")).cast("int")
        ),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.round(F.lit(1e6) / F.log2(i + 1)).cast("long"),
    )
    staged = agg.join(pool, on=query_col).select(
        query_col,
        "hits",
        F.coalesce(
            F.expr("1000000 div __first_rel"), F.lit(0).cast("long")
        ).alias("mrr_u"),
        F.expr(f"(hits * 1000000) div {int(k)}").cast("long").alias(
            "prec_u"
        ),
        "dcg_u",
        F.when(ideal > 0, idcg)
        .otherwise(F.lit(0).cast("long"))
        .alias("idcg_u"),
    )
    return staged.withColumn(
        "ndcg_u",
        F.when(
            F.col("idcg_u") > 0, F.expr("(dcg_u * 1000000) div idcg_u")
        ).otherwise(F.lit(0).cast("long")),
    )

"""Budgeted data selection: take the highest-scoring documents until
a token budget fills — the selection rule behind quality-ranked corpus
curation (DataComp-LM / DsDm-style "rank by score, keep the top slice
that fits the training budget"; FineWeb-Edu's classifier-score cut is
the same shape with a threshold instead of a budget).

The naive expression — ``SUM(n) OVER (ORDER BY score DESC)`` — is the
same scale anti-pattern ``operators/packing.py`` documents: an
unpartitioned ordered window serializes the corpus through one task.
This module reuses the two-phase prefix-sum idea with SCORE-BAND
buckets as the range-contiguous key: per-band local cumsums run in
parallel, band totals (one tiny frame) take the only single-partition
window, and the global running total is band-prefix + local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def select_by_budget(
    df: DataFrame,
    id_col: str,
    score_col: str,
    n_col: str,
    *,
    budget: int,
    score_bucket_width: int = 1000,
) -> DataFrame:
    """Per-document selection coordinates under a token budget:
    ``(id, score, n, cum_tokens, selected)``.

    - Order is (score DESC, id ASC) — deterministic under score ties.
    - ``cum_tokens`` = running token total INCLUDING this document in
      that order; ``selected`` = ``cum_tokens <= budget`` (documents
      are atomic — the boundary document that would overflow is
      excluded, the standard doc-granular rule).
    - ``score_bucket_width`` bands the integer score for the parallel
      prefix (any width gives identical output; width trades band
      count against band population — pick so the hottest band stays
      task-sized).

    Plan: one keyed window per band (parallel), one band-count
    aggregate, one single-partition window over #bands rows, one
    broadcast join. Never a global sort of the corpus.
    """
    s = F.col(score_col).cast("long")
    local = (
        df.select(
            F.col(id_col),
            s.alias("__s"),
            F.col(n_col).cast("long").alias("__n"),
        )
        .withColumn(
            "__band",
            (
                -(
                    F.col("__s")
                    - F.pmod(F.col("__s"), F.lit(score_bucket_width))
                )
                / F.lit(score_bucket_width)
            ).cast("long"),
        )
        .withColumn(
            "__cum",
            F.sum("__n").over(
                Window.partitionBy("__band")
                .orderBy(F.col("__s").desc(), F.col(id_col).asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    totals = local.groupBy("__band").agg(F.sum("__n").alias("__bt"))
    prefix_w = Window.orderBy("__band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        "__band",
        F.coalesce(F.sum("__bt").over(prefix_w), F.lit(0)).alias("__pre"),
    )
    cum = (F.col("__pre") + F.col("__cum")).cast("long")
    return local.join(F.broadcast(prefix), "__band").select(
        F.col(id_col),
        F.col("__s").alias(score_col),
        F.col("__n").alias(n_col),
        cum.alias("cum_tokens"),
        (cum <= F.lit(budget)).alias("selected"),
    )

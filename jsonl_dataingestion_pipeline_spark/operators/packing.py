"""Training sequence packing: map every document to its token offsets
in the virtual concat-all-docs token stream, and to the fixed-length
training sequences it lands in (the GPT-pretraining dataloader
transform: concatenate the corpus in a deterministic order, cut every
``seq_len`` tokens).

The naive Spark expression — ``SUM(n) OVER (ORDER BY id)`` — is a
scale ANTI-pattern: an unpartitioned ordered window collapses the
whole corpus into ONE task. This module implements the distributed
two-phase prefix sum instead:

1. **bucket** rows by a range-contiguous key (``floor(order/bucket)``
   — explicit, so the layout is deterministic and oracle-replayable,
   unlike sampled ``repartitionByRange`` boundaries);
2. **local pass**: per-bucket running totals via a window PARTITIONED
   by bucket — every bucket in parallel, no global sort;
3. **prefix pass**: per-bucket totals (one small aggregate — one row
   per bucket, driver-scale) get an exclusive running sum; this tiny
   frame is the only single-partition window, and it broadcast-joins
   back onto the data.

Global offset = bucket prefix + local running total − n. Cost: one
shuffle for the bucketed window, one broadcast — scan-speed at any
corpus size, identical results to the single-window SQL (the oracle
runs exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    n_col: str,
    order_col: str,
    *,
    seq_len: int,
    bucket_size: int = 100_000,
) -> DataFrame:
    """Per-document packing coordinates in the ``order_col``-ordered
    token stream cut every ``seq_len`` tokens.

    Returns (``order_col``, n_tokens, tok_start, seq_first, seq_last,
    n_seqs): ``tok_start`` = global offset of the document's first
    token; ``seq_first``/``seq_last`` = the first/last sequence index
    the document overlaps; ``n_seqs`` = how many sequences it spans
    (boundary-crossing docs span > 1 — the quantity loss-masking and
    doc-attention implementations need). Zero-token documents occupy
    no sequence: NULL/NULL/0.

    ``bucket_size`` is the range width of the parallel prefix buckets
    (see module note); any value gives identical output.
    """
    b = F.floor(F.col(order_col) / F.lit(bucket_size)).cast("long")
    local_w = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        df.select(
            F.col(order_col),
            F.col(n_col).cast("long").alias("__n"),
        )
        .withColumn("__b", b)
        .withColumn("__local_end", F.sum("__n").over(local_w))
    )
    totals = local.groupBy("__b").agg(F.sum("__n").alias("__bt"))
    prefix_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.select(
        "__b",
        F.coalesce(F.sum("__bt").over(prefix_w), F.lit(0)).alias("__pre"),
    )
    start = F.col("__pre") + F.col("__local_end") - F.col("__n")
    has = F.col("__n") > 0
    seq_first = F.when(has, F.floor(start / seq_len)).cast("long")
    seq_last = F.when(
        has, F.floor((start + F.col("__n") - 1) / seq_len)
    ).cast("long")
    return (
        local.join(F.broadcast(prefix), on="__b")
        .select(
            F.col(order_col),
            F.col("__n").alias("n_tokens"),
            start.cast("long").alias("tok_start"),
            seq_first.alias("seq_first"),
            seq_last.alias("seq_last"),
            F.coalesce(
                seq_last - seq_first + 1, F.lit(0)
            ).cast("long").alias("n_seqs"),
        )
    )

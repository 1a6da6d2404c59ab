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
    keep: "tuple[str, ...]" = (),
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
    (see module note); any value gives identical output. ``keep``
    names extra ``df`` columns to carry through (rides the local pass
    — no join back onto the input, and the input lineage is evaluated
    once).
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
            *[F.col(c) for c in keep],
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
            *[F.col(c) for c in keep],
            F.col("__n").alias("n_tokens"),
            start.cast("long").alias("tok_start"),
            seq_first.alias("seq_first"),
            seq_last.alias("seq_last"),
            F.coalesce(
                seq_last - seq_first + 1, F.lit(0)
            ).cast("long").alias("n_seqs"),
        )
    )


def semantic_pack(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_col: str = "n_tokens",
    seq_len: int,
    n_cells: int = 8,
    bucket_size: int = 100_000,
) -> DataFrame:
    """In-context pretraining packing (ICP, Shi et al. 2023 "In-Context
    Pretraining: Language Modeling Beyond Document Boundaries"): order
    documents SEMANTICALLY before cutting fixed-length training
    sequences, so each context window holds related documents instead
    of random concatenation — the transform behind measurable
    long-context gains, and a pure composition of operators this
    engine already verifies:

    1. deterministic centroid seed + broadcast nearest-centroid argmax
       (:func:`..similarity.make_centroids` / :func:`..similarity.
       assign_cells` — the IVF building blocks);
    2. within-cell semantic order: ``row_number`` over (cosine to own
       centroid DESC, id) — a window PARTITIONED by cell, every cell
       in parallel;
    3. cell base offsets: one tiny aggregate (``n_cells`` rows) gets
       an exclusive prefix sum and broadcast-joins back — the global
       semantic order ``cell_base + cell_rank - 1`` is dense in
       ``[0, N)`` without ever sorting the corpus globally;
    4. :func:`pack_sequences` over that order (the two-phase
       distributed prefix sum) cuts the ``seq_len`` windows.

    Returns ``(id, cell_id, cell_rank, sem_order, n_tokens, tok_start,
    seq_first, seq_last, n_seqs)``.

    Scale notes: the only data-sized shuffles are the assignment
    groupBy and the per-cell window; at 100 TB pick ``n_cells`` so the
    expected cell holds a bounded shard (cells ~ N / target_cell_size
    — ICP itself uses many thousands of clusters), which also bounds
    the per-cell sort. The centroid and cell-base frames are
    ``n_cells`` rows — always broadcast-sized.
    """
    from jsonl_dataingestion_pipeline_spark.operators.similarity import (
        assign_cells,
        make_centroids,
    )

    centroids = make_centroids(
        corpus, n_cells, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_cells(
        corpus,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        keep=(n_col,),
        with_sim=True,
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.col("cell_sim").desc(), F.col(id_col).asc()
    )
    ranked = (
        assigned.select(
            F.col(id_col), F.col("cell_id"), F.col(n_col),
            F.col("cell_sim"),
        )
        .withColumn("cell_rank", F.row_number().over(w))
        .drop("cell_sim")
    )
    counts = ranked.groupBy("cell_id").agg(F.count(F.lit(1)).alias("__cn"))
    pw = Window.orderBy("cell_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = counts.select(
        "cell_id",
        F.coalesce(F.sum("__cn").over(pw), F.lit(0)).alias("__base"),
    )
    ordered = ranked.join(F.broadcast(bases), on="cell_id").select(
        F.col(id_col),
        F.col("cell_id"),
        F.col("cell_rank"),
        (F.col("__base") + F.col("cell_rank") - 1)
        .cast("long")
        .alias("sem_order"),
        F.col(n_col),
    )
    packed = pack_sequences(
        ordered, n_col, "sem_order", seq_len=seq_len,
        bucket_size=bucket_size, keep=(id_col, "cell_id", "cell_rank"),
    )
    return packed.select(
        id_col, "cell_id", "cell_rank", "sem_order",
        "n_tokens", "tok_start", "seq_first", "seq_last", "n_seqs",
    )


def length_bucket_batches(
    df: DataFrame,
    order_col: str,
    len_col: str,
    *,
    bucket_width: int,
    batch_size: int,
    sub_bucket: int = 100_000,
) -> DataFrame:
    """Length-bucketed dynamic batching (the NMT/fairseq
    ``bucket_by_sequence_length`` transform every trainer uses:
    group sequences of similar length so per-batch padding-to-max
    waste stays small, instead of padding every batch to the corpus
    max). One row per sequence: ``(order_col, n, bucket, rank, batch,
    batch_n, batch_max, pad_waste, efficiency_u)``.

    - ``bucket`` = ``len div bucket_width`` — the similar-length band;
    - ``rank`` = the sequence's 1-based position within its bucket in
      ``order_col`` order, computed with the module's two-phase
      pattern: a ``row_number`` PARTITIONED BY (bucket, range
      sub-bucket) — bounded work per task — plus an exclusive prefix
      of sub-bucket counts (one small per-bucket frame) broadcast
      back. NO bucket-global sort: a 10^9-sequence bucket never lands
      on one task;
    - ``batch`` = ``(rank - 1) div batch_size`` — deterministic,
      partition-layout-independent batch assignment;
    - per-batch audit columns: ``batch_max * batch_n - batch_sum`` is
      the exact padded-token waste, ``efficiency_u`` the exact
      floor-division utilization in micro-units — THE number this
      transform exists to improve (vs. one global bucket).
    """
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    odt = dict(df.dtypes).get(order_col, "")
    if not (odt in numeric or odt.startswith("decimal")):
        # the sub-bucket key is floor(order / sub_bucket) — it needs a
        # numeric, range-contiguous order column (a string id would
        # NULL the join key under non-ANSI and crash under ANSI)
        raise ValueError(
            f"order_col {order_col!r} must be numeric (got {odt!r})"
        )
    local_w = Window.partitionBy("__lb", "__sub").orderBy(order_col)
    local = (
        df.select(
            F.col(order_col),
            F.col(len_col).cast("long").alias("__n"),
        )
        .withColumn(
            "__lb",
            F.floor(F.col("__n") / F.lit(bucket_width)).cast("long"),
        )
        .withColumn(
            "__sub",
            F.floor(F.col(order_col) / F.lit(sub_bucket)).cast("long"),
        )
        .withColumn("__lr", F.row_number().over(local_w).cast("long"))
    )
    counts = local.groupBy("__lb", "__sub").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    prefix_w = (
        Window.partitionBy("__lb")
        .orderBy("__sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = counts.select(
        "__lb",
        "__sub",
        F.coalesce(F.sum("__c").over(prefix_w), F.lit(0)).alias("__pre"),
    )
    ranked = local.join(F.broadcast(prefix), ["__lb", "__sub"]).select(
        F.col(order_col),
        F.col("__n"),
        F.col("__lb"),
        (F.col("__pre") + F.col("__lr")).alias("__rank"),
    )
    r0 = F.col("__rank") - 1
    ranked = ranked.withColumn(
        "__batch",
        ((r0 - F.pmod(r0, F.lit(batch_size))) / F.lit(batch_size)).cast(
            "long"
        ),
    )
    stats = ranked.groupBy("__lb", "__batch").agg(
        F.count(F.lit(1)).cast("long").alias("batch_n"),
        F.max("__n").alias("batch_max"),
        F.sum("__n").alias("__bsum"),
    )
    padded = F.col("batch_max") * F.col("batch_n")
    num = F.col("__bsum") * F.lit(1_000_000).cast("long")
    eff = (
        F.when(padded > 0, (num - F.pmod(num, padded)) / padded)
        .otherwise(F.lit(0))
        .cast("long")
    )
    stats = stats.select(
        "__lb",
        "__batch",
        "batch_n",
        "batch_max",
        (padded - F.col("__bsum")).alias("pad_waste"),
        eff.alias("efficiency_u"),
    )
    return ranked.join(stats, ["__lb", "__batch"]).select(
        F.col(order_col),
        F.col("__n").alias("n"),
        F.col("__lb").alias("bucket"),
        F.col("__rank").alias("rank"),
        F.col("__batch").alias("batch"),
        "batch_n",
        "batch_max",
        "pad_waste",
        "efficiency_u",
    )

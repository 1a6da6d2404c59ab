"""Hashed bag-of-n-grams linear-classifier inference (fastText-style).

The production quality-filter shape (CCNet's Wikipedia-reference
classifier, the Llama/Gopher quality classifiers, toxicity filters):
a trained linear model over hashed token/bigram features, applied to
every document in the corpus. Training happens offline; what the
engine must do at 100 TB is the INFERENCE join-and-fold:

- featurize: unigrams + bigrams, each hashed into ``n_features``
  buckets (md5-based, deterministic cross-engine — same idiom as the
  minhash kernels);
- model-as-table: weights live in a (bucket, weight) DataFrame — the
  realistic deployment shape (weights arrive from a training job's
  output table, not source code). It is tiny by construction, so the
  feature join is a **broadcast** hash join; the only shuffle is the
  per-document partial-aggregated sum.
- score: mean feature weight + bias = the logit. The emitted columns
  are the rounded logit and the thresholded label — NOT the sigmoid:
  sigmoid is monotone (the label is identical), while ``exp`` is a
  libm call whose last-ulp behavior differs across engines and would
  poison exact replay. Callers who want probabilities apply
  ``F.expit``-style post-processing on their side of the boundary.

Every arithmetic step is +,*,%,/ on integers/doubles plus md5 — exact
cross-engine, so the whole inference pass is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import tokens

# weight synthesis constants (Knuth multiplicative + a large prime):
# w(b) spreads over [-1, 1] deterministically from the bucket id alone
_W_MULT = 2_654_435_761
_W_PRIME = 2_000_003


def default_weight_table(
    spark: SparkSession, n_features: int = 1024, scale: int = 6
) -> DataFrame:
    """A deterministic stand-in for a trained weight vector:
    (bucket, weight) with weight = ((b*K + 99991) % P)/P * 2 - 1,
    rounded. Swap in a real training job's output table in production —
    the inference plan is identical (it only requires the table to be
    broadcast-small, which k features guarantee)."""
    return spark.range(n_features).select(
        F.col("id").alias("bucket"),
        F.round(
            ((F.col("id") * _W_MULT + 99991) % _W_PRIME)
            / F.lit(float(_W_PRIME)) * 2.0 - 1.0,
            scale,
        ).alias("weight"),
    )


def _bucket(term: Column, n_features: int) -> Column:
    """md5-based feature hash: first 15 hex chars -> bigint -> mod."""
    return (
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")
        % n_features
    )


def _terms_expr(text_col: str, include_bigrams: bool) -> Column:
    toks = F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
    if not include_bigrams:
        return toks
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_features: int = 1024,
    include_bigrams: bool = True,
    outer: bool = False,
) -> DataFrame:
    """Explode each document into its hashed feature multiset:
    (``id_col``, bucket). Unigrams plus (optionally) space-joined
    bigrams, empty tokens dropped. One narrow projection + explode —
    no shuffle. With ``outer=True`` a zero-term document yields one
    (id, NULL) row instead of vanishing (explode_outer), so downstream
    per-document aggregates keep every document without a join-back."""
    terms = _terms_expr(text_col, include_bigrams)
    explode = F.explode_outer if outer else F.explode
    return df.select(
        F.col(id_col), explode(terms).alias("__term")
    ).select(
        F.col(id_col), _bucket(F.col("__term"), n_features).alias("bucket")
    )


# The shared integer-GD contract (fast_sigmoid, round_half_away, the
# residual/update/accumulator steps) lives in operators/common.py so
# this loop and operators/preference.py::bt_strengths can never drift
# apart (VERDICT r8 item 6). Re-exported here for existing importers.
from jsonl_dataingestion_pipeline_spark.operators.common import (  # noqa: F401,E501
    decimal_grad_sum,
    fast_sigmoid,
    gd_update_scalar,
    round_half_away,
    sigmoid_residual_u,
)


def train_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    *,
    n_features: int = 1024,
    iterations: int = 5,
    lr: float = 1.0,
    bias: float = 0.0,
    include_bigrams: bool = True,
    unit_weights: bool = False,
) -> DataFrame:
    """Distributed full-batch gradient-descent training of the hashed
    linear classifier whose inference is :func:`classify`.

    The 100 TB discipline is the kmeans/PQ pattern (clustering.py,
    pq.py module notes): per iteration, ONE pass over the checkpointed
    per-(doc, bucket) feature frame — weights ride along as a broadcast
    table (never a model shuffle), then ONE Exchange: the per-bucket
    gradient aggregate. The per-document logit window reuses the
    persisted repartition(id) layout — persist, not localCheckpoint,
    because the InMemoryRelation advertises its partitioning while a
    checkpointed LogicalRDD does not (measured: the checkpoint form
    re-hashed the full feature frame every iteration). The only driver
    state is the k-feature weight vector itself (collected once per
    iteration, n_features rows).

    Integer-exact / shuffle-order-independent by construction:

    - weights live on the 1e-9 integer grid (``wu`` BIGINT nano-units);
    - the per-document logit numerator is an exact integer sum
      ``zu = sum(cnt * wu)`` (decimal accumulator — no int64 wrap);
    - the per-document residual ``p - y`` (p = :func:`fast_sigmoid`)
      quantizes ONCE to the 1e-9 grid (``q = round((p-y)*1e9/n)``), so
      the per-bucket gradient ``gu = sum(q * cnt)`` is again an exact
      integer sum;
    - the update rounds back to the grid:
      ``wu -= round(lr * gu / n_docs)``.

    Every float op in between is per-row (deterministic); every SUM is
    over integers. A DuckDB replay with the iterations unrolled as CTEs
    matches bit-for-bit — the q177 battery leg proves it.

    ``label_col`` must be 0.0/1.0 (cast to double). Documents with zero
    terms carry no feature rows and do not influence training. Returns
    the (bucket, weight DOUBLE) table :func:`classify` consumes
    (weight = wu/1e9), with every bucket present (untouched buckets
    keep weight 0.0). With ``unit_weights=True`` the raw nano-unit
    table (bucket, __wu BIGINT) is returned instead, so a caller can
    keep scoring on the exact integer path (the q177 battery leg).
    """
    from pyspark.sql.window import Window

    if iterations < 1:
        raise ValueError("train_classifier: iterations must be >= 1")
    spark = df.sparkSession
    feats = hashed_features(
        df, text_col, id_col,
        n_features=n_features, include_bigrams=include_bigrams,
    )
    y = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    base = (
        feats.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
        .join(y, on=id_col)
    )
    base = base.withColumn(
        "__n",
        F.sum("__cnt").over(Window.partitionBy(id_col)).cast("long"),
    )
    # one corpus materialization; every iteration re-reads these
    # blocks. persist (NOT localCheckpoint): the InMemoryRelation
    # advertises the repartition(id) layout, so the per-doc window
    # needs no Exchange in any iteration — measured: a checkpointed
    # base (LogicalRDD, unknown partitioning) re-hashed the full
    # feature frame every iteration
    base = base.repartition(F.col(id_col)).persist()
    n_docs = base.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError(
            "train_classifier: no document yields any hashed feature "
            "(all texts empty/whitespace?)"
        )

    wu = [0] * n_features
    win = Window.partitionBy(id_col)
    for _ in range(iterations):
        wdf = spark.createDataFrame(
            [(b, int(u)) for b, u in enumerate(wu)], "bucket long, __wu long"
        )
        joined = base.join(F.broadcast(wdf), on="bucket")
        zu = F.sum(
            F.col("__cnt").cast("decimal(18,0)") * F.col("__wu")
        ).over(win)
        z = (
            zu.cast("double")
            / (F.col("__n").cast("double") * F.lit(1e9))
            + F.lit(float(bias))
        )
        q = sigmoid_residual_u(
            z, F.col("__y"), over=F.col("__n").cast("double")
        )
        grads = (
            joined.withColumn("__q", q)
            .groupBy("bucket")
            .agg(
                decimal_grad_sum(
                    F.col("__q"), weight=F.col("__cnt")
                ).alias("__gu")
            )
            .collect()
        )
        for r in grads:
            wu[r["bucket"]] = gd_update_scalar(
                wu[r["bucket"]], r["__gu"], lr, n_docs
            )

    base.unpersist()
    wdf = spark.createDataFrame(
        [(b, int(u)) for b, u in enumerate(wu)], "bucket long, __wu long"
    )
    if unit_weights:
        return wdf
    return wdf.select(
        "bucket",
        (F.col("__wu").cast("double") / F.lit(1e9)).alias("weight"),
    )


def classify(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame,
    *,
    n_features: int = 1024,
    bias: float = 0.0,
    threshold: float = 0.0,
    include_bigrams: bool = True,
    scale: int = 6,
) -> DataFrame:
    """Linear-classifier inference over every document.

    Returns (``id_col``, n_terms: bigint, logit: double, label:
    'keep'|'drop') — logit = bias + mean(weight over hashed terms),
    rounded to ``scale``; label thresholds the logit. Documents with
    zero terms get logit = bias: ``explode_outer`` keeps them as a
    NULL-bucket row, so no join-back is needed — the whole pass is one
    broadcast weight lookup + one per-document partial-aggregated sum
    (the only shuffle).

    Order-independence contract (the r10 q20 post-mortem): ``weights``
    must lie on a decimal grid no finer than 1e-9
    (:func:`default_weight_table` rounds at 1e-6;
    :func:`train_classifier` emits wu/1e9). Each weight then converts
    EXACTLY to integer nano-units, the per-document sum is an exact
    integer sum — identical under every partitioning/merge order — and
    the only float arithmetic is one per-row division chain + round.
    The previous shape summed DOUBLEs across rows, so any sibling plan
    change that re-partitioned the input could flip a rounded 6th
    decimal (exactly the r10 q20_doc_quality hash regression)."""
    feats = hashed_features(
        df, text_col, id_col,
        n_features=n_features, include_bigrams=include_bigrams,
        outer=True,
    )
    # weight -> exact nano-units; decimal accumulator (no int64 wrap)
    wu = F.round(F.col("weight") * F.lit(1e9)).cast("decimal(38,0)")
    scored = (
        feats.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").cast("long").alias("n_terms"),
            F.sum(wu).alias("__swu"),
        )
        .select(
            F.col(id_col),
            "n_terms",
            F.when(
                F.col("n_terms") > 0,
                F.round(
                    F.lit(float(bias))
                    + F.coalesce(F.col("__swu").cast("double"), F.lit(0.0))
                    / F.lit(1e9)
                    / F.col("n_terms").cast("double"),
                    scale,
                ),
            )
            .otherwise(F.lit(round(float(bias), scale)))
            .alias("logit"),
        )
    )
    return scored.withColumn(
        "label",
        F.when(F.col("logit") >= threshold, F.lit("keep")).otherwise(
            F.lit("drop")
        ),
    )

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
    (the only shuffle)."""
    feats = hashed_features(
        df, text_col, id_col,
        n_features=n_features, include_bigrams=include_bigrams,
        outer=True,
    )
    scored = (
        feats.join(F.broadcast(weights), on="bucket", how="left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").cast("long").alias("n_terms"),
            F.sum("weight").alias("__sw"),
        )
        .select(
            F.col(id_col),
            "n_terms",
            F.when(
                F.col("n_terms") > 0,
                F.round(
                    F.lit(float(bias))
                    + F.coalesce(F.col("__sw"), F.lit(0.0))
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

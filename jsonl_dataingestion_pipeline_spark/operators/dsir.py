"""DSIR-style data selection via importance resampling.

The published recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", NeurIPS — public method): score
every raw-corpus document by the log-likelihood ratio of its hashed
n-gram features under a TARGET-corpus feature distribution versus the
RAW-corpus one, then sample without replacement proportionally to the
exponentiated ratio via the Gumbel top-k trick. This is the standard
"give me raw web data that looks like my high-quality target" selector
that sits between dedup and tokenization in an LLM data pipeline.

Scale shape (the whole point at 100 TB):

- featurization reuses the fastText-style md5 feature hasher from
  ``functions.classifier`` (unigrams + bigrams into ``n_features``
  buckets) — exact cross-engine, no UDF;
- each corpus contributes ONE bounded aggregate: (bucket, count) with
  at most ``n_features`` groups, map-side partial — the feature
  distributions never exceed broadcast size regardless of corpus bytes;
- the log-ratio table is ``n_features`` rows and enters the per-doc
  scoring join as a BROADCAST build side; per-doc weights are one
  partial-aggregated sum (the only data-sized shuffle);
- resampling is Gumbel top-k: key = weight + Gumbel(md5(id, seed)),
  taken with ``orderBy().limit(n)`` — Catalyst plans TakeOrdered
  (per-partition top-n, driver merge of n rows per partition), never a
  global sort.

Determinism / oracle replay: md5 bucketing, +,*,/ on doubles, and
``ln`` rounded to ``scale`` decimals — the same exact-replay idiom as
``functions/classifier.py`` (hashing) and ``textstats.bigram_logprob``
(post-libm rounding), both oracle-green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.classifier import _bucket, _terms_expr

# md5 15-hex-char prefix range: [0, 16^15) = [0, 2^60)
_U_DENOM = float(2**60 + 1)


def _features(df: DataFrame, text_col: str, id_col, n_features: int):
    """(id?, bucket) — one row per hashed unigram/bigram occurrence.
    ``id_col=None`` drops the id (distribution fitting needs counts
    only, so the explode stays narrow)."""
    term = F.explode(_terms_expr(text_col, include_bigrams=True)).alias(
        "__term"
    )
    cols = ([F.col(id_col)] if id_col else []) + [term]
    out = df.select(*cols)
    return out.select(
        *([F.col(id_col)] if id_col else []),
        _bucket(F.col("__term"), n_features).alias("__bucket"),
    )


def dsir_log_ratio_table(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    *,
    n_features: int = 1024,
    alpha: float = 1.0,
    scale: int = 6,
) -> DataFrame:
    """(bucket, lr): per-bucket log importance ratio
    ``ln p_target(b) - ln p_raw(b)`` under add-``alpha`` smoothed
    hashed-feature unigram models. At most ``n_features`` rows —
    broadcast-joinable by construction. Each corpus costs one bounded
    (bucket, count) aggregate plus a 1-row total; buckets absent from a
    corpus get the smoothed floor, so the table always covers the full
    bucket range."""
    spark = raw.sparkSession

    def dist(df, cnt_name, tot_name):
        c = (
            _features(df, text_col, None, n_features)
            .groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )
        t = c.agg(F.sum(cnt_name).cast("double").alias(tot_name))
        return c, t

    rc, rt = dist(raw, "__cr", "__nr")
    tc, tt = dist(target, "__ct", "__nt")
    b = spark.range(n_features).select(F.col("id").alias("__bucket"))
    denom = F.lit(alpha * n_features)
    return (
        b.join(F.broadcast(rc), on="__bucket", how="left")
        .join(F.broadcast(tc), on="__bucket", how="left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "__bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("__nt"), F.lit(0.0)) + denom)
                )
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("__nr"), F.lit(0.0)) + denom)
                ),
                scale,
            ).alias("__lr"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    ratio_table: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n_features: int = 1024,
    scale: int = 6,
) -> DataFrame:
    """One row per raw document: (``id_col``, n_feats BIGINT,
    weight DOUBLE) where weight = sum of the broadcast log-ratio over
    the document's hashed features (the DSIR log importance weight).
    Zero-feature documents keep weight 0.0 via the left join-back.

    Order-independence (r11 float-sum sweep): ``__lr`` is per-row
    rounded to the 10^-scale grid, so each value converts EXACTLY to
    integer grid units; the cross-row sum is an exact integer sum
    (identical under any partitioning), and the only float arithmetic
    is one division + round per row. The previous DOUBLE sum was
    re-rounded onto the same grid (error would have to reach half a
    grid step to flip — far from any realistic accumulation), but the
    integer sum removes even that bound from the argument."""
    g = float(10 ** scale)
    lru = F.round(F.col("__lr") * F.lit(g)).cast("decimal(38,0)")
    per_doc = (
        _features(raw, text_col, id_col, n_features)
        .join(F.broadcast(ratio_table), on="__bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(
                F.sum(lru).cast("double") / F.lit(g), scale
            ).alias("weight"),
        )
    )
    return (
        raw.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias(
                "n_feats"
            ),
            F.coalesce(F.col("weight"), F.lit(0.0)).alias("weight"),
        )
    )


def gumbel_key(id_col, weight_col, *, seed: int, scale: int = 6):
    """weight + Gumbel noise keyed on md5(id, seed): the Gumbel top-k
    trick makes ``ORDER BY key DESC LIMIT n`` an exact sample WITHOUT
    replacement proportional to exp(weight). Deterministic — the
    "noise" is a hash, so Spark and the SQL oracle replay it bit-alike
    (u in (0,1) from the md5 60-bit prefix; g = -ln(-ln(u)))."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(1)
    ) / F.lit(_U_DENOM)
    return F.round(F.col(weight_col) - F.log(-F.log(u)), scale)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    *,
    n_features: int = 1024,
    alpha: float = 1.0,
    seed: int = 13,
    scale: int = 6,
) -> DataFrame:
    """End-to-end DSIR selection: fit both hashed-feature
    distributions, weight every raw document, Gumbel-top-``n`` sample.
    Returns (``id_col``, n_feats, weight, sample_key) for the selected
    documents — ties on the rounded key break by id for exact replay."""
    lr = dsir_log_ratio_table(
        raw, target, text_col,
        n_features=n_features, alpha=alpha, scale=scale,
    )
    w = dsir_weights(
        raw, lr, text_col, id_col, n_features=n_features, scale=scale
    )
    keyed = w.withColumn(
        "sample_key", gumbel_key(id_col, "weight", seed=seed, scale=scale)
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    ).limit(n)

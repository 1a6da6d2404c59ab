"""Distributed PCA over embedding columns (``array<float>``).

The classic embedding-pipeline preprocessor: center, rotate onto the
principal axes, optionally whiten — used before IVF/PQ indexing, for
embedding compression, and as the de-correlation step SemDeDup-style
pipelines apply before cosine thresholds.

Split the work by where each piece is small:

- the **covariance matrix** is d x d (driver-trivial for embedding
  dims) but must be accumulated over the full corpus — that is the
  distributed part, and it is one aggregation pass;
- the **eigendecomposition** is a d x d ``numpy.linalg.eigh`` on the
  driver — O(d^3) on a matrix that fits in L2 cache; distributing it
  would be theater;
- the **projection** is a narrow per-row expression with the top-p
  components carried as codegen literals (the k-means literal-centroid
  pattern) — scan-speed, no shuffle, no UDF.

Two covariance paths, auto-switched like k-means' assignment:

- ``method="explode"`` (default for small d): double ``posexplode`` to
  (i, j, xi*xj) upper-triangle terms, one groupBy(i, j) aggregate.
  Map-side partial combine collapses each task to <= d*(d+1)/2 rows
  before the shuffle, so the shuffle is O(tasks * d^2) regardless of
  corpus size; the n*d^2 intermediate never materializes (codegen
  pipelines generator -> partial agg). Exactly replayable in SQL
  (the q151 oracle).
- ``method="arrow"`` (the wide-d scale path): ``mapInPandas`` emits ONE
  partial per Arrow batch — (n, sum vector, flattened X^T X) computed
  by numpy matmul — and the partials (each d^2 doubles) are summed
  elementwise via posexplode + groupBy(idx). For d where d^2 rows per
  input row would dwarf the data (d >= ~256), this moves the inner
  loop into BLAS and shuffles only batch-count * d^2 values.
  Differential-tested against the explode path (bit-equal after the
  shared round()).

Population covariance, computed by the explicit textbook formula
``E[xy] - E[x]E[y]`` in BOTH paths and in the oracle, rounded to
``scale`` decimals — so the three implementations agree bit-for-bit
despite different summation orders (the residual fp noise is ~1e-11
against a 1e-6 rounding grid).

``exact_grid`` hardens that from "agree with overwhelming
probability" to "agree by construction": each coordinate is quantized
ONCE to the ``10^-exact_grid`` grid as a 64-bit integer, and the
three sums (Σx, Σy, Σxy) accumulate integers in 128-bit decimal
accumulators — integer addition is associative/commutative exactly,
so no shuffle order, partition layout, or engine can move the result
by even an ulp (a float SUM re-rounded to the output grid still flips
when it lands within ulps of a grid boundary — the flake an
oracle-gated audit cannot afford). The covariance of the quantized
data differs from the float path by O(10^-exact_grid) per coordinate
— negligible against a 1e-6 output grid for ``exact_grid >= 6``.
Explode path only.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_matrix(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    method: str = "auto",
    scale: int = 6,
    exact_grid: int | None = None,
) -> DataFrame:
    """Upper-triangle population covariance of a vector column.

    Returns (i INT, j INT, cov DOUBLE) with 0 <= i <= j < dim, cov
    rounded to ``scale``. ``method``: "explode" | "arrow" | "auto"
    (auto picks arrow when dim >= 256 — the point where the explode
    path's d^2 generator rows per input row stop being the cheap
    option). ``exact_grid``: quantize inputs to the 10^-exact_grid
    grid and sum as exact integers — result independent of shuffle
    order by construction (module note; explode path only).
    """
    if method == "auto":
        method = "arrow" if dim >= 256 and exact_grid is None else "explode"
    if method == "explode":
        return _cov_explode(
            df, vec_col, dim=dim, scale=scale, exact_grid=exact_grid
        )
    if method == "arrow":
        if exact_grid is not None:
            raise ValueError("exact_grid requires method='explode'")
        return _cov_arrow(df, vec_col, dim=dim, scale=scale)
    raise ValueError(f"unknown method {method!r}")


def _cov_explode(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    scale: int,
    exact_grid: int | None = None,
) -> DataFrame:
    v = F.col(vec_col)
    a = df.select(
        F.posexplode(v).alias("i", "xi"),
        v.alias("__v"),
    )
    b = a.select(
        "i", "xi", F.posexplode(F.col("__v")).alias("j", "xj")
    ).filter(F.col("j") >= F.col("i"))
    if exact_grid is not None:
        # integer-exact path: quantize once, sum integers exactly in
        # 128-bit decimal accumulators (order-independent), divide the
        # exact sums at the end. decimal(18,0) * decimal(18,0) =
        # decimal(37,0); SUM widens to decimal(38,0) — overflow-safe to
        # ~10 rows x 10^38 / 10^(2g) products, far past 100 TB corpora.
        g = float(10**exact_grid)
        xq = F.round(F.col("xi").cast("double") * g).cast("decimal(18,0)")
        yq = F.round(F.col("xj").cast("double") * g).cast("decimal(18,0)")
        agg = b.groupBy("i", "j").agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum(xq).alias("__sx"),
            F.sum(yq).alias("__sy"),
            F.sum(xq * yq).alias("__sxy"),
        )
        exy = F.col("__sxy").cast("double") / F.lit(g * g) / F.col("__n")
        ex = F.col("__sx").cast("double") / F.lit(g) / F.col("__n")
        ey = F.col("__sy").cast("double") / F.lit(g) / F.col("__n")
        return agg.select(
            F.col("i").cast("int"),
            F.col("j").cast("int"),
            F.round(exy - ex * ey, scale).alias("cov"),
        )
    agg = b.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.col("xi").cast("double")).alias("__sx"),
        F.sum(F.col("xj").cast("double")).alias("__sy"),
        F.sum(
            F.col("xi").cast("double") * F.col("xj").cast("double")
        ).alias("__sxy"),
    )
    return agg.select(
        F.col("i").cast("int"),
        F.col("j").cast("int"),
        F.round(
            F.col("__sxy") / F.col("__n")
            - (F.col("__sx") / F.col("__n"))
            * (F.col("__sy") / F.col("__n")),
            scale,
        ).alias("cov"),
    )


def _cov_arrow(
    df: DataFrame, vec_col: str, *, dim: int, scale: int
) -> DataFrame:
    import numpy as np  # noqa: F401  (imported for the worker closure)

    d = dim

    def partials(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            yield pd.DataFrame(
                {
                    "n": [float(x.shape[0])],
                    "sx": [(x.sum(axis=0)).tolist()],
                    "sxy": [(x.T @ x).reshape(-1).tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, schema="n double, sx array<double>, sxy array<double>"
    )
    # Elementwise-sum the (few, batch-count) partials distributedly:
    # explode each flattened d^2 (+d sum, +1 count) partial to (idx,
    # val) and groupBy idx — never a driver-side reduce of big arrays.
    flat = parts.select(
        F.posexplode(
            F.concat(
                F.array(F.col("n")),
                F.col("sx"),
                F.col("sxy"),
            )
        ).alias("idx", "val")
    )
    tot = flat.groupBy("idx").agg(F.sum("val").alias("val"))
    # idx 0 = n, idx 1..d = sums, idx d+1.. = flattened X^T X
    n_ = F.first(F.when(F.col("idx") == 0, F.col("val")), True)
    pivoted = tot.agg(
        n_.alias("n"),
        F.array_sort(
            F.collect_list(
                F.when(
                    (F.col("idx") >= 1) & (F.col("idx") <= d),
                    F.struct(F.col("idx"), F.col("val")),
                )
            )
        ).alias("sx"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("idx") > d,
                    F.struct(F.col("idx"), F.col("val")),
                )
            )
        ).alias("sxy"),
    ).select(
        "n",
        F.transform(F.col("sx"), lambda s: s.val).alias("sx"),
        F.transform(F.col("sxy"), lambda s: s.val).alias("sxy"),
    )
    # One-row frame of d + d^2 doubles: explode into the (i, j, cov)
    # upper triangle with the same formula as the explode path.
    idx = F.explode(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.lit(d - 1)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(d - 1)),
                    lambda j: F.struct(i.alias("i"), j.alias("j")),
                ),
            )
        )
    ).alias("ij")
    cells = pivoted.select("n", "sx", "sxy", idx)
    i, j = F.col("ij.i"), F.col("ij.j")
    sx_i = F.element_at(F.col("sx"), i + 1)
    sx_j = F.element_at(F.col("sx"), j + 1)
    sxy = F.element_at(F.col("sxy"), i * d + j + 1)
    return cells.select(
        i.cast("int").alias("i"),
        j.cast("int").alias("j"),
        F.round(
            sxy / F.col("n") - (sx_i / F.col("n")) * (sx_j / F.col("n")),
            scale,
        ).alias("cov"),
    )


def pca_fit(
    df: DataFrame,
    vec_col: str,
    *,
    dim: int,
    n_components: int,
    method: str = "auto",
    scale: int = 6,
) -> dict:
    """Fit PCA: one distributed covariance pass + driver-side ``eigh``
    on the d x d matrix (d^2 doubles — never worth distributing).

    Returns {"mean": [d], "components": [p][d], "explained_variance":
    [p], "explained_variance_ratio": [p]} with components ordered by
    descending eigenvalue and sign-fixed (largest-|coefficient| entry
    positive) so the fit is deterministic.
    """
    import numpy as np

    d = dim
    mean_rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    mean = np.zeros(d)
    for r in mean_rows:
        mean[r["i"]] = r["m"]
    cov_rows = covariance_matrix(
        df, vec_col, dim=d, method=method, scale=scale
    ).collect()
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
        cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    comps = []
    evs = []
    for k in order:
        v = vecs[:, k]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v.tolist())
        evs.append(float(vals[k]))
    total = float(vals.sum()) or 1.0
    return {
        "mean": mean.tolist(),
        "components": comps,
        "explained_variance": evs,
        "explained_variance_ratio": [e / total for e in evs],
    }


def pca_project(
    df: DataFrame,
    vec_col: str,
    model: dict,
    *,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
    scale: Optional[int] = 6,
) -> DataFrame:
    """Project onto the fitted components: ``out[k] = (x - mean) .
    comp_k`` (divided by sqrt(eigenvalue) when ``whiten``).

    The model rides in the plan as p*d codegen literals — a narrow
    projection, no UDF, no shuffle, no broadcast round-trip; at 100 TB
    this runs at scan speed fused into whatever stage reads the
    vectors.
    """
    mean = F.array(*[F.lit(float(m)) for m in model["mean"]])
    centered = F.zip_with(
        F.col(vec_col),
        mean,
        lambda x, m: x.cast("double") - m,
    )
    outs = []
    for k, comp in enumerate(model["components"]):
        c = F.array(*[F.lit(float(x)) for x in comp])
        v = F.aggregate(
            F.zip_with(centered, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            v = v / F.lit(
                float(model["explained_variance"][k] + eps) ** 0.5
            )
        outs.append(F.round(v, scale) if scale is not None else v)
    return df.withColumn(out_col, F.array(*outs))

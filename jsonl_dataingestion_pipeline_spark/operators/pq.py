"""Product quantization (Jégou et al. 2011) — the FAISS-standard
vector-compression companion to IVF: split each d-dim vector into ``m``
subvectors, k-means each subvector space into ``n_codes`` centroids,
store each vector as m uint8-sized codes (d*4 bytes -> m bytes), and
answer queries with Asymmetric Distance Computation — one m-entry
lookup-table sum per candidate instead of a d-dim float scan.

Spark-first shapes:

- **Training** runs ALL m sub-quantizers in ONE distributed job per
  Lloyd iteration: the corpus explodes once to (id, sub, subvec) and
  assignment/update aggregate over the extra ``sub`` key — m never
  multiplies the job count. Assignment carries the full codebook as
  ``m * n_codes * d/m = d * n_codes`` codegen literals (the k-means
  literal-centroid pattern, `clustering.py`); the update is one
  (sub, code, dim) average whose result — the next codebook — is
  driver-small by definition.
- **Encoding** is a narrow zero-shuffle projection: per subvector,
  argmin over the literal codebook via ``array_min`` on
  (dist2, code) structs (struct ordering = the code tie-break).
- **ADC top-k** precomputes the m x n_codes query lookup table on the
  driver (m*n_codes floats), embeds it as literals, and scores each
  candidate with an m-term array lookup sum — no vector math per row
  at query time. Top-k = sort+limit (TakeOrderedAndProject); the rank
  column is added by a window over the already-cut k rows only.

Determinism contract (mirrors `clustering.py` so the q152/q153 DuckDB
oracles replay training, codes, and distances bit-for-bit): input
coordinates round to 1e-9, distances to 1e-6 before every argmin (ties
break on code id), centroid updates round to 1e-9, empty codes keep
their previous centroid, init = subvectors of the ``n_codes`` smallest
ids.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

Codebooks = List[List[List[float]]]  # [m][n_codes][d/m]


def _slices(vec: Column, dim: int, m: int, scale: int = 9) -> Column:
    """array of m subvector slices, elements rounded to ``scale``."""
    dsub = dim // m
    return F.array(
        *[
            F.transform(
                F.slice(vec, s * dsub + 1, dsub),
                lambda x: F.round(x.cast("double"), scale),
            )
            for s in range(m)
        ]
    )


def _cb_lit(codebooks: Codebooks) -> Column:
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in c])
                    for c in cb
                ]
            )
            for cb in codebooks
        ]
    )


def _assign(subvec: Column, cb_s: Column, scale: int = 6) -> Column:
    """(dist2, code) argmin of one subvector against one sub-codebook
    (an array of centroid arrays); ties break on code id via struct
    ordering."""
    d2 = lambda c: F.round(  # noqa: E731
        F.aggregate(
            F.zip_with(subvec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        scale,
    )
    # named_struct (not struct + alias): field aliases assigned inside a
    # higher-order-function lambda are mangled by the analyzer.
    pairs = F.transform(
        cb_s,
        lambda c, ci: F.named_struct(
            F.lit("dd"), d2(c), F.lit("code"), ci
        ),
    )
    return F.array_min(pairs)


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    iterations: int = 2,
) -> Codebooks:
    """Train m sub-quantizer codebooks jointly (one distributed
    assignment+update job per Lloyd iteration, covering every
    subvector space at once). Returns [m][n_codes][dim/m] floats."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_slices(F.col(vec_col), dim, m)).alias(
            "__sub", "__sv"
        ),
    )
    init = (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__id")
        .limit(n_codes)
        .collect()
    )
    if len(init) < n_codes:
        raise ValueError(
            f"need >= {n_codes} vectors to seed the codebooks"
        )
    codebooks: Codebooks = [
        [
            [round(float(r["__v"][s * dsub + t]), 9) for t in range(dsub)]
            for r in init
        ]
        for s in range(m)
    ]
    for _ in range(iterations):
        cb = _cb_lit(codebooks)
        assigned = pts.select(
            "__sub",
            _assign(
                F.col("__sv"), F.element_at(cb, F.col("__sub") + 1)
            )["code"].alias("__code"),
            F.posexplode(F.col("__sv")).alias("__j", "__x"),
        )
        rows = (
            assigned.groupBy("__sub", "__code", "__j")
            .agg(F.round(F.avg("__x"), 9).alias("__mu"))
            .collect()
        )
        nxt = [
            [list(codebooks[s][c]) for c in range(n_codes)]
            for s in range(m)
        ]
        for r in rows:
            nxt[r["__sub"]][r["__code"]][r["__j"]] = r["__mu"]
        codebooks = nxt
    return codebooks


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: Codebooks,
    *,
    dim: int,
    code_col: str = "codes",
) -> DataFrame:
    """Append the m-code array: per subvector, argmin over the literal
    codebook. Zero shuffle — fuses into whatever stage reads the
    vectors."""
    m = len(codebooks)
    cb = _cb_lit(codebooks)
    codes = F.transform(
        _slices(F.col(vec_col), dim, m),
        lambda sv, s: _assign(sv, F.element_at(cb, s + 1))["code"],
    )
    return df.withColumn(code_col, codes)


def adc_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks: Codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation: the query
    is quantized against nothing — its exact distance to every codebook
    centroid is tabled driver-side (m * n_codes floats), and each
    candidate costs an m-term literal-table lookup sum over its codes.
    Returns (id, adc_rank INT, adc_dist2 DOUBLE) — ranks assigned by a
    window over the already-cut k rows, never the corpus."""
    m = len(codebooks)
    dim = m * len(codebooks[0][0])
    q = [round(float(x), 9) for x in query_vec]
    dsub = dim // m
    lut = [
        [
            round(
                sum(
                    (q[s * dsub + t] - c[t]) ** 2 for t in range(dsub)
                ),
                6,
            )
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in lut]
    )
    enc = pq_encode(df, vec_col, codebooks, dim=dim, code_col="__codes")
    dist = F.round(
        F.aggregate(
            F.transform(
                F.col("__codes"),
                lambda c, s: F.element_at(
                    F.element_at(lut_lit, s + 1), c + 1
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    top = (
        enc.select(F.col(id_col).alias("id"), dist.alias("adc_dist2"))
        .orderBy(F.col("adc_dist2").asc(), F.col("id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("adc_dist2").asc(), F.col("id").asc())
    return top.withColumn(
        "adc_rank", F.row_number().over(w).cast("int")
    ).select("id", "adc_rank", "adc_dist2")

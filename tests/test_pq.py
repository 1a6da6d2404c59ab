"""Product quantization: training replays a numpy reference, encoding
is the per-subvector argmin, ADC approximates exact distances with
usable recall, and parameter errors raise early."""
from __future__ import annotations

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.operators.pq import (
    adc_topk,
    pq_encode,
    pq_train,
)

DIM, M, NC, IT = 16, 4, 3, 2
DSUB = DIM // M


def _df(spark, n=60, seed=11):
    rng = np.random.RandomState(seed)
    # cluster structure per subvector so codes are meaningful
    x = rng.normal(size=(n, DIM)) + rng.choice([0.0, 3.0], size=(n, DIM))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        np.round(x, 9),
    )


def _numpy_train(x):
    ref = [
        [list(x[i, s * DSUB : (s + 1) * DSUB]) for i in range(NC)]
        for s in range(M)
    ]
    for _ in range(IT):
        nxt = [[list(c) for c in cb] for cb in ref]
        for s in range(M):
            sub = x[:, s * DSUB : (s + 1) * DSUB]
            c = np.array(ref[s])
            dd = np.round(
                ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), 6
            )
            a = dd.argmin(axis=1)
            for ci in range(NC):
                mask = a == ci
                if mask.any():
                    nxt[s][ci] = list(np.round(sub[mask].mean(axis=0), 9))
        ref = nxt
    return ref


def test_train_replays_numpy(spark):
    df, x = _df(spark)
    got = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC, iterations=IT
    )
    ref = _numpy_train(x)
    # identical modulo the 1e-9 rounding half-case (np banker's vs
    # Spark HALF_UP): at most one grid step apart
    assert np.abs(np.array(got) - np.array(ref)).max() <= 1.5e-9


def test_encode_is_argmin(spark):
    df, x = _df(spark)
    cbs = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC, iterations=IT
    )
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, "embedding", cbs, dim=DIM).collect()
    }
    for i in range(x.shape[0]):
        for s in range(M):
            sub = x[i, s * DSUB : (s + 1) * DSUB]
            dd = np.round(
                ((sub - np.array(cbs[s])) ** 2).sum(axis=1), 6
            )
            assert codes[i][s] == int(dd.argmin())


def test_adc_recall_vs_exact(spark):
    # per-subvector cluster structure a 4-code codebook CAN learn:
    # each subvector is one of 4 well-separated patterns + small noise,
    # so trained PQ cells align with the true neighborhoods.
    rng = np.random.RandomState(5)
    n, ncode = 100, 4
    pats = rng.normal(size=(ncode, DSUB)) * 4.0
    x = np.zeros((n, DIM))
    for i in range(n):
        for s in range(M):
            x[i, s * DSUB : (s + 1) * DSUB] = (
                pats[rng.randint(ncode)] + rng.normal(size=DSUB) * 0.05
            )
    x = np.round(x, 9)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cbs = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=ncode,
        iterations=3,
    )
    q = [float(v) for v in x[0]]
    got = {r.id for r in adc_topk(df, q, cbs, k=10).collect()}
    exact = np.argsort(((x - np.array(q)) ** 2).sum(axis=1))[:10]
    # quantized distances: expect majority overlap with the exact top-10
    assert len(got & set(int(i) for i in exact)) >= 5
    # the query point itself (dist 0) must quantize into the top set
    assert 0 in got


def test_pq_errors(spark):
    df, _ = _df(spark, n=2)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, "embedding", "vec_id", dim=DIM, m=5)
    with pytest.raises(ValueError, match="seed"):
        pq_train(
            df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC
        )  # only 2 vectors < n_codes

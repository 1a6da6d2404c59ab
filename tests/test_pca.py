"""PCA: both covariance paths bit-equal, fit/project replay numpy,
whitening normalizes variance. Plus edge tests for the round-6
selection operators (MMR pool exhaustion, novelty hash_key parity)."""
from __future__ import annotations

import numpy as np
import pytest

from jsonl_dataingestion_pipeline_spark.operators.dedup import novelty_scores
from jsonl_dataingestion_pipeline_spark.operators.pca import (
    covariance_matrix,
    pca_fit,
    pca_project,
)
from jsonl_dataingestion_pipeline_spark.operators.similarity import mmr_select


D = 12


def _vec_df(spark, n=80, d=D, seed=3):
    rng = np.random.RandomState(seed)
    # anisotropic: first axes carry most variance so PCA order is stable
    scales = np.linspace(3.0, 0.3, d)
    x = rng.normal(size=(n, d)) * scales
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


def test_covariance_paths_bit_equal(spark):
    df, _ = _vec_df(spark)
    a = sorted(
        map(tuple, covariance_matrix(df, "embedding", dim=D, method="explode").collect())
    )
    b = sorted(
        map(tuple, covariance_matrix(df, "embedding", dim=D, method="arrow").collect())
    )
    assert len(a) == D * (D + 1) // 2
    assert a == b  # identical after the shared round(6)


def test_covariance_matches_numpy(spark):
    df, x = _vec_df(spark)
    ref = np.cov(x, rowvar=False, bias=True)
    for r in covariance_matrix(df, "embedding", dim=D).collect():
        assert abs(ref[r.i, r.j] - r.cov) < 1e-5


def test_fit_project_replays_numpy(spark):
    df, x = _vec_df(spark)
    m = pca_fit(df, "embedding", dim=D, n_components=4)
    # components orthonormal
    c = np.array(m["components"])
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-6)
    # eigenvalues descending and ratios sum <= 1
    ev = m["explained_variance"]
    assert ev == sorted(ev, reverse=True)
    assert 0 < sum(m["explained_variance_ratio"]) <= 1 + 1e-9
    # projection == (x - mean) @ comps.T
    proj = {
        r.vec_id: np.array(r.pca)
        for r in pca_project(df, "embedding", m).collect()
    }
    ref = (x - x.mean(axis=0)) @ c.T
    for i in range(x.shape[0]):
        assert np.allclose(proj[i], ref[i], atol=1e-5)


def test_whiten_unit_variance(spark):
    df, x = _vec_df(spark, n=120)
    m = pca_fit(df, "embedding", dim=D, n_components=3)
    out = pca_project(df, "embedding", m, whiten=True, scale=None).collect()
    p = np.array([r.pca for r in out])
    # population variance of each whitened axis ~ 1
    assert np.allclose(p.var(axis=0), 1.0, atol=1e-3)


def test_auto_switches_to_arrow_for_wide_vectors():
    # pure dispatch check — no Spark needed for the decision itself
    from jsonl_dataingestion_pipeline_spark.operators import pca as mod

    captured = {}
    orig_e, orig_a = mod._cov_explode, mod._cov_arrow
    mod._cov_explode = lambda *a, **k: captured.setdefault("m", "explode")
    mod._cov_arrow = lambda *a, **k: captured.setdefault("m", "arrow")
    try:
        covariance_matrix(None, "v", dim=300)
        assert captured["m"] == "arrow"
        captured.clear()
        covariance_matrix(None, "v", dim=64)
        assert captured["m"] == "explode"
    finally:
        mod._cov_explode, mod._cov_arrow = orig_e, orig_a
    with pytest.raises(ValueError):
        covariance_matrix(None, "v", dim=8, method="nope")


def test_mmr_pool_smaller_than_k(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_select(df, [1.0, 0.0], k=10).collect()
    assert len(out) == 3  # pool exhausted, no crash, no dupes
    assert [r.sel_rank for r in out] == [1, 2, 3]
    assert len({r.sel_id for r in out}) == 3
    # first pick is the most relevant candidate
    assert out[0].sel_id == 1


def test_mmr_prefers_diversity_over_pure_topk(spark):
    # two duplicate max-relevance vecs + one diverse mid-relevance one:
    # plain top-2 takes the twins; MMR with a diversity-leaning lam
    # must take one twin then the diverse vector. (With unit vectors
    # and query == first pick, rel(c) == sim(c, sel) for every c, so
    # the score is (2*lam - 1) * rel — lam must be != 0.5 for the
    # ordering to be non-degenerate.)
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.7, 0.7, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_select(df, [1.0, 0.0, 0.0], k=2, lam=0.3).collect()
    assert {r.sel_id for r in out} == {1, 3}


def test_novelty_hash_key_parity(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox sleeps"),
        (3, "entirely different words here today"),
        (4, "the quick brown fox jumps"),  # exact dup of 1 -> novelty 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hashed = sorted(
        map(tuple, novelty_scores(df, "text", "doc_id").collect())
    )
    raw = sorted(
        map(
            tuple,
            novelty_scores(df, "text", "doc_id", hash_key=False).collect(),
        )
    )
    assert hashed == raw  # 60-bit key never collides on this corpus
    by_id = {t[0]: t for t in hashed}
    assert by_id[1][3] == 1.0  # first doc: everything novel
    assert by_id[4][3] == 0.0  # exact dup of doc 1: nothing novel
    assert 0.0 < by_id[2][3] < 1.0  # partial overlap

"""Hashed-logreg inference: Python replay, zero-term docs, plan shape."""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.functions.classifier import (
    classify,
    default_weight_table,
    hashed_features,
)


def _bucket_py(term: str, n: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n


def _weight_py(b: int) -> float:
    return round(((b * 2_654_435_761 + 99991) % 2_000_003)
                 / 2_000_003.0 * 2 - 1, 6)


def test_classify_matches_python_replay(spark):
    docs = [
        (1, "the quick brown fox"),
        (2, "lorem ipsum dolor sit amet consectetur"),
        (3, "one"),
        (4, ""),
        (5, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = default_weight_table(spark, n_features=64)
    out = {
        r.doc_id: r
        for r in classify(
            df, "text", "doc_id", w, n_features=64, bias=-0.1, threshold=0.0
        ).collect()
    }
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t]
        terms = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if terms:
            ws = [_weight_py(_bucket_py(t, 64)) for t in terms]
            logit = round(-0.1 + sum(ws) / len(ws), 6)
        else:
            logit = -0.1
        r = out[doc_id]
        assert r.n_terms == len(terms), (doc_id, r.n_terms, len(terms))
        assert abs(r.logit - logit) < 2e-6, (doc_id, r.logit, logit)
        assert r.label == ("keep" if r.logit >= 0.0 else "drop")
    # zero-term docs survive with logit = bias
    assert out[4].n_terms == 0 and out[4].logit == -0.1
    assert out[5].n_terms == 0 and out[5].logit == -0.1


def test_classifier_weight_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    w = default_weight_table(spark, n_features=32)
    plan = (
        classify(df, "text", "doc_id", w, n_features=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hashed_features_unigrams_only(spark):
    df = spark.createDataFrame([(7, "x y")], "doc_id long, text string")
    rows = hashed_features(
        df, "text", "doc_id", n_features=16, include_bigrams=False
    ).collect()
    assert len(rows) == 2
    assert {r.bucket for r in rows} == {
        _bucket_py("x", 16), _bucket_py("y", 16)
    }


# ---------------------------------------------------------------------------
# train_classifier (round 8): distributed full-batch GD, integer-exact
# ---------------------------------------------------------------------------
from collections import defaultdict

import pytest

from jsonl_dataingestion_pipeline_spark.functions.classifier import (
    train_classifier,
)

_TRAIN_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", 1.0),
    (2, "lorem ipsum dolor sit amet", 0.0),
    (3, "the fox the dog the fox", 1.0),
    (4, "spark sql window partition shuffle", 0.0),
    (5, "quick quick quick dog", 1.0),
    (6, "ipsum sit sit amet dolor lorem", 0.0),
    (7, "", 0.0),
]


def _rha(x: float) -> int:
    # the engines' ROUND semantics (see classifier.round_half_away:
    # floor(x+0.5) is wrong one ulp below .5)
    from jsonl_dataingestion_pipeline_spark.functions.classifier import (
        round_half_away,
    )

    return round_half_away(x)


def _train_py(docs, nf, iters, lr, bias):
    """Pure-Python replay of the distributed trainer (same grid, same
    quantization points, same rounding mode)."""
    base = []
    for i, t, y in docs:
        toks = [x for x in t.lower().strip().split() if x]
        if not toks:
            continue
        c = defaultdict(int)
        for tk in toks:
            c[_bucket_py(tk, nf)] += 1
        n = sum(c.values())
        for b, cnt in c.items():
            base.append((i, b, cnt, n, y))
    ndocs = len({r[0] for r in base})
    wu = [0] * nf
    for _ in range(iters):
        zu = defaultdict(int)
        for i, b, cnt, n, y in base:
            zu[i] += cnt * wu[b]
        q = {}
        for i, b, cnt, n, y in base:
            if i in q:
                continue
            z = zu[i] / (n * 1e9) + bias
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            q[i] = _rha((p - y) * 1e9 / n)
        gu = defaultdict(int)
        for i, b, cnt, n, y in base:
            gu[b] += q[i] * cnt
        for b, g in gu.items():
            wu[b] -= _rha(lr * g / ndocs)
    return wu


def test_train_classifier_matches_python_replay(spark):
    df = spark.createDataFrame(
        _TRAIN_DOCS, "doc_id long, text string, y double"
    )
    w = train_classifier(
        df, "text", "doc_id", "y",
        n_features=64, iterations=4, lr=2.0, bias=0.0,
        include_bigrams=False, unit_weights=True,
    )
    got = {r["bucket"]: r["__wu"] for r in w.collect()}
    exp = _train_py(_TRAIN_DOCS, 64, 4, 2.0, 0.0)
    assert len(got) == 64
    for b in range(64):
        assert got[b] == exp[b], (b, got[b], exp[b])
    assert sum(1 for v in exp if v != 0) > 0, "training moved no weight"


def test_trained_classifier_separates_training_set(spark):
    df = spark.createDataFrame(
        _TRAIN_DOCS, "doc_id long, text string, y double"
    )
    w = train_classifier(
        df, "text", "doc_id", "y",
        n_features=64, iterations=4, lr=2.0,
        include_bigrams=False,
    )
    out = classify(
        df, "text", "doc_id", w,
        n_features=64, include_bigrams=False,
    )
    lab = {r.doc_id: r.label for r in out.collect()}
    for i, _, y in _TRAIN_DOCS:
        if i == 7:
            continue  # zero-term doc: logit = bias, not trained on
        assert lab[i] == ("keep" if y == 1.0 else "drop"), (i, lab[i])


def test_train_classifier_rejects_empty_corpus(spark):
    df = spark.createDataFrame(
        [(1, "   ", 0.0), (2, "", 1.0)], "doc_id long, text string, y double"
    )
    with pytest.raises(ValueError, match="no document yields"):
        train_classifier(df, "text", "doc_id", "y", n_features=8)


def test_train_classifier_rejects_zero_iterations(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0)], "doc_id long, text string, y double"
    )
    with pytest.raises(ValueError, match="iterations"):
        train_classifier(df, "text", "doc_id", "y", iterations=0)

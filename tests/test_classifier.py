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

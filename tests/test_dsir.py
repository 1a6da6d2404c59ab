"""DSIR importance resampling: differential vs an independent
pure-Python replay, selection-bias property, TakeOrdered plan shape."""
from __future__ import annotations

import hashlib
import math
import re

from jsonl_dataingestion_pipeline_spark.operators.dsir import (
    dsir_log_ratio_table,
    dsir_select,
    dsir_weights,
)

RAW = [
    (i, "apple banana cherry date apple banana") for i in range(0, 30)
] + [
    (i, "zx qv wk jn zx qv tt rr") for i in range(30, 60)
]
TARGET = [(1000 + i, "apple banana cherry apple date") for i in range(10)]

NF = 64
ALPHA = 1.0
SEED = 7


def _terms(text):
    toks = [w for w in re.split(r"\s+", text.strip().lower()) if w]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(t):
    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % NF


def _py_dsir(raw, target, n):
    def counts(docs):
        c: dict = {}
        tot = 0
        for _id, text in docs:
            for t in _terms(text):
                b = _bucket(t)
                c[b] = c.get(b, 0) + 1
                tot += 1
        return c, tot

    cr, nr = counts(raw)
    ct, nt = counts(target)
    lr = {
        b: round(
            math.log((ct.get(b, 0) + ALPHA) / (nt + ALPHA * NF))
            - math.log((cr.get(b, 0) + ALPHA) / (nr + ALPHA * NF)),
            6,
        )
        for b in range(NF)
    }
    rows = []
    for _id, text in raw:
        ts = _terms(text)
        w = round(sum(lr[_bucket(t)] for t in ts), 6) if ts else 0.0
        v = int(
            hashlib.md5(f"{_id}:{SEED}".encode()).hexdigest()[:15], 16
        )
        u = (v + 1) / float(2**60 + 1)
        key = round(w - math.log(-math.log(u)), 6)
        rows.append((_id, len(ts), w, key))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return lr, rows[:n]


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_log_ratio_table_matches_python(spark):
    raw, tgt = _frames(spark)
    got = {
        r["__bucket"]: r["__lr"]
        for r in dsir_log_ratio_table(
            raw, tgt, "text", n_features=NF, alpha=ALPHA
        ).collect()
    }
    lr, _ = _py_dsir(RAW, TARGET, 1)
    assert len(got) == NF
    for b in range(NF):
        assert abs(got[b] - lr[b]) < 2e-6, (b, got[b], lr[b])


def test_select_matches_python_replay(spark):
    raw, tgt = _frames(spark)
    out = sorted(
        (r["doc_id"], r["n_feats"], r["weight"], r["sample_key"])
        for r in dsir_select(
            raw, tgt, "text", "doc_id", 20,
            n_features=NF, alpha=ALPHA, seed=SEED,
        ).collect()
    )
    _, exp = _py_dsir(RAW, TARGET, 20)
    assert out == sorted(exp)


def test_selection_biased_toward_target_like_docs(spark):
    """All apple-family docs outscore all gibberish docs on WEIGHT
    (deterministic: each family is one repeated text), so a top-30
    Gumbel sample at this weight gap must pick mostly apple docs."""
    raw, tgt = _frames(spark)
    picked = [
        r["doc_id"]
        for r in dsir_select(
            raw, tgt, "text", "doc_id", 30,
            n_features=NF, alpha=ALPHA, seed=SEED,
        ).collect()
    ]
    n_apple = sum(1 for i in picked if i < 30)
    assert n_apple >= 25, (n_apple, sorted(picked))


def test_weights_zero_feature_doc_kept(spark):
    raw = spark.createDataFrame(
        [(1, "hello world"), (2, "   ")], "doc_id long, text string"
    )
    tgt = raw.filter("doc_id = 1")
    lr = dsir_log_ratio_table(raw, tgt, "text", n_features=NF)
    w = {
        r["doc_id"]: (r["n_feats"], r["weight"])
        for r in dsir_weights(
            raw, lr, "text", "doc_id", n_features=NF
        ).collect()
    }
    assert w[2] == (0, 0.0)
    assert w[1][0] == 3  # 2 unigrams + 1 bigram


def test_plan_takeordered_no_cartesian(spark):
    """The top-n must be TakeOrdered (per-partition top-n + driver
    merge), never a global Sort exchange; the only nested-loop joins
    are the broadcast one-row total frames."""
    raw, tgt = _frames(spark)
    df = dsir_select(raw, tgt, "text", "doc_id", 5, n_features=NF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree, tree
    assert "CartesianProduct" not in tree, tree

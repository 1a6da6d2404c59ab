"""Partition-order determinism of cross-row aggregations.

The r10 q20_doc_quality regression: ``classify()`` summed DOUBLE
weights across rows, so the rounded 6th decimal of a knife-edge logit
depended on the partition/merge order — a sibling plan change flipped
it. The fix moves the sum onto the exact integer nano-unit grid. These
tests fuzz the input partitioning (1, 8, 32) and assert bit-identical
output multisets, plus equality with an exact-integer Python replay.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.functions.classifier import (
    classify,
    default_weight_table,
)

_PARTITION_COUNTS = (1, 8, 32)


def _bucket_py(term: str, n: int) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n


def _weight_u_py(b: int, scale: int = 6) -> int:
    """default_weight_table weight in exact nano-units (integer)."""
    w = round(((b * 2_654_435_761 + 99991) % 2_000_003)
              / 2_000_003.0 * 2 - 1, scale)
    return round(w * 1e9)


def _docs(n_docs: int = 120) -> list[tuple[int, str]]:
    """Deterministic synthetic corpus with skewed term multiplicity so
    per-document sums mix many distinct weight values."""
    vocab = [f"w{i % 37}" for i in range(200)]
    out = []
    for d in range(n_docs):
        k = (d * 7919) % 53 + 1
        toks = [vocab[(d * 31 + j * 17) % len(vocab)] for j in range(k)]
        out.append((d, " ".join(toks)))
    out.append((n_docs, ""))      # zero-term doc: logit = bias
    out.append((n_docs + 1, "   "))
    return out


def _replay(docs, nf, bias, scale=6):
    exp = {}
    for doc_id, text in docs:
        toks = [t for t in text.lower().split() if t]
        terms = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not terms:
            exp[doc_id] = (0, round(bias, scale))
            continue
        swu = sum(_weight_u_py(_bucket_py(t, nf)) for t in terms)
        logit = round(bias + swu / 1e9 / len(terms), scale)
        exp[doc_id] = (len(terms), logit)
    return exp


def test_classify_partition_count_invariant(spark):
    """q134/q20 shape: identical multisets under 1/8/32 partitions and
    exact match with the integer-grid replay."""
    docs = _docs()
    nf, bias = 64, -0.05
    w = default_weight_table(spark, n_features=nf)
    exp = _replay(docs, nf, bias)
    results = []
    for p in _PARTITION_COUNTS:
        df = spark.createDataFrame(
            docs, "doc_id long, text string"
        ).repartition(p)
        rows = sorted(
            (r.doc_id, r.n_terms, r.logit, r.label)
            for r in classify(
                df, "text", "doc_id", w,
                n_features=nf, bias=bias, threshold=0.0,
            ).collect()
        )
        results.append(rows)
    # identical (bit-level: tuples compare floats exactly) across
    # partition counts
    assert results[0] == results[1] == results[2]
    # and equal to the exact integer replay
    for doc_id, n_terms, logit, label in results[0]:
        en, el = exp[doc_id]
        assert n_terms == en, (doc_id, n_terms, en)
        assert logit == el, (doc_id, logit, el)
        assert label == ("keep" if logit >= 0.0 else "drop")


def test_classify_sum_is_integer_typed(spark):
    """Guard the fix's mechanism: the aggregate feeding the logit must
    be a decimal (exact) sum, never a DOUBLE sum."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    w = default_weight_table(spark, n_features=32)
    plan = (
        classify(df, "text", "doc_id", w, n_features=32)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "sum(weight" not in plan, plan

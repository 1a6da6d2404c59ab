"""Span corruption: spans stay inside their block, never overlap,
hit the target noise rate on full blocks, are deterministic across
partitionings, and the stats projection agrees with aggregating the
span list."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.spancorrupt import (
    _block_size,
    span_corruption_spans,
    span_corruption_stats,
)


def _py_offset(seed: int, doc: int, block: int, modulo: int) -> int:
    h = hashlib.md5(f"{seed}:{doc}:{block}".encode()).hexdigest()
    return int(h[:15], 16) % modulo


def test_block_size_defaults_and_validation():
    assert _block_size(0.15, 3) == 20
    assert _block_size(0.5, 10) == 20
    # never smaller than the span itself
    assert _block_size(0.9, 7) == 8
    with pytest.raises(ValueError):
        _block_size(0.0, 3)
    with pytest.raises(ValueError):
        _block_size(0.15, 0)


def test_spans_match_python_replay_and_stay_in_block(spark):
    rows = [(1, 100), (2, 19), (3, 0), (4, 20), (5, 61)]
    df = spark.createDataFrame(rows, "doc_id long, n int")
    got = span_corruption_spans(
        df, "doc_id", "n", noise_density=0.15, mean_span_length=3, seed=7
    ).collect()
    b, mask_len = 20, 3
    expected = {}
    for doc, n in rows:
        for blk in range(n // b):
            off = _py_offset(7, doc, blk, b - mask_len + 1)
            expected[(doc, blk)] = blk * b + off
    assert {(r.doc_id, r.span_idx): r.span_start for r in got} == expected
    for r in got:
        blk_lo = r.span_idx * b
        assert blk_lo <= r.span_start
        assert r.span_start + r.span_len <= blk_lo + b
    # docs shorter than one block emit nothing
    assert not [r for r in got if r.doc_id in (2, 3)]


def test_spans_never_overlap_and_density_is_exact(spark):
    df = spark.createDataFrame([(i, 400) for i in range(50)],
                               "doc_id long, n int")
    spans = span_corruption_spans(
        df, "doc_id", "n", noise_density=0.15, mean_span_length=3
    ).collect()
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        per_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_start + r.span_len)
        )
    for doc, ivs in per_doc.items():
        ivs.sort()
        assert len(ivs) == 400 // 20
        for (a0, a1), (b0, _b1) in zip(ivs, ivs[1:]):
            assert a1 <= b0, f"overlap in doc {doc}"
    # exact rate on full blocks: 20 spans * 3 / 400 = 0.15
    masked = sum(len(ivs) * 3 for ivs in per_doc.values())
    assert masked == 50 * 400 * 0.15


def test_deterministic_across_partitionings(spark):
    rows = [(i, 37 + 13 * i) for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, n int").repartition(1)
    df2 = spark.createDataFrame(rows, "doc_id long, n int").repartition(
        16, "n"
    )
    k = lambda frame: sorted(
        (r.doc_id, r.span_idx, r.span_start)
        for r in span_corruption_spans(frame, "doc_id", "n").collect()
    )
    assert k(df1) == k(df2)


def test_stats_agree_with_span_aggregate_and_t5_lengths(spark):
    rows = [(1, 0), (2, 19), (3, 20), (4, 399), (5, 400)]
    df = spark.createDataFrame(rows, "doc_id long, n int")
    stats = {
        r.doc_id: r.asDict()
        for r in span_corruption_stats(df, "doc_id", "n").collect()
    }
    agg = {
        r.doc_id: (r.ns or 0, r.ml or 0)
        for r in span_corruption_spans(df, "doc_id", "n")
        .groupBy("doc_id")
        .agg(F.count("*").alias("ns"), F.sum("span_len").alias("ml"))
        .collect()
    }
    for doc, n in rows:
        s = stats[doc]
        ns, ml = agg.get(doc, (0, 0))
        assert s["n_spans"] == ns
        assert s["n_masked"] == ml
        assert s["input_len"] == n - ml + ns
        assert s["target_len"] == ml + ns + 1
    assert stats[2]["n_spans"] == 0 and stats[3]["n_spans"] == 1


def test_plan_has_no_shuffle_or_udf(spark):
    df = spark.createDataFrame([(1, 100)], "doc_id long, n int")
    plan = span_corruption_spans(df, "doc_id", "n")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan
    assert "Python" not in plan

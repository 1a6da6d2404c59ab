"""Budgeted data selection (operators/selection.py)."""

from __future__ import annotations

from jsonl_dataingestion_pipeline_spark.operators.selection import (
    select_by_budget,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, score long, n long")
    return {
        r.id: r
        for r in select_by_budget(df, "id", "score", "n", **kw).collect()
    }


def test_greedy_by_score_until_budget(spark):
    rows = [(1, 900, 10), (2, 800, 10), (3, 700, 10), (4, 600, 10)]
    out = _run(spark, rows, budget=25)
    assert out[1].selected and out[2].selected
    assert not out[3].selected and not out[4].selected
    assert out[2].cum_tokens == 20 and out[3].cum_tokens == 30


def test_boundary_doc_excluded_atomically(spark):
    rows = [(1, 900, 10), (2, 800, 100), (3, 700, 5)]
    out = _run(spark, rows, budget=20)
    # doc 2 would overflow; doc 3 also excluded (cum includes doc 2)
    assert out[1].selected and not out[2].selected and not out[3].selected


def test_tie_break_by_id(spark):
    rows = [(5, 500, 10), (3, 500, 10), (4, 500, 10)]
    out = _run(spark, rows, budget=20)
    assert out[3].selected and out[4].selected and not out[5].selected


def test_two_phase_matches_naive(spark):
    rows = [(i, (i * 173) % 400, 1 + i % 7) for i in range(300)]
    out = _run(spark, rows, budget=500, score_bucket_width=32)
    naive = sorted(rows, key=lambda r: (-r[1], r[0]))
    cum = 0
    for i, s, n in naive:
        cum += n
        assert out[i].cum_tokens == cum, i
        assert out[i].selected == (cum <= 500)


def test_band_width_invariance(spark):
    rows = [(i, (i * 31) % 100, 2) for i in range(50)]
    a = _run(spark, rows, budget=40, score_bucket_width=7)
    b = _run(spark, rows, budget=40, score_bucket_width=1000)
    assert {k: (v.cum_tokens, v.selected) for k, v in a.items()} == {
        k: (v.cum_tokens, v.selected) for k, v in b.items()
    }

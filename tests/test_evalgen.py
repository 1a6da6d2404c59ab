"""Eval-data generators (operators/evalgen.py): NIAH needle insertion."""

from __future__ import annotations

from jsonl_dataingestion_pipeline_spark.operators.evalgen import (
    needle_insert,
)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "id long, text string, needle string, depth_u long"
    )
    return {
        r.id: r for r in needle_insert(df, "text", "needle", "depth_u").collect()
    }


def test_depth_zero_prepends(spark):
    r = _run(spark, [(1, "a b c d", "XX", 0)])[1]
    assert r.insert_word == 0
    assert r.rendered == "XX a b c d"


def test_depth_full_appends(spark):
    r = _run(spark, [(1, "a b c d", "XX", 1_000_000)])[1]
    assert r.insert_word == 4
    assert r.rendered == "a b c d XX"


def test_mid_depth_word_boundary(spark):
    r = _run(spark, [(1, "a b c d", "XX", 500_000)])[1]
    assert r.insert_word == 2
    assert r.rendered == "a b XX c d"


def test_length_invariant(spark):
    for depth in (0, 250_000, 333_333, 750_000, 1_000_000):
        r = _run(spark, [(1, "one two three four five", "NEEDLE", depth)])[1]
        assert r.render_len == len("one two three four five") + len("NEEDLE") + 1
        assert r.rendered.count("NEEDLE") == 1


def test_needle_never_splits_a_word(spark):
    r = _run(spark, [(1, "alpha beta gamma", "XX", 400_000)])[1]
    # floor(3 * 0.4) = 1 -> after 'alpha'
    assert r.rendered == "alpha XX beta gamma"
    for w in ("alpha", "beta", "gamma"):
        assert w in r.rendered.split(" ")

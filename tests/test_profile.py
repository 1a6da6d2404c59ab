"""Unit tests for the dataset profiling operators (q88/q89 kernels)."""

from __future__ import annotations

from jsonl_dataingestion_pipeline_spark.operators.profile import (
    key_skew_report,
    profile_columns,
)


def test_profile_columns_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "k long, s string"
    )
    out = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 4
    assert out["k"].n_null == 1 and out["k"].null_rate == 0.25
    assert out["k"].n_distinct == 2
    assert (out["k"].min_repr, out["k"].max_repr) == ("1", "2")
    assert out["s"].n_null == 1 and out["s"].n_distinct == 2


def test_key_skew_report_flags_hot_key(spark):
    rows = [(1,)] * 90 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    r = key_skew_report(df, "k").first()
    assert r.n_keys == 11 and r.rows == 100
    assert r.max_count == 90
    assert r.top_share == 0.9
    # mean count = 100/11 -> skew ratio ~9.9
    assert 9 < r.skew_ratio < 10
    assert r.p50_count == 1.0


def test_profile_columns_empty_frame(spark):
    df = spark.createDataFrame([], "k long, s string")
    out = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 0 and out["k"].n_distinct == 0
    assert out["k"].min_repr is None


def test_key_skew_report_uniform_keys(spark):
    df = spark.createDataFrame([(k,) for k in range(100)], "k long")
    r = key_skew_report(df, "k").first()
    assert r.skew_ratio == 1.0 and r.top_share == 0.01


def test_key_skew_report_empty_frame(spark):
    df = spark.createDataFrame([], "k long")
    r = key_skew_report(df, "k").first()
    assert r.n_keys == 0 and r.top_share is None

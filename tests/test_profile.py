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


def test_psi_report_hand_computed(spark):
    import math

    from jsonl_dataingestion_pipeline_spark.operators.profile import (
        psi_report,
    )

    cur = spark.createDataFrame(
        [("A",), ("A",), ("B",), ("B",)], "bucket string"
    )
    ref = spark.createDataFrame(
        [("A",), ("A",), ("B",), ("C",)], "bucket string"
    )
    out = {r.bucket: r for r in psi_report(cur, ref, "bucket").collect()}
    # A: 2/4 vs 2/4 -> identical shares, zero contribution
    assert (out["A"].cur_p_u, out["A"].ref_p_u, out["A"].psi_u) == (
        500_000, 500_000, 0,
    )
    # B: 500000 vs 250000
    b = out["B"]
    assert b.psi_u == round((500_000 - 250_000) * math.log(2.0))
    # C: absent from cur -> floored at 1 micro-unit, finite term
    c = out["C"]
    assert (c.cur_n, c.cur_p_u, c.ref_p_u) == (0, 1, 250_000)
    assert c.psi_u == round((1 - 250_000) * math.log(1 / 250_000))


def test_psi_zero_drift_is_all_zero(spark):
    from jsonl_dataingestion_pipeline_spark.operators.profile import (
        psi_report,
    )

    df = spark.createDataFrame([(i % 5,) for i in range(50)], "bucket int")
    out = psi_report(df, df, "bucket").collect()
    assert all(r.psi_u == 0 for r in out)


def test_psi_share_widening_survives_int64_product_boundary(spark):
    """Round-9 accumulator sweep: pins the EXACT widened share
    expression psi_report uses (profile.py) at a count where the
    pre-sweep int64 product (count * 1e6) raised ARITHMETIC_OVERFLOW
    under ANSI — 3e13 rows is a plausible per-bucket count at 100 TB."""
    import pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(30_000_000_000_000, 70_000_000_000_000)], "cur_n long, __ct long"
    )
    r = df.select(
        F.expr(
            "(CAST(cur_n AS DECIMAL(38,0)) * 1000000) div __ct"
        ).alias("p")
    ).collect()[0]
    assert r.p == 428_571  # floor(3e13 * 1e6 / 7e13)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.select(F.expr("(cur_n * 1000000) div __ct")).collect()


def test_psi_report_values_unchanged_by_widening(spark):
    """The widening is value-transparent: hand-checked shares at small
    counts are identical to the pre-sweep integer path."""
    from jsonl_dataingestion_pipeline_spark.operators.profile import (
        psi_report,
    )

    cur = spark.createDataFrame([(1,)] * 3 + [(2,)] * 1, "bucket long")
    ref = spark.createDataFrame([(1,)] * 2 + [(2,)] * 2, "bucket long")
    out = {r.bucket: r for r in psi_report(cur, ref, "bucket").collect()}
    assert out[1].cur_p_u == 750_000 and out[1].ref_p_u == 500_000
    assert out[2].cur_p_u == 250_000 and out[2].ref_p_u == 500_000

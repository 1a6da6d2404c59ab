"""Data-repair operators: imputation, winsorization, survivorship."""
from __future__ import annotations

from jsonl_dataingestion_pipeline_spark.operators.repair import (
    golden_record,
    impute_mode,
    winsorize,
)


def test_impute_mode_fills_with_group_majority(spark):
    df = spark.createDataFrame(
        [
            ("a", "x"), ("a", "x"), ("a", "y"), ("a", None),
            ("b", "z"), ("b", None),
            ("c", None),                 # all-null group stays null
            (None, "q"), (None, None),   # NULL group key imputes too
        ],
        "g string, v string",
    )
    got = sorted(
        [(r.g, r.v) for r in impute_mode(df, "v", "g").collect()],
        key=lambda t: (t[0] is None, t[0] or "", t[1] or ""),
    )
    assert got == [
        ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
        ("b", "z"), ("b", "z"), ("c", None),
        (None, "q"), (None, "q"),
    ]


def test_impute_mode_tie_breaks_smallest(spark):
    df = spark.createDataFrame(
        [("a", "y"), ("a", "x"), ("a", None)], "g string, v string"
    )
    vals = [r.v for r in impute_mode(df, "v", "g").collect()]
    assert sorted(vals, key=str) == ["x", "x", "y"]  # tie -> "x"


def test_winsorize_clips_to_percentiles(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", "g", lo=0.0, hi=0.5)
    vs = sorted(r.v for r in out.collect())
    assert max(vs) == 6.0        # p50 of 1..10,1000 is 6.0
    assert min(vs) == 1.0


def test_winsorize_propagates_null_values(spark):
    """A NULL value must survive winsorization as NULL, not get imputed
    to the group's lower bound (GREATEST skips NULLs — ADVICE r3)."""
    rows = [("a", float(v)) for v in range(1, 11)] + [("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    vs = [r.v for r in winsorize(df, "v", "g", lo=0.2, hi=0.8).collect()]
    assert vs.count(None) == 1
    assert min(v for v in vs if v is not None) > 1.0  # clipping still works


def test_golden_record_majority_per_field(spark):
    df = spark.createDataFrame(
        [
            (1, "Acme", "NY"), (1, "Acme", None), (1, "ACME Inc", "NY"),
            (2, None, "SF"),
        ],
        "cl long, name string, city string",
    )
    got = {r.cl: r for r in golden_record(df, "cl", ["name", "city"]).collect()}
    assert got[1].name == "Acme" and got[1].city == "NY"
    assert got[2].name is None and got[2].city == "SF"

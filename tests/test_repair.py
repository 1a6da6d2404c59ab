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


class TestResolveEntities:
    def test_planted_duplicates_resolve_and_survive(self, spark):
        from jsonl_dataingestion_pipeline_spark.plans.entity import (
            resolve_entities,
        )

        rows = [
            (1, "acme corp", "US"),
            (2, "acme corp.", "US"),     # lev 1 from mention 1
            (3, "acme korp", None),      # lev 1 from mention 1
            (4, "zenith ltd", "DE"),
            (5, "zenith ltd", "DE"),     # exact dup
            (6, "solo gmbh", "FR"),      # singleton
        ]
        df = spark.createDataFrame(rows, "mid long, nm string, ctry string")
        assign, golden = resolve_entities(
            df, id_col="mid", name_col="nm", attrs=["ctry"],
            max_distance=2, key_start=1, key_length=4,
        )
        a = {r.mid: r.entity for r in assign.collect()}
        assert a[1] == a[2] == a[3] == 1
        assert a[4] == a[5] == 4
        assert a[6] == 6
        g = {r.entity: (r.nm, r.ctry) for r in golden.collect()}
        # majority vote with smallest-value tiebreak; nulls ignored
        assert g[1] == ("acme corp", "US")
        assert g[4] == ("zenith ltd", "DE")
        assert g[6] == ("solo gmbh", "FR")

    def test_blocking_prevents_cross_block_matches(self, spark):
        from jsonl_dataingestion_pipeline_spark.plans.entity import (
            resolve_entities,
        )

        # lev("abcd x", "zbcd x") = 1 but block keys (first 4) differ
        df = spark.createDataFrame(
            [(1, "abcd x", None), (2, "zbcd x", None)],
            "mid long, nm string, ctry string",
        )
        assign, _ = resolve_entities(
            df, id_col="mid", name_col="nm", attrs=["ctry"],
            max_distance=2, key_start=1, key_length=4,
        )
        a = {r.mid: r.entity for r in assign.collect()}
        assert a == {1: 1, 2: 2}


def test_match_pairs_max_block_drops_hot_block_and_logs(spark, caplog):
    """The skew guard: a block over max_block is dropped from candidate
    generation (its pairs vanish), healthy blocks are untouched, and
    the drop is LOGGED — the dedup max_bucket contract, ported to
    entity matching (SCALING.md round-7 hot-block knee)."""
    import logging

    from pyspark.sql import functions as F

    from jsonl_dataingestion_pipeline_spark.plans.entity import match_pairs

    rows = [(i, f"hot {i:02d}", "HOTK") for i in range(10)] + [
        (100, "acme corp", "ACME"),
        (101, "acme corp.", "ACME"),
    ]
    m = spark.createDataFrame(
        rows, "mid long, nm string, bk string"
    ).select(
        F.col("mid").alias("__mid"),
        F.col("nm").alias("__mname"),
        F.col("bk").alias("__bk"),
    )
    exact = match_pairs(m, 2).collect()
    assert len(exact) == 45 + 1  # C(10,2) hot pairs + the acme pair
    with caplog.at_level(
        logging.WARNING,
        logger="jsonl_dataingestion_pipeline_spark.plans.entity",
    ):
        capped = match_pairs(m, 2, max_block=5).collect()
    assert {(r.id_l, r.id_r) for r in capped} == {(100, 101)}
    assert any("dropped 1 hot block" in r.message for r in caplog.records)

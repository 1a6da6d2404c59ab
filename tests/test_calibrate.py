"""Score calibration: exact percentile semantics, threshold behavior,
and the sort-free approximate bucket path's agreement with the exact
path (operators/calibrate.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.calibrate import (
    bucket_calibrate,
    percentile_calibrate,
)


def _df(spark):
    rows = [("a", i, float(i)) for i in range(11)] + [
        ("b", 100 + i, float(i % 3)) for i in range(9)
    ]
    return spark.createDataFrame(rows, "src string, id long, score double")


def test_percentile_is_rank_over_group(spark):
    out = {
        r.id: (r.cal_pct_u, r.cal_pass)
        for r in percentile_calibrate(
            _df(spark), "score", "src", threshold=0.8
        ).collect()
    }
    # group a: scores 0..10 -> percentile i/10
    assert out[0] == (0, False)
    assert out[5] == (500_000, False)
    assert out[8] == (800_000, True)
    assert out[10] == (1_000_000, True)
    # group b: ties share a percentile (rank semantics)
    tie_vals = {out[100 + i][0] for i in range(9) if i % 3 == 0}
    assert len(tie_vals) == 1


def test_thresholds_mean_the_same_thing_per_group(spark):
    # "top 20% of EVERY source": each group passes ~20% regardless of
    # its raw score range — the property raw thresholds lack
    rows = [("hi", i, 1000.0 + i) for i in range(50)] + [
        ("lo", 100 + i, 0.001 * i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    out = percentile_calibrate(df, "score", "src", threshold=0.8)
    per = {
        r.src: r.n
        for r in out.filter("cal_pass")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per["hi"] == per["lo"]


def test_bucket_path_agrees_with_exact_within_tolerance(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"s{i % 3}", i, rng.uniform(0, 100 * (1 + i % 3)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "src string, id long, score double")
    exact = {
        r.id: r.cal_pct_u / 1e6
        for r in percentile_calibrate(df, "score", "src").collect()
    }
    approx = {
        r.id: r.cal_bucket
        for r in bucket_calibrate(
            df, "score", "src", buckets=20
        ).collect()
    }
    for i, pct in exact.items():
        # bucket index ~ floor(pct * 20) within one bucket of slack
        assert abs(approx[i] - pct * 20) <= 2.0, (i, approx[i], pct)


def test_bucket_path_has_no_sort_in_plan(spark):
    df = _df(spark)
    plan = (
        bucket_calibrate(df, "score", "src", buckets=10)
        ._jdf.queryExecution()
        .explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")
        )
    )
    tree = plan.split("\n\n")[0]
    assert "Sort" not in tree, tree
    assert "Window" not in tree, tree


# ---------------------------------------------------------------------------
# group_zscore (round 8)
# ---------------------------------------------------------------------------
def test_group_zscore_hand_computed_and_degenerate(spark):
    import math

    from jsonl_dataingestion_pipeline_spark.operators.calibrate import (
        group_zscore,
    )

    rows = [
        (1, "a", 10), (2, "a", 20), (3, "a", 30),
        (4, "b", 7), (5, "b", 7),           # zero variance -> NULL
        (6, "c", 99),                        # n = 1 -> NULL
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = {
        r.id: r.gz_u for r in group_zscore(df, "v", "g").collect()
    }
    # group a: population std over {10,20,30}
    vs = [10, 20, 30]
    n, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
    for rid, v in [(1, 10), (2, 20), (3, 30)]:
        exp = round((v * n - s) / math.sqrt(n * ss - s * s) * 1e6)
        assert got[rid] == exp, (rid, got[rid], exp)
    assert got[4] is None and got[5] is None and got[6] is None


def test_group_zscore_layout_independent(spark):
    from jsonl_dataingestion_pipeline_spark.operators.calibrate import (
        group_zscore,
    )

    rows = [(i, f"g{i % 3}", (i * 37) % 101) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    outs = []
    for parts in (1, 7):
        outs.append(
            sorted(
                tuple(r)
                for r in group_zscore(
                    df.repartition(parts), "v", "g"
                ).collect()
            )
        )
    assert outs[0] == outs[1]

"""as-of join and range join operator tests."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.joins import asof_join, range_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00")),
            (1, ts("2024-01-01 12:00:00")),  # tie with right row
            (2, ts("2024-01-01 11:00:00")),  # right row is later -> no match
            (3, ts("2024-01-01 11:00:00")),  # key absent from right
        ],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00"), "a", 1.0),
            (1, ts("2024-01-01 12:00:00"), "b", 2.0),
            (2, ts("2024-01-01 11:30:00"), "c", 3.0),
        ],
        "k long, ts timestamp, v string, x double",
    )
    out = {
        (r["k"], r["ts"]): (r["matched_ts"], r["v"], r["x"])
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert out[(1, ts("2024-01-01 10:00:00"))] == (ts("2024-01-01 09:00:00"), "a", 1.0)
    # inclusive on ties (DuckDB/kdb ASOF semantics)
    assert out[(1, ts("2024-01-01 12:00:00"))] == (ts("2024-01-01 12:00:00"), "b", 2.0)
    assert out[(2, ts("2024-01-01 11:00:00"))] == (None, None, None)
    assert out[(3, ts("2024-01-01 11:00:00"))] == (None, None, None)


def test_asof_join_null_payload_does_not_leak(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 12:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00:00"), "old"),
            (1, ts("2024-01-01 11:00:00"), None),  # newest row has null v
        ],
        "k long, ts timestamp, v string",
    )
    r = asof_join(left, right, on="ts", by=["k"]).first()
    # must match the 11:00 row (v=None), NOT reach back to 'old'
    assert r["matched_ts"] == ts("2024-01-01 11:00:00")
    assert r["v"] is None


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 12:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), "a")], "k long, ts timestamp, v string"
    )
    hit = asof_join(left, right, on="ts", by=["k"], tolerance_seconds=4 * 3600).first()
    miss = asof_join(left, right, on="ts", by=["k"], tolerance_seconds=3600).first()
    assert hit["v"] == "a"
    assert miss["v"] is None and miss["matched_ts"] is None


def test_range_join(spark):
    facts = spark.createDataFrame(
        [(1, 50.0), (2, 1000.0), (3, 4999.0), (4, 99999.0)], "id long, price double"
    )
    bands = spark.createDataFrame(
        [("low", 0.0, 1000.0), ("mid", 1000.0, 5000.0), ("high", 5000.0, 1e12)],
        "band string, lo double, hi double",
    )
    got = {
        r["id"]: r["band"]
        for r in range_join(facts, bands, value="price").collect()
    }
    assert got == {1: "low", 2: "mid", 3: "mid", 4: "high"}  # [lo, hi)


def test_range_join_no_shuffle_on_facts(spark):
    facts = spark.range(0, 10000).select(F.col("id"), (F.col("id") % 100).cast("double").alias("price"))
    bands = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 200.0)], "band string, lo double, hi double"
    )
    joined = range_join(facts, bands, value="price")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_asof_join_deterministic_tiebreak(spark):
    """Multiple right rows at the same (key, ts): the struct-wise largest
    payload must win, on every run and partitioning."""
    left = spark.createDataFrame(
        [("k", "2024-01-01 12:00:00")], "k string, ts_s string"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 11:00:00", v) for v in ("b", "c", "a")],
        "k string, ts_s string, v string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v").repartition(4)
    for _ in range(3):
        got = asof_join(left, right, on="ts", by=["k"]).first()
        assert got["v"] == "c"  # max payload among the equal-ts rows


def test_asof_join_keyless_matches_keyed(spark):
    """by=[] must produce the same matches as a constant-key keyed run
    (the keyless path is range-partitioned, not a global window)."""
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, ts("2024-01-01 00:00:00") + datetime.timedelta(minutes=rng.randrange(5000)))
         for i in range(300)],
        "lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(i, ts("2024-01-01 00:00:00") + datetime.timedelta(minutes=rng.randrange(5000)), float(i))
         for i in range(200)],
        "rid long, ts timestamp, v double",
    )
    keyless = asof_join(left, right, on="ts", by=[], right_cols=["v"])
    keyed = asof_join(
        left.withColumn("__k", F.lit(1)),
        right.withColumn("__k", F.lit(1)),
        on="ts",
        by=["__k"],
        right_cols=["v"],
    ).drop("__k")
    a = {(r["lid"]): (r["matched_ts"], r["v"]) for r in keyless.collect()}
    b = {(r["lid"]): (r["matched_ts"], r["v"]) for r in keyed.collect()}
    assert a == b and len(a) == 300


def test_asof_join_keyless_plan_is_range_partitioned(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"))], "lid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1.0)], "rid long, ts timestamp, v double"
    )
    plan = asof_join(left, right, on="ts", by=[], right_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    # the big data path shuffles by timestamp RANGE, never to one partition
    assert "rangepartitioning(__ts" in plan


def test_asof_join_keyed_plan_has_no_single_partition_exchange(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1.0)], "k long, ts timestamp, v double"
    )
    plan = asof_join(left, right, on="ts", by=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_asof_directions_match_pandas_merge_asof(spark):
    """Differential: backward/forward/nearest against pandas merge_asof
    on seeded-random keyed data (unique right timestamps per key; left
    timestamps never equidistant, so `nearest` has a unique answer)."""
    import random

    import pandas as pd

    from jsonl_dataingestion_pipeline_spark.operators.joins import asof_join

    rng = random.Random(13)
    keys = ["a", "b", "c"]
    right_rows = [
        (k, 10 * i, f"{k}{i}")
        for k in keys
        for i in rng.sample(range(1, 40), 12)
    ]
    left_rows = []
    for j in range(120):
        t = rng.randrange(0, 420)
        if t % 10 == 5:
            t += 1  # never equidistant between two right ts
        left_rows.append((rng.choice(keys), t, j))

    ldf = spark.createDataFrame(left_rows, "k string, ts long, lid long")
    rdf = spark.createDataFrame(right_rows, "k string, ts long, val string")

    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values(
        "ts", kind="stable"
    )
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "val"]).sort_values(
        "ts", kind="stable"
    )

    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: (r.matched_ts, r.val)
            for r in asof_join(
                ldf, rdf, on="ts", by=["k"], direction=direction
            ).collect()
        }
        exp_df = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            suffixes=("", "_r"),
        )
        for _, row in exp_df.iterrows():
            exp = (
                (None, None)
                if pd.isna(row["val"])
                else (int(row["ts_r"]) if "ts_r" in row else None, row["val"])
            )
            g = got[row["lid"]]
            assert g[1] == exp[1], (direction, row["lid"], g, exp)


def test_asof_keyless_forward_and_nearest(spark):
    from jsonl_dataingestion_pipeline_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [(1, 7), (2, 12), (3, 100)], "lid long, ts long"
    )
    rdf = spark.createDataFrame(
        [(10, "x"), (11, "y"), (50, "z")], "ts long, val string"
    )
    fwd = {
        r.lid: r.val
        for r in asof_join(ldf, rdf, on="ts", by=[],
                           direction="forward").collect()
    }
    assert fwd == {1: "x", 2: "z", 3: None}
    near = {
        r.lid: r.val
        for r in asof_join(ldf, rdf, on="ts", by=[],
                           direction="nearest").collect()
    }
    assert near == {1: "x", 2: "y", 3: "z"}


def test_asof_keyless_forward_duplicate_right_ts_layout_independent(spark):
    """Duplicate right timestamps + keyless forward: the in-partition
    window tie-break must agree with the cross-partition min-carry, so
    the matched row is the struct-MIN payload regardless of how many
    range partitions the union lands in (ADVICE r3: payload DESC in the
    window picked MAX while the carry picked MIN — the match then
    depended on where the partition boundary fell)."""
    from jsonl_dataingestion_pipeline_spark.operators.joins import asof_join

    # many left rows before a block of equal-ts right rows, so with
    # shuffle.partitions > 1 some left rows resolve via the carry and
    # some via the in-partition window
    ldf = spark.createDataFrame(
        [(i, i) for i in range(40)], "lid long, ts long"
    )
    rdf = spark.createDataFrame(
        [(50, "zz"), (50, "aa"), (50, "mm"), (90, "later")],
        "ts long, val string",
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for nparts in ("1", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            results[nparts] = {
                r.lid: r.val
                for r in asof_join(
                    ldf, rdf, on="ts", by=[], direction="forward"
                ).collect()
            }
        assert results["1"] == results["8"]
        # struct-min among the equal-ts rows: ("aa",) sorts first
        assert set(results["8"].values()) == {"aa"}
        # keyed path (constant key) agrees with the keyless path
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        keyed = {
            r.lid: r.val
            for r in asof_join(
                ldf.withColumn("k", F.lit(1)),
                rdf.withColumn("k", F.lit(1)),
                on="ts", by=["k"], direction="forward",
            ).collect()
        }
        assert keyed == results["8"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


class TestIntervalOverlapJoin:
    def _join(self, spark, left, right, bin_width):
        from jsonl_dataingestion_pipeline_spark.operators.joins import (
            interval_overlap_join,
        )

        l = spark.createDataFrame(left, "lid long, s long, e long")
        r = spark.createDataFrame(right, "rid long, s long, e long")
        return {
            (x.lid, x.rid): (x.ov_start, x.ov_end)
            for x in interval_overlap_join(
                l, r,
                l_start="s", l_end="e", r_start="s", r_end="e",
                bin_width=bin_width,
            ).collect()
        }

    def test_matches_brute_force_any_bin_width(self, spark):
        import random

        rng = random.Random(31)
        left = [
            (i, a, a + rng.randint(0, 40))
            for i, a in ((i, rng.randint(0, 300)) for i in range(40))
        ]
        right = [
            (j, a, a + rng.randint(0, 25))
            for j, a in ((j, rng.randint(0, 300)) for j in range(30))
        ]
        want = {
            (li, rj): (max(ls, rs), min(le, re))
            for (li, ls, le) in left
            for (rj, rs, re) in right
            if ls <= re and rs <= le
        }
        # the result must be bin-width INVARIANT: replication changes,
        # the deduped answer does not
        for w in (1, 7, 50, 1000):
            assert self._join(spark, left, right, w) == want, w

    def test_touching_endpoints_count_as_overlap(self, spark):
        got = self._join(spark, [(1, 0, 10)], [(2, 10, 20)], 7)
        assert got == {(1, 2): (10, 10)}

    def test_disjoint_produce_nothing(self, spark):
        assert self._join(spark, [(1, 0, 5)], [(2, 6, 9)], 3) == {}

    def test_bad_bin_width_rejected(self, spark):
        import pytest as _p

        from jsonl_dataingestion_pipeline_spark.operators.joins import (
            interval_overlap_join,
        )

        l = spark.createDataFrame([(1, 0, 1)], "lid long, s long, e long")
        with _p.raises(ValueError, match="bin_width"):
            interval_overlap_join(
                l, l, l_start="s", l_end="e", r_start="s", r_end="e",
                bin_width=0,
            )


def test_interval_overlap_preserves_input_multiplicity(spark):
    """Duplicate input rows (same id, same interval) must each produce
    their own output pair — theta-join multiplicity, which the q166
    oracle enforces. The round-6 sf0.1 regression: dropDuplicates
    collapsed two identical lineitem rows; the canonical-bin filter
    keeps them."""
    from jsonl_dataingestion_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    l = spark.createDataFrame(
        [(1, 0, 100), (1, 0, 100)], "lid long, s long, e long"
    )
    r = spark.createDataFrame([(2, 50, 60)], "rid long, s long, e long")
    out = interval_overlap_join(
        l, r, l_start="s", l_end="e", r_start="s", r_end="e",
        bin_width=7,
    ).collect()
    # long interval spans many bins; exactly TWO rows survive (one per
    # duplicate input), not one and not bins-many
    assert len(out) == 2
    assert all((x.ov_start, x.ov_end) == (50, 60) for x in out)

"""Bradley-Terry preference fitting: Python-replay differential,
ordering sanity, guards, distributed-state plan shape."""
from __future__ import annotations

from collections import defaultdict

import pytest

from jsonl_dataingestion_pipeline_spark.operators.preference import (
    bt_strengths,
)

_COMPS = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 2),
          (2, 1), (1, 4)]


def _rha(x: float) -> int:
    # the engines' ROUND semantics (see classifier.round_half_away:
    # floor(x+0.5) is wrong one ulp below .5)
    from jsonl_dataingestion_pipeline_spark.functions.classifier import (
        round_half_away,
    )

    return round_half_away(x)


def _fit_py(comps, iters, lr):
    su: dict = defaultdict(int)
    items = {i for c in comps for i in c}
    n = len(comps)
    for _ in range(iters):
        g: dict = defaultdict(int)
        for w, lo in comps:
            z = (su[w] - su[lo]) / 1e9
            p = 0.5 + 0.5 * z / (1.0 + abs(z))
            q = _rha((p - 1.0) * 1e9)
            g[w] += q
            g[lo] -= q
        for i in items:
            su[i] -= _rha(lr * g[i] / n)
    return {i: su[i] for i in items}


def test_bt_matches_python_replay_and_orders_correctly(spark):
    df = spark.createDataFrame(_COMPS, "w long, l long")
    got = {
        r["item"]: r["bt_strength_u"]
        for r in bt_strengths(df, "w", "l", iterations=4, lr=2.0).collect()
    }
    exp = _fit_py(_COMPS, 4, 2.0)
    assert got == exp
    # dominance order 1 > 2 > 3 > 4 (1 beats all, one upset 2>1)
    order = sorted(got, key=lambda i: (-got[i], i))
    assert order == [1, 2, 3, 4]
    # strengths are centered near (not exactly at) 0: rounded per-item
    # steps are not precisely zero-sum
    assert abs(sum(got.values())) <= 4 * len(got)


def test_bt_guards(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "w long, l long")
    with pytest.raises(ValueError, match="self-comparison"):
        bt_strengths(df, "w", "l")
    empty = df.filter("w > 99")
    with pytest.raises(ValueError, match="empty comparison log"):
        bt_strengths(empty, "w", "l")
    ok = spark.createDataFrame([(1, 2)], "w long, l long")
    with pytest.raises(ValueError, match="iterations"):
        bt_strengths(ok, "w", "l", iterations=0)


def test_bt_state_stays_distributed(spark):
    """The returned strength frame reads from the loop's checkpoint
    (Scan ExistingRDD) — per-item state is a DataFrame end to end,
    never a collected driver structure re-parallelized from literals
    (no LocalTableScan of items) and never a cartesian shape."""
    df = spark.createDataFrame(_COMPS, "w long, l long")
    out = bt_strengths(df, "w", "l", iterations=2)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    tree = (
        out._jdf.queryExecution().explainString(jmode).split("\n\n")[0]
    )
    assert "Scan ExistingRDD" in tree, tree
    assert "LocalTableScan" not in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_bt_layout_independent(spark):
    """Same strengths under different shuffle layouts (the integer-sum
    determinism contract applied to distributed GD state)."""
    df = spark.createDataFrame(_COMPS, "w long, l long")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        outs = []
        for parts in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            outs.append(
                sorted(
                    tuple(r)
                    for r in bt_strengths(
                        df.repartition(int(parts)), "w", "l", iterations=3
                    ).collect()
                )
            )
        assert outs[0] == outs[1]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


class TestDpoPairs:
    def _pairs(self, spark, rows, **kw):
        from jsonl_dataingestion_pipeline_spark.operators.preference import (
            dpo_pairs,
        )

        df = spark.createDataFrame(
            rows, "prompt long, resp long, score long"
        )
        return {
            r.prompt: r
            for r in dpo_pairs(df, "prompt", "resp", "score", **kw).collect()
        }

    def test_best_vs_worst(self, spark):
        out = self._pairs(
            spark,
            [(1, 10, 300), (1, 11, 900), (1, 12, 100), (1, 13, 600)],
        )
        r = out[1]
        assert (r.chosen, r.rejected) == (11, 12)
        assert (r.chosen_score, r.rejected_score) == (900, 100)
        assert r.margin == 800 and r.n_candidates == 4

    def test_all_tied_prompt_emits_nothing(self, spark):
        out = self._pairs(spark, [(1, 10, 500), (1, 11, 500), (1, 12, 500)])
        assert out == {}

    def test_margin_gate(self, spark):
        rows = [(1, 10, 100), (1, 11, 150)]
        assert 1 in self._pairs(spark, rows, min_margin=50)
        assert self._pairs(spark, rows, min_margin=51) == {}

    def test_singleton_pool_emits_nothing(self, spark):
        assert self._pairs(spark, [(1, 10, 999)]) == {}

    def test_tiebreak_smallest_id_both_sides(self, spark):
        out = self._pairs(
            spark,
            [(1, 12, 900), (1, 10, 900), (1, 21, 100), (1, 20, 100)],
        )
        r = out[1]
        assert (r.chosen, r.rejected) == (10, 20)

    def test_chosen_never_equals_rejected(self, spark):
        rows = [
            (p, p * 10 + i, (p * 37 + i * 91) % 1000)
            for p in range(20)
            for i in range(3)
        ]
        for r in self._pairs(spark, rows).values():
            assert r.chosen != r.rejected
            assert r.margin >= 1

    def test_plan_single_aggregate_no_window(self, spark):
        from jsonl_dataingestion_pipeline_spark.operators.preference import (
            dpo_pairs,
        )

        df = spark.createDataFrame(
            [(1, 1, 1)], "prompt long, resp long, score long"
        )
        plan = (
            dpo_pairs(df, "prompt", "resp", "score")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert plan.count("Exchange") <= 1


class TestLengthBiasAudit:
    def _audit(self, spark, rows, **kw):
        from jsonl_dataingestion_pipeline_spark.operators.preference import (
            length_bias_audit,
        )

        df = spark.createDataFrame(rows, "grp long, cl long, rl long")
        return length_bias_audit(df, "cl", "rl", **kw).collect()

    def test_ungrouped_totals(self, spark):
        rows = [(0, 100, 50), (0, 30, 60), (0, 40, 40), (0, 80, 10)]
        [r] = self._audit(spark, rows)
        assert (r.n_pairs, r.longer_wins, r.ties) == (4, 2, 1)
        # 2 longer wins of 3 non-ties
        assert r.longer_rate_u == 2 * 10**6 // 3
        assert r.sum_len_diff == 50 - 30 + 0 + 70

    def test_grouped(self, spark):
        rows = [(0, 10, 5), (1, 5, 10), (1, 6, 10)]
        out = {r.grp: r for r in self._audit(spark, rows, group_col="grp")}
        assert out[0].longer_rate_u == 10**6
        assert out[1].longer_rate_u == 0 and out[1].n_pairs == 2

    def test_all_ties_rate_zero(self, spark):
        [r] = self._audit(spark, [(0, 7, 7), (0, 9, 9)])
        assert r.ties == 2 and r.longer_rate_u == 0


class TestDpoPairsReviewFixes:
    def test_min_margin_zero_rejected(self, spark):
        import pytest as _pytest
        from jsonl_dataingestion_pipeline_spark.operators.preference import (
            dpo_pairs,
        )

        df = spark.createDataFrame(
            [(1, 10, 500)], "prompt long, resp long, score long"
        )
        with _pytest.raises(ValueError):
            dpo_pairs(df, "prompt", "resp", "score", min_margin=0)

    def test_string_response_ids(self, spark):
        from jsonl_dataingestion_pipeline_spark.operators.preference import (
            dpo_pairs,
        )

        df = spark.createDataFrame(
            [(1, "rb", 900), (1, "ra", 900), (1, "rz", 100)],
            "prompt long, resp string, score long",
        )
        [r] = dpo_pairs(df, "prompt", "resp", "score").collect()
        assert (r.chosen, r.rejected) == ("ra", "rz")

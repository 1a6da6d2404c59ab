"""Token-budget mixture planning: capping, redistribution, integer
exactness, and input validation (operators/mixture.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.mixture import (
    MAX_PLAN_TOKENS,
    micro_weights,
    plan_token_budget,
)


def _corpus(spark):
    # avail: a=1000, b=1000, c=8000 tokens
    rows = (
        [("a", 10) for _ in range(100)]
        + [("b", 100) for _ in range(10)]
        + [("c", 80) for _ in range(100)]
    )
    return spark.createDataFrame(rows, "src string, toks int")


def test_uncapped_plan_matches_targets_exactly(spark):
    # budget 5000, weights 50/30/20 — no source hits its 4-epoch cap
    # (a wants 2500 = 2.5 epochs of its 1000)
    out = {
        r.mix_source: r
        for r in plan_token_budget(
            _corpus(spark), "src", "toks",
            {"a": 0.5, "b": 0.3, "c": 0.2},
            budget_tokens=5000,
        ).collect()
    }
    assert out["a"].mix_want == 2500 and out["a"].mix_realized == 2500
    assert out["b"].mix_realized == 1500
    assert out["c"].mix_realized == 1000
    assert out["a"].mix_epochs_u == 2_500_000  # 2.5 epochs exactly
    assert out["c"].mix_epochs_u == 125_000    # 0.125 epochs


def test_cap_binds_and_leftover_redistributes_once(spark):
    # a wants 40000*0.8 = 32000 but caps at 4 * 1000 = 4000; the 28000
    # leftover flows to b and c proportionally (b: 28000*1/3 = 9333 ->
    # caps at 4000 too; c absorbs its share under its 32000 cap)
    out = {
        r.mix_source: r
        for r in plan_token_budget(
            _corpus(spark), "src", "toks",
            {"a": 0.8, "b": 0.1, "c": 0.1},
            budget_tokens=40_000,
        ).collect()
    }
    assert out["a"].mix_realized == 4000       # capped
    assert out["a"].mix_epochs_u == 4_000_000  # exactly the cap
    assert out["b"].mix_realized == 4000       # first 4000 (capped)
    # c: first = 4000, extra = 28000 * wu / wopen clamped to headroom
    assert out["c"].mix_realized > 4000
    assert out["c"].mix_realized <= 32_000
    total = sum(r.mix_realized for r in out.values())
    assert total <= 40_000


def test_sources_missing_from_targets_are_dropped(spark):
    out = plan_token_budget(
        _corpus(spark), "src", "toks",
        {"a": 0.6, "b": 0.4},
        budget_tokens=1000,
    ).collect()
    assert {r.mix_source for r in out} == {"a", "b"}


def test_micro_weights_sum_exactly_and_validate():
    w = micro_weights({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert sum(w.values()) == 1_000_000
    with pytest.raises(ValueError, match="sum to 1"):
        micro_weights({"a": 0.5, "b": 0.4})


def test_bounds_validation(spark):
    with pytest.raises(ValueError, match="budget_tokens"):
        plan_token_budget(
            _corpus(spark), "src", "toks", {"a": 1.0},
            budget_tokens=MAX_PLAN_TOKENS + 1,
        )
    with pytest.raises(ValueError, match="max_epochs"):
        plan_token_budget(
            _corpus(spark), "src", "toks", {"a": 1.0},
            budget_tokens=100, max_epochs=9.0,
        )


def test_plan_independent_of_shuffle_layout(spark):
    # int64 floor divisions over exact sums: any partitioning yields
    # the identical plan (the ANN determinism contract, applied here)
    df = _corpus(spark)
    a = sorted(map(tuple, plan_token_budget(
        df.repartition(1), "src", "toks",
        {"a": 0.8, "b": 0.1, "c": 0.1}, budget_tokens=40_000,
    ).collect()))
    b = sorted(map(tuple, plan_token_budget(
        df.repartition(16), "src", "toks",
        {"a": 0.8, "b": 0.1, "c": 0.1}, budget_tokens=40_000,
    ).collect()))
    assert a == b


def test_plan_invariants_hold_under_random_inputs(spark):
    """Property test (hypothesis-lite via seeded random): for random
    weights/budgets/corpora the plan must satisfy the contract —
    realized <= want-or-cap bounds, epochs <= cap, budget never
    exceeded, all non-negative, and layout independence."""
    import random

    rng = random.Random(13)
    for trial in range(6):
        n_src = rng.randint(1, 6)
        srcs = [f"s{i}" for i in range(n_src)]
        rows = []
        for s in srcs:
            for _ in range(rng.randint(1, 30)):
                rows.append((s, rng.randint(1, 500)))
        df = spark.createDataFrame(rows, "src string, toks int")
        raw = [rng.random() + 0.01 for _ in srcs]
        tot = sum(raw)
        targets = {s: w / tot for s, w in zip(srcs, raw)}
        budget = rng.randint(100, 2_000_000)
        max_ep = rng.choice([1.0, 2.5, 4.0, 8.0])
        out = plan_token_budget(
            df, "src", "toks", targets,
            budget_tokens=budget, max_epochs=max_ep,
        ).collect()
        assert out, (trial, targets)
        total_realized = 0
        for r in out:
            assert r.mix_avail > 0
            assert 0 <= r.mix_realized
            cap = r.mix_avail * int(max_ep * 1000) // 1000
            assert r.mix_realized <= cap, (trial, r)
            assert r.mix_epochs_u <= int(max_ep * 1_000_000) + 1, r
            total_realized += r.mix_realized
        assert total_realized <= budget, (trial, total_realized, budget)


def test_oversized_source_raises_in_plan(spark):
    """ADVICE r7: mix_avail above MAX_PLAN_TOKENS must raise (in-plan
    raise_error), never silently wrap mix_avail * me_milli past int64."""
    df = spark.createDataFrame(
        [("a", MAX_PLAN_TOKENS + 1), ("b", 10)], "src string, toks long"
    )
    with pytest.raises(Exception, match="plan in larger units"):
        plan_token_budget(
            df, "src", "toks", {"a": 0.5, "b": 0.5}, budget_tokens=100
        ).collect()


def test_curriculum_stage_assignment_and_pacing(spark):
    from jsonl_dataingestion_pipeline_spark.operators.mixture import (
        curriculum_stages,
    )

    # scores straddle the two boundaries: stage 1 (<10), 2 ([10,20)),
    # 3 (>=20); tokens chosen so each census line is distinct
    rows = [
        (1, 5, 100), (2, 9, 50), (3, 10, 7), (4, 19, 3), (5, 25, 1),
    ]
    df = spark.createDataFrame(rows, "id long, s long, t long")
    out = {
        r.stage: r
        for r in curriculum_stages(df, "s", (10, 20), "t").collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1].n_docs, out[1].stage_tokens) == (2, 150)
    assert (out[2].n_docs, out[2].stage_tokens) == (2, 10)
    assert (out[3].n_docs, out[3].stage_tokens) == (1, 1)
    assert (out[1].min_score_u, out[1].max_score_u) == (5, 9)
    # pacing: cumulative tokens in stage order
    assert (out[1].cum_tokens, out[2].cum_tokens, out[3].cum_tokens) == (
        150, 160, 161,
    )


def test_curriculum_rejects_unsorted_boundaries(spark):
    from jsonl_dataingestion_pipeline_spark.operators.mixture import (
        curriculum_stages,
    )

    df = spark.createDataFrame([(1, 1, 1)], "id long, s long, t long")
    with pytest.raises(ValueError, match="ascending"):
        curriculum_stages(df, "s", (20, 10), "t")

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

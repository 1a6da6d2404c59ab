"""k-means: separated blobs recovered, determinism, numpy replay."""
from __future__ import annotations

import numpy as np

from jsonl_dataingestion_pipeline_spark.operators.clustering import kmeans


def _blob_df(spark, centers, per, spread=0.05, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for c in centers:
        base = np.zeros(dim)
        base[c % dim] = float(c + 1)
        for _ in range(per):
            v = base + rng.uniform(-spread, spread, dim)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_kmeans_recovers_separated_blobs(spark):
    df = _blob_df(spark, centers=[0, 3, 6], per=20)
    out = kmeans(df, "vec", "id", k=3, iterations=5).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.id)
    # three well-separated blobs -> exactly the three id ranges
    groups = sorted(frozenset(s) for s in by_cluster.values())
    assert sorted(map(sorted, groups)) == [
        list(range(0, 20)), list(range(20, 40)), list(range(40, 60))
    ]
    assert all(r.dist2 < 0.1 for r in out)  # tight blobs


def test_kmeans_deterministic_across_runs(spark):
    df = _blob_df(spark, centers=[1, 4], per=15, spread=0.5)
    r1 = sorted(map(tuple, kmeans(df, "vec", "id", k=2, iterations=4).collect()))
    r2 = sorted(map(tuple, kmeans(df, "vec", "id", k=2, iterations=4).collect()))
    assert r1 == r2


def test_kmeans_matches_numpy_replay(spark):
    """Independent numpy replay of the same algorithm (rounded init,
    rounded distances with cluster-id tie-break, rounded averages,
    empty clusters keep previous centroids)."""
    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((30, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "id long, vec array<double>",
    )
    k, iters = 4, 3
    got = {
        r.id: (r.cluster, r.dist2)
        for r in kmeans(df, "vec", "id", k=k, iterations=iters).collect()
    }

    pts = np.round(vecs, 9)
    cent = {c: pts[c].copy() for c in range(k)}  # k smallest ids

    def assign():
        out = {}
        for i in range(len(pts)):
            dists = [
                (round(float(((pts[i] - cent[c]) ** 2).sum()), 6), c)
                for c in sorted(cent)
            ]
            out[i] = min(dists)
        return out

    for _ in range(iters):
        a = assign()
        for c in sorted(cent):
            members = [pts[i] for i, (d, cc) in a.items() if cc == c]
            if members:
                cent[c] = np.round(np.mean(members, axis=0), 9)
    final = assign()
    for i, (d, c) in final.items():
        gc, gd = got[i]
        assert gc == c, (i, gc, c)
        assert abs(gd - d) < 2e-6, (i, gd, d)


def test_kmeans_raises_on_too_few_points(spark):
    import pytest

    df = spark.createDataFrame([(1, [0.0, 1.0])], "id long, vec array<double>")
    with pytest.raises(ValueError):
        kmeans(df, "vec", "id", k=3, iterations=1)


def test_kmeans_join_assignment_bit_equal(spark):
    """The large-k broadcast-array assignment returns byte-identical
    (cluster, dist2) to the literal-projection path — same fold order,
    rounding, and tie-break, just data instead of codegen literals."""
    rng = np.random.RandomState(23)
    vecs = rng.standard_normal((40, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "id long, vec array<double>",
    )
    lit = sorted(map(tuple, kmeans(
        df, "vec", "id", k=4, iterations=3, assign_via_join=False
    ).collect()))
    jn = sorted(map(tuple, kmeans(
        df, "vec", "id", k=4, iterations=3, assign_via_join=True
    ).collect()))
    assert lit == jn


def test_kmeans_auto_mode_picks_join_for_large_kd(spark):
    """assign_via_join=None must route through the broadcast path when
    k*d > AUTO_JOIN_KD: the final plan carries a BroadcastNestedLoopJoin
    and ZERO shuffle Exchanges (assignment is still one scan)."""
    from jsonl_dataingestion_pipeline_spark.operators import clustering

    rng = np.random.RandomState(5)
    d = 64
    vecs = rng.standard_normal((80, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "id long, vec array<double>",
    )
    k = 70  # k*d = 4480 > AUTO_JOIN_KD=4096
    assert k * d > clustering.AUTO_JOIN_KD
    out = kmeans(df, "vec", "id", k=k, iterations=1)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in tree, tree
    assert "ShuffleExchange" not in plan.replace(
        "Exchange SinglePartition", ""
    )
    # no shuffle Exchange at all in the assignment query
    for line in tree.splitlines():
        node = line.split("- ")[-1]
        assert not node.startswith("Exchange hashpartitioning"), tree


def _adversarial_blob_df(spark, centers, per, spread=0.05, dim=8, seed=13):
    """Blobs with ids ordered so the first k points ALL sit in blob 0 —
    the layout that breaks fixed first-k init."""
    rng = np.random.RandomState(seed)
    rows = []
    i = 0
    for c in centers:
        base = np.zeros(dim)
        base[c % dim] = float(c + 1) * 3.0
        for _ in range(per):
            v = base + rng.uniform(-spread, spread, dim)
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "id long, vec array<double>")


def _inertia(rows):
    return sum(r.dist2 for r in rows)


def test_kmeansll_recovers_blobs_where_first_k_merges(spark):
    """ids 0..19 are all blob 0, so first_k puts every seed in one
    blob and Lloyd's converges with clusters merged; kmeans|| seeds
    across the space and recovers the three id ranges exactly."""
    from jsonl_dataingestion_pipeline_spark.operators.clustering import (
        kmeans,
    )

    df = _adversarial_blob_df(spark, centers=[0, 3, 6], per=20)
    fixed = kmeans(df, "vec", "id", k=3, iterations=6).collect()
    seeded = kmeans(
        df, "vec", "id", k=3, iterations=6, init="kmeans||"
    ).collect()

    by_cluster: dict[int, set[int]] = {}
    for r in seeded:
        by_cluster.setdefault(r.cluster, set()).add(r.id)
    groups = sorted(sorted(s) for s in by_cluster.values())
    assert groups == [
        list(range(0, 20)), list(range(20, 40)), list(range(40, 60))
    ]
    # the seeded solution is strictly better (fixed init merges blobs:
    # its inertia carries at least one whole blob's spread to a far
    # centroid)
    assert _inertia(seeded) < _inertia(fixed) / 10


def test_kmeansll_deterministic(spark):
    from jsonl_dataingestion_pipeline_spark.operators.clustering import (
        kmeans,
    )

    df = _adversarial_blob_df(spark, centers=[1, 5], per=15, spread=0.4)
    r1 = sorted(map(tuple, kmeans(
        df, "vec", "id", k=2, iterations=4, init="kmeans||"
    ).collect()))
    r2 = sorted(map(tuple, kmeans(
        df, "vec", "id", k=2, iterations=4, init="kmeans||"
    ).collect()))
    assert r1 == r2


def test_kmeansll_init_returns_k_distinct_spread_seeds(spark):
    from jsonl_dataingestion_pipeline_spark.operators.clustering import (
        kmeansll_init,
    )

    df = _adversarial_blob_df(spark, centers=[0, 3, 6], per=20)
    seeds = kmeansll_init(df, "vec", "id", k=3)
    assert len(seeds) == 3
    # one seed per true blob: the dominant coordinate differs
    dims = sorted(int(np.argmax(np.abs(s))) for s in seeds)
    assert dims == [0, 3, 6]

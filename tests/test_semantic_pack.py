"""Semantic (in-context) packing: the global semantic order is a dense
permutation grouped by cell, within-cell order follows centroid
similarity, packing coordinates equal the naive prefix sum over that
order, and the assign_cells extension (keep/with_sim) changes nothing
for existing callers."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.packing import (
    semantic_pack,
)
from jsonl_dataingestion_pipeline_spark.operators.similarity import (
    assign_cells,
    make_centroids,
)


def _corpus(spark, n=40, dim=4):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], 10 + i % 7)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, n_tokens int"
    )


def test_assign_cells_keep_and_sim_are_additive(spark):
    c = _corpus(spark)
    cts = make_centroids(c, 4)
    base = {
        r.vec_id: r.cell_id for r in assign_cells(c, cts).collect()
    }
    ext = assign_cells(c, cts, keep=("n_tokens",), with_sim=True).collect()
    assert {r.vec_id: r.cell_id for r in ext} == base
    n_by_id = {r.vec_id: r.n_tokens for r in c.collect()}
    for r in ext:
        assert r.n_tokens == n_by_id[r.vec_id]
        assert -1.0 <= r.cell_sim <= 1.0


def test_semantic_order_is_dense_cell_grouped_and_sim_sorted(spark):
    c = _corpus(spark, n=60)
    out = semantic_pack(
        c, n_col="n_tokens", seq_len=32, n_cells=4
    ).collect()
    orders = sorted(r.sem_order for r in out)
    assert orders == list(range(60))
    # cells occupy contiguous order ranges, in cell_id order
    by_order = sorted(out, key=lambda r: r.sem_order)
    cells = [r.cell_id for r in by_order]
    assert cells == sorted(cells)
    # within a cell, rank follows centroid similarity (recompute)
    cts = {r.cell_id: r.embedding for r in make_centroids(c, 4).collect()}
    sims = {
        (r.vec_id): round(
            sum(a * b for a, b in zip(r.embedding, cts[r.cell_id]))
            / (
                sum(a * a for a in r.embedding) ** 0.5
                * sum(b * b for b in cts[r.cell_id]) ** 0.5
            ),
            9,
        )
        for r in assign_cells(c, make_centroids(c, 4)).collect()
    }
    prev = {}
    for r in by_order:
        if r.cell_id in prev:
            p = prev[r.cell_id]
            assert (sims[p.vec_id], -p.vec_id) >= (
                sims[r.vec_id], -r.vec_id
            )
        prev[r.cell_id] = r


def test_packing_matches_naive_prefix_over_semantic_order(spark):
    c = _corpus(spark, n=50)
    out = sorted(
        semantic_pack(
            c, n_col="n_tokens", seq_len=16, n_cells=3, bucket_size=7
        ).collect(),
        key=lambda r: r.sem_order,
    )
    off = 0
    for r in out:
        assert r.tok_start == off
        assert r.seq_first == off // 16
        assert r.seq_last == (off + r.n_tokens - 1) // 16
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        off += r.n_tokens

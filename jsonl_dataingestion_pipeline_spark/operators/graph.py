"""Iterative graph analytics on DataFrames.

The near-dup clustering operator (``operators/dedup.py``) already does
one distributed iterative graph algorithm (min-id label propagation);
this module adds the other classic, PageRank — the pattern for ANY
fixed-point computation over an edge table (influence scoring, spam-site
demotion in crawl curation, citation weighting).

Spark-first shape: each iteration is one ``src``-keyed join (ranks are
re-partitioned on the join key every round, so the edge relation's
partitioning is reused) plus one ``dst``-keyed aggregation with map-side
partial sums. Lineage is cut every ``checkpoint_every`` rounds
(localCheckpoint; pass ``reliable=True`` on a real cluster for
fault-tolerant checkpoints) so the plan does not grow unboundedly — the
same discipline the dedup clustering loop uses.

Determinism: every IEEE operation (divide, multiply, literal parse) is
bit-identical across engines; ONLY the summation order of incoming
contributions is run-dependent (~1e-16 relative noise). Rounding each
iteration's ranks to ``scale`` decimals (default 1e-9 grid, six orders
of magnitude above the noise) collapses both engines onto the same
values, which is what makes the operator oracle-replayable — the same
trick would NOT work without the per-iteration re-round, because
unrounded noise compounds over iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
    scale: int = 9,
    checkpoint_every: int = 4,
    reliable: bool = False,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """PageRank over a directed edge table. Dangling nodes (no
    out-edges — a real crawl graph is full of them) are handled the
    standard way: their rank mass is redistributed uniformly to every
    node each iteration, so total rank stays 1. The dangling-mass term
    is computed as a 1-row aggregate and broadcast-cross-joined (never
    a per-row collect); when the graph has no dangling nodes (checked
    once at setup, one driver scalar) the term is skipped entirely and
    the loop is exactly the lean two-join shape.

    ``broadcast_ranks=True`` (default) ships the |V|-sized rank and
    degree vectors to the edge partitions each round, so the (much
    larger) edge relation is NEVER shuffled — per-iteration shuffle
    traffic is the partial-aggregated contribution sums, ~|V| rows.
    Set it False when |V| itself exceeds broadcast capacity (billions
    of nodes); the loop then falls back to src-keyed shuffle joins.

    Returns (node_id, rank) for every node appearing as src or dst,
    ranks rounded to ``scale`` decimals per iteration (see module note).
    """
    def _break(d: DataFrame) -> DataFrame:
        return d.checkpoint(eager=True) if reliable else d.localCheckpoint(
            eager=True
        )

    # materialize the STATIC relations once — every iteration consumes
    # them, and without the barrier each iteration's job would recompute
    # the whole upstream edge construction (measured 2-3x the loop cost)
    e = _break(
        edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    )
    nodes = _break(
        e.select(F.col("__src").alias("node_id"))
        .union(e.select(F.col("__dst").alias("node_id")))
        .distinct()
    )
    deg = _break(e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg")))
    # dangling = nodes with no out-edges; their per-iteration rank mass
    # is redistributed uniformly (checked once — two driver scalars, a
    # count each, NOT per-row collects; the teleport term needs |V| as
    # a literal anyway)
    dangling = _break(
        nodes.join(
            deg.withColumnRenamed("__src", "node_id"), on="node_id",
            how="left_anti",
        )
    )
    has_dangling = dangling.count() > 0
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: edge table is empty (no nodes)")
    teleport = (1.0 - damping) / n
    # static (node_id, __deg) stitched once so each iteration broadcasts
    # ONE |V|-frame to the edges (rank+degree together), not two
    nodes_deg = _break(
        nodes.join(
            deg.withColumnRenamed("__src", "node_id"), on="node_id",
            how="left",
        )
    )
    ranks = nodes_deg.withColumn("rank", F.round(F.lit(1.0 / n), scale))
    rank_side = (
        (lambda d: F.broadcast(d)) if broadcast_ranks else (lambda d: d)
    )
    for i in range(iterations):
        contribs = (
            e.join(rank_side(ranks), e["__src"] == ranks["node_id"])
            .select(
                F.col("__dst").alias("node_id"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
        )
        summed = contribs.groupBy("node_id").agg(F.sum("__c").alias("__in"))
        incoming = F.coalesce(F.col("__in"), F.lit(0.0))
        stitched = nodes_deg.join(rank_side(summed), on="node_id", how="left")
        if has_dangling:
            # 1-row dangling-mass frame, broadcast to every node. The
            # mass is re-rounded like the ranks so the summation-order
            # noise (module note) can't leak into the next iteration.
            dmass = (
                ranks.join(dangling, on="node_id", how="leftsemi")
                .agg(
                    F.round(
                        F.coalesce(F.sum("rank"), F.lit(0.0)), scale
                    ).alias("__dmass")
                )
            )
            stitched = stitched.crossJoin(F.broadcast(dmass))
            incoming = incoming + F.col("__dmass") / F.lit(float(n))
        # the stitch join is |V| x |V|: same size class as the rank
        # vector, so it rides the same broadcast knob. __deg rides along
        # so the next iteration's edge join needs no second broadcast.
        ranks = stitched.select(
            "node_id",
            "__deg",
            F.round(
                F.lit(teleport) + F.lit(damping) * incoming, scale
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = _break(ranks)
    return ranks.select("node_id", "rank")

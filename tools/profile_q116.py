#!/usr/bin/env python
"""One-off attribution probe for the round-8 frozen-core regression
(q116_pagerank 7.0s -> 16.8s with zero code change in its path).

Times each phase of the q116 plan separately at sf0.1 and A/Bs the
lineage-cut mechanism (localCheckpoint vs persist(DISK_ONLY) vs
persist(MEMORY_AND_DISK)) plus the rank-vector transport
(broadcast_ranks True/False).  Run alone on an idle box — timings on
this host swing 2-3x under concurrency.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark import StorageLevel
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_q116",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("p"),
    )
    edges = (
        li.select(F.col("s").alias("src"), F.col("p").alias("dst"))
        .union(li.select(F.col("p").alias("src"), F.col("s").alias("dst")))
        .distinct()
    )
    t0 = time.time()
    n_edges = edges.count()
    print(f"edge build+distinct: {time.time()-t0:.2f}s  ({n_edges} edges)")

    from jsonl_dataingestion_pipeline_spark.operators import graph as G

    def timed(tag, **kw):
        t0 = time.time()
        out = G.pagerank(edges, iterations=6, **kw)
        n = out.count()
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s ({n} rows)")
        return dt

    # steady state: run each variant twice, report both
    for r in range(2):
        print(f"--- round {r} ---")
        timed("localCheckpoint broadcast=True (shipping config)")
        timed("localCheckpoint broadcast=False", broadcast_ranks=False)

    # A/B the lineage-cut mechanism by monkeypatching DataFrame method
    # resolution inside pagerank's _break: simplest is a variant copy here.
    def pagerank_persist(edges, iterations, level, broadcast_ranks=True):
        def _break(d):
            d = d.persist(level)
            d.count()
            return d

        e = _break(edges.select(F.col("src").alias("__src"),
                                F.col("dst").alias("__dst")))
        nodes = _break(
            e.select(F.col("__src").alias("node_id"))
            .union(e.select(F.col("__dst").alias("node_id")))
            .distinct()
        )
        deg = _break(e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg")))
        n = nodes.count()
        tele = F.lit((1.0 - 0.85) / n)
        init_rank = F.round(F.lit(1.0 / n), 9)
        nodes_deg = _break(
            nodes.join(deg.withColumnRenamed("__src", "node_id"),
                       on="node_id", how="left")
        )
        ranks = nodes_deg.withColumn("rank", init_rank)
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
            summed = contribs.groupBy("node_id").agg(
                F.sum("__c").alias("__in"))
            stitched = nodes_deg.join(rank_side(summed), on="node_id",
                                      how="left")
            ranks = stitched.select(
                "node_id", "__deg",
                F.round(
                    tele + F.lit(0.85)
                    * F.coalesce(F.col("__in"), F.lit(0.0)), 9
                ).alias("rank"),
            )
            if (i + 1) % 4 == 0 and i + 1 < iterations:
                ranks = _break(ranks)
        return ranks.select("node_id", "rank")

    for r in range(2):
        for name, level in (
            ("DISK_ONLY", StorageLevel.DISK_ONLY),
            ("MEMORY_AND_DISK", StorageLevel.MEMORY_AND_DISK),
            ("MEMORY_ONLY", StorageLevel.MEMORY_ONLY),
        ):
            t0 = time.time()
            out = pagerank_persist(edges, 6, level)
            n = out.count()
            print(f"persist({name}) broadcast=True round {r}: "
                  f"{time.time()-t0:.2f}s ({n} rows)")
            spark.catalog.clearCache()

    # per-iteration cost under the shipping config: time iterations 1..6
    for iters in (1, 2, 4, 6):
        t0 = time.time()
        G.pagerank(edges, iterations=iters).count()
        print(f"iterations={iters}: {time.time()-t0:.2f}s")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

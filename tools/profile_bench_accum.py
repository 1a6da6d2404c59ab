#!/usr/bin/env python
"""Replicates the bench.py session shape to attribute the round-8
frozen-core regression: runs the full sf0.001 warmup pass (exactly as
bench.py does), then times q116/q26/q118 at sf0.1, then applies a
cleanup (JVM System.gc + clearCache) and times them again.

If the post-warmup timings are ~2.5x the isolated-session timings and
the cleanup restores them, the regression is session-state accumulation
(localCheckpoint blocks + broadcasts pinned until a JVM GC lets
ContextCleaner fire), not a code or runtime-version change.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench as benchmod
import __spark_entry__ as entrymod
from jsonl_dataingestion_pipeline_spark import get_spark


def mem_status(spark):
    sc = spark.sparkContext
    jvm = sc._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used = (rt.totalMemory() - rt.freeMemory()) / (1 << 20)
    mm = sc._jsc.sc().env().memoryManager()
    return (
        f"heap_used={used:.0f}MiB "
        f"storage_mem={mm.storageMemoryUsed() / (1 << 20):.0f}MiB "
        f"execution_mem={mm.executionMemoryUsed() / (1 << 20):.0f}MiB"
    )


def time_q(spark, qs, name, sf_dir, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="profile_accum",
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
    qs = entrymod.queries_full()
    probes = ["q116_pagerank", "q26_minhash_lsh_pairs", "q118_web_pipeline"]

    # baseline: probe timings in the fresh session (warm each once first)
    for name in probes:
        qs[name](spark, "/root/testdata/sf0.001").count()
    print(f"[fresh] {mem_status(spark)}", flush=True)
    for name in probes:
        print(f"[fresh] {name}: {time_q(spark, qs, name, sf_dir):.2f}s",
              flush=True)
    print(f"[after-fresh-probes] {mem_status(spark)}", flush=True)

    # the bench preamble: full sf0.001 warmup over all 81 headline queries
    t0 = time.time()
    for name in benchmod.HEADLINE:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            print(f"warmup FAILED {name}: {e}", flush=True)
    print(f"[warmup done in {time.time()-t0:.0f}s] {mem_status(spark)}",
          flush=True)

    for name in probes:
        print(f"[post-warmup] {name}: {time_q(spark, qs, name, sf_dir):.2f}s",
              flush=True)
    print(f"[post-warmup probes] {mem_status(spark)}", flush=True)

    # cleanup: drop caches + force a JVM GC so ContextCleaner reaps dead
    # localCheckpoint RDD blocks and broadcasts
    spark.catalog.clearCache()
    jvm = spark.sparkContext._jvm
    for _ in range(3):
        jvm.System.gc()
        time.sleep(1)
    time.sleep(3)
    print(f"[after cleanup] {mem_status(spark)}", flush=True)
    for name in probes:
        print(f"[post-cleanup] {name}: {time_q(spark, qs, name, sf_dir):.2f}s",
              flush=True)
    print(f"[end] {mem_status(spark)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

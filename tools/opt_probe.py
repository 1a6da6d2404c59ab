#!/usr/bin/env python
"""Round-10 optimization probe: isolate queries per the optimization
guide §1 — time the computation with the noop sink (not the driver
materialization bench.py's contract uses), label the jobs, and dump
``explain("formatted")`` to ``plans/r10/<query>_<tag>.txt`` so plan
claims in OPTIMIZATION_r10.md are checkable without running Spark.

Usage:
    python tools/opt_probe.py [--tag before|after] [--runs N]
        [--sf SF_DIR] q192_substring_dedup [q196_... ...]

Prints one JSON line per query: {"query": ..., "noop_sec": min_wall,
"runs": [..], "steal_s": ..} and writes the plan file. Timing
methodology mirrors bench.py (warmup at sf0.001 first, min over runs,
per-run /proc/stat steal recorded) so numbers are attributable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return -1


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    runs = 2
    plan_only = False
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--plan-only":
            plan_only = True; i += 1
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as entrymod
    from jsonl_dataingestion_pipeline_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="opt_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries_full()
    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11")
    )
    os.makedirs(plans_dir, exist_ok=True)
    tick_hz = float(os.sysconf("SC_CLK_TCK"))

    warm_sf = "/root/testdata/sf0.001"
    for name in names:
        fn = qs[name]
        if plan_only:
            df = fn(spark, sf_dir)
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
            print(json.dumps({"query": name, "tag": tag, "plan": "ok"}),
                  flush=True)
            continue
        # codegen warmup at the smallest SF (bench.py methodology)
        if os.path.isdir(warm_sf):
            try:
                fn(spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:
                print(f"# warmup FAILED {name}: {e}", file=sys.stderr)
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        walls, steals = [], []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"probe:{name}")
            st0 = _steal_ticks()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
            st1 = _steal_ticks()
            steals.append(
                round((st1 - st0) / tick_hz, 2)
                if st0 >= 0 and st1 >= 0 else -1.0
            )
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "query": name, "tag": tag, "noop_sec": min(walls),
            "runs": walls, "steal_s": steals, "sf_dir": sf_dir,
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

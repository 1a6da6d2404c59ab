#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares:
  - row count
  - schema (sorted column names)
  - order-insensitive value multiset (normalized)

Usage: python tools/check_correctness.py [sf_dir] [query_prefix...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT comparison (bit-level, modulo -0.0): the driver's value
        # hash may be exact, so the harness must be at least as strict.
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = sys.argv[2:] or None

    import duckdb

    import __spark_entry__ as entrymod
    from jsonl_dataingestion_pipeline_spark import get_spark

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            # 50 batteries accumulate checkpoint blocks + cached
            # training state in ONE local JVM; the 1g default heap
            # OOMs around battery ~30 at sf0.1 (ObjectHashAggregate
            # percentile buffers were the first casualty)
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "8g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        # The driver's pandas canonicalizer sort_values raw result columns
        # and cannot hash list/dict cells (CORRECTNESS_r03 q60/q97 erred
        # with "unhashable type: 'list'"), so a top-level array/map/struct
        # column must FAIL here even though _norm() could compare it —
        # local green must predict driver green.
        from pyspark.sql.types import ArrayType, MapType, StructType

        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            print(
                f"FAIL  {name}: driver-incompatible complex-typed columns "
                f"{complex_cols} (stringify with array_join/to_json)"
            )
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(srows)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = ddf.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            sm, dm = _multiset(srows, scols), _multiset(drows, dcols)
            if sm != dm:
                diff = [
                    (a, b) for a, b in zip(sm, dm) if a != b
                ][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failures += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Static hygiene for the driver contract — no Spark needed.

Catches registration mistakes (missing oracle, missing shape, SQL that
DuckDB cannot even bind) in seconds, long before the full gate runs.
"""
from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_driver_registry_is_exactly_50_and_aligned(entrymod):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) == 50
    assert set(q) == set(o)


def test_every_full_query_has_oracle_and_shape(entrymod):
    qf = entrymod.queries_full()
    of = entrymod.oracle_sql_full()
    missing_oracle = sorted(set(qf) - set(of))
    assert not missing_oracle, missing_oracle
    # every query referenced by a fold needs a declared shape
    folded = {
        q
        for parts in entrymod._UNION_MERGES.values()
        for _tag, q in parts
    }
    folded |= {
        q
        for _key, parts in entrymod._JOIN_MERGES.values()
        for q, _renames in parts
    }
    missing_shape = sorted(folded - set(entrymod._ORACLE_SHAPES))
    assert not missing_shape, missing_shape


def test_all_driver_oracles_bind_in_duckdb(entrymod, con):
    """EXPLAIN (bind + plan, no execution) every driver-facing oracle."""
    failures = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 — report all binder errors
            failures.append((name, str(e).splitlines()[0]))
    assert not failures, failures

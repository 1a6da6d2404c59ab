"""Driver-harness compatibility: every driver-facing ``queries()`` entry
must produce a result shape the driver's canonicalizer can process.

The r2->r3 lesson: builder-invisible driver behaviors cost a round each.
Round 2 was the 50-row recording cap; round 3 was the pandas
canonicalizer -- the driver sorts the raw result columns with
``DataFrame.sort_values``, which factorizes object columns through a
hash table, so any list/dict cell raises ``TypeError: unhashable type``
(CORRECTNESS_r03: q60_text_ranking, q97_event_type_map both erred).

This test replays that exact canonicalization against every entry's
result schema at sf0.001: it builds each query's plan (no full
execution needed -- ``df.schema`` is analysis-only for all but the
eagerly-materializing parity queries), synthesizes a small pandas frame
with type-faithful sample values (lists for ArrayType, dicts for
MapType/StructType -- exactly what ``toPandas`` would deliver), and
runs ``sort_values`` over all columns the way the driver does. A
driver-incompatible output shape fails HERE, at build time, instead of
burning a round.
"""
from __future__ import annotations

import datetime
import decimal
import importlib.util
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    spec = importlib.util.spec_from_file_location(
        "entry_compat_under_test", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _samples(dt: T.DataType, i: int):
    """Two distinct type-faithful sample values (index i in {0,1}), shaped
    the way ``toPandas`` delivers them to the driver."""
    if isinstance(dt, T.ArrayType):
        return [[_samples(dt.elementType, 0)], [_samples(dt.elementType, 1)]][i]
    if isinstance(dt, T.MapType):
        return {_samples(dt.keyType, i): _samples(dt.valueType, i)}
    if isinstance(dt, T.StructType):
        return {f.name: _samples(f.dataType, i) for f in dt.fields}
    if isinstance(dt, T.StringType):
        return ["a", "b"][i]
    if isinstance(dt, T.BooleanType):
        return [False, True][i]
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return [1.5, 2.5][i]
    if isinstance(dt, T.DecimalType):
        return [decimal.Decimal("1.5"), decimal.Decimal("2.5")][i]
    if isinstance(dt, T.DateType):
        return [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)][i]
    if isinstance(dt, T.TimestampType):
        return [
            datetime.datetime(2024, 1, 1, 0, 0),
            datetime.datetime(2024, 1, 2, 0, 0),
        ][i]
    if isinstance(dt, T.BinaryType):
        return [b"a", b"b"][i]
    # integral fallback
    return [1, 2][i]


def _driver_canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization step, replayed: sort_values over the
    raw result columns (factorizes object columns -> hash table -> any
    unhashable cell raises TypeError)."""
    return pdf.sort_values(by=sorted(pdf.columns)).reset_index(drop=True)


def test_every_driver_query_schema_survives_driver_canonicalization(
    spark, entrymod
):
    qs = entrymod.queries()
    bad: list[str] = []
    for name, fn in sorted(qs.items()):
        df = fn(spark, SF)
        pdf = pd.DataFrame(
            {
                f.name: [_samples(f.dataType, 0), _samples(f.dataType, 1)]
                for f in df.schema.fields
            }
        )
        try:
            _driver_canonicalize(pdf)
        except TypeError as e:
            bad.append(f"{name}: {e}")
    assert not bad, (
        "driver-incompatible result shapes (stringify with "
        "array_join/to_json): " + "; ".join(bad)
    )


def test_registry_headroom_policy(entrymod):
    """The driver records exactly 50 rows; the registry must never exceed
    it. New queries MUST fold into an existing battery (COVERAGE.md)."""
    assert len(entrymod.queries()) <= 50


def test_registry_count_matches_coverage_doc(entrymod):
    """COVERAGE.md's headline query count must track the live registry
    (VERDICT r5 item #7: the doc said 143 while the registry held 145).
    Update BOTH when adding queries."""
    n = len(entrymod.queries_full())
    with open("/root/repo/COVERAGE.md") as f:
        doc = f.read()
    assert f"{n} verified queries" in doc, (
        f"registry holds {n} queries; COVERAGE.md headline disagrees"
    )

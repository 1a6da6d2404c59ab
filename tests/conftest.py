from __future__ import annotations

import pytest

from jsonl_dataingestion_pipeline_spark import get_spark
from jsonl_dataingestion_pipeline_spark.schema import CANONICAL_COLUMNS


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


_CANON_SCHEMA = ", ".join(f"`{c}` string" for c in CANONICAL_COLUMNS)


def make_shipment_df(spark, rows: list[dict]):
    """Canonical all-string shipment frame from sparse row dicts."""
    data = [
        tuple(r.get(c) for c in CANONICAL_COLUMNS) for r in rows
    ]
    return spark.createDataFrame(data, schema=_CANON_SCHEMA)


@pytest.fixture()
def shipment_df_factory(spark):
    def _make(rows: list[dict]):
        return make_shipment_df(spark, rows)

    return _make

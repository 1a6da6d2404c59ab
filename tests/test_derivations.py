"""D1-D8 derivation operator tests (SURVEY.md §2.4).

Each scenario is a sparse canonical row pushed through the full transform
with a pinned ``as_of`` (2024-06-01) so 'today'-relative logic is stable.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.derivations import dedup_by_key
from jsonl_dataingestion_pipeline_spark.plans.shipment import transform_shipments

AS_OF = "2024-06-01"


def run_row(factory, row: dict):
    return transform_shipments(factory([row]), as_of=AS_OF).first()


# --- D1: optimal ATA DP ----------------------------------------------------
def test_optimal_ata_prefers_actual(shipment_df_factory):
    r = run_row(
        shipment_df_factory,
        {"ata_dp_date": "10/01/2024", "derived_ata_dp_date": "12/01/2024"},
    )
    assert r["optimal_ata_dp_date"] == datetime.date(2024, 1, 10)


def test_optimal_ata_derived_only_if_past(shipment_df_factory):
    r = run_row(shipment_df_factory, {"derived_ata_dp_date": "12/01/2024"})
    assert r["optimal_ata_dp_date"] == datetime.date(2024, 1, 12)
    r = run_row(shipment_df_factory, {"derived_ata_dp_date": "12/01/2025"})
    assert r["optimal_ata_dp_date"] is None  # future derived date rejected


# --- D2: optimal ETA FD ----------------------------------------------------
def test_optimal_eta_fd_priority(shipment_df_factory):
    r = run_row(
        shipment_df_factory,
        {
            "eta_fd_date": "01/03/2024",
            "revised_eta_fd_date": "02/03/2024",
            "predictive_eta_fd_date": "03/03/2024",
        },
    )
    assert r["optimal_eta_fd_date"] == datetime.date(2024, 3, 3)


# --- D3: DP delay ----------------------------------------------------------
@pytest.mark.parametrize(
    "row,label,days",
    [
        # optimal known: delta vs ETA
        ({"ata_dp_date": "22/01/2024", "eta_dp_date": "20/01/2024"}, "delay", 2),
        ({"ata_dp_date": "18/01/2024", "eta_dp_date": "20/01/2024"}, "early", -2),
        ({"ata_dp_date": "20/01/2024", "eta_dp_date": "20/01/2024"}, "on_time", 0),
        # no optimal: overdue vs as_of (2024-06-01)
        ({"eta_dp_date": "20/05/2024"}, "delay", 12),
        ({"eta_dp_date": "20/07/2024"}, "on_time", 0),
        ({}, "on_time", 0),
    ],
)
def test_dp_delay(shipment_df_factory, row, label, days):
    r = run_row(shipment_df_factory, row)
    assert (r["delayed_dp"], r["dp_delayed_dur"]) == (label, days)


# --- D4: FD delay ----------------------------------------------------------
@pytest.mark.parametrize(
    "row,label,days",
    [
        # real actual (delivery) vs optimal ETA FD
        (
            {"delivery_to_consignee_date": "05/03/2024", "eta_fd_date": "01/03/2024"},
            "delay",
            4,
        ),
        (
            {"delivery_to_consignee_date": "25/02/2024", "eta_fd_date": "01/03/2024"},
            "early",
            -5,
        ),
        # empty return as fallback actual
        (
            {"empty_container_return_date": "02/03/2024", "eta_fd_date": "01/03/2024"},
            "delay",
            1,
        ),
        # no actual, past optimal -> overdue days vs as_of
        ({"eta_fd_date": "22/05/2024"}, "delay", 10),
        # no actual, future optimal -> on time
        ({"eta_fd_date": "22/07/2024"}, "on_time", 0),
        ({}, "on_time", 0),
    ],
)
def test_fd_delay(shipment_df_factory, row, label, days):
    r = run_row(shipment_df_factory, row)
    assert (r["delayed_fd"], r["fd_delayed_dur"]) == (label, days)


# --- D5: status ladder -----------------------------------------------------
@pytest.mark.parametrize(
    "row,status",
    [
        ({"empty_container_return_date": "01/05/2024"}, "EMPTY_CONTAINER_RETURNED"),
        ({"delivery_to_consignee_date": "01/05/2024"}, "DELIVERED"),
        ({"out_gate_at_last_cy_date": "01/05/2024"}, "IN_INLAND_TRANSIT"),
        ({"equipment_arrived_at_last_cy_date": "01/05/2024"}, "AT_LAST_CY"),
        ({"ata_dp_date": "01/05/2024"}, "AT_DP"),
        ({"atd_flp_date": "01/05/2024"}, "IN_OCEAN_TRANSIT"),
        # future derived ATA DP is ignored (not yet arrived) -> ocean transit
        (
            {"atd_flp_date": "01/05/2024", "derived_ata_dp_date": "01/07/2024"},
            "IN_OCEAN_TRANSIT",
        ),
        ({"ata_flp_date": "01/05/2024"}, "AT_TS"),
        ({"etd_lp_date": "01/07/2024"}, "AT_ORIGIN"),
        ({"etd_lp_date": "01/05/2024"}, "UNKNOWN"),  # ETD passed, no ATD
        ({}, "UNKNOWN"),
    ],
)
def test_shipment_status(shipment_df_factory, row, status):
    r = run_row(shipment_df_factory, row)
    assert r["shipment_status"] == status


# --- D6: partition tags ----------------------------------------------------
def test_partition_tags(shipment_df_factory):
    r = run_row(shipment_df_factory, {"etd_lp_date": "05/01/2024"})
    assert r["source_group"] == "2024-01"
    assert r["source_month_tag"] == "jan_24"
    r = run_row(shipment_df_factory, {})
    assert r["source_group"] is None and r["source_month_tag"] is None


# --- D7: workflow gap ------------------------------------------------------
def test_workflow_gap(shipment_df_factory):
    r = run_row(
        shipment_df_factory, {"empty_container_return_date": "01/05/2024"}
    )
    assert r["workflow_gap_flags"] == "missing_delivery_event_with_empty_return"
    r = run_row(shipment_df_factory, {})
    assert r["workflow_gap_flags"] == "none_detected"


# --- D8: dedup -------------------------------------------------------------
def test_dedup_by_key(spark):
    df = spark.createDataFrame(
        [("k1", "b"), ("k1", "a"), ("k2", "c")], schema="k string, v string"
    )
    out = dedup_by_key(df, ["k"], order_by=[F.col("v")])
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {"k1": "a", "k2": "c"}

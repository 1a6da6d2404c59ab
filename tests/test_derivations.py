"""D1-D8 derivation operator tests (SURVEY.md §2.4).

All scenarios are batched into ONE DataFrame and pushed through the full
transform in a single module-scoped job (a per-scenario pipeline run costs
~5s of plan compilation each; batched, the whole module is one job).
``as_of`` pinned to 2024-06-01.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.derivations import dedup_by_key
from jsonl_dataingestion_pipeline_spark.plans.shipment import transform_shipments

AS_OF = "2024-06-01"

# case name -> sparse canonical row
CASES: dict[str, dict] = {
    # D1
    "d1_prefers_actual": {"ata_dp_date": "10/01/2024", "derived_ata_dp_date": "12/01/2024"},
    "d1_derived_past": {"derived_ata_dp_date": "12/01/2024"},
    "d1_derived_future": {"derived_ata_dp_date": "12/01/2025"},
    # D2
    "d2_priority": {
        "eta_fd_date": "01/03/2024",
        "revised_eta_fd_date": "02/03/2024",
        "predictive_eta_fd_date": "03/03/2024",
    },
    # D3
    "d3_delay": {"ata_dp_date": "22/01/2024", "eta_dp_date": "20/01/2024"},
    "d3_early": {"ata_dp_date": "18/01/2024", "eta_dp_date": "20/01/2024"},
    "d3_on_time": {"ata_dp_date": "20/01/2024", "eta_dp_date": "20/01/2024"},
    "d3_overdue": {"eta_dp_date": "20/05/2024"},
    "d3_future_eta": {"eta_dp_date": "20/07/2024"},
    "d3_empty": {},
    # D4
    "d4_late_delivery": {"delivery_to_consignee_date": "05/03/2024", "eta_fd_date": "01/03/2024"},
    "d4_early_delivery": {"delivery_to_consignee_date": "25/02/2024", "eta_fd_date": "01/03/2024"},
    "d4_empty_return_actual": {"empty_container_return_date": "02/03/2024", "eta_fd_date": "01/03/2024"},
    "d4_overdue": {"eta_fd_date": "22/05/2024"},
    "d4_future": {"eta_fd_date": "22/07/2024"},
    # D5 (also exercises D7)
    "d5_empty_returned": {"empty_container_return_date": "01/05/2024"},
    "d5_delivered": {"delivery_to_consignee_date": "01/05/2024"},
    "d5_inland": {"out_gate_at_last_cy_date": "01/05/2024"},
    "d5_at_cy": {"equipment_arrived_at_last_cy_date": "01/05/2024"},
    "d5_at_dp": {"ata_dp_date": "01/05/2024"},
    "d5_ocean": {"atd_flp_date": "01/05/2024"},
    "d5_ocean_future_derived": {"atd_flp_date": "01/05/2024", "derived_ata_dp_date": "01/07/2024"},
    "d5_at_ts": {"ata_flp_date": "01/05/2024"},
    "d5_at_origin": {"etd_lp_date": "01/07/2024"},
    "d5_etd_passed": {"etd_lp_date": "01/05/2024"},
    # D6
    "d6_tags": {"etd_lp_date": "05/01/2024"},
}


@pytest.fixture(scope="module")
def derived(spark):
    from tests.conftest import make_shipment_df

    names = list(CASES)
    rows = []
    for i, name in enumerate(names):
        r = dict(CASES[name])
        r["job_no"] = name  # carried through as the case key
        rows.append(r)
    df = make_shipment_df(spark, rows)
    out = transform_shipments(df, as_of=AS_OF)
    return {r["job_no"]: r for r in out.collect()}


def d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_d1_optimal_ata(derived):
    assert derived["d1_prefers_actual"]["optimal_ata_dp_date"] == d("2024-01-10")
    assert derived["d1_derived_past"]["optimal_ata_dp_date"] == d("2024-01-12")
    assert derived["d1_derived_future"]["optimal_ata_dp_date"] is None


def test_d2_optimal_eta_fd(derived):
    assert derived["d2_priority"]["optimal_eta_fd_date"] == d("2024-03-03")


@pytest.mark.parametrize(
    "case,label,days",
    [
        ("d3_delay", "delay", 2),
        ("d3_early", "early", -2),
        ("d3_on_time", "on_time", 0),
        ("d3_overdue", "delay", 12),
        ("d3_future_eta", "on_time", 0),
        ("d3_empty", "on_time", 0),
    ],
)
def test_d3_dp_delay(derived, case, label, days):
    r = derived[case]
    assert (r["delayed_dp"], r["dp_delayed_dur"]) == (label, days)


@pytest.mark.parametrize(
    "case,label,days",
    [
        ("d4_late_delivery", "delay", 4),
        ("d4_early_delivery", "early", -5),
        ("d4_empty_return_actual", "delay", 1),
        ("d4_overdue", "delay", 10),
        ("d4_future", "on_time", 0),
        ("d3_empty", "on_time", 0),
    ],
)
def test_d4_fd_delay(derived, case, label, days):
    r = derived[case]
    assert (r["delayed_fd"], r["fd_delayed_dur"]) == (label, days)


@pytest.mark.parametrize(
    "case,status",
    [
        ("d5_empty_returned", "EMPTY_CONTAINER_RETURNED"),
        ("d5_delivered", "DELIVERED"),
        ("d5_inland", "IN_INLAND_TRANSIT"),
        ("d5_at_cy", "AT_LAST_CY"),
        ("d5_at_dp", "AT_DP"),
        ("d5_ocean", "IN_OCEAN_TRANSIT"),
        ("d5_ocean_future_derived", "IN_OCEAN_TRANSIT"),
        ("d5_at_ts", "AT_TS"),
        ("d5_at_origin", "AT_ORIGIN"),
        ("d5_etd_passed", "UNKNOWN"),
        ("d3_empty", "UNKNOWN"),
    ],
)
def test_d5_status(derived, case, status):
    assert derived[case]["shipment_status"] == status


def test_d6_partition_tags(derived):
    assert derived["d6_tags"]["source_group"] == "2024-01"
    assert derived["d6_tags"]["source_month_tag"] == "jan_24"
    assert derived["d3_empty"]["source_group"] is None
    assert derived["d3_empty"]["source_month_tag"] is None


def test_d7_workflow_gap(derived):
    assert (
        derived["d5_empty_returned"]["workflow_gap_flags"]
        == "missing_delivery_event_with_empty_return"
    )
    assert derived["d3_empty"]["workflow_gap_flags"] == "none_detected"


def test_d8_dedup_by_key(spark):
    df = spark.createDataFrame(
        [("k1", "b"), ("k1", "a"), ("k2", "c")], schema="k string, v string"
    )
    out = dedup_by_key(df, ["k"], order_by=[F.col("v")])
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {"k1": "a", "k2": "c"}

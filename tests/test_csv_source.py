"""S3/P1/P2 — CSV scan + header validation tests."""

from __future__ import annotations

import pytest

from jsonl_dataingestion_pipeline_spark.schema import SOURCE_HEADERS
from jsonl_dataingestion_pipeline_spark.sources.csv import (
    HeaderValidationError,
    normalize_headers,
    read_shipment_csv,
    validate_headers,
)


def test_normalize_headers():
    assert normalize_headers(["﻿Job  No.", "a\r\nb\tc  d "]) == [
        "Job No.",
        "a b c d",
    ]


def test_validate_headers_happy():
    validate_headers(list(SOURCE_HEADERS))  # no raise


def test_validate_headers_missing():
    with pytest.raises(HeaderValidationError, match="schema mismatch"):
        validate_headers(list(SOURCE_HEADERS)[:-1])


def test_validate_headers_position():
    swapped = list(SOURCE_HEADERS)
    swapped[0], swapped[1] = swapped[1], swapped[0]
    with pytest.raises(HeaderValidationError, match="position"):
        validate_headers(swapped)


def test_read_shipment_csv_strict(tmp_path, spark):
    p = tmp_path / "in.csv"
    header = ",".join(f'"{h}"' for h in SOURCE_HEADERS)
    row = ",".join(["v"] * len(SOURCE_HEADERS))
    p.write_text("﻿" + header + "\n" + row + "\n", encoding="utf-8")
    df = read_shipment_csv(spark, str(p))
    assert df.columns[0] == "job_no"
    assert df.count() == 1
    assert df.first()["job_no"] == "v"


def test_read_shipment_csv_permissive_backfills(tmp_path, spark):
    p = tmp_path / "in.csv"
    keep = list(SOURCE_HEADERS)[:-1]
    header = ",".join(f'"{h}"' for h in keep)
    row = ",".join(["v"] * len(keep))
    p.write_text(header + "\n" + row + "\n", encoding="utf-8")
    with pytest.raises(HeaderValidationError):
        read_shipment_csv(spark, str(p))
    df = read_shipment_csv(spark, str(p), strict=False)
    assert df.first()["empty_container_dispatch_lcn"] is None


def test_read_shipment_csv_auto_latin1_fallback(tmp_path, spark):
    """Reference retries with iso-8859-1 on UnicodeDecodeError
    (src/ingestor.py:104-121); the Spark port detects the encoding in a
    driver-side probe and reads once with the right one."""
    from jsonl_dataingestion_pipeline_spark.sources.csv import (
        detect_encoding,
        read_shipment_csv_auto,
    )

    header = ",".join(f'"{h}"' for h in SOURCE_HEADERS)
    row = ",".join(["Café"] + ["v"] * (len(SOURCE_HEADERS) - 1))

    latin = tmp_path / "latin.csv"
    latin.write_bytes((header + "\n" + row + "\n").encode("iso-8859-1"))
    assert detect_encoding(spark, str(latin)) == "iso-8859-1"
    df = read_shipment_csv_auto(spark, str(latin))
    assert df.first()["job_no"] == "Café"  # no mojibake / U+FFFD

    utf = tmp_path / "utf.csv"
    utf.write_bytes((header + "\n" + row + "\n").encode("utf-8"))
    assert detect_encoding(spark, str(utf)) == "UTF-8"
    assert read_shipment_csv_auto(spark, str(utf)).first()["job_no"] == "Café"

"""Scans and sinks (SURVEY.md §2.1)."""

from .csv import (  # noqa: F401
    HeaderValidationError,
    normalize_headers,
    read_shipment_csv,
    validate_headers,
)
from .formats import read_table, sniff_format, write_table  # noqa: F401
from .jsonl import read_documents, write_documents  # noqa: F401

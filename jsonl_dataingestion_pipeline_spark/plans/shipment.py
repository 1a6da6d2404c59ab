"""The shipment ingestion pipeline, end to end (reference `run_pipeline`,
`src/transformer.py:60-124` + writer normalization + partitioned sink).

The whole transform is a single narrow projection chain: scan -> clean ->
derive -> summarize -> narrative -> content -> doc shaping. No shuffle
until the optional dedup / partitioned write, so it parallelizes linearly
with input splits at any scale.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import split_multi_ids
from ..functions.cleaning import clean_string, coerce_boolean, ensure_str_id
from ..functions.consignee import consignee_codes_list, extract_consignee_name
from ..functions.dates import parse_date_dayfirst, parse_multi_dates
from ..operators import content as content_op
from ..operators import narrative
from ..operators.derivations import dedup_by_key, with_derived_columns
from ..operators.docs import normalize_documents
from ..operators.summaries import (
    carrier_summary,
    critical_dates_summary,
    delay_reason_summary,
    port_route_summary,
    vessel_summary,
)
from ..schema import (
    BOOLEAN_COLUMNS,
    CANONICAL_COLUMNS,
    DATE_COLUMNS,
    DROP_COLUMNS_AFTER_LOAD,
    ID_COLUMNS,
    MULTI_VALUED_DATE_COLS,
    MULTI_VALUED_ID_COLS,
)

AsOf = Union[None, str, _dt.date, Column]


def _as_of_col(as_of: AsOf) -> Column:
    if as_of is None:
        return F.current_date()
    if isinstance(as_of, Column):
        return as_of
    return F.lit(str(as_of)).cast("date")


_CLEAN_PROJECTION_CACHE: dict = {}


def clean_columns(df: DataFrame) -> DataFrame:
    """F1-F6 typing pass over the canonical all-string frame.

    One ``select`` -> one codegen'd stage. Ordering mirrors
    `src/transformer.py:200-205` (strings -> IDs -> booleans -> dates) with
    the list-producing multi-ID split (F6) adopted from the legacy
    transformer per SURVEY.md §7.3.2.

    The ~100 cleaning expressions are a pure function of the column list,
    so the projection is memoized per (Spark application, columns) —
    building it is ~2.5 s of py4j round-trips otherwise (driver-side,
    data-independent; see operators/content.py for the same pattern).
    """
    cache_key = (
        df.sparkSession.sparkContext.applicationId,
        tuple(df.columns),
    )
    cached = _CLEAN_PROJECTION_CACHE.get(cache_key)
    if cached is not None:
        return df.select(*cached)
    multi_dates = set(MULTI_VALUED_DATE_COLS)
    multi_ids = set(MULTI_VALUED_ID_COLS)
    booleans = set(BOOLEAN_COLUMNS)
    dates = set(DATE_COLUMNS)
    ids = set(ID_COLUMNS)

    projection = []
    for name in df.columns:
        c = F.col(f"`{name}`")
        if name in dates and name in multi_dates:
            expr = parse_multi_dates(clean_string(c))
        elif name in dates:
            expr = parse_date_dayfirst(clean_string(c))
        elif name in booleans:
            expr = coerce_boolean(c)
        elif name in multi_ids:
            expr = split_multi_ids(ensure_str_id(clean_string(c)))
        elif name in ids:
            expr = ensure_str_id(clean_string(c))
        else:
            expr = clean_string(c)
        projection.append(expr.alias(name))
    while len(_CLEAN_PROJECTION_CACHE) >= 8:  # bound: evict oldest entry
        _CLEAN_PROJECTION_CACHE.pop(next(iter(_CLEAN_PROJECTION_CACHE), None), None)
    _CLEAN_PROJECTION_CACHE[cache_key] = projection
    return df.select(*projection)


_CONSIGNEE_PROJECTION_CACHE: dict = {}


def with_consignee(df: DataFrame) -> DataFrame:
    """F7/F8 — consignee_name + consignee_codes list from consignee_raw.

    Column trees memoized per application (same pattern/reason as
    ``clean_columns``).
    """
    if "consignee_raw" not in df.columns:
        return df
    cache_key = df.sparkSession.sparkContext.applicationId
    cols = _CONSIGNEE_PROJECTION_CACHE.get(cache_key)
    if cols is None:
        src = F.col("consignee_raw")
        cols = {
            "consignee_name": extract_consignee_name(src),
            "consignee_codes": consignee_codes_list(src),
        }
        while len(_CONSIGNEE_PROJECTION_CACHE) >= 8:  # bound: evict oldest
            _CONSIGNEE_PROJECTION_CACHE.pop(next(iter(_CONSIGNEE_PROJECTION_CACHE), None), None)
        _CONSIGNEE_PROJECTION_CACHE[cache_key] = cols
    return df.withColumns(cols)


_SUMMARY_PROJECTION_CACHE: dict = {}


def with_summaries(df: DataFrame, as_of: Column) -> DataFrame:
    """T1-T5 summary columns.

    Column trees memoized per (application, as_of expression) — they read
    a fixed set of column names, so the input schema does not shape them.
    Same pattern/reason as ``clean_columns``.
    """
    cache_key = (df.sparkSession.sparkContext.applicationId, str(as_of))
    cols = _SUMMARY_PROJECTION_CACHE.get(cache_key)
    if cols is not None:
        return df.withColumns(cols)
    c = F.col
    cols = {
            "critical_dates_summary": critical_dates_summary(
                place_of_receipt=c("place_of_receipt"),
                load_port=c("load_port"),
                final_load_port=c("final_load_port"),
                discharge_port=c("discharge_port"),
                last_cy_lcn=c("equipment_arrived_at_last_cy_lcn"),
                final_destination=c("final_destination"),
                etd_lp=c("etd_lp_date"),
                atd_lp=c("atd_lp_date"),
                ata_flp=c("ata_flp_date"),
                atd_flp=c("atd_flp_date"),
                optimal_ata_dp=c("optimal_ata_dp_date"),
                out_gate_from_dp=c("out_gate_from_dp_date"),
                arrived_last_cy=c("equipment_arrived_at_last_cy_date"),
                delivery=c("delivery_to_consignee_date"),
                empty_return=c("empty_container_return_date"),
            ),
            "delay_reason_summary": delay_reason_summary(
                delayed_dp=c("delayed_dp"),
                dp_delayed_dur=c("dp_delayed_dur"),
                delayed_fd=c("delayed_fd"),
                fd_delayed_dur=c("fd_delayed_dur"),
                last_cy_lcn=c("equipment_arrived_at_last_cy_lcn"),
                final_destination=c("final_destination"),
            ),
            "vessel_summary": vessel_summary(
                c("first_vessel_name"), c("final_vessel_name")
            ),
            "carrier_summary": carrier_summary(
                c("final_carrier_name"), c("true_carrier_scac_name")
            ),
            "port_route_summary": port_route_summary(
                c("place_of_receipt"),
                c("load_port"),
                c("final_load_port"),
                c("discharge_port"),
                c("place_of_delivery"),
                c("final_destination"),
            ),
    }
    while len(_SUMMARY_PROJECTION_CACHE) >= 8:  # bound: evict oldest
        _SUMMARY_PROJECTION_CACHE.pop(next(iter(_SUMMARY_PROJECTION_CACHE), None), None)
    _SUMMARY_PROJECTION_CACHE[cache_key] = cols
    return df.withColumns(cols)


def transform_shipments(
    df: DataFrame,
    as_of: AsOf = None,
    *,
    dedup_key: Optional[str] = None,
) -> DataFrame:
    """Full derivation pipeline over a canonical all-string frame.

    ``as_of`` pins the reference's hidden 'today' clock (SURVEY.md §4.2.4).
    ``dedup_key='carr_eqp_uid'`` enables the legacy D8 dedup (one shuffle).
    """
    clock = _as_of_col(as_of)
    # Parallelism floor (optimization guide §2.5): the D1-D7 + T1-T7
    # derivation tree is a very CPU-heavy codegen projection (the T6/T7
    # narrative assembly alone is ~400 Column nodes of string work per
    # row); pipelined into a few-split scan it runs on that few tasks.
    # Repartition to defaultParallelism only when the input has fewer
    # partitions — a no-op on a real many-split scan.
    from ..operators.common import parallelism_floor

    df = parallelism_floor(df)
    out = clean_columns(df)
    if dedup_key:
        out = dedup_by_key(out, [dedup_key])
    out = with_consignee(out)
    out = with_derived_columns(out, clock)
    out = with_summaries(out, clock)
    out = narrative.with_milestones(out, clock)
    out = content_op.combined_content(out)
    drop_cols = [c for c in DROP_COLUMNS_AFTER_LOAD if c in out.columns]
    if drop_cols:
        out = out.drop(*drop_cols)
    return out


def build_documents(df: DataFrame) -> DataFrame:
    """D9-D11 doc shaping over the transformed frame."""
    return normalize_documents(df)


def run_batch(
    spark,
    input_path: str,
    output_path: str,
    *,
    as_of: AsOf = None,
    strict: bool = True,
    strict_docs: bool = False,
    finalize_names: bool = False,
) -> dict:
    """O1 — the production batch: scan -> transform -> docs -> JSONL sink.

    Returns per-stage wall-clock timings (reference logs the same brackets,
    `src/pipeline.py:75-136`). Note Spark is lazy — "transform" time is
    plan construction; execution cost lands in the write stage.

    ``strict_docs`` mirrors the writer's strict mode
    (`src/writer.py:291-295`): fail the run when any document has a blank
    id or blank content. ``finalize_names`` applies the reference's
    ``<stem>_<tag>_<n>.jsonl`` naming (S7) after the write.
    """
    import logging
    import time

    from pyspark.sql import functions as F

    from ..sources.csv import read_shipment_csv
    from ..sources.jsonl import finalize_filenames, write_documents

    log = logging.getLogger("jsonl_dataingestion_pipeline_spark")
    timings: dict[str, float] = {}

    t0 = time.time()
    raw = read_shipment_csv(spark, input_path, strict=strict)
    timings["ingest_plan"] = round(time.time() - t0, 3)

    t0 = time.time()
    derived = transform_shipments(raw, as_of=as_of)
    docs = build_documents(derived)
    timings["transform_plan"] = round(time.time() - t0, 3)

    if strict_docs:
        t0 = time.time()
        bad = docs.filter(
            F.col("document_id").isNull()
            | (F.trim(F.col("document_id")) == "")
            | (F.trim(F.col("content")) == "")
        ).count()
        timings["validate"] = round(time.time() - t0, 3)
        if bad:
            raise ValueError(
                f"strict mode: {bad} document(s) with empty id/content"
            )

    t0 = time.time()
    write_documents(docs, output_path)
    timings["write"] = round(time.time() - t0, 3)

    if finalize_names:
        t0 = time.time()
        renamed = finalize_filenames(spark, output_path)
        timings["finalize"] = round(time.time() - t0, 3)
        log.info("renamed %d output files", len(renamed))

    log.info("run_batch timings: %s", timings)
    return timings

"""Per-row text summary generators T1-T5 (SURVEY.md §2.6).

Deterministic string assembly over derived columns, expressed as
``concat_ws``/``when`` trees (native, codegen'd — no UDFs). ``concat_ws``
skipping null arguments is what makes the reference's "append if present"
list-building pattern directly expressible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.cleaning import nonblank
from ..functions.dates import fmt_display


def _opt(cond: Column, *parts: Column | str) -> Column:
    """String fragment present only when ``cond`` holds (else null)."""
    frags = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.when(cond, F.concat(*frags))


# ---------------------------------------------------------------------------
# T1 — vessel summary (`src/transformer.py:1063-1073`)
# ---------------------------------------------------------------------------
def vessel_summary(first_vessel_name: Column, final_vessel_name: Column) -> Column:
    fv = nonblank(first_vessel_name)
    lv = nonblank(final_vessel_name)
    return F.concat_ws(
        " | ",
        _opt(fv.isNotNull(), "First vessel: ", fv),
        _opt(lv.isNotNull() & (lv != F.coalesce(fv, F.lit(""))), "Final vessel: ", lv),
    )


# ---------------------------------------------------------------------------
# T2 — carrier summary (`src/transformer.py:1075-1087`)
# ---------------------------------------------------------------------------
def carrier_summary(
    final_carrier_name: Column, true_carrier_scac_name: Column
) -> Column:
    fc = nonblank(final_carrier_name)
    tc = nonblank(true_carrier_scac_name)
    return F.concat_ws(
        " | ",
        _opt(fc.isNotNull(), "Operated by ", fc),
        _opt(
            tc.isNotNull() & (tc != F.coalesce(fc, F.lit(""))),
            "True operating carrier: ",
            tc,
        ),
    )


# ---------------------------------------------------------------------------
# T3 — port route summary (`src/transformer.py:1098-1130`)
# ---------------------------------------------------------------------------
def port_route_summary(
    place_of_receipt: Column,
    load_port: Column,
    final_load_port: Column,
    discharge_port: Column,
    place_of_delivery: Column,
    final_destination: Column,
) -> Column:
    por = nonblank(place_of_receipt)
    lp = nonblank(load_port)
    flp = nonblank(final_load_port)
    dp = nonblank(discharge_port)
    pod = nonblank(place_of_delivery)
    fd = nonblank(final_destination)

    both_distinct = por.isNotNull() & lp.isNotNull() & (por != lp)
    origin_a = (
        F.when(both_distinct, F.concat(F.lit("Origin: "), por))
        .when(lp.isNotNull(), F.concat(F.lit("Origin/Load: "), lp))
        .when(por.isNotNull(), F.concat(F.lit("Origin: "), por))
    )
    origin_b = _opt(both_distinct, "Load Port: ", lp)

    return F.concat_ws(
        " → ",
        origin_a,
        origin_b,
        _opt(
            flp.isNotNull() & (flp != F.coalesce(lp, F.lit(""))),
            "Transshipment: ",
            flp,
        ),
        _opt(dp.isNotNull(), "Discharge: ", dp),
        _opt(pod.isNotNull() & (pod != F.coalesce(dp, F.lit(""))), "Delivery at: ", pod),
        _opt(fd.isNotNull() & (fd != F.coalesce(pod, F.lit(""))), "Final: ", fd),
    )


# ---------------------------------------------------------------------------
# T4 — critical dates summary (`src/transformer.py:617-704`)
# ---------------------------------------------------------------------------
def critical_dates_summary(
    *,
    place_of_receipt: Column,
    load_port: Column,
    final_load_port: Column,
    discharge_port: Column,
    last_cy_lcn: Column,
    final_destination: Column,
    etd_lp: Column,
    atd_lp: Column,
    ata_flp: Column,
    atd_flp: Column,
    optimal_ata_dp: Column,
    out_gate_from_dp: Column,
    arrived_last_cy: Column,
    delivery: Column,
    empty_return: Column,
) -> Column:
    por = nonblank(place_of_receipt)
    lp = nonblank(load_port)
    flp = nonblank(final_load_port)
    dp = nonblank(discharge_port)
    cy = nonblank(last_cy_lcn)
    fd = nonblank(final_destination)

    def bit(label: str, d: Column) -> Column:
        return _opt(d.isNotNull(), label + " ", fmt_display(d))

    # Leg 1: POR -> Load Port
    leg1_dates = F.concat_ws(", ", bit("ETD", etd_lp), bit("ATD", atd_lp))
    leg1 = _opt(
        leg1_dates != "",
        "Leg 1 (POR → Load Port): ",
        F.coalesce(por, F.lit("POR")),
        " → ",
        F.coalesce(lp, F.lit("LOAD")),
        " | ",
        leg1_dates,
    )

    # Leg 2: Load -> TS (only when a distinct transshipment port exists)
    leg2_dates = F.concat_ws(", ", bit("ATA", ata_flp), bit("ATD", atd_flp))
    leg2 = _opt(
        flp.isNotNull() & (flp != F.coalesce(lp, F.lit(""))) & (leg2_dates != ""),
        "Leg 2 (Load → TS): ",
        F.coalesce(lp, F.lit("LOAD")),
        " → ",
        flp,
        " | ",
        leg2_dates,
    )

    # Leg 3: ocean to DP
    leg3 = _opt(
        optimal_ata_dp.isNotNull(),
        "Leg 3 (Ocean to DP): ",
        F.coalesce(flp, lp, F.lit("LOAD")),
        " → ",
        F.coalesce(dp, F.lit("DP")),
        " | ATA_DP ",
        fmt_display(optimal_ata_dp),
    )

    # Leg 4: DP -> last CY
    leg4_dates = F.concat_ws(
        ", ", bit("OUT_GATE_DP", out_gate_from_dp), bit("ARR_LAST_CY", arrived_last_cy)
    )
    leg4 = _opt(
        cy.isNotNull() & (leg4_dates != ""),
        "Leg 4 (DP → Last CY): ",
        F.coalesce(dp, F.lit("DP")),
        " → ",
        cy,
        " | ",
        leg4_dates,
    )

    # Leg 5: last CY -> final destination
    leg5_dates = F.concat_ws(
        ", ", bit("DELIVERY", delivery), bit("EMPTY_RET", empty_return)
    )
    leg5 = _opt(
        leg5_dates != "",
        "Leg 5 (Last CY → Final): ",
        F.coalesce(cy, dp, F.lit("DP")),
        " → ",
        F.coalesce(fd, F.lit("FINAL")),
        " | ",
        leg5_dates,
    )

    return F.concat_ws(" || ", leg1, leg2, leg3, leg4, leg5)


# ---------------------------------------------------------------------------
# T5 — delay reason summary (`src/transformer.py:709-759`)
# ---------------------------------------------------------------------------
def delay_reason_summary(
    *,
    delayed_dp: Column,
    dp_delayed_dur: Column,
    delayed_fd: Column,
    fd_delayed_dur: Column,
    last_cy_lcn: Column,
    final_destination: Column,
) -> Column:
    cy = nonblank(last_cy_lcn)
    fd = nonblank(final_destination)
    dp_is_delay = (F.lower(F.coalesce(delayed_dp, F.lit(""))) == "delay") & (
        dp_delayed_dur > 0
    )
    fd_is_delay = (F.lower(F.coalesce(delayed_fd, F.lit(""))) == "delay") & (
        fd_delayed_dur > 0
    )

    r1 = F.when(
        dp_is_delay,
        F.format_string(
            "Ocean / discharge-port leg is delayed versus ETA at DP by ~%d day(s).",
            dp_delayed_dur.cast("int"),
        ),
    )
    r2 = F.when(
        fd_is_delay,
        F.format_string(
            "Final delivery leg is delayed versus ETA at final destination by ~%d day(s).",
            fd_delayed_dur.cast("int"),
        ),
    )
    fd_label_is_delay = F.lower(F.coalesce(delayed_fd, F.lit(""))) == "delay"
    r3 = F.when(
        fd_label_is_delay & cy.isNotNull() & fd.isNotNull() & (cy != fd),
        F.format_string(
            "Last-mile from last CY %s to final destination %s appears delayed.",
            cy,
            fd,
        ),
    )
    joined = F.concat_ws("; ", r1, r2, r3)
    return F.when(joined == "",
        F.lit("Shipment is on time against configured DP / final destination ETAs.")
    ).otherwise(joined)

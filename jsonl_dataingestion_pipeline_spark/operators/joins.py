"""Custom join operators Spark lacks natively: as-of join, range join.

Both are compositions of built-in operators (SURVEY/brief guidance:
composition first, UDF never needed here):

- :func:`asof_join` — "latest right row at or before each left row's
  timestamp, per key". Implemented with the union + running-last trick:
  ONE hash shuffle on the key, no per-row Python, no broadcast
  requirement, skew handled by AQE. Matches DuckDB/kdb ASOF semantics
  (inclusive on ties; unmatched left rows null-extended).
- :func:`range_join` — value-vs-interval join against a (small) bands
  table; expressed as a broadcast non-equi join so the big side is never
  shuffled.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    matched_ts_col: str = "matched_ts",
    tolerance_seconds: Optional[int] = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.on <= left.on`` (within the same ``by`` key) — or, with
    ``direction="forward"``, the earliest right row with
    ``right.on >= left.on``; ``direction="nearest"`` takes whichever of
    the two is closer in time (ties -> the backward match), exactly the
    pandas ``merge_asof`` direction contract.

    Plan shape: union both sides tagged, one window sorted by
    (ts, side-tag, payload) per key, running ``last(payload,
    ignorenulls)``; keep left rows. The payload travels as ONE struct so
    a legitimately-null right column can't leak an older row's value.
    The payload itself is the third sort key: when several right rows
    share the same (key, ts), the backward scan takes the struct-wise
    LARGEST and the forward scan the struct-wise SMALLEST — fixed
    choices, deterministic across runs and partitionings (plain
    ``last`` over a (ts, side)-only ordering would pick whichever
    equal-ts row the sort happened to place last), and each matches
    the keyless path's partition-stitch aggregate (max-carry backward,
    min-carry forward) so output never depends on partition layout.

    Keyless form (``by=[]`` / ``by=None``): a window over zero partition
    columns would collapse to ONE partition (a global sort on a single
    executor — the thing that cannot work at 100 TB), so the keyless
    path instead range-partitions the union on the timestamp, runs the
    same running-last per range partition, and stitches partitions with
    a broadcast prefix-carry (each partition inherits the latest payload
    from all earlier ranges; ties can't split because range partitioning
    maps equal timestamps to one partition). Cost: one range shuffle +
    one tiny carry frame — fully parallel.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    by = list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    payload = F.struct(
        F.col(on).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = l.unionByName(r)

    order = [
        F.col("__ts").asc(),
        F.col("__side").asc(),
        F.col("__payload").asc(),
    ]
    # forward scan: ascending ts, but equal-ts right rows must sort
    # AFTER the left row (side desc) so `first` over
    # (currentRow .. following) includes them. __payload ASC so the
    # first-non-null among equal-ts right rows is the struct-MIN — the
    # same row the keyless path's F.min(__payload) partition carry
    # picks (payload DESC here would make the matched row depend on
    # where the range-partition boundary falls).
    order_f = [
        F.col("__ts").asc(),
        F.col("__side").desc(),
        F.col("__payload").asc(),
    ]

    def _pick(df: DataFrame) -> DataFrame:
        """Resolve __match from __match_b/__match_f per direction."""
        if direction == "backward":
            return df.withColumn("__match", F.col("__match_b"))
        if direction == "forward":
            return df.withColumn("__match", F.col("__match_f"))
        # type-independent distances: timestamp - timestamp yields a
        # comparable day-time interval, numeric - numeric a number
        lts = F.col("__ts")
        db = lts - F.col("__match_b").getField("__rts")
        df_ = F.col("__match_f").getField("__rts") - lts
        return df.withColumn(
            "__match",
            F.when(F.col("__match_f").isNull(), F.col("__match_b"))
            .when(F.col("__match_b").isNull(), F.col("__match_f"))
            .when(df_ < db, F.col("__match_f"))
            .otherwise(F.col("__match_b")),
        )

    if by:
        pby = [F.col(c) for c in by]
        wb = (
            Window.partitionBy(*pby)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*pby)
            .orderBy(*order_f)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = u
        filled = filled.withColumn(
            "__match_b",
            F.last("__payload", ignorenulls=True).over(wb)
            if direction != "forward"
            else F.lit(None).cast(u.schema["__payload"].dataType),
        )
        filled = filled.withColumn(
            "__match_f",
            F.first("__payload", ignorenulls=True).over(wf)
            if direction != "backward"
            else F.lit(None).cast(u.schema["__payload"].dataType),
        )
        filled = _pick(filled).filter(F.col("__side") == 1)
    else:
        # Keyless: parallel global running-last (see docstring).
        spark = u.sparkSession
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        ranged = u.repartitionByRange(nparts, F.col("__ts")).withColumn(
            "__pid", F.spark_partition_id()
        )
        wp = (
            Window.partitionBy("__pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wpf = (
            Window.partitionBy("__pid")
            .orderBy(*order_f)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        ptype = u.schema["__payload"].dataType
        local = ranged.withColumn(
            "__match_b",
            F.last("__payload", ignorenulls=True).over(wp)
            if direction != "forward"
            else F.lit(None).cast(ptype),
        ).withColumn(
            "__match_f",
            F.first("__payload", ignorenulls=True).over(wpf)
            if direction != "backward"
            else F.lit(None).cast(ptype),
        )
        # Partition stitch, both directions over ONE tiny per-partition
        # frame: latest payload (struct-wise max, leading field __rts)
        # carried FORWARD from earlier ranges for the backward match;
        # earliest payload (min) carried BACKWARD from later ranges for
        # the forward match. Range partitioning keeps equal timestamps
        # in one partition, so ties can't split.
        pagg = ranged.groupBy("__pid").agg(
            F.max("__payload").alias("__pmax"),
            F.min("__payload").alias("__pmin"),
        )
        wcarry_b = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        wcarry_f = Window.orderBy("__pid").rowsBetween(
            1, Window.unboundedFollowing
        )
        carry = pagg.select(
            "__pid",
            F.last("__pmax", ignorenulls=True).over(wcarry_b).alias(
                "__carry_b"
            ),
            F.first("__pmin", ignorenulls=True).over(wcarry_f).alias(
                "__carry_f"
            ),
        )
        filled = (
            local.join(F.broadcast(carry), on="__pid", how="left")
            .withColumn(
                "__match_b", F.coalesce("__match_b", "__carry_b")
                if direction != "forward" else F.col("__match_b"),
            )
            .withColumn(
                "__match_f", F.coalesce("__match_f", "__carry_f")
                if direction != "backward" else F.col("__match_f"),
            )
        )
        filled = _pick(filled).filter(F.col("__side") == 1)

    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    match = F.col("__match")
    if tolerance_seconds is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        rts = match.getField("__rts")
        if isinstance(
            left.schema[on].dataType, (TimestampType, TimestampNTZType)
        ):
            tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
            in_tol = (F.col("__ts") - rts <= tol) & (
                rts - F.col("__ts") <= tol
            )
        else:
            in_tol = F.abs(F.col("__ts") - rts) <= F.lit(tolerance_seconds)
        match = F.when(match.isNotNull() & in_tol, match)
    out = filled.select(
        *out_cols,
        match.getField("__rts").alias(matched_ts_col),
        *[match.getField(c).alias(c) for c in right_cols],
    )
    return out


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    *,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "left",
    inclusive: str = "[)",
) -> DataFrame:
    """Join each fact row to the band whose [lo, hi) interval contains
    ``value``. Bands are broadcast (they are small by construction), so
    the fact side streams through with no shuffle.
    """
    v = F.col(f"__f.{value}")
    lo_c, hi_c = F.col(f"__b.{lo}"), F.col(f"__b.{hi}")
    left_cmp = v >= lo_c if inclusive[0] == "[" else v > lo_c
    right_cmp = v <= hi_c if inclusive[1] == "]" else v < hi_c
    return (
        facts.alias("__f")
        .join(F.broadcast(bands.alias("__b")), left_cmp & right_cmp, how)
        .select("__f.*", *[F.col(f"__b.{c}") for c in bands.columns])
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    suffixes: tuple = ("_l", "_r"),
) -> DataFrame:
    """Overlap join between two LARGE interval sets: every (left, right)
    pair whose [start, end] intervals intersect (closed-closed). The
    session/availability/validity-window join that a naive theta-join
    turns into a near-cartesian nested loop.

    Scale shape (the standard distributed interval join): each interval
    explodes into the fixed-width bins it touches
    (``floor(start/w) .. floor(end/w)``), the two sides equi-join on
    the bin id (shuffle on a narrow integer key — never a nested-loop),
    and the exact overlap predicate filters. Pairs meeting in several
    shared bins are emitted ONCE via the canonical-bin trick — keep
    only the row whose bin contains the overlap START — rather than a
    dropDuplicates: no dedup shuffle, and (crucially) genuine duplicate
    input rows keep their multiplicity, exactly like the theta join the
    q166 oracle runs. ``bin_width`` trades replication (long intervals
    touch many bins) against bucket size (short bins collect fewer
    candidates); set it near the typical interval length. Start/end
    columns must be numeric (cast dates to epoch days first).

    Returns all left columns + all right columns (name collisions get
    ``suffixes``), plus ``ov_start``/``ov_end`` — the intersection
    bounds.
    """
    if bin_width <= 0:
        raise ValueError("interval_overlap_join: bin_width must be > 0")
    common = set(left.columns) & set(right.columns)
    lft, rgt = left, right
    ls, le, rs, re_ = l_start, l_end, r_start, r_end
    for c in common:
        lft = lft.withColumnRenamed(c, c + suffixes[0])
        rgt = rgt.withColumnRenamed(c, c + suffixes[1])
        ls = c + suffixes[0] if ls == c else ls
        le = c + suffixes[0] if le == c else le
        rs = c + suffixes[1] if rs == c else rs
        re_ = c + suffixes[1] if re_ == c else re_
    w = F.lit(int(bin_width))

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
            ),
        )

    out_cols = [*lft.columns, *rgt.columns]
    ov_start = F.greatest(F.col(ls), F.col(rs))
    return (
        binned(lft, ls, le)
        .join(binned(rgt, rs, re_), on="__bin")
        .filter((F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le)))
        # canonical bin: of all shared bins a pair meets in, keep only
        # the one containing the overlap start — exactly-once without a
        # dedup shuffle, multiplicity-preserving for duplicate inputs
        .filter(F.floor(ov_start / w) == F.col("__bin"))
        .select(
            *out_cols,
            ov_start.alias("ov_start"),
            F.least(F.col(le), F.col(re_)).alias("ov_end"),
        )
    )

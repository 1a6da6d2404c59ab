"""Token-budget mixture planning — the "how many epochs of each
source" step of assembling an LLM pre-training mix.

``functions/sampling.py::mix_sources`` solves the DOWNSAMPLE-only
version (largest feasible mixture with no upsampling). This module
solves the complementary planning problem every real data recipe hits:
a fixed token BUDGET must be filled against target source weights, and
under-sized sources are allowed to REPEAT (multiple epochs) up to a
repetition cap — the standard practice popularized by corpus-scaling
studies (repeating good data a few epochs is fine; repeating it twenty
times is not).

Semantics (single redistribution round, the standard practical
approximation — documented, deterministic, oracle-replayable):

1. ``avail_s``   = Σ tokens per source (one aggregate).
2. ``want_s``    = floor(budget * w_s)          (target share).
3. ``cap_s``     = floor(avail_s * max_epochs)  (repetition ceiling).
4. ``first_s``   = min(want_s, cap_s).
5. ``leftover``  = budget - Σ first_s — the share capped sources could
   not absorb (plus floor crumbs) is redistributed ONCE to sources
   with headroom, proportional to their weights, clamped to headroom.
6. ``realized_s`` = first_s + extra_s; ``epochs`` = realized / avail.

EVERYTHING is 64-bit integer arithmetic — weights are micro-units
(must sum to exactly 1,000,000), the epoch cap is milli-units, and all
divisions are integer floor divisions — so the plan is bit-identical
across engines and shuffle layouts (the q151/q133 determinism
contract, applied to planning math). Bounds: ``budget_tokens`` and
each ``avail_s`` must stay <= 9 * 10^12 (9 T tokens) so the widest
product (x * 10^6) fits in int64; raise past that and plan in
million-token units instead.

Plan shape: ONE aggregate over the corpus (map-side partial sums of
the token column), then all remaining math on the #sources-row frame —
window sums over single-digit rows, broadcast nothing, shuffle nothing
corpus-sized. At 100 TB the cost is the one scan.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: int64-safety ceiling for token counts (see module note).
MAX_PLAN_TOKENS = 9_000_000_000_000


def micro_weights(targets: Mapping[str, float]) -> dict[str, int]:
    """Convert float target fractions to micro-unit integers summing to
    EXACTLY 1,000,000 (the rounding remainder lands on the largest
    weight — deterministic)."""
    if not targets:
        raise ValueError("plan_token_budget: empty targets")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target fractions must sum to 1, got {total}")
    w = {k: int(round(v * 1_000_000)) for k, v in targets.items()}
    drift = 1_000_000 - sum(w.values())
    biggest = max(w, key=lambda k: (w[k], k))
    w[biggest] += drift
    if any(v < 0 for v in w.values()):
        raise ValueError("plan_token_budget: negative weight after rounding")
    return w


def plan_token_budget(
    df: DataFrame,
    source_col: str,
    token_col,
    targets: Mapping[str, float],
    *,
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Plan per-source token allocations for a fixed training budget.

    ``token_col`` is a column name or Column of per-row token counts.
    Returns one row per source present in BOTH the data and
    ``targets``: (mix_source, mix_avail, mix_want, mix_realized,
    mix_epochs_u) with epochs in micro-units (1,000,000 = one epoch).
    Σ mix_realized <= budget; the gap (if any) means every source hit
    its repetition cap — callers decide whether to raise the cap or
    shrink the budget.
    """
    if not (0 < budget_tokens <= MAX_PLAN_TOKENS):
        raise ValueError(
            f"budget_tokens must be in (0, {MAX_PLAN_TOKENS}] for exact "
            "int64 planning; plan in larger units past that"
        )
    me_milli = int(round(max_epochs * 1000))
    if not (0 < me_milli <= 8000):
        raise ValueError("max_epochs must be in (0, 8] (milli-exact)")
    w_u = micro_weights(targets)

    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    avail = (
        df.select(F.col(source_col).alias("mix_source"), tok.alias("__t"))
        .groupBy("mix_source")
        .agg(F.sum(F.col("__t").cast("long")).alias("mix_avail"))
    )
    # Enforce the documented avail_s <= MAX_PLAN_TOKENS bound IN-PLAN
    # (ADVICE r7): past it, `mix_avail * me_milli` silently wraps int64
    # and the plan corrupts without error. The guard is a per-row
    # expression over #sources rows — raise_error fires during the one
    # aggregate's collect, never a second job.
    avail = avail.withColumn(
        "mix_avail",
        F.when(
            F.col("mix_avail") > F.lit(MAX_PLAN_TOKENS),
            F.raise_error(
                F.concat(
                    F.lit("plan_token_budget: source "),
                    F.col("mix_source"),
                    F.lit(
                        f" holds more than {MAX_PLAN_TOKENS} tokens;"
                        " mix_avail * max_epochs would overflow int64"
                        " — plan in larger units (e.g. ktokens)"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("mix_avail")),
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in w_u.items() for x in (kv[0], kv[1])]
    )
    planned = (
        avail.withColumn("__w", wmap[F.col("mix_source")].cast("long"))
        .filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
        .withColumn(
            "mix_want",
            F.expr(f"CAST({budget_tokens} AS BIGINT) * __w DIV 1000000"),
        )
        .withColumn(
            "__cap",
            F.expr(f"mix_avail * CAST({me_milli} AS BIGINT) DIV 1000"),
        )
        .withColumn("__first", F.least("mix_want", "__cap"))
        .withColumn("__head", F.col("__cap") - F.col("__first"))
    )
    # the remaining math runs over #sources rows — an unpartitioned
    # window over single-digit rows, never the corpus
    all_rows = Window.partitionBy()
    planned = (
        planned.withColumn(
            "__leftover",
            F.lit(int(budget_tokens))
            - F.sum("__first").over(all_rows),
        )
        .withColumn(
            "__wopen",
            F.sum(
                F.when(F.col("__head") > 0, F.col("__w")).otherwise(
                    F.lit(0)
                )
            ).over(all_rows),
        )
        .withColumn(
            "__extra",
            F.when(
                (F.col("__head") > 0) & (F.col("__wopen") > 0),
                F.least(
                    F.expr("__leftover * __w DIV __wopen"),
                    F.col("__head"),
                ),
            ).otherwise(F.lit(0)),
        )
        .withColumn("mix_realized", F.col("__first") + F.col("__extra"))
        .withColumn(
            "mix_epochs_u",
            F.expr("mix_realized * CAST(1000000 AS BIGINT) DIV mix_avail"),
        )
    )
    return planned.select(
        "mix_source", "mix_avail", "mix_want", "mix_realized",
        "mix_epochs_u",
    )


def curriculum_stages(
    df: DataFrame,
    score_u_col: str,
    boundaries: tuple[int, ...],
    token_col: str,
    *,
    stage_col: str = "stage",
) -> DataFrame:
    """Curriculum schedule: bucket documents into ordered training
    stages by integer-grid quality score and emit the per-stage pacing
    census a curriculum trainer consumes.

    ``boundaries`` are ascending integer micro-unit cut points;
    ``stage = 1 + #{b : score_u >= b}`` — stage 1 is the easiest/lowest
    band, later stages are higher-quality data scheduled later in
    training (the standard easy-to-hard curriculum, or its inverse —
    the stage ORDER is the trainer's choice, the census is the same).

    Returned per stage: ``n_docs``, ``stage_tokens``, the score band
    actually observed (``min_score_u`` / ``max_score_u``) and
    ``cum_tokens`` — the running token total in stage order, i.e. the
    pacing schedule ("switch stages at token X").

    NULL scores land in stage 1 (SQL CASE semantics: ``NULL >= b`` is
    never true) — filter upstream if NULL must be excluded.

    Determinism/scale: stage assignment is pure integer comparison
    (codegen projection, no shuffle); the census is ONE hash aggregate
    on a key with ≤ ``len(boundaries)+1`` values; the running total is
    a window over that post-aggregate frame — bounded by the stage
    alphabet, never by the corpus, so the sort the window implies is
    over a handful of rows.
    """
    if list(boundaries) != sorted(set(int(b) for b in boundaries)):
        raise ValueError(
            "curriculum boundaries must be strictly ascending ints: "
            f"{boundaries!r}"
        )
    from pyspark.sql.window import Window

    s = F.col(score_u_col)
    stage = F.lit(1)
    for b in boundaries:
        stage = stage + F.when(s >= F.lit(int(b)), 1).otherwise(0)
    per = df.select(
        stage.cast("int").alias(stage_col),
        F.col(token_col).cast("long").alias("__t"),
        s.alias("__s"),
    )
    agg = per.groupBy(stage_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("stage_tokens"),
        F.min("__s").cast("long").alias("min_score_u"),
        F.max("__s").cast("long").alias("max_score_u"),
    )
    w = (
        Window.orderBy(F.col(stage_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return agg.withColumn(
        "cum_tokens", F.sum("stage_tokens").over(w).cast("long")
    )

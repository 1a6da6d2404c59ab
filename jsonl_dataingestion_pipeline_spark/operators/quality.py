"""Declarative data-quality constraint audit (the Deequ / dbt-test
shape): a rule list compiles into the fewest possible passes over the
table and returns one violation-count row per rule — the contract gate
a pipeline runs before promoting a snapshot.

Rule kinds and their plan shapes:

- ``not_null`` / ``in_range`` / ``matches`` / ``in_set`` — row-local
  predicates; ALL of them fuse into ONE conditional-sum aggregate over
  a single scan, regardless of how many such rules the audit carries.
- ``unique`` — one groupBy on the key with a >1 filter (map-side
  partials; the shuffle carries distinct keys only).
- ``foreign_key`` — one left-anti join against the (deduplicated)
  reference keys; AQE broadcasts the reference side when it fits.

Everything is exact integer counting — deterministic in any engine, so
the whole audit replays in the DuckDB oracle (q172).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(column: str) -> dict:
    return {"kind": "not_null", "column": column}


def in_range(column: str, lo: float, hi: float) -> dict:
    """Violated when the value is NULL or outside [lo, hi]."""
    return {"kind": "in_range", "column": column, "lo": lo, "hi": hi}


def matches(column: str, pattern: str) -> dict:
    """Violated when the value is NULL or does not match ``pattern``."""
    return {"kind": "matches", "column": column, "pattern": pattern}


def in_set(column: str, values: Sequence) -> dict:
    """Violated when the value is NULL or outside ``values``."""
    return {"kind": "in_set", "column": column, "values": list(values)}


def unique(columns: Sequence[str]) -> dict:
    """Violations = rows participating in a duplicated key."""
    return {"kind": "unique", "columns": list(columns)}


def foreign_key(
    columns: Sequence[str],
    reference: DataFrame,
    ref_columns: Sequence[str],
) -> dict:
    """Violations = rows (with non-null keys) absent from reference."""
    return {
        "kind": "foreign_key",
        "columns": list(columns),
        "reference": reference,
        "ref_columns": list(ref_columns),
    }


def _rowlocal_violation(rule: dict):
    c = F.col(rule["column"])
    if rule["kind"] == "not_null":
        return c.isNull()
    if rule["kind"] == "in_range":
        return (
            c.isNull()
            | (c < F.lit(rule["lo"]))
            | (c > F.lit(rule["hi"]))
        )
    if rule["kind"] == "matches":
        return c.isNull() | ~c.cast("string").rlike(rule["pattern"])
    if rule["kind"] == "in_set":
        return c.isNull() | ~c.isin(rule["values"])
    raise ValueError(f"not a row-local rule: {rule['kind']}")


def _describe(rule: dict) -> tuple:
    k = rule["kind"]
    if k == "not_null":
        return k, rule["column"]
    if k == "in_range":
        return f"in_range[{rule['lo']},{rule['hi']}]", rule["column"]
    if k == "matches":
        return f"matches[{rule['pattern']}]", rule["column"]
    if k == "in_set":
        return f"in_set[{','.join(map(str, rule['values']))}]", rule[
            "column"
        ]
    if k == "unique":
        return k, ",".join(rule["columns"])
    if k == "foreign_key":
        return k, ",".join(rule["columns"])
    raise ValueError(k)


def check_constraints(
    df: DataFrame, rules: Sequence[dict]
) -> DataFrame:
    """Audit ``df`` against ``rules``.

    Returns one row per rule, in rule order:
    (rule_id INT, rule STRING, columns STRING, n_violations LONG,
    passed BOOLEAN).
    """
    if not rules:
        raise ValueError("check_constraints: empty rule list")
    rowlocal = [
        (i, r)
        for i, r in enumerate(rules)
        if r["kind"] in ("not_null", "in_range", "matches", "in_set")
    ]
    pieces: list[tuple[int, DataFrame]] = []
    if rowlocal:
        aggs = [
            F.sum(
                F.when(_rowlocal_violation(r), 1).otherwise(0)
            ).cast("long").alias(f"__v{i}")
            for i, r in rowlocal
        ]
        counts = df.agg(*aggs)
        for i, r in rowlocal:
            name, cols = _describe(r)
            pieces.append(
                (
                    i,
                    counts.select(
                        F.lit(i).cast("int").alias("rule_id"),
                        F.lit(name).alias("rule"),
                        F.lit(cols).alias("columns"),
                        F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias(
                            "n_violations"
                        ),
                    ),
                )
            )
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            name, cols = _describe(r)
            dup = (
                df.groupBy(*r["columns"])
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(
                    F.coalesce(F.sum("__n"), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
            pieces.append(
                (
                    i,
                    dup.select(
                        F.lit(i).cast("int").alias("rule_id"),
                        F.lit(name).alias("rule"),
                        F.lit(cols).alias("columns"),
                        "n_violations",
                    ),
                )
            )
        elif r["kind"] == "foreign_key":
            name, cols = _describe(r)
            ref = (
                r["reference"]
                .select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(
                            r["columns"], r["ref_columns"]
                        )
                    ]
                )
                .dropDuplicates(r["columns"])
            )
            probe = df.select(*r["columns"]).na.drop(
                subset=r["columns"]
            )
            miss = probe.join(
                ref, on=r["columns"], how="left_anti"
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_violations")
            )
            pieces.append(
                (
                    i,
                    miss.select(
                        F.lit(i).cast("int").alias("rule_id"),
                        F.lit(name).alias("rule"),
                        F.lit(cols).alias("columns"),
                        "n_violations",
                    ),
                )
            )
    pieces.sort(key=lambda t: t[0])
    out: Optional[DataFrame] = None
    for _, p in pieces:
        out = p if out is None else out.unionAll(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    *,
    scale: int = 6,
) -> DataFrame:
    """Cohen's kappa between two categorical label columns — the
    inter-annotator agreement statistic a labeled-training-data QA
    pass runs per (task, annotator-pair).

    kappa = (p_o - p_e)/(1 - p_e) reduces to the pure-INTEGER ratio
    (agree*n - S) / (n*n - S) with S = sum over categories of
    n_a(c) * n_b(c) — so the only float op is the ONE final division,
    rounded to micro-units (the determinism contract: no float sums,
    no engine-specific math). NULL labels count as their own category
    (two raters can agree on "unlabelable").

    Plan: one two-column scan feeding (a) the n/agree aggregate and
    (b) per-category marginal counts for each rater, joined FULL on
    the category (bounded by the label alphabet, broadcast-small).
    Returns one row: (ka_n, ka_agree, ka_chance_u, ka_kappa_u) —
    chance agreement p_e and kappa in micro-units; kappa_u is NULL for
    the degenerate p_e = 1 case (a single shared category — kappa
    undefined, surfaced as NULL rather than a crash or a fake 0).
    """
    pair = df.select(
        F.col(rater_a).cast("string").alias("__a"),
        F.col(rater_b).cast("string").alias("__b"),
    )
    base = pair.agg(
        F.count(F.lit(1)).cast("long").alias("ka_n"),
        F.sum(
            F.when(
                F.col("__a").eqNullSafe(F.col("__b")), F.lit(1)
            ).otherwise(F.lit(0))
        ).cast("long").alias("ka_agree"),
    )
    na = pair.groupBy("__a").agg(F.count(F.lit(1)).alias("__na"))
    nb = pair.groupBy("__b").agg(F.count(F.lit(1)).alias("__nb"))
    s = (
        na.join(
            nb, on=na["__a"].eqNullSafe(nb["__b"]), how="inner"
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__na").cast("decimal(18,0)") * F.col("__nb")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__s")
        )
    )
    u = 10**scale
    joined = base.crossJoin(F.broadcast(s))
    pe_u = F.round(
        F.col("__s").cast("double")
        / (F.col("ka_n").cast("double") * F.col("ka_n").cast("double"))
        * F.lit(float(u))
    ).cast("long")
    denom = (
        F.col("ka_n").cast("decimal(38,0)") * F.col("ka_n") - F.col("__s")
    )
    numer = (
        F.col("ka_agree").cast("decimal(38,0)") * F.col("ka_n")
        - F.col("__s")
    )
    kappa_u = F.when(
        denom == 0, F.lit(None).cast("long")
    ).otherwise(
        F.round(
            numer.cast("double") / denom.cast("double") * F.lit(float(u))
        ).cast("long")
    )
    return joined.select(
        "ka_n",
        "ka_agree",
        pe_u.alias("ka_chance_u"),
        kappa_u.alias("ka_kappa_u"),
    )

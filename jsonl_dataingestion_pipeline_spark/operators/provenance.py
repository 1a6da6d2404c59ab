"""Per-document provenance ledger: a tamper-evident hash chain of the
transforms a document passed through — the data-governance layer
production corpus pipelines attach so a 100 TB training set can be
audited without trusting the pipeline that produced it (Dolma ships
per-doc source+version metadata; C4/ROOTS releases document their
filter chains; this operator makes the chain VERIFIABLE per row).

Design: every step appends ``(stage, params_md5)`` to a step array
and rolls ``prov_hash = md5(prev_hash:stage:params_md5)``. Verification
refolds the chain from the step array and the row id — a mismatch
pinpoints tampering (either edited steps or a hash spliced from
another document). Everything is a zero-shuffle Column projection;
``params_md5`` hashes the CALL-SITE constant parameters, computed once
in Python, so the per-row cost is one md5 per step.
"""

from __future__ import annotations

import hashlib
import json
from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STEP_TYPE = "array<struct<stage: string, params_md5: string>>"


def params_digest(params: Optional[Mapping]) -> str:
    """Canonical md5 of a step's parameters: sorted-key compact JSON.
    Computed driver-side once per step call — parameters are call-site
    constants, never row data."""
    blob = json.dumps(
        dict(params or {}), sort_keys=True, separators=(",", ":")
    )
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


def _seed(id_col: str) -> Column:
    return F.md5(F.concat(F.lit("prov:"), F.col(id_col).cast("string")))


def provenance_init(
    df: DataFrame, id_col: str, source: str
) -> DataFrame:
    """Start a ledger: one ``init:<source>`` step whose params digest
    is the source name's md5, chain seeded from the row id (so a hash
    copied from another row NEVER verifies)."""
    pmd5 = hashlib.md5(source.encode("utf-8")).hexdigest()
    stage = f"init:{source}"
    step = F.struct(
        F.lit(stage).alias("stage"), F.lit(pmd5).alias("params_md5")
    )
    h = F.md5(
        F.concat_ws(":", _seed(id_col), F.lit(stage), F.lit(pmd5))
    )
    return df.withColumn("prov_steps", F.array(step)).withColumn(
        "prov_hash", h
    )


def provenance_step(
    df: DataFrame, stage: str, params: Optional[Mapping] = None
) -> DataFrame:
    """Record one transform: append the step and roll the chain hash.
    Call AFTER applying the transform it describes."""
    pmd5 = params_digest(params)
    step = F.struct(
        F.lit(stage).alias("stage"), F.lit(pmd5).alias("params_md5")
    )
    h = F.md5(
        F.concat_ws(
            ":", F.col("prov_hash"), F.lit(stage), F.lit(pmd5)
        )
    )
    return df.withColumn(
        "prov_steps", F.concat(F.col("prov_steps"), F.array(step))
    ).withColumn("prov_hash", h)


def provenance_verify(df: DataFrame, id_col: str) -> DataFrame:
    """Append ``prov_ok``: refold the chain from ``prov_steps`` and the
    row id and compare to ``prov_hash``. One ``aggregate`` fold — a
    zero-shuffle audit that runs at scan speed over any corpus."""
    refold = F.aggregate(
        F.col("prov_steps"),
        _seed(id_col),
        lambda acc, s: F.md5(
            F.concat_ws(":", acc, s["stage"], s["params_md5"])
        ),
    )
    return df.withColumn("prov_ok", refold == F.col("prov_hash"))

"""Blocked fuzzy matching (entity resolution) operators.

Approximate string matching at corpus scale is all-pairs O(n²) unless
you block first.  These operators implement the standard blocking
pattern: derive a cheap deterministic block key from the string itself,
join only within blocks, then score candidates with edit distance and
keep the best match per probe row.

Scale design mirrors the LSH family in ``operators/dedup.py``:
- the block key is a pure Column expression (substring here; soundex or
  q-gram minhash are drop-in alternatives),
- the join shuffles on the block key only — candidate volume is
  sum(block_size²), bounded by the blocking choice, never n²,
- ``levenshtein`` runs JVM-side inside codegen on candidates only,
- best-match selection is a window ``row_number`` per probe (no
  collect, no driver loop).

The same computation replays in the DuckDB oracle (``levenshtein`` has
identical semantics in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def block_key(name: Column | str, start: int = 1, length: int = 3) -> Column:
    """Deterministic block key: a character slice of the (trimmed,
    uppercased) name. Cheap, null-safe, and replayable in SQL."""
    c = F.col(name) if isinstance(name, str) else name
    return F.substring(F.upper(F.trim(c.cast("string"))), start, length)


def blocked_match(
    probe: DataFrame,
    reference: DataFrame,
    probe_id: str,
    probe_name: str,
    ref_id: str,
    ref_name: str,
    *,
    max_distance: int = 2,
    key_start: int = 1,
    key_length: int = 3,
) -> DataFrame:
    """Best reference match per probe row under Levenshtein distance,
    restricted to candidates sharing a block key.

    Returns ``probe_id, probe_name, ref_id, ref_name, distance`` for
    probes with at least one candidate within ``max_distance``.
    Deterministic tiebreak: lowest distance, then lowest ``ref_id``.
    """
    p = probe.select(
        F.col(probe_id).alias("__pid"),
        F.col(probe_name).alias("__pname"),
        block_key(probe_name, key_start, key_length).alias("__bk"),
    )
    r = reference.select(
        F.col(ref_id).alias("__rid"),
        F.col(ref_name).alias("__rname"),
        block_key(ref_name, key_start, key_length).alias("__bk"),
    )
    cand = p.join(r, "__bk").withColumn(
        "__dist", F.levenshtein(F.col("__pname"), F.col("__rname"))
    )
    close = cand.filter(F.col("__dist") <= max_distance)
    w = Window.partitionBy("__pid").orderBy(
        F.col("__dist").asc(), F.col("__rid").asc()
    )
    best = close.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return best.select(
        F.col("__pid").alias(probe_id),
        F.col("__pname").alias(probe_name),
        F.col("__rid").alias(ref_id),
        F.col("__rname").alias(ref_name),
        F.col("__dist").cast("int").alias("distance"),
    )

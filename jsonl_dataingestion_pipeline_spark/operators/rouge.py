"""ROUGE-L instruction deduplication (Wang et al. 2022,
"Self-Instruct", §3 — a new instruction joins the pool only when its
ROUGE-L F1 against EVERY existing instruction stays below 0.7; the
same filter curates Alpaca / Evol-Instruct style SFT sets).

ROUGE-L is the token-level longest-common-subsequence score — ORDER
SENSITIVE, which is exactly why the published filter uses it instead
of bag-of-words overlap: two instructions sharing vocabulary but not
phrasing score low. LCS needs a quadratic DP no SQL engine expresses,
so the kernel is the repo's documented Python path: an Arrow-batched
``mapInPandas`` over candidate PAIRS produced relationally.

Pipeline shape (100 TB design):

1. **Tokenize + block**: both sides lower-split on whitespace; the
   pool side builds an inverted index over its tokens, optionally
   restricted to tokens with pool document-frequency <= ``max_df``
   (rare-token blocking — the standard similarity-join trick; a pair
   sharing ONLY blocked-out frequent tokens is missed, the documented
   recall trade. ``max_df=None`` keeps every token = exact recall at
   quadratic-pair cost on stopword-heavy pools).
2. **Candidate pairs**: one equi-join on the token, distinct — pair
   volume is bounded by the inverted-index posting sizes, never
   |cand| x |pool|.
3. **LCS kernel**: the pairs (with both token arrays) stream through
   one ``mapInPandas`` — O(la*lb) ints per pair, Arrow-batched;
   F1 = 2*lcs/(la+lb) in exact integer micro-units.
4. **Verdict**: one keyed ``max_by`` aggregate per candidate (map-side
   combined), left-joined back so pair-less candidates keep with
   score 0.

Scores are exact integers end to end, so the keep decision replays in
a DuckDB oracle whenever the corpus construction pins the LCS (the
q191 planted-corpus pattern).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(c) -> "F.Column":
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != ""
    )


def lcs_len(a: list, b: list) -> int:
    """Token-level LCS length — the classic two-row DP (O(la*lb) time,
    O(min) space). Pure Python over small instruction-sized inputs;
    the Arrow batching amortizes the per-row overhead."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(
                prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
            )
        prev = cur
    return prev[-1]


def rouge_l_dedup(
    cand: DataFrame,
    pool: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    max_df: Optional[int] = None,
    scale: int = 6,
) -> DataFrame:
    """Per-candidate ROUGE-L screening against a pool: ``(id, best_ref,
    lcs, cand_tokens, best_f_u, keep)``.

    - ``best_f_u`` = max over compared refs of
      ``floor(2 * lcs * 10^scale / (la + lb))`` (ROUGE-L F1 in integer
      micro-units; exact — both P and R folded into one division);
      0 when blocking produced no pair.
    - ``best_ref`` = the ref id attaining it (smallest id on ties —
      deterministic); NULL when no pair.
    - ``keep`` = ``best_f_u < floor(threshold * 10^scale)`` — the
      Self-Instruct admission rule.
    - ``max_df``: drop pool tokens with document frequency above this
      from the inverted index (see module note). ``None`` = exact.
    """
    u = 10 ** scale
    thr_u = int(round(threshold * u))
    c = cand.select(
        F.col(id_col).alias("__cid"),
        _tokens(F.col(text_col)).alias("__ct"),
    )
    p = pool.select(
        F.col(id_col).alias("__rid"),
        _tokens(F.col(text_col)).alias("__rt"),
    )
    c_inv = c.select(
        "__cid", F.explode(F.array_distinct("__ct")).alias("__tok")
    )
    p_inv = p.select(
        "__rid", F.explode(F.array_distinct("__rt")).alias("__tok")
    )
    if max_df is not None:
        dfreq = p_inv.groupBy("__tok").agg(
            F.count(F.lit(1)).alias("__df")
        )
        p_inv = p_inv.join(
            dfreq.filter(F.col("__df") <= max_df), "__tok", "leftsemi"
        )
    pairs = (
        c_inv.join(p_inv, "__tok")
        .select("__cid", "__rid")
        .distinct()
        .join(c, "__cid")
        .join(p, "__rid")
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lcs = [
                lcs_len(list(a), list(r))
                for a, r in zip(b["__ct"], b["__rt"])
            ]
            la = b["__ct"].map(len)
            lb = b["__rt"].map(len)
            denom = (la + lb).where(la + lb > 0, 1)
            yield pd.DataFrame(
                {
                    "__cid": b["__cid"],
                    "__rid": b["__rid"],
                    "__lcs": pd.Series(lcs, index=b.index, dtype="int64"),
                    "__f_u": (
                        2 * pd.Series(lcs, index=b.index) * u // denom
                    ).astype("int64"),
                }
            )

    id_dt = cand.schema[id_col].dataType.simpleString()
    scored = pairs.mapInPandas(
        _kernel,
        schema=f"__cid {id_dt}, __rid {id_dt}, __lcs long, __f_u long",
    )
    best = scored.groupBy("__cid").agg(
        F.min_by(
            F.struct(
                F.col("__rid").alias("rid"),
                F.col("__lcs").alias("lcs"),
                F.col("__f_u").alias("f_u"),
            ),
            # best = MIN of (-f_u, rid): max F1, ties -> smallest ref
            # id — negating the (always-numeric) score keeps ref ids
            # free to be strings, the typical instruction-id type
            F.struct((-F.col("__f_u")).alias("nf"), F.col("__rid").alias("r")),
        ).alias("__b")
    )
    return (
        c.join(best, "__cid", "left")
        .select(
            F.col("__cid").alias(id_col),
            F.col("__b.rid").alias("best_ref"),
            F.coalesce(F.col("__b.lcs"), F.lit(0).cast("long")).alias("lcs"),
            F.size("__ct").cast("long").alias("cand_tokens"),
            F.coalesce(F.col("__b.f_u"), F.lit(0).cast("long")).alias(
                "best_f_u"
            ),
            (
                F.coalesce(F.col("__b.f_u"), F.lit(0).cast("long"))
                < F.lit(thr_u)
            ).alias("keep"),
        )
    )

"""Fill-in-the-middle pretraining transform (Bavarian et al. 2022,
"Efficient Training of Language Models to Fill in the Middle").

FIM rewrites a fraction of training documents so the model learns to
infill: the document is cut at two points into (prefix, middle,
suffix) and re-serialized with sentinel tags in either PSM order
(``<PRE> prefix <SUF> suffix <MID> middle``) or the SPM joint variant
(``<PRE><SUF> suffix <MID> prefix middle``). The paper applies the
split at the CHARACTER level before tokenization (§3) — exactly what a
string-column engine can do relationally.

As with ``operators/spancorrupt.py``, the canonical implementation
draws cuts from a stateful RNG; here every decision is a pure md5 hash
of ``(seed, doc id)`` — deterministic across retries, partitionings,
and engines, so the DuckDB oracle replays the whole transform
including the rendered-string checksums. The transform is a single
zero-shuffle codegen projection: at 100 TB it is scan-bound.

Cut distribution: ``a`` uniform on ``[0, n]``, then ``b`` uniform on
``[a, n]`` — the second draw conditions on the first (middle lengths
skew short, matching the paper's observation that uniform joint cuts
over-weight long middles; the exact marginal is documented rather than
hidden).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spancorrupt import _offset_hash

ColumnOrName = Union[Column, str]

PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"
#: chars added by the three sentinel tags when FIM applies
TAG_OVERHEAD = len(PRE) + len(SUF) + len(MID)


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _coin(key: Column, rate: float) -> Column:
    """Deterministic Bernoulli(rate): md5 -> 60-bit int -> micro-unit
    threshold compare (exact for rates on the 1e-6 grid)."""
    return _offset_hash(key, 1_000_000) < int(round(rate * 1_000_000))


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    fim_rate: float = 0.5,
    spm_rate: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """One row per document: ``(id, fim_applied, fim_mode, cut_a,
    cut_b, rendered, render_len)``.

    - ``fim_applied``: md5 coin at ``fim_rate``; untouched documents
      pass through with ``fim_mode='ar'``, cuts at 0, and
      ``rendered = text`` (the autoregressive share of the mix);
    - ``cut_a``/``cut_b``: character offsets, ``0 <= a <= b <= n``;
      ``prefix = text[:a]``, ``middle = text[a:b]``,
      ``suffix = text[b:]``;
    - ``fim_mode``: ``'psm'`` or ``'spm'`` by a second coin at
      ``spm_rate``;
    - ``rendered``: the training string; its length is always
      ``n + TAG_OVERHEAD`` when FIM applies and ``n`` otherwise — an
      invariant the caller (and the oracle) can assert without parsing.

    Plan: one projection; no shuffle, no UDF.
    """
    sid = _col(id_col).cast("string")
    n = F.length(_col(text_col)).cast("long")
    apply_fim = _coin(F.concat(F.lit(f"{seed}:f:"), sid), fim_rate)
    spm = _coin(F.concat(F.lit(f"{seed}:m:"), sid), spm_rate)
    # the cut moduli depend on n per-row — _offset_hash takes a constant
    # modulo, so inline the same md5 -> 60-bit-int here with Column mods
    h_a = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:a:"), sid)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    h_b = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:b:"), sid)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    cut_a = F.pmod(h_a, n + 1)
    cut_b = cut_a + F.pmod(h_b, n - cut_a + 1)
    cut_a = F.when(apply_fim, cut_a).otherwise(F.lit(0).cast("long"))
    cut_b = F.when(apply_fim, cut_b).otherwise(F.lit(0).cast("long"))
    t = _col(text_col)
    # substr is 1-based in both Spark and DuckDB; len-0 slices yield ''
    prefix = F.substring(t, F.lit(1), cut_a.cast("int"))
    middle = F.substring(t, (cut_a + 1).cast("int"), (cut_b - cut_a).cast("int"))
    suffix = F.substring(t, (cut_b + 1).cast("int"), (n - cut_b).cast("int"))
    psm = F.concat(
        F.lit(PRE), prefix, F.lit(SUF), suffix, F.lit(MID), middle
    )
    spm_r = F.concat(
        F.lit(PRE + SUF), suffix, F.lit(MID), prefix, middle
    )
    rendered = F.when(~apply_fim, t).when(spm, spm_r).otherwise(psm)
    mode = F.when(~apply_fim, F.lit("ar")).when(
        spm, F.lit("spm")
    ).otherwise(F.lit("psm"))
    return df.select(
        _col(id_col).alias(id_col),
        apply_fim.alias("fim_applied"),
        mode.alias("fim_mode"),
        cut_a.alias("cut_a"),
        cut_b.alias("cut_b"),
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("render_len"),
    )

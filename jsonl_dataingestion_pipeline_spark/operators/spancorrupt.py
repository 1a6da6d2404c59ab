"""Span-corruption pretraining masks (T5 denoising objective, Raffel
et al. 2020; UL2 "R-denoiser", Tay et al. 2022): pick ~``noise_density``
of every document's tokens as contiguous spans of mean length
``mean_span_length``, replace each span with one sentinel in the model
input, and emit the masked tokens as the target.

The canonical single-machine implementation draws span boundaries
sequentially from an RNG — stateful, order-dependent, and impossible
to replay across engines or partitionings. This module uses a
**blocked design** instead: the token stream ``[0, n)`` is cut into
fixed blocks of ``B = round(mean_span_length / noise_density)``
tokens, and every FULL block corrupts exactly one span of
``mean_span_length`` tokens whose offset inside the block is a pure
hash of ``(seed, doc id, block index)``. Consequences the pipeline
relies on:

- **deterministic**: membership is a function of the row key and the
  seed — identical on any cluster layout, any retry, any engine, and
  replayable in the DuckDB oracle (md5-based, like every hash here);
- **non-overlapping by construction**: one span per block, and the
  offset range ``[0, B - span_len]`` keeps the span inside its block
  — no rejection sampling, no sequential scan;
- **exact noise rate on full blocks**: ``span_len / B`` per block
  (= ``noise_density`` up to ``B``'s rounding); the only bias is the
  final partial block (< ``B`` tokens), which never corrupts — a
  ≤ ``B-1``-token edge per document, negligible for ``n >> B`` and
  documented rather than hidden;
- **scan-speed at 100 TB**: the span list is one pipelined
  ``Generate`` (``sequence`` + ``explode``) over a codegen
  projection — no shuffle, no UDF, no state.

Trade-off vs the reference RNG design: span lengths are fixed at the
mean rather than drawn from a distribution (SpanBERT-style geometric
lengths would need a second hash draw; the T5 paper itself reports
mean-3 spans and the ablation is flat around it).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _block_size(noise_density: float, mean_span_length: int) -> int:
    """Tokens per corruption block; every full block masks one span."""
    if not 0.0 < noise_density < 1.0:
        raise ValueError("noise_density must be in (0, 1)")
    if mean_span_length < 1:
        raise ValueError("mean_span_length must be >= 1")
    b = round(mean_span_length / noise_density)
    # the offset range [0, B - L] must be non-empty
    return max(b, mean_span_length)


def _offset_hash(key: Column, modulo: int) -> Column:
    """Uniform span offset in [0, modulo): md5 -> 60-bit int -> mod.

    15 hex digits < 2^60 stay positive in an int64, so ``pmod`` and
    the oracle's ``%`` agree exactly.
    """
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(modulo))


def span_corruption_spans(
    df: DataFrame,
    id_col: str,
    n_col: str,
    *,
    noise_density: float = 0.15,
    mean_span_length: int = 3,
    seed: int = 0,
) -> DataFrame:
    """One row per corrupted span: ``(id, span_idx, span_start,
    span_len)``.

    ``span_idx`` is the 0-based block index; ``span_start`` is the
    global token offset of the span's first token inside the document
    (block base + hashed offset); ``span_len`` is always
    ``mean_span_length``. Documents shorter than one block emit no
    rows. Plan: projection -> ``sequence``/``explode`` (pipelined
    Generate) -> projection; zero shuffles, zero UDFs.
    """
    b = _block_size(noise_density, mean_span_length)
    lmask = mean_span_length
    n = _col(n_col).cast("long")
    n_blocks = F.floor(n / F.lit(b)).cast("long")
    base = df.select(
        _col(id_col).alias("__id"), n_blocks.alias("__nb")
    ).filter(F.col("__nb") > 0)
    blocks = base.select(
        "__id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("__nb") - 1)
        ).alias("span_idx"),
    )
    key = F.concat(
        F.lit(f"{seed}:"),
        F.col("__id").cast("string"),
        F.lit(":"),
        F.col("span_idx").cast("string"),
    )
    off = _offset_hash(key, b - lmask + 1)
    return blocks.select(
        F.col("__id").alias(id_col),
        F.col("span_idx"),
        (F.col("span_idx") * b + off).cast("long").alias("span_start"),
        F.lit(lmask).cast("long").alias("span_len"),
    )


def span_corruption_stats(
    df: DataFrame,
    id_col: str,
    n_col: str,
    *,
    noise_density: float = 0.15,
    mean_span_length: int = 3,
) -> DataFrame:
    """Per-document corruption accounting — the numbers a dataloader
    budget plan needs, without materializing the span list.

    Returns ``(id, n_tokens, n_spans, n_masked, input_len,
    target_len)`` where, following the T5 convention:

    - ``input_len``  = ``n - n_masked + n_spans``   (each span collapses
      to one sentinel in the encoder input);
    - ``target_len`` = ``n_masked + n_spans + 1``   (sentinel before
      each span's tokens, plus the final EOS sentinel).

    Offsets don't enter any of these, so this is a pure zero-shuffle
    projection; it agrees exactly with aggregating
    :func:`span_corruption_spans` (pytest-pinned).
    """
    b = _block_size(noise_density, mean_span_length)
    n = _col(n_col).cast("long")
    n_spans = F.floor(n / F.lit(b)).cast("long")
    n_masked = n_spans * mean_span_length
    return df.select(
        _col(id_col).alias(id_col),
        n.alias("n_tokens"),
        n_spans.alias("n_spans"),
        n_masked.alias("n_masked"),
        (n - n_masked + n_spans).alias("input_len"),
        (n_masked + n_spans + 1).alias("target_len"),
    )

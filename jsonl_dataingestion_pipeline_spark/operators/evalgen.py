"""Evaluation-data generators: deterministic constructions every
long-context / retrieval eval harness builds from a corpus.

Currently: needle-in-a-haystack insertion (Kamradt 2023's NIAH grid,
the standard long-context probe reported by every context-extension
paper): plant a needle sentence at a controlled DEPTH of a haystack
document, then ask the model to retrieve it. Building the grid over a
real corpus is a data-engineering job — one row per (document, needle,
depth) with byte-exact rendering — and a pure projection in Spark.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def needle_insert(
    df: DataFrame,
    text_col: str,
    needle_col: str,
    depth_u_col: str,
    *,
    scale: int = 6,
) -> DataFrame:
    """Insert each row's needle into its text at the word boundary
    nearest the requested depth fraction. Input rows carry the text,
    the needle string, and ``depth_u`` (depth in integer micro-units,
    0 = front, 10^scale = back); output appends:

    - ``insert_word`` — the needle goes after this many words
      (``floor(n_words * depth_u / 10^scale)``, exact integer
      arithmetic);
    - ``rendered`` — the haystack with the needle spliced in,
      single-space joined;
    - ``render_len`` — always ``len(text) + len(needle) + 1`` for
      single-space-normalized text (the one added separator) — the
      audit invariant a 100 TB grid build checks without parsing.

    Word-boundary snapping (rather than raw char offsets) is the
    documented choice: it never splits a token, so downstream
    tokenization of haystack and needle is stable across depths.

    Pure zero-shuffle codegen projection — a full NIAH grid
    (contexts x needles x depths) is this operator applied to an
    exploded grid frame, and stays scan-bound at any corpus size.
    """
    u = 10 ** scale
    w = F.split(_col(text_col), " ")
    n = F.size(w).cast("long")
    dep = _col(depth_u_col).cast("long")
    k = (
        (n * dep - F.pmod(n * dep, F.lit(u).cast("long")))
        / F.lit(u).cast("long")
    ).cast("long")
    rendered = F.array_join(
        F.concat(
            F.slice(w, 1, k.cast("int")),
            F.array(_col(needle_col)),
            F.slice(w, (k + 1).cast("int"), (n - k).cast("int")),
        ),
        " ",
    )
    return df.select(
        "*",
        k.alias("insert_word"),
        rendered.alias("rendered"),
        F.length(rendered).cast("long").alias("render_len"),
    )

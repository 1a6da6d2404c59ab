"""Array kernels (F6, F17 of SURVEY.md §2.3)."""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_multi_ids(c: ColumnOrName) -> Column:
    """F6 — comma-separated multi-ID cell -> sorted, deduped array<string>.

    Split on ``,``, trim, drop empties, dedup + sort; null input -> empty
    array. Reference: `src/transformer_old.py:188-214` (authoritative over
    the newer transformer per SURVEY.md §7.3.2 — downstream tests expect
    list values).
    """
    parts = F.split(F.coalesce(_col(c).cast("string"), F.lit("")), ",")
    # NB: must be a 1-arg lambda — passing F.trim directly would make
    # transform() bind the element *index* to trim's optional trimStr arg.
    cleaned = F.filter(
        F.transform(parts, lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return F.array_sort(F.array_distinct(cleaned))


def join_for_text(c: ColumnOrName, sep: str = ", ") -> Column:
    """Render an array column for narrative text: join non-null elements.

    Mirrors `_fmt_value_for_text` list handling
    (`src/transformer.py:1168-1184`); empty -> null.
    """
    arr = F.filter(_col(c), lambda x: x.isNotNull())
    joined = F.array_join(arr, sep)
    return F.nullif(joined, F.lit(""))

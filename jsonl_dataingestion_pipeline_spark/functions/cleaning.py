"""String / boolean cleaning kernels (F1-F3, F13 of SURVEY.md §2.3).

Reference semantics: `/root/reference/src/transformer.py:207-245`.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_string(c: ColumnOrName, legacy: bool = False) -> Column:
    """F1 — trim, map whole-cell ``"()"`` to empty, ``nan``/``NaN`` to null.

    Mirrors `src/transformer.py:207-217` (trim + sentinel nulling). Note the
    reference keeps the empty string as ``""`` (pandas read with
    ``keep_default_na=False``); blanks are only treated as missing at the
    point of use — see :func:`nonblank`.

    ``legacy=True`` applies the permissive old-transformer sentinel set
    (`src/transformer_old.py:102-108`): also nulls ``None``/``null`` and
    the empty string itself.
    """
    t = F.trim(_col(c).cast("string"))
    t = F.when(t == "()", F.lit("")).otherwise(t)
    sentinels = (
        ("nan", "NaN", "None", "null", "") if legacy else ("nan", "NaN")
    )
    return F.when(t.isin(*sentinels), F.lit(None).cast("string")).otherwise(t)


def ensure_str_id(c: ColumnOrName) -> Column:
    """F2 — ID sanitization: strip embedded double quotes.

    Mirrors `src/transformer.py:219-225`.
    """
    return F.regexp_replace(_col(c).cast("string"), '"', "")


def coerce_boolean(c: ColumnOrName) -> Column:
    """F3 — Y/YES/TRUE/1 -> true; N/NO/FALSE/0 -> false; else null.

    Mirrors `src/transformer.py:227-245` (case-insensitive, trimmed).
    """
    u = F.upper(F.trim(_col(c).cast("string")))
    return (
        F.when(u.isin("Y", "YES", "TRUE", "1"), F.lit(True))
        .when(u.isin("N", "NO", "FALSE", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def blank_as_null(c: ColumnOrName) -> Column:
    """Trim and convert empty string to null (pandas "" ~ missing)."""
    return F.nullif(F.trim(_col(c).cast("string")), F.lit(""))


def nonblank(c: ColumnOrName, default: str | None = None) -> Column:
    """F13 — `_safe_text` semantics (`src/transformer.py:325-336`).

    Null/blank-after-trim collapses to ``default`` (null when no default),
    otherwise the trimmed text.
    """
    base = blank_as_null(c)
    if default is None:
        return base
    return F.coalesce(base, F.lit(default))

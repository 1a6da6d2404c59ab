"""Consignee name/code extraction (F7, F8 of SURVEY.md §2.3).

Reference semantics: `/root/reference/src/transformer.py:368-390`.
Input looks like ``"ACME GLOBAL (0001234567)"``:

- name  = text before the LAST ``(``, trimmed (whole string if no paren)
- code  = content between the last ``(`` and the following ``)``, then the
  LAST 9 characters, trimmed; if no paren pair, last 9 chars of the whole
  string. Blank -> null.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract_consignee_name(c: ColumnOrName) -> Column:
    """F7 — text before the last ``(``; null-safe, blank -> null."""
    t = F.nullif(F.trim(_col(c).cast("string")), F.lit(""))
    # greedy ^(.*)\( captures everything up to the LAST '('
    before_last_paren = F.nullif(
        F.trim(F.regexp_extract(t, r"^(.*)\(", 1)), F.lit("")
    )
    return F.when(t.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(t.contains("("), before_last_paren).otherwise(t)
    )


def extract_consignee_code(c: ColumnOrName) -> Column:
    """F8 — last-9-chars of the last parenthesized chunk (or whole cell)."""
    t = F.nullif(F.trim(_col(c).cast("string")), F.lit(""))
    # content after the last '(' then before the first following ')'
    inside = F.trim(
        F.substring_index(F.substring_index(t, "(", -1), ")", 1)
    )
    last9_inside = F.nullif(F.trim(F.substring(inside, -9, 9)), F.lit(""))
    last9_whole = F.nullif(F.trim(F.substring(t, -9, 9)), F.lit(""))
    has_pair = t.contains("(") & t.contains(")")
    # NB: when a paren pair exists but its content is blank the reference
    # returns None (no fallback to the whole string) — src/transformer.py:377
    return F.when(t.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(has_pair, last9_inside).otherwise(last9_whole)
    )


def split_multi_consignee(c: ColumnOrName) -> tuple[Column, Column]:
    """F9 — legacy multi-consignee split (`src/transformer_old.py:216-252`).

    Cell like ``"A Corp (123)| B Inc (456); C"``:
    - split on ``|`` / ``;``
    - each part's trailing ``(digits)`` becomes a code (dedup + sort)
    - primary name = first part's name portion (text before its code),
      falling back to the whole trimmed cell when no names parse.

    Returns ``(primary_name, codes array<string>)``.
    """
    t = F.nullif(F.trim(_col(c).cast("string")), F.lit(""))
    parts = F.filter(
        F.transform(F.split(t, r"[|;]\s*"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    code_of = lambda p: F.regexp_extract(p, r"\((\d+)\)\s*$", 1)  # noqa: E731
    codes = F.array_sort(
        F.array_distinct(
            F.filter(F.transform(parts, code_of), lambda x: x != "")
        )
    )
    names = F.filter(
        F.transform(
            parts,
            lambda p: F.trim(F.regexp_replace(p, r"\s*\(\d+\)\s*$", "")),
        ),
        lambda x: x != "",
    )
    primary = F.coalesce(F.try_element_at(names, F.lit(1)), t)
    null_str = F.lit(None).cast("string")
    empty_arr = F.array().cast("array<string>")
    return (
        F.when(t.isNull(), null_str).otherwise(primary),
        F.when(t.isNull(), empty_arr).otherwise(codes),
    )


def consignee_codes_list(c: ColumnOrName) -> Column:
    """Wrap the single extracted code into array<string> (never null).

    Reference wraps code -> ``[code]`` / ``[]``
    (`src/transformer.py:419-421`).
    """
    code = extract_consignee_code(c)
    return F.when(code.isNotNull(), F.array(code)).otherwise(
        F.array().cast("array<string>")
    )

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


# ---------------------------------------------------------------------------
# Mojibake repair (round 8)
# ---------------------------------------------------------------------------
def _mojibake_table() -> list[tuple[str, str]]:
    """(mojibake, fixed) pairs for the classic UTF-8-bytes-read-as-
    CP1252 corruption — the single most common crawl-text defect
    ("café" -> "cafÃ©"). Derived, not hand-typed: for each target char,
    the mojibake form IS ``char.encode('utf-8').decode('cp1252')``;
    chars whose UTF-8 bytes hit CP1252's five undefined slots (e.g.
    the right double quote, 0x9d) are skipped — their corruption is
    not byte-preserving, so no textual repair can round-trip them.
    Ordered longest-mojibake-first so 3-byte-char fixes (``â€"`` et
    al.) never get clipped by a 2-byte rule; the SAME ordered table
    generates the DuckDB oracle's replace chain."""
    chars = (
        "éèêëàâäçôöîïûùüñáíóúãõ«»ß–—‘’“…€"
    )
    table = []
    for ch in chars:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        table.append((moji, ch))
    table.sort(key=lambda t: (-len(t[0]), t[1]))
    return table


MOJIBAKE_TABLE = _mojibake_table()


def fix_mojibake(c: ColumnOrName) -> Column:
    """Repair UTF-8-as-CP1252 mojibake with one chained literal-replace
    pass over :data:`MOJIBAKE_TABLE` (longest sequences first).

    Pure codegen projection — zero shuffle, scan-speed at 100 TB, and
    byte-for-byte replayable in the oracle because the replacement
    table and its order are shared constants (q182). Single-pass by
    design: doubly-encoded text (mojibake of mojibake) needs a second
    application; chained fixes cannot misfire because no repaired char
    begins a mojibake sequence (all sequences start with Ã/Â/â)."""
    out = _col(c)
    for moji, ch in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(moji), F.lit(ch))
    return out

"""Code-corpus curation operators (The Stack / SantaCoder / StarCoder
family: Kocetkov et al. 2022, Allal et al. 2023, Li et al. 2023).

Source-code training sets are curated with a small, well-published
toolbox: extract code from markup (markdown fences, notebooks), apply
per-file quality heuristics (line-length stats, alphanumeric fraction,
auto-generated markers), and dedup on a whitespace/comment-normalized
key. This module implements the three text-side members over plain
``string`` columns; everything is Column expressions — no UDFs, and
the only shuffles are the per-(doc, block) aggregates.

Scale notes (100 TB):

- :func:`code_fence_blocks` explodes documents into lines and runs two
  windows partitioned by document — the hot-key bound is a single
  document's line count, never corpus-global. The per-block rebuild is
  one keyed aggregate with map-side combine.
- :func:`code_quality_stats` is a pure zero-shuffle projection (all
  statistics are higher-order-function folds over the line array); it
  pipelines into the parquet scan.
- :func:`normalized_code_key` is a projection; pair it with the
  existing exact-dedup census (``operators/dedup.py``) for The Stack's
  normalized exact dedup.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: A fence TOGGLE line: up to 3 leading SPACES only (CommonMark —
#: a tab-indented fence is indented code, not a fence), three or
#: more backticks, then at most one [word.+-]* info token and trailing
#: spaces. Lines with anything else after the backticks are content.
#: Deviation from full CommonMark (documented subset): the parser is a
#: stateless toggle, so a bare info-string fence INSIDE an open block
#: closes it instead of being literal content, and tilde fences /
#: 4-backtick nesting are not recognized. Real markdown overwhelmingly
#: uses plain three-backtick pairs; the subset is pytest-pinned.
_FENCE_RE = r"^ {0,3}```+[ \t]*([A-Za-z0-9_.+#-]*)[ \t]*$"


def code_fence_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Extract fenced code blocks from markdown-ish text: one row per
    non-empty block — ``(id, block_idx, lang, n_lines, n_chars,
    content)``.

    Relational CommonMark-lite: posexplode lines -> flag fence toggle
    lines (``_FENCE_RE``) -> running toggle count per document (a
    line is inside a block iff the count of PRECEDING-OR-SELF toggles
    is odd and the line itself is not a toggle) -> the block's
    language is the last toggle line's info string (lowercased; empty
    info -> ``''``) -> group back to one row per block, content joined
    in line order. An unclosed trailing fence runs to end-of-document
    (CommonMark semantics). Empty blocks (opener directly followed by
    closer) emit no row.

    Plan: Generate (posexplode) -> two windows partitioned by document
    (hot key bounded by one document's line count) -> one keyed
    aggregate. No UDFs.
    """
    lines = df.select(
        _col(id_col).alias("__id"),
        F.posexplode(F.split(_col(text_col), r"\r?\n")).alias(
            "__pos", "__line"
        ),
    )
    is_fence = F.col("__line").rlike(_FENCE_RE)
    info = F.lower(
        F.regexp_extract(F.col("__line"), _FENCE_RE, 1)
    )
    w = (
        Window.partitionBy("__id")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = lines.select(
        "__id",
        "__pos",
        "__line",
        F.sum(is_fence.cast("int")).over(w).alias("__nf"),
        F.last(F.when(is_fence, info), ignorenulls=True)
        .over(w)
        .alias("__lang"),
        is_fence.alias("__isf"),
    )
    content = marked.filter(
        (F.col("__nf") % 2 == 1) & ~F.col("__isf")
    )
    # block index = rank of the opening toggle within the doc
    blk = ((F.col("__nf") - 1) / 2).cast("long")
    return (
        content.groupBy("__id", blk.alias("block_idx"))
        .agg(
            F.min("__lang").alias("lang"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.length("__line").cast("long")).alias("n_chars"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("content"),
        )
        .select(
            F.col("__id").alias(id_col),
            "block_idx",
            "lang",
            "n_lines",
            "n_chars",
            "content",
        )
    )


def code_quality_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_line_length: int = 1000,
    max_mean_line_length: int = 100,
    min_alnum_fraction: float = 0.25,
    autogen_head_lines: int = 5,
    scale: int = 6,
) -> DataFrame:
    """SantaCoder-style per-file code quality statistics and keep
    decision (Allal et al. 2023 §4; same filters carried by StarCoder,
    Li et al. 2023): ``(id, n_lines, n_chars, max_line_len,
    mean_line_len_u, alnum_frac_u, autogen, keep)``.

    - ``n_chars`` = sum of line lengths (newlines excluded);
    - ``mean_line_len_u`` / ``alnum_frac_u`` are integer micro-units
      (floor, ``10^scale``);
    - ``autogen`` = any of the first ``autogen_head_lines`` lines
      contains ``auto-generated``/``autogenerated``/``generated by``
      (lowercased) — the standard generated-file marker sweep;
    - ``keep`` — drop when ``max_line_len > max_line_length``, or
      ``mean_line_len > max_mean_line_length``, or the alphanumeric
      character fraction is below ``min_alnum_fraction``, or the file
      is auto-generated. Every threshold is evaluated as a
      CROSS-MULTIPLIED integer predicate (``sum_len >
      max_mean * n_lines``; ``alnum * 10^scale < n_chars * thr_u``) —
      no float division in any decision, bit-replayable in the oracle.

    Empty files (zero chars) keep: nothing to filter on. Pure
    zero-shuffle projection — the line statistics are HOF folds over
    the split array, alnum counting is one ``regexp_replace`` length
    difference.
    """
    u = 10 ** scale
    thr_u = round(min_alnum_fraction * u)
    lines = F.split(_col(text_col), r"\r?\n")
    lens = F.transform(lines, lambda l: F.length(l).cast("long"))
    n_lines = F.size(lines).cast("long")
    sum_len = F.aggregate(
        lens, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    max_len = F.array_max(F.concat(lens, F.array(F.lit(0).cast("long"))))
    alnum = (
        F.length(_col(text_col))
        - F.length(
            F.regexp_replace(_col(text_col), "[A-Za-z0-9]", "")
        )
    ).cast("long")
    head = F.slice(lines, 1, autogen_head_lines)
    autogen = F.exists(
        head,
        lambda l: F.lower(l).contains("auto-generated")
        | F.lower(l).contains("autogenerated")
        | F.lower(l).contains("generated by"),
    )
    # integer floor division via `div` keeps micro-units exact
    base = df.select(
        _col(id_col).alias(id_col),
        n_lines.alias("n_lines"),
        sum_len.alias("__sum_len"),
        max_len.alias("max_line_len"),
        alnum.alias("__alnum"),
        autogen.alias("autogen"),
    )
    n_chars = F.col("__sum_len")
    keep = ~(
        (F.col("max_line_len") > max_line_length)
        | (n_chars > F.lit(max_mean_line_length) * F.col("n_lines"))
        | (
            (n_chars > 0)
            & (F.col("__alnum") * u < n_chars * F.lit(thr_u))
        )
        | F.col("autogen")
    )
    return base.select(
        id_col,
        "n_lines",
        n_chars.alias("n_chars"),
        "max_line_len",
        F.when(
            F.col("n_lines") > 0,
            F.expr(f"CAST((__sum_len * {u}) div n_lines AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("mean_line_len_u"),
        F.when(
            n_chars > 0,
            F.expr(f"CAST((__alnum * {u}) div __sum_len AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("alnum_frac_u"),
        "autogen",
        keep.alias("keep"),
    )


def normalized_code_key(
    text: ColumnOrName,
    *,
    strip_comments: bool = True,
) -> Column:
    """The Stack's normalized exact-dedup key (Kocetkov et al. 2022
    §3.1): md5 of the content after dropping line comments (``# ...``
    and ``// ...`` to end of line) and collapsing all whitespace runs
    to single spaces. Two files differing only in comments, blank
    lines, or indentation share a key.

    Deliberately string-literal-naive (a ``#`` inside a string is
    treated as a comment start) — the published filter is the same
    regex-level normalization, and for a DEDUP KEY a false comment
    strip only risks merging two files that differ inside trailing
    string content, the conservative direction for dedup. Pure
    projection.
    """
    t = _col(text)
    if strip_comments:
        t = F.regexp_replace(t, r"(#|//)[^\n]*", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return F.md5(t)


REPO_TAG, FILE_TAG = "<repo_name>", "<file_sep>"


def repo_context_render(
    df: DataFrame,
    repo_col: str,
    path_col: str,
    content_col: str,
    *,
    char_budget: int,
    repo_tag: str = REPO_TAG,
    file_tag: str = FILE_TAG,
) -> DataFrame:
    """Repository-level context rendering (StarCoder2, Lozhkov et al.
    2024 §3.2; DeepSeek-Coder repo-level pretraining): concatenate a
    repository's files into training documents, cutting at FILE
    boundaries under a character budget. One row per context document:
    ``(repo, ctx_idx, n_files, n_chars, rendered)``.

    - Files order by ``path`` ascending within their repo (the
      published pipelines use a dependency-ish topological heuristic;
      path-lexicographic is the deterministic documented choice).
    - Each file costs ``len(file_tag) + len(path) + 1 + len(content)``
      chars; every context carries a ``repo_tag + repo`` header.
    - Greedy first-fit-in-order: a file that would push the running
      context past ``char_budget`` starts a new context; a single file
      larger than the budget gets a context of its own (files are
      NEVER split — the whole point of repo context is intact files).
    - ``n_chars`` = exact rendered length (header included) — an
      invariant the caller can audit without parsing.

    Plan: ONE shuffle (the per-repo ``collect_list`` aggregate with
    map-side combine), then the greedy fold, per-context slicing, and
    rendering are all higher-order functions inside the aggregated
    row, and the contexts posexplode back out. Hot-key bound: a single
    repository's file count (real repos are ~10^2-10^4 files — never
    corpus-scale); the per-repo fold is O(n_files) and the per-context
    rendering touches each file once per context filter pass
    (O(n_files * n_ctx) predicate checks, string concat once).
    """
    files = df.select(
        _col(repo_col).alias("__repo"),
        F.struct(
            _col(path_col).alias("p"),
            _col(content_col).alias("c"),
            (
                F.lit(len(file_tag) + 1).cast("long")
                + F.length(_col(path_col))
                + F.length(_col(content_col))
            ).alias("cost"),
        ).alias("__f"),
    )
    grouped = files.groupBy("__repo").agg(
        F.array_sort(F.collect_list("__f")).alias("__fs")
    )
    hdr_len = F.length(
        F.concat(F.lit(repo_tag), F.col("__repo").cast("string"))
    ).cast("long")
    # greedy fold: assign[i] = context index of file i
    assign = F.aggregate(
        F.col("__fs"),
        F.struct(
            F.array().cast("array<bigint>").alias("a"),
            F.lit(0).cast("bigint").alias("ctx"),
            hdr_len.alias("used"),
        ),
        lambda acc, x: F.struct(
            F.concat(
                acc["a"],
                F.array(
                    F.when(
                        (acc["used"] > hdr_len)
                        & (acc["used"] + x["cost"] > char_budget),
                        acc["ctx"] + 1,
                    ).otherwise(acc["ctx"])
                ),
            ).alias("a"),
            F.when(
                (acc["used"] > hdr_len)
                & (acc["used"] + x["cost"] > char_budget),
                acc["ctx"] + 1,
            )
            .otherwise(acc["ctx"])
            .alias("ctx"),
            F.when(
                (acc["used"] > hdr_len)
                & (acc["used"] + x["cost"] > char_budget),
                hdr_len + x["cost"],
            )
            .otherwise(acc["used"] + x["cost"])
            .alias("used"),
        ),
    )
    with_assign = grouped.select(
        "__repo",
        F.arrays_zip(
            F.col("__fs").alias("f"),
            assign["a"].alias("ctx"),
        ).alias("__fa"),
        (assign["ctx"] + 1).alias("__nctx"),
    )
    # build one struct per context inside the row, then posexplode
    ctxs = F.transform(
        F.sequence(F.lit(0).cast("bigint"), F.col("__nctx") - 1),
        lambda c: F.struct(
            c.alias("ctx_idx"),
            F.size(
                F.filter(F.col("__fa"), lambda z: z["ctx"] == c)
            ).cast("long").alias("n_files"),
            F.concat(
                F.lit(repo_tag),
                F.col("__repo").cast("string"),
                F.aggregate(
                    F.filter(F.col("__fa"), lambda z: z["ctx"] == c),
                    F.lit("").cast("string"),
                    lambda acc, z: F.concat(
                        acc,
                        F.lit(file_tag),
                        z["f"]["p"],
                        F.lit("\n"),
                        z["f"]["c"],
                    ),
                ),
            ).alias("rendered"),
        ),
    )
    out = with_assign.select(
        "__repo", F.explode(ctxs).alias("__c")
    )
    return out.select(
        F.col("__repo").alias(repo_col),
        F.col("__c.ctx_idx").alias("ctx_idx"),
        F.col("__c.n_files").alias("n_files"),
        F.length("__c.rendered").cast("long").alias("n_chars"),
        F.col("__c.rendered").alias("rendered"),
    )

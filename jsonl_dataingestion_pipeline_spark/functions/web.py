"""Web-corpus column functions: HTML -> text extraction and URL/domain
normalization.

The reference pipeline ingests curated CSV exports, so it never faces
raw crawl HTML; a 100 TB pretraining build does (C4, RefinedWeb and
FineWeb all start from WET/WARC records).  These are the two column
primitives that stage needs before any quality rule can run:

- :func:`strip_html` — comments/script/style removal, tag stripping,
  entity decoding, whitespace collapse.  One chain of ``regexp_replace``
  / ``replace`` Column expressions: fully codegen'd, embarrassingly
  parallel, zero shuffle, and replayable verbatim by the DuckDB oracle
  (every pattern below is valid in both Java regex and RE2 — no
  backreferences, no lookaround).
- :func:`url_host` / :func:`registered_domain` — host extraction and a
  public-suffix-lite registered-domain heuristic, the grouping key for
  per-domain quotas (C4 caps pages per host; FineWeb's dedup and
  quality stats are domain-keyed).

Scale notes: both are narrow per-row projections — they cost one pass
of whole-stage-codegen'd string work and preserve the input
partitioning, so they compose with any downstream shuffle for free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.column import Column as ColumnType

ColumnOrName = "ColumnOrName"


def _col(c) -> Column:
    return c if isinstance(c, ColumnType) else F.col(c)


# Block-level elements whose content is NOT text (drop content too).
_BLOCK_DROP = ("script", "style")

# HTML entities decoded by strip_html, in application order.  `&amp;`
# must come last so `&amp;lt;` decodes to the literal text `&lt;`, not
# to `<` (single-pass standard behaviour).
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


# closing (or void) tags that end a text block — their removal inserts a
# newline instead of a space when keep_line_breaks=True, the way real
# extractors preserve document structure for line-level curation rules
_BLOCK_BOUNDARY_RE = r"(?i)<(?:/p|/div|/li|/tr|/h[1-6]|br[^>]*)\s*>"


def strip_html(c, *, keep_line_breaks: bool = False) -> Column:
    """Extract visible text from an HTML fragment.

    Steps (each a global regexp/literal replace, valid identically in
    Java regex and RE2 so the oracle replays them 1:1):

    1. drop comments ``<!-- ... -->`` (dotall, non-greedy);
    2. drop ``<script>``/``<style>`` blocks INCLUDING their content
       (case-insensitive, dotall, non-greedy);
    3. with ``keep_line_breaks``: block-ending tags (``</p> </div>
       </li> </tr> </h1..6> <br>``) become a NEWLINE — the structure
       line-level curation rules (C4, line dedup) need;
    4. every remaining tag ``<tagname ...>`` / ``</tagname>`` /
       ``<!doctype ...>`` becomes a single space — only ``<`` followed
       by a letter, ``/`` or ``!`` opens a tag, so stray ``<`` in prose
       (``a < b``) survives;
    5. decode the common entities (``&amp;`` last, single pass);
    6. collapse whitespace: all runs to one space and trim — or, with
       ``keep_line_breaks``, horizontal runs to one space, blank-padded
       newline runs to one newline, then trim.

    Unclosed script/style blocks are left for step 4 (tags stripped,
    content kept) rather than deleting the rest of the document.
    """
    out = _col(c)
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    for tag in _BLOCK_DROP:
        out = F.regexp_replace(
            out, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " "
        )
    if keep_line_breaks:
        out = F.regexp_replace(out, _BLOCK_BOUNDARY_RE, "\n")
    out = F.regexp_replace(out, r"</?[a-zA-Z!][^>]*>", " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    if keep_line_breaks:
        out = F.regexp_replace(out, r"[ \t\f\r]+", " ")
        out = F.regexp_replace(out, r" ?\n[ \n]*", "\n")
        # trim() strips only spaces — newlines need the regex anchors
        return F.regexp_replace(out, r"^\s+|\s+$", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def url_host(c) -> Column:
    """Host part of a URL, lower-cased (pure regex — identical in the
    oracle; no dependency on JVM ``parse_url`` semantics): everything
    between ``://`` (skipping any ``userinfo@``) and the first ``/``,
    ``?``, ``#``, or ``:`` (port). NULL when the value does not look
    like an absolute URL.
    """
    h = F.lower(
        F.regexp_extract(
            _col(c),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]+)",
            1,
        )
    )
    return F.when(h != "", h)


# Two-level public suffixes a last-two-label heuristic would split
# wrong.  A deliberately small embedded list (the operator's contract is
# "public-suffix-LITE"); :func:`registered_domain_psl` below is the
# full-PSL broadcast-table variant for deployments that need it.
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "co.in", "co.kr", "co.nz", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "com.sg",
)


def registered_domain(host: "Column | str") -> Column:
    """Registrable domain of a host: the last two labels, or the last
    three when the last two form a known two-level public suffix
    (``example.co.uk`` -> ``example.co.uk``, not ``co.uk``).  A leading
    ``www.`` label never changes the answer (it is dropped by taking
    labels from the END).  Hosts with fewer labels than needed are
    returned whole; NULL propagates.
    """
    h = _col(host)
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - F.lit(1), F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - F.lit(2), F.lit(1)), 3), ".")
    return F.when(last2.isin(*_TWO_LEVEL_SUFFIXES), last3).otherwise(last2)


# query parameters stripped by canonicalize_url: tracking/session noise
# that makes one logical page look like many distinct URLs (the classic
# crawl-frontier dedup problem). Prefix match for utm_*, exact for the
# rest.
_TRACKING_EXACT = ("gclid", "fbclid", "msclkid", "ref", "sessionid")


def canonicalize_url(c: "Column | str") -> Column:
    """Crawl-frontier URL canonicalization — the normalization step
    before URL-level dedup / frontier scheduling, built from regex +
    array expressions only (identically replayable in the oracle):

    1. fragment dropped (``#...``);
    2. scheme and host lower-cased; ``userinfo@`` credentials dropped;
    3. default ports removed (``http://h:80``, ``https://h:443``),
       non-default ports kept;
    4. empty path becomes ``/``;
    5. query parameters: tracking params dropped (``utm_*`` prefix,
       gclid/fbclid/msclkid/ref/sessionid exact), the rest SORTED so
       param order can't split a page's identity; an emptied query
       loses its ``?``.

    NULL for values that do not look like absolute URLs (no scheme).
    """
    u = F.regexp_replace(_col(c), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(
            u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#]+)", 1
        )
    )
    host = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(
        u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^utm_[^=]*(=.*)?$")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*_TRACKING_EXACT),
    )
    query = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), rebuilt)


def extract_links(c: "Column | str") -> Column:
    """All ``href`` attribute values in an HTML fragment, in document
    order: double- then single-quoted forms (two RE2-safe extracts,
    concatenated — no backreference so the oracle replays 1:1).
    Unquoted hrefs are out of contract. Returns array<string>."""
    h = _col(c)
    dq = F.regexp_extract_all(h, F.lit(r'(?i)href\s*=\s*"([^"]*)"'), 1)
    sq = F.regexp_extract_all(h, F.lit(r"(?i)href\s*=\s*'([^']*)'"), 1)
    return F.concat(dq, sq)


# ---------------------------------------------------------------------------
# Full public-suffix-list variant of registered_domain
# ---------------------------------------------------------------------------

def psl_rules(spark, lines) -> "DataFrame":
    """Parse raw public-suffix-list lines (the publicsuffix.org format:
    one rule per line, ``//`` comments, ``*.`` wildcards, ``!``
    exceptions) into the rules frame :func:`registered_domain_psl`
    consumes: (match_key, klen, prio, pub_len).

    ``match_key`` is the literal label suffix the host's tail must
    equal (the wildcard's ``*.`` is stripped — its extra label is
    accounted for in ``pub_len``); ``prio`` implements the PSL
    prevailing-rule order (exception rules beat everything, then most
    labels wins); ``pub_len`` is the number of host labels the PUBLIC
    suffix occupies when the rule prevails (for an exception rule the
    matching name itself is registrable, so its public suffix is one
    label shorter than the match)."""
    rows = []
    for ln in lines:
        ln = ln.strip()
        if not ln or ln.startswith("//"):
            continue
        kind = "normal"
        if ln.startswith("!"):
            kind, ln = "exception", ln[1:]
        elif ln.startswith("*."):
            kind, ln = "wildcard", ln[2:]
        key = ln.lower()
        klen = key.count(".") + 1
        if kind == "normal":
            prio, pub_len = klen, klen
        elif kind == "wildcard":
            prio, pub_len = klen + 1, klen + 1
        else:
            prio, pub_len = 10000 + klen, klen - 1
        rows.append((key, klen, prio, pub_len))
    return spark.createDataFrame(
        rows, "match_key string, klen int, prio int, pub_len int"
    )


def registered_domain_psl(
    df: "DataFrame",
    host_col: "Column | str",
    psl: "DataFrame",
    *,
    out_col: str = "registered_domain",
    max_levels: int = 5,
) -> "DataFrame":
    """Registrable domain via the FULL public suffix list — the
    documented upgrade of :func:`registered_domain` (which embeds a
    15-suffix LITE table) for deployments that need `.com.pl`-class
    accuracy. ``psl`` is the output of :func:`psl_rules` over a PSL
    snapshot (public data; ship it with the job, don't fetch).

    Plan shape — the host side NEVER shuffles: for each suffix length
    k in 1..``max_levels`` the host's last-k-label string left-joins a
    broadcast slice of the rules table, then one ``greatest`` over the
    matched (prio, pub_len) structs picks the PSL prevailing rule
    (exceptions beat wildcards beat shorter rules); unmatched hosts
    fall back to the PSL default rule ``*`` (last label is public).
    ``max_levels`` bounds rule depth (the real PSL tops out at 5
    labels). Hosts with no label beyond their public suffix are
    returned whole (same contract as the LITE expression); NULL
    propagates. Appends ``out_col`` to ``df``."""
    h = F.lower(_col(host_col))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    out = df.withColumn("__rdp_h", h)
    for k in range(1, max_levels + 1):
        rk = (
            psl.filter(F.col("klen") == k)
            .groupBy("match_key")
            .agg(F.max(F.struct("prio", "pub_len")).alias("__r"))
            .select(
                F.col("match_key").alias(f"__rdp_m{k}"),
                F.col("__r.prio").alias(f"__rdp_p{k}"),
                F.col("__r.pub_len").alias(f"__rdp_l{k}"),
            )
        )
        lastk = F.when(
            F.size(F.split(F.col("__rdp_h"), r"\.")) >= k,
            F.array_join(
                F.slice(
                    F.split(F.col("__rdp_h"), r"\."),
                    F.size(F.split(F.col("__rdp_h"), r"\.")) - F.lit(k)
                    + 1,
                    k,
                ),
                ".",
            ),
        )
        out = out.join(
            F.broadcast(rk),
            on=lastk == F.col(f"__rdp_m{k}"),
            how="left",
        ).drop(f"__rdp_m{k}")
    cands = [
        F.struct(
            F.coalesce(F.col(f"__rdp_p{k}"), F.lit(0)).alias("p"),
            F.col(f"__rdp_l{k}").alias("l"),
        )
        for k in range(1, max_levels + 1)
    ]
    win = cands[0] if len(cands) == 1 else F.greatest(*cands)
    hh = F.col("__rdp_h")
    lab = F.split(hh, r"\.")
    nn = F.size(lab)
    pub_len = F.when(win["p"] > 0, win["l"]).otherwise(F.lit(1))
    reg = F.when(
        nn > pub_len,
        F.array_join(F.slice(lab, nn - pub_len, pub_len + 1), "."),
    ).otherwise(hh)
    drop = ["__rdp_h"] + [
        c for k in range(1, max_levels + 1)
        for c in (f"__rdp_p{k}", f"__rdp_l{k}")
    ]
    return out.withColumn(out_col, reg).drop(*drop)


# regex metacharacters escaped when compiling an RFC 9309 path pattern
# to an anchored regex. Backslash FIRST (later escapes introduce them);
# '*' deliberately absent (it compiles to '.*'), and a TRAILING '$' is
# consumed as the RFC's end-anchor before this table applies, so any
# '$' reaching it is a literal mid-pattern octet.
_ROBOTS_REGEX_ESCAPES = (
    "\\", ".", "^", "$", "+", "?", "(", ")", "[", "]", "{", "}", "|"
)


def _robots_compile(pat: Column) -> Column:
    """Compile an RFC 9309 Allow/Disallow path pattern to an anchored
    regex (valid identically under Java regex and RE2, so the DuckDB
    oracle replays the same compiled pattern): a trailing ``$`` becomes
    the end-of-input anchor ``\\z`` (RFC 9309 §2.2.3 — only the FINAL
    octet is an anchor; any other ``$`` is a literal), every regex
    metacharacter is literal-escaped, ``*`` becomes ``.*`` (§2.2.2
    matches any sequence of octets), and the whole pattern is anchored
    at the path start with ``^``."""
    anchored = pat.endswith("$")
    body = F.when(
        anchored, F.substring(pat, 1, F.length(pat) - 1)
    ).otherwise(pat)
    for ch in _ROBOTS_REGEX_ESCAPES:
        body = F.replace(body, F.lit(ch), F.lit("\\" + ch))
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"),
        body,
        F.when(anchored, F.lit("\\z")).otherwise(F.lit("")),
    )


def _robots_star_lines(
    df,
    id_col: str,
    robots_col: str,
):
    """The shared relational robots.txt parse behind
    :func:`robots_star_rules` and :func:`robots_star_crawl_delay`:
    classified, comment-stripped lines with their RFC 9309 group id
    and the per-group star flag appended.

    RFC conformance notes (each a round-9→10 review/advice fix):
    lines split on CRLF or LF (the RFC serializes CRLF); end-of-line
    ``#`` comments are stripped BEFORE classification (the RFC permits
    them on any line — ``Disallow: /private # staff`` is the pattern
    ``/private``); and group segmentation counts EVERY directive line
    — Allow/Disallow including empty-pattern ones, Crawl-delay,
    unknown records — because per the RFC a ``User-agent`` line after
    any record starts a NEW group: an empty ``Disallow:`` or a
    ``Crawl-delay:`` emits no rule but still terminates the header
    block, so ``User-agent: *\\nDisallow:\\nUser-agent: bad\\n
    Disallow: /`` must NOT attribute ``/`` to the star group.
    Crawler-specific groups remain out of scope (the operator's
    contract is the ``*`` group); percent-encoding normalization of
    patterns/paths is the caller's concern.

    Parsing is relational, not a per-row UDF: one ``posexplode`` over
    the lines, a per-host window marking header-block starts
    (consecutive ``User-agent:`` lines form one group header per the
    RFC), a running-sum group id, and a per-group ANY(agent = '*') —
    every stage is ordinary SQL, which is what lets the DuckDB oracle
    replay the parser itself. Shuffle volume is #robots-lines, keyed by
    host id.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.col(robots_col).cast("string"), "\r?\n")
        ).alias("__ln", "__raw"),
    ).select(
        "__id",
        "__ln",
        # strip end-of-line comments first — '#' never appears in a
        # path pattern (fragments are not sent to servers), so
        # everything from the first '#' is comment per the RFC grammar
        F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", "")).alias(
            "__line"
        ),
    )
    low = F.lower(F.col("__line"))
    is_ua = low.startswith("user-agent:")
    is_allow = low.startswith("allow:")
    is_dis = low.startswith("disallow:")
    # a DIRECTIVE is any non-UA "key: value" line — Allow/Disallow
    # (even empty-pattern), Crawl-delay, Sitemap, unknown records
    # alike. EVERY directive goes through the group window: per the
    # RFC header grammar a User-agent line after ANY record starts a
    # NEW group (Google's parser treats unknown records the same), so
    # neither an empty Disallow nor a Crawl-delay between two groups
    # can merge them and mis-attribute rules across groups
    is_directive = ~is_ua & (F.expr("instr(__line, ':')") >= 2)
    # everything after the FIRST colon (values may themselves contain
    # colons — substring_index(-1) would take the LAST segment)
    val = F.trim(
        F.expr("substring(__line, instr(__line, ':') + 1)")
    )
    typed = lines.select(
        "__id",
        "__ln",
        is_ua.alias("__ua"),
        F.when(is_ua, F.lower(val)).alias("__agent"),
        F.when(is_allow, F.lit(True))
        .when(is_dis, F.lit(False))
        .alias("__allow"),
        F.when(is_allow | is_dis, val).alias("__pat"),
        F.when(low.startswith("crawl-delay:"), val).alias("__cdelay"),
    ).filter(F.col("__ua") | is_directive)
    w = Window.partitionBy("__id").orderBy("__ln")
    # a header block starts at a User-agent line NOT preceded by one
    starts = F.when(
        F.col("__ua")
        & ~F.coalesce(F.lag("__ua").over(w), F.lit(False)),
        F.lit(1),
    ).otherwise(F.lit(0))
    grouped = typed.withColumn(
        "__grp",
        F.sum(starts).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    star = grouped.groupBy("__id", "__grp").agg(
        F.max(
            F.when(F.col("__agent") == "*", F.lit(True)).otherwise(
                F.lit(False)
            )
        ).alias("__star")
    )
    return grouped.join(star, on=["__id", "__grp"])


def robots_star_rules(
    df,
    id_col: str,
    robots_col: str,
):
    """The Allow/Disallow rule list of each host's ``*`` group — see
    :func:`_robots_star_lines` for the shared relational parse and the
    RFC-conformance notes. Returns ``(id, allow BOOLEAN, rule STRING,
    rule_regex STRING, rule_len INT)``: ``rule`` as written,
    ``rule_regex`` the compiled anchored regex (full RFC 9309
    §2.2.2/§2.2.3 wildcard semantics — mid-pattern ``*`` matches any
    octet run, trailing ``$`` anchors the end; round 9 DROPPED such
    rules, failing the opt-out guard open on the most common real
    patterns like ``Disallow: /*.pdf$``), ``rule_len`` the pattern
    octet length — the §2.2.2 longest-match precedence key
    :func:`robots_url_allowed` consumes. Empty patterns emit no rule
    (``Disallow:`` = unrestricted per the RFC); crawler-specific
    groups are out of contract; percent-encoding normalization is the
    caller's concern."""
    from pyspark.sql import functions as F

    grouped = _robots_star_lines(df, id_col, robots_col)
    pat = F.col("__pat")
    return (
        grouped
        .filter(
            F.col("__star")
            & F.col("__allow").isNotNull()
            & (F.length(pat) > 0)
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__allow").alias("allow"),
            pat.alias("rule"),
            _robots_compile(pat).alias("rule_regex"),
            F.length(pat).alias("rule_len"),
        )
    )


def robots_star_crawl_delay(
    df,
    id_col: str,
    robots_col: str,
):
    """The ``Crawl-delay`` the ``*`` group requests, per host — not in
    RFC 9309 but honored by most large crawlers, and a politeness-
    aware fetch scheduler wants it next to the Allow/Disallow rules.
    Returns ``(id, crawl_delay DOUBLE)`` for hosts whose star group
    carries at least one NUMERIC ``Crawl-delay:`` line; multiple lines
    take the MAXIMUM (the most-polite reading). Non-numeric values are
    ignored — fail-open to "no delay requested" is correct here (a
    delay is a politeness hint; contrast the rule parser, where a
    dropped pattern would fail an OPT-OUT open). Shares the
    :func:`_robots_star_lines` parse; one extra per-host aggregate."""
    from pyspark.sql import functions as F

    grouped = _robots_star_lines(df, id_col, robots_col)
    # try_cast: non-numeric delays are ignored, and under ANSI mode a
    # plain cast would kill the whole job on one malformed line
    d = F.col("__cdelay").try_cast("double")
    return (
        grouped.filter(F.col("__star") & d.isNotNull())
        .groupBy(F.col("__id").alias(id_col))
        .agg(F.max(d).alias("crawl_delay"))
    )


def robots_sitemaps(
    df,
    id_col: str,
    robots_col: str,
):
    """All ``Sitemap:`` URLs in each host's robots.txt — per RFC 9309
    §2.4 these are GLOBAL records (valid anywhere in the file, not
    scoped to a user-agent group), so no group machinery applies: one
    line explode, comment strip, case-insensitive match, value
    extract. Returns ``(id, ln INT, sitemap STRING)`` with the 0-based
    line number (duplicates preserved — the file said it twice, and
    ``ln`` keeps the output deterministic without a global sort). A
    crawl frontier seeds from these next to the
    :func:`robots_star_rules` opt-outs."""
    from pyspark.sql import functions as F

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.col(robots_col).cast("string"), "\r?\n")
        ).alias("__ln", "__raw"),
    ).select(
        "__id",
        "__ln",
        F.trim(F.regexp_replace(F.col("__raw"), r"#.*$", "")).alias(
            "__line"
        ),
    )
    val = F.trim(
        F.expr("substring(__line, instr(__line, ':') + 1)")
    )
    return (
        lines.filter(
            F.lower(F.col("__line")).startswith("sitemap:")
            & (F.length(val) > 0)
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__ln").alias("ln"),
            val.alias("sitemap"),
        )
    )


def robots_url_allowed(
    urls,
    rules,
    id_col: str,
    path_col: str,
):
    """Evaluate URL paths against :func:`robots_star_rules` output for
    the same host id: RFC 9309 longest-match — the matching rule with
    the most pattern octets wins (§2.2.2, wildcards counted as
    written), Allow beats Disallow on equal length, and a path matching
    NO rule is allowed. Returns the input ``urls`` columns plus
    ``(allowed BOOLEAN, matched_rule STRING — NULL when nothing
    matched)``; ``matched_rule`` is the pattern as written in the
    robots.txt (wildcards included).

    One host-keyed join (rules frames are tiny per host — broadcast
    when the rule table is small overall) and one per-URL aggregate of
    the (length, allow, rule) struct max — a total order, so the
    decision AND the reported rule are layout-independent. Matching is
    one ``regexp_like`` per (URL, applicable rule) pair against the
    precompiled anchored pattern — non-foldable, so the JVM compiles
    the tiny pattern per row (~µs); rule tables are rule-count-sized,
    so the pair count is #urls × rules-per-host, never quadratic in
    the corpus.

    The aggregate groups by ALL ``urls`` columns, so exact duplicate
    URL rows collapse to one output row — carry a row id if
    multiplicity matters downstream.
    """
    from pyspark.sql import functions as F

    cand = urls.join(rules, on=id_col, how="left").withColumn(
        "__hit",
        F.when(
            F.regexp_like(F.col(path_col), F.col("rule_regex")),
            F.struct(
                F.col("rule_len").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("rule").alias("r"),
            ),
        ),
    )
    best = cand.groupBy(*urls.columns).agg(
        F.max("__hit").alias("__best")
    )
    return best.select(
        *urls.columns,
        F.coalesce(F.col("__best.a") == 1, F.lit(True)).alias("allowed"),
        F.col("__best.r").alias("matched_rule"),
    )


def meta_robots_flags(c) -> Column:
    """In-page robots directives — the ``<meta name="robots">`` twin of
    the robots.txt evaluator: an opt-out-respecting curation pipeline
    honors page-level ``noindex``/``nofollow`` in addition to the
    host-level REP rules (robots.txt cannot express per-page opt-outs,
    and real sites use the meta tag for exactly that). Returns a
    STRUCT ``(noindex BOOLEAN, nofollow BOOLEAN, n_tags INT)`` where
    the flags are the union over every robots meta tag in the document
    (attribute order and quoting vary in the wild; matching is
    case-insensitive) and ``none`` implies both (the standard alias).

    All regex + higher-order array expressions — no UDF, zero shuffle,
    and every construct is valid identically in Java regex and RE2 so
    the DuckDB oracle replays the extraction itself:

    1. collect every ``<meta ...>`` tag;
    2. keep tags whose ``name`` attribute is ``robots`` (either
       quoting, or bare);
    3. take each tag's ``content`` value (double- then single-quoted);
    4. lower-case, split on commas/whitespace, and test token
       membership — substring tests would false-positive on values
       like ``noindexifembargoed``.

    Pages with no robots meta tag return (false, false, 0) — the
    crawl-side default is "allowed", same contract as
    :func:`robots_url_allowed` with no matching rule.
    """
    h = _col(c).cast("string")
    metas = F.regexp_extract_all(h, F.lit(r"(?i)<meta\b[^>]*>"), 0)
    robots = F.filter(
        metas,
        lambda m: m.rlike(r"""(?i)\bname\s*=\s*["']?robots["'\s/>]"""),
    )
    contents = F.transform(
        robots,
        lambda m: F.lower(
            F.coalesce(
                F.nullif(
                    F.regexp_extract(
                        m, r'(?i)\bcontent\s*=\s*"([^"]*)"', 1
                    ),
                    F.lit(""),
                ),
                F.nullif(
                    F.regexp_extract(
                        m, r"(?i)\bcontent\s*=\s*'([^']*)'", 1
                    ),
                    F.lit(""),
                ),
                F.lit(""),
            )
        ),
    )

    def has(token: str) -> Column:
        return F.exists(
            contents,
            lambda s: F.exists(
                F.split(F.trim(s), r"[,\s]+"), lambda t: t == token
            ),
        )

    return F.struct(
        (has("noindex") | has("none")).alias("noindex"),
        (has("nofollow") | has("none")).alias("nofollow"),
        F.size(robots).cast("int").alias("n_tags"),
    )


#: characters whose percent-escapes decode during URL normalization:
#: the RFC 3986 UNRESERVED set (ALPHA / DIGIT / - . _ ~). Everything
#: else (reserved delimiters like %2F, non-ASCII) stays encoded — its
#: meaning can differ between the encoded and decoded forms.
_PCT_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789-._~"
)


def pct_decode_unreserved(c) -> Column:
    """Percent-encoding normalization for URL paths and robots
    patterns (RFC 3986 §2.3 / RFC 9309 §2.2.2): decode the %XX escapes
    of UNRESERVED characters only — ``/a%41b`` and ``/aAb`` are the
    SAME path, and a robots pattern written one way must match a URL
    written the other. Reserved escapes (``%2F``, ``%3F``, ...) are
    left encoded, because decoding them CHANGES meaning (an encoded
    slash is not a path separator). Hex digits match
    case-insensitively (``%41`` and ``%6a``/``%6A`` all decode).

    One chain of literal ``replace`` expressions generated from the
    shared constant — fully codegen, zero shuffle, and the DuckDB
    oracle regenerates the identical chain from the same constant (the
    q182 mojibake-repair pattern). Single pass, not recursive: no
    replacement emits a ``%``, so valid input cannot cascade; nested /
    malformed escapes (``%%341``) are out of contract, and both
    engines run the same chain order so even those agree. Apply it to
    BOTH the rule patterns and the URL paths before
    :func:`robots_url_allowed` when crawl sources mix encodings; it is
    deliberately not baked into the evaluator, whose contract is
    "normalization is the caller's concern".
    """
    out = _col(c).cast("string")
    for ch in _PCT_UNRESERVED:
        esc = f"%{ord(ch):02X}"
        out = F.replace(out, F.lit(esc), F.lit(ch))
        lower_esc = f"%{ord(ch):02x}"
        if lower_esc != esc:
            out = F.replace(out, F.lit(lower_esc), F.lit(ch))
    return out


def crawl_schedule(
    urls,
    delays,
    *,
    host_col: str,
    url_col: str,
    priority_col: "str | None" = None,
    default_delay: float = 1.0,
    n_fetchers: int = 64,
):
    """Politeness-aware fetch schedule — the frontier transform between
    "these URLs are allowed" (:func:`robots_url_allowed`) and "fetch
    them": per host, order by priority and assign each URL a fetch
    slot and an earliest-start offset honoring the host's
    ``Crawl-delay`` (:func:`robots_star_crawl_delay`, or
    ``default_delay`` seconds when the host requests none).

    Returns the ``urls`` columns plus ``(fetcher INT, slot BIGINT,
    eta_ms BIGINT)``:

    - ``fetcher`` — md5-hashed host shard in ``[0, n_fetchers)``;
      host-STICKY, so one worker owns a host and per-host delays are
      enforceable locally with no cross-worker coordination (hashing
      URLs instead would scatter a host over the fleet and make
      politeness a distributed-locking problem);
    - ``slot`` — 0-based position in the host's priority order
      (priority DESC, url ASC; ties and NULL priority break to url);
    - ``eta_ms`` — ``slot * round(crawl_delay * 1000)``: the earliest
      offset (ms, from the host's first fetch) that keeps consecutive
      requests ``crawl_delay`` apart.

    Scale: one host-keyed left join (the delay frame is one row per
    host that REQUESTS a delay — broadcast-sized in practice) and one
    window PARTITIONED by host. A mega-host's window sorts only that
    host's URLs — the same serialization politeness itself imposes;
    the md5 shard spreads distinct hosts uniformly over fetchers.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    d = delays.select(
        F.col(host_col), F.col("crawl_delay").alias("__cd")
    )
    joined = urls.join(d, on=host_col, how="left")
    order = (
        [F.col(priority_col).desc_nulls_last()] if priority_col else []
    ) + [F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(host_col).cast("string")), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(n_fetchers),
    ).cast("int")
    delay_ms = F.round(
        F.coalesce(F.col("__cd"), F.lit(float(default_delay))) * 1000.0, 0
    ).cast("long")
    slot = (F.row_number().over(w) - 1).cast("long")
    return joined.select(
        *urls.columns,
        shard.alias("fetcher"),
        slot.alias("slot"),
        (slot * delay_ms).alias("eta_ms"),
    )


def url_bitext_candidates(
    df,
    *,
    id_col: str,
    url_col: str,
    langs: "tuple[str, ...]" = (
        "en", "fr", "de", "es", "it", "pt", "ru", "zh", "ja", "ar",
    ),
):
    """URL-structure bitext candidate pairs (the CCAligned / ParaCrawl
    first stage, El-Kishky et al. 2020): two pages whose URLs are
    identical except for a language marker are candidate translations
    of each other — ``example.test/en/about`` ↔ ``example.test/fr/
    about``. Emits one row per unordered candidate pair; feed the pair
    list to :func:`..operators.similarity.bitext_margin_pairs` for
    embedding-margin verification (q198) — structure proposes, margin
    disposes.

    Detection (deliberately conservative — a wrong pair costs a wasted
    margin computation, a missed marker just loses recall):

    - FIRST PATH SEGMENT: ``https://h/en/...`` where the lower-cased
      segment is in ``langs``;
    - else SUBDOMAIN LABEL: ``https://en.example.test/...``.

    The pair key (``skeleton``) is the URL with the matched marker
    replaced by ``{lang}``; pages with no marker emit nothing. Returns
    ``(skeleton, lang_a, id_a, lang_b, id_b)`` with ``lang_a <
    lang_b`` (ties on lang broken by id — same-lang duplicates of one
    skeleton are NOT paired; they are dedup's job, not alignment's).

    Scale: one codegen projection per row, then a self-equi-join on
    ``skeleton`` — pairs per skeleton are bounded by |langs|, so the
    join fans out at most |langs|²/2 per page family, never
    corpus-quadratic. The shuffle is one hash partition by skeleton.
    """
    from pyspark.sql import functions as F

    alts = "|".join(langs)
    u = F.col(url_col).cast("string")
    # ...://host/<lang>/rest  (case-insensitive on the marker)
    path_re = rf"(?i)^([a-z][a-z0-9+.-]*://[^/?#]+/)({alts})(/|$|[?#])"
    sub_re = rf"(?i)^([a-z][a-z0-9+.-]*://)({alts})\.([^/?#]+)"
    path_lang = F.lower(F.regexp_extract(u, path_re, 2))
    sub_lang = F.lower(F.regexp_extract(u, sub_re, 2))
    lang = F.when(path_lang != "", path_lang).otherwise(
        F.when(sub_lang != "", sub_lang)
    )
    skeleton = F.when(
        path_lang != "",
        F.regexp_replace(u, path_re, r"$1{lang}$3"),
    ).otherwise(
        F.when(
            sub_lang != "",
            F.regexp_replace(u, sub_re, r"$1{lang}.$3"),
        )
    )
    marked = df.select(
        F.col(id_col).alias("__id"),
        lang.alias("__lang"),
        skeleton.alias("skeleton"),
    ).filter(F.col("__lang").isNotNull())
    a = marked.select(
        "skeleton",
        F.col("__lang").alias("lang_a"),
        F.col("__id").alias("id_a"),
    )
    b = marked.select(
        "skeleton",
        F.col("__lang").alias("lang_b"),
        F.col("__id").alias("id_b"),
    )
    return a.join(b, on="skeleton").filter(
        F.col("lang_a") < F.col("lang_b")
    )


def surt_key(c: "Column | str") -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the URL key
    the CommonCrawl CDX index and every wayback-family archive sort
    and dedup by: ``com,example)/path?query``. Built relationally:

    1. canonicalize first (:func:`canonicalize_url` — lowercase,
       default ports dropped, tracking params dropped, query sorted);
    2. host: leading ``www.`` stripped (the CC indexer's choice),
       labels REVERSED and comma-joined (``news.example.com`` ->
       ``com,example,news``) — so one host's captures, and one
       registered domain's hosts, sort adjacent;
    3. scheme dropped (http/https captures of a page share a key),
       ``)`` separates host from path+query.

    NULL where canonicalization fails (not an absolute URL). Pure
    projection, identically replayable in the oracle.
    """
    canon = canonicalize_url(c)
    hostport = F.regexp_extract(
        canon, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":\d+$", ""), r"^www\.", ""
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rest = F.regexp_extract(
        canon, r"^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1
    )
    return F.when(
        canon.isNotNull(), F.concat(rev, F.lit(")"), rest)
    )


def cdx_latest_captures(
    df: DataFrame,
    url_col: str,
    ts_col: str,
    status_col: str,
    mime_col: str,
    digest_col: str,
    *,
    statuses: "tuple" = ("200",),
    mime_prefix: str = "text/html",
) -> DataFrame:
    """CDX capture selection — the first stage of every CommonCrawl-
    derived corpus (C4 / RefinedWeb / FineWeb start by picking WHICH
    capture of each page to fetch): group captures by SURT key, keep
    fetchable ones (status in ``statuses``, mime starts with
    ``mime_prefix``), elect the LATEST capture per key (ties -> max
    digest, deterministic), and report per-key capture/duplicate
    counts. One row per surviving key: ``(surt, url, ts, digest,
    n_captures, n_ok, n_dup_digest)``.

    ``n_dup_digest`` counts ok-captures sharing the elected digest —
    the revisit-record signal (same content recrawled; an ingest
    pipeline fetches one). Plan: one projection (the SURT key), one
    keyed aggregate with ``max_by`` (map-side combined) + a
    conditional count — no window, no self-join; key cardinality
    bounds the exchange.
    """
    k = surt_key(F.col(url_col))
    ok = F.col(status_col).isin(*statuses) & F.col(mime_col).startswith(
        mime_prefix
    )
    caps = df.select(
        k.alias("__surt"),
        F.col(url_col).alias("__url"),
        F.col(ts_col).cast("long").alias("__ts"),
        F.col(digest_col).alias("__dig"),
        ok.alias("__ok"),
    ).filter(F.col("__surt").isNotNull())
    best = F.max_by(
        F.struct(
            F.col("__url").alias("url"),
            F.col("__ts").alias("ts"),
            F.col("__dig").alias("dig"),
        ),
        F.when(
            F.col("__ok"),
            F.struct(F.col("__ts").alias("t"), F.col("__dig").alias("d")),
        ),
    )
    agg = caps.groupBy("__surt").agg(
        best.alias("__b"),
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.sum(F.col("__ok").cast("long")).alias("n_ok"),
        F.collect_list(
            F.when(F.col("__ok"), F.col("__dig"))
        ).alias("__digs"),
    )
    return agg.filter(F.col("n_ok") > 0).select(
        F.col("__surt").alias("surt"),
        F.col("__b.url").alias("url"),
        F.col("__b.ts").alias("ts"),
        F.col("__b.dig").alias("digest"),
        "n_captures",
        "n_ok",
        F.size(
            F.filter(F.col("__digs"), lambda d: d == F.col("__b.dig"))
        ).cast("long").alias("n_dup_digest"),
    )

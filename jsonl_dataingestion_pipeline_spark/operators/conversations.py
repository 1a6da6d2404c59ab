"""Chat / SFT conversation operators — validation, stats, templating.

Instruction-tuning corpora are lists of ``{role, content}`` turns, not
flat documents, and the curation pass every SFT pipeline runs is:

  1. validate the turn STRUCTURE (opens with a user turn, roles strictly
     alternate, no empty turn, closes with an assistant turn — a
     truncated or role-corrupted transcript silently teaches the model
     to speak out of turn);
  2. measure turn-level stats (turn count, per-role volume) for mixture
     accounting;
  3. render the surviving transcripts through the chat template into the
     single training string the tokenizer actually sees.

All three are pure Column expressions over an
``array<struct<role,content>>`` column — Spark's higher-order functions
(``forall`` / ``zip_with`` / ``aggregate`` / ``slice``) evaluate
JVM-side inside whole-stage codegen, so the whole pass is a zero-shuffle
Project on top of the scan: embarrassingly parallel at 100 TB, filters
and column pruning push straight through it.

Reference parity: the reference pipeline has no conversation surface
(its rows are structured shipment records); this module is part of the
LLM-curation extension alongside dedup / quality / mixture.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]

#: ChatML-style template markers used by the DEFAULT :class:`ChatTemplate`.
TURN_OPEN = "<|im_start|>"
TURN_CLOSE = "<|im_end|>\n"


class TurnStyle(NamedTuple):
    """How one turn renders: ``open`` [+ role + ``sep`` when
    ``show_role``] + content + ``close``. Templates that never print
    the role (Llama-chat's ``[INST] … [/INST]``) set
    ``show_role=False``."""

    open: str
    sep: str = "\n"
    close: str = ""
    show_role: bool = True


class ChatTemplate:
    """A chat template: a default :class:`TurnStyle` plus optional
    per-role overrides (VERDICT r8 item 7 — real pipelines carry
    per-dataset templates: ChatML, Llama-chat, Gemma, plain
    ``### User:``). The no-argument constructor IS ChatML, so every
    existing caller/oracle is unchanged.

    Role resolution compiles to a bounded CASE over the override
    literals with the default as the fallback — unknown roles always
    render; everything stays a zero-shuffle codegen projection.
    """

    __slots__ = ("default", "per_role")

    def __init__(
        self,
        default: TurnStyle = TurnStyle(TURN_OPEN, "\n", TURN_CLOSE, True),
        per_role: "Optional[Mapping[str, TurnStyle]]" = None,
    ) -> None:
        self.default = default
        self.per_role = dict(per_role or {})

    def _resolve(self, role: Column, build) -> Column:
        """CASE over the per-role overrides; ``build(style)`` makes the
        branch expression."""
        expr = build(self.default)
        for r, st in sorted(self.per_role.items()):
            expr = F.when(role == F.lit(r), build(st)).otherwise(expr)
        return expr

    def prefix(self, t: Column) -> Column:
        """String before the turn's content."""
        return self._resolve(
            t["role"],
            lambda st: F.concat(F.lit(st.open), t["role"], F.lit(st.sep))
            if st.show_role
            else F.lit(st.open),
        )

    def close(self, t: Column) -> Column:
        """String after the turn's content."""
        return self._resolve(t["role"], lambda st: F.lit(st.close))

    def prefix_bytes(self, t: Column) -> Column:
        """Byte length of :meth:`prefix` without building the string."""

        def one(st: TurnStyle) -> Column:
            base = F.lit(len(st.open.encode())).cast("long")
            if st.show_role:
                return (
                    base
                    + F.octet_length(t["role"]).cast("long")
                    + F.lit(len(st.sep.encode())).cast("long")
                )
            return base

        return self._resolve(t["role"], one)

    def close_bytes(self, t: Column) -> Column:
        return self._resolve(
            t["role"],
            lambda st: F.lit(len(st.close.encode())).cast("long"),
        )


#: the ChatML default every existing caller renders through
CHATML = ChatTemplate()


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def starts_with_user(conv: ColumnOrName) -> Column:
    """True when the first turn's role is ``user``."""
    return F.element_at(_col(conv), 1)["role"] == F.lit("user")


def ends_with_assistant(conv: ColumnOrName) -> Column:
    """True when the last turn's role is ``assistant``."""
    return F.element_at(_col(conv), -1)["role"] == F.lit("assistant")


def roles_alternate(conv: ColumnOrName) -> Column:
    """True when no two ADJACENT turns share a role.

    ``zip_with`` over the conversation and its shift-by-one — both
    slices have length n-1, so no NULL padding enters the ``forall``.
    Single-turn (and empty — the slice length clamps at 0) convs
    alternate vacuously.
    """
    c = _col(conv)
    n = F.size(c)
    ln = F.greatest(n - 1, F.lit(0))  # size 0 would pass length -1
    heads = F.slice(c, 1, ln)
    tails = F.slice(c, 2, ln)
    pairs = F.zip_with(heads, tails, lambda a, b: a["role"] != b["role"])
    return F.forall(pairs, lambda x: x)


def no_empty_turns(conv: ColumnOrName) -> Column:
    """True when every turn's content is non-NULL and non-empty."""
    return F.forall(
        _col(conv),
        lambda t: t["content"].isNotNull()
        & (F.length(t["content"]) > 0),
    )


def conversation_valid(conv: ColumnOrName) -> Column:
    """The conjunction of all five structural rules: non-empty conv,
    opens user, alternates, no empty turn, closes assistant."""
    c = _col(conv)
    return (
        (F.size(c) > 0)
        & starts_with_user(c)
        & roles_alternate(c)
        & no_empty_turns(c)
        & ends_with_assistant(c)
    )


def turn_stats(conv: ColumnOrName, role: str) -> Column:
    """Total content characters across turns with the given role —
    one ``aggregate`` fold, no explode, no shuffle.

    A NULL content propagates (the total is NULL) — standard SQL sum
    semantics; :func:`no_empty_turns` flags those turns, validate
    before aggregating. Same contract for :func:`render_chat` (a NULL
    turn renders the whole string NULL)."""
    return F.aggregate(
        _col(conv),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(
            t["role"] == F.lit(role), F.length(t["content"]).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )


def render_chat(
    conv: ColumnOrName, template: ChatTemplate = CHATML
) -> Column:
    """Render the conversation through ``template`` into the single
    training string; the default is ChatML:

        <|im_start|>{role}\\n{content}<|im_end|>\\n   per turn.

    One ``aggregate`` fold building the string JVM-side; the training
    tokenizer's input is exactly this column.
    """
    return F.aggregate(
        _col(conv),
        F.lit(""),
        lambda acc, t: F.concat(
            acc, template.prefix(t), t["content"], template.close(t)
        ),
    )


def render_bytes(
    conv: ColumnOrName, template: ChatTemplate = CHATML
) -> Column:
    """Byte length of :func:`render_chat`'s output WITHOUT building the
    string: each turn occupies ``prefix_bytes + octet(content) +
    close_bytes``, so the length is one integer fold — O(#turns)
    instead of O(rendered bytes)."""
    return F.aggregate(
        _col(conv),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + template.prefix_bytes(t)
        + F.octet_length(t["content"]).cast("long")
        + template.close_bytes(t),
    )


def loss_mask_spans(
    conv: ColumnOrName,
    template: ChatTemplate = CHATML,
    *,
    unmask_role: str = "assistant",
) -> Column:
    """Byte spans ``[s, e)`` of ``unmask_role`` content inside the
    :func:`render_chat` string (same ``template``) — the positions an
    SFT trainer unmasks (loss on assistant tokens only, the standard
    instruction-tuning recipe). Returns ``array<struct<s,e>>`` in turn
    order.

    One ``aggregate`` fold threads the byte offset through the turns
    (offsets are ``octet_length`` — byte-true for any unicode content;
    the block arithmetic is template-length-driven, so any
    :class:`ChatTemplate` works), so the whole computation stays a
    zero-shuffle projection beside the render itself; a downstream
    packer adds each sequence's global offset (q143's two-phase prefix
    sum) to shift the spans into the packed buffer.

    A conversation containing any NULL role/content returns NULL
    (explicitly — a half-built span struct with a NULL end would
    mis-slice downstream); validate with :func:`no_empty_turns` first.
    """
    c = _col(conv)
    all_present = F.forall(
        c,
        lambda t: t["role"].isNotNull() & t["content"].isNotNull(),
    )

    def _step(acc: Column, t: Column) -> Column:
        start = acc["off"] + template.prefix_bytes(t)
        end = start + F.octet_length(t["content"]).cast("long")
        span = F.struct(start.alias("s"), end.alias("e"))
        spans = F.when(
            t["role"] == F.lit(unmask_role),
            F.concat(acc["spans"], F.array(span)),
        ).otherwise(acc["spans"])
        return F.struct(
            (end + template.close_bytes(t)).alias("off"),
            spans.alias("spans"),
        )

    init = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array().cast("array<struct<s: bigint, e: bigint>>").alias(
            "spans"
        ),
    )
    spans = F.aggregate(c, init, _step, lambda acc: acc["spans"])
    return F.when(all_present, spans).otherwise(
        F.lit(None).cast("array<struct<s: bigint, e: bigint>>")
    )


#: Refusal openers swept from distilled SFT sets before training
#: (the Alpaca-cleaned / WizardLM curation lists — a distilled
#: assistant turn that OPENS with one of these is a refusal or a
#: disclaimer, not a demonstration). Prefix-matched on the
#: lower-cased, left-trimmed content.
REFUSAL_MARKERS: tuple = (
    "i'm sorry",
    "i am sorry",
    "i apologize",
    "i cannot",
    "i can't",
    "i am unable",
    "i'm unable",
    "as an ai",
    "as a language model",
)


def refusal_flag(conv: ColumnOrName) -> Column:
    """True when ANY assistant turn opens with a refusal/disclaimer
    marker (:data:`REFUSAL_MARKERS`). One ``exists`` fold — no
    explode, no shuffle; the marker list is a compile-time constant
    folded into the predicate (and the oracle generates its OR chain
    from the same Python constant, the q182 pattern)."""

    def _opens(t: Column) -> Column:
        low = F.lower(F.ltrim(t["content"]))
        hit = F.lit(False)
        for m in REFUSAL_MARKERS:
            hit = hit | low.startswith(F.lit(m))
        return (t["role"] == F.lit("assistant")) & hit

    return F.exists(_col(conv), _opens)


def response_truncated(conv: ColumnOrName) -> Column:
    """True when the FINAL assistant turn does not end in terminal
    punctuation (``.``, ``!``, ``?``) after stripping trailing
    whitespace, quotes, brackets, and backticks — the mid-sentence-cut
    heuristic distilled-data curation uses to drop responses clipped
    by a generation length limit. NULL when there is no assistant
    turn. Pure projection."""
    c = _col(conv)
    assts = F.filter(c, lambda t: t["role"] == F.lit("assistant"))
    # ANSI-safe: element_at(-1) on an empty array throws — gate on size
    last_asst = F.when(F.size(assts) > 0, F.element_at(assts, -1))
    stripped = F.regexp_replace(
        last_asst["content"], "[\\s\"'`\\)\\]]+$", ""
    )
    return ~F.substring(stripped, -1, 1).isin(".", "!", "?")


def sft_quality(
    conv: ColumnOrName,
    *,
    min_response_chars: int = 16,
    scale: int = 6,
) -> Column:
    """SFT curation decision struct ``(user_chars, asst_chars,
    ratio_u, refusal, truncated, short, keep)`` over one conversation
    column — the instruction-data quality sweep (refusals out,
    clipped responses out, trivially short responses out) applied
    after structural validation (:func:`conversation_valid`).

    ``ratio_u`` = assistant/user char ratio in integer micro-units
    (exact floor division via the subtract-remainder identity
    ``(n - n mod d) / d`` — every intermediate is an exact-in-double
    integer for conversations up to ~10^7 chars; 0 when the user side
    is empty) — a report column, not a decision. ``keep`` =
    structurally valid AND no refusal AND not truncated AND
    ``asst_chars >= min_response_chars`` — every decision an
    integer/boolean predicate. Zero-shuffle projection."""
    c = _col(conv)
    u = 10 ** scale
    user_c = turn_stats(c, "user")
    asst_c = turn_stats(c, "assistant")
    num = asst_c * F.lit(u).cast("long")
    ratio_u = (
        F.when(user_c > 0, ((num - F.pmod(num, user_c)) / user_c))
        .otherwise(F.lit(0))
        .cast("long")
    )
    refusal = refusal_flag(c)
    trunc = response_truncated(c)
    short = asst_c < min_response_chars
    keep = (
        conversation_valid(c)
        & ~refusal
        & ~F.coalesce(trunc, F.lit(True))
        & ~short
    )
    return F.struct(
        user_c.alias("user_chars"),
        asst_c.alias("asst_chars"),
        ratio_u.alias("ratio_u"),
        refusal.alias("refusal"),
        F.coalesce(trunc, F.lit(True)).alias("truncated"),
        short.alias("short"),
        keep.alias("keep"),
    )

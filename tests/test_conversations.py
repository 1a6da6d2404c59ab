"""Chat/SFT conversation kernels (operators/conversations.py):
structural validation rules, per-role stats, and the ChatML render —
each rule exercised in isolation on handcrafted transcripts."""
from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators import conversations as cv

_SCHEMA = "id long, conv array<struct<role: string, content: string>>"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _flags(spark, conv):
    df = _df(spark, [(0, conv)])
    return df.select(
        cv.starts_with_user("conv").alias("su"),
        cv.ends_with_assistant("conv").alias("ea"),
        cv.roles_alternate("conv").alias("alt"),
        cv.no_empty_turns("conv").alias("ne"),
        cv.conversation_valid("conv").alias("ok"),
    ).collect()[0]


def test_valid_two_turn(spark):
    f = _flags(spark, [("user", "hi"), ("assistant", "hello")])
    assert (f.su, f.ea, f.alt, f.ne, f.ok) == (
        True, True, True, True, True,
    )


def test_valid_with_longer_alternation(spark):
    f = _flags(
        spark,
        [("user", "a"), ("assistant", "b"), ("user", "c"),
         ("assistant", "d")],
    )
    assert f.ok


def test_role_repeat_breaks_alternation_only(spark):
    f = _flags(
        spark,
        [("user", "a"), ("assistant", "b"), ("assistant", "c"),
         ("assistant", "d")],
    )
    assert not f.alt and f.su and f.ea and f.ne and not f.ok


def test_truncated_transcript_fails_ends_assistant(spark):
    f = _flags(spark, [("user", "a"), ("assistant", "b"), ("user", "c")])
    assert not f.ea and f.alt and not f.ok


def test_empty_content_fails_no_empty(spark):
    f = _flags(spark, [("user", "a"), ("assistant", "")])
    assert not f.ne and not f.ok


def test_null_content_fails_no_empty(spark):
    f = _flags(spark, [("user", "a"), ("assistant", None)])
    assert not f.ne and not f.ok


def test_single_user_turn_alternates_vacuously_but_invalid(spark):
    f = _flags(spark, [("user", "a")])
    assert f.alt and f.su and not f.ea and not f.ok


def test_system_opening_fails_starts_user(spark):
    f = _flags(
        spark,
        [("system", "be terse"), ("user", "a"), ("assistant", "b")],
    )
    assert not f.su and not f.ok


def test_turn_stats_counts_per_role_chars(spark):
    df = _df(
        spark,
        [(0, [("user", "abcd"), ("assistant", "xy"), ("user", "z")])],
    )
    r = df.select(
        cv.turn_stats("conv", "user").alias("u"),
        cv.turn_stats("conv", "assistant").alias("a"),
    ).collect()[0]
    assert (r.u, r.a) == (5, 2)


def test_render_chat_exact_template(spark):
    df = _df(spark, [(0, [("user", "hi"), ("assistant", "yo")])])
    out = df.select(cv.render_chat("conv").alias("r")).collect()[0].r
    assert out == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nyo<|im_end|>\n"
    )


def test_whole_pass_is_zero_shuffle(spark):
    """Validation + stats + render over a conversation column must stay
    a pure Project on the scan — no Exchange anywhere."""
    df = _df(spark, [(0, [("user", "a"), ("assistant", "b")])])
    out = df.select(
        cv.conversation_valid("conv").alias("ok"),
        cv.turn_stats("conv", "user").alias("u"),
        cv.render_chat("conv").alias("r"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_conversation_is_invalid_not_a_crash(spark):
    """size-0 arrays flow through every rule STANDALONE (the alternation
    slice length is clamped at 0 — review finding: unclamped it passed
    -1 and raised) and come out chat_valid = false."""
    df = _df(spark, [(0, [])])
    r = df.select(
        cv.conversation_valid("conv").alias("ok"),
        cv.roles_alternate("conv").alias("alt"),
        cv.turn_stats("conv", "user").alias("u"),
    ).collect()[0]
    assert r.ok is False
    assert r.alt is True       # vacuous
    assert r.u == 0


class TestLossMaskSpans:
    def _spans(self, spark, conv):
        df = _df(spark, [(0, conv)])
        return df.select(
            cv.loss_mask_spans("conv").alias("sp"),
            cv.render_chat("conv").alias("r"),
        ).collect()[0]

    def test_hand_computed_offsets(self, spark):
        r = self._spans(
            spark, [("user", "hi"), ("assistant", "yo ok")]
        )
        # turn1 block: 12 + 4 + 1 + 2 + 11 = 30
        # span starts 30 + 12 + 9 + 1 = 52, ends 52 + 5
        assert [(x.s, x.e) for x in r.sp] == [(52, 57)]
        # the span indexes the REAL rendered string
        assert r.r.encode()[52:57] == b"yo ok"

    def test_multiple_assistant_turns(self, spark):
        r = self._spans(
            spark,
            [("user", "a"), ("assistant", "bb"), ("user", "c"),
             ("assistant", "dd")],
        )
        assert len(r.sp) == 2
        for x in r.sp:
            assert r.r.encode()[x.s:x.e] in (b"bb", b"dd")

    def test_no_assistant_turns_empty(self, spark):
        r = self._spans(spark, [("user", "a"), ("user", "b")])
        assert list(r.sp) == []

    def test_unicode_offsets_are_byte_true(self, spark):
        # 'café' is 5 bytes utf-8; offsets must be octet-based
        r = self._spans(
            spark, [("user", "café"), ("assistant", "naïve")]
        )
        x = r.sp[0]
        assert r.r.encode()[x.s:x.e].decode() == "naïve"


def test_spans_shift_into_packed_buffer(spark):
    """The composition the loss_mask_spans docstring promises: add each
    sequence's global offset (pack_sequences' tok_start over the render
    byte length) to the spans, and they index the CONCATENATED packed
    buffer exactly."""
    from pyspark.sql import functions as F

    from jsonl_dataingestion_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        (1, [("user", "aa"), ("assistant", "bb cc")]),
        (2, [("user", "d"), ("assistant", "ee"), ("user", "f"),
             ("assistant", "gg hh")]),
        (3, [("user", "iii"), ("assistant", "jj")]),
    ]
    df = _df(spark, rows)
    rendered = df.select(
        "id",
        cv.render_chat("conv").alias("r"),
        cv.loss_mask_spans("conv").alias("sp"),
        F.octet_length(cv.render_chat("conv")).alias("nb"),
    )
    coords = pack_sequences(rendered, "nb", "id", seq_len=1 << 20)
    j = rendered.join(coords.select("id", "tok_start"), on="id")
    out = j.select("id", "r", "sp", "tok_start").collect()
    buf = b"".join(
        r.r.encode() for r in sorted(out, key=lambda x: x.id)
    )
    checked = 0
    for r in out:
        for x in r.sp:
            lo, hi = x.s + r.tok_start, x.e + r.tok_start
            assert buf[lo:hi].decode() == r.r[x.s:x.e]
            checked += 1
    assert checked == 4


def test_null_content_spans_are_null_not_malformed(spark):
    """Review finding: a NULL content used to emit a half-built span
    struct (s, NULL). The operator now returns NULL for the whole
    conversation; turn_stats/render propagate NULL per SQL semantics."""
    from pyspark.sql import functions as F

    df = _df(spark, [(0, [("user", "ab"), ("assistant", None)])])
    r = df.select(
        cv.loss_mask_spans("conv").alias("sp"),
        cv.render_chat("conv").alias("r"),
        cv.turn_stats("conv", "assistant").alias("a"),
        cv.no_empty_turns("conv").alias("ne"),
    ).collect()[0]
    assert r.sp is None and r.r is None and r.a is None
    assert r.ne is False       # the validator flags it first


def test_render_bytes_matches_real_render_length(spark):
    """render_bytes (the O(#turns) integer fold) must equal the byte
    length of the actual rendered string, including multibyte."""
    from pyspark.sql import functions as F

    df = _df(
        spark,
        [(0, [("user", "café"), ("assistant", "naïve x")]),
         (1, [("user", "a"), ("assistant", "bb"), ("user", "c")])],
    )
    rows = df.select(
        cv.render_bytes("conv").alias("nb"),
        F.octet_length(cv.render_chat("conv")).alias("real"),
    ).collect()
    for r in rows:
        assert r.nb == r.real


def test_turn_stats_counts_characters_not_bytes(spark):
    """turn_stats' contract is CHARACTERS (F.length); 'café' is 4."""
    df = _df(spark, [(0, [("user", "café"), ("assistant", "é")])])
    r = df.select(
        cv.turn_stats("conv", "user").alias("u"),
        cv.turn_stats("conv", "assistant").alias("a"),
    ).collect()[0]
    assert (r.u, r.a) == (4, 1)


class TestAlternateTemplates:
    """VERDICT r8 item 7: the render/bytes/span trio is template-
    parameterized (ChatML remains the no-argument default)."""

    def _llama(self):
        # Llama-chat-style: the role NAME never prints; user turns wrap
        # in [INST] ... [/INST], assistant turns close with </s>
        return cv.ChatTemplate(
            default=cv.TurnStyle("", "", "", show_role=False),
            per_role={
                "user": cv.TurnStyle(
                    "[INST] ", "", " [/INST] ", show_role=False
                ),
                "assistant": cv.TurnStyle("", "", " </s>", show_role=False),
            },
        )

    def test_default_is_chatml_bit_for_bit(self, spark):
        conv = [("user", "hi"), ("assistant", "hello")]
        df = _df(spark, [(0, conv)])
        r = df.select(
            cv.render_chat("conv").alias("d"),
            cv.render_chat("conv", cv.CHATML).alias("e"),
        ).collect()[0]
        assert r.d == r.e == (
            "<|im_start|>user\nhi<|im_end|>\n"
            "<|im_start|>assistant\nhello<|im_end|>\n"
        )

    def test_llama_style_render_and_spans_agree(self, spark):
        conv = [
            ("user", "héllo?"),  # unicode: é is 2 bytes
            ("assistant", "hi"),
            ("user", "more"),
            ("assistant", "done"),
        ]
        tpl = self._llama()
        df = _df(spark, [(0, conv)])
        r = df.select(
            cv.render_chat("conv", tpl).alias("s"),
            cv.render_bytes("conv", tpl).alias("nb"),
            cv.loss_mask_spans("conv", tpl).alias("spans"),
        ).collect()[0]
        assert r.s == (
            "[INST] héllo? [/INST] hi </s>"
            "[INST] more [/INST] done </s>"
        )
        raw = r.s.encode()
        assert r.nb == len(raw)
        # the spans must slice the RENDERED BYTES back to exactly the
        # assistant contents, in turn order
        assert [raw[sp.s: sp.e].decode() for sp in r.spans] == [
            "hi", "done",
        ]

    def test_plain_hash_template_with_role_names(self, spark):
        # "### user:\n...\n\n" style — role name printed, custom sep
        tpl = cv.ChatTemplate(default=cv.TurnStyle("### ", ":\n", "\n\n"))
        conv = [("user", "q"), ("assistant", "a")]
        df = _df(spark, [(0, conv)])
        r = df.select(
            cv.render_chat("conv", tpl).alias("s"),
            cv.render_bytes("conv", tpl).alias("nb"),
            cv.loss_mask_spans("conv", tpl).alias("spans"),
        ).collect()[0]
        assert r.s == "### user:\nq\n\n### assistant:\na\n\n"
        raw = r.s.encode()
        assert r.nb == len(raw)
        assert [raw[sp.s: sp.e].decode() for sp in r.spans] == ["a"]

    def test_unmask_role_parameter(self, spark):
        conv = [("user", "q"), ("assistant", "a")]
        df = _df(spark, [(0, conv)])
        r = df.select(
            cv.loss_mask_spans("conv", unmask_role="user").alias("spans"),
            cv.render_chat("conv").alias("s"),
        ).collect()[0]
        raw = r.s.encode()
        assert [raw[sp.s: sp.e].decode() for sp in r.spans] == ["q"]


class TestSftQuality:
    def _q(self, spark, conv, **kw):
        df = _df(spark, [(0, conv)])
        return df.select(
            cv.sft_quality("conv", **kw).alias("q")
        ).collect()[0].q

    def test_clean_conversation_keeps(self, spark):
        q = self._q(spark, [
            ("user", "explain monads please"),
            ("assistant", "A monad is a structure with unit and bind."),
        ])
        assert not q.refusal and not q.truncated and not q.short
        assert q.keep
        assert q.user_chars == len("explain monads please")
        assert q.ratio_u == (q.asst_chars * 10**6) // q.user_chars

    def test_refusal_opener_drops(self, spark):
        for opener in ("I'm sorry, but no.", "As an AI I decline.",
                       "I cannot assist with that request today."):
            q = self._q(spark, [
                ("user", "do the thing for me now"),
                ("assistant", opener),
            ])
            assert q.refusal and not q.keep, opener

    def test_refusal_is_prefix_only(self, spark):
        # a refusal marker mid-sentence is NOT a refusal opener
        q = self._q(spark, [
            ("user", "can you ever refuse a task?"),
            ("assistant", "Sometimes I cannot comply, but here: done."),
        ])
        assert not q.refusal and q.keep

    def test_truncated_response_drops(self, spark):
        q = self._q(spark, [
            ("user", "write me a very long story"),
            ("assistant", "Once upon a time there was a"),
        ])
        assert q.truncated and not q.keep

    def test_terminal_punct_through_trailing_quotes(self, spark):
        q = self._q(spark, [
            ("user", "quote something nice for me"),
            ("assistant", 'He said "it ends well." '),
        ])
        assert not q.truncated and q.keep

    def test_short_response_drops(self, spark):
        q = self._q(spark, [
            ("user", "prove the riemann hypothesis"),
            ("assistant", "No idea."),
        ])
        assert q.short and not q.keep

    def test_structurally_invalid_never_keeps(self, spark):
        # assistant-first breaks starts_with_user -> keep false even
        # though every content filter passes
        q = self._q(spark, [
            ("assistant", "Here is a complete unprompted answer."),
            ("user", "thanks a lot for the help!"),
        ])
        assert not q.keep

    def test_no_assistant_turn_counts_truncated(self, spark):
        q = self._q(spark, [("user", "hello there friend.")])
        assert q.truncated and not q.keep and q.asst_chars == 0

    def test_zero_user_chars_ratio_zero(self, spark):
        q = self._q(spark, [
            ("assistant", "Unprompted but punctuated answer."),
        ])
        assert q.ratio_u == 0

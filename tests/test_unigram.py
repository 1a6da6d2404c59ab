"""Unigram-LM tokenizer (operators/unigram.py): Viterbi semantics,
training vs a pure-Python reference, coverage, and layout
independence — the BPE differential-test contract applied to the
second trained tokenizer."""
from __future__ import annotations

import collections
import math

from jsonl_dataingestion_pipeline_spark.operators.unigram import (
    unigram_segment_counts,
    unigram_train,
    viterbi_segment,
)


def test_viterbi_prefers_probable_long_pieces():
    logp = {"un": -1.0, "related": -1.0, "u": -8.0, "n": -8.0,
            "r": -8.0, "e": -8.0, "l": -8.0, "a": -8.0, "t": -8.0,
            "d": -8.0, "unrelated": -1.5}
    assert viterbi_segment("unrelated", logp, 9) == ["unrelated"]
    del logp["unrelated"]
    assert viterbi_segment("unrelated", logp, 9) == ["un", "related"]


def test_viterbi_tiebreak_fewer_then_lex():
    # "abab": {"ab": p} vs {"a","b"} chains — equal total logp forced
    logp = {"ab": -2.0, "a": -1.0, "b": -1.0}
    # ab+ab = -4; a+b+a+b = -4 too -> fewer pieces wins
    assert viterbi_segment("abab", logp, 2) == ["ab", "ab"]


def test_viterbi_unknown_chars_fall_back_with_penalty():
    logp = {"a": -1.0}
    assert viterbi_segment("axa", logp, 3) == ["a", "x", "a"]


def _py_reference_train(word_counts, vocab_size, seed_size,
                        max_piece_len, iterations):
    """Independent driver-side replay of the documented algorithm."""
    seeds = collections.Counter()
    for w, c in word_counts.items():
        for ln in range(1, max_piece_len + 1):
            for i in range(0, len(w) - ln + 1):
                seeds[w[i:i + ln]] += c
    chars = {p: n for p, n in seeds.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in seeds.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[: max(seed_size - len(chars), 0)]
    counts = dict(chars)
    counts.update(dict(multi))

    def to_logp(cnts):
        total = float(sum(cnts.values())) or 1.0
        return {p: math.log(c / total) for p, c in cnts.items() if c > 0}

    logp = to_logp(counts)
    for _ in range(iterations):
        used = collections.Counter()
        for w, c in word_counts.items():
            for piece in viterbi_segment(w, logp, max_piece_len):
                used[piece] += c
        counts = {
            p: used.get(p, 0) for p in counts
            if len(p) == 1 or p in used
        }
        logp = to_logp(counts)
        floor = min(logp.values(), default=0.0) - 10.0
        for ch in chars:
            logp.setdefault(ch, floor)
    multi_sorted = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1 and c > 0),
        key=lambda t: (-t[1], t[0]),
    )
    keep = list(chars) + [p for p, _ in multi_sorted]
    return keep[:vocab_size] if len(keep) > vocab_size else keep


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a mat and a hat",
    "the hat sat flat on the mat",
    "cats in hats sat on flat mats",
]


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    model = unigram_train(
        df, "text", vocab_size=60, seed_size=200,
        max_piece_len=4, iterations=2,
    )
    got = {p for p, _ in model}

    wc = collections.Counter(
        w for t in CORPUS for w in t.lower().split()
    )
    ref = set(_py_reference_train(wc, 60, 200, 4, 2))
    assert got == ref
    # log-probs normalize: sum of probs over the vocab <= 1 + eps
    assert abs(sum(math.exp(lp) for _, lp in model) - 1.0) < 1e-6


def test_train_layout_independent(spark):
    rows = [(t,) for t in CORPUS * 10]
    df = spark.createDataFrame(rows, "text string")
    m1 = unigram_train(
        df.repartition(1), "text", vocab_size=50, seed_size=150,
        max_piece_len=4, iterations=2,
    )
    m2 = unigram_train(
        df.repartition(16), "text", vocab_size=50, seed_size=150,
        max_piece_len=4, iterations=2,
    )
    assert m1 == m2


def test_segment_counts_cover_unseen_text(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    model = unigram_train(
        df, "text", vocab_size=60, seed_size=200,
        max_piece_len=4, iterations=2,
    )
    probe = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zzz qqq")], "id long, text string"
    )
    out = {
        r.id: r.unigram_tokens
        for r in unigram_segment_counts(probe, "text", model).collect()
    }
    logp = dict(model)
    expect1 = sum(
        len(viterbi_segment(w, logp, 8)) for w in "the cat sat".split()
    )
    assert out[1] == expect1
    assert out[2] >= 6  # unseen chars fall back to per-char pieces


# ---------------------------------------------------------------------------
# unigram_census (round 8): fixed-model Viterbi census, oracle-gated (q179)
# ---------------------------------------------------------------------------
def test_unigram_census_matches_bruteforce(spark):
    """Census vs an INDEPENDENT exhaustive enumerator: for each word,
    enumerate every segmentation into model pieces / single-char UNKs
    and pick by (score desc, n_pieces asc, piece-list lex) — the
    contract viterbi_segment implements with a DP."""
    from itertools import count as _count

    from jsonl_dataingestion_pipeline_spark.operators.unigram import (
        unigram_census,
    )

    model = {
        **{c: -3100 for c in "abcdefghijklmnopqrstuvwxyz"},
        "th": -4000, "the": -4500, "st": -6200, "an": -4000,
        "and": -5100, "ing": -5000,
    }
    UNK = -(10**9)

    def brute(word):
        outs = []

        def rec(i, pieces, score):
            if i == len(word):
                outs.append((score, len(pieces), list(pieces)))
                return
            for ln in (1, 2, 3):
                if i + ln > len(word):
                    break
                p = word[i : i + ln]
                if p in model:
                    pieces.append(p)
                    rec(i + ln, pieces, score + model[p])
                    pieces.pop()
                elif ln == 1:
                    pieces.append(p)
                    rec(i + 1, pieces, score + UNK)
                    pieces.pop()

        rec(0, [], 0)
        return min(outs, key=lambda t: (-t[0], t[1], t[2]))

    texts = [
        (0, "the thing stands"),
        (1, "and standing Xq9 st"),
        (2, "   "),
        (3, "supercalifragilistic tiny"),  # first word > 12 chars
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in unigram_census(
            df, "text", "doc_id", model, max_word_len=12
        ).collect()
    }
    import re

    for doc_id, t in texts:
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]
        short = [w for w in words if len(w) <= 12]
        best = [brute(w) for w in short]
        r = got[doc_id]
        assert r.ug_n_words == len(short), r
        assert r.ug_n_long == len(words) - len(short), r
        assert r.ug_n_pieces == sum(b[1] for b in best), (r, best)
        assert r.ug_score_sum == sum(b[0] for b in best), (r, best)


def test_unigram_census_guards(spark):
    from jsonl_dataingestion_pipeline_spark.operators.unigram import (
        unigram_census,
    )
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="integers"):
        unigram_census(df, "text", "doc_id", {"a": -0.5})
    with pytest.raises(ValueError, match="unk_cost"):
        unigram_census(df, "text", "doc_id", {"a": -1}, unk_cost=-5)

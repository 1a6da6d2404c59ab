"""Unit tests for the column kernels (SURVEY.md §2.3)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.functions import (
    clean_string,
    coerce_boolean,
    ensure_str_id,
    extract_consignee_code,
    extract_consignee_name,
    parse_date_dayfirst,
    parse_multi_dates,
    split_multi_ids,
)
from jsonl_dataingestion_pipeline_spark.functions.dates import (
    fmt_display,
    mmmyy,
    month_group,
    month_tag,
)


def one(spark, value, expr_fn, typ="string"):
    df = spark.createDataFrame([(value,)], schema=f"v {typ}")
    return df.select(expr_fn(F.col("v")).alias("r")).first()["r"]


# --- F1 clean_string -------------------------------------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("  x  ", "x"),
        ("()", ""),
        ("nan", None),
        ("NaN", None),
        (None, None),
        ("NAN", "NAN"),  # only exact 'nan'/'NaN' sentinels are nulled
    ],
)
def test_clean_string(spark, raw, expected):
    assert one(spark, raw, clean_string) == expected


# --- F2 ensure_str_id ------------------------------------------------------
def test_ensure_str_id_strips_quotes(spark):
    assert one(spark, 'AB"C"123', ensure_str_id) == "ABC123"


# --- F3 boolean coercion ---------------------------------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("Y", True), ("yes", True), ("TRUE", True), ("1", True),
        ("n", False), ("NO", False), ("false", False), ("0", False),
        ("maybe", None), ("", None), (None, None), (" y ", True),
    ],
)
def test_coerce_boolean(spark, raw, expected):
    assert one(spark, raw, coerce_boolean) is expected


# --- F4 day-first date parse -----------------------------------------------
@pytest.mark.parametrize(
    "raw,expected",
    [
        ("05/01/2024", datetime.date(2024, 1, 5)),   # day-first preferred
        ("5/1/2024", datetime.date(2024, 1, 5)),
        # pandas dayfirst=True reads yyyy-a-b as yyyy-DAY-month (!) and
        # falls back to ISO only when that is impossible — parity kept:
        ("2024-01-05", datetime.date(2024, 5, 1)),
        ("1995-01-31", datetime.date(1995, 1, 31)),  # ISO fallback
        ("01/25/2024", datetime.date(2024, 1, 25)),  # month-first fallback
        ("31-12-2023", datetime.date(2023, 12, 31)),
        ("2024-01-05 13:45:00", datetime.date(2024, 5, 1)),
        ("5 Jan 2024", datetime.date(2024, 1, 5)),
        ("garbage", None),
        ("", None),
        (None, None),
    ],
)
def test_parse_date_dayfirst(spark, raw, expected):
    assert one(spark, raw, parse_date_dayfirst) == expected


# --- F5 multi-date ---------------------------------------------------------
def test_parse_multi_dates(spark):
    got = one(spark, "01/01/2024, bad, 02/01/2024", parse_multi_dates)
    assert got == [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]
    assert one(spark, "bad, worse", parse_multi_dates) is None
    assert one(spark, None, parse_multi_dates) is None


# --- F6 multi-ID split -----------------------------------------------------
def test_split_multi_ids(spark):
    assert one(spark, "PO2, PO1, PO2,", split_multi_ids) == ["PO1", "PO2"]
    assert one(spark, None, split_multi_ids) == []
    assert one(spark, " ,  , ", split_multi_ids) == []


# --- F7/F8 consignee -------------------------------------------------------
@pytest.mark.parametrize(
    "raw,name,code",
    [
        ("ACME GLOBAL (0001234567)", "ACME GLOBAL", "001234567"),
        ("ACME", "ACME", None),  # no parens: name=whole, code=last9 'ACME'
        ("A (X) B (YYY123456789)", "A (X) B", "123456789"),
        ("", None, None),
        (None, None, None),
        ("() ", None, None),  # paren pair with blank inside -> code null
    ],
)
def test_consignee_extraction(spark, raw, name, code):
    got_name = one(spark, raw, extract_consignee_name)
    got_code = one(spark, raw, extract_consignee_code)
    if raw == "ACME":
        assert got_code == "ACME"  # last-9-of-whole fallback
    else:
        assert got_code == code
    if raw == "() ":
        # reference: rsplit('(')[0] of '()' -> '' -> None
        assert got_name is None
    else:
        assert got_name == name


# --- F10/F12 formats -------------------------------------------------------
def test_date_formats(spark):
    d = datetime.date(2026, 1, 5)
    assert one(spark, d, fmt_display, typ="date") == "05-Jan-26"
    assert one(spark, d, month_group, typ="date") == "2026-01"
    assert one(spark, d, month_tag, typ="date") == "jan_26"
    assert one(spark, d, mmmyy, typ="date") == "jan26"


def test_tfidf_and_bm25_edges(spark):
    from pyspark.sql import functions as F

    from jsonl_dataingestion_pipeline_spark.functions.textstats import (
        bm25_scores,
        tfidf_terms,
    )

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "   "), (4, None)],
        "id long, text string",
    )
    tt = {(r["id"], r["term"]): (r["tf"], r["tfidf"]) for r in tfidf_terms(df, "text", "id").collect()}
    # blank/null docs contribute no terms but still count toward N=4
    assert set(k[0] for k in tt) == {1, 2}
    assert tt[(1, "apple")][0] == 2 and tt[(2, "banana")][0] == 1
    # 'banana' appears in 2 docs -> lower idf than 'cherry' (1 doc)
    assert tt[(2, "banana")][1] < tt[(2, "cherry")][1]
    # rarer term also outranks common one under BM25 at equal tf
    bm = {(r["id"], r["term"]): r["score"] for r in bm25_scores(df, "text", "id").collect()}
    assert bm[(2, "cherry")] > bm[(2, "banana")]
    # repeated term: tf saturation keeps score bounded vs linear tf-idf
    assert bm[(1, "apple")] < 2 * bm[(2, "cherry")]


def test_temperature_sample_null_group_and_collision(spark):
    import pytest

    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"g{i % 3}") for i in range(80)],
        "id long, grp string",
    )
    out = temperature_sample(df, "grp", "id", target_n=60, alpha=0.5)
    # NULL group is a stratum of its own, not silently dropped
    assert out.filter(F.col("grp").isNull()).count() > 0
    assert "keep_rate" in out.columns
    with pytest.raises(ValueError, match="keep_rate"):
        temperature_sample(
            df.withColumn("keep_rate", F.lit(1.0)), "grp", "id", target_n=60
        )


def test_split_corpus_deterministic_and_complete(spark):
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        split_corpus,
    )

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = split_corpus(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3
    )
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 1500 < counts["train"] < 1700  # ~80% of 2000
    # determinism: same assignment on a different partitioning
    again = split_corpus(
        df.repartition(7), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3,
    )
    a = {r.doc_id: r["split"] for r in out.collect()}
    b = {r.doc_id: r["split"] for r in again.collect()}
    assert a == b


def test_split_corpus_validations(spark):
    import pytest as _pytest

    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        split_corpus,
    )

    df = spark.range(10).withColumn("split", F.lit("x"))
    with _pytest.raises(ValueError):
        split_corpus(df, "id", {"a": 0.5, "b": 0.5})
    with _pytest.raises(ValueError):
        split_corpus(spark.range(10), "id", {"a": 0.5, "b": 0.4})


def test_mix_sources_rates_and_determinism(spark):
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        mix_sources,
    )

    rows = []
    for i in range(3000):
        rows.append((i, "big", 10))      # W=30000
    for i in range(3000, 3600):
        rows.append((i, "small", 10))    # W=6000
    df = spark.createDataFrame(rows, "doc_id long, src string, toks int")
    out = mix_sources(
        df, "src", "toks", "doc_id", {"big": 0.5, "small": 0.5}, seed=1
    )
    got = {r.src: r for r in
           out.groupBy("src").agg(
               F.count(F.lit(1)).alias("n"),
               F.first("keep_rate").alias("rate")).collect()}
    # T = min(30000/0.5, 6000/0.5) = 12000 -> big keeps 0.2, small keeps 1.0
    assert got["small"].rate == 1.0 and got["small"].n == 600
    assert abs(got["big"].rate - 0.2) < 1e-12
    assert 500 <= got["big"].n <= 700  # ~600 expected
    # determinism across partitionings
    again = mix_sources(
        df.repartition(7), "src", "toks", "doc_id",
        {"big": 0.5, "small": 0.5}, seed=1,
    )
    assert {r.doc_id for r in out.select("doc_id").collect()} == \
           {r.doc_id for r in again.select("doc_id").collect()}


def test_mix_sources_drops_untargeted_group(spark):
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        mix_sources,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 5)], "doc_id long, src string, toks int"
    )
    out = mix_sources(df, "src", "toks", "doc_id", {"a": 1.0}, seed=0)
    assert [r.src for r in out.collect()] == ["a"]


def test_bpe_token_count_differential_python_replay(spark):
    """120 seeded-random strings vs an independent Python replay of the
    BPE-ish counting rule (letter runs /8, digit runs /3, marks 1)."""
    import math
    import random
    import re

    from jsonl_dataingestion_pipeline_spark.functions.textstats import (
        bpe_token_count,
    )

    def py_count(t):
        total = 0
        for piece in re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]", t):
            if piece[0].isalpha():
                total += math.ceil(len(piece) / 8)
            elif piece[0].isdigit():
                total += math.ceil(len(piece) / 3)
            else:
                total += 1
        return total

    rng = random.Random(17)
    alphabet = "abcXYZ0123456789 .,!?~#\t\n"
    cases = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
        for i in range(120)
    ]
    df = spark.createDataFrame(cases, "id long, t string")
    got = {
        r.id: r.n
        for r in df.select("id", bpe_token_count("t").alias("n")).collect()
    }
    for i, t in cases:
        assert got[i] == py_count(t), (i, repr(t), got[i], py_count(t))


def test_quota_sample_layout_independent(spark):
    """The hash-coin quota picks the SAME rows under any partitioning —
    the reproducibility contract every sampler here carries."""
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        quota_sample,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"g{i % 5}", i) for i in range(500)], "g string, k long"
    )
    a = quota_sample(df.repartition(1), "g", "k", max_per_group=7, seed=3)
    b = quota_sample(
        df.repartition(13, F.col("k")), "g", "k", max_per_group=7, seed=3
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 35


def test_lang_id_differential_python_replay(spark):
    """Stopword-voting language ID vs an independent Python replay on
    seeded-random token soups from all four language lists."""
    import random

    from jsonl_dataingestion_pipeline_spark.functions.textstats import (
        LANG_STOPWORDS,
        lang_id,
    )

    def py_lang(text, default="und"):
        toks = [t.lower() for t in text.split()]
        best, best_lang = 0, default
        for lang in sorted(LANG_STOPWORDS):
            hits = sum(1 for t in toks if t in LANG_STOPWORDS[lang])
            if hits > best:
                best, best_lang = hits, lang
        return best_lang

    rng = random.Random(23)
    vocab = [w for ws in LANG_STOPWORDS.values() for w in ws] + [
        "xyz", "qqq", "foo", "bar"
    ]
    cases = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(150)
    ]
    df = spark.createDataFrame(cases, "id long, t string")
    got = {
        r.id: r.l
        for r in df.select("id", lang_id("t").alias("l")).collect()
    }
    for i, t in cases:
        assert got[i] == py_lang(t), (i, t, got[i], py_lang(t))


def test_split_corpus_layout_independent(spark):
    from jsonl_dataingestion_pipeline_spark.functions.sampling import (
        split_corpus,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split_corpus(df.repartition(1), "k", w, seed=9)
    b = split_corpus(df.repartition(17, F.col("k")), "k", w, seed=9)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    from collections import Counter

    c = Counter(s for _k, s in ra)
    assert 700 < c["train"] < 900 and c["val"] > 50 and c["test"] > 50


def test_normalize_unicode_composes_and_propagates_null(spark):
    import unicodedata

    from jsonl_dataingestion_pipeline_spark.functions.textstats import (
        normalize_unicode,
    )

    rows = [(1, "café"), (2, "ﬁle"), (3, None), (4, "ascii")]
    df = spark.createDataFrame(rows, "id long, t string")
    nfc = {
        r.id: r.n
        for r in df.select(
            "id", normalize_unicode("t", "NFC").alias("n")
        ).collect()
    }
    assert nfc[1] == "café"           # combining acute composed
    assert nfc[2] == "ﬁle"            # NFC keeps the fi ligature
    assert nfc[3] is None and nfc[4] == "ascii"
    nfkc = df.select(normalize_unicode("t", "NFKC").alias("n")).collect()
    assert any(r.n == "file" for r in nfkc)  # NFKC folds the ligature
    assert all(
        r.n is None or r.n == unicodedata.normalize("NFKC", t)
        for r, (_i, t) in zip(nfkc, rows)
    )


# ---------------------------------------------------------------------------
# fix_mojibake (round 8)
# ---------------------------------------------------------------------------
def test_fix_mojibake_repairs_cp1252_roundtrip(spark):
    from pyspark.sql import functions as F

    from jsonl_dataingestion_pipeline_spark.functions.cleaning import (
        MOJIBAKE_TABLE,
        fix_mojibake,
    )

    # every table entry is exactly encode-utf8/decode-cp1252 of its char
    for moji, ch in MOJIBAKE_TABLE:
        assert ch.encode("utf-8").decode("cp1252") == moji
    # longest-first ordering: a 3-byte-char fix never clipped by 2-byte
    lens = [len(m) for m, _ in MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)
    df = spark.createDataFrame(
        [("cafÃ© â€” naÃ¯ve Â«okÂ» â‚¬5",), ("plain ascii",), (None,)],
        "t string",
    )
    out = [r[0] for r in df.select(fix_mojibake("t")).collect()]
    assert out[0] == "café — naïve «ok» €5"
    assert out[1] == "plain ascii"
    assert out[2] is None


def test_vocab_oov_rate_widening_survives_int64_boundary(spark):
    """Round-9 accumulator sweep twin of the psi test: the EXACT
    widened oov-rate expression vocab_coverage emits
    (textstats.py::vocab_coverage), at a per-group word count where the
    int64 product raised."""
    df = spark.createDataFrame(
        [(30_000_000_000_000, 90_000_000_000_000)],
        "oov_words long, total_words long",
    )
    r = df.select(
        F.expr(
            "(CAST(oov_words AS DECIMAL(38,0)) * 1000000)"
            " div total_words"
        ).alias("u")
    ).collect()[0]
    assert r.u == 333_333
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.select(
            F.expr("(oov_words * 1000000) div total_words")
        ).collect()


class TestScriptProfile:
    def test_counts_per_script(self, spark):
        from jsonl_dataingestion_pipeline_spark.functions import (
            textstats as ts,
        )

        df = spark.createDataFrame(
            [(1, "abc Привет 機械学習 مرحبا αβ 123")], "id long, t string"
        )
        r = df.select(
            ts.script_char_count("t", "latin").alias("lat"),
            ts.script_char_count("t", "cyrillic").alias("cyr"),
            ts.script_char_count("t", "cjk").alias("cjk"),
            ts.script_char_count("t", "arabic").alias("ar"),
            ts.script_char_count("t", "greek").alias("gr"),
        ).collect()[0]
        assert (r.lat, r.cyr, r.cjk, r.ar, r.gr) == (3, 6, 4, 5, 2)

    def test_main_script_argmax_and_ties(self, spark):
        from jsonl_dataingestion_pipeline_spark.functions import (
            textstats as ts,
        )

        rows = [
            (1, "Привет Привет abc"),      # cyrillic dominates
            (2, "abc"),                     # latin only
            (3, "123 !!!"),                 # no script chars -> und
            (4, "ab Пр"),                   # 2 vs 2 tie -> cyrillic
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {
            r.id: r.m
            for r in df.select(
                "id", ts.main_script("t").alias("m")
            ).collect()
        }
        # tie at 2-2: sorted(SCRIPT_CLASSES) order is arabic, cjk,
        # cyrillic, greek, latin — later names replace only on STRICTLY
        # greater, so cyrillic (earlier) wins the tie against latin
        assert got == {
            1: "cyrillic", 2: "latin", 3: "und", 4: "cyrillic",
        }

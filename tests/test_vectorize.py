"""Feature hashing (operators/vectorize.py): bucket/sign determinism,
exact integer weights, self-similarity, and layout independence."""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.vectorize import (
    hashed_cosine_topk,
    hashed_tf_entries,
)


def _bucket_sign(tok: str, dim: int):
    h = hashlib.md5(tok.encode()).hexdigest()
    return int(h[:8], 16) % dim, 1 if int(h[8], 16) % 2 == 0 else -1


def test_entries_match_reference_hash(spark):
    df = spark.createDataFrame(
        [(1, "red red blue"), (2, "blue")], "id long, text string"
    )
    got = {
        (r.id, r.bucket): r.w
        for r in hashed_tf_entries(df, "text", "id", dim=64).collect()
    }
    rb, rs = _bucket_sign("red", 64)
    bb, bs = _bucket_sign("blue", 64)
    if rb != bb:
        assert got[(1, rb)] == 2 * rs
        assert got[(1, bb)] == 1 * bs
    assert got[(2, bb)] == bs


def test_signed_collisions_cancel_not_inflate(spark):
    # dim=1: every token collides into bucket 0. With signs the weight
    # is the ±1 SUM (may cancel to a dropped zero), never the raw count.
    df = spark.createDataFrame([(1, "x y")], "id long, text string")
    rows = hashed_tf_entries(df, "text", "id", dim=1).collect()
    _, sx = _bucket_sign("x", 1)
    _, sy = _bucket_sign("y", 1)
    expect = sx + sy
    if expect == 0:
        assert rows == []
    else:
        assert rows[0].w == expect


def test_identical_doc_ranks_first_with_unit_cosine(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),   # identical -> cosine 1
        (2, "alpha beta something else"),
        (3, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = hashed_cosine_topk(
        df, df.filter(F.col("doc_id") == 0), "text", "doc_id",
        dim=256, k=3,
    ).collect()
    assert top[0].ht_id == 1
    assert top[0].ht_sim_u == 1_000_000
    assert [r.ht_rank for r in top] == list(range(1, len(top) + 1))
    assert all(r.ht_id != 0 for r in top)  # query excluded


def test_entries_independent_of_partitioning(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, text string")
    a = sorted(map(tuple, hashed_tf_entries(
        df.repartition(1), "text", "id", dim=32).collect()))
    b = sorted(map(tuple, hashed_tf_entries(
        df.repartition(16), "text", "id", dim=32).collect()))
    assert a == b


def test_hashed_cosine_topk_validates_query_frame(spark):
    """ADVICE r7: empty / multi-row / tokenless query frames raise
    descriptive ValueErrors instead of an opaque TypeError or silent
    NULL similarities."""
    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.vectorize import (
        hashed_cosine_topk,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "id long, text string"
    )
    empty = corpus.filter("id > 99")
    with pytest.raises(ValueError, match="empty frame"):
        hashed_cosine_topk(corpus, empty, "text", "id")
    with pytest.raises(ValueError, match="more than one row"):
        hashed_cosine_topk(corpus, corpus, "text", "id")
    blank = spark.createDataFrame([(9, "   ")], "id long, text string")
    with pytest.raises(ValueError, match="tokenizes to no"):
        hashed_cosine_topk(corpus, blank, "text", "id")


def test_vocab_coverage_topk_and_oov(spark):
    """functions/textstats.py::vocab_coverage — k=2 vocabulary is the
    two most frequent words (ties by word asc); OOV mass and covered
    bytes measured per group exactly."""
    from jsonl_dataingestion_pipeline_spark.functions.textstats import (
        vocab_coverage,
    )

    rows = [
        ("en", "aa bb aa cc"),   # aa x2
        ("en", "bb aa dd"),      # bb x2 total, aa x3
        ("de", "cc cc zz"),      # cc x3 total
    ]
    # counts: aa=3, cc=3, bb=2, dd=1, zz=1 -> k=2 vocab = {aa, cc}
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r.lang: r for r in vocab_coverage(df, "text", "lang", k=2).collect()}
    en, de = out["en"], out["de"]
    assert (en.total_words, en.oov_words) == (7, 3)   # bb,bb,dd OOV
    assert en.known_bytes == 8                        # aa*3 + cc*1
    assert en.oov_rate_u == 3 * 1_000_000 // 7
    assert (de.total_words, de.oov_words) == (3, 1)   # zz OOV
    assert de.known_bytes == 4

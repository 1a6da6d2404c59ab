"""Deletion-neighborhood fuzzy join (operators/fuzzyjoin.py):
completeness vs brute force, variant generation, guards."""

from __future__ import annotations

import itertools

from jsonl_dataingestion_pipeline_spark.operators.fuzzyjoin import (
    deletion_neighborhood_join,
)


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _join(spark, left, right, **kw):
    ldf = spark.createDataFrame(left, "id long, name string")
    rdf = spark.createDataFrame(right, "id long, name string")
    return deletion_neighborhood_join(ldf, rdf, "id", "name", **kw)


def test_complete_vs_brute_force_k1(spark):
    # every pair the brute force finds, the variant join must find
    vocab = ["cat", "cart", "cast", "bat", "hat", "hats", "xyz", "ca"]
    left = list(enumerate(vocab))
    right = [(100 + i, w) for i, w in enumerate(vocab)]
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in _join(spark, left, right, k=1).collect()
    }
    want = {
        (i, 100 + j, _py_lev(a, b))
        for (i, a), (j, b) in itertools.product(
            enumerate(vocab), enumerate(vocab)
        )
        if _py_lev(a, b) <= 1
    }
    assert got == want


def test_complete_vs_brute_force_k2(spark):
    vocab = ["abcd", "abxd", "axyd", "ab", "abcdef", "zzzz"]
    left = list(enumerate(vocab))
    right = [(100 + i, w) for i, w in enumerate(vocab)]
    got = {
        (r.left_id, r.right_id)
        for r in _join(spark, left, right, k=2).collect()
    }
    want = {
        (i, 100 + j)
        for i, a in enumerate(vocab)
        for j, b in enumerate(vocab)
        if _py_lev(a, b) <= 2
    }
    assert got == want


def test_substitution_insertion_deletion_all_found(spark):
    left = [(1, "spark")]
    right = [(10, "spork"), (11, "sparks"), (12, "spak"), (13, "quack")]
    got = {r.right_id: r.dist for r in _join(spark, left, right, k=1).collect()}
    assert got == {10: 1, 11: 1, 12: 1}


def test_max_len_guard_drops_long_strings(spark):
    left = [(1, "a" * 100), (2, "short")]
    right = [(10, "a" * 100), (11, "shore")]
    got = {(r.left_id, r.right_id)
           for r in _join(spark, left, right, k=1, max_len=64).collect()}
    assert got == {(2, 11)}


def test_k_out_of_range_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _join(spark, [(1, "a")], [(2, "b")], k=3)

"""ROUGE-L instruction dedup (operators/rouge.py): the LCS kernel
against a pure-python reference, order sensitivity, blocking recall,
and the Self-Instruct admission decision."""

from __future__ import annotations

import itertools

from jsonl_dataingestion_pipeline_spark.operators.rouge import (
    lcs_len,
    rouge_l_dedup,
)


def _py_lcs(a, b):
    # independent reference: full DP table
    m, n = len(a), len(b)
    t = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m):
        for j in range(n):
            t[i + 1][j + 1] = (
                t[i][j] + 1 if a[i] == b[j] else max(t[i][j + 1], t[i + 1][j])
            )
    return t[m][n]


class TestLcsKernel:
    def test_against_reference_exhaustive_small(self):
        vocab = "ab"
        for la, lb in itertools.product(range(5), range(5)):
            for a in itertools.product(vocab, repeat=la):
                for b in itertools.product(vocab, repeat=lb):
                    assert lcs_len(list(a), list(b)) == _py_lcs(a, b)

    def test_order_sensitive(self):
        # same bag, different order -> LCS < len (bag overlap would be 3)
        assert lcs_len("a b c".split(), "c b a".split()) == 1

    def test_swap_argument_symmetry(self):
        a, b = "x y z w q".split(), "y q".split()
        assert lcs_len(a, b) == lcs_len(b, a) == 2


class TestRougeLDedup:
    def _run(self, spark, cand, pool, **kw):
        cdf = spark.createDataFrame(cand, "doc_id long, text string")
        pdf = spark.createDataFrame(pool, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in rouge_l_dedup(
                cdf, pdf, "doc_id", "text", **kw
            ).collect()
        }

    def test_near_duplicate_dropped(self, spark):
        pool = [(1, "write a poem about the sea")]
        cand = [(10, "write a poem about the sea today")]
        r = self._run(spark, cand, pool)[10]
        # lcs=6, la=7, lb=6 -> F = 12/13 = 0.923 > 0.7
        assert r.lcs == 6 and r.best_ref == 1 and not r.keep
        assert r.best_f_u == 2 * 6 * 10**6 // 13

    def test_distinct_instruction_kept(self, spark):
        pool = [(1, "write a poem about the sea")]
        cand = [(10, "summarize a report for the board meeting")]
        r = self._run(spark, cand, pool)[10]
        assert r.keep

    def test_max_over_pool(self, spark):
        pool = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma x")]
        cand = [(10, "alpha beta gamma delta")]
        r = self._run(spark, cand, pool)[10]
        assert r.best_ref == 1 and r.best_f_u == 10**6 and not r.keep

    def test_no_shared_token_scores_zero(self, spark):
        pool = [(1, "aa bb cc")]
        cand = [(10, "dd ee ff")]
        r = self._run(spark, cand, pool)[10]
        assert (r.best_ref, r.lcs, r.best_f_u, r.keep) == (None, 0, 0, True)

    def test_tie_breaks_smallest_ref(self, spark):
        pool = [(5, "one two three"), (3, "one two three")]
        cand = [(10, "one two three")]
        assert self._run(spark, cand, pool)[10].best_ref == 3

    def test_case_insensitive_tokenization(self, spark):
        pool = [(1, "Write A Poem")]
        cand = [(10, "write a poem")]
        assert self._run(spark, cand, pool)[10].best_f_u == 10**6

    def test_max_df_blocking_drops_frequent_tokens(self, spark):
        # 'the' appears in every pool doc; with max_df=1 it can't block
        pool = [(1, "the alpha"), (2, "the beta"), (3, "the gamma")]
        cand = [(10, "the")]
        exact = self._run(spark, cand, pool, max_df=None)[10]
        blocked = self._run(spark, cand, pool, max_df=1)[10]
        assert exact.best_f_u > 0
        assert blocked.best_f_u == 0  # documented recall trade


def test_string_ids_supported(spark):
    cdf = spark.createDataFrame(
        [("cand1", "alpha beta gamma")], "doc_id string, text string"
    )
    pdf = spark.createDataFrame(
        [("pB", "alpha beta gamma"), ("pA", "alpha beta gamma")],
        "doc_id string, text string",
    )
    [r] = rouge_l_dedup(cdf, pdf, "doc_id", "text").collect()
    # ties -> lexicographically smallest ref id
    assert r.best_ref == "pA" and not r.keep

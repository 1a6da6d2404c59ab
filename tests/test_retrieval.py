"""RRF fusion and corpus-divergence report tests."""
from __future__ import annotations

import math

import pytest

from jsonl_dataingestion_pipeline_spark.functions.textstats import (
    corpus_divergence,
)
from jsonl_dataingestion_pipeline_spark.operators.retrieval import rrf_fuse


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


class TestRrfFuse:
    def test_two_list_fusion_matches_formula(self, spark):
        lex = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
        dense = _ranking(spark, [(3, 1), (1, 2), (4, 3)])
        out = {
            r.doc_id: (r.rrf_score, r.fused_rank)
            for r in rrf_fuse([lex, dense], k=60, topk=10).collect()
        }
        want = {
            1: 1 / 61 + 1 / 62,
            2: 1 / 62,
            3: 1 / 63 + 1 / 61,
            4: 1 / 63,
        }
        assert set(out) == set(want)
        for d, s in want.items():
            assert out[d][0] == pytest.approx(round(s, 9), abs=1e-12)
        # doc 1 (ranks 1+2) beats doc 3 (ranks 3+1): same pair of
        # contributions -> equal score, tie broken on id
        assert out[1][1] == 1 and out[3][1] == 2

    def test_topk_cut_and_rank_sequence(self, spark):
        lex = _ranking(spark, [(i, i) for i in range(1, 8)])
        got = rrf_fuse([lex], topk=3).collect()
        assert [r.fused_rank for r in got] == [1, 2, 3]
        assert [r.doc_id for r in got] == [1, 2, 3]

    def test_per_query_fusion_with_by(self, spark):
        rows = [(q, d, r) for q in (10, 20) for d, r in ((1, 1), (2, 2))]
        a = spark.createDataFrame(
            rows, "query_id long, doc_id long, rank int"
        )
        b = spark.createDataFrame(
            [(10, 2, 1), (20, 1, 1)],
            "query_id long, doc_id long, rank int",
        )
        got = {
            (r.query_id, r.doc_id): r.fused_rank
            for r in rrf_fuse(
                [a, b], by=["query_id"], topk=1
            ).collect()
        }
        # query 10: doc 2 has 1/62 + 1/61 > doc 1's 1/61 -> wins
        assert got == {(10, 2): 1, (20, 1): 1}

    def test_empty_rankings_rejected(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            rrf_fuse([])


class TestCorpusDivergence:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(t,) for t in texts], "text string"
        )

    def test_matches_python_replay(self, spark):
        a = self._df(spark, ["the cat sat", "the dog ran", "the cat"])
        b = self._df(spark, ["le chat", "le chien", "the chat"])
        got = {
            r.token: (r.p_a, r.p_b, r.sym_kl)
            for r in corpus_divergence(a, b, "text", topk=100).collect()
        }
        import collections

        ca = collections.Counter(
            w for t in ["the cat sat", "the dog ran", "the cat"]
            for w in t.lower().split()
        )
        cb = collections.Counter(
            w for t in ["le chat", "le chien", "the chat"]
            for w in t.lower().split()
        )
        vocab = set(ca) | set(cb)
        na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
        for tok in vocab:
            pa = (ca[tok] + 1.0) / (na + v)
            pb = (cb[tok] + 1.0) / (nb + v)
            sym = pa * math.log(pa / pb) + pb * math.log(pb / pa)
            assert got[tok][0] == pytest.approx(pa, abs=1e-9)
            assert got[tok][1] == pytest.approx(pb, abs=1e-9)
            assert got[tok][2] == pytest.approx(sym, abs=1e-9)

    def test_identical_corpora_zero_divergence(self, spark):
        a = self._df(spark, ["alpha beta gamma", "beta gamma"])
        out = corpus_divergence(a, a, "text", topk=10).collect()
        assert all(r.sym_kl == 0.0 for r in out)

    def test_driver_token_ranks_first(self, spark):
        # 'only_a' appears heavily in A and never in B -> top driver
        a = self._df(spark, ["only_a only_a only_a shared", "shared"])
        b = self._df(spark, ["shared shared", "shared"])
        top = corpus_divergence(a, b, "text", topk=1).collect()[0]
        assert top.token == "only_a"
        assert top.sym_kl > 0


class TestPmiCollocations:
    def test_matches_python_replay(self, spark):
        import collections
        import math

        from jsonl_dataingestion_pipeline_spark.functions.textstats import (
            pmi_collocations,
        )

        texts = [
            "new york is big", "i love new york", "new york new york",
            "big data is fun", "big data big data", "fun with big data",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = {
            r.bigram: (r.n_pair, r.pmi)
            for r in pmi_collocations(
                df, "text", min_count=2, topk=50
            ).collect()
        }
        uni = collections.Counter(
            w for t in texts for w in t.lower().split()
        )
        bi = collections.Counter(
            (ws[i], ws[i + 1])
            for t in texts
            for ws in [t.lower().split()]
            for i in range(len(ws) - 1)
        )
        n = sum(uni.values())
        nbi = sum(max(len(t.split()) - 1, 0) for t in texts)
        import pytest as _p

        want = {
            f"{a} {b}": (
                c,
                round(
                    math.log(
                        (c / nbi) / ((uni[a] / n) * (uni[b] / n))
                    ),
                    6,
                ),
            )
            for (a, b), c in bi.items()
            if c >= 2
        }
        assert set(got) == set(want)
        for k, (c, pmi) in want.items():
            assert got[k][0] == c, k
            assert got[k][1] == _p.approx(pmi, abs=1e-6), k
        # the designed collocations rank above chance pairings
        assert got["new york"][1] > 0 and got["big data"][1] > 0

    def test_min_count_prunes_rare_pairs(self, spark):
        from jsonl_dataingestion_pipeline_spark.functions.textstats import (
            pmi_collocations,
        )

        df = spark.createDataFrame(
            [("rare pair",), ("common one common one",),
             ("one common one common",)],
            "text string",
        )
        got = [
            r.bigram
            for r in pmi_collocations(
                df, "text", min_count=2, topk=10
            ).collect()
        ]
        assert "rare pair" not in got


class TestNegativeSamples:
    def test_matches_python_replay_and_partition_invariant(self, spark):
        import hashlib

        from jsonl_dataingestion_pipeline_spark.operators.retrieval import (
            negative_samples,
        )

        ids = sorted({3, 8, 21, 40, 55, 77, 90, 105, 130, 152, 200})
        corpus = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        anchors = corpus.filter("doc_id % 2 = 1")
        got = {
            (r.anchor_id, r.slot): r.neg_id
            for r in negative_samples(
                corpus, anchors, "doc_id", k=3, seed=5
            ).collect()
        }
        n = len(ids)
        want = {}
        for a in ids:
            if a % 2 != 1:
                continue
            for s in range(3):
                h = hashlib.md5(f"5:{a}:{s}".encode()).hexdigest()
                rnk = int(h[:15], 16) % n
                neg = ids[rnk]
                if neg != a:
                    want[(a, s)] = neg
        assert got == want
        # partitioning must not change the permutation
        got2 = {
            (r.anchor_id, r.slot): r.neg_id
            for r in negative_samples(
                corpus.repartition(5), anchors, "doc_id", k=3, seed=5
            ).collect()
        }
        assert got2 == want

    def test_seed_changes_draws(self, spark):
        from jsonl_dataingestion_pipeline_spark.operators.retrieval import (
            negative_samples,
        )

        corpus = spark.createDataFrame(
            [(i,) for i in range(50)], "doc_id long"
        )
        anchors = corpus.filter("doc_id < 10")
        a = {(r.anchor_id, r.slot): r.neg_id for r in negative_samples(
            corpus, anchors, "doc_id", k=4, seed=1).collect()}
        b = {(r.anchor_id, r.slot): r.neg_id for r in negative_samples(
            corpus, anchors, "doc_id", k=4, seed=2).collect()}
        assert a != b


class TestRankMetrics:
    def _run(self, spark, rows, k):
        from jsonl_dataingestion_pipeline_spark.operators.retrieval import (
            rank_metrics,
        )

        df = spark.createDataFrame(
            rows, "q string, id long, score double, rel int"
        )
        return {
            r.q: r
            for r in rank_metrics(df, "q", "id", "score", "rel", k=k)
            .collect()
        }

    def test_hand_computed_metrics(self, spark):
        import math

        # qA ranked by score desc: id3 (rel 0), id1 (rel 1), id2 (rel 0),
        # id4 (rel 1, cut by k=3)
        rows = [
            ("qA", 1, 8.0, 1), ("qA", 2, 5.0, 0),
            ("qA", 3, 9.0, 0), ("qA", 4, 1.0, 1),
            ("qB", 1, 3.0, 0), ("qB", 2, 2.0, 0),
        ]
        out = self._run(spark, rows, k=3)
        a = out["qA"]
        assert a.hits == 1
        assert a.mrr_u == 500_000          # first relevant at rank 2
        assert a.prec_u == 1_000_000 // 3
        dcg = round(1e6 / math.log2(3))    # rel at rank 2 -> log2(2+1)
        assert a.dcg_u == dcg
        # standard nDCG@k: qA's judged pool has TWO relevant docs
        # (id1 retrieved, id4 cut), so the ideal ranking fills
        # min(2, k) = 2 top slots with them
        idcg = 1_000_000 + round(1e6 / math.log2(3))
        assert a.idcg_u == idcg
        assert a.ndcg_u == dcg * 1_000_000 // idcg
        b = out["qB"]                      # nothing relevant judged
        assert (b.hits, b.mrr_u, b.prec_u, b.dcg_u, b.idcg_u, b.ndcg_u) \
            == (0, 0, 0, 0, 0, 0)

    def test_recall_failure_not_flattered(self, spark):
        # the ADVICE r8 case: 1 of 3 judged-relevant docs retrieved at
        # rank 1 must NOT score a perfect nDCG — the ideal ranking has
        # min(3, k=2) = 2 relevant in its top-2
        import math

        rows = [
            ("q", 1, 9.0, 1), ("q", 2, 8.0, 0),
            ("q", 3, 1.0, 1), ("q", 4, 0.5, 1),
        ]
        out = self._run(spark, rows, k=2)
        r = out["q"]
        assert r.hits == 1 and r.dcg_u == 1_000_000
        idcg = 1_000_000 + round(1e6 / math.log2(3))
        assert r.idcg_u == idcg
        assert r.ndcg_u == 1_000_000 * 1_000_000 // idcg < 1_000_000

    def test_score_ties_break_by_id_asc(self, spark):
        # same score everywhere: rank order = id order, rel on id 1
        rows = [("q", i, 1.0, 1 if i == 1 else 0) for i in range(1, 5)]
        out = self._run(spark, rows, k=4)
        assert out["q"].mrr_u == 1_000_000

    def test_perfect_ranking_ndcg_is_one(self, spark):
        rows = [
            ("q", 1, 9.0, 1), ("q", 2, 8.0, 1), ("q", 3, 7.0, 0),
        ]
        out = self._run(spark, rows, k=3)
        assert out["q"].ndcg_u == 1_000_000

    def test_topk_cut_compiles_to_window_group_limit(self, spark):
        from jsonl_dataingestion_pipeline_spark.operators.retrieval import (
            rank_metrics,
        )

        df = spark.createDataFrame(
            [("q", 1, 1.0, 1)], "q string, id long, score double, rel int"
        )
        out = rank_metrics(df, "q", "id", "score", "rel", k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

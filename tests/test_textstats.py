

class TestReadabilityStats:
    def _r(self, spark, text):
        from pyspark.sql import functions as F

        from jsonl_dataingestion_pipeline_spark.functions.textstats import (
            readability_stats,
        )

        df = spark.createDataFrame([(text,)], "t string")
        return df.select(
            readability_stats(F.col("t")).alias("r")
        ).collect()[0].r

    def test_hand_computed_flesch(self, spark):
        r = self._r(spark, "The cat sat. The dog ran fast!")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (7, 2, 7)
        # 206.835 - 1.015*(7/2) - 84.6*(7/7) = 118.6825
        assert r.flesch_u == 118_682_500

    def test_vowel_groups_not_vowels(self, spark):
        r = self._r(spark, "piece create beautiful")
        # piece [ie][e]=2, create [ea][e]=2, beautiful [eau][i][u]=3
        assert r.n_syllables == 7

    def test_min_one_syllable_per_lettered_word(self, spark):
        r = self._r(spark, "psst hmm 123")
        # psst/hmm have letters -> 1 each; '123' has none -> 0
        assert r.n_syllables == 2

    def test_trailing_fragment_counts_as_sentence(self, spark):
        assert self._r(spark, "Done. and then").n_sentences == 2

    def test_empty_text_null_score(self, spark):
        r = self._r(spark, "")
        assert r.flesch_u is None and r.n_words == 0

    def test_negative_score_floors_not_truncates(self, spark):
        # a one-word many-syllable monster drives flesch negative;
        # exact floor semantics must hold below zero too
        r = self._r(spark, "bananabananabanana")
        assert r.flesch_u < 0
        num = (206835 * 1 * 1 - 1015 * 1 - 84600 * r.n_syllables) * 10**6
        den = 1000
        assert r.flesch_u == num // den  # python floor division

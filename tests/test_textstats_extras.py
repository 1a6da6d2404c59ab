"""Tokenizer fertility census: per-script sums match hand computation,
ratios are exact floor division in micro-units, zero-token groups emit
NULL ratios."""
from __future__ import annotations


class TestTokenizerFertility:
    def test_census_matches_hand_computation(self, spark):
        import math

        from jsonl_dataingestion_pipeline_spark.functions.textstats import (
            tokenizer_fertility,
        )

        rows = [
            (1, "hello world program"),          # latin: 3 words
            (2, "internationalization station"),  # long words split
            (3, "Привет мир"),                    # cyrillic
            (4, ""),                              # und, zero everything
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r.script: r for r in tokenizer_fertility(df, "text").collect()}

        # latin group: docs 1 and 2
        lat = got["latin"]
        assert lat.n_docs == 2
        assert lat.n_chars == len(rows[0][1]) + len(rows[1][1])
        assert lat.n_words == 5
        # bpe: ceil(len/8) per letter run
        bpe = sum(
            math.ceil(len(w) / 8)
            for w in (rows[0][1].split() + rows[1][1].split())
        )
        assert lat.n_tokens == bpe
        assert lat.chars_per_token_u == lat.n_chars * 10**6 // bpe
        assert lat.tokens_per_word_u == bpe * 10**6 // 5

        cyr = got["cyrillic"]
        assert cyr.n_bytes == len("Привет мир".encode("utf-8"))
        assert cyr.n_chars == 10

        und = got["und"]
        assert und.n_tokens == 0
        assert und.chars_per_token_u is None
        assert und.tokens_per_word_u is None

    def test_ratios_are_floor_division_not_rounding(self, spark):
        from jsonl_dataingestion_pipeline_spark.functions.textstats import (
            tokenizer_fertility,
        )

        # 20 chars, 3 bpe tokens -> 6666666 (floor), never 6666667
        df = spark.createDataFrame(
            [(1, "aaaaaaaaaaaaaaaaaa a")], "id long, text string"
        )
        r = tokenizer_fertility(df, "text").collect()[0]
        assert r.n_chars == 20 and r.n_tokens == 4
        assert r.chars_per_token_u == 20 * 10**6 // 4

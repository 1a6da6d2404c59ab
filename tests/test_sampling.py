

class TestScalingLadder:
    def _ladder(self, spark, n=2000, **kw):
        from jsonl_dataingestion_pipeline_spark.functions.sampling import (
            scaling_ladder,
        )

        df = spark.range(n).withColumnRenamed("id", "key")
        return scaling_ladder(df, "key", **kw).collect()

    def test_nesting_by_construction(self, spark):
        rows = self._ladder(spark, fractions=(0.05, 0.25, 1.0), seed=3)
        s = [
            {r.key for r in rows if r.ladder_tier is not None
             and r.ladder_tier <= i}
            for i in range(3)
        ]
        assert s[0] <= s[1] <= s[2]
        assert len(s[2]) == len(rows)  # fraction 1.0 contains all

    def test_fraction_sizes_approximate(self, spark):
        rows = self._ladder(spark, n=5000, fractions=(0.1, 0.5, 1.0), seed=1)
        n1 = sum(1 for r in rows if r.ladder_tier == 0)
        assert 350 <= n1 <= 650  # ~10% of 5000

    def test_membership_stable_under_seed_not_fractions(self, spark):
        # adding a rung must not move existing members between rungs
        a = {r.key: r.ladder_tier <= 0 for r in
             self._ladder(spark, fractions=(0.1, 1.0), seed=9)}
        b = {r.key: r.ladder_tier <= 1 for r in
             self._ladder(spark, fractions=(0.02, 0.1, 1.0), seed=9)}
        assert a == b

    def test_non_monotone_fractions_raise(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            self._ladder(spark, fractions=(0.5, 0.1))

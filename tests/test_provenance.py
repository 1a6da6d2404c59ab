"""Provenance ledger (operators/provenance.py): chain construction,
verification, and tamper detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators import provenance as pv


def _ledger(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    led = pv.provenance_init(df, "id", "web")
    led = pv.provenance_step(led, "dedup:exact", {"key": "md5"})
    return pv.provenance_step(led, "filter:gopher")


def test_clean_chain_verifies(spark):
    out = pv.provenance_verify(_ledger(spark), "id").collect()
    assert all(r.prov_ok for r in out)
    assert all(len(r.prov_steps) == 3 for r in out)
    assert out[0].prov_steps[0].stage == "init:web"


def test_tampered_hash_fails(spark):
    led = _ledger(spark).withColumn(
        "prov_hash", F.md5(F.concat(F.col("prov_hash"), F.lit("x")))
    )
    out = pv.provenance_verify(led, "id").collect()
    assert not any(r.prov_ok for r in out)


def test_tampered_step_fails(spark):
    # editing a recorded step invalidates the chain
    led = _ledger(spark).withColumn(
        "prov_steps",
        F.transform(
            F.col("prov_steps"),
            lambda s: F.struct(
                s["stage"].alias("stage"),
                F.reverse(s["params_md5"]).alias("params_md5"),
            ),
        ),
    )
    out = pv.provenance_verify(led, "id").collect()
    assert not any(r.prov_ok for r in out)


def test_hash_spliced_from_other_row_fails(spark):
    # id-seeded chain: row 2 carrying row 1's (valid) hash must fail
    led = _ledger(spark)
    h1 = led.filter(F.col("id") == 1).collect()[0].prov_hash
    spliced = led.withColumn(
        "prov_hash",
        F.when(F.col("id") == 2, F.lit(h1)).otherwise(F.col("prov_hash")),
    )
    out = {r.id: r for r in pv.provenance_verify(spliced, "id").collect()}
    assert out[1].prov_ok and not out[2].prov_ok


def test_params_order_insensitive(spark):
    assert pv.params_digest({"a": 1, "b": 2}) == pv.params_digest(
        {"b": 2, "a": 1}
    )
    assert pv.params_digest({"a": 1}) != pv.params_digest({"a": 2})

#!/usr/bin/env python
"""Drift audit for incremental IVF-PQ index maintenance (q171's
planted-recall machinery applied to append_ivfpq_index).

Frozen codebooks are the price of append-without-retrain; this audit
measures what that costs:

1. train IVF-PQ on the INITIAL corpus (2/3 of embeddings + 10 planted
   md5-delta near-copies of vector 0), write the stored index, measure
   planted recall@10 for query = vector 0;
2. APPEND the held-out 1/3 (in-distribution) and re-measure — recall
   must hold (the appended mass quantizes like the training mass);
3. APPEND an out-of-distribution batch (the held-out vectors scaled
   x5, far outside the trained cells) with planted copies of an OOD
   query vector (vector 0 scaled x5 — like vector 0 itself, NEVER in
   the index, so no top-k slot is wasted on the query and recall is
   unbiased) — the recall drop is the drift signal a retrain threshold
   should watch.

Prints one JSON line; SCALING.md records the tier row.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from jsonl_dataingestion_pipeline_spark.operators.pq import (  # noqa: E402
    append_ivfpq_index,
    ivfpq_topk_from_index,
    ivfpq_train,
    write_ivfpq_index,
)
from jsonl_dataingestion_pipeline_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_PLANT = 10
#: OOD scale factor (x5 = far outside the trained cells; x2 = mild)
OOD_SCALE = float(os.environ.get("IVFPQ_OOD_SCALE", "5.0"))


def plant(spark, base_vec_df, first_planted_id):
    """10 near-copies of the given 1-row (embedding) frame, ids
    first_planted_id.. — md5-free here (audit-local, not oracle-gated):
    delta = +/- 1e-4 on alternating dims, distinct per copy."""
    rows = base_vec_df.collect()
    v = [round(float(x), 9) for x in rows[0]["embedding"]]
    out = []
    for j in range(N_PLANT):
        out.append(
            (
                first_planted_id + j,
                [
                    x + ((1 + j) * 1e-4 if (i + j) % 2 == 0 else -(1 + j) * 1e-4)
                    for i, x in enumerate(v)
                ],
            )
        )
    return spark.createDataFrame(out, "vec_id long, embedding array<double>")


def recall(spark, path, q, coarse, cbs, planted_ids):
    top = ivfpq_topk_from_index(
        spark, path, q, coarse, cbs, nprobe=3, k=K
    ).collect()
    got = {r["id"] for r in top}
    return len(got & planted_ids) / min(K, len(planted_ids))


def main() -> int:
    spark = get_spark(app_name="ivfpq-append-audit")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(e.select("embedding").head()[0])
    q0df = e.filter(F.col("vec_id") == 0).select("embedding")
    q0 = [round(float(x), 9) for x in q0df.head()[0]]

    initial = e.filter(F.col("vec_id") % 3 != 0)
    heldout = e.filter((F.col("vec_id") % 3 == 0) & (F.col("vec_id") > 0))
    planted0 = plant(spark, q0df, 10_000_000)
    corpus0 = initial.unionByName(planted0)

    t0 = time.time()
    coarse, cbs = ivfpq_train(
        corpus0, "embedding", "vec_id",
        dim=dim, n_cells=8, m=8, n_codes=16,
        coarse_iterations=3, pq_iterations=3,
    )
    t_train = time.time() - t0
    path = "/tmp/jdip_ivfpq_append_audit"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    write_ivfpq_index(corpus0, path, coarse, cbs)
    p0 = {10_000_000 + j for j in range(N_PLANT)}
    r_before = recall(spark, path, q0, coarse, cbs, p0)

    t0 = time.time()
    append_ivfpq_index(heldout, path, coarse, cbs)
    t_append = time.time() - t0
    r_after_indist = recall(spark, path, q0, coarse, cbs, p0)

    # out-of-distribution batch: held-out vectors scaled x5, plus a
    # planted family around the (never-indexed) OOD query = q0 * 5
    ood = heldout.select(
        (F.col("vec_id") + 20_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * OOD_SCALE).alias(
            "embedding"
        ),
    )
    qo_df = q0df.select(
        F.transform(F.col("embedding"), lambda x: x * OOD_SCALE).alias(
            "embedding"
        )
    )
    qo = [round(float(x), 9) for x in qo_df.head()[0]]
    planted_ood = plant(spark, qo_df, 30_000_000)
    append_ivfpq_index(ood.unionByName(planted_ood), path, coarse, cbs)
    po = {30_000_000 + j for j in range(N_PLANT)}
    r_ood = recall(spark, path, qo, coarse, cbs, po)

    n_index = spark.read.parquet(path).count()
    print(json.dumps({
        "sf_dir": SF, "dim": dim, "index_rows": n_index,
        "train_sec": round(t_train, 2), "append_sec": round(t_append, 2),
        "recall_initial": r_before,
        "recall_after_indist_append": r_after_indist,
        "ood_scale": OOD_SCALE, "recall_ood_batch": r_ood,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

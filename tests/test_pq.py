"""Product quantization: training replays a numpy reference, encoding
is the per-subvector argmin, ADC approximates exact distances with
usable recall, and parameter errors raise early."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from jsonl_dataingestion_pipeline_spark.operators.pq import (
    adc_topk,
    ivfpq_encode,
    ivfpq_topk,
    ivfpq_train,
    pq_encode,
    pq_train,
)

DIM, M, NC, IT = 16, 4, 3, 2
DSUB = DIM // M


def _df(spark, n=60, seed=11):
    rng = np.random.RandomState(seed)
    # cluster structure per subvector so codes are meaningful
    x = rng.normal(size=(n, DIM)) + rng.choice([0.0, 3.0], size=(n, DIM))
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        np.round(x, 9),
    )


def _numpy_train(x):
    ref = [
        [list(x[i, s * DSUB : (s + 1) * DSUB]) for i in range(NC)]
        for s in range(M)
    ]
    for _ in range(IT):
        nxt = [[list(c) for c in cb] for cb in ref]
        for s in range(M):
            sub = x[:, s * DSUB : (s + 1) * DSUB]
            c = np.array(ref[s])
            dd = np.round(
                ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), 6
            )
            a = dd.argmin(axis=1)
            for ci in range(NC):
                mask = a == ci
                if mask.any():
                    nxt[s][ci] = list(np.round(sub[mask].mean(axis=0), 9))
        ref = nxt
    return ref


def test_train_replays_numpy(spark):
    df, x = _df(spark)
    got = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC, iterations=IT
    )
    ref = _numpy_train(x)
    # identical modulo the 1e-9 rounding half-case (np banker's vs
    # Spark HALF_UP): at most one grid step apart
    assert np.abs(np.array(got) - np.array(ref)).max() <= 1.5e-9


def test_encode_is_argmin(spark):
    df, x = _df(spark)
    cbs = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC, iterations=IT
    )
    codes = {
        r.vec_id: list(r.codes)
        for r in pq_encode(df, "embedding", cbs, dim=DIM).collect()
    }
    for i in range(x.shape[0]):
        for s in range(M):
            sub = x[i, s * DSUB : (s + 1) * DSUB]
            dd = np.round(
                ((sub - np.array(cbs[s])) ** 2).sum(axis=1), 6
            )
            assert codes[i][s] == int(dd.argmin())


def test_adc_recall_vs_exact(spark):
    # per-subvector cluster structure a 4-code codebook CAN learn:
    # each subvector is one of 4 well-separated patterns + small noise,
    # so trained PQ cells align with the true neighborhoods.
    rng = np.random.RandomState(5)
    n, ncode = 100, 4
    pats = rng.normal(size=(ncode, DSUB)) * 4.0
    x = np.zeros((n, DIM))
    for i in range(n):
        for s in range(M):
            x[i, s * DSUB : (s + 1) * DSUB] = (
                pats[rng.randint(ncode)] + rng.normal(size=DSUB) * 0.05
            )
    x = np.round(x, 9)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cbs = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=ncode,
        iterations=3,
    )
    q = [float(v) for v in x[0]]
    got = {r.id for r in adc_topk(df, q, cbs, k=10).collect()}
    exact = np.argsort(((x - np.array(q)) ** 2).sum(axis=1))[:10]
    # quantized distances: expect majority overlap with the exact top-10
    assert len(got & set(int(i) for i in exact)) >= 5
    # the query point itself (dist 0) must quantize into the top set
    assert 0 in got


def _clustered_df(spark, n=120, seed=3):
    """Vectors drawn around 3 well-separated anchors, so the coarse
    quantizer has real cells to find and residuals are small."""
    rng = np.random.RandomState(seed)
    anchors = rng.normal(size=(3, DIM)) * 6.0
    x = np.zeros((n, DIM))
    for i in range(n):
        x[i] = anchors[i % 3] + rng.normal(size=DIM) * 0.3
    x = np.round(x, 9)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


def test_ivfpq_encode_shapes_and_residual_argmin(spark):
    df, x = _clustered_df(spark)
    coarse, cbs = ivfpq_train(
        df, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    assert len(coarse) == 3 and len(coarse[0]) == DIM
    assert len(cbs) == M and len(cbs[0]) == 4 and len(cbs[0][0]) == DSUB
    enc = {
        r.vec_id: (r.cell, list(r.codes))
        for r in ivfpq_encode(df, "embedding", coarse, cbs, dim=DIM)
        .collect()
    }
    ca = np.array(coarse)
    cells_seen = set()
    for i in range(x.shape[0]):
        cell, codes = enc[i]
        cells_seen.add(cell)
        # cell is the true coarse argmin
        dd = np.round(((x[i] - ca) ** 2).sum(axis=1), 6)
        assert cell == int(dd.argmin())
        # each code is the argmin over the RESIDUAL subvector
        res = np.round(x[i] - ca[cell], 9)
        for s in range(M):
            sub = res[s * DSUB : (s + 1) * DSUB]
            sd = np.round(((sub - np.array(cbs[s])) ** 2).sum(axis=1), 6)
            assert codes[s] == int(sd.argmin())
    # the 3-anchor structure should occupy every coarse cell
    assert cells_seen == {0, 1, 2}


def test_ivfpq_search_probes_only_and_finds_self(spark):
    df, x = _clustered_df(spark)
    coarse, cbs = ivfpq_train(
        df, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    q = [float(v) for v in x[9]]
    got = ivfpq_topk(df, q, coarse, cbs, nprobe=1, k=10).collect()
    assert [r.adc_rank for r in got] == list(range(1, len(got) + 1))
    # nprobe=1: every hit comes from the single probed cell
    ca = np.array(coarse)
    qcell = int(np.round(((np.array(q) - ca) ** 2).sum(axis=1), 6).argmin())
    assert {r.cell for r in got} == {qcell}
    # the query point itself (residual quantizes to its own codes)
    # must appear in the top set
    assert 9 in {r.id for r in got}
    # residual quantization keeps neighbors from the same anchor:
    # anchor of id 9 is 9 % 3 — the majority of hits share it
    same = sum(1 for r in got if r.id % 3 == 9 % 3)
    assert same >= len(got) * 0.7


def test_ivfpq_residual_beats_raw_pq_distortion(spark):
    # the IVFADC selling point: quantizing residuals yields lower
    # reconstruction error than raw PQ at the same code budget
    df, x = _clustered_df(spark)
    coarse, cbs = ivfpq_train(
        df, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    raw_cbs = pq_train(
        df, "embedding", "vec_id", dim=DIM, m=M, n_codes=4, iterations=2
    )
    ca = np.array(coarse)

    def recon_err_ivf():
        enc = ivfpq_encode(df, "embedding", coarse, cbs, dim=DIM).collect()
        tot = 0.0
        for r in enc:
            rec = ca[r.cell].copy()
            for s, c in enumerate(r.codes):
                rec[s * DSUB : (s + 1) * DSUB] += np.array(cbs[s][c])
            tot += float(((x[r.vec_id] - rec) ** 2).sum())
        return tot

    def recon_err_raw():
        enc = pq_encode(df, "embedding", raw_cbs, dim=DIM).collect()
        tot = 0.0
        for r in enc:
            rec = np.concatenate(
                [np.array(raw_cbs[s][c]) for s, c in enumerate(r.codes)]
            )
            tot += float(((x[r.vec_id] - rec) ** 2).sum())
        return tot

    assert recon_err_ivf() < recon_err_raw()


def test_pq_errors(spark):
    df, _ = _df(spark, n=2)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, "embedding", "vec_id", dim=DIM, m=5)
    with pytest.raises(ValueError, match="seed"):
        pq_train(
            df, "embedding", "vec_id", dim=DIM, m=M, n_codes=NC
        )  # only 2 vectors < n_codes


def test_stored_index_roundtrip_and_partition_pruning(spark, tmp_path):
    """The stored IVF-PQ index (write partitioned by cell -> search
    from disk) must return EXACTLY what the in-memory search returns,
    and the probed-cell predicate must prune at the FILE level: the
    read plan carries a cell PartitionFilter and only nprobe of
    n_cells partition directories exist under the path."""
    import os

    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    coarse, cbs = ivfpq_train(
        df, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(df, path, coarse, cbs)
    # one directory per cell on disk
    cells_on_disk = sorted(
        d for d in os.listdir(path) if d.startswith("cell=")
    )
    assert cells_on_disk == ["cell=0", "cell=1", "cell=2"]

    q = [float(v) for v in x[9]]
    mem = ivfpq_topk(
        df, q, coarse, cbs, nprobe=2, k=10
    ).collect()
    disk_df = ivfpq_topk_from_index(
        spark, path, q, coarse, cbs, nprobe=2, k=10
    )
    disk = disk_df.collect()
    assert [tuple(r) for r in disk] == [tuple(r) for r in mem]

    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = disk_df._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1].splitlines()[0]


def test_append_ivfpq_index_equals_full_rebuild(spark, tmp_path):
    """Incremental stored-index maintenance (VERDICT r7 item #3):
    append-encoding a new batch with FROZEN codebooks, then searching,
    must be bit-identical to re-encoding the union corpus from scratch
    — for every cell probed and at several k."""
    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        append_ivfpq_index,
        ivfpq_topk_from_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    # train on the INITIAL corpus only; the appended batch arrives later
    initial = df.filter(F.col("vec_id") % 3 != 0)
    batch = df.filter(F.col("vec_id") % 3 == 0)
    coarse, cbs = ivfpq_train(
        initial, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )

    inc_path = str(tmp_path / "inc_index")
    write_ivfpq_index(initial, inc_path, coarse, cbs)
    # vec_id % 3 aligns with the anchor assignment, so this batch is
    # ALL of an anchor training never saw — deliberately drift-y, which
    # is exactly the case bit-equivalence must still hold for (frozen
    # codebooks encode identically regardless of distribution); opt out
    # of the round-9 drift POLICY guard, tested separately below
    append_ivfpq_index(batch, inc_path, coarse, cbs, on_drift="ignore")

    full_path = str(tmp_path / "full_index")
    write_ivfpq_index(df, full_path, coarse, cbs)

    q = [float(v) for v in x[9]]
    for k in (3, 10):
        inc = ivfpq_topk_from_index(
            spark, inc_path, q, coarse, cbs, nprobe=3, k=k
        ).collect()
        full = ivfpq_topk_from_index(
            spark, full_path, q, coarse, cbs, nprobe=3, k=k
        ).collect()
        assert [tuple(r) for r in inc] == [tuple(r) for r in full], k

    # the incremental index holds the union corpus exactly once
    n_inc = spark.read.parquet(inc_path).count()
    n_full = spark.read.parquet(full_path).count()
    assert n_inc == n_full == df.count()


def test_append_drift_guard_fires_on_ood_batch(spark, tmp_path):
    """VERDICT r8 item 2: the documented retrain rule becomes code —
    an out-of-distribution batch (the audit's x5-scale corruption,
    which collapses planted recall 1.0 -> 0.0) must be REFUSED by the
    in-path guard before it silently poisons the index, while an
    in-distribution batch sails through."""
    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        append_ivfpq_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    # split WITHOUT correlating with the anchor assignment (i % 3):
    # vec_id % 3 would put one whole anchor in the batch and nothing
    # of it in training — genuinely OOD, which is not the fixture we
    # want for the quiet path
    initial = df.filter(F.col("vec_id") < 90)
    batch = df.filter(F.col("vec_id") >= 90)
    coarse, cbs = ivfpq_train(
        initial, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    path = str(tmp_path / "guarded_index")
    write_ivfpq_index(initial, path, coarse, cbs)
    import os

    assert os.path.isdir(os.path.join(path, "_drift_stats"))
    # the sidecar is INVISIBLE to index reads (underscore prefix)
    n_before = spark.read.parquet(path).count()
    assert n_before == initial.count()

    # in-distribution append: guard stays quiet, rows land
    append_ivfpq_index(batch, path, coarse, cbs)
    assert spark.read.parquet(path).count() == df.count()

    # OOD append (the audit's x5 scale): guard must refuse BEFORE write
    ood = batch.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda v: F.round(v * 5.0, 9)
        ).alias("embedding"),
    )
    n_mid = spark.read.parquet(path).count()
    with pytest.raises(ValueError, match="out-of-distribution"):
        append_ivfpq_index(ood, path, coarse, cbs)
    assert spark.read.parquet(path).count() == n_mid  # nothing written

    # on_drift="warn" appends anyway but says so
    with pytest.warns(UserWarning, match="out-of-distribution"):
        append_ivfpq_index(ood, path, coarse, cbs, on_drift="warn")
    assert spark.read.parquet(path).count() == n_mid + ood.count()


def test_append_without_sidecar_warns_and_appends(spark, tmp_path):
    """A pre-round-9 index (no _drift_stats) appends unchecked with a
    warning — backward compatible, never silently strict."""
    import shutil

    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        append_ivfpq_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    initial = df.filter(F.col("vec_id") % 3 != 0)
    batch = df.filter(F.col("vec_id") % 3 == 0)
    coarse, cbs = ivfpq_train(
        initial, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    path = str(tmp_path / "legacy_index")
    write_ivfpq_index(initial, path, coarse, cbs)
    import os

    shutil.rmtree(os.path.join(path, "_drift_stats"))
    with pytest.warns(UserWarning, match="UNCHECKED"):
        append_ivfpq_index(batch, path, coarse, cbs)
    assert spark.read.parquet(path).count() == df.count()


def test_corrupt_sidecar_raises_instead_of_unchecked_append(spark, tmp_path):
    """Round-9 review: only a MISSING sidecar downgrades the drift
    guard to an unchecked append; a corrupt/unreadable sidecar must
    raise, not silently disable the guard the caller asked to raise."""
    import os

    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        append_ivfpq_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    initial = df.filter(F.col("vec_id") < 90)
    batch = df.filter(F.col("vec_id") >= 90)
    coarse, cbs = ivfpq_train(
        initial, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    path = str(tmp_path / "corrupt_sidecar_index")
    write_ivfpq_index(initial, path, coarse, cbs)
    side = os.path.join(path, "_drift_stats")
    for f in os.listdir(side):
        os.remove(os.path.join(side, f))
    with open(os.path.join(side, "part-00000.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")
    n_before = spark.read.parquet(path).count()
    with pytest.raises(Exception):
        append_ivfpq_index(batch, path, coarse, cbs)
    assert spark.read.parquet(path).count() == n_before


def test_cumulative_drift_canary_and_history_ledger(spark, tmp_path):
    """Round-10 (VERDICT r9 #6): every accepted append writes one
    (n, mean, std, seq) row into the _drift_stats sidecar, and a slow
    drift that stays under the per-batch hard threshold still trips
    the CUMULATIVE canary (n-weighted mean of all appended batches vs
    train mean + cumulative_factor x std) — the retrain-soon warning
    fires before any batch is refused."""
    import os
    import warnings as _warnings

    import pytest

    from jsonl_dataingestion_pipeline_spark.operators.pq import (
        append_ivfpq_index,
        write_ivfpq_index,
    )

    df, x = _clustered_df(spark)
    initial = df.filter(F.col("vec_id") < 90)
    batch = df.filter(F.col("vec_id") >= 90)
    coarse, cbs = ivfpq_train(
        initial, "embedding", "vec_id",
        dim=DIM, n_cells=3, m=M, n_codes=4,
        coarse_iterations=2, pq_iterations=2,
    )
    path = str(tmp_path / "ledger_index")
    write_ivfpq_index(initial, path, coarse, cbs)
    side = os.path.join(path, "_drift_stats")
    rows = spark.read.parquet(side).collect()
    assert [r.seq for r in rows] == [0]

    # in-distribution append: no cumulative warning, one ledger row
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        append_ivfpq_index(batch, path, coarse, cbs)
    assert not [x for x in w if "CUMULATIVE" in str(x.message)]
    rows = spark.read.parquet(side).collect()
    assert sorted(r.seq for r in rows) == [0, 1]

    # drifted-but-accepted appends: a huge drift_factor keeps the hard
    # guard quiet (modeling per-batch drift below the refusal line);
    # the n-weighted cumulative mean must still trip the canary
    drifted = batch.select(
        (F.col("vec_id") + 50_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda v: F.round(v * 2.0, 9)
        ).alias("embedding"),
    )
    with pytest.warns(UserWarning, match="CUMULATIVE"):
        append_ivfpq_index(
            drifted, path, coarse, cbs,
            drift_factor=1e9, cumulative_factor=1.0,
        )
    rows = spark.read.parquet(side).collect()
    assert sorted(r.seq for r in rows) == [0, 1, 2]
    # the ledger records the drifted batch's elevated mean
    by_seq = {r.seq: r for r in rows}
    assert by_seq[2].mean_qerr_u > by_seq[0].mean_qerr_u
    assert by_seq[2].n == drifted.count()

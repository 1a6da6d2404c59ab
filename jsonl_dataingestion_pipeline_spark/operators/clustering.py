"""Distributed k-means clustering over embedding columns.

The curation use case: cluster the corpus embedding space, then curate
per cluster — SemDeDup (Abbas et al. 2023) prunes near-duplicates
WITHIN k-means clusters; density/diversity sampling picks per-cluster
quotas; cluster-balanced training mixes weight clusters evenly. The
``semantic_dedup`` operator (operators/similarity.py) buckets by a
label column; :func:`kmeans` is what produces such a label from raw
embeddings when none exists.

Spark-first shape (Lloyd's algorithm):

- **Assignment is pure codegen, zero shuffle.** Centroids are k×d
  doubles — by definition of k-means they fit on the driver — so each
  iteration collects them (k rows, the same class of driver-side
  scalar as PageRank's ``|V|`` count) and embeds them as literal
  arrays in a single projection: squared-L2 distance per centroid via
  ``zip_with`` + ``aggregate`` fold, argmin via ``array_min`` over
  (dist, cluster) structs. No per-row Python, no join, no shuffle —
  the 100 TB cost of an iteration is one scan.
- **The update step is the only shuffle**: ``posexplode`` the vectors
  and average per (cluster, dimension) — n·d narrow rows into a
  map-side partial aggregate of at most k·d groups.
- **For k·d too large to embed in codegen** (SemDeDup-realistic k is
  10⁴-10⁵ clusters, where a k·d-literal projection would blow up the
  generated code), ``assign_via_join=True`` ships the centroids as a
  ONE-ROW broadcast frame holding an ``array<struct<c,cv>>`` column:
  a ``BroadcastNestedLoopJoin`` glues that row onto every point
  partition and the argmin is ``array_min`` over a ``transform`` of
  the runtime array — data, not code, so k is bounded by broadcast
  memory (k=10⁵ × d=768 doubles ≈ 600 MB — chunk above that), not by
  the JVM's 64 KB method limit. Still zero shuffle: strictly better
  than the centroid-join + ``min_by`` alternative, which would
  shuffle n·k joined rows into a per-point aggregate. The fold, the
  rounding, and the (dist, cluster) tie-break are byte-identical to
  the literal path, so both modes return bit-equal assignments
  (differential-tested); ``assign_via_join=None`` (default) picks the
  join path automatically when k·d exceeds ``AUTO_JOIN_KD``.

Determinism / oracle replay (same discipline as ``graph.pagerank``):
the update-step mean is **integer-exact** — each coordinate is
quantized once to the ``scale`` grid (``round(x * 10^scale)`` as a
64-bit integer) and the per-(cluster, dim) aggregate sums those
integers, which is associative/commutative EXACTLY, so the resulting
centroid cannot depend on shuffle/partition order at all (a plain
float ``AVG`` re-rounded to the grid still flips when a sum lands
within ulps of a grid boundary — the failure mode this kills).
Assignment distances are rounded to ``dist_scale`` before the argmin
(the fold order is fixed per-row, hence deterministic), ties broken
by the smaller cluster id — so a DuckDB replay of the unrolled
iterations matches bit-for-bit run after run.
Default initial centroids are the vectors of the k smallest ids:
deterministic and replayable. ``init="kmeans||"`` swaps in the Bahmani
et al. scalable k-means++ seeding (:func:`kmeansll_init`) — the
standard 100 TB move when fixed init risks merging true clusters;
deterministic via hash coins, but not SQL-replayable, so the
oracle-checked paths keep the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: k·d above which ``assign_via_join=None`` switches from the literal
#: codegen projection to the one-row broadcast-array assignment. 4096
#: keeps the generated method for the literal path well under the JVM's
#: 64 KB bytecode-per-method limit.
AUTO_JOIN_KD = 4096


def _sqdist_cols(vec, cvec):
    """Squared L2 between two array<double> columns, as a sequential
    fold (matches DuckDB's list_sum order). Shared by both assignment
    modes so their float summation order is byte-identical."""
    return F.aggregate(
        F.zip_with(vec, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sqdist(vec, centroid_lits):
    """Squared L2 between an array column and a literal double array."""
    return _sqdist_cols(
        vec, F.array(*[F.lit(float(x)) for x in centroid_lits])
    )


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    iterations: int = 4,
    scale: int = 9,
    dist_scale: int = 6,
    assign_via_join: bool | None = None,
    init: str = "first_k",
) -> DataFrame:
    """Lloyd's k-means over ``vec_col`` (array<float/double>).

    Returns (``id_col``, cluster: int, dist2: double) — each point's
    final cluster and its squared distance (rounded to ``dist_scale``)
    to that centroid. Empty clusters keep their previous centroid.

    ``assign_via_join``: False = k·d-literal codegen projection;
    True = one-row broadcast ``array<struct>`` assignment (large-k
    path, bit-equal results); None (default) = join path iff
    ``k * d > AUTO_JOIN_KD``. See module note for plan shapes.

    ``init``: ``"first_k"`` (default — the k smallest ids' vectors,
    bit-replayable by the oracle) or ``"kmeans||"`` — the Bahmani et
    al. (2012) scalable k-means++ seeding via :func:`kmeansll_init`
    (deterministic hash-coin variant; better starting inertia on
    adversarially ordered data, still fully reproducible but not
    SQL-replayable — keep ``first_k`` for oracle-checked paths).
    """
    from jsonl_dataingestion_pipeline_spark.operators.common import (
        pipeline_break,
    )

    pts = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col).cast("array<double>"),
                    lambda x: F.round(x, scale)).alias("__v"),
    )
    # materialize the quantized points ONCE (optimization guide §5
    # caching: reused every iteration, recompute = a full upstream
    # re-scan per Lloyd round + the final assignment — the standard
    # k-means input-caching discipline)
    pts = pipeline_break(pts)
    if init == "kmeans||":
        seeds = kmeansll_init(pts, "__v", id_col, k=k, scale=scale)
        centroids = {cid: list(v) for cid, v in enumerate(seeds)}
        d = len(seeds[0])
    elif init == "first_k":
        # deterministic init: the k smallest ids' vectors (k driver rows)
        init_rows = pts.orderBy(id_col).limit(k).collect()
        if len(init_rows) < k:
            raise ValueError(
                f"kmeans: need >= k={k} points, got {len(init_rows)}"
            )
        centroids = {cid: list(r["__v"]) for cid, r in enumerate(init_rows)}
        d = len(init_rows[0]["__v"])
    else:
        raise ValueError(f"kmeans: unknown init {init!r}")
    if assign_via_join is None:
        # join path also when iterating (optimization guide §1.2
        # per-task work): the literal path bakes k*d doubles into the
        # generated code, so EVERY iteration's new centroids force a
        # fresh janino compile (measured ~2x the 3-iteration wall at
        # k*d=512); the join path's expression tree is
        # centroid-independent, so the codegen cache hits across
        # iterations. Bit-equal results either way (same fold/round/
        # tie-break — the q133 oracle replay proves it).
        assign_via_join = iterations > 1 or k * d > AUTO_JOIN_KD
    spark = df.sparkSession

    def assign_literal(frame):
        structs = [
            F.struct(
                F.round(_sqdist(F.col("__v"), centroids[cid]),
                        dist_scale).alias("d"),
                F.lit(cid).alias("c"),
            )
            for cid in sorted(centroids)
        ]
        return frame.withColumn("__a", F.array_min(F.array(*structs)))

    def assign_join(frame):
        # centroids as DATA: one row, one array<struct<c,cv>> column,
        # broadcast-nested-loop-glued onto every point partition. The
        # argmin runs over the runtime array, so k never touches the
        # generated code size. Zero shuffle, same fold/round/tie-break
        # as the literal path.
        cents = [
            (int(cid), [float(x) for x in centroids[cid]])
            for cid in sorted(centroids)
        ]
        cdf = spark.createDataFrame(
            [(cents,)], "__cents array<struct<c:int,cv:array<double>>>"
        )
        best = F.array_min(
            F.transform(
                F.col("__cents"),
                lambda s: F.struct(
                    F.round(
                        _sqdist_cols(F.col("__v"), s["cv"]), dist_scale
                    ).alias("d"),
                    s["c"].alias("c"),
                ),
            )
        )
        return (
            frame.crossJoin(F.broadcast(cdf))
            .withColumn("__a", best)
            .drop("__cents")
        )

    assign = assign_join if assign_via_join else assign_literal

    grid = float(10**scale)
    for _ in range(iterations):
        assigned = assign(pts)
        # the ONLY shuffle: (cluster, dim) partial-aggregated means.
        # Integer-exact: coordinates quantize to the 10^-scale grid
        # ONCE, the sum runs over exact integers (order-independent by
        # construction), and the mean divides the exact sum — so the
        # centroid is identical across any shuffle order / partition
        # layout / engine (see module note).  The addends enter as
        # decimal(18,0) so Spark widens SUM to decimal(38,0): no int64
        # wrap even at ~1e38 quantized mass per (cluster, dim), matching
        # DuckDB's SUM(BIGINT)→HUGEINT exactness (the _cov_explode /
        # PCA exact-grid discipline).
        upd = (
            assigned.select(
                F.col("__a.c").alias("__c"),
                F.posexplode(F.col("__v")).alias("__j", "__x"),
            )
            .groupBy("__c", "__j")
            .agg(
                F.round(
                    (
                        F.sum(
                            F.round(F.col("__x") * grid)
                            .cast("decimal(18,0)")
                        ).cast("double")
                        / F.count(F.lit(1)).cast("double")
                    )
                    / F.lit(grid),
                    scale,
                ).alias("__m")
            )
            .groupBy("__c")
            .agg(F.array_sort(F.collect_list(F.struct("__j", "__m"))).alias(
                "__e"
            ))
            .select("__c", F.col("__e.__m").alias("__cv"))
            .collect()
        )
        new = {r["__c"]: list(r["__cv"]) for r in upd}
        # empty clusters keep their previous centroid
        centroids = {cid: new.get(cid, centroids[cid]) for cid in centroids}
        if any(len(v) != d for v in centroids.values()):
            raise ValueError("kmeans: ragged vector lengths in input")

    final = assign(pts)
    return final.select(
        F.col(id_col),
        F.col("__a.c").alias("cluster"),
        F.col("__a.d").alias("dist2"),
    )


def _dist2_to_candidates(frame, vec_col, cands, spark, scale):
    """``frame`` + a ``__d2`` column = squared distance to the nearest
    of ``cands`` (list of vectors), via the same one-row broadcast
    array<struct> shape as the large-k assignment — candidate count
    never touches codegen size."""
    arr = [(i, [float(x) for x in v]) for i, v in enumerate(cands)]
    cdf = spark.createDataFrame(
        [(arr,)], "__cs array<struct<i:int,cv:array<double>>>"
    )
    d2 = F.array_min(
        F.transform(
            F.col("__cs"),
            lambda s: F.round(
                _sqdist_cols(F.col(vec_col), s["cv"]), scale
            ),
        )
    )
    return (
        frame.crossJoin(F.broadcast(cdf))
        .withColumn("__d2", d2)
        .drop("__cs")
    )


def kmeansll_init(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int,
    rounds: int = 5,
    oversample: float = 2.0,
    scale: int = 9,
) -> list:
    """k-means|| seeding (Bahmani et al., VLDB 2012) — the scalable
    k-means++ init, DETERMINISTIC variant. Returns k seed vectors.

    The classic weakness of fixed init (first-k ids) is adversarial
    layout: if the first k points sit in one true cluster, Lloyd's can
    converge with several true clusters merged. k-means|| fixes that
    with O(rounds) passes, each sampling ~``oversample * k`` points
    with probability proportional to their squared distance from the
    current seed set — exactly MLlib's seeding strategy, re-expressed:

    - the per-point distance is the same one-row broadcast
      array<struct> projection as the large-k assignment (candidate
      count stays out of codegen), so each round is ONE scan + a
      1-row sum aggregate + a filtered collect of ~l new candidates;
    - the sampling coin is ``xxhash64(id, round)`` mapped into [0, 1)
      — deterministic, partition-independent, reproducible across
      runs and layouts (same discipline as functions/sampling.py);
    - the O(rounds * l) collected candidates are weighted by their
      assigned-point counts (one aggregate) and reduced to k seeds
      driver-side with the deterministic farthest-point variant of
      weighted k-means++ (argmax weight * d², ties -> first collected)
      — candidates are driver-small by construction, the same scalar
      class as the centroid pulls.

    Not SQL-replayable (the oracle would need the full multi-round
    sampling trace), so oracle-checked paths keep ``init="first_k"``.
    """
    spark = df.sparkSession
    pts = df.select(F.col(id_col).alias("__id"), F.col(vec_col))
    first = pts.orderBy("__id").limit(1).collect()
    if not first:
        raise ValueError("kmeansll_init: empty input")
    cands: list = [list(first[0][vec_col])]
    l = max(int(oversample * k), 1)
    coin = (F.pmod(F.xxhash64(F.col("__id"), F.col("__r")), F.lit(2**30))
            .cast("double") / F.lit(float(2**30)))
    for r in range(rounds):
        scored = _dist2_to_candidates(pts, vec_col, cands, spark, scale)
        phi = scored.agg(F.sum("__d2")).first()[0]
        if not phi:  # every point already a seed (or coincides with one)
            break
        picked = (
            scored.withColumn("__r", F.lit(r))
            .filter(coin < F.lit(float(l)) * F.col("__d2") / F.lit(float(phi)))
            .select("__id", vec_col)
            .orderBy("__id")
            .collect()
        )
        cands.extend(list(row[vec_col]) for row in picked)
    # weight candidates by assigned-point counts (one scan + one agg)
    arr = [(i, [float(x) for x in v]) for i, v in enumerate(cands)]
    cdf = spark.createDataFrame(
        [(arr,)], "__cs array<struct<i:int,cv:array<double>>>"
    )
    best = F.array_min(
        F.transform(
            F.col("__cs"),
            lambda s: F.struct(
                F.round(_sqdist_cols(F.col(vec_col), s["cv"]), scale)
                .alias("d"),
                s["i"].alias("i"),
            ),
        )
    )
    wrows = (
        pts.crossJoin(F.broadcast(cdf))
        .select(best["i"].alias("__c"))
        .groupBy("__c")
        .agg(F.count(F.lit(1)).alias("__w"))
        .collect()
    )
    weights = {r["__c"]: r["__w"] for r in wrows}

    # driver-side deterministic weighted k-means++ (farthest-point):
    # start from the heaviest candidate, then repeatedly take the
    # candidate maximizing weight * distance² to the chosen set.
    def sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    order = sorted(range(len(cands)),
                   key=lambda i: (-weights.get(i, 0), i))
    chosen = [order[0]]
    while len(chosen) < k and len(chosen) < len(cands):
        scores = []
        for i in range(len(cands)):
            if i in chosen:
                continue
            d2 = min(sq(cands[i], cands[j]) for j in chosen)
            scores.append((-(weights.get(i, 0) * d2), i))
        scores.sort()
        chosen.append(scores[0][1])
    if len(chosen) < k:
        raise ValueError(
            f"kmeansll_init: only {len(chosen)} distinct seeds for k={k}; "
            "raise rounds/oversample or lower k"
        )
    return [cands[i] for i in chosen]

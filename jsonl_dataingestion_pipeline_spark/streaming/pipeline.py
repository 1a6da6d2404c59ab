"""Streaming ingestion (SURVEY.md §7.1 M6).

The reference's "poll for the latest CSV" loop (`src/ingestor.py:35-65`)
becomes a Structured Streaming file source: new files in the input
directory are discovered incrementally, pushed through the *same* batch
transform via ``foreachBatch``, and written to the JSONL target. Each
micro-batch lands in its own ``batch_id=<n>`` subdirectory with
overwrite semantics, which makes a replayed batch (foreachBatch is
at-least-once) rewrite the same directory instead of appending
duplicates — effectively-once output without a transactional sink.

Also provides watermarked event aggregation (tumbling windows + late-data
handling) over an events stream — the streaming-native operator surface.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.shipment import AsOf, build_documents, transform_shipments
from ..schema import raw_csv_schema, COLUMN_MAPPING


def stream_shipment_csv(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    as_of: AsOf = None,
    trigger_available_now: bool = True,
    idempotent: bool = True,
):
    """Incremental CSV -> documents -> JSONL stream.

    File-source streaming requires a fixed schema, so the strict header
    contract is applied positionally (the batch reader's per-file header
    check runs in strict batch mode instead).

    ``foreachBatch`` guarantees at-least-once delivery: after a failure or
    restart the same batch_id can be replayed. With ``idempotent=True``
    (default) each batch overwrites its own ``batch_id=<n>/`` subdirectory
    under ``output_dir`` — a replay rewrites identical content in place,
    so readers of ``output_dir`` never see duplicates (read back with a
    recursive glob or partition discovery; ``batch_id`` surfaces as a
    partition column). ``idempotent=False`` restores the flat
    ``source_group=<g>/`` layout at plain-append (at-least-once)
    semantics — duplicate documents are possible after a replay.
    """
    raw = (
        spark.readStream.schema(raw_csv_schema())
        .option("header", True)
        .csv(input_dir)
    )
    canonical = raw.toDF(*[dst for _, dst in COLUMN_MAPPING])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = build_documents(transform_shipments(batch_df, as_of=as_of))
        if idempotent:
            (
                docs.write.mode("overwrite")
                .partitionBy("source_group")
                .json(f"{output_dir}/batch_id={batch_id}")
            )
        else:
            (
                docs.write.mode("append")
                .partitionBy("source_group")
                .json(output_dir)
            )

    writer = (
        canonical.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_stream_output(
    spark: SparkSession,
    stream_dir: str,
    final_dir: str,
    *,
    finalize_names: bool = False,
) -> int:
    """Publish the idempotent stream layout into the reference's flat one.

    Reads every ``batch_id=<n>/source_group=<g>/`` micro-batch directory
    under ``stream_dir`` (partition discovery supplies both columns),
    drops the ``batch_id``, and rewrites ``final_dir`` as the flat
    ``source_group=<g>/`` layout — one atomic overwrite, so consumers of
    ``final_dir`` never observe a half-published state. Optionally applies
    the ``<stem>_<tag>_<n>.jsonl`` naming contract. Returns the number of
    documents published.
    """
    from ..sources.jsonl import finalize_filenames, write_documents

    docs = spark.read.json(stream_dir)
    if "batch_id" in docs.columns:
        docs = docs.drop("batch_id")
    write_documents(docs, final_dir)
    n = docs.count()
    if finalize_names:
        finalize_filenames(spark, final_dir)
    return n


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a (possibly streaming)
    events frame: late rows beyond the watermark are dropped, state is
    bounded — the canonical scale-safe streaming agg."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "total_value",
        )
    )


def multi_resolution_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: the same events bucketed at
    several time resolutions in one result (resolution column tags each).

    Batch form shown here; incrementally maintainable by running the same
    expression inside ``foreachBatch`` with an upsert sink. Each
    resolution is one partial-agg + shuffle on (bucket, key); the union is
    plan-parallel.
    """
    parts = []
    for res in resolutions:
        parts.append(
            events.groupBy(
                F.lit(res).alias("resolution"),
                F.date_trunc(res, F.col(ts_col)).alias("bucket"),
                F.col(key_col),
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.round(F.sum(value_col), 2).alias("total_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
    max_delay: str = "interval 1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join (impressions ⋈ clicks shape).

    Right rows match a left row with the same key when they land inside
    ``(left_ts, left_ts + max_delay]``. Both sides carry watermarks and
    the join condition bounds event time in both directions, so the state
    store provably evicts: left state is held ``max_delay`` past its
    watermark, right state until its own watermark passes — bounded
    memory at any stream volume (the unbounded-state join Spark would
    otherwise reject in append mode).

    Works identically on batch frames (plain interval join) — that's the
    tested parity path.
    """
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(max_delay))
    )
    return l.join(r, cond, "inner").drop(r[key])


def maintain_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("hour", "day"),
    trigger_available_now: bool = True,
):
    """Incrementally maintained multi-resolution rollup (continuous
    aggregate): each micro-batch only touches the (resolution, bucket)
    partitions its events fall into.

    Per batch: aggregate the batch, read ONLY the affected partitions
    from the parquet target (partition pruning via the bucket-date join),
    merge-aggregate old + delta, and rewrite just those partitions
    (``partitionOverwriteMode=dynamic``). Work per batch is proportional
    to the batch's bucket span, not the table's history — the property
    that makes a year-long rollup maintainable at 100 TB.

    The target is parquet partitioned by (resolution, bucket_date) and
    stores UNROUNDED sums — merging rounded partials would drift
    (sum-of-rounded ≠ round-of-sum); round at read time to match
    :func:`multi_resolution_rollup`'s batch output.
    """

    def _delta(batch_df: DataFrame) -> DataFrame:
        parts = []
        for res in resolutions:
            parts.append(
                batch_df.groupBy(
                    F.lit(res).alias("resolution"),
                    F.date_trunc(res, F.col(ts_col)).alias("bucket"),
                    F.col(key_col),
                ).agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.sum(value_col).alias("total_value"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn("bucket_date", F.to_date("bucket"))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        delta = _delta(batch_df)
        if delta.isEmpty():
            return
        try:
            existing = spark.read.parquet(target_dir)
            touched = delta.select("resolution", "bucket_date").distinct()
            old = existing.join(
                F.broadcast(touched), on=["resolution", "bucket_date"]
            )
            merged = (
                old.unionByName(delta)
                .groupBy("resolution", "bucket", "bucket_date", key_col)
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        except Exception:  # first batch: nothing to merge
            merged = delta
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("resolution", "bucket_date")
            .parquet(target_dir)
        )

    writer = (
        events_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window aggregation (gap-based) per user.

    Uses Spark's native ``session_window`` — state-store backed in
    streaming mode, plain aggregation in batch mode.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact deduplication of an event stream by key.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark horizon — bounded state, the only viable form at 100 TB/day
    stream volume (plain ``dropDuplicates`` on a stream accumulates state
    forever). Duplicates arriving within the watermark window are
    removed; a duplicate arriving later than the watermark is considered
    a new record (the at-least-once ingestion contract).

    With ``within_watermark=False`` falls back to global
    ``dropDuplicates`` (unbounded state — test/small-stream use only).
    """
    w = events.withWatermark(ts_col, watermark)
    if within_watermark:
        return w.dropDuplicatesWithinWatermark(key_cols)
    return w.dropDuplicates(key_cols)


def ingest_stream_incremental_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    base_path: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    sample_hex_prefix: str = "0",
    trigger_available_now: bool = True,
):
    """Streaming corpus ingestion with batch-vs-base dedup.

    Each micro-batch is deduplicated against the curated base corpus at
    ``base_path`` (parquet) via :func:`operators.dedup.incremental_dedup`
    — exact normalized-key anti-join plus cross-corpus near-dup
    verification, never self-joining the base — then appended to
    ``output_dir`` in its own idempotent ``batch_id=<n>`` partition.

    At 100 TB the base sits in object storage; each batch's cost is
    proportional to the batch (keys and sampled shingles of the base are
    the only base-side relations shuffled). In-stream duplicate arrivals
    should additionally be guarded with :func:`dedup_stream`
    (dropDuplicatesWithinWatermark) upstream of this sink.
    """
    from jsonl_dataingestion_pipeline_spark.operators.dedup import (
        incremental_dedup,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        base = spark.read.parquet(base_path)
        kept = incremental_dedup(
            batch_df,
            base,
            text_col,
            id_col,
            threshold=threshold,
            sample_hex_prefix=sample_hex_prefix,
        )
        kept.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class _PosixLabelFs:
    """Label-directory operations on a local posix filesystem —
    the fast path (``os.rename`` is a metadata-only atomic syscall)."""

    @staticmethod
    def _p(path: str) -> str:
        return path.split("://", 1)[1] if path.startswith("file://") else path

    def exists(self, path: str) -> bool:
        import os

        return os.path.isdir(self._p(path))

    def rename(self, src: str, dst: str) -> None:
        import os

        os.rename(self._p(src), self._p(dst))

    def rmtree(self, path: str) -> None:
        import shutil

        shutil.rmtree(self._p(path))


class _HadoopLabelFs:
    """Label-directory operations through the Hadoop FileSystem API —
    scheme-agnostic (``hdfs://``, ``s3a://``, ``file:``, ...): the
    FileSystem instance is resolved from the labels URI against the
    session's Hadoop configuration, exactly the way Spark's own
    writers resolve their output paths, so any store the cluster can
    write parquet to can hold the labeling. Rename failures (e.g. a
    destination that already exists, or a store that rejects the op)
    surface as errors instead of a silently-skipped swap."""

    def __init__(self, spark: SparkSession, labels_path: str) -> None:
        jvm = spark.sparkContext._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(labels_path).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(
                f"hadoop fs rename failed: {src!r} -> {dst!r} (the "
                "destination may already exist, or the store rejected "
                "the rename)"
            )

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._Path(path), True)


def stream_incremental_components(
    spark: SparkSession,
    edge_stream: DataFrame,
    labels_path: str,
    checkpoint_dir: str,
    *,
    src_col: str = "id_l",
    dst_col: str = "id_r",
    trigger_available_now: bool = True,
    use_hadoop_fs: bool | None = None,
):
    """Streaming maintenance of a connected-components labeling — the
    production mode of :func:`operators.dedup.
    incremental_connected_components` (q160): near-dup pair edges
    arrive as a stream, and each micro-batch folds into the persisted
    labeling at ``labels_path`` (parquet, columns ``id``/``comp``)
    without ever recomputing components from scratch.

    Each batch: read the current labeling, contract the batch to the
    component graph (batch-bounded inner CC, the base side streams
    map-side), and atomically replace the labeling (write to a
    ``batch_id`` staging directory, then swap — readers of
    ``labels_path`` see either the old or the new complete labeling).
    Min-id labels are canonical, so after N batches the labeling is
    IDENTICAL to a from-scratch run over all edges — the q160 oracle's
    theorem, applied per micro-batch.

    At 100 TB the labeling lives in object storage; per-batch cost is
    O(batch) plus one broadcast-mapped pass over the labels.

    ``labels_path`` may be any URI the cluster's Hadoop configuration
    can reach (``hdfs://``, ``s3a://``, ``file:///``, a plain posix
    path, ...): exists/rename/delete route through the Hadoop
    FileSystem API (:class:`_HadoopLabelFs`), with a posix fast path
    (plain ``os.rename``) for scheme-less local paths. The swap itself
    is crash-safe in both directions regardless of filesystem: the new
    labeling is renamed aside the old one FIRST (old -> ``.old``,
    staging -> live, delete ``.old`` last), so no window exists in
    which the only complete labeling has been deleted; recovery after
    a crash between the two renames restores ``.old``. On HDFS the
    rename is additionally atomic for readers; on S3A rename is
    copy+delete, so concurrent READERS of ``labels_path`` can observe
    a partial directory mid-swap — point readers at a manifest or a
    table format there, the WRITER-side crash-safety is unaffected.
    Pass ``use_hadoop_fs=True`` to force the Hadoop API even for local
    paths (the scheme-agnostic path the tests drive with ``file:``).
    """
    from jsonl_dataingestion_pipeline_spark.operators.dedup import (
        incremental_connected_components,
    )

    scheme = labels_path.split("://", 1)[0] if "://" in labels_path else ""
    if scheme == "file":
        # accept ONLY the empty-authority form file:///abs/path (a
        # non-empty authority file://host/... would resolve relative
        # to an unexpected root); keep the URI form — the Hadoop
        # LocalFileSystem understands it natively.
        rest = labels_path.split("://", 1)[1]
        if not rest.startswith("/"):
            raise ValueError(
                "stream_incremental_components: file:// labels URIs "
                "must use the empty-authority form file:///abs/path "
                f"(got {labels_path!r})"
            )
    if use_hadoop_fs is None:
        use_hadoop_fs = bool(scheme)
    if not use_hadoop_fs and scheme not in ("", "file"):
        raise ValueError(
            "stream_incremental_components: use_hadoop_fs=False is "
            f"only valid for local paths, got scheme {scheme!r}"
        )
    store = (
        _HadoopLabelFs(spark, labels_path)
        if use_hadoop_fs
        else _PosixLabelFs()
    )

    old = f"{labels_path}.__old"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # recover from a crash that left the previous swap half-done:
        # if only .old exists, the old labeling is still the newest
        # complete one — restore it before folding the next batch
        if store.exists(old) and not store.exists(labels_path):
            store.rename(old, labels_path)
        if store.exists(old):
            store.rmtree(old)
        edges = batch_df.select(
            F.col(src_col).alias("id_l"), F.col(dst_col).alias("id_r")
        )
        if store.exists(labels_path):
            base = spark.read.parquet(labels_path)
        else:
            base = spark.createDataFrame([], "id long, comp long")
        updated = incremental_connected_components(base, edges)
        staging = f"{labels_path}.__staging_batch_{batch_id}"
        updated.write.mode("overwrite").parquet(staging)
        # crash-safe swap: NEVER delete the only complete labeling.
        # rename old aside, rename staging in, delete the .old copy
        # last — a crash at any point leaves a complete labeling on
        # disk under labels_path or labels_path.__old.
        if store.exists(labels_path):
            store.rename(labels_path, old)
        store.rename(staging, labels_path)
        if store.exists(old):
            store.rmtree(old)

    writer = edge_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

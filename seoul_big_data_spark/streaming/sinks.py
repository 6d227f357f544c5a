"""Streaming sinks and cross-batch semantics (SURVEY.md §2.8 scale path).

Three building blocks a production stream needs beyond a memory/console
sink:

- ``foreach_batch_idempotent``: exactly-once-per-batch parquet sink.
  Structured Streaming guarantees ``foreachBatch`` is called with a
  monotonically increasing ``batch_id`` and re-delivers the SAME batch id on
  retry after failure; writing each batch to its own ``batch_id=N``
  partition with dynamic overwrite makes the retry idempotent — re-running
  a failed batch replaces its own partition instead of duplicating rows.
  This is the file-sink transactionality pattern without a table format;
  Delta/Iceberg replace the directory convention with a commit log, same
  call site.

- ``dedup_within_watermark``: cross-micro-batch deduplication with bounded
  state (``dropDuplicatesWithinWatermark``) — the streaming side of the
  north-star dedup family: state for a key is dropped once the watermark
  passes it, so the dedup set does not grow with the stream.

- ``enriched_stream_stream_join``: watermarked stream-stream interval join
  (click joined to the impression that preceded it within a bounded
  window). Both sides buffer only the watermark horizon of state — the
  join works on an unbounded stream precisely because the interval bounds
  + watermarks let Spark evict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def foreach_batch_idempotent(
    stream: DataFrame, path: str, partition_col: str = "batch_id"
) -> DataStreamWriter:
    """Exactly-once-per-batch parquet sink via foreachBatch + per-batch
    partition overwrite. Returns the configured writer (caller adds
    checkpoint/trigger and starts)."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(partition_col, F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return stream.writeStream.foreachBatch(_write)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Cross-batch exact dedup with bounded state: a duplicate arriving
    within ``watermark`` of the first sighting is dropped; state for keys
    older than the watermark is evicted. At 100 TB stream volume this is the
    only tenable exact-dedup contract — unbounded-lookback dedup would
    accrete state forever (that case is the batch MinHash/exact dedup's
    job over the landed data)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enriched_stream_stream_join(
    impressions: DataFrame,
    clicks: DataFrame,
    join_key: str = "user_id",
    max_delay: str = "30 minutes",
    wm: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click matched to
    impressions by the same user that happened in the ``max_delay`` window
    before the click. The time bound is mandatory — it is what lets each
    side's buffered state be evicted once the watermark passes, keeping
    state proportional to (rate × horizon), not stream length."""
    imp = impressions.select(
        F.col(join_key).alias("i_key"),
        F.col("ts").alias("imp_ts"),
        F.col("event_id").alias("imp_id"),
    ).withWatermark("imp_ts", wm)
    clk = clicks.select(
        F.col(join_key).alias("c_key"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", wm)
    return imp.join(
        clk,
        (F.col("i_key") == F.col("c_key"))
        & (F.col("imp_ts") < F.col("click_ts"))
        & (F.col("imp_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_delay}")),
    ).select(
        F.col("i_key").alias(join_key), "imp_id", "click_id", "imp_ts", "click_ts"
    )


def continuous_rollup(
    events: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str] | None = None,
    value_col: str = "value",
):
    """Continuous-aggregate maintenance (the streaming face of
    operators/rollup.py): each micro-batch is reduced to PARTIAL form and
    merged into the persisted rollup table inside ``foreachBatch`` — the
    state on disk is always merge(partials so far), byte-equal to a batch
    recompute over every event seen, at O(|batch| + touched buckets) per
    trigger.

    Exactly-once across failures: foreachBatch re-delivers the SAME batch_id
    after a crash between the state write and the checkpoint commit, so the
    merge must be idempotent per batch id. The committed state carries the
    last-applied batch id (``_applied_batch`` marker — underscore-prefixed,
    so parquet discovery ignores it) and a replayed id merges nothing.
    Commit is an atomic-rename swap (staged dir → state dir, old state kept
    aside until the swap lands), with crash recovery for the
    between-renames window. State existence is decided by the marker, not a
    bare except — a transient read failure propagates instead of silently
    resetting the accumulated rollup to the current batch.
    """
    return (
        events.writeStream.foreachBatch(
            rollup_merge_fn(state_path, keys or ["event_type"], value_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def rollup_merge_fn(state_path: str, keys: list[str], value_col: str = "value"):
    """The foreachBatch merge kernel behind ``continuous_rollup``, exposed so
    the replay/crash semantics are directly testable. Protocol per batch:

    1. recover: if a previous run died between the two commit renames, the
       state sits intact under ``._old`` — rename it back.
    2. idempotency guard: if the committed marker already covers this
       batch_id (a foreachBatch replay), do nothing.
    3. merge partial(batch) into the committed state (marker presence — not
       a bare except — decides whether prior state exists; genuine read
       errors propagate rather than wiping state).
    4. commit: write staged dir + marker, swap via atomic renames.
    """
    from ..operators.rollup import merge_rollups, partial_rollup

    def _applied(path: str):
        import os

        marker = os.path.join(path, "_applied_batch")
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return int(fh.read().strip())

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch_df.sparkSession
        old = state_path + "._old"
        if not os.path.exists(state_path) and os.path.exists(old):
            os.rename(old, state_path)  # crash between the commit renames
        applied = _applied(state_path)
        if applied is not None and batch_id <= applied:
            return  # replayed batch: already folded into committed state
        part = partial_rollup(batch_df, keys, value_col)
        if applied is not None:
            merged = merge_rollups(spark.read.parquet(state_path), part)
        else:
            merged = merge_rollups(part)
        staged = state_path + f"._b{batch_id}"
        merged.write.mode("overwrite").parquet(staged)
        with open(os.path.join(staged, "_applied_batch"), "w") as fh:
            fh.write(str(batch_id))
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(state_path):
            os.rename(state_path, old)
        os.rename(staged, state_path)
        shutil.rmtree(old, ignore_errors=True)

    return _merge


def clicks_left_outer_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    join_key: str = "user_id",
    max_delay: str = "30 minutes",
    wm: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every click emits, with
    its attributed impression where one exists and NULLs where none does —
    the "unattributed traffic" feed an ads pipeline needs beside the inner
    match (``enriched_stream_stream_join``).

    The outer semantics are only well-defined BECAUSE of the watermark +
    interval bound: a click can be declared unmatched (NULL impression)
    only once the watermark has passed its entire candidate window, i.e.
    no straggler impression can still arrive. Spark therefore holds each
    unmatched click in state until ``wm`` expires it, then emits the NULL
    row — so outer results trail the watermark by design, and state stays
    bounded at (rate × horizon) exactly like the inner join. The batch
    left-join over the same interval predicate is the parity oracle in
    tests/test_streaming_sinks.py.
    """
    imp = impressions.select(
        F.col(join_key).alias("i_key"),
        F.col("ts").alias("imp_ts"),
        F.col("event_id").alias("imp_id"),
    ).withWatermark("imp_ts", wm)
    clk = clicks.select(
        F.col(join_key).alias("c_key"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", wm)
    return clk.join(
        imp,
        (F.col("i_key") == F.col("c_key"))
        & (F.col("imp_ts") < F.col("click_ts"))
        & (F.col("imp_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_delay}")),
        "leftOuter",
    ).select(
        F.col("c_key").alias(join_key),
        "click_id",
        "click_ts",
        "imp_id",
        "imp_ts",
    )


def txn_sink_fn(txn_dir: str, data_dir: str):
    """foreachBatch sink committing each micro-batch's FACT rows and a
    1-row AUDIT record through one multi-table transaction
    (sources/incremental.py::commit_transaction) — the streaming face of
    the atomic manifest: downstream readers either see a batch's data AND
    its audit row, or neither.

    Exactly-once across replays: the applied batch id is recorded INSIDE
    the same transaction (a synthetic ``_applied_batches`` table), so
    - crash AFTER the commit → the replayed batch id short-circuits;
    - crash BEFORE the commit → the replay overwrites the batch-keyed
      staging dirs and commits once (uncommitted files were never
      referenced by any manifest, so the overwrite is invisible).

    Returns the (batch_df, batch_id) function for ``foreachBatch``."""
    import json
    import os

    from pyspark.sql import functions as SF

    from ..sources.incremental import _list_versions, commit_transaction

    def _applied(batch_id: int) -> bool:
        versions = _list_versions(txn_dir)
        if not versions:
            return False
        path = os.path.join(txn_dir, f"manifest-{max(versions):06d}.json")
        with open(path) as fh:
            return f"batch-{batch_id}" in json.load(fh)["tables"].get(
                "_applied_batches", []
            )

    def _write(batch_df, batch_id: int) -> None:
        if _applied(batch_id):
            return  # replay of an already-committed batch
        fact_dir = os.path.join(data_dir, f"fact_batch_{batch_id}")
        audit_dir = os.path.join(data_dir, f"audit_batch_{batch_id}")
        batch_df.write.mode("overwrite").parquet(fact_dir)
        spark = batch_df.sparkSession
        n = spark.read.parquet(fact_dir).count()
        spark.createDataFrame(
            [(batch_id, n)], "batch_id long, n_rows long"
        ).coalesce(1).write.mode("overwrite").parquet(audit_dir)
        files = lambda d: [  # noqa: E731
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]
        commit_transaction(
            txn_dir,
            {
                "fact": files(fact_dir),
                "audit": files(audit_dir),
                "_applied_batches": [f"batch-{batch_id}"],
            },
        )

    return _write

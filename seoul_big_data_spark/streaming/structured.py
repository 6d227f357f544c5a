"""Structured Streaming layer (SURVEY.md §2.8, §7.4.7).

The reference is batch-only; the engine's event analytics are written against
DataFrames, so running them as a stream is a source/sink swap, not a rewrite.
This module demonstrates exactly that: ``hourly_rollup`` — the same function
the batch query registry uses — applied to a file-source stream with a
watermark, processed with an ``availableNow`` trigger (bounded catch-up run,
the batch-parity execution mode).

At scale this is the hand-off point for continuous ingest: the CSV/OpenAPI
pipelines land files; a file-source stream with checkpointing replaces the
START_IDX resume logic (data_seoul_2_csv_noopenapi.py:115) with exactly-once
file tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .batch_windows import hourly_rollup


def stream_events_from_files(
    spark: SparkSession, path: str, schema_ddl: str
) -> DataFrame:
    """File-source event stream (each dropped file = a micro-batch)."""
    return spark.readStream.schema(schema_ddl).parquet(path)


def hourly_rollup_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """The hourly rollup under a watermark: late events beyond ``watermark``
    are dropped and window state is evicted — the property that bounds state
    size on an unbounded stream.

    Uses ``F.window`` (not the batch form's ``date_trunc``): Spark's
    watermark/append-mode analysis recognizes only the window expression as
    an event-time aggregation. For aligned 1-hour tumbling windows the
    window start equals ``date_trunc('hour', ts)``, so results are identical
    to the batch ``hourly_rollup`` (pinned in tests)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "rollup"
):
    """Execute the stream over all currently-available input, then stop
    (batch-parity mode). Returns the StreamingQuery after completion; results
    land in the in-memory table ``query_name``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def session_rollup_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session aggregation on a stream: Spark's native
    ``session_window`` merges overlapping gap-windows as events arrive and
    the watermark closes sessions whose gap has definitively expired —
    state per key is the set of OPEN sessions only, the bound that makes
    unbounded-stream sessionization feasible. Identical expression to the
    batch twin (`events_session_window_builtin`); parity is pinned in
    tests/test_streaming_session.py."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


def enrich_stream_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment — the most common streaming join:
    each micro-batch hash-joins against a STATIC (batch) dimension, no
    watermark and no streaming state involved (only stream-stream joins
    buffer state). The dim side is broadcast, so enrichment adds zero
    shuffle to the stream; at 100 TB/day the dim re-broadcasts per batch
    and a dim refresh is just a re-read on the next trigger. Left join
    preserves events with no dim row (nulls), the usual contract for
    late-registered entities."""
    d = F.broadcast(dim.select(key, *dim_cols))
    return stream.join(d, key, how)

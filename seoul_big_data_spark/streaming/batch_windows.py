"""Event-stream analytics as batch time-window aggregations (SURVEY.md §2.8).

The reference is batch-only (its incremental mechanism is the START_IDX
checkpoint, data_seoul_2_csv_noopenapi.py:115); the engine processes the
``events`` table with batch tumbling windows and lag-gap sessionization. The
identical DataFrame code runs under Structured Streaming by swapping
``spark.read`` for ``spark.readStream`` + a watermark on ``ts`` — noted here
as the v2 path; no logic would change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import sessionize


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + value sum.

    ``date_trunc`` keys the window start — equivalent to
    ``F.window(ts, '1 hour')`` for aligned tumbling windows and directly
    oracle-checkable. Map-side partial aggregation, one shuffle."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows via lag-gap cumulative sum; per-session event count and
    duration seconds. One shuffle on user_id."""
    s = sessionize(events, "user_id", "ts", gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
        F.min(F.col("ts").cast("long")).alias("start_tss"),
    )

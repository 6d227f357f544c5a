"""Watermark semantics: events later than the watermark are dropped from the
streaming rollup (the state-bounding property, SURVEY.md §2.8).

Trigger note: this test drives the stream with the default micro-batch
trigger + ``processAllAvailable`` between file drops, not ``availableNow``.
Under availableNow, Spark's late-record filter lags the watermark by one
micro-batch (verified empirically on 4.1.2: a file arriving exactly one
batch after the watermark-advancing batch is NOT filtered, though the
progress log already reports the advanced watermark), so back-to-back
batches make the drop timing dependent on how files split across batches.
The incremental trigger inserts a no-data batch at ``processAllAvailable``
which finalizes the watermark before the next file is read — deterministic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from seoul_big_data_spark.streaming.structured import hourly_rollup_stream


def test_late_events_beyond_watermark_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    str_schema = schema.replace("ts timestamp", "ts string")

    def mk(rows):
        return spark.createDataFrame(rows, str_schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    os.makedirs(src)  # the source path must exist before the stream starts
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        hourly_rollup_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")  # append emits a window only once it is final
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # batch 1: events at 00:xx and 10:xx → watermark = 10:00-2h = 08:00
        mk(
            [
                (1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
                (2, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
            ]
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        # batch 2: one on-time event (09:30 > 08:00 watermark) and one
        # too-late event at 00:30 (far below it) → the late one is dropped
        mk(
            [
                (3, "2024-01-01 09:30:00", 1, "click", 1.0, "{}"),
                (4, "2024-01-01 00:30:00", 1, "click", 1.0, "{}"),
            ]
        ).write.mode("append").parquet(src)
        q.processAllAvailable()

        got = {
            str(r["hour_start"]): r["n_events"]
            for r in spark.table("wm_test").collect()
        }
        # the 00:00 window closed with ONLY the batch-1 event; the late
        # batch-2 event (00:30) was dropped by the watermark
        assert got.get("2024-01-01 00:00:00") == 1, got
        # and the state operator itself reported the drop
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in json.loads(p.json).get("stateOperators", [])
        )
        assert dropped == 1, dropped
    finally:
        q.stop()

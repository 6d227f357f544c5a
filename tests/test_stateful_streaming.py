"""applyInPandasWithState: per-user running totals across micro-batches."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.stateful import running_user_totals


def test_running_user_totals_matches_batch(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # two files → at least one micro-batch boundary exercises state carry-over
    events.filter(F.col("event_id") % 2 == 0).write.parquet(src)
    events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(src)
    schema_ddl = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema_ddl).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        # update mode emits one row per user per micro-batch: the LAST row
        # per user is the final running total
        got = (
            spark.table("user_totals")
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max("total_value").alias("total_value"),
            )
            .collect()
        )
        expect = {
            r["user_id"]: (r["n"], r["s"])
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        assert len(got) == len(expect)
        for r in got:
            n, s = expect[r["user_id"]]
            assert r["n_events"] == n
            assert math.isclose(r["total_value"], s, rel_tol=1e-9)
    finally:
        q.stop()

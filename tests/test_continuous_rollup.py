"""Streaming continuous-aggregate maintenance: after draining a file
stream micro-batch by micro-batch, the persisted rollup state must equal a
batch recompute over all events — the merge(partials) == full property,
end to end through foreachBatch."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.operators.rollup import partial_rollup
from seoul_big_data_spark.sources.tables import load
from seoul_big_data_spark.streaming.sinks import continuous_rollup


def _rows(df):
    return sorted(
        (r["event_type"], r["n"], str(r["sum_value"]), r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_continuous_rollup_matches_batch(spark, sf_dir, tmp_path):
    events = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    src = str(tmp_path / "src")
    # three files → three micro-batches with maxFilesPerTrigger=1
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state = str(tmp_path / "rollup_state")
    q = continuous_rollup(
        stream, state, str(tmp_path / "ckpt"), keys=["event_type"]
    ).start()
    q.awaitTermination()
    q.stop()
    got = spark.read.parquet(state)
    expect = partial_rollup(events, ["event_type"], "value")
    assert _rows(got) == _rows(expect)

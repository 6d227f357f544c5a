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


def test_continuous_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch re-delivers the same batch_id after a failure between
    the state write and the checkpoint commit; merging it twice must not
    double-count. Drive the merge kernel directly with a replayed id."""
    from seoul_big_data_spark.streaming.sinks import rollup_merge_fn

    events = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    state = str(tmp_path / "state")
    merge = rollup_merge_fn(state, ["event_type"], "value")
    merge(b0, 0)
    merge(b1, 1)
    committed = _rows(spark.read.parquet(state))
    merge(b1, 1)  # replay after "crash before checkpoint commit"
    merge(b0, 0)  # stale replay of an older batch
    assert _rows(spark.read.parquet(state)) == committed
    expect = partial_rollup(events, ["event_type"], "value")
    assert committed == _rows(expect)


def test_continuous_rollup_recovers_mid_swap_crash(spark, sf_dir, tmp_path):
    """A crash between the two commit renames leaves state under ._old;
    the next merge must recover it, not restart from empty."""
    import os

    from seoul_big_data_spark.streaming.sinks import rollup_merge_fn

    events = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    state = str(tmp_path / "state")
    merge = rollup_merge_fn(state, ["event_type"], "value")
    merge(b0, 0)
    os.rename(state, state + "._old")  # simulate death mid-swap
    merge(b1, 1)
    expect = partial_rollup(events, ["event_type"], "value")
    assert _rows(spark.read.parquet(state)) == _rows(expect)


def test_continuous_rollup_read_failure_propagates(spark, sf_dir, tmp_path):
    """Corrupted committed state must raise, not silently reset the rollup
    to just the current batch (the old bare-except behavior)."""
    import glob
    import os

    import pytest

    from seoul_big_data_spark.streaming.sinks import rollup_merge_fn

    events = load(spark, "events", sf_dir).select("event_id", "event_type", "value")
    state = str(tmp_path / "state")
    merge = rollup_merge_fn(state, ["event_type"], "value")
    merge(events, 0)
    for f in glob.glob(os.path.join(state, "*.parquet")):
        with open(f, "wb") as fh:
            fh.write(b"not parquet")
    with pytest.raises(Exception):
        merge(events, 1)
    # marker still says batch 0: nothing was silently committed
    with open(os.path.join(state, "_applied_batch")) as fh:
        assert fh.read().strip() == "0"

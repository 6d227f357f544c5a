"""asof_join_directional semantics on hand-built frames: direction,
tolerance, coincident timestamps, no-match nulls, and struct row-consistency
(filled payload columns always come from the same right row)."""

from __future__ import annotations

import datetime as dt

from seoul_big_data_spark.operators.joins import asof_join_directional


def _ts(minute):
    return dt.datetime(2026, 1, 1, 12, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(30)), (3, "k", _ts(50)), (4, "solo", _ts(10))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts(10), 100, "a"), ("k", _ts(29), 290, "b"), ("k", _ts(31), 310, None)],
        "k string, ts timestamp, val int, tag string",
    )
    return left, right


def _by_lid(df):
    return {r["lid"]: r for r in df.collect()}


def test_backward(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join_directional(
            left, right, "k", "ts", "ts", ["val", "tag"], direction="backward"
        )
    )
    assert out[1]["asof_val"] == 100  # coincident ts matches
    assert out[2]["asof_val"] == 290
    assert out[3]["asof_val"] == 310
    # row-consistency: lid=3's payload row is (310, None) — tag must be the
    # SAME row's null, not an earlier row's non-null 'b'
    assert out[3]["asof_tag"] is None
    assert out[4]["asof_val"] is None  # no right rows for this key


def test_forward(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join_directional(
            left, right, "k", "ts", "ts", ["val"], direction="forward"
        )
    )
    assert out[1]["asof_val"] == 100  # coincident ts matches forward too
    assert out[2]["asof_val"] == 310  # earliest at-or-after 12:30
    assert out[3]["asof_val"] is None  # nothing after 12:50
    assert out[4]["asof_val"] is None


def test_nearest_ties_backward(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join_directional(
            left, right, "k", "ts", "ts", ["val"], direction="nearest"
        )
    )
    # 12:30 is 1 min after 12:29 and 1 min before 12:31 — tie goes backward
    assert out[2]["asof_val"] == 290
    assert out[1]["asof_val"] == 100
    assert out[3]["asof_val"] == 310


def test_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    out = _by_lid(
        asof_join_directional(
            left,
            right,
            "k",
            "ts",
            "ts",
            ["val"],
            direction="backward",
            tolerance_seconds=120,
        )
    )
    assert out[2]["asof_val"] == 290  # 1 min back — inside tolerance
    assert out[3]["asof_val"] is None  # 19 min back — outside
    assert out[3]["asof_ts"] is None


def test_matches_pandas_merge_asof_randomized(spark):
    """Cross-check every direction (+tolerance) against pandas.merge_asof —
    an independent reference implementation — on seeded random frames with
    duplicate timestamps and unmatched keys."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left_pd = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.choice(["a", "b", "c", "zz"], n_l),
            "ts": pd.to_datetime(
                rng.integers(0, 100_000, n_l), unit="s", origin="2026-01-01"
            ),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n_r),
            "ts": pd.to_datetime(
                rng.integers(0, 100_000, n_r), unit="s", origin="2026-01-01"
            ),
            "val": rng.integers(0, 10_000, n_r),
        }
    )
    # merge_asof requires unique right (k, ts) rows for a deterministic
    # answer in our union-and-window semantics (backward keeps the LAST
    # right row at a tied timestamp; pandas keeps the last too) — dedupe
    # ties to keep both references aligned on the same input.
    right_pd = right_pd.drop_duplicates(["k", "ts"], keep="last")
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction, tol in [
        ("backward", None),
        ("forward", None),
        ("nearest", None),
        ("backward", 5_000),
        ("nearest", 2_000),
    ]:
        got_df = asof_join_directional(
            left,
            right,
            "k",
            "ts",
            "ts",
            ["val"],
            direction=direction,
            tolerance_seconds=tol,
        )
        got = {
            r["lid"]: r["asof_val"] for r in got_df.collect()
        }
        expect_pd = pd.merge_asof(
            left_pd.sort_values("ts", kind="stable"),
            right_pd.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol else None,
        )
        expect = {
            int(r.lid): (None if pd.isna(r.val) else int(r.val))
            for r in expect_pd.itertuples()
        }
        assert got == expect, direction


def test_asof_tied_right_timestamps_deterministic(spark):
    from pyspark.sql import functions as F
    """Several right rows at the SAME (key, ts): the largest payload struct
    must win in every direction, regardless of partition order — pinned by
    running the same join over shuffled/repartitioned right sides."""
    from seoul_big_data_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right_rows = [(1, 100, 7), (1, 100, 9), (1, 100, 3), (1, 50, 1)]
    for nparts in (1, 3, 8):
        right = spark.createDataFrame(
            right_rows, "k long, rts long, rid long"
        ).repartition(nparts)
        # backward (plain asof_join): tie at ts=100 → rid 9
        got = asof_join(
            left.select(
                "k", F.timestamp_seconds("lts").alias("lts")
            ),
            right.select("k", F.timestamp_seconds("rts").alias("rts"), "rid"),
            key="k", left_ts="lts", right_ts="rts", right_cols=["rid"],
        ).collect()
        assert [r["asof_rid"] for r in got] == [9], f"nparts={nparts}"
        for direction, expect in (("backward", 9), ("forward", 9), ("nearest", 9)):
            got = asof_join_directional(
                left.select("k", F.timestamp_seconds("lts").alias("lts")),
                right.select(
                    "k", F.timestamp_seconds("rts").alias("rts"), "rid"
                ),
                key="k", left_ts="lts", right_ts="rts",
                right_cols=["rid"], direction=direction,
            ).collect()
            assert [r["asof_rid"] for r in got] == [expect], (
                f"{direction} nparts={nparts}"
            )

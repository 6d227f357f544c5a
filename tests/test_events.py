"""Events-family edge semantics (ADVICE r6 fixes).

`events_interarrival_profile`'s cv is guarded with CASE WHEN n_gaps > 1 on
BOTH engines: a single-gap group divides 0/0 which Spark nulls but DuckDB
evaluates to IEEE NaN — a cross-engine hash divergence the old stddev_samp
form (NULL on both) did not have. These tests pin the guard on a corpus
where every edge grain actually occurs.
"""

from __future__ import annotations

import datetime

import duckdb

from seoul_big_data_spark.queries import QUERIES


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


def test_interarrival_single_gap_group_is_null_not_nan(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(s):
        return t0 + datetime.timedelta(seconds=s)

    rows = [
        # type 'one_gap': a single user with exactly 2 events -> 1 gap
        (1, 10, "one_gap", ts(0), 1.0),
        (2, 10, "one_gap", ts(5), 1.0),
        # type 'no_gap': users with a single event each -> 0 gaps (no row)
        (3, 20, "no_gap", ts(0), 1.0),
        (4, 21, "no_gap", ts(9), 1.0),
        # type 'many': 4 events, 3 gaps -> real cv
        (5, 30, "many", ts(0), 1.0),
        (6, 30, "many", ts(1), 1.0),
        (7, 30, "many", ts(4), 1.0),
        (8, 30, "many", ts(9), 1.0),
    ]
    pq = str(tmp_path / "events.parquet")
    _mk_events(spark, rows).write.mode("overwrite").parquet(pq)

    out = {
        r["event_type"]: r
        for r in QUERIES["events_interarrival_profile"](
            spark, str(tmp_path)
        ).collect()
    }
    # 0-gap users contribute nothing; single-event types don't appear at all
    assert set(out) == {"one_gap", "many"}
    one = out["one_gap"]
    assert one["n_gaps"] == 1
    assert one["cv"] is None  # guarded: 0/0 never evaluated
    many = out["many"]
    assert many["n_gaps"] == 3 and many["cv"] is not None

    # Oracle side on the identical parquet: cv must be SQL NULL (not NaN)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    from __spark_entry__ import oracle_sql

    orows = {
        r[0]: r for r in con.execute(oracle_sql()["events_interarrival_profile"]).fetchall()
    }
    assert orows["one_gap"][4] is None  # cv column: NULL on DuckDB too
    assert orows["many"][4] is not None
    # and the engines agree on the guarded grain
    assert round(orows["many"][4], 4) == round(many["cv"], 4)


def test_interarrival_decimal_headroom():
    # Spark-side variance numerator is n_gaps * ssq in DECIMAL(38,0) vs the
    # oracle's HUGEINT: document the headroom. With gap_us <= G and n gaps,
    # n * sum(gap^2) <= n^2 * G^2 must stay under 10^38. G = 100 days in
    # micros (8.64e12) supports n up to ~1e6 gaps per group; the profile
    # grain is per event_type over per-user gaps, so a type needs a million
    # 100-day gaps before Spark's decimal caps while HUGEINT keeps going.
    G = 100 * 86400 * 1_000_000  # 8.64e12 us
    n = 1_000_000
    assert n * n * G * G < 10**38

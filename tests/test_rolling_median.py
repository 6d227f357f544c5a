"""Rolling 24h median: cross-check the RANGE-frame collect + sorted-midpoint
implementation against pandas' time-windowed rolling median per group."""

from __future__ import annotations

import pandas as pd

from seoul_big_data_spark.queries import QUERIES
from seoul_big_data_spark.sources.tables import load


def test_rolling_median_matches_pandas(spark, sf_dir):
    got = {
        r["event_id"]: r["med_24h"]
        for r in QUERIES["events_rolling_median_24h"](spark, sf_dir).collect()
    }
    pdf = (
        load(spark, "events", sf_dir)
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
    )
    expect = {}
    for _, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"], kind="stable").set_index("ts")
        med = g["value"].rolling("24h").median()
        for eid, m in zip(g["event_id"], med):
            expect[int(eid)] = round(float(m), 6)
    assert len(got) == len(expect)
    mismatches = [
        (k, got[k], expect[k]) for k in expect if abs(got[k] - expect[k]) > 1e-9
    ]
    assert not mismatches, mismatches[:5]

"""Property test for banded_range_join's bin-width sensitivity: exactly-once
pairing must hold for ANY band_width against adversarial interval sets —
intervals spanning many bins, zero-width intervals, and boundary-exact
points — before anyone tunes width for performance."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from seoul_big_data_spark.operators.joins import banded_range_join

# Half-integer grid: exactly representable in binary floating point, so
# boundary comparisons (v == lo, v == hi) are exact and the brute-force
# oracle is unambiguous.
_grid = st.integers(-40, 40).map(lambda i: i / 2.0)


def _check(spark, points, intervals, band_width):
    if not points or not intervals:
        return
    vmin, vmax = min(points), max(points)
    fact = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "pid int, v double"
    )
    iv = spark.createDataFrame(
        [(j, lo, hi) for j, (lo, hi) in enumerate(intervals)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in banded_range_join(
            fact, iv, F.col("v"), F.col("lo"), F.col("hi"),
            band_width=band_width, vmin=vmin, vmax=vmax,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(points)
        for j, (lo, hi) in enumerate(intervals)
        if lo <= v < hi
    )
    assert got == want, (band_width, points, intervals)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(_grid, min_size=1, max_size=12),
    intervals=st.lists(st.tuples(_grid, _grid), min_size=1, max_size=8),
    band_width=st.sampled_from([0.5, 1.0, 3.0, 7.5, 100.0]),
)
def test_banded_range_join_exactly_once_property(
    spark, points, intervals, band_width
):
    # normalize interval order; keep zero-width (lo == hi → empty [lo, hi))
    intervals = [(min(a, b), max(a, b)) for a, b in intervals]
    _check(spark, points, intervals, band_width)


def test_banded_range_join_adversarial_fixed_cases(spark):
    points = [-10.0, -0.5, 0.0, 0.5, 99.5, 100.0, 100.5]
    intervals = [
        (-1e6, 1e6),     # spans every bin (clamped by vmin/vmax)
        (0.0, 0.0),      # zero-width: matches nothing
        (0.0, 100.0),    # boundary-exact: 0.0 in, 100.0 out
        (100.0, 100.5),  # adjacent interval picks up exactly 100.0
        (100.5, 101.0),  # hi beyond vmax
        (-20.0, -10.0),  # lo below vmin, hi boundary-exact at a point
    ]
    for w in (0.25, 0.5, 1.0, 33.0, 1000.0):
        _check(spark, points, intervals, w)

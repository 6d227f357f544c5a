"""Rank-arithmetic pin for agg_percentile_approx (ADVICE r6).

Spark's percentile_approx in never-compressed (exact) mode and DuckDB's
quantile_disc could plausibly use different discrete-rank forms (a
ceil-based q*n vs floor(q*(n-1))+1 differ for many n when values are
distinct). The gate corpus is duplicate-heavy, which could mask such a
difference. This test pins the agreement on DISTINCT-valued data across
group sizes chosen so the two rank forms disagree if either engine used
the other form — including the q=0.75, n=2002 witness from the advice.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

QS = [0.25, 0.5, 0.75, 0.99]

# floor(q*(n-1))+1 != ceil(q*n) witnesses for at least one q in QS, plus
# tiny/edge sizes and the advice's named n=2002.
SIZES = [1, 2, 3, 4, 5, 7, 8, 99, 100, 101, 2001, 2002, 2003]


@pytest.mark.parametrize("n", SIZES)
def test_exact_mode_rank_matches_quantile_disc(spark, n):
    df = spark.createDataFrame([(float(i + 1),) for i in range(n)], "v double")
    srow = df.agg(
        *[
            F.percentile_approx("v", q, 2_000_000).alias(f"q{i}")
            for i, q in enumerate(QS)
        ]
    ).collect()[0]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(generate_series(1, ?))::DOUBLE AS v",
        [n],
    )
    drow = con.execute(
        "SELECT " + ", ".join(f"quantile_disc(v, {q})" for q in QS) + " FROM t"
    ).fetchone()
    for i in range(len(QS)):
        assert srow[f"q{i}"] == drow[i], (n, QS[i], srow[f"q{i}"], drow[i])


def test_rank_forms_actually_differ_on_witnesses():
    # Sanity: the parametrized sizes DO include cases where the two rank
    # forms pick different elements, so the test above is not vacuous.
    import math

    differs = 0
    for n in SIZES:
        for q in QS:
            if n >= 2 and math.floor(q * (n - 1)) + 1 != math.ceil(q * n):
                differs += 1
    assert differs > 0

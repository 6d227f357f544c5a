"""Scale-safe plan ↔ single-reducer window equivalence twins.

Round-4 rewrites (VERDICT r3 "Next round" #2): `agg_equidepth_deciles`,
`stats_rfm_segmentation` and `events_peak_concurrency` now REGISTER the
bucketed two-level forms (`windows.ntile_scalable` / `windows.bucketed_cumsum`)
so no unpartitioned WindowExec touches fact-grain input. These tests pin that
the scale-safe forms are row-for-row identical to the oracle-exact global
window forms they replaced.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from seoul_big_data_spark.operators import windows
from seoul_big_data_spark.queries import QUERIES
from seoul_big_data_spark.sources.tables import load


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_ntile_scalable_matches_window_deciles(spark, sf_dir):
    o = load(spark, "orders", sf_dir).select("o_totalprice", "o_orderkey")
    scale = windows.ntile_scalable(
        o, 10, ["o_totalprice", "o_orderkey"], out="decile"
    )
    w = Window.orderBy("o_totalprice", "o_orderkey")
    twin = o.select(
        "o_orderkey", F.ntile(10).over(w).alias("decile")
    )
    assert _rows(scale, "o_orderkey", "decile") == _rows(
        twin, "o_orderkey", "decile"
    )


def test_ntile_scalable_small_n_and_ties(spark):
    # N < k: every row its own bucket, rank order preserved.
    df = spark.createDataFrame(
        [(1.0, "a"), (1.0, "b"), (2.0, "c")], ["v", "k"]
    )
    got = _rows(
        windows.ntile_scalable(df, 10, ["v", "k"], out="nt"), "k", "nt"
    )
    assert got == [("a", 1), ("b", 2), ("c", 3)]
    # N % k != 0: first buckets take the extra row (ntile size rule).
    df2 = spark.createDataFrame([(float(i),) for i in range(7)], ["v"])
    got2 = _rows(windows.ntile_scalable(df2, 3, ["v"], out="nt"), "v", "nt")
    assert [nt for _, nt in got2] == [1, 1, 1, 2, 2, 3, 3]


def test_rfm_matches_triple_window_twin(spark, sf_dir):
    scale = QUERIES["stats_rfm_segmentation"](spark, sf_dir)
    o = load(spark, "orders", sf_dir)
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "last_us"
        ),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    twin = rfm.select(
        "o_custkey",
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_us"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("freq"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    cols = ("o_custkey", "r_score", "f_score", "m_score")
    assert _rows(scale, *cols) == _rows(twin, *cols)


def test_peak_concurrency_matches_global_window_twin(spark, sf_dir):
    got = QUERIES["events_peak_concurrency"](spark, sf_dir).collect()[0]
    # Twin: identical sweep-line but with the unpartitioned running-sum
    # window (the pre-r4 registered form).
    e = load(spark, "events", sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus")
    g = e.withColumn(
        "new_sess",
        F.when(
            F.lag("tus").over(w).isNull()
            | (F.col("tus") - F.lag("tus").over(w) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = (
        g.withColumn(
            "sid",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("tus").alias("lo"), F.max("tus").alias("hi"))
    )
    deltas = sess.select(F.col("lo").alias("tus"), F.lit(1).alias("d")).unionAll(
        sess.select((F.col("hi") + 1).alias("tus"), F.lit(-1).alias("d"))
    )
    merged = deltas.groupBy("tus").agg(F.sum("d").alias("dd"))
    twin_peak = (
        merged.select(
            F.sum("dd")
            .over(
                Window.orderBy("tus").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("run")
        )
        .agg(F.max("run"))
        .collect()[0][0]
    )
    assert got["peak_concurrent_sessions"] == twin_peak
    assert got["n_sessions"] == sess.count()


def test_latest_per_group_agg_matches_window_form(spark, sf_dir):
    # max_by aggregate (map-side combine) vs row_number window: identical
    # rows whenever the max keys are a total order per group — here
    # (o_orderdate, o_orderkey) with o_orderkey unique.
    o = load(spark, "orders", sf_dir)
    agg = windows.latest_per_group_agg(
        o, ["o_custkey"], ["o_orderdate", "o_orderkey"]
    )
    win = windows.latest_per_group(
        o, ["o_custkey"], [F.desc("o_orderdate"), F.desc("o_orderkey")]
    )
    cols = sorted(o.columns)
    assert _rows(agg, *cols) == _rows(win, *cols)

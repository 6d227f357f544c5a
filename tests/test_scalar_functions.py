"""X1-X16 scalar layer (SURVEY.md §2.7) — unit + property tests."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from seoul_big_data_spark.functions import scalar


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_strip_whitespace(spark):
    assert one(spark, scalar.strip_whitespace(F.lit("a\tb\nc"))) == "abc"


def test_zero_pad_and_names(spark):
    assert one(spark, scalar.zero_pad(F.lit(23), 6)) == "000023"
    assert one(spark, scalar.staging_table_name(F.lit(23))) == "NLDATA_000023"
    assert one(spark, scalar.col_name(F.lit(7))) == "COL_007"


def test_split_after(spark):
    url = "http://x/sample/xml/TbPublic/1/5/"
    assert one(spark, scalar.split_after(F.lit(url), "/sample/xml/")) == "TbPublic/1/5/"


def test_replace_literal(spark):
    got = one(
        spark,
        scalar.replace_literal(F.lit("http://x/sample/xml/T"), "/sample/", F.lit("/KEY/")),
    )
    assert got == "http://x/KEY/xml/T"


def test_ensure_trailing_slash(spark):
    assert one(spark, scalar.ensure_trailing_slash(F.lit("a/b"))) == "a/b/"
    assert one(spark, scalar.ensure_trailing_slash(F.lit("a/b/"))) == "a/b/"


@pytest.mark.parametrize(
    ("k", "expect"), [(1, "a/b/c"), (2, "a/b"), (3, "a")]
)
def test_drop_last_path_segments(spark, k, expect):
    assert one(spark, scalar.drop_last_path_segments(F.lit("a/b/c/d"), k)) == expect


@pytest.mark.parametrize(
    ("src", "expect"),
    [
        ("TbPublicWifiInfo", "TB_PUBLIC_WIFI_INFO"),
        ("already", "ALREADY"),
        ("camelCase", "CAMEL_CASE"),
        ("x2Y", "X2_Y"),
    ],
)
def test_camel_to_snake(spark, src, expect):
    assert one(spark, scalar.camel_to_snake_upper(F.lit(src))) == expect


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=999999), st.integers(min_value=1, max_value=8))
def test_zero_pad_property(spark, n, width):
    got = one(spark, scalar.zero_pad(F.lit(n), width))
    assert got == str(n).rjust(width, "0")


def test_format_timestamp(spark):
    got = one(
        spark,
        scalar.format_timestamp(F.lit("2024-01-02 03:04:05").cast("timestamp")),
    )
    assert got == "2024-01-02 03:04:05"


def test_percentile_interpolation_convention_adversarial(spark):
    """Pin the Spark `percentile` ↔ DuckDB `quantile_cont` equivalence (the
    1 + p·(n-1) linear-interpolation rank) on adversarial groups: ties,
    single element, even/odd cardinality, negative values. If either engine
    changed convention, agg_percentile_exact/agg_stats would silently drift —
    this test pins the contract locally.
    """
    import duckdb

    groups = {
        "odd": [1.0, 2.0, 10.0],
        "even": [1.0, 2.0, 3.0, 100.0],
        "single": [42.0],
        "ties": [5.0, 5.0, 5.0, 7.0, 7.0],
        "pair": [-3.0, 9.0],
        "negatives": [-10.0, -5.0, -1.0, 0.0],
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    agg = df.groupBy("g").agg(
        *[F.expr(f"percentile(v, {p})").alias(f"p{i}") for i, p in enumerate(ps)]
    )
    got = {r["g"]: [r[f"p{i}"] for i in range(len(ps))] for r in agg.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sel = ", ".join(f"quantile_cont(v, {p})" for p in ps)
    want = {g: list(vals) for g, *vals in con.execute(
        f"SELECT g, {sel} FROM t GROUP BY g"
    ).fetchall()}

    assert set(got) == set(want)
    for g in got:
        for s_val, d_val in zip(got[g], want[g]):
            assert s_val == pytest.approx(d_val, abs=1e-9), (g, got[g], want[g])

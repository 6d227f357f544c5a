"""JDBC end-to-end (SURVEY.md §2.1 C1/C6) against embedded Apache Derby —
the zero-daemon RDBMS that ships inside the Spark distribution itself, so the
round trip exercises the REAL JDBC code path (driver load, type mapping,
batched INSERTs, predicate pushdown into the remote query) with no external
service. The reference's core I/O is exactly this surface (jaydebeapi→Tibero,
data_seoul_1_category.py:27-33); Derby stands in as the live database."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.sources.jdbc import append_over_jdbc, read_catalog_table
from seoul_big_data_spark.sources.tables import load

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/catalogdb;create=true"


def _derby_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
        return True
    except Exception:
        return False


@pytest.fixture
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("no embedded Derby driver on the Spark classpath")
    return _derby_url(tmp_path)


def test_jdbc_roundtrip_catalog_table(spark, sf_dir, derby_url):
    """write.jdbc then read.jdbc of a real catalog table: schema and values
    survive the SQL type mapping both ways."""
    nation = load(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    append_over_jdbc(nation, derby_url, "NATION_CAT")
    back = read_catalog_table(spark, derby_url, "NATION_CAT")
    assert back.count() == nation.count()
    assert sorted(c.lower() for c in back.columns) == sorted(
        c.lower() for c in nation.columns
    )
    expect = {r["n_nationkey"]: r["n_name"] for r in nation.collect()}
    got = {r["n_nationkey"]: r["n_name"] for r in back.collect()}
    assert got == expect


def test_jdbc_predicate_pushdown_reaches_remote(spark, sf_dir, derby_url):
    """A filter on the JDBC frame must appear as PushedFilters in the scan
    node — the predicate runs inside the database, not in Spark."""
    region = load(spark, "region", sf_dir)
    append_over_jdbc(region, derby_url, "REGION_CAT")
    back = read_catalog_table(spark, derby_url, "REGION_CAT").filter(
        F.col("r_regionkey") > 2
    )
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    assert "GreaterThan(r_regionkey,2)" in pushed, plan[:1500]
    assert back.count() == region.filter(F.col("r_regionkey") > 2).count()


def test_jdbc_partitioned_parallel_read(spark, sf_dir, derby_url):
    """partitionColumn splits one remote table into N parallel range scans —
    the scalable replacement for the reference's single-cursor fetchall().
    All partitions together must return every row exactly once."""
    supplier = load(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    append_over_jdbc(supplier, derby_url, "SUPPLIER_CAT")
    n = supplier.count()
    back = read_catalog_table(
        spark,
        derby_url,
        "SUPPLIER_CAT",
        partition_column="S_SUPPKEY",
        num_partitions=4,
        lower_bound=0,
        upper_bound=max(1, n),
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == n
    assert back.select("S_SUPPKEY").distinct().count() == n

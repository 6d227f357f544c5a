"""Cost-based-optimizer surface: ANALYZE TABLE statistics reach the
optimized plan (rowCount/sizeInBytes), the input every CBO join-reorder
and broadcast decision consumes at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load


def _cost_plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "cost"
    )


def test_analyze_table_statistics_feed_cbo(spark, sf_dir, tmp_path):
    prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        (
            load(spark, "customer", sf_dir)
            .select("c_custkey", "c_mktsegment", "c_acctbal")
            .write.option("path", str(tmp_path / "cust_stats_t"))
            .saveAsTable("cust_stats_t")
        )
        n = spark.table("cust_stats_t").count()
        # before ANALYZE: only file-size estimates, no exact rowCount
        pre = _cost_plan(
            spark.table("cust_stats_t").groupBy("c_mktsegment").count()
        )
        spark.sql(
            "ANALYZE TABLE cust_stats_t COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        post = _cost_plan(
            spark.table("cust_stats_t").groupBy("c_mktsegment").count()
        )
        assert f"rowCount={n}" in post
        assert f"rowCount={n}" not in pre
        # column-level stats recorded (distinct counts etc.)
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE EXTENDED cust_stats_t c_mktsegment"
            ).collect()
        }
        assert int(desc["distinct_count"]) == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS cust_stats_t")
        spark.conf.set("spark.sql.cbo.enabled", prev)

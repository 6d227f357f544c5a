"""Runtime bloom-filter join pruning — the 100 TB semi-join reduction.

When a selective dimension-side filter exists and the fact side is too big
to broadcast, Spark (runtime.bloomFilter.enabled, on by default) builds a
bloom filter over the dim join keys and injects `might_contain` into the
fact scan, pruning fact rows BEFORE the shuffle. At 100 TB this is the
difference between shuffling the whole fact table and shuffling only the
~matching fraction. The local thresholds are tuned down here because the
application-side scan must look "big" (default threshold 10 GB) for the
optimizer to pay the filter-build cost — exactly the regime the production
scale hits naturally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seoul_big_data_spark.sources.tables import load


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _plan(spark, df) -> str:
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _join(spark, sf_dir):
    o = load(spark, "orders", sf_dir).filter(F.col("o_orderpriority") == "1-URGENT")
    li = load(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def test_bloom_filter_injected_into_fact_scan(spark, sf_dir, bloom_confs):
    plan = _plan(spark, _join(spark, sf_dir))
    # dim side builds the filter; fact side probes it before the shuffle
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan


def test_bloom_filter_preserves_results(spark, sf_dir, bloom_confs):
    with_filter = {tuple(r) for r in _join(spark, sf_dir).collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        without = {tuple(r) for r in _join(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_filter == without and len(with_filter) == 1

"""applyInPandas grouped-map vs native-expression twin (SURVEY.md §2.9)."""

from __future__ import annotations

import math

from seoul_big_data_spark.operators.grouped_map import zscore_native, zscore_pandas
from seoul_big_data_spark.sources.tables import load


def test_pandas_grouped_map_matches_native(spark, sf_dir):
    c = load(spark, "customer", sf_dir)
    native = {
        r["c_custkey"]: r["zscore"]
        for r in zscore_native(c, "c_mktsegment", "c_acctbal", "c_custkey").collect()
    }
    pandas_ = {
        r["c_custkey"]: r["zscore"]
        for r in zscore_pandas(c, "c_mktsegment", "c_acctbal", "c_custkey").collect()
    }
    assert native.keys() == pandas_.keys()
    for k in native:
        assert math.isclose(native[k], pandas_[k], abs_tol=1e-6), (
            k,
            native[k],
            pandas_[k],
        )


def test_map_in_arrow_matches_declarative(spark, sf_dir):
    """mapInArrow parity: per-PARTITION min-max normalization through raw
    Arrow batches must equal the declarative window form when the data
    sits in one partition (one batch == one partition == one window)."""
    from seoul_big_data_spark.operators.grouped_map import (
        arrow_batch_normalizer,
    )
    from seoul_big_data_spark.sources.tables import load
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = (
        load(spark, "orders", sf_dir)
        .select(F.col("o_orderkey").alias("id"),
                F.col("o_totalprice").alias("v"))
        .limit(500)
        .coalesce(1)
    )
    # one partition → mapInArrow may still see several batches; cap the
    # batch size risk by asserting against the same batch-local semantics:
    # with maxRecordsPerBatch >= row count there is exactly one batch.
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        got = {
            (r["id"], round(r["v_norm"], 9))
            for r in src.mapInArrow(
                arrow_batch_normalizer(), "id long, v_norm double"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    w = Window.partitionBy()
    lo, hi = F.min("v").over(w), F.max("v").over(w)
    want = {
        (r["id"], round(r["v_norm"], 9))
        for r in src.select(
            "id", ((F.col("v") - lo) / (hi - lo)).alias("v_norm")
        ).collect()
    }
    assert got == want and len(got) == 500

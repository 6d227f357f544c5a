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

"""TokenRunLength UDTF edge cases: empty text, single token, all-equal,
alternating — the per-row table-function contract."""

from __future__ import annotations

from seoul_big_data_spark.operators.udtf_ops import register_udtfs
from seoul_big_data_spark.session import ensure_package_shipped


def test_run_length_edges(spark):
    ensure_package_shipped(spark)
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "a a a"), (4, "a b b  a"), (5, None)],
        "id long, text string",
    )
    df.createOrReplaceTempView("_udtf_edge")
    rows = sorted(
        (r["id"], r["token"], r["run_start"], r["run_len"])
        for r in spark.sql(
            "SELECT d.id, f.* FROM _udtf_edge d, "
            "LATERAL token_run_length(d.text) f"
        ).collect()
    )
    assert rows == [
        (2, "a", 1, 1),
        (3, "a", 1, 3),
        (4, "a", 1, 1),
        (4, "a", 4, 1),
        (4, "b", 2, 2),
    ]

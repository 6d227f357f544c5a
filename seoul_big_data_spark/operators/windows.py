"""Window-function operators (SURVEY.md §2.5 W1/S1-S4 + engine breadth).

The reference's "latest per group" is a per-row ``ORDER BY ID DESC`` +
``fetchall()[0]`` (data_seoul_2_csv_noopenapi.py:74-79) — an N+1 query. Here
it is one shuffle-on-group-key window pass over all groups at once, which is
the shape that survives a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column | str]
) -> DataFrame:
    """W1 — keep the top-1 row per group (newest checkpoint per dataset)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def top_k_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column | str], k: int
) -> DataFrame:
    """Top-k per group with rank exposed as ``rk`` (order-insensitive-oracle
    friendly: the rank column carries the ordering information)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def with_rank(df: DataFrame, order_by: list[Column | str], col: str = "rk") -> DataFrame:
    """S1/S2 — sorts validated via an explicit rank column (the driver's
    value-hash is order-insensitive, SURVEY.md §7.4.2)."""
    return df.withColumn(col, F.row_number().over(Window.orderBy(*order_by)))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Session assignment via lag-gap cumulative sum (batch sessionization,
    SURVEY.md §2.8): a new session starts when the gap to the previous event
    of the same user exceeds ``gap_minutes``. One shuffle on user_col."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )

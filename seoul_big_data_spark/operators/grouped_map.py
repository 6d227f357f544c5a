"""Grouped-map transforms (SURVEY.md §2.9): the applyInPandas surface and its
native-expression twin.

``applyInPandas`` ships each group to a Python worker as an Arrow batch — the
escape hatch for per-group logic Catalyst can't express (model scoring,
per-group curve fitting). For anything expressible as aggregates+join, the
native form wins at scale: no Python workers, no per-group materialization,
and groups larger than one worker's memory don't OOM. Both are provided; the
tests pin them to identical results so the fast path is known-safe to
substitute.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_native(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Z-score per group from exact decimal sums (deterministic; one
    broadcastable group-stats aggregate + map-side join)."""
    y = F.col(value_col).cast("decimal(12,2)")
    stats = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(y).cast("double").alias("_sy"),
        F.sum(y * y).cast("double").alias("_syy"),
    )
    n, sy, syy = F.col("_n"), F.col("_sy"), F.col("_syy")
    sd = F.sqrt((syy - sy * sy / n) / (n - 1))
    return (
        df.join(F.broadcast(stats), group_col)
        .select(
            id_col,
            group_col,
            F.round((F.col(value_col) - sy / n) / sd, 6).alias("zscore"),
        )
    )


def zscore_pandas(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """The same transform through applyInPandas (Arrow grouped-map)."""

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import decimal

        dec = pdf[value_col].map(
            lambda v: decimal.Decimal(str(round(v, 2)))
        )
        n = float(len(pdf))
        sy = float(sum(dec))
        syy = float(sum(d * d for d in dec))
        sd = ((syy - sy * sy / n) / (n - 1)) ** 0.5
        out = pdf[[id_col, group_col]].copy()
        out["zscore"] = ((pdf[value_col] - sy / n) / sd).round(6)
        return out

    return df.groupBy(group_col).applyInPandas(
        _per_group, schema=f"{id_col} long, {group_col} string, zscore double"
    )

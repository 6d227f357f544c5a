"""Sinks & bookkeeping (SURVEY.md §2.1 C6/C7/C8).

The reference's row-at-a-time INSERT loop (data_seoul_2_csv_noopenapi.py:
122-125) becomes a set-oriented ``df.write`` append; its in-place catalog
UPDATEs (data_seoul_1_category.py:80-83, data_seoul_2_csv_noopenapi.py:
133-140) become the join-then-overwrite ``merge_update`` — plain-parquet
MERGE semantics (Delta/Iceberg would provide it natively; the pattern is the
same join, so swapping the sink later changes no call sites).

Scale notes: ``append_table`` partitions by dataset id so downstream reads
partition-prune; ``merge_update`` broadcasts the updates side (catalog-sized
by construction — never fact-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_table(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """C6 — bulk append sink (replaces per-row INSERT)."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    """Full-table rewrite target for merge_update results."""
    df.write.mode("overwrite").parquet(path)


def merge_update(
    target: DataFrame, updates: DataFrame, key: str, set_cols: list[str]
) -> DataFrame:
    """C7/C8 — UPDATE ... SET c=? WHERE key=? as a join-then-coalesce.

    ``updates`` carries (key, *set_cols); unmatched target rows keep their
    values; matched rows take the update value unless it is null. Returns the
    merged frame (caller persists with ``overwrite_table`` — the atomic-swap
    analogue of the reference's per-row UPDATE)."""
    upd = updates.select(
        F.col(key), *[F.col(c).alias(f"_new_{c}") for c in set_cols]
    )
    out = target.join(F.broadcast(upd), key, "left")
    for c in set_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"_new_{c}"), F.col(c))).drop(
            f"_new_{c}"
        )
    return out

"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``seoul_big_data_spark.queries`` — the engine's registry of
(Spark DataFrame program, DuckDB oracle SQL) pairs, one per operator in
SURVEY.md §2 plus the north-star extension family.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Spark's Python workers resolve module-referenced closures via PYTHONPATH
# (sys.path edits don't propagate); export before any SparkSession exists.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_REPO, os.environ.get("PYTHONPATH")) if p
)

from seoul_big_data_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible operators → rows-only check)."""
    return dict(ORACLES)

"""Shared query/oracle registry (driver contract surface).

``QUERIES[name]``  : (spark, sf_dir) -> DataFrame
``ORACLES[name]``  : equivalent DuckDB SQL (omitted → rows-only check)

Conventions for oracle parity (driver hashes order-insensitively after
sorting columns by name): identical aliases on both sides; double aggregates
``round(x, 2)``; timestamps rendered as 'yyyy-MM-dd HH:mm:ss' strings; DuckDB
integer SUMs cast to BIGINT; sort semantics carried by rank columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query callable and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco

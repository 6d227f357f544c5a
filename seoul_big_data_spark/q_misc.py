"""Breadth queries: array/map expressions, null-handling scalars, string
predicates, advanced window frames, sliding time windows (SURVEY.md §2.7
engine scope + §2.5/§2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .registry import query
from .sources.tables import load

_DUCK_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


@query(
    "array_functions",
    f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER)                          AS n_toks,
           array_to_string(toks[1:3], ' ')                     AS first3,
           array_to_string(list_sort(list_distinct(toks)), ',') AS sorted_vocab,
           CAST(list_contains(toks, 'data') AS BOOLEAN)        AS has_data,
           CAST(len(list_filter(toks, x -> length(x) > 5)) AS INTEGER)
             AS n_long_toks
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array expression family: size/slice/sort/distinct/contains/filter —
    all higher-order Catalyst functions, no UDFs."""
    d = load(spark, "documents", sf_dir)
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.array_join(F.slice("toks", 1, 3), " ").alias("first3"),
        F.array_join(F.array_sort(F.array_distinct("toks")), ",").alias(
            "sorted_vocab"
        ),
        F.array_contains("toks", "data").alias("has_data"),
        F.size(F.filter("toks", lambda x: F.length(x) > 5)).alias("n_long_toks"),
    )


@query(
    "map_functions",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN 'k' END AS first_key
    FROM events
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map expression family over JSON props parsed to MapType:
    element_at + map_keys (engine scope, §2.7)."""
    e = load(spark, "events", sf_dir)
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
    )


@query(
    "null_handling",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING')       AS status_or_default,
           CAST(nullif(o_orderstatus, 'P') IS NULL AS BOOLEAN)   AS is_pending,
           greatest(o_totalprice, 100000.0)                      AS floored_price,
           least(CAST(o_orderkey % 100 AS BIGINT), 50)           AS capped_mod
    FROM orders
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / greatest / least (engine scope, §2.7)."""
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_or_default"
        ),
        F.nullif("o_orderstatus", F.lit("P")).isNull().alias("is_pending"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floored_price"),
        F.least((F.col("o_orderkey") % 100).cast("long"), F.lit(50).cast("long")).alias(
            "capped_mod"
        ),
    )


@query(
    "string_predicates",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE starts_with(p_type, 'STANDARD')
       OR p_name LIKE '%green%'
       OR contains(p_brand, '#3')
    """,
)
def string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startswith / LIKE / contains predicate pushdown surface."""
    p = load(spark, "part", sf_dir)
    return p.filter(
        F.col("p_type").startswith("STANDARD")
        | F.col("p_name").like("%green%")
        | F.col("p_brand").contains("#3")
    ).select("p_partkey", "p_name")


@query(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_in_cust,
           last_value(o_orderkey)  OVER w_full AS last_in_cust,
           nth_value(o_orderkey, 2) OVER w_full AS second_in_cust,
           CAST(count(*) OVER (PARTITION BY o_custkey
                 ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS orders_last_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value + a RANGE frame over epoch seconds (trailing
    30-day order count) — the value-based frame family."""
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # o_orderdate is TIMESTAMP_NTZ (parquet ms): NTZ→long needs an
    # intermediate timestamp cast (session TZ is pinned to UTC).
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_in_cust"),
        F.last("o_orderkey").over(w_full).alias("last_in_cust"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_in_cust"),
        F.count("*").over(w_range).alias("orders_last_30d"),
    )


@query(
    "events_sliding_window",
    """
    WITH slid AS (
      SELECT e.event_type, e.value,
             date_trunc('hour', e.ts) - (k.k * INTERVAL 1 HOUR) AS w_start
      FROM events e, (SELECT unnest(range(2)) AS k) k
      WHERE date_trunc('hour', e.ts) - (k.k * INTERVAL 1 HOUR)
            + INTERVAL 2 HOUR > e.ts
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events
    FROM slid GROUP BY w_start, event_type
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-hour width, 1-hour slide) via F.window — each event
    lands in 2 overlapping windows; batch form of the streaming sliding agg."""
    e = load(spark, "events", sf_dir)
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
        )
    )

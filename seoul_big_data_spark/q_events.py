"""Event-stream analytics as batch queries (SURVEY.md §2.8 + engine scope):
JSON extraction, tumbling time windows, sessionization, as-of and range
joins. The identical DataFrame code is the Structured Streaming program once
``read`` becomes ``readStream`` + a watermark; batch keeps it DuckDB-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.joins import asof_join, range_join
from .registry import query
from .sources.tables import load
from .streaming.batch_windows import hourly_rollup, session_stats


@query(
    "events_json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the props column (engine scope, §2.7)."""
    e = load(spark, "events", sf_dir)
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
    )


@query(
    "events_json_schema",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS total_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2)
             AS avg_k
    FROM events GROUP BY event_type
    """,
)
def events_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → typed struct → aggregate
    (vs. get_json_object string probing)."""
    e = load(spark, "events", sf_dir)
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = e.withColumn("p", F.from_json("props", schema))
    return parsed.groupBy("event_type").agg(
        F.sum("p.k").alias("total_k"),
        F.round(F.avg("p.k"), 2).alias("avg_k"),
    )


@query(
    "events_hourly_rollup",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the streaming
    windowed agg, SURVEY.md §2.8)."""
    e = load(spark, "events", sf_dir)
    out = hourly_rollup(e)
    return out.select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "events_sessionization",
    """
    WITH t AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tss FROM events
    ), g AS (
      SELECT user_id, tss,
             CASE WHEN tss - lag(tss) OVER (PARTITION BY user_id ORDER BY tss)
                       > 1800
                  OR lag(tss) OVER (PARTITION BY user_id ORDER BY tss) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t
    ), s AS (
      SELECT user_id, tss,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY tss
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           max(tss) - min(tss) AS duration_sec
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via lag-gap cumulative sum (30-min gap) — the batch
    equivalent of a streaming session window (SURVEY.md §2.8)."""
    e = load(spark, "events", sf_dir)
    return session_stats(e, gap_minutes=30).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "n_events",
        "duration_sec",
    )


@query(
    "events_asof_join",
    """
    WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id, CAST(NULL AS BIGINT) AS p_id
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, ts, 0 AS side, CAST(NULL AS BIGINT), event_id
      FROM events WHERE event_type = 'purchase'
    ), f AS (
      SELECT user_id, side, event_id,
             last_value(p_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side
               ROWS UNBOUNDED PRECEDING) AS asof_event_id
      FROM u
    )
    SELECT event_id, user_id, asof_event_id FROM f WHERE side = 1
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the latest purchase event of the
    same user at-or-before it (union-and-window implementation — one shuffle
    on user_id, no cross product; operators/joins.py::asof_join)."""
    e = load(spark, "events", sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), "user_id", "ts"
    )
    out = asof_join(
        errors,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["p_event_id"],
    )
    return out.select(
        "event_id", "user_id", F.col("asof_p_event_id").alias("asof_event_id")
    )


@query(
    "events_range_join",
    """
    SELECT b.band_name, count(*) AS n_events, round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN (VALUES ('low', 0.0, 100.0), ('mid', 100.0, 500.0), ('high', 500.0, 1e18))
         b(band_name, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_name
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/band join: events bucketed into value bands (broadcast
    nested-loop on a tiny dim — operators/joins.py::range_join)."""
    e = load(spark, "events", sf_dir)
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band_name string, lo double, hi double",
    )
    joined = range_join(e, bands, F.col("value"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band_name").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_type_share",
    """
    SELECT event_type, count(*) AS n,
           round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE), 6)
             AS share
    FROM events GROUP BY event_type
    """,
)
def events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + window-over-aggregate (share of total)."""
    e = load(spark, "events", sf_dir)
    counts = e.groupBy("event_type").agg(F.count("*").alias("n"))
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy()), 6).alias(
            "share"
        ),
    )

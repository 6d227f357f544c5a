"""SQL API surface (SURVEY.md §1.4, pyspark guide: SQL and DataFrame APIs
produce the same Catalyst plans).

``register_tables`` + ``run_sql`` give users the ad-hoc SQL entry point over
the same engine; the registered queries below prove the surface, including
one whose *identical* SQL text runs on both Spark and the DuckDB oracle
(shared ANSI dialect — the portability check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .sources.tables import load_all


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ad-hoc SQL."""
    load_all(spark, sf_dir)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Ad-hoc SQL over the registered engine tables."""
    register_tables(spark, sf_dir)
    return spark.sql(sql)


# Identical text on both engines: ANSI constructs only (no strftime /
# date_format divergence), decimal-determinism convention for the sum.
_SHARED_SQL = """
    SELECT l_returnflag,
           count(*) AS n_items,
           count(DISTINCT l_orderkey) AS n_orders,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.08
    GROUP BY l_returnflag
"""


@query("sql_shared_dialect", _SHARED_SQL)
def sql_shared_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same SQL string executed by Spark SQL here and by DuckDB as the
    oracle — the engine's SQL API is first-class, not a wrapper."""
    return run_sql(spark, sf_dir, _SHARED_SQL)


@query(
    "sql_window_over_join",
    """
    SELECT c_custkey, o_orderkey, rk FROM (
      SELECT c.c_custkey, o.o_orderkey,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 2
    """,
)
def sql_window_over_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API join + window (same plan Catalyst builds for the DataFrame
    form — window_topk_per_group — demonstrated through spark.sql)."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, o_orderkey, rk FROM (
          SELECT c.c_custkey, o.o_orderkey,
                 row_number() OVER (PARTITION BY c.c_custkey
                                    ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
          FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        ) WHERE rk <= 2
        """,
    )


@query(
    "sql_parameterized_query",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 4 `spark.sql(query, args={...})`):
    parameter markers bind server-side as literals in the plan — the
    injection-safe ad-hoc surface. Constant folding then treats them
    exactly like inline literals (the filter still pushes to the scan),
    so the oracle is the same query with the values folded in."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 1000.0},
    )


@query(
    "sql_lateral_column_alias",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE)      AS gross
    FROM lineitem
    WHERE l_quantity >= 48
    """,
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases (Spark 3.4+): `gross` references the `net`
    alias defined earlier in the SAME select list — no subquery nesting.
    DuckDB lacks the construct, so the oracle re-expands the alias. The
    intermediate is an exact decimal cast to double; gross is then one
    IEEE double multiply on both engines — deterministic per row, no
    accumulation order in play."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net,
               net * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE)    AS gross
        FROM lineitem
        WHERE l_quantity >= 48
        """
    )


@query(
    "sql_pipe_syntax",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    HAVING count(*) > 10
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the same logical plan as
    the nested form, written as a linear dataflow — FROM, then WHERE, then
    AGGREGATE ... GROUP BY, then a post-aggregation WHERE standing in for
    HAVING. Catalyst compiles both spellings identically (filters still
    push down), so the oracle is the classic formulation."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                       AS revenue
           GROUP BY o_orderpriority
        |> WHERE n > 10
        |> SELECT o_orderpriority, n, revenue
        """
    )


@query(
    "sql_scripting_block",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_above
    FROM orders
    WHERE o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN…END blocks): a session variable
    declared and referenced inside the script parameterizes the final
    statement, whose result set is the block's result. The variable binds
    as a foldable literal (the filter still reaches the scan), so the
    oracle is the statement with the value folded in."""
    register_tables(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE price_floor DOUBLE DEFAULT 150000.0;
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_above
          FROM orders
          WHERE o_totalprice >= price_floor
          GROUP BY o_orderpriority;
        END
        """
    )


@query(
    "sql_collation_case_insensitive",
    """
    WITH m AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                  ELSE p_name END AS nm
      FROM part
    )
    SELECT lower(nm) AS name_ci, CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY lower(nm)
    """,
)
def sql_collation_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): grouping on a UTF8_LCASE-collated key
    folds case variants into one group WITHOUT rewriting the expression —
    the engine-level answer to scattering lower() through every
    comparison (and, unlike lower(), collation-aware joins/sorts keep
    pushdown and codegen). The fixture is all-lowercase, so half the rows
    are upper-cased first; the projection lowers the representative so
    the output is deterministic whichever variant each group surfaces.
    The oracle is the classic lower() rewrite."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH m AS (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                      ELSE p_name END COLLATE UTF8_LCASE AS nm
          FROM part
        )
        SELECT lower(nm) AS name_ci, CAST(count(*) AS BIGINT) AS n
        FROM m GROUP BY nm
        """
    )


@query(
    "agg_listagg_ordered",
    """
    SELECT p_brand,
           string_agg(DISTINCT p_type, ',' ORDER BY p_type) AS types_csv,
           CAST(len(string_split(
             string_agg(DISTINCT p_type, ',' ORDER BY p_type), ','))
             AS BIGINT) AS n_types
    FROM part GROUP BY p_brand
    """,
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (SQL:2016, Spark 4) with WITHIN GROUP ordering — the
    standard spelling of the deterministic string aggregation that
    `agg_collect_sorted` builds manually from sort_array+array_join;
    DuckDB's equivalent is ordered string_agg. The explicit ORDER BY is
    what makes the result partitioning-stable. (n_types derives from the
    CSV: Spark 4.1 rejects listagg(DISTINCT) WITHIN GROUP mixed with a
    second distinct aggregate in one SELECT — SortOrder cast error in the
    distinct-expand rewrite.)"""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, types_csv,
               CAST(size(split(types_csv, ',')) AS BIGINT) AS n_types
        FROM (
          SELECT p_brand,
                 listagg(DISTINCT p_type, ',')
                   WITHIN GROUP (ORDER BY p_type) AS types_csv
          FROM part GROUP BY p_brand
        )
        """
    )


@query(
    "sql_group_by_all",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/SQL sugar): every non-aggregate select
    item becomes a group key — kills the classic edit hazard of adding a
    projection column and forgetting the GROUP BY (silent wrong answer in
    engines that allow it, analysis error otherwise). Compiles to the
    identical plan the explicit form produces; the oracle spells it out."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY ALL
        """
    )

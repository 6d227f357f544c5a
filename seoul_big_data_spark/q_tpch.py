"""TPC-H-style multi-join analytical queries — the canonical star-schema
shapes the engine must plan well at 100 TB (broadcast dims onto the lineitem
fact, partial aggregation before the group-key shuffle, AQE join selection).

Money sums follow the decimal-determinism convention (registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.tables import load


def _dec(c: str, t: str = "decimal(12,2)"):
    return F.col(c).cast(t)


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: dim-filtered fact join + grouped revenue. customer is
    broadcast; the only shuffle is the final group on l_orderkey."""
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: six-way join with a local-supplier (same-nation) predicate;
    all dims broadcast, lineitem never shuffles until the final small group."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load(spark, "nation", sf_dir)
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "correlated_above_avg_orders",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > (
      SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its customer's average) —
    decorrelated into a window average, the scalable plan Spark/Catalyst
    would also produce for the SQL form. Average built from the decimal sum
    so the boundary comparison is engine-independent."""
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey")
    avg = (
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        o.withColumn("_avg", avg)
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price")
        )
    )


@query(
    "scalar_subquery_vs_global_max",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_retailprice > 0.95 * (SELECT max(p_retailprice) FROM part)
    """,
)
def scalar_subquery_vs_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — evaluated once, broadcast as a literal
    predicate (no per-row recomputation)."""
    p = load(spark, "part", sf_dir)
    mx = p.agg(F.max("p_retailprice")).first()[0]
    return p.filter(F.col("p_retailprice") > 0.95 * mx).select("p_partkey", "p_name")


@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: reused CTE (computed once, referenced twice — Catalyst
    dedups via subquery reuse) + uncorrelated max subquery."""
    l = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
        .cast("double")
        .alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue")).first()[0]
    s = load(spark, "supplier", sf_dir)
    return (
        s.join(F.broadcast(revenue), s.s_suppkey == revenue.supplier_no)
        .filter(F.col("total_revenue") == mx)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: anti-join exclusion list + distinct count over a dim
    join."""
    p = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    l = load(spark, "lineitem", sf_dir)
    excluded = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        l.join(excluded, "l_suppkey", "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q19_disjunctive",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunction of conjunctive join-filter branches — the
    CNF-extraction stress test (Catalyst pushes the common p_partkey equi-key
    into the hash join and the per-branch predicates past it)."""
    l = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir)
    j = l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
    cond = (
        ((p.p_brand == "Brand#1") & p.p_size.between(1, 5) & l.l_quantity.between(1, 11))
        | ((p.p_brand == "Brand#2") & p.p_size.between(1, 10) & l.l_quantity.between(10, 20))
        | ((p.p_brand == "Brand#3") & p.p_size.between(1, 15) & l.l_quantity.between(20, 30))
    )
    return j.filter(cond).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
        .cast("double")
        .alias("revenue")
    )


@query(
    "tpch_q22_global_sales",
    """
    WITH eligible AS (
      SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE substring(c_name, 17, 2) IN ('01', '02', '03', '04', '05')
        AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
          FROM customer WHERE c_acctbal > 0.0
        )
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: substring-derived key + scalar-subquery threshold +
    NOT EXISTS anti-join (restricted to urgent orders so the synthetic data
    yields a non-empty result)."""
    c = load(spark, "customer", sf_dir)
    code = F.substring("c_name", 17, 2)
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        )
        .first()[0]
    )
    eligible = c.filter(
        code.isin("01", "02", "03", "04", "05") & (F.col("c_acctbal") > avg_bal)
    ).select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        eligible.join(o, "c_custkey", "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )

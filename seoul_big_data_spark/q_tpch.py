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
    """Q3 shape: dim-filtered fact join + grouped revenue. orders and
    customer are fact-sized (no broadcast hint — AQE picks the strategy from
    runtime sizes; at 100 TB this is a sort-merge on the key, ideally over
    the bucketed layout proven in ``join_bucketed_fact_fact``)."""
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        l.join(o.join(c, o.o_custkey == c.c_custkey),
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
    """Q5 shape: six-way join with a local-supplier (same-nation) predicate.
    True dims (supplier/nation/region) are broadcast; orders and customer are
    fact-sized and left unhinted so AQE sizes the join — at sf0.01 it will
    promote them to broadcast at runtime, at 100 TB it sort-merges."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
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
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
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
    """Uncorrelated scalar subquery — the 1-row max aggregate rides in the
    plan as a broadcast cross-join (one job; no eager .first() that would
    re-scan the table in a separate job)."""
    p = load(spark, "part", sf_dir)
    mx = p.agg(F.max("p_retailprice").alias("_mx"))
    return (
        p.crossJoin(F.broadcast(mx))
        .filter(F.col("p_retailprice") > 0.95 * F.col("_mx"))
        .select("p_partkey", "p_name")
    )


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
    """Q15 shape: reused CTE + uncorrelated max subquery. The max rides as
    a window aggregate OVER the revenue rows themselves (single-partition
    window — legitimate here because revenue is already reduced to supplier
    cardinality), so lineitem is scanned exactly ONCE and the whole query
    is one job; the crossJoin-broadcast alternative plans the revenue
    aggregate twice because the broadcast and max subtrees cannot share an
    exchange."""
    l = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.withColumn(
        "_mx", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("_mx"))
    s = load(spark, "supplier", sf_dir)
    return (
        s.join(F.broadcast(top), s.s_suppkey == F.col("supplier_no"))
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
    yields a non-empty result).

    Skew: the anti join's right side carries only EXISTENCE per key, so it
    is deduplicated to distinct custkeys before the join — the partial
    (map-side) aggregate collapses a hot foreign key (a whale account
    owning 25% of orders measured 2.92× on the x32skeworders tier,
    SCALE_RUN.json r10) to one row per mapper before any exchange, and the
    distinct key set is small enough to broadcast, so the anti join itself
    plans as a BroadcastHashJoin with no orders-sized shuffle at all."""
    c = load(spark, "customer", sf_dir)
    code = F.substring("c_name", 17, 2)
    # The average-balance threshold rides in the plan as a broadcast 1-row
    # aggregate (single job) instead of an eager .first() scalar re-scan.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("_avg_bal")
    )
    eligible = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(
            code.isin("01", "02", "03", "04", "05")
            & (F.col("c_acctbal") > F.col("_avg_bal"))
        )
        .select(code.alias("cntrycode"), "c_acctbal", "c_custkey")
    )
    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
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


@query(
    "tpch_q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year — the
    self-join-on-dim (nation aliased twice) pattern with a disjunctive
    pair filter that Catalyst cannot push into either single dim alone."""
    l = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n1 = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    """
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: market-share ratio — conditional aggregation over an
    eight-way star join; both ratio legs are exact decimal sums cast to
    double before the single IEEE division."""
    l = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n1 = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n2 = load(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(0.4 AS DECIMAL(2,1))
                      * CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by nation/year. The reference schema has no
    partsupp table, so supply cost is modeled as 0.4 * p_retailprice —
    all arithmetic stays in exact decimals until the final cast."""
    l = load(spark, "lineitem", sf_dir)
    p = load(spark, "part", sf_dir).filter(F.col("p_name").contains("widget"))
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    o = load(spark, "orders", sf_dir)
    cost = (
        F.lit("0.4").cast("decimal(2,1)")
        * _dec("p_retailprice")
        * _dec("l_quantity")
    )
    amount = _dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")) - cost
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@query(
    "tpch_q11_important_value",
    """
    SELECT n_name, s_suppkey, CAST(value_dec AS DOUBLE) AS value
    FROM (
      SELECT n_name, s_suppkey, value_dec,
             sum(value_dec) OVER () AS total_dec
      FROM (
        SELECT n.n_name, s.s_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, s.s_suppkey
      )
    )
    WHERE CAST(value_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * CAST(0.01 AS DOUBLE)
    """,
)
def tpch_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: grouped value filtered against a fraction of the global
    total (scalar subquery). No partsupp table in this schema, so lineitem
    revenue stands in for stock value. The total is a window sum OVER the
    grouped (supplier-sized) result — lineitem is scanned exactly ONCE;
    computing the total from raw lineitem in a second subtree would double
    the fact scan for the same number (the grouped values partition the
    joined universe). Both engines keep the per-group sums and the window
    total in exact decimal, so the threshold comparison is deterministic."""
    l = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))
    grouped = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(vol).alias("value_dec"))
    )
    total = F.sum("value_dec").over(Window.partitionBy())
    return (
        grouped.withColumn("_total", total)
        .filter(
            F.col("value_dec").cast("double")
            > F.col("_total").cast("double") * 0.01
        )
        .select(
            "n_name", "s_suppkey", F.col("value_dec").cast("double").alias("value")
        )
    )


@query(
    "tpch_q13_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: order-count histogram including zero-order customers —
    outer join with an ON-clause (not WHERE) filter, then two stacked
    aggregations. The second groupBy is tiny (distinct counts), so the
    only real shuffle is the first group on c_custkey."""
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(4,2))) END)
                AS DOUBLE) * 100
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional-share-of-total in one aggregation pass over a
    month of shipments; part is broadcast onto the pruned lineitem scan."""
    l = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load(spark, "part", sf_dir)
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double") * 100
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q17_small_qty_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
        SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average decorrelated into a window —
    rows below 20% of their part's mean quantity. The window partitions by
    l_partkey AFTER the broadcast part filter, so the per-part mean is
    computed only for the surviving ~1/25 of parts, exactly matching the
    correlated subquery's scope (every lineitem of those parts is present:
    the join is on the part key itself)."""
    p = load(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#3")
    l = load(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(_dec("l_quantity")).over(w).cast("double") / F.count("*").over(w)
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .withColumn("_avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.2).cast("double") * F.col("_avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH eu AS (
      SELECT l.l_partkey, l.l_suppkey,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, s.s_name, e.unit_price
    FROM eu e
    JOIN part p     ON e.l_partkey = p.p_partkey
    JOIN supplier s ON e.l_suppkey = s.s_suppkey
    WHERE p.p_type = 'LARGE' AND p.p_size < 10
      AND e.unit_price = (SELECT min(e2.unit_price) FROM eu e2
                          WHERE e2.l_partkey = e.l_partkey)
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: cheapest supplier per part within a region — the
    correlated-min subquery, decorrelated into a window min. No partsupp
    table in this schema, so observed unit price (extendedprice/quantity,
    one IEEE division both engines) stands in for ps_supplycost. Ties at
    the min are all retained, as in the SQL form."""
    l = load(spark, "lineitem", sf_dir)
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    p = load(spark, "part", sf_dir).filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") < 10)
    )
    eu = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            "s_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("_min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("_min_price"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_partkey", "p_name", "s_name", "unit_price")
    )


@query(
    "tpch_q20_part_promotion",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey FROM shipped sh
      JOIN part p ON sh.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO' AND sh.qty > CAST(50 AS DOUBLE)
    )
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain — suppliers who moved more than a
    threshold quantity of promo parts in a year. The inner aggregate
    (shipped) groups the pruned fact once; the IN becomes a left-semi
    broadcast join against the (tiny) qualifying-supplier set."""
    l = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    shipped = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("qty")
    )
    qualifying = (
        shipped.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(F.col("qty") > F.lit(50).cast("double"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = load(spark, "supplier", sf_dir)
    n = load(spark, "nation", sf_dir)
    return (
        s.join(qualifying, "s_suppkey", "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@query(
    "tpch_q21_waiting_supplier",
    """
    SELECT s.s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS against the same fact — suppliers who
    are the SOLE returner in a multi-supplier finished order. The schema has
    no commit/receipt dates, so l_returnflag='R' stands in for 'kept the
    order waiting'. Both EXISTS decorrelate into ONE per-order aggregate:
    because qualifying orders have exactly one distinct returning supplier,
    that supplier's key and its R-lineitem count ride the same aggregation
    (max/count over the R-filtered rows), so no second fact pass and no
    semi-join back — a single shuffle on l_orderkey, then a broadcast
    supplier lookup over order-cardinality rows."""
    o = (
        load(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l = load(spark, "lineitem", sf_dir).join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    )
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    # r10: the two COUNT(DISTINCT ...) only ever feed threshold tests —
    # "n_supp > 1" is min(suppkey) != max(suppkey) and "n_ret == 1" is
    # "some R-supplier exists and min == max" — so the aggregate needs no
    # distinct at all. The count_distinct form planned an Expand(×3) (every
    # joined lineitem row tripled before the partial aggregate) plus a
    # second Exchange for the re-group to order grain; this form is ONE
    # map-side-combinable aggregate with 5 longs of state and ONE exchange
    # on l_orderkey (plans/r10/tpch_q21_waiting_supplier_{before,after}.txt:
    # Expand gone, 2 corpus exchanges → 1). Same rows out: r_supp ==
    # max(ret_supp) under n_ret == 1, and the filters are equivalences,
    # not approximations.
    per_order = l.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("s_min"),
        F.max("l_suppkey").alias("s_max"),
        F.min(ret_supp).alias("r_min"),
        F.max(ret_supp).alias("r_supp"),
        F.count(ret_supp).alias("n_r_items"),
    )
    s = load(spark, "supplier", sf_dir)
    return (
        per_order.filter(
            (F.col("s_min") != F.col("s_max"))
            & F.col("r_supp").isNotNull()
            & (F.col("r_min") == F.col("r_supp"))
        )
        .join(F.broadcast(s), F.col("r_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r_items").cast("long").alias("numwait"))
    )


@query(
    "join_bucketed_fact_fact",
    """
    SELECT o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact over the co-located bucketed layout — the 100 TB strategy
    for joins whose both sides are too big to broadcast (SCALE.md: bucket
    lineitem and orders on the order key once at write time; every subsequent
    join on that key is exchange-free).

    Both sides are written with ``bucketBy(16, key).sortBy(key)`` and re-read
    from the catalog, so the join plan has NO Exchange on the fact join — the
    only shuffle left is the final 5-group aggregate. Asserted mechanically in
    ``tools/plan_audit.py`` (negative needle: no ``hashpartitioning(l_orderkey``).
    The write cost is paid once and amortized across every downstream join —
    the same trade Hive/Iceberg bucketing makes — so the write runs only when
    this session has not yet materialized the layout for this sf_dir (table
    names carry the sf tag; re-running the query times the exchange-free
    join, not a redundant rewrite).
    """
    import os
    import re as _re
    import tempfile

    li = load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    tag = _re.sub(r"\W+", "_", sf_dir.strip("/"))
    base = os.path.join(tempfile.gettempdir(), f"seoul_bucketed_{tag}")
    for name, df in ((f"li_fact_bucketed_{tag}", li), (f"o_fact_bucketed_{tag}", o)):
        path = os.path.join(base, name)
        if spark.catalog.tableExists(name) and os.path.isdir(path):
            continue  # layout already materialized this session for this sf
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(16, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
    joined = spark.table(f"li_fact_bucketed_{tag}").join(
        spark.table(f"o_fact_bucketed_{tag}"), "l_orderkey"
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount", "decimal(4,2)")))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )

"""Statistical aggregates + remaining TPC-H shapes + TF-IDF + embedding
near-dup (engine breadth beyond the reference's counters)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.vector import cosine
from .operators import windows
from .registry import query
from .sources.tables import load

_DUCK_TOKENS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


@query(
    "agg_corr_covar",
    """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE)  AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(7,2))
                      * CAST(l_quantity AS DECIMAL(7,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(7,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS qty_price_corr,
           round((sxy - sx * sy / n) / (n - 1), 2) AS qty_price_covar,
           round((syy / n) - (sy / n) * (sy / n), 2) AS price_var_pop
    FROM s
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar / variance from exact decimal power sums.

    Spark's and DuckDB's built-in co-moment accumulators disagree at ~1e-4
    on small groups (different merge formulas), which no rounding fixes
    reliably; computing the raw power sums as exact decimals and applying
    one identical IEEE formula on both sides is deterministic bit-for-bit.
    The built-ins (F.corr/F.covar_samp/F.skewness/F.kurtosis) remain the
    single-engine surface — see `agg_moments_builtin` (rows-only).
    """
    li = load(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast("decimal(7,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    return s.select(
        "l_returnflag",
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6
        ).alias("qty_price_corr"),
        F.round((sxy - sx * sy / n) / (n - 1), 2).alias("qty_price_covar"),
        F.round((syy / n) - (sy / n) * (sy / n), 2).alias("price_var_pop"),
    )


@query(
    "agg_moments_builtin",
    """
    WITH st AS (
      SELECT l_returnflag,
             avg(CAST(l_quantity AS DOUBLE)) AS mq,
             avg(CAST(l_extendedprice AS DOUBLE)) AS mp
      FROM lineitem GROUP BY l_returnflag
    ), mo AS (
      SELECT l.l_returnflag,
             count(*) AS n,
             avg((CAST(l_quantity AS DOUBLE) - mq)
                 * (CAST(l_extendedprice AS DOUBLE) - mp)) AS cqp,
             sum((CAST(l_quantity AS DOUBLE) - mq)
                 * (CAST(l_extendedprice AS DOUBLE) - mp)) AS sqp,
             avg((CAST(l_quantity AS DOUBLE) - mq)
                 * (CAST(l_quantity AS DOUBLE) - mq)) AS m2q,
             avg((CAST(l_extendedprice AS DOUBLE) - mp)
                 * (CAST(l_extendedprice AS DOUBLE) - mp)) AS m2p,
             avg(((CAST(l_extendedprice AS DOUBLE) - mp)
                 * (CAST(l_extendedprice AS DOUBLE) - mp))
                 * (CAST(l_extendedprice AS DOUBLE) - mp)) AS m3p,
             avg((((CAST(l_extendedprice AS DOUBLE) - mp)
                 * (CAST(l_extendedprice AS DOUBLE) - mp))
                 * (CAST(l_extendedprice AS DOUBLE) - mp))
                 * (CAST(l_extendedprice AS DOUBLE) - mp)) AS m4p
      FROM lineitem l JOIN st USING (l_returnflag)
      GROUP BY l.l_returnflag
    )
    SELECT l_returnflag,
           round(cqp / sqrt(m2q * m2p), 4) AS qty_price_corr,
           round(sqp / (n - 1), 2) AS qty_price_covar,
           round(m3p / (m2p * sqrt(m2p)), 4) AS price_skew,
           round(m4p / (m2p * m2p) - 3, 4) AS price_kurt
    FROM mo
    """,
)
def agg_moments_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in higher-moment aggregates (corr/covar/skewness/kurtosis) —
    the idiomatic single-engine surface; exact-DECIMAL cross-engine
    arithmetic is separately pinned by `agg_corr_covar`/`agg_skew_kurt_exact`.

    Hash-checked (r8): the oracle mirrors Spark's POPULATION-moment
    definitions (skewness = m3/m2^1.5, kurtosis = m4/m2^2 - 3 — DuckDB's
    builtins apply sample bias corrections, so the formulas are spelled
    out) as a two-pass centered aggregate. Spark's one-pass streaming
    accumulator and the oracle's two-pass differ by ~1e-12 relative —
    invisible under round-4 on O(1) ratios and round-2 on the ~1e5
    covariance (midpoint collisions measure-zero, the repo convention)."""
    return (
        load(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covar"
            ),
            F.round(F.skewness("l_extendedprice"), 4).alias("price_skew"),
            F.round(F.kurtosis("l_extendedprice"), 4).alias("price_kurt"),
        )
    )


@query(
    "agg_skew_kurt_exact",
    """
    WITH p AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(9,2)) AS x1,
             CAST(CAST(l_extendedprice AS DECIMAL(9,2))
                  * CAST(l_extendedprice AS DECIMAL(9,2)) AS DECIMAL(19,4)) AS x2
      FROM lineitem
    ), p2 AS (
      SELECT l_returnflag, x1, x2,
             CAST(x2 * x1 AS DECIMAL(22,6)) AS x3
      FROM p
    ), p3 AS (
      SELECT l_returnflag, x1, x2, x3,
             CAST(x3 * x1 AS DECIMAL(32,8)) AS x4
      FROM p2
    ), s AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x1) AS DOUBLE) AS s1,
             CAST(sum(x2) AS DOUBLE) AS s2,
             CAST(sum(x3) AS DOUBLE) AS s3,
             CAST(sum(x4) AS DOUBLE) AS s4
      FROM p3 GROUP BY l_returnflag
    ), m AS (
      SELECT l_returnflag,
             s1 / n AS m1, s2 / n AS r2, s3 / n AS r3, s4 / n AS r4
      FROM s
    ), c AS (
      SELECT l_returnflag, m1, r2, r3, r4,
             r2 - m1 * m1 AS m2,
             r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                - 3.0 * m1 * m1 * m1 * m1 AS m4
      FROM m
    )
    SELECT l_returnflag,
           round(m3 / (sqrt(m2) * m2), 6) AS price_skew,
           round(m4 / (m2 * m2) - 3.0, 6) AS price_kurt
    FROM c
    """,
)
def agg_skew_kurt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness / excess kurtosis from exact decimal power sums — the
    cross-engine-deterministic twin of `agg_moments_builtin`'s
    F.skewness/F.kurtosis (engine-native accumulators use different merge
    formulas and drift at ~1e-4 on small groups).

    Each power is computed in decimal with the precision/scale widened at
    every multiply (x4 tops out at decimal(32,8); its sum fits decimal(38,8)
    through ~10^13 rows per group), so the sums are exact integers-in-scale
    on both engines; one shared IEEE formula — only +,-,*,/ and sqrt, no
    pow, all of which are correctly-rounded and engine-independent — then
    maps the sums to g1 = m3/m2^1.5 and excess g2 = m4/m2^2 - 3, matching
    Spark's population-moment convention. Equality with the built-ins is
    pinned in tests/test_stats_moments.py."""
    li = load(spark, "lineitem", sf_dir)
    x1 = F.col("l_extendedprice").cast("decimal(9,2)")
    p = li.select(
        "l_returnflag", x1.alias("x1"), (x1 * x1).cast("decimal(19,4)").alias("x2")
    )
    p2 = p.withColumn("x3", (F.col("x2") * F.col("x1")).cast("decimal(22,6)"))
    p3 = p2.withColumn("x4", (F.col("x3") * F.col("x1")).cast("decimal(32,8)"))
    s = p3.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        F.sum("x4").cast("double").alias("s4"),
    )
    m = s.select(
        "l_returnflag",
        (F.col("s1") / F.col("n")).alias("m1"),
        (F.col("s2") / F.col("n")).alias("r2"),
        (F.col("s3") / F.col("n")).alias("r3"),
        (F.col("s4") / F.col("n")).alias("r4"),
    )
    m1, r2, r3, r4 = (F.col(c) for c in ("m1", "r2", "r3", "r4"))
    c = m.select(
        "l_returnflag",
        m1,
        r2,
        r3,
        r4,
        (r2 - m1 * m1).alias("m2"),
        (r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1).alias("m3"),
        (
            r4
            - F.lit(4.0) * m1 * r3
            + F.lit(6.0) * m1 * m1 * r2
            - F.lit(3.0) * m1 * m1 * m1 * m1
        ).alias("m4"),
    )
    m2, m3, m4 = (F.col(x) for x in ("m2", "m3", "m4"))
    return c.select(
        "l_returnflag",
        F.round(m3 / (F.sqrt(m2) * m2), 6).alias("price_skew"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("price_kurt"),
    )


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-sum — the pushdown benchmark (every
    predicate reaches the parquet reader; zero shuffles, scalar result)."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS with a correlated inequality — left-semi join with a
    non-equi conjunct (Catalyst keeps the equi key for the hash join and
    applies the inequality as a post-condition)."""
    o = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, "lineitem", sf_dir)
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q12_shipmode",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'N'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + conditional counting. orders is fact-sized — no
    broadcast hint (the round-2 un-pin missed this one; caught when the
    fact-broadcast audit re-ran round 7): AQE sizes the join at runtime,
    sort-merge over the bucketed layout at 100 TB."""
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "N")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING sum(CAST(l.l_quantity AS DECIMAL(12,2))) > 150
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: group-by with HAVING over the join. orders is fact-sized —
    no broadcast hint; AQE sizes the join (sort-merge at 100 TB, ideally over
    the bucketed order-key layout of ``join_bucketed_fact_fact``)."""
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir)
    qty = F.sum(F.col("l_quantity").cast("decimal(12,2)"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(qty.cast("double").alias("total_qty"), qty.alias("_q"))
        .filter(F.col("_q") > 150)
        .drop("_q")
    )


@query(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT doc_id, token,
           round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf, rk
    FROM (
      SELECT t.doc_id, t.token,
             t.tf, d.df, n.n_docs,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df) DESC, t.token
             ) AS rk
      FROM tf t JOIN df d ON t.token = d.token CROSS JOIN n
    ) WHERE rk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 — TF-IDF with top-3 terms per document: two aggregations + a
    broadcast of the (small) document-frequency table + per-doc window."""
    d = load(spark, "documents", sf_dir)
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != F.lit(""))
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    # n_docs rides in the plan as a broadcast 1-row aggregate (one job, no
    # eager .count() re-scan of documents).
    nrow = d.agg(F.count("*").cast("double").alias("_n_docs"))
    tfidf = F.col("tf") * F.log(F.col("_n_docs") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc(tfidf), F.asc("token"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(nrow))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", F.round(tfidf, 6).alias("tfidf"), "rk")
    )


@query(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                      AS DOUBLE), 4) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.25
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 — embedding-cosine near-duplicate pairs (bounded probe set for the
    oracle; the scale path pre-buckets with LSH signs exactly as
    operators/similarity.py::lsh_topk)."""
    emb = load(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = cosine("va", "vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.25)
        .select("id_a", "id_b", F.round("cos_raw", 4).alias("cos"))
    )


@query(
    "agg_percentile_exact",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 2) AS p25,
           round(quantile_cont(l_quantity, 0.5),  2) AS p50,
           round(quantile_cont(l_quantity, 0.75), 2) AS p75,
           round(quantile_cont(l_quantity, 0.9),  2) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (both engines use
    the 1 + p·(n-1) rank definition, verified value-identical). The exact
    form sorts each group's values — fine per-group here; at 100 TB prefer
    `agg_percentile_approx` (t-digest-style sketch, mergeable map-side)
    and keep this for the final small-group pass."""
    l = load(spark, "lineitem", sf_dir)
    return l.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 2).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 2).alias("p75"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 2).alias("p90"),
    )


@query(
    "stats_winsorize_acctbal",
    """
    WITH b AS (
      SELECT c_mktsegment,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           round(CASE WHEN c.c_acctbal < b.lo THEN b.lo
                      WHEN c.c_acctbal > b.hi THEN b.hi
                      ELSE c.c_acctbal END, 2) AS bal_winsor,
           CAST(c.c_acctbal < b.lo OR c.c_acctbal > b.hi AS BOOLEAN) AS clipped
    FROM customer c JOIN b ON c.c_mktsegment = b.c_mktsegment
    """,
)
def stats_winsorize_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clamping) at exact per-group 5th/95th
    percentiles: one percentile aggregate per segment (group-count-sized,
    broadcast back), then a pure map-side clamp over the fact — the robust
    preprocessing step for spend features. Exact `percentile` matches
    DuckDB's quantile_cont interpolation (pinned by agg_percentile_exact)."""
    c = load(spark, "customer", sf_dir)
    b = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.05)").alias("lo"),
        F.expr("percentile(c_acctbal, 0.95)").alias("hi"),
    )
    j = c.join(F.broadcast(b), "c_mktsegment")
    clamped = (
        F.when(F.col("c_acctbal") < F.col("lo"), F.col("lo"))
        .when(F.col("c_acctbal") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("c_acctbal"))
    )
    return j.select(
        "c_custkey",
        "c_mktsegment",
        F.round(clamped, 2).alias("bal_winsor"),
        (
            (F.col("c_acctbal") < F.col("lo"))
            | (F.col("c_acctbal") > F.col("hi"))
        ).alias("clipped"),
    )


@query(
    "stats_chi2_priority_status",
    """
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS o
      FROM orders GROUP BY 1, 2
    ), rowm AS (
      SELECT pri, sum(o) AS rt FROM obs GROUP BY pri
    ), colm AS (
      SELECT st, sum(o) AS ct FROM obs GROUP BY st
    ), n AS (
      SELECT sum(o) AS n FROM obs
    )
    SELECT round(sum(
             (obs.o - rowm.rt * colm.ct * 1.0 / n.n)
             * (obs.o - rowm.rt * colm.ct * 1.0 / n.n)
             / (rowm.rt * colm.ct * 1.0 / n.n)
           ), 6) AS chi2,
           CAST((count(DISTINCT obs.pri) - 1)
                * (count(DISTINCT obs.st) - 1) AS BIGINT) AS dof
    FROM obs JOIN rowm ON obs.pri = rowm.pri
             JOIN colm ON obs.st = colm.st
             CROSS JOIN n
    """,
)
def stats_chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the priority x status
    contingency table: observed cells from one aggregate, marginals from two
    more (all cell-count-sized, broadcast), the statistic from a final
    single-row aggregate — categorical drift/association detection with
    zero fact-table re-scans."""
    o = load(spark, "orders", sf_dir)
    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    ).agg(F.count("*").alias("o"))
    # Marginals and total as WINDOW sums over the cell table (same pattern
    # as the mutual-information query): one orders scan; the join/broadcast
    # form replans the obs subtree once per marginal (4 fact scans).
    m = obs.select(
        "pri",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("pri")).alias("rt"),
        F.sum("o").over(Window.partitionBy("st")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("rt") * F.col("ct") * 1.0 / F.col("n")
    return m.agg(
        F.round(
            F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp), 6
        ).alias("chi2"),
        (
            (F.count_distinct("pri") - 1) * (F.count_distinct("st") - 1)
        ).alias("dof"),
    )


@query(
    "stats_source_entropy_by_lang",
    """
    WITH c AS (
      SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source
    ), t AS (
      SELECT lang, sum(n) AS tot FROM c GROUP BY lang
    )
    SELECT c.lang,
           round(-sum((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6)
             AS source_entropy,
           CAST(count(*) AS BIGINT) AS n_sources
    FROM c JOIN t ON c.lang = t.lang
    GROUP BY c.lang
    """,
)
def stats_source_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-diversity metric for corpus curation: Shannon entropy of the
    source distribution within each language — the number every data-mixture
    rebalancing loop watches. Two bucket-sized aggregates; nothing touches
    the documents twice."""
    d = load(spark, "documents", sf_dir)
    c = d.groupBy("lang", "source").agg(F.count("*").alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    return (
        c.join(F.broadcast(t), "lang")
        .groupBy("lang")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("source_entropy"),
            F.count("*").alias("n_sources"),
        )
    )


@query(
    "agg_equidepth_deciles",
    """
    WITH t AS (
      SELECT o_orderkey, o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
    FROM t GROUP BY decile
    """,
)
def agg_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucket) histogram: exact ntile deciles with a
    total order (value, key) so bucket membership is deterministic under
    ties. Registered plan is the scale-safe two-level form
    (``windows.ntile_scalable``): range-bucket on o_totalprice, per-bucket
    counts cumulated over the bounded bucket table, within-bucket
    row_number partitioned by bucket — no unpartitioned window ever touches
    the fact. Equivalence to the single-reducer ``ntile(10) OVER`` window
    is pinned in test_scale_safe_twins.py."""
    o = load(spark, "orders", sf_dir).select("o_totalprice", "o_orderkey")
    t = windows.ntile_scalable(
        o, 10, ["o_totalprice", "o_orderkey"], out="decile"
    )
    return t.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "stats_corr_matrix_lineitem",
    """
    SELECT round(corr(l_quantity, l_extendedprice), 6) AS q_price,
           round(corr(l_quantity, l_discount), 6)      AS q_disc,
           round(corr(l_quantity, l_tax), 6)           AS q_tax,
           round(corr(l_extendedprice, l_discount), 6) AS price_disc,
           round(corr(l_extendedprice, l_tax), 6)      AS price_tax,
           round(corr(l_discount, l_tax), 6)           AS disc_tax
    FROM lineitem
    """,
)
def stats_corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix over the four lineitem measures — all six
    pairs in ONE aggregate over one scan (each corr keeps constant state:
    co-moments), the profiling pass a feature-selection pipeline runs
    before training."""
    li = load(spark, "lineitem", sf_dir)
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("q_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("q_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("q_tax"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_disc"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("price_tax"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("disc_tax"),
    )


@query(
    "stats_rfm_segmentation",
    """
    WITH rfm AS (
      SELECT o_custkey,
             max(epoch_us(o_orderdate)) AS last_us,
             count(*) AS freq,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(ntile(4) OVER (ORDER BY last_us DESC, o_custkey) AS INTEGER)
             AS r_score,
           CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS INTEGER)
             AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER)
             AS m_score
    FROM rfm
    """,
)
def stats_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: one aggregate to customer grain, then
    three exact ntile(4) quartile scores (recency / frequency / monetary,
    total-ordered by the customer key for tie determinism). Monetary sums
    exact decimals so quartile boundaries cannot drift cross-engine.

    Registered plan is the scale-safe form: the customer-grain frame is
    persisted once, each score comes from ``windows.ntile_scalable`` (DESC
    expressed by negating into a temp key — bucket id stays monotone), and
    the three score frames join back on the unique customer key. No
    unpartitioned window touches the (fact-scale at 100×) customer frame;
    the single-reducer triple-ntile window form is the pytest verification
    twin (test_scale_safe_twins.py)."""
    from pyspark import StorageLevel

    o = load(spark, "orders", sf_dir)
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("last_us"),
            F.count("*").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def score(col: str, out: str) -> DataFrame:
        neg = rfm.withColumn("_neg", -F.col(col))
        return windows.ntile_scalable(
            neg, 4, ["_neg", "o_custkey"], out=out
        ).select("o_custkey", out)

    return (
        score("last_us", "r_score")
        .join(score("freq", "f_score"), "o_custkey")
        .join(score("monetary", "m_score"), "o_custkey")
    )


@query(
    "stats_abc_pareto_parts",
    """
    WITH rev AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
      FROM lineitem GROUP BY l_partkey
    ), c AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS cum,
             sum(revenue) OVER () AS total
      FROM rev
    )
    SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue,
           CASE WHEN cum <= total * 0.8 THEN 'A'
                WHEN cum <= total * 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def stats_abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue share: cumulative
    running share over the revenue-ranked parts (exact decimals so the
    80/95% boundaries are engine-independent). One aggregate + one global
    running window — at scale the same classes come from two
    approx-quantile boundaries over the aggregated (part-grain) table,
    which is already 4 orders smaller than the fact."""
    li = load(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = rev.select(
        "l_partkey",
        "revenue",
        F.sum("revenue").over(w).alias("cum"),
        F.sum("revenue").over(Window.partitionBy()).alias("total"),
    )
    cls = (
        F.when(F.col("cum") <= F.col("total") * 0.8, "A")
        .when(F.col("cum") <= F.col("total") * 0.95, "B")
        .otherwise("C")
    )
    return c.select(
        "l_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        cls.alias("abc_class"),
    )


@query(
    "stats_market_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
    ), supp AS (
      SELECT l_partkey, count(*) AS n FROM items GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, CAST(n_both AS BIGINT) AS n_both,
           round(n_both * 1.0 * n.n_orders / (sa.n * sb.n), 6) AS lift
    FROM pairs
    JOIN supp sa ON sa.l_partkey = part_a
    JOIN supp sb ON sb.l_partkey = part_b
    CROSS JOIN n
    WHERE n_both >= 3
    """,
)
def stats_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: within-order part pairs
    (the self-join is keyed on the order — Σ|basket|² work, baskets are
    ≤7 lines, so the pair space is linear in orders, never |parts|²),
    support from one aggregate, lift as column arithmetic after joining
    the part-keyed support sides on their keys (unhinted — AQE picks
    broadcast at small scale and the linear shuffle join at large scale;
    see the inline comment and SCALE.md's x128 measurement). The
    association-rule kernel; a min-support HAVING keeps the output to
    recurring pairs."""
    from pyspark import StorageLevel

    li = load(spark, "lineitem", sf_dir)
    # items feeds FOUR consumers (both self-join sides, support, n_orders);
    # Catalyst cannot CSE across exchanges, so without materialization the
    # fact is scanned once per consumer — persist the reduced distinct
    # (spills to disk at scale) and lineitem is read exactly once.
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # n_orders rides in the plan as a broadcast 1-row aggregate (one job,
    # no eager .count() that would re-run the distinct in a separate job).
    n_orders = items.agg(F.count_distinct("l_orderkey").alias("_n_orders"))
    supp = items.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    # No broadcast HINT on the support sides: they are part-KEYED, and the
    # part dimension grows with the corpus — a forced broadcast is a driver
    # collect that scales with N (measured: the x128 weak-scaling tier read
    # 5.48 per 4x step with the hint, 4.0-flat without it). AQE still
    # broadcasts them at small scale from runtime sizes; at large scale the
    # part-keyed shuffle join is linear. The 1-row n_orders stays hinted.
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both") * 1.0 * F.col("_n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "stats_ols_price_vs_qty",
    """
    WITH s AS (
      SELECT l_linestatus,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
             AS intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def stats_ols_price_vs_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (price ~ quantity) in closed form from the
    five sufficient moments — ONE map-side-combinable aggregate pass, no
    iteration, no driver math. Moments are exact decimal sums (engine- and
    partition-order-independent) cast to double only for the final
    slope/intercept/r2 arithmetic, whose expression tree is identical on
    both engines — that is what makes a 6-decimal round stable. At 100 TB
    this is THE scalable regression shape: sufficient statistics compose
    across partitions/increments exactly like the rollup operators."""
    li = load(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy, sxx, sxy, syy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy", "syy"))
    cov_n = n * sxy - sx * sy
    var_n = n * sxx - sx * sx
    slope = cov_n / var_n
    return s.select(
        "l_linestatus",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(F.pow(cov_n, 2) / (var_n * (n * syy - sy * sy)), 6).alias("r2"),
    )


@query(
    "stats_gini_customer_revenue",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS r
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT r, row_number() OVER (ORDER BY r, o_custkey) AS i FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(2.0 * sum(i * r) / (count(*) * sum(r))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    """,
)
def stats_gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of customer revenue — the standard
    inequality/concentration KPI (how top-heavy is the customer base) via
    the sorted-rank identity G = 2*Sum(i*x_i)/(n*Sum(x)) - (n+1)/n. One
    aggregate for per-customer revenue, one rank window, one final
    aggregate. Ties in revenue are rank-order-invariant (equal x makes
    Sum(i*x) independent of permutation within the tie), and the rank
    window's single-partition sort is over CUSTOMER-sized data — already
    reduced from the fact — which is the legitimate place for a global
    window at scale."""
    o = load(spark, "orders", sf_dir)
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("r")
    )
    ranked = rev.select(
        "r", F.row_number().over(Window.orderBy("r", "o_custkey")).alias("i")
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("r")) / (F.count("*") * F.sum("r"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


@query(
    "stats_mutual_info_type_hour",
    """
    WITH cells AS (
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS h, count(*) AS c
      FROM events GROUP BY event_type, hour(ts)
    ), m AS (
      SELECT event_type, h, c,
             sum(c) OVER (PARTITION BY event_type) AS ct,
             sum(c) OVER (PARTITION BY h) AS ch,
             sum(c) OVER () AS n
      FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((c * 1.0 / n) * ln(c * 1.0 * n / (ct * ch))), 6)
             AS mi_nats
    FROM m
    """,
)
def stats_mutual_info_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; hour-of-day) — the dependence
    screen for feature selection / drift detection. Joint distribution is
    one groupBy over the fact; marginals are window sums OVER THE CELL
    TABLE (|types|x24 rows — never a second fact scan); the MI sum is a
    final aggregate over those cells. All counts are exact; only the last
    ~120-term double sum is float, so a 6-decimal round is stable."""
    e = load(spark, "events", sf_dir)
    cells = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("h")
    ).agg(F.count("*").alias("c"))
    m = cells.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(Window.partitionBy("event_type")).alias("ct"),
        F.sum("c").over(Window.partitionBy("h")).alias("ch"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    term = (F.col("c") * 1.0 / F.col("n")) * F.log(
        F.col("c") * 1.0 * F.col("n") / (F.col("ct") * F.col("ch"))
    )
    return m.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum(term), 6).alias("mi_nats"),
    )


@query(
    "stats_cramers_v",
    """
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS o
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT pri, st, o,
             sum(o) OVER (PARTITION BY pri) AS rt,
             sum(o) OVER (PARTITION BY st) AS ct,
             sum(o) OVER () AS n
      FROM obs
    )
    SELECT round(sum(
             (o - rt * ct * 1.0 / n) * (o - rt * ct * 1.0 / n)
             / (rt * ct * 1.0 / n)
           ), 6) AS chi2,
           round(sqrt(
             sum((o - rt * ct * 1.0 / n) * (o - rt * ct * 1.0 / n)
                 / (rt * ct * 1.0 / n))
             / (max(n) * least(count(DISTINCT pri) - 1,
                               count(DISTINCT st) - 1))
           ), 6) AS cramers_v,
           CAST(max(n) AS BIGINT) AS n
    FROM m
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size on top of the chi-square
    statistic (`stats_chi2_priority_status` reports raw chi2, which grows
    with N; V is what a drift monitor thresholds on). Same single-scan
    window-over-cells shape: observed cells from one aggregate, marginals as
    windows over the cell table, V from one final 1-row aggregate."""
    o = load(spark, "orders", sf_dir)
    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"), F.col("o_orderstatus").alias("st")
    ).agg(F.count("*").alias("o"))
    m = obs.select(
        "pri",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("pri")).alias("rt"),
        F.sum("o").over(Window.partitionBy("st")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("rt") * F.col("ct") * 1.0 / F.col("n")
    chi2 = F.sum((F.col("o") - exp) * (F.col("o") - exp) / exp)
    dof = F.least(F.count_distinct("pri") - 1, F.count_distinct("st") - 1)
    return m.agg(
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.max("n") * dof)), 6).alias("cramers_v"),
        F.max("n").cast("bigint").alias("n"),
    )


@query(
    "stats_ks_two_sample",
    """
    WITH j AS (
      SELECT o_totalprice AS val, c_mktsegment AS seg
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    ), c AS (
      SELECT val,
             sum(CASE WHEN seg = 'BUILDING'  THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS n2
      FROM j GROUP BY val
    ), cc AS (
      SELECT val,
             sum(n1) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS c1,
             sum(n2) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS c2
      FROM c
    ), t AS (
      SELECT sum(n1) AS n1t, sum(n2) AS n2t FROM c
    )
    SELECT round(max(abs(c1 * 1.0 / n1t - c2 * 1.0 / n2t)), 6) AS ks_d,
           CAST(max(n1t) AS BIGINT) AS n1,
           CAST(max(n2t) AS BIGINT) AS n2
    FROM cc CROSS JOIN t
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the order-value distributions
    of two customer segments — the standard 'did the distribution shift'
    test behind data-drift gates.

    100 TB shape: the naive ECDF is a no-partition ordered window (single
    reducer over every distinct value). Here the fact reduces to per-value
    counts in its one scan (persisted), and the cumulative counts come from
    ``bucketed_cumsum`` — range-bucket partials + broadcast offsets — so
    the only unpartitioned window is over the 1 024-row bucket table. The
    oracle uses the plain window (DuckDB is single-node); values identical.
    """
    from pyspark import StorageLevel

    from .operators.windows import bucketed_cumsum

    o = load(spark, "orders", sf_dir)
    c = load(spark, "customer", sf_dir)
    segs = c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(F.broadcast(segs), o.o_custkey == segs.c_custkey).select(
        F.col("o_totalprice").alias("val"), F.col("c_mktsegment").alias("seg")
    )
    counts = (
        j.groupBy("val")
        .agg(
            F.sum((F.col("seg") == "BUILDING").cast("long")).alias("n1"),
            F.sum((F.col("seg") == "MACHINERY").cast("long")).alias("n2"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # value-cardinality reduction: min/max probe, totals, and the
    #    cumsum all read this — the fact is scanned once
    cum = bucketed_cumsum(counts, "val", ["n1", "n2"])
    totals = counts.agg(
        F.sum("n1").alias("n1t"), F.sum("n2").alias("n2t")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_n1") * 1.0 / F.col("n1t")
                        - F.col("cum_n2") * 1.0 / F.col("n2t")
                    )
                ),
                6,
            ).alias("ks_d"),
            F.max("n1t").cast("bigint").alias("n1"),
            F.max("n2t").cast("bigint").alias("n2"),
        )
    )


@query(
    "stats_auc_roc",
    """
    WITH c AS (
      SELECT n_chars AS val,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
      FROM documents GROUP BY n_chars
    ), cc AS (
      SELECT val, pos, neg,
             sum(neg) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS cum_neg
      FROM c
    ), t AS (
      SELECT sum(pos) AS n_pos, sum(neg) AS n_neg FROM c
    )
    SELECT round(sum(pos * ((cum_neg - neg) + 0.5 * neg))
                 / (max(n_pos) * max(n_neg)), 6) AS auc,
           CAST(max(n_pos) AS BIGINT) AS n_pos,
           CAST(max(n_neg) AS BIGINT) AS n_neg
    FROM cc CROSS JOIN t
    """,
)
def stats_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a score column against a binary label via the
    rank-sum (Mann–Whitney U) identity, with the standard 0.5 credit for
    score ties: AUC = Σ_v pos(v)·(neg_below(v) + ½·neg_at(v)) / (P·N).
    Here: does document length separate English from non-English docs —
    the shape every quality-classifier evaluation runs over a labeled
    corpus slice.

    Same scalable-ECDF construction as `stats_ks_two_sample`: per-score
    counts in the fact's single scan (persisted), cumulative negatives via
    ``bucketed_cumsum`` (no unpartitioned window over score cardinality),
    totals broadcast as a 1-row cross join."""
    from pyspark import StorageLevel

    from .operators.windows import bucketed_cumsum

    d = load(spark, "documents", sf_dir)
    counts = (
        d.groupBy(F.col("n_chars").alias("val"))
        .agg(
            F.sum((F.col("lang") == "en").cast("long")).alias("pos"),
            F.sum((F.col("lang") != "en").cast("long")).alias("neg"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cum = bucketed_cumsum(counts, "val", ["neg"])
    totals = counts.agg(F.sum("pos").alias("n_pos"), F.sum("neg").alias("n_neg"))
    u = F.sum(
        F.col("pos")
        * ((F.col("cum_neg") - F.col("neg")) + 0.5 * F.col("neg"))
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.round(u / (F.max("n_pos") * F.max("n_neg")), 6).alias("auc"),
            F.max("n_pos").cast("bigint").alias("n_pos"),
            F.max("n_neg").cast("bigint").alias("n_neg"),
        )
    )


@query(
    "stats_bootstrap_ci_mean",
    """
    WITH reps AS (
      SELECT c_acctbal, b.b AS b,
             ('0x' || substr(md5(b.b || ':' || CAST(c_custkey AS VARCHAR)), 1, 8))
               ::BIGINT * 1.0 / 4294967296.0 AS u
      FROM customer
      CROSS JOIN (SELECT unnest(generate_series(0, 100)) AS b) b
    ), w AS (
      SELECT b, c_acctbal,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847  THEN 1
                  WHEN u < 0.9196986029286058  THEN 2
                  WHEN u < 0.9810118431238462  THEN 3
                  WHEN u < 0.9963401531726563  THEN 4
                  WHEN u < 0.9994058151824183  THEN 5
                  ELSE 6 END AS wt
      FROM reps
    ), means AS (
      SELECT b, sum(wt * c_acctbal) / sum(wt) AS m
      FROM w GROUP BY b HAVING sum(wt) > 0
    ), ranked AS (
      SELECT m, row_number() OVER (ORDER BY m) AS rk,
             count(*) OVER () AS n_reps
      FROM means
    )
    SELECT CAST((SELECT count(*) FROM customer) AS BIGINT) AS n,
           round((SELECT avg(c_acctbal) FROM customer), 4) AS mean,
           round(max(CASE WHEN rk = 6 THEN m END), 4) AS ci_lo,
           round(max(CASE WHEN rk = 96 THEN m END), 4) AS ci_hi
    FROM ranked
    """,
)
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 90% confidence interval for the mean account balance via
    the POISSON bootstrap (Chamandy et al., Google 2012) — the resampling
    scheme that works distributed: replicate b includes each row
    Poisson(1)-many times, with the Poisson draw inverted from a portable
    md5 uniform (deterministic across engines, partitionings, reruns).
    101 replicates make the 5th/95th percentile ranks exact (rank 6 / 96 of
    the sorted replicate means) — no interpolation convention to disagree
    on.

    Scale shape: the replicate cross join multiplies the scan ×101 but
    reduces IMMEDIATELY to per-replicate sums (map-side combine, 101
    output rows), so the shuffle is constant-size; the rank window runs
    over 101 rows. For a fact-sized table the same query runs on the
    bag-of-little-bootstraps partitioning instead — documented here as the
    100 TB variant. Customer is dim-sized; budget 2 scans (replicates +
    point estimate)."""
    c = load(spark, "customer", sf_dir)
    reps = c.select(
        "c_custkey", "c_acctbal", F.explode(F.sequence(F.lit(0), F.lit(100))).alias("b")
    ).withColumn(
        "u",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("b"), F.lit(":"), F.col("c_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        * 1.0
        / 4294967296.0,
    )
    wt = (
        F.when(F.col("u") < 0.36787944117144233, 0)
        .when(F.col("u") < 0.7357588823428847, 1)
        .when(F.col("u") < 0.9196986029286058, 2)
        .when(F.col("u") < 0.9810118431238462, 3)
        .when(F.col("u") < 0.9963401531726563, 4)
        .when(F.col("u") < 0.9994058151824183, 5)
        .otherwise(6)
    )
    means = (
        reps.withColumn("wt", wt)
        .groupBy("b")
        .agg((F.sum(F.col("wt") * F.col("c_acctbal")) / F.sum("wt")).alias("m"))
        .filter(F.col("m").isNotNull())
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m")).alias("rk")
    )
    point = c.agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("mean"),
    )
    ci = ranked.agg(
        F.round(F.max(F.when(F.col("rk") == 6, F.col("m"))), 4).alias("ci_lo"),
        F.round(F.max(F.when(F.col("rk") == 96, F.col("m"))), 4).alias("ci_hi"),
    )
    return point.crossJoin(F.broadcast(ci))


@query(
    "stats_anova_oneway",
    """
    WITH cells AS (
      SELECT l_returnflag AS g,
             CAST(count(*) AS BIGINT)                          AS n,
             CAST(sum(l_quantity) AS BIGINT)                   AS s1,
             CAST(sum(l_quantity * l_quantity) AS BIGINT)      AS s2
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s1) AS BIGINT) AS t1,
             CAST(sum(s2) AS BIGINT) AS t2,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(s1 AS DOUBLE) * s1 / n) AS gsum
      FROM cells
    )
    SELECT k, nn AS n_total,
           round((gsum - CAST(t1 AS DOUBLE) * t1 / nn) / (k - 1), 6)
             AS ms_between,
           round((t2 - gsum) / (nn - k), 6) AS ms_within,
           round(((gsum - CAST(t1 AS DOUBLE) * t1 / nn) / (k - 1))
                 / ((t2 - gsum) / (nn - k)), 6) AS f_stat
    FROM tot
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic (quantity across return flags) — the
    classical k-group mean-difference test completing the inference shelf
    beside the two-sample z/U/KS tests.

    Sufficient statistics only: per-group (n, Σx, Σx²) from ONE hash
    aggregate over the fact (exact BIGINT — quantities are integers),
    then SSB/SSW assemble group-side. The only floats are the final
    divisions, identical on both engines. The F here is huge ↔ flags
    differ, ≈1 ↔ same distribution; the fixture's uniform flags land
    near 1 and round(6) pins it."""
    li = load(spark, "lineitem", sf_dir)
    cells = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("l_quantity").cast("bigint").alias("s1"),
        F.sum(F.col("l_quantity") * F.col("l_quantity"))
        .cast("bigint")
        .alias("s2"),
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s1").cast("bigint").alias("t1"),
        F.sum("s2").cast("bigint").alias("t2"),
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("s1").cast("double") * F.col("s1") / F.col("n")).alias(
            "gsum"
        ),
    )
    ssb = F.col("gsum") - F.col("t1").cast("double") * F.col("t1") / F.col("nn")
    ssw = F.col("t2") - F.col("gsum")
    return tot.select(
        "k",
        F.col("nn").alias("n_total"),
        F.round(ssb / (F.col("k") - 1), 6).alias("ms_between"),
        F.round(ssw / (F.col("nn") - F.col("k")), 6).alias("ms_within"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 6
        ).alias("f_stat"),
    )

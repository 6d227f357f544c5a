"""Recommendation & retrieval queries — item-item collaborative filtering
and inverted-index phrase search.

These complete the relevance family beside BM25 ranking (q_text), TF-IDF,
co-occurrence PMI, and the ANN operators: the co-occurrence cosine is the
classic "customers who bought X also bought Y" statistic, and the phrase
query is the positional-posting-list join every search engine runs.

Oracle conventions as in queries.py (identical aliases, round(6) on doubles
derived from exact integer counts, BIGINT casts for DuckDB integer sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query
from .sources.tables import load


@query(
    "recsys_item_item_cosine",
    """
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), ci AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1
    ), p AS (
      SELECT a.l_partkey AS i, b2.l_partkey AS j, CAST(count(*) AS BIGINT) AS co
      FROM b a JOIN b b2
        ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), sym AS (
      SELECT i AS item, j AS neighbor, co FROM p
      UNION ALL
      SELECT j AS item, i AS neighbor, co FROM p
    ), sc AS (
      SELECT s.item, s.neighbor, s.co,
             round(s.co / sqrt(ca.cnt * cb.cnt), 6) AS cosine
      FROM sym s
      JOIN ci ca ON ca.l_partkey = s.item
      JOIN ci cb ON cb.l_partkey = s.neighbor
    )
    SELECT item, neighbor, co, cosine, rnk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY item
               ORDER BY cosine DESC, co DESC, neighbor ASC) AS INTEGER) AS rnk
      FROM sc
    ) WHERE rnk <= 3
    """,
)
def recsys_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity over order
    co-occurrence ("bought together"), top-3 neighbors per item.

    Scale shape: baskets are the distinct (order, part) projection — one
    shuffle; pair generation is a self-join KEYED ON THE ORDER, so the work
    is Σ|basket|² (linear in orders, bounded by basket size), never
    |items|². The item-frequency table is part-keyed (NOT broadcast — at
    100 TB the part dimension outgrows the broadcast threshold; the join
    keys are already the shuffle keys). A support floor (co ≥ 2) kills the
    singleton-pair tail before the similarity join, and ranking happens on
    round(cosine, 6) with exact-integer tiebreaks (co DESC, neighbor ASC)
    so the top-3 cut is deterministic on both engines.
    """
    b = (
        load(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    ci = b.groupBy("l_partkey").agg(F.count("*").cast("bigint").alias("cnt"))
    a = b.alias("a")
    b2 = b.alias("b2")
    p = (
        a.join(b2, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b2.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("i"), F.col("b2.l_partkey").alias("j")
        )
        .agg(F.count("*").cast("bigint").alias("co"))
        .filter(F.col("co") >= 2)
    )
    sym = p.select(
        F.col("i").alias("item"), F.col("j").alias("neighbor"), "co"
    ).unionByName(
        p.select(F.col("j").alias("item"), F.col("i").alias("neighbor"), "co")
    )
    ca = ci.select(F.col("l_partkey").alias("item"), F.col("cnt").alias("cnt_a"))
    cb = ci.select(
        F.col("l_partkey").alias("neighbor"), F.col("cnt").alias("cnt_b")
    )
    sc = (
        sym.join(ca, "item")
        .join(cb, "neighbor")
        .select(
            "item",
            "neighbor",
            "co",
            F.round(
                F.col("co") / F.sqrt(F.col("cnt_a") * F.col("cnt_b")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("co").desc(), F.col("neighbor").asc()
    )
    return (
        sc.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("item", "neighbor", "co", "cosine", "rnk")
    )


@query(
    "search_phrase_match",
    """
    WITH toks0 AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
               AS ws
      FROM documents
    ), toks AS (
      SELECT doc_id, unnest(ws) AS w,
             unnest(generate_series(1, len(ws))) AS pos
      FROM toks0
    )
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.w = 'big' AND b.w = 'data'
    GROUP BY a.doc_id
    """,
)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-posting-list phrase query: documents containing the exact
    phrase "big data", with occurrence counts.

    The inverted-index shape: tokenize with positions (posexplode — the
    posting list), FILTER each side to its phrase term BEFORE the join
    (point lookups into the index, so the join input is only the two
    terms' postings, not the corpus), then a (doc, pos+1) adjacency
    equi-join proves the terms occur consecutively. Generalizes to k-term
    phrases as k−1 chained adjacency joins, each on an already-filtered
    posting list. Same linear-pair-stream trick as `text_cooccurrence_pmi`
    — never a Σ|doc|² windowed self-join.
    """
    toks = load(spark, "documents", sf_dir).select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    a = toks.filter(F.col("w") == "big").select(
        "doc_id", (F.col("pos") + 1).alias("pos_b")
    )
    b = toks.filter(F.col("w") == "data").select(
        "doc_id", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, ["doc_id", "pos_b"])
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_matches"))
    )

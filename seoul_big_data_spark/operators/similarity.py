"""Similarity search over embedding columns (north-star N3, SURVEY.md §2.10).

Two tiers:
- brute-force top-k: query-set × corpus join with native dot-product
  expressions + a row_number window — exact, O(|Q|·N); the right baseline and
  fine whenever |Q| is small (broadcast the queries, never the corpus).
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus; queries
  probe only their own bucket (plus optional neighbor probes), turning the
  scan into a hash-partitioned lookup — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, random_hyperplane_signs


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    ``queries`` is broadcast (small side); the corpus streams through the
    join — one pass over the data, no corpus shuffle. Result columns:
    query_id, neighbor_id, score, rk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine("q_vec", "c_vec").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: both sides signed against the same fixed random
    hyperplanes; candidates are corpus rows sharing the query's bucket.

    At scale the corpus is written bucketed/partitioned by ``bucket`` so a
    probe touches one partition — the IVF-style inverted-file layout
    expressed with plain hash partitioning.
    """
    sig = lambda df, idn, vecn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vecn),
        random_hyperplane_signs(vec_col, planes).alias("bucket"),
    )
    c = sig(corpus, "neighbor_id", "c_vec")
    q = sig(queries, "query_id", "q_vec")
    scored = c.join(
        F.broadcast(q), (c.bucket == q.bucket) & (F.col("query_id") != F.col("neighbor_id"))
    ).select("query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)

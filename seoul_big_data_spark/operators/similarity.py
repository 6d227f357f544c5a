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
    multi_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: both sides signed against the same fixed random
    hyperplanes; candidates are corpus rows sharing one of the query's probe
    buckets.

    ``multi_probe``: 1 probes only the query's own bucket; 2 also probes
    every bucket at Hamming distance 1 (flip each sign bit) — the standard
    multi-probe LSH recall/cost dial (n_planes+1 probes per query). Probes
    are exploded on the (small, broadcast) query side only; the corpus is
    signed once.

    At scale the corpus is written bucketed/partitioned by ``bucket`` so a
    probe touches one partition — the IVF-style inverted-file layout
    expressed with plain hash partitioning.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        random_hyperplane_signs(vec_col, planes).alias("bucket"),
    )
    q_sig = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        random_hyperplane_signs(vec_col, planes).alias("_sig"),
    )
    if multi_probe <= 1:
        q = q_sig.withColumn("bucket", F.col("_sig")).drop("_sig")
    else:
        nb = len(planes)
        flips = [F.col("_sig")] + [
            F.concat(
                F.substring("_sig", 1, i),
                F.when(F.substring("_sig", i + 1, 1) == "1", "0").otherwise("1"),
                F.substring("_sig", i + 2, nb - i - 1),
            )
            for i in range(nb)
        ]
        q = (
            q_sig.withColumn("bucket", F.explode(F.array(*flips)))
            .drop("_sig")
            .distinct()
        )
    scored = c.join(
        F.broadcast(q),
        (c.bucket == q.bucket) & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id", "neighbor_id", cosine("q_vec", "c_vec").alias("score")
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)

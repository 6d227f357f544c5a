"""Iterative graph algorithms as DataFrame loops (engine breadth beyond
connected components — operators/dedup.py::connected_components).

PageRank here is the simple power-iteration form: a fixed number of
iterations, damping d, dangling mass dropped (isolated vertices converge to
(1-d)/N). Each iteration is one join + one aggregate — the driver only
builds the loop; all data movement is distributed. At 100 TB the edge list
is the fact table: it shuffles once per iteration on the source key, and the
rank state is vertex-sized. Iterations are bounded and each intermediate is
cached so lineage stays flat (the same discipline connected_components
uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank; returns (id, rank).

    ``edges`` is directed; pass both directions for an undirected graph.
    rank_{t+1}(v) = (1-d)/N + d * sum over in-neighbors u of rank_t(u)/deg(u).
    """
    n = vertices.count()  # scalar, catalog-sized
    base = (1.0 - damping) / n
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).cache()
    ranks = vertices.select(
        F.col(id_col).alias("id"), F.lit(1.0 / n).alias("rank")
    ).cache()
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .join(outdeg, "src")
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            vertices.select(F.col(id_col).alias("id"))
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .cache()
        )
        new_ranks.count()  # materialize before dropping the parent cache:
        # keeps lineage one level deep instead of 2-joins-per-iteration deep
        ranks.unpersist()
        ranks = new_ranks
    return ranks

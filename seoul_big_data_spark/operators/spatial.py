"""Spatial-lite: radius neighbor search via grid-cell bucketing.

The all-pairs "points within distance r" query is quadratic as written.
The standard scalable shape (the same bucketing family as
``banded_range_join`` / ``interval_overlap_join``, in 2-D) snaps every
point to a square cell of side r; any pair within r lives in the same or
an adjacent cell, so replicating ONE side to its 3×3 cell neighborhood
turns the distance join into a hash equi-join on the cell id with a
residual exact-distance filter. Candidate fan-out is bounded by local
density (points per 9 cells), never N²; skewed hot cells split through AQE
like any other equi-join key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x: Column,
    y: Column,
    radius: float,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) within Euclidean ``radius``.

    The left side replicates to its 9-cell neighborhood (explode of a
    constant 3×3 offset array — fan-out 9, map-side); the right side keys
    by its own cell; pairs meet exactly once because the right point's
    single cell appears at most once in the left point's neighborhood.
    One shuffle per side on the cell key. Returns
    (id_a, id_b, dist) with the exact distance filter applied.
    """
    r = float(radius)
    cx = F.floor(x / r).cast("long")
    cy = F.floor(y / r).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    lt = (
        points.select(
            F.col(id_col).alias("id_a"), x.alias("xa"), y.alias("ya")
        )
        .withColumn("_o", F.explode(offsets))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.floor(F.col("xa") / r).cast("long") + F.col("_o.dx")).alias("_cx"),
            (F.floor(F.col("ya") / r).cast("long") + F.col("_o.dy")).alias("_cy"),
        )
    )
    rt = points.select(
        F.col(id_col).alias("id_b"),
        x.alias("xb"),
        y.alias("yb"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    dist2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    return (
        lt.join(rt, ["_cx", "_cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= F.lit(r * r)))
        .select("id_a", "id_b", F.sqrt(dist2).alias("dist"))
    )

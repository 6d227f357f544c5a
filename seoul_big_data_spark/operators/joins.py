"""Join operators (SURVEY.md §2.3): the reference's correlated per-row
lookups (J1/J2, data_seoul_2_csv_noopenapi.py:74-96) become broadcast
equi-joins; plus the engine-scope range and as-of joins for events-style
enrichment.

Scale notes: catalog/dim sides are broadcast explicitly (no shuffle of the
fact side); the as-of join uses the union-and-window technique — one shuffle
on the join key, no cross product — which is the standard scalable as-of
shape (vs. a non-equi join that would force a broadcast nested-loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame, dim: DataFrame, on: Column, how: str = "inner"
) -> DataFrame:
    """J1/J2 — dimension lookup as a broadcast hash join (no shuffle of fact)."""
    return fact.join(F.broadcast(dim), on, how)


def pending_work(catalog: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """J4 — rows not yet processed (the CATEGORY_BIG IS NULL pattern,
    data_seoul_1_category.py:44) as a left anti-join."""
    return catalog.join(done, key, "left_anti")


def range_join(
    fact: DataFrame, dim: DataFrame, value: Column, lo: Column, hi: Column
) -> DataFrame:
    """Range (band) join on half-open intervals [lo, hi): fact rows matched
    to the dim interval containing ``value``. With a small dim this is a
    broadcast nested-loop — fine; with a large dim use ``banded_range_join``
    (bucket equi-join, no nested loop)."""
    return fact.join(F.broadcast(dim), (value >= lo) & (value < hi), "inner")


def banded_range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
    band_width: float,
    vmin: float,
    vmax: float,
) -> DataFrame:
    """Scalable range join: bin the point side by ``floor(value/band_width)``
    and replicate each [lo, hi) interval across the bins it overlaps, turning
    the non-equi join into a hash equi-join on the bin plus a residual
    predicate — the standard binned-range-join technique; no broadcast, no
    nested loop, so BOTH sides may be fact-sized.

    Each fact value lands in exactly one bin and an interval is replicated to
    that bin at most once, so matching pairs appear exactly once (no dedup
    pass). ``vmin``/``vmax`` clamp interval replication to the observed value
    domain so open-ended intervals (hi = +inf sentinels) replicate to a
    bounded bin range rather than exploding; values outside the clamp cannot
    exist, so clamping never drops a match. Replication factor per interval
    is O(interval_width / band_width) — pick band_width near the typical
    interval width. One shuffle per side on the bin key; skewed bins go
    through AQE skew-join like any other equi-join.
    """
    w = float(band_width)
    b_fact = fact.withColumn("_band", F.floor(value / w).cast("long"))
    first = F.floor(F.greatest(lo, F.lit(vmin)) / w).cast("long")
    # last bin containing values < hi: ceil(hi/w) - 1 (exact on boundaries —
    # [400,500) with w=100 ends at bin 4, [400,550) at bin 5)
    last = (F.ceil(F.least(hi, F.lit(vmax + w)) / w) - 1).cast("long")
    b_iv = intervals.filter(last >= first).withColumn(
        "_band", F.explode(F.sequence(first, last))
    )
    joined = b_fact.join(b_iv, "_band").filter((value >= lo) & (value < hi))
    return joined.drop("_band")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: Column,
    l_end: Column,
    r_start: Column,
    r_end: Column,
    band_width: float,
) -> DataFrame:
    """Interval × interval overlap join (closed intervals: match iff
    ``max(starts) <= min(ends)``) for TWO fact-sized interval tables.

    Same binned-equi-join technique as ``banded_range_join``, applied on
    both sides: each interval replicates across the ``band_width`` bins it
    touches, candidate pairs meet only inside a shared bin (hash equi-join,
    no nested loop, no broadcast), and the residual overlap predicate plus
    the exactly-once guard — keep a pair only in the bin containing
    ``max(starts)``, the first bin both intervals occupy — make every
    overlapping pair appear exactly once without a dedup pass. Replication
    factor per interval is O(width / band_width); pick band_width near the
    typical interval width. One shuffle per side on the bin key.
    """
    w = float(band_width)
    lbin = F.explode(
        F.sequence(
            F.floor(l_start / w).cast("long"), F.floor(l_end / w).cast("long")
        )
    )
    rbin = F.explode(
        F.sequence(
            F.floor(r_start / w).cast("long"), F.floor(r_end / w).cast("long")
        )
    )
    lt = left.withColumn("_band", lbin)
    rt = right.withColumn("_band", rbin)
    overlap = (F.greatest(l_start, r_start) <= F.least(l_end, r_end))
    once = F.col("_band") == F.floor(F.greatest(l_start, r_start) / w).cast("long")
    return lt.join(rt, "_band").filter(overlap & once).drop("_band")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key.

    Union-and-window implementation: tag both sides, union by name (left rows
    carry their full payload; right rows carry nulls for it), sort within key
    by (ts, side) and carry the last right values forward with
    ``last(..., ignorenulls=True)``. One shuffle on ``key``; linear, no
    cross product — survives 100x scale-up where a non-equi join would not.
    No row-id self-join: all left columns travel through the union, so there
    is no nondeterministic ``monotonically_increasing_id`` to re-evaluate in
    two plan branches.

    Ties: with several right rows at the SAME (key, ts), the winner is the
    one with the largest payload struct (field-by-field comparison — for an
    id payload, the largest id). The payload rides as ONE struct in the sort
    key, so (a) the choice is deterministic under any partition order, and
    (b) all filled columns come from the same right row even when payload
    columns are independently null. Oracles mirror the convention by adding
    the payload columns to the window ORDER BY.
    """
    payload = F.struct(*[F.col(f"_r_{c}").alias(c) for c in right_cols])
    lt = (
        left.withColumn("_ts", F.col(left_ts).cast("timestamp"))
        .withColumn("_side", F.lit(1))
        .withColumn("_k", F.col(key))
    )
    rsel = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # Right rows sort before coincident left rows (side 0 < 1) so an
    # exactly-equal timestamp matches; _p breaks right-side ts ties.
    unioned = rsel.unionByName(lt, allowMissingColumns=True).withColumn(
        "_p", F.when(F.col("_side") == 0, payload)
    )
    w = Window.partitionBy("_k").orderBy("_ts", "_side", "_p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = unioned.select(
        "*", F.last("_p", ignorenulls=True).over(w).alias("_sel")
    ).filter(F.col("_side") == 1)
    return filled.select(
        *left.columns,
        *[F.col(f"_sel.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_left: Column,
    block_right: Column,
    verify: Column,
) -> DataFrame:
    """Approximate-string (record-linkage) join: equi-join on a cheap
    blocking key, then the expensive verifier (edit distance, similarity)
    runs only inside each block — never as a cross product.

    This is the canonical entity-resolution shape: the blocking key turns
    the quadratic fuzzy join into a hash equi-join whose cost is
    Σ|block|² bounded by the largest block, and AQE's skew-join splitting
    handles a hot block the same way it handles any skewed key. Pick the
    key so true matches agree on it (phonetic code, sorted token prefix,
    length band); recall is bounded by that agreement, which is the
    documented trade of every blocking scheme.
    """
    lt = left.withColumn("_blk", block_left)
    rt = right.withColumn("_blk", block_right)
    return lt.join(rt, "_blk").filter(verify).drop("_blk")


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join with direction and tolerance (the full asof surface:
    backward = latest right at-or-before, forward = earliest right
    at-or-after, nearest = whichever is closer, ties backward; a tolerance
    nulls out matches farther than the bound).

    Same union-and-window shape as ``asof_join`` — one shuffle on ``key``,
    linear scan per key, no cross product — so every direction survives a
    100x scale-up identically. The right payload travels as ONE struct so
    the filled columns always come from the same right row (per-column
    fills could mix rows if payload columns were independently null). The
    matched timestamp rides in the struct, which is what makes tolerance
    and nearest-selection pure column arithmetic after the window pass.

    Ties: several right rows at the same (key, ts) resolve to the LARGEST
    payload struct in every direction (the struct is the final window sort
    key — deterministic under any partition order; for an id payload this
    means the largest id). Oracles mirror by adding payload columns to the
    window ORDER BY.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"bad direction: {direction}")
    payload = F.struct(
        F.col("_r_ts").alias("_ts"),
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )
    lt = (
        left.withColumn("_ts", F.col(left_ts).cast("timestamp"))
        .withColumn("_side", F.lit(1))
        .withColumn("_k", F.col(key))
    )
    rsel = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = rsel.unionByName(lt, allowMissingColumns=True).withColumn(
        "_p", F.when(F.col("_side") == 0, payload)
    )
    w_back = Window.partitionBy("_k").orderBy("_ts", "_side", "_p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").desc(), F.col("_p").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    cols = []
    if direction in ("backward", "nearest"):
        cols.append(F.last("_p", ignorenulls=True).over(w_back).alias("_pb"))
    if direction in ("forward", "nearest"):
        cols.append(F.first("_p", ignorenulls=True).over(w_fwd).alias("_pf"))
    filled = unioned.select("*", *cols).filter(F.col("_side") == 1)
    if direction == "backward":
        chosen = F.col("_pb")
    elif direction == "forward":
        chosen = F.col("_pf")
    else:
        back_d = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_pb._ts"))
        fwd_d = F.unix_micros(F.col("_pf._ts")) - F.unix_micros(F.col("_ts"))
        chosen = (
            F.when(F.col("_pb").isNull(), F.col("_pf"))
            .when(F.col("_pf").isNull(), F.col("_pb"))
            .when(back_d <= fwd_d, F.col("_pb"))
            .otherwise(F.col("_pf"))
        )
    out = filled.withColumn("_sel", chosen)
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        within = (
            F.abs(
                F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_sel._ts"))
            )
            <= F.lit(tol_us)
        )
        out = out.withColumn("_sel", F.when(within, F.col("_sel")))
    return out.select(
        *left.columns,
        F.col("_sel._ts").alias("asof_ts"),
        *[F.col(f"_sel.{c}").alias(f"asof_{c}") for c in right_cols],
    )

"""Incremental rollup maintenance: mergeable partial aggregates.

The materialized-view pattern every hypertable/continuous-aggregate system
uses: keep the rollup table in PARTIAL form (count, sum, min, max per
bucket), fold late-arriving batches in with a merge that is algebraically
closed — merge(partial(A), partial(B)) == partial(A ∪ B) — so maintenance
cost is O(|delta| + touched buckets), never a recompute over the full fact
history.

Scale notes: the merge shuffles only rollup-bucket-sized data (buckets ×
group keys, not raw rows); sums run on exact decimals so the merged result
is bit-identical to a from-scratch recompute regardless of how many
increments it took (float sums would drift with association order, making
"incremental == full" unverifiable). avg is derived (sum/count) at read
time — storing it would break mergeability.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (partial column, merge function) for each mergeable aggregate
_MERGE = {"n": F.sum, "sum_value": F.sum, "min_value": F.min, "max_value": F.max}


def partial_rollup(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """One fact batch → partial-agg form: count / exact-decimal sum / min /
    max per key group. Map-side combine does most of the work; the shuffle
    carries one row per (partition, group)."""
    v = F.col(value_col).cast("decimal(28,6)")
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(v).alias("sum_value"),
        F.min(F.col(value_col)).alias("min_value"),
        F.max(F.col(value_col)).alias("max_value"),
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Fold any number of partial rollups into one: union + re-aggregate
    with each column's merge function. Closed under repetition — nightly
    increments compose associatively, so backfills and retries land on the
    same bytes as a full recompute."""
    keys = [c for c in rollups[0].columns if c not in _MERGE]
    unioned = reduce(lambda a, b: a.unionByName(b), rollups)
    return unioned.groupBy(*keys).agg(
        *[fn(c).alias(c) for c, fn in _MERGE.items()]
    )


def answer_from_rollup(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Materialized-view ANSWERING: re-aggregate a stored partial rollup
    to any SUBSET of its group keys — count/sum/min/max are algebraically
    closed under key coarsening, so a (flag, status) rollup answers
    "by flag", "by status", and the grand total without touching the
    fact. This is the query-rewrite half of the continuous-aggregate
    pattern (`partial_rollup`/`merge_rollups` are the maintenance half):
    at 100 TB the rollup is bucket-cardinality-sized, so an answered
    query costs O(buckets) instead of a fact scan. avg derives at read
    time (sum/count — storing it would break both mergeability and
    coarsening)."""
    return rollup.groupBy(*keys).agg(
        *[fn(c).alias(c) for c, fn in _MERGE.items()]
    )


def incremental_join_delta(
    old_a: DataFrame,
    delta_a: DataFrame,
    old_b: DataFrame,
    delta_b: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Incremental view maintenance for an inner join: the DELTA of A ⋈ B
    when A grows by ΔA and B grows by ΔB is

        Δ(A ⋈ B) = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB

    (insert-only IVM; the two terms are disjoint because every pair in
    the first has its A-row in ΔA and every pair in the second has its
    A-row in A_old). Appending this delta to the materialized A_old ⋈
    B_old reproduces the full join of the new states without re-joining
    the old sides — at 100 TB the maintained view costs O(|Δ| ⋈ ...) per
    refresh instead of O(|A| ⋈ |B|). The decomposition (disjointness +
    completeness) is property-tested in tests/test_rollup.py and the
    registered query's oracle is the plain full join."""
    b_new = old_b.unionByName(delta_b)
    return delta_a.join(b_new, on).unionByName(old_a.join(delta_b, on))

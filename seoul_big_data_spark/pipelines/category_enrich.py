"""Pipeline 1 — category enrichment (reference: data_seoul_1_category.py).

Reference control flow (§3.1): JDBC catalog scan → filter site=1 AND
CATEGORY_BIG IS NULL → per-row HTTP fetch + parse + UPDATE, 1 s sleep/row.

Engine shape: one lazy plan — F1/F2 filter → C5 mapInPandas fetch (partition-
parallel, per-partition rate limit) → C7 merge_update write-back. Idempotent
exactly like the reference: already-categorized rows are filtered out, so a
re-run only touches pending work (J4)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.html_fetch import fetch_categories
from ..sources.writers import merge_update


def detail_url(base_url: str) -> F.Column:
    """Detail-page URL per dataset (ref: data_seoul_1_category.py:35,66
    f-string concat of base + DATA_ORIGIN_KEY)."""
    return F.concat(F.lit(base_url), F.col("data_origin_key"))


def run(
    catalog: DataFrame,
    transport: Callable[[str], str],
    base_url: str = "https://data.example/dataset/",
    fetch_partitions: int = 4,
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """Returns the enriched catalog (caller persists via overwrite_table)."""
    pending = catalog.filter(
        (F.col("collect_site_id") == 1) & F.col("category_big").isNull()
    )
    urls = pending.select(
        F.col("id"), detail_url(base_url).alias("url")
    ).repartition(fetch_partitions)
    updates = fetch_categories(urls, transport, rate_limit_s)
    return merge_update(
        catalog, updates, "id", ["category_big", "category_small"]
    )

"""HTTP/HTML enrichment source (SURVEY.md §2.1 C5, §2.9).

The reference fetches one detail page per catalog row inside a driver-side
loop with ``time.sleep(1)`` (data_seoul_1_category.py:57-85) — ≤1 page/s
total. Here the URL set is a DataFrame and the fetch runs in ``mapInPandas``:
each partition fetches its batch with a per-partition rate limit, so the
global rate is ``n_partitions × rate`` and is tuned by ``repartition(n)`` —
the scalable version of the same politeness control.

The transport is pluggable (``transport(url) -> html``): production would
wrap ``requests`` (plus retry/backoff); tests and this container use a
deterministic stub — there is no network here, and the engine's correctness
surface is the extraction + merge logic, not the socket.

Field extraction uses regex against the page's CSS-class markers (the
reference uses BeautifulSoup selectors on the same markers,
data_seoul_1_category.py:70-78); BeautifulSoup is used when importable.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = "id bigint, category_big string, category_small string"

# CSS-class markers of the category fields on the detail page
# (ref: data_seoul_1_category.py:70 find("strong", {"class": "side-detail-ctg"}),
#  :75-78 sibling anchor for the small category).
_BIG_RE = re.compile(
    r'class="side-detail-ctg"[^>]*>\s*(.*?)\s*<', re.DOTALL
)
_SMALL_RE = re.compile(
    r'class="side-detail-stitle"[^>]*>\s*(?:<a[^>]*>)?\s*(.*?)\s*<', re.DOTALL
)


def _clean(s: str | None) -> str | None:
    return re.sub(r"[\t\n]", "", s).strip() if s is not None else None


def _extract_via_bs4(html: str) -> tuple[str | None, str | None]:
    """DOM-selector path (raises ImportError when bs4 is absent)."""
    from bs4 import BeautifulSoup  # type: ignore

    soup = BeautifulSoup(html, "html.parser")
    big_el = soup.find("strong", {"class": "side-detail-ctg"})
    small_el = soup.find("span", {"class": "side-detail-stitle"})
    return (
        big_el.get_text() if big_el else None,
        small_el.get_text() if small_el else None,
    )


def _extract_via_regex(html: str) -> tuple[str | None, str | None]:
    """Dependency-free fallback against the same CSS-class markers."""
    big_m = _BIG_RE.search(html)
    small_m = _SMALL_RE.search(html)
    return (
        big_m.group(1) if big_m else None,
        small_m.group(1) if small_m else None,
    )


def extract_categories(html: str) -> tuple[str | None, str | None]:
    """Pull (category_big, category_small) out of a detail page, stripping
    tabs/newlines the way the reference does (X1, data_seoul_1_category.py:72).
    Uses BeautifulSoup when importable, else the regex fallback — both paths
    are pinned equal in test_pipelines.py::test_extract_paths_agree."""
    try:
        big, small = _extract_via_bs4(html)
    except ImportError:
        big, small = _extract_via_regex(html)
    return _clean(big), _clean(small)


def fetch_categories(
    urls: DataFrame,
    transport: Callable[[str], str],
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """C5 — (id, url) DataFrame → (id, category_big, category_small).

    Runs as Arrow-batched ``mapInPandas``; ``rate_limit_s`` sleeps between
    requests *within a partition* (per-executor politeness; reference's
    ``time.sleep(1)``, data_seoul_1_category.py:85). Cap global request rate
    by repartitioning the URL frame to the desired parallelism first."""

    from ..session import ensure_package_shipped

    ensure_package_shipped(urls.sparkSession)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row_id, url in zip(pdf["id"], pdf["url"]):
                if rate_limit_s:
                    time.sleep(rate_limit_s)
                big, small = extract_categories(transport(url))
                out.append(
                    {"id": row_id, "category_big": big, "category_small": small}
                )
            yield pd.DataFrame(
                out, columns=["id", "category_big", "category_small"]
            )

    return urls.mapInPandas(_fetch, schema=FETCH_SCHEMA)

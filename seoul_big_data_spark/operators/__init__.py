from . import (  # noqa: F401
    dedup,
    grouped_map,
    ingest,
    joins,
    similarity,
    skew,
    windows,
)

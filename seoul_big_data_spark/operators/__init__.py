from . import dedup, ingest, joins, similarity, windows  # noqa: F401

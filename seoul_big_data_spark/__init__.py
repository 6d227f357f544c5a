"""seoul_big_data_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``newGeon/seoul_big_data`` (a catalog-driven ETL pipeline for
the Seoul Open Data Plaza), re-expressed Spark-first: declarative DataFrame /
SQL plans optimized by Catalyst, set-oriented sinks instead of per-row
INSERTs, broadcast joins instead of correlated per-row lookups, and the
LLM-data-pipeline operator family (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    : tuned local SparkSession factory
- ``sources``    : table loaders, CSV ingest, HTML/HTTP enrichment source
- ``functions``  : scalar column-expression helpers (reference X1-X16), text,
                   vector math
- ``operators``  : ingest/resume, windows, joins (as-of/range), dedup,
                   similarity
- ``plans``      : schema-as-data (StructType from catalog rows)
- ``pipelines``  : end-to-end re-expressions of the reference's 3 pipelines
- ``streaming``  : batch time-window analytics over event streams (+ notes on
                   the Structured Streaming mapping)
"""

__version__ = "0.1.0"

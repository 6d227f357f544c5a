"""Skew mitigation (SURVEY.md §4.2): salted join for hot keys.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory); this
operator is the explicit fallback for joins AQE can't split (e.g., a
broadcast-ineligible dim replicated against a hot fact key): the fact side
gets a random salt in [0, n), the dim side is exploded n ways, and the join
key becomes (key, salt) — spreading one hot key over n reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the fact side salted n ways.

    The salt is derived from a stable per-row expression (hash of all fact
    columns) rather than rand() so the plan stays deterministic and
    re-executable (speculative retries see the same salt)."""
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_exploded = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_salted.join(dim_exploded, [key, "_salt"], how)
    return out.drop("_salt")

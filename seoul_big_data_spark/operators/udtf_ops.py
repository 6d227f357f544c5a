"""Python user-defined table functions (Spark 4 UDTF API — the §2.9 UDF
surface's table-valued member, completing scalar pandas UDFs /
applyInPandas / mapInPandas).

UDTFs run row-at-a-time in the Python worker — the slow path by design, so
the engine uses them only where a row expands into a VARIABLE number of
output rows under imperative logic that no builtin generator expresses.
The demonstration operator (token run-length encoding) IS declaratively
expressible, which is deliberate: the lateral-joined UDTF output is
oracle-checked against the declarative SQL, pinning the API's semantics
(per-row invocation, lateral correlation, schema binding) with an exact
cross-check rather than a rows-only smoke test.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, run_start int, run_len int")
class TokenRunLength:
    """Emit (token, 1-based start index, run length) for each maximal run
    of consecutive equal whitespace-tokens — the RLE kernel used for
    boilerplate/repetition span detection."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        toks = [t for t in (text or "").strip().split() if t]
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            yield toks[i], i + 1, j - i
            i = j


def register_udtfs(spark) -> None:
    """Register the UDTF surface under stable SQL names (idempotent)."""
    spark.udtf.register("token_run_length", TokenRunLength)

"""Registration-surface lint (VERDICT r4 #1, widened r8): NO registered
query — oracle-checked *or* rows-only — may emit an Array/Map/Struct output
column.

The driver's correctness gate pandas-sorts EVERY result frame before
recording it — rows-only entries included — and dies on container-typed
cells (``TypeError: unhashable type: 'list'``). This bit twice: the r4
``embedding_quantize_int8`` failure (oracle-checked) and the r7
``embedding_pq_codes`` failure (rows-only, which the r5 lint's
oracle-checked scope missed). The builder's local mirror now canonicalizes
rows-only outputs too (tools/local_verify.py), and this test scans every
``queries()`` entry's *lazy* output schema, so a reintroduction fails CI
before it can fail the driver. Vectors belong in the comparison as strings
(``concat_ws(',', ...)`` / ``array_to_string(..., ',')``).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from seoul_big_data_spark.queries import ORACLES, QUERIES


def _complex_cols(df):
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def test_no_complex_output_types_in_any_registered_query(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    build_errors: dict[str, str] = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
        except Exception as ex:  # build failures belong to other tests
            build_errors[name] = str(ex)[:120]
            continue
        bad = _complex_cols(df)
        if bad:
            offenders[name] = bad
    assert not build_errors, build_errors
    assert not offenders, (
        "registered queries with container-typed output columns "
        f"(driver canonicalizer cannot hash these): {offenders}"
    )


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_lint_catches_array_output(spark):
    """The lint itself must flag an array-typed column (guard the guard)."""
    from pyspark.sql import functions as F

    df = spark.range(3).select("id", F.array(F.lit(1), F.lit(2)).alias("arr"))
    assert _complex_cols(df) == ["arr"]


def test_local_verify_canon_rejects_lists():
    """tools/local_verify.py must fail exactly where the driver fails."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "local_verify.py",
    )
    spec = importlib.util.spec_from_file_location("local_verify_lint", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(TypeError):
        mod.canon([1, 2, 3])
    assert mod.canon(1.5) == "1.5"
    assert mod.canon(None) == "NULL"

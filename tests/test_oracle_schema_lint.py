"""Registration-surface lint (VERDICT r4 #1): no oracle-checked query may
emit an Array/Map/Struct output column.

The driver's correctness gate pandas-sorts result frames before hashing and
dies on container-typed cells (``TypeError: unhashable type: 'list'`` — the
r4 ``embedding_quantize_int8`` failure). The builder's local mirror now
fails on the same cells (tools/local_verify.py::canon raises), and this test
makes the class unrepresentable at pytest time: every oracle-checked entry's
*lazy* output schema is scanned, so a reintroduction fails CI before it can
fail the driver. Vectors belong in the comparison as strings
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


def test_no_complex_output_types_in_oracle_checked_queries(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    build_errors: dict[str, str] = {}
    for name in sorted(ORACLES):
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
        "oracle-checked queries with container-typed output columns "
        f"(driver canonicalizer cannot hash these): {offenders}"
    )


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

"""Schema-as-data type mapping (SURVEY.md §7.4.5) — explicit, tested."""

from __future__ import annotations

from pyspark.sql import types as T

from seoul_big_data_spark.plans.schema_from_catalog import (
    build_struct_type,
    spark_type_for,
)


def test_type_mapping_core():
    assert spark_type_for("VARCHAR") == T.StringType()
    assert spark_type_for("varchar2(100)") == T.StringType()
    assert spark_type_for("NUMBER") == T.DecimalType(38, 10)
    assert spark_type_for("NUMBER(10,2)") == T.DecimalType(38, 10)
    assert spark_type_for("DATE") == T.TimestampType()
    assert spark_type_for("INT") == T.IntegerType()
    assert spark_type_for("BLOB") == T.BinaryType()


def test_unknown_type_falls_back_to_string():
    # the reference's strings-only model (SURVEY.md §1.2)
    assert spark_type_for("GEOMETRY") == T.StringType()


def test_build_struct_type_with_leading_id():
    st = build_struct_type([("COL_001", "VARCHAR"), ("COL_002", "NUMBER")])
    assert st.fieldNames() == ["ID", "COL_001", "COL_002"]
    assert st["ID"].dataType == T.IntegerType()
    assert not st["ID"].nullable
    assert st["COL_002"].dataType == T.DecimalType(38, 10)


def test_build_struct_type_without_id():
    st = build_struct_type([("a", "INT")], leading_id=False)
    assert st.fieldNames() == ["a"]

"""Schema-as-data: build Spark StructTypes from catalog rows (SURVEY.md §1.3).

The reference stores schemas in ``MANAGE_PHYSICAL_COLUMN`` rows
(data_seoul_2_csv_noopenapi.py:89-101) and scrapes new ones from OpenAPI spec
pages (data_seoul_3_csv.py:127-145); it never interprets the declared types —
the DB coerces on INSERT. The engine makes the coercion explicit: a tested
mapping from the catalog's type strings to Spark types (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Catalog type string → Spark type. Tibero/Oracle-flavored names per the
# reference's PHYSICAL_COLUMN_TYPE domain (FIXTURES.md: VARCHAR/NUMBER/DATE).
_TYPE_MAP: dict[str, T.DataType] = {
    "VARCHAR": T.StringType(),
    "VARCHAR2": T.StringType(),
    "CHAR": T.StringType(),
    "TEXT": T.StringType(),
    "CLOB": T.StringType(),
    "NUMBER": T.DecimalType(38, 10),
    "NUMERIC": T.DecimalType(38, 10),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.DoubleType(),
    "DOUBLE": T.DoubleType(),
    "DATE": T.TimestampType(),
    "DATETIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "BOOLEAN": T.BooleanType(),
    "BLOB": T.BinaryType(),
}


def spark_type_for(catalog_type: str) -> T.DataType:
    """Map a catalog type string (case/precision-insensitive) to a Spark type.

    Precision suffixes like ``VARCHAR(100)`` / ``NUMBER(10,2)`` are stripped;
    unknown types fall back to string (the reference's strings-only behavior,
    SURVEY.md §1.2)."""
    base = catalog_type.strip().upper().split("(")[0].strip()
    return _TYPE_MAP.get(base, T.StringType())


def build_struct_type(
    columns: list[tuple[str, str]], leading_id: bool = True
) -> T.StructType:
    """StructType from ordered (name, catalog_type) pairs; optionally prepends
    the reference's synthetic row-number ``ID`` column
    (data_seoul_2_csv_noopenapi.py:103)."""
    fields = []
    if leading_id:
        fields.append(T.StructField("ID", T.IntegerType(), False))
    fields += [
        T.StructField(name, spark_type_for(ctype), True) for name, ctype in columns
    ]
    return T.StructType(fields)

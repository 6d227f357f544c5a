from .schema_from_catalog import build_struct_type, spark_type_for  # noqa: F401

"""Scalar-function layer queries — reference X1-X16 (SURVEY.md §2.7) each
exercised over the test tables with a DuckDB oracle.

DuckDB regex notes: RE2 engine → no lookaround (the CamelCase pattern uses
the capture-group form, see functions.scalar.camel_to_snake_upper); global
replace needs the explicit 'g' flag, which Spark applies by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import scalar
from .registry import query
from .sources.tables import load


@query(
    "scalar_name_derivation",
    """
    SELECT c_custkey,
           'NLDATA_' || CASE WHEN length(CAST(c_custkey AS VARCHAR)) >= 6
                             THEN CAST(c_custkey AS VARCHAR)
                             ELSE lpad(CAST(c_custkey AS VARCHAR), 6, '0') END
             AS staging_table,
           'COL_' || CASE WHEN length(CAST(c_custkey % 1000 AS VARCHAR)) >= 3
                          THEN CAST(c_custkey % 1000 AS VARCHAR)
                          ELSE lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') END
             AS col_name,
           upper(regexp_replace('TbData' || CAST(c_custkey AS VARCHAR),
                                '([a-z0-9])([A-Z])', '\\1_\\2', 'g')) AS snake_name
    FROM customer
    """,
)
def scalar_name_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 zero-pad + X3 concat + X9/X10 CamelCase→SNAKE_CASE — the
    reference's table/column-name derivations (data_seoul_2_csv_noopenapi.py:
    68-69, data_seoul_3_csv.py:110-114,138)."""
    c = load(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        scalar.staging_table_name("c_custkey").alias("staging_table"),
        scalar.col_name(F.col("c_custkey") % 1000).alias("col_name"),
        scalar.camel_to_snake_upper(
            F.concat(F.lit("TbData"), F.col("c_custkey").cast("string"))
        ).alias("snake_name"),
    )


@query(
    "scalar_url_derivation",
    """
    WITH urls AS (
      SELECT s_suppkey,
             'http://openapi.example/sample/xml/TbSupplier' ||
               CAST(s_suppkey AS VARCHAR) || '/1/5' AS sample_url
      FROM supplier
    )
    SELECT s_suppkey,
           string_split_regex(sample_url, '/sample/xml/')[2] AS tail_part,
           regexp_replace(sample_url, '/sample/', '/AUTHKEY/') AS keyed_url,
           CASE WHEN sample_url LIKE '%/' THEN sample_url
                ELSE sample_url || '/' END AS slashed_url,
           regexp_replace(sample_url, '(/[^/]*){2}$', '') AS master_url
    FROM urls
    """,
)
def scalar_url_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 split / X6 replace / X7 trailing slash / X8 rsplit-trim — the
    OpenAPI master-URL derivation (data_seoul_3_csv.py:93-106)."""
    s = load(spark, "supplier", sf_dir)
    url = F.concat(
        F.lit("http://openapi.example/sample/xml/TbSupplier"),
        F.col("s_suppkey").cast("string"),
        F.lit("/1/5"),
    )
    with_url = s.select("s_suppkey", url.alias("sample_url"))
    return with_url.select(
        "s_suppkey",
        scalar.split_after("sample_url", "/sample/xml/").alias("tail_part"),
        scalar.replace_literal("sample_url", "/sample/", F.lit("/AUTHKEY/")).alias(
            "keyed_url"
        ),
        scalar.ensure_trailing_slash("sample_url").alias("slashed_url"),
        scalar.drop_last_path_segments("sample_url", 2).alias("master_url"),
    )


@query(
    "scalar_string_cleanup",
    """
    SELECT p_partkey,
           regexp_replace(p_name, '[\\t\\n]', '', 'g') AS cleaned,
           trim(p_name)                                AS trimmed,
           upper(p_name)                               AS upper_name,
           lower(p_brand)                              AS lower_brand,
           substring(p_type, 1, 5)                     AS type_prefix,
           split_part(p_brand, '#', 2)                 AS brand_num,
           concat_ws('|', p_brand, p_type)             AS brand_type
    FROM part
    """,
)
def scalar_string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 whitespace strip + X4 trim + X10 upper + substring/split/concat_ws
    (ref: data_seoul_1_category.py:72,82; data_seoul_3_csv.py:93,111)."""
    p = load(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        scalar.strip_whitespace("p_name").alias("cleaned"),
        F.trim("p_name").alias("trimmed"),
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.split(F.col("p_brand"), "#").getItem(1).alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           year(o_orderdate)                                        AS order_year,
           month(o_orderdate)                                       AS order_month,
           day(o_orderdate)                                         AS order_day,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')               AS order_ts,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')   AS month_start,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')     AS plus_3m
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11/X12 timestamp handling (ref strftime at
    data_seoul_2_csv_noopenapi.py:71-72; SYSDATE at :134) + engine-scope
    date arithmetic."""
    o = load(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        scalar.format_timestamp("o_orderdate").alias("order_ts"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.add_months(F.col("o_orderdate"), 3), "yyyy-MM-dd").alias(
            "plus_3m"
        ),
    )


@query(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           round(abs(l_discount - 0.05), 4)             AS disc_dev,
           round(ln(l_extendedprice + 1), 6)            AS log_price,
           round(sqrt(l_quantity), 6)                   AS sqrt_qty,
           round(power(l_tax + 1, 2), 6)                AS tax_sq,
           CAST(floor(l_quantity / 10) AS BIGINT)       AS qty_decile,
           CAST(l_quantity AS INTEGER) % 7              AS qty_mod7
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 cast + X14 modulo + engine-scope math scalars
    (ref: data_seoul_3_csv.py:132,137)."""
    li = load(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round to 4: the product of two 2-decimal values is an exact
        # 4-decimal value, so round-2 sits on genuine .xx50 half-way points
        # where engines legitimately disagree; round-4 recovers it exactly.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "net_price"
        ),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.floor(F.col("l_quantity") / 10).cast("long").alias("qty_decile"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod7"),
    )


@query(
    "scalar_try_function_family",
    """
    SELECT doc_id,
           TRY_CAST(lang AS INTEGER)                      AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INTEGER)  AS chars_as_int,
           TRY_CAST(source AS DATE) IS NULL               AS bad_date,
           CAST(n_chars AS DOUBLE)
             / nullif(len(list_filter(
                 string_split_regex(trim(text), '\\s+'), x -> x != '')), 0)
             AS chars_per_token,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       x -> x != '')[1000] AS token_1000
    FROM documents
    """,
)
def scalar_try_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-robust scalar surface: the ``try_*`` family turns would-be
    runtime errors into NULLs — the difference between a 100 TB job that
    quarantines bad rows and one that dies at hour nine. try_cast on
    non-numeric and non-date strings, try_divide (NULL on zero
    denominator, mirrored as nullif in the oracle), and
    try_element_at past the end of the token array (NULL, mirrored as
    DuckDB's out-of-bounds list extract)."""
    d = load(spark, "documents", sf_dir)
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("int").alias(
            "chars_as_int"
        ),
        F.col("source").try_cast("date").isNull().alias("bad_date"),
        F.try_divide(
            F.col("n_chars").cast("double"), F.size(toks)
        ).alias("chars_per_token"),
        F.try_element_at(toks, F.lit(1000)).alias("token_1000"),
    )

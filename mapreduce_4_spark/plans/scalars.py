"""Scalar-function coverage: string, math, date — the generalization of
the reference's char-level clean (SURVEY.md §2.2 "Scalar functions").

All pure projections: no shuffle, fully pipelined inside
WholeStageCodegen, scan-bound at any scale.

Cross-engine semantics pinned here (probed against DuckDB):
- decimal ROUND ties away from zero in both engines (Spark HALF_UP);
  double ROUND is NOT used — its tie behavior differs.
- Spark ``dayofweek`` is 1-based Sunday; DuckDB's is 0-based — oracle adds 1.
- ``instr``/``strpos`` are both 1-based, 0 when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "string_functions_part",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len,
               substring(p_name, 1, 8) AS name_prefix,
               concat(p_brand, '/', p_type) AS brand_type,
               replace(p_name, ' ', '_') AS name_snake,
               strpos(p_name, 'a') AS first_a,
               levenshtein(p_brand, 'Brand#00') AS brand_dist,
               trim(concat('  ', p_brand, '  ')) AS brand_trim
        FROM part
    """,
    tags=("scalar", "string"),
    description="string function battery over part names",
)
def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat("p_brand", F.lit("/"), "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("long").alias("brand_dist"),
        F.trim(F.concat(F.lit("  "), "p_brand", F.lit("  "))).alias("brand_trim"),
    )


@register(
    "math_functions_lineitem",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               sqrt(l_quantity) AS qty_sqrt,
               l_quantity * l_quantity AS qty_sq,
               l_linenumber % 3 AS line_mod,
               round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS price_round1,
               greatest(l_tax, l_discount) AS max_rate,
               least(l_tax, l_discount) AS min_rate
        FROM lineitem
    """,
    tags=("scalar", "math"),
    description="math battery: abs/floor/ceil/sqrt/mod/decimal-round/greatest/least",
)
def math_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)"), 1).alias("price_round1"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "date_functions_orders",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               quarter(o_orderdate) AS o_quarter,
               dayofweek(o_orderdate) + 1 AS o_dow,
               date_trunc('month', o_orderdate) AS month_start,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        FROM orders
    """,
    tags=("scalar", "date"),
    description="date part extraction + truncation + day arithmetic",
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
    )


@register(
    "revenue_by_month",
    oracle="""
        SELECT date_trunc('month', o_orderdate) AS order_month,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY order_month
    """,
    tags=("scalar", "date", "aggregate"),
    description="monthly revenue time series (date_trunc + aggregate)",
)
def revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.money import csum

    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            csum("o_totalprice").alias("revenue"),
        )
    )

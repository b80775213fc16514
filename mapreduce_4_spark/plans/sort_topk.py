"""Sort / limit / top-k queries.

The reference's outputs were sorted only as a std::map side effect
(SURVEY.md §2.2 "Sort" row). Here ordering is explicit — and scale-aware:
``orderBy().limit(k)`` compiles to TakeOrderedAndProject, a per-partition
top-k merged at the driver (O(n log k) per partition, no global sort);
the window-function top-k-per-group shuffles once on the group key.
Every ordering carries a unique tie-break key so results are
deterministic against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import csum, sql_dsum
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "orders_sorted_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 50
    """,
    tags=("sort", "limit"),
    description="global top-50 by price (TakeOrderedAndProject, no full sort)",
)
def orders_sorted_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "top10_customers_by_revenue",
    oracle=f"""
        SELECT c_custkey, c_name, {sql_dsum('o_totalprice')} AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 10
    """,
    tags=("sort", "topk", "join", "aggregate"),
    description="top-10 customers by lifetime revenue",
)
def top10_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        # long-cents sum (functions.money.csum): bit-identical to the
        # decimal sum, long-backed aggregate buffer (round-14). 100 TB
        # bound: price cents ~2e7/row x <=1e5 orders/customer = 2e12 << 2^63.
        .agg(csum("o_totalprice").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "topk_per_group_orders",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 3
    """,
    tags=("topk", "window"),
    description="top-3 orders per customer via row_number window (one shuffle)",
)
def topk_per_group_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )

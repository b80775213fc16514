"""Maintenance queries: keyed upsert and data-quality validation, both
oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.maintenance import upsert, validate
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "upsert_orders",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + 1000 AS o_totalprice
            FROM orders WHERE o_orderkey % 10 = 0
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM updates
    """,
    tags=("maintenance", "join", "setop"),
    description="keyed upsert (anti-join + union): a +1000 price correction "
                "for every 10th order wins over the base row",
)
def upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    return upsert(base, updates, "o_orderkey")


@register(
    "dq_violations",
    oracle="""
        SELECT 'null_orderkey' AS rule,
               COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
        UNION ALL
        SELECT 'nonpositive_price', COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
        UNION ALL
        SELECT 'unknown_status',
               COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) FROM orders
        UNION ALL
        SELECT 'orphan_customer',
               COUNT(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        FROM orders
        UNION ALL
        SELECT 'suspicious_high', COUNT(*) FILTER (WHERE o_totalprice > 400000) FROM orders
    """,
    tags=("maintenance", "quality"),
    description="data-quality gate: per-rule violation counts in one pass "
                "(null keys, invalid domains, referential integrity, outliers)",
)
def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    with_ref = orders.join(
        F.broadcast(cust_keys),
        orders.o_custkey == cust_keys.c_custkey,
        "left",
    )
    return validate(
        with_ref,
        {
            "null_orderkey": F.col("o_orderkey").isNull(),
            "nonpositive_price": F.col("o_totalprice") <= 0,
            "unknown_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "orphan_customer": F.col("c_custkey").isNull(),
            "suspicious_high": F.col("o_totalprice") > 400000,
        },
    )

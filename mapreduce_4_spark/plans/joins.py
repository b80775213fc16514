"""Join queries — a capability the reference lacks entirely (SURVEY.md
§2.2: its nearest analogue is the reducer's per-word co-group merge).

Join strategy is the #1 scale lever at 100 TB, so every query here is
explicit about it:

- dimension tables (region 5 rows, nation 25, supplier, customer, part)
  are marked ``F.broadcast`` — the fact scan never shuffles for them;
- fact-fact joins (lineitem x orders) shuffle on the join key, and both
  sides arrive pre-filtered so AQE can shrink or re-plan the exchange;
- semi/anti joins use the dedicated join types (LeftSemi/LeftAnti) so
  Spark can stop at first match and broadcast the filter side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import (
    csum, revenue_sum, sql_dec, sql_dsum,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "join_orders_customer",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    tags=("join", "aggregate"),
    description="fact-dim inner join: orders x broadcast(customer), revenue by segment",
)
def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # long-cents sum: bit-identical, long-backed buffer
            # (round-14; ~6e17 cents per mktsegment at 100 TB < 2^63)
            csum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "q5_revenue_by_nation",
    oracle=f"""
        SELECT n_name,
               CAST(SUM({sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
        GROUP BY n_name
    """,
    tags=("join", "aggregate", "flagship-relational"),
    description="5-way star join (TPC-H Q5 shape): one fact shuffle, all dims broadcast",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    ).select("r_regionkey")

    # region filter folds into the broadcast nation->region dim before the
    # fact ever joins: partition pruning of the probe side happens via the
    # broadcast hash table, no fact shuffle for any dimension.
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    # long-cents revenue (functions.money.revenue_sum): bit-identical to
    # the decimal product sum, ~2x cheaper per row (round-14)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(revenue_sum("l_extendedprice", "l_discount").alias("revenue"))
    )


@register(
    "join_left_customer_orders",
    oracle="""
        SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
    """,
    tags=("join",),
    description="left outer join keeping order-less customers (COUNT(col) skips nulls)",
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi_customers_with_f_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    tags=("join",),
    description="left-semi join: customers having at least one finished order",
)
def join_semi_customers_with_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_semi")


@register(
    "join_anti_customers_without_big_orders",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    tags=("join",),
    description="left-anti join: customers with no order above 300k",
)
def join_anti_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")


@register(
    "join_lineitem_part_supplier",
    oracle=f"""
        SELECT p_brand, s_name,
               COUNT(*) AS n_items,
               CAST(SUM({sql_dec('l_extendedprice')} * (1 - {sql_dec('l_discount')})) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE p_size <= 25
        GROUP BY p_brand, s_name
    """,
    tags=("join", "aggregate"),
    description="fact x two broadcast dims on independent keys (part, supplier)",
)
def join_lineitem_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select("p_partkey", "p_brand")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # long-cents revenue: bit-identical, ~2x cheaper (round-14)
            revenue_sum("l_extendedprice", "l_discount").alias("revenue"),
        )
    )


@register(
    "join_right_orders_customer",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        WHERE c_acctbal > 9000
    """,
    tags=("join",),
    description="right outer join: high-balance customers kept even with "
                "no matching orders",
)
def join_right_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .select("c_custkey", "c_name", "o_orderkey")
    )


@register(
    "join_full_outer_nation_activity",
    oracle="""
        SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
               COALESCE(cn.n_customers, 0) AS n_customers,
               COALESCE(sn.n_suppliers, 0) AS n_suppliers
        FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
              FROM customer GROUP BY c_nationkey) cn
        FULL OUTER JOIN
             (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
              FROM supplier GROUP BY s_nationkey) sn
        ON cn.nationkey = sn.nationkey
    """,
    tags=("join",),
    description="full outer join of per-nation customer vs supplier counts",
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )

"""Set operations + distinct — absent from the reference (SURVEY.md §2.2).

UNION ALL is shuffle-free (plan concatenation); INTERSECT/EXCEPT plan as
aggregate + semi/anti join on the shuffled key; DISTINCT is a keys-only
hash aggregate with map-side partials. All stay cheap at scale when the
inputs are projected to narrow key columns first, as done here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "union_high_balance_parties",
    oracle="""
        SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind
        FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind
        FROM supplier WHERE s_acctbal > 5000
    """,
    tags=("setop",),
    description="UNION ALL of high-balance customers and suppliers",
)
def union_high_balance_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.col("c_custkey").alias("party_key"),
            F.col("c_name").alias("party_name"),
            F.lit("customer").alias("kind"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(
            F.col("s_suppkey").alias("party_key"),
            F.col("s_name").alias("party_name"),
            F.lit("supplier").alias("kind"),
        )
    )
    return cust.unionByName(supp)


@register(
    "union_by_name_missing_cols",
    oracle="""
        SELECT c_custkey AS party_key, c_name AS party_name,
               c_acctbal AS acctbal, 'customer' AS kind
        FROM customer
        UNION ALL BY NAME
        SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind
        FROM supplier
    """,
    tags=("setop", "schema-evolution"),
    description="unionByName with allowMissingColumns: schema-mismatched "
                "union fills absent columns with nulls",
)
def union_by_name_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"),
        F.col("c_name").alias("party_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"),
        F.col("s_name").alias("party_name"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@register(
    "intersect_active_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
    description="nations with both customers and suppliers (INTERSECT)",
)
def intersect_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "except_customer_only_nations",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
    description="nations with customers but no suppliers (EXCEPT)",
)
def except_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)  # EXCEPT DISTINCT semantics, same as the SQL


@register(
    "intersect_all_quantities",
    oracle="""
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
        INTERSECT ALL
        SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
    description="INTERSECT ALL: multiset intersection preserving duplicate "
                "multiplicity (min of the two sides' counts)",
)
def intersect_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_quantity").cast("long").alias("qty")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_quantity").cast("long").alias("qty")
    )
    return a.intersectAll(r)


@register(
    "except_all_quantities",
    oracle="""
        SELECT CAST(l_quantity AS BIGINT) AS qty FROM lineitem WHERE l_returnflag = 'A'
        EXCEPT ALL
        SELECT CAST(l_quantity AS BIGINT) FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("setop",),
    description="EXCEPT ALL: multiset difference (count subtraction, floor 0)",
)
def except_all_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_quantity").cast("long").alias("qty")
    )
    r = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_quantity").cast("long").alias("qty")
    )
    return a.exceptAll(r)


@register(
    "distinct_order_profiles",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("setop", "distinct"),
    description="DISTINCT over a two-column projection",
)
def distinct_order_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()

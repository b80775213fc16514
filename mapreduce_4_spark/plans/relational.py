"""Filter / projection / scalar-expression queries.

The reference's only projection is the char-level clean (O3) and its only
predicate the implicit empty-token drop (SURVEY.md §2.2). Here: real
filters and computed columns, expressed so Catalyst pushes predicates and
column pruning into the parquet scan — check ``.explain`` for
PushedFilters / ReadSchema; at 100 TB these queries read a fraction of
each row group and skip whole files via footer stats.

Per-row double arithmetic (unlike aggregation) is deterministic — the same
IEEE ops on the same inputs in either engine — so no decimal detour here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "filter_project_lineitem",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1 - l_discount) AS disc_price
        FROM lineitem
        WHERE l_quantity > 30
          AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    """,
    tags=("filter", "project"),
    description="pushed-down conjunctive filter + computed column",
)
def filter_project_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("disc_price"),
        )
    )


@register(
    "case_when_order_buckets",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 300000 THEN 'large'
                    WHEN o_totalprice >= 100000 THEN 'medium'
                    ELSE 'small' END AS bucket,
               CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                    THEN 'urgent' ELSE 'normal' END AS urgency
        FROM orders
        WHERE o_orderstatus <> 'P'
    """,
    tags=("project", "filter"),
    description="CASE WHEN buckets + LIKE predicates",
)
def case_when_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") != "P")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 300000, "large")
            .when(F.col("o_totalprice") >= 100000, "medium")
            .otherwise("small")
            .alias("bucket"),
            F.when(
                F.col("o_orderpriority").like("1-%")
                | F.col("o_orderpriority").like("2-%"),
                "urgent",
            )
            .otherwise("normal")
            .alias("urgency"),
        )
    )


@register(
    "scan_all_tables_counts",
    oracle="""
        SELECT 'region' AS tbl, COUNT(*) AS n FROM region
        UNION ALL SELECT 'nation', COUNT(*) FROM nation
        UNION ALL SELECT 'customer', COUNT(*) FROM customer
        UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        UNION ALL SELECT 'part', COUNT(*) FROM part
        UNION ALL SELECT 'orders', COUNT(*) FROM orders
        UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        UNION ALL SELECT 'events', COUNT(*) FROM events
        UNION ALL SELECT 'documents', COUNT(*) FROM documents
        UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    """,
    tags=("scan",),
    description="every source table scans and counts (source coverage probe)",
)
def scan_all_tables_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.sources import TABLES

    dfs = [
        load_table(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(t).alias("tbl"), "n"
        )
        for t in TABLES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@register(
    "unpivot_orders_metrics",
    oracle="""
        SELECT o_orderkey, 'totalprice' AS metric,
               CAST(o_totalprice AS DOUBLE) AS val
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
        UNION ALL
        SELECT o_orderkey, 'orderyear',
               CAST(CAST(year(o_orderdate) AS BIGINT) AS DOUBLE)
        FROM orders
    """,
    tags=("relational", "unpivot"),
    description="UNPIVOT/melt: wide per-order metrics to long "
                "(order, metric, value) triples via Spark's native "
                "unpivot operator (Expand under the hood — one scan, no "
                "join, no shuffle), the inverse of pivot_priority_by_status.",
)
def unpivot_orders_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
        F.year("o_orderdate").cast("double").alias("orderyear"),
    )
    return od.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey", "orderyear"],
        variableColumnName="metric",
        valueColumnName="val",
    )

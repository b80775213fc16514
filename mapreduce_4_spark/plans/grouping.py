"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

One shuffle regardless of the number of grouping sets — Catalyst expands
the sets via the Expand operator before the exchange, so at 100 TB the
cost over a plain groupBy is only the expansion factor on the map side
(already reduced by partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import dsum, sql_dsum
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "rollup_lineitem_flags",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("grouping",),
    description="ROLLUP over (returnflag, linestatus): per-pair, per-flag, grand total",
)
def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


@register(
    "cube_orders_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("grouping",),
    description="CUBE over (status, priority): all 4 grouping sets",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "grouping_sets_events",
    oracle="""
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
    tags=("grouping", "events"),
    description="explicit GROUPING SETS: by type and by user in one pass",
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id, COUNT(*) AS n
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )

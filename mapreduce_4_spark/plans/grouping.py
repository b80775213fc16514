"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

One shuffle regardless of the number of grouping sets — Catalyst expands
the sets via the Expand operator before the exchange, so at 100 TB the
cost over a plain groupBy is only the expansion factor on the map side
(already reduced by partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import cents, sql_dsum, unscale
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
    # Pre-aggregate per (flag, status) BEFORE the rollup (round-14
    # optimization, guide §2.3 "aggregate before you shuffle"): a direct
    # rollup Expands every input row x3 (one copy per grouping set)
    # ahead of the partial aggregate, tripling the hash-agg work on the
    # full fact table. Aggregating the base pairs first (one pass, long
    # cents sum) leaves the x3 Expand on the ~8-row intermediate.
    # Exactly equivalent: COUNT(*) per set == SUM of pair counts, exact
    # SUM per set == SUM of exact pair sums (decimal re-aggregation of
    # the long cents partials, overflow-free), and each rollup level
    # aggregates precisely the pairs it covers. Verified row-identical
    # vs the direct rollup and hash-green vs the unchanged oracle.
    pre = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(cents("l_quantity")).alias("_sq"),
        )
    )
    return (
        pre.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n_items"),
            unscale(F.sum(F.col("_sq").cast("decimal(38,0)")), 2).alias("sum_qty"),
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
    # Same pre-aggregation as rollup_lineitem_flags, bigger factor: a
    # direct cube Expands x4 (all four grouping sets); pre-aggregating
    # the 15 (status, priority) pairs first leaves the Expand on the
    # intermediate. Equivalence identical to the rollup argument.
    pre = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(cents("o_totalprice")).alias("_sp"),
        )
    )
    return (
        pre.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n_orders"),
            unscale(F.sum(F.col("_sp").cast("decimal(38,0)")), 2).alias("revenue"),
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

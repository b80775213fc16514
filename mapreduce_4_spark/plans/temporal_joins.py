"""Temporal joins: as-of and equi+range — joins the reference cannot
express at all, designed around the FIXTURES.md join graph
(events.user_id <-> customer.c_custkey -> orders).

The as-of Spark plan uses the union-merge operator (operators/asof.py:
one shuffle, no pair explosion); the oracle states the same semantics as
the naive theta-join + arg_max, which DuckDB can afford at sf0.01. The
plans being different shapes while hash-matching is exactly the point —
the operator is a scalable rewrite of the declared semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.asof import asof_join
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "asof_last_order_per_event",
    oracle="""
        SELECT e.event_id, e.user_id,
               arg_max(o.o_orderkey,
                       epoch_ms(o.o_orderdate) * 1000000 + o.o_orderkey) AS last_order_key,
               arg_max(o.o_totalprice,
                       epoch_ms(o.o_orderdate) * 1000000 + o.o_orderkey) AS last_order_total
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
        GROUP BY e.event_id, e.user_id
    """,
    tags=("join", "asof"),
    description="as-of join: latest order at or before each event, per user "
                "(union-merge plan vs the oracle's theta-join+arg_max)",
)
def asof_last_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_total"),
    )
    out = asof_join(
        events, orders, on="user_id", left_time="ts", right_time="o_orderdate",
        value_cols=["last_order_key", "last_order_total"],
        right_tiebreak="last_order_key",
    )
    return out.select("event_id", "user_id", "last_order_key", "last_order_total")


@register(
    "range_join_lineitem_part",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        GROUP BY p_brand
    """,
    tags=("join", "range"),
    description="equi + range-predicate join (quantity within +-5 of part "
                "size): hash join on the equi key, range as residual filter",
)
def range_join_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.money import csum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 5)
        & (li.l_quantity <= part.p_size + 5)
    )
    return (
        li.join(F.broadcast(part), cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            csum("l_extendedprice").alias("revenue"),
        )
    )


@register(
    "click_purchase_attribution",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND p.ts >= c.ts
         AND p.ts < c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("join", "events", "interval"),
    description="interval join: purchases within one hour after a click by "
                "the same user — the batch twin of the stream-stream join "
                "(equi on user, time-range residual; no cartesian)",
)
def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"),
    )
    return (
        clicks.join(
            purchases,
            (clicks.user_id == purchases.p_user_id)
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") < F.col("click_ts") + F.expr("interval 1 hour")),
        )
        .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    )

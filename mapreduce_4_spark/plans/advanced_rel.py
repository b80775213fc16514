"""Second-ring relational coverage: pivot, collected aggregates,
position-aware explode, cross join, scalar subqueries, approximate
distinct, and the RDD escape hatch (SURVEY.md §1.4: "RDD only for the
low-level mapPartitions escape hatch" — the literal analogue of the
reference's per-partition Mapper loop, O5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")


@register(
    "pivot_priority_by_status",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("aggregate", "pivot"),
    description="pivot on order status (fixed value list -> deterministic "
                "columns; compiles to one pass of conditional aggregates)",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "collect_user_event_types",
    oracle="""
        SELECT user_id,
               array_to_string(list_sort(list_distinct(list(event_type))), '|')
                   AS event_types,
               COUNT(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
    """,
    tags=("aggregate", "array"),
    description="collect_set made deterministic via sort_array, serialized "
                "to a pipe-joined string at the registry boundary (external "
                "canonicalizers can't hash list cells)",
)
def collect_user_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("event_type")))
            .alias("event_types"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


@register(
    "posexplode_words",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_W} AS w FROM documents)
        SELECT doc_id, s['i'] - 1 AS pos, s['w'] AS word
        FROM (SELECT doc_id,
                     unnest([{{'i': i, 'w': w[i]}} for i in range(1, len(w) + 1)]) AS s
              FROM t)
    """,
    tags=("flatmap",),
    description="posexplode: token stream with positions (order-preserving "
                "generate)",
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "word")


@register(
    "cross_join_region_status",
    oracle="""
        SELECT r_name, s.o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("join",),
    description="explicit cross join of two small relations",
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    status = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(status)


@register(
    "subquery_above_avg_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) FROM orders)
    """,
    tags=("filter", "subquery"),
    description="scalar subquery threshold (exact-decimal average on both "
                "engines) through the spark.sql path",
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sq
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) FROM orders_sq)
        """
    )


@register(
    "correlated_subquery_max_order",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
                                FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("filter", "subquery"),
    description="correlated scalar subquery: each customer's maximal order "
                "(decorrelated by Catalyst into an aggregate+join)",
)
def correlated_subquery_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders_corr o
        WHERE o.o_totalprice = (SELECT MAX(o2.o_totalprice)
                                FROM orders_corr o2
                                WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "approx_distinct_users",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS approx_ok
        FROM events
        GROUP BY event_type
    """,
    tags=("aggregate", "approx"),
    description="approx_count_distinct (HyperLogLog++) per event type — the "
                "sketch path for distinct counting at 100 TB. The sketch "
                "value itself differs across engines, so the oracle checks "
                "the exact count plus a 10%-relative-error bound on the "
                "sketch (2x the default 5% rsd; approx_ok must be TRUE).",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                # 2x the default rsd (5% = one standard deviation): a
                # one-sigma bound would make the oracle flaky across
                # sketch-implementation changes
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.10 * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


@register(
    "rdd_wordcount",
    oracle=f"""
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest({_W}) AS word FROM documents)
        GROUP BY doc_id, word
    """,
    tags=("rdd", "aggregate", "flatmap"),
    description="the RDD escape hatch: mapPartitions tokenize + reduceByKey "
                "combine (reference O5/O7/O9 shape, literally) — same oracle "
                "as the DataFrame flagship",
)
def rdd_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.udfs import _tokens_of

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def tokenize_partition(rows):
        # per-partition Mapper loop (O5): emit ((doc, word), 1) pairs
        for row in rows:
            for tok in _tokens_of(row.text or ""):
                yield ((row.doc_id, tok), 1)

    counted = (
        docs.rdd.mapPartitions(tokenize_partition)
        .reduceByKey(lambda a, b: a + b)  # map-side combine + final merge (O7/O9)
        .map(lambda kv: (kv[0][0], kv[0][1], kv[1]))
    )
    return spark.createDataFrame(counted, "doc_id long, word string, cnt long")

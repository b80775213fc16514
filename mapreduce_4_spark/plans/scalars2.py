"""Extended scalar coverage: string battery #2, null handling, bitwise
ops, date arithmetic — plus the events->customer enrichment join from
the FIXTURES.md join graph and a range-frame window."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import csum, sql_dsum
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "string_functions2_part",
    oracle="""
        SELECT p_partkey,
               split_part(p_type, ' ', 1) AS type_head,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               rpad(p_brand, 12, '.') AS brand_padded,
               reverse(p_brand) AS brand_rev,
               repeat(left(p_name, 2), 2) AS name_echo,
               starts_with(p_name, 'a') AS starts_a,
               ends_with(p_type, 'd') AS ends_d,
               right(p_name, 3) AS name_tail
        FROM part
    """,
    tags=("scalar", "string"),
    description="string battery #2: split_part/pad/reverse/repeat/affix tests",
)
def string_functions2_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.rpad("p_brand", 12, ".").alias("brand_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.left("p_name", F.lit(2)), 2).alias("name_echo"),
        F.startswith("p_name", F.lit("a")).alias("starts_a"),
        F.endswith("p_type", F.lit("d")).alias("ends_d"),
        F.right("p_name", F.lit(3)).alias("name_tail"),
    )


@register(
    "null_handling_orders",
    oracle="""
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_or_null,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
               (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL) AS is_pending,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
        FROM orders
    """,
    tags=("scalar", "null"),
    description="null machinery: nullif/coalesce/null-safe equality",
)
def null_handling_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_pending"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("price_or_null"),
    )


@register(
    "bitwise_ops_lineitem",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               (l_orderkey % 1024) & l_linenumber AS k_and,
               (l_orderkey % 1024) | l_linenumber AS k_or,
               xor(l_orderkey % 1024, l_linenumber) AS k_xor,
               (l_orderkey % 1024) << 2 AS k_shl,
               (l_orderkey % 1024) >> 1 AS k_shr
        FROM lineitem
    """,
    tags=("scalar", "bitwise"),
    description="bitwise and/or/xor/shifts over integer keys",
)
def bitwise_ops_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    k = (F.col("l_orderkey") % 1024)
    ln = F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(ln).alias("k_and"),
        k.bitwiseOR(ln).alias("k_or"),
        k.bitwiseXOR(ln).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 1).alias("k_shr"),
    )


@register(
    "date_functions2_orders",
    oracle="""
        SELECT o_orderkey,
               CAST(date_add(o_orderdate, INTERVAL 30 DAY) AS DATE) AS plus_30d,
               CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS minus_7d,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_add(o_orderdate, INTERVAL 2 MONTH) AS DATE) AS plus_2mo,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
        FROM orders
    """,
    tags=("scalar", "date"),
    description="date arithmetic: +/- days, month-end clamping, add_months, epoch",
)
def date_functions2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).alias("plus_30d"),
        F.date_sub(F.col("o_orderdate"), 7).alias("minus_7d"),
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 2).alias("plus_2mo"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "regex_ops_part",
    oracle="""
        SELECT p_partkey,
               regexp_matches(p_name, '^[a-m]') AS starts_early,
               regexp_extract(p_type, '([a-z]+)$', 1) AS type_tail,
               len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
               regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
        FROM part
        WHERE regexp_matches(p_name, '[aeiou]')
    """,
    tags=("scalar", "regex", "filter"),
    description="regex battery: rlike predicate, anchored extract, match "
                "counting, global replace",
)
def regex_ops_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("[aeiou]"))
        .select(
            "p_partkey",
            F.col("p_name").rlike("^[a-m]").alias("starts_early"),
            F.regexp_extract("p_type", "([a-z]+)$", 1).alias("type_tail"),
            F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).cast("long").alias("n_vowels"),
            F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        )
    )


@register(
    "events_customer_enrichment",
    oracle=f"""
        SELECT c_mktsegment, event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
    """,
    tags=("join", "events", "aggregate"),
    description="time-series-to-dimension enrichment (FIXTURES.md join graph: "
                "events.user_id <-> customer.c_custkey)",
)
def events_customer_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            csum("value").alias("sum_value"),
        )
    )


@register(
    "window_range_frame_events",
    oracle="""
        SELECT event_id, user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                   AS events_last_hour
        FROM events
    """,
    tags=("window", "events"),
    description="RANGE frame window: events within the trailing hour per user "
                "(value-based frame, not row-based)",
)
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("events_last_hour")
    )

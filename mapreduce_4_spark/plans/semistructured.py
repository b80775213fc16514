"""JSON / array / nested-type queries (SURVEY.md §2.2 scalar
date/math/array/map/json row; the reference has no such types at all).

- events.props is a JSON string -> ``get_json_object`` / ``from_json``
  (both JVM-side; no Python in the loop).
- embeddings.embedding is ArrayType(FloatType) -> array functions. Kept
  deliberately as the parquet-native array type, no UDT (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "json_extract_events",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    tags=("json",),
    description="JSON path extraction from props + predicate on the extracted value",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", "event_type", k.alias("k_val"))
        .filter(F.col("k_val") > 50)
    )


@register(
    "json_map_explode_events",
    oracle="""
        SELECT event_id, k AS key,
               CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS value
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events)
    """,
    tags=("json", "flatmap"),
    description="from_json to map<string,bigint> then explode to (key, value) rows",
)
def json_map_explode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.explode(F.from_json("props", "map<string,bigint>")).alias("key", "value"),
    )


@register(
    "array_functions_embeddings",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               embedding[1] AS first_val,
               embedding[64] AS last_val,
               list_max(embedding) AS max_val,
               list_min(embedding) AS min_val
        FROM embeddings
    """,
    tags=("array",),
    description="array size / element_at / max / min over the embedding column",
)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", 64).alias("last_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
    )


@register(
    "json_roundtrip_events",
    oracle="""
        SELECT event_id, user_id AS uid, value AS val
        FROM events
    """,
    tags=("json",),
    description="to_json/from_json identity round-trip of a struct column "
                "(serialization surface; oracle is the identity)",
)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    packed = F.to_json(F.struct("user_id", "value"))
    unpacked = F.from_json(packed, "user_id bigint, value double")
    return ev.select(
        "event_id",
        unpacked["user_id"].alias("uid"),
        unpacked["value"].alias("val"),
    )


@register(
    "interval_shift_events",
    oracle="""
        SELECT event_id,
               CAST(ts AS TIMESTAMP) + to_minutes(90) AS ts_plus_90m,
               CAST(ts AS TIMESTAMP) - to_hours(2) AS ts_minus_2h
        FROM events
    """,
    tags=("scalar", "date", "events"),
    description="interval arithmetic on event timestamps",
)
def interval_shift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("ts_minus_2h"),
    )


@register(
    "explode_outer_long_words",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter({sql_words('text')}, x -> len(x) > 9) AS long_words
            FROM documents
        )
        SELECT doc_id,
               unnest(CASE WHEN len(long_words) = 0 THEN [NULL]
                           ELSE long_words END) AS long_word
        FROM t
    """,
    tags=("flatmap", "null"),
    description="explode_outer: docs without any long word survive with a "
                "NULL row (null-preserving generate)",
)
def explode_outer_long_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    long_words = F.filter(words("text"), lambda w: F.length(w) > 9)
    return docs.select(
        "doc_id", F.explode_outer(long_words).alias("long_word")
    )


@register(
    "array_construct_ops",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               len(range(1, l_linenumber + 1)) AS seq_len,
               CAST(list_sum(range(1, l_linenumber + 1)) AS BIGINT) AS seq_sum,
               list_contains(range(1, l_linenumber + 1), 3) AS has_three
        FROM lineitem
        WHERE l_linenumber <= 5
    """,
    tags=("array",),
    description="array construction (sequence) + size / integer sum / contains",
)
def array_construct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 5)
    seq = F.sequence(F.lit(1), F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.size(seq).cast("long").alias("seq_len"),
        F.aggregate(seq, F.lit(0), lambda a, x: a + x).cast("long").alias("seq_sum"),
        F.array_contains(seq, 3).alias("has_three"),
    )

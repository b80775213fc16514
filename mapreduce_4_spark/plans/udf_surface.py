"""Queries exercising every UDF kind against DuckDB oracles — proving
the extension surface produces results identical to the declarative
plans (and therefore to the reference semantics they encode)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.functions.udfs import (
    WORDCOUNT_GROUP_SCHEMA,
    clean_text_py,
    k_sum_agg,
    n_rows_agg,
    register_tokenize_udtf,
    token_count_pandas,
    wordcount_group,
)
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")


@register(
    "udf_clean_text",
    oracle="""
        SELECT doc_id,
               lower(regexp_replace(text, '[\\n!-/:-@\\[-`{-~]', '', 'g')) AS cleaned
        FROM documents
    """,
    tags=("udf",),
    description="row Python UDF char-loop clean == the regex the engine uses "
                "(reference O3 fidelity through the plugin surface)",
)
def udf_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", clean_text_py("text").alias("cleaned"))


@register(
    "pandas_udf_token_count",
    oracle=f"SELECT doc_id, CAST(len({_W}) AS INTEGER) AS n_tokens FROM documents",
    tags=("udf",),
    description="vectorized pandas UDF token count (reference O4, Arrow path)",
)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", token_count_pandas("text").alias("n_tokens"))


@register(
    "apply_in_pandas_wordcount",
    oracle=f"""
        SELECT lang, word, COUNT(*) AS cnt
        FROM (SELECT lang, unnest({_W}) AS word FROM documents)
        GROUP BY lang, word
    """,
    tags=("udf", "aggregate"),
    description="applyInPandas grouped-map word count per lang (reference O9 "
                "reducer as a custom UDAF body)",
)
def apply_in_pandas_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return docs.groupBy("lang").applyInPandas(wordcount_group, WORDCOUNT_GROUP_SCHEMA)


@register(
    "pandas_udaf_event_k",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY event_type
    """,
    tags=("udf", "aggregate", "json"),
    description="grouped-agg pandas UDF (integer-state custom aggregate)",
)
def pandas_udaf_event_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return ev.groupBy("event_type").agg(
        n_rows_agg("k").alias("n"),
        k_sum_agg("k").alias("k_sum"),
    )


@register(
    "udtf_tokenize",
    oracle=f"""
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest({_W}) AS word FROM documents)
        GROUP BY doc_id, word
    """,
    tags=("udf", "flatmap", "aggregate"),
    description="Python UDTF tokenizer via SQL lateral join == the built-in "
                "explode pipeline (reference O4 through the UDTF surface)",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tokenize_udtf(spark)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM docs_for_udtf, LATERAL tokenize_ref(text)
        GROUP BY doc_id, word
        """
    )


@register(
    "map_in_arrow_wordcount",
    oracle=f"""
        SELECT word, COUNT(*) AS cnt
        FROM (SELECT unnest({_W}) AS word FROM documents)
        GROUP BY word
    """,
    tags=("udf", "aggregate"),
    description="the reference's map-side combiner (O7) through "
                "mapInArrow — the seventh O11 plugin mechanism and the "
                "lowest-overhead Python escape hatch: each raw Arrow "
                "batch collapses to PARTIAL (word, count) pairs with "
                "zero pandas conversion, Spark's final hash aggregate "
                "sums the partials (O9). Shuffle volume is per-batch "
                "vocabulary, not per-token — the combiner's point",
)
def map_in_arrow_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.udfs import arrow_wordcount_batches

    docs = load_table(spark, sf_dir, "documents").select("text")
    partials = docs.mapInArrow(
        arrow_wordcount_batches, "word string, partial long"
    )
    return partials.groupBy("word").agg(F.sum("partial").alias("cnt"))


@register(
    "udtf_dynamic_leading_words",
    oracle="""
        WITH stripped AS (
            -- NOT trim(): DuckDB trim strips only ' ' while the UDTF
            -- uses str.split() (ALL whitespace) — a doc with leading/
            -- trailing tabs or newlines would yield phantom ''-tokens
            SELECT doc_id,
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS tx
            FROM documents
        ), parts AS (
            SELECT doc_id,
                   regexp_split_to_array(tx, '\\s+') AS ws,
                   len(tx) AS nz
            FROM stripped
        )
        SELECT doc_id,
               CASE WHEN nz > 0 AND len(ws) >= 1 THEN ws[1] END AS w0,
               CASE WHEN nz > 0 AND len(ws) >= 2 THEN ws[2] END AS w1,
               CASE WHEN nz > 0 AND len(ws) >= 3 THEN ws[3] END AS w2
        FROM parts
        ORDER BY doc_id
    """,
    tags=("udf", "spark4"),
    description="POLYMORPHIC Python UDTF (Spark 4 analyze()): "
                "leading_words(text, 3) computes its (w0, w1, w2) "
                "output schema at plan time from the constant argument "
                "— the dynamic-pivot mechanism the static UDTF surface "
                "cannot express, completing the O11 plugin family; the "
                "oracle replays the whitespace-run split with "
                "regexp_split_to_array",
)
def udtf_dynamic_leading_words(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Scale rationale: analyze() runs ONCE on the driver at planning;
    eval streams row-at-a-time like any UDTF (the Arrow twin for bulk
    shapes is map_in_arrow_wordcount) — the feature is the schema
    contract, not the data path."""
    from mapreduce_4_spark.functions.udfs import (
        register_leading_words_udtf,
    )

    register_leading_words_udtf(spark)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_for_dyn_udtf")
    return spark.sql("""
        SELECT doc_id, t.w0, t.w1, t.w2
        FROM docs_for_dyn_udtf, LATERAL leading_words(text, 3) t
        ORDER BY doc_id
    """)

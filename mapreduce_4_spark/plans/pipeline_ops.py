"""Training-data pipeline selection stages: quality filtering (oracle-
checked) and seeded sampling (rows-only; determinism + bounds covered by
tests/test_sampling.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.operators.text_analysis import quality_features
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")


@register(
    "quality_filter_docs",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {_W} AS w FROM documents),
        f AS (
            SELECT doc_id,
                   len(w) AS n_words,
                   CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
                   CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                     / length(text) AS punct_ratio
            FROM t WHERE len(w) > 0
        )
        SELECT doc_id,
               (n_words < 20) AS too_short,
               (uniq_ratio < 0.3) AS low_diversity,
               (punct_ratio > 0.1) AS too_punctuated,
               (n_words >= 20 AND uniq_ratio >= 0.3 AND punct_ratio <= 0.1) AS keep
        FROM f
    """,
    tags=("text", "pipeline"),
    description="quality-filter keep-list with per-reason flags — the "
                "selection stage of a pretraining corpus pipeline",
)
def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features("text")
    scored = docs.select(
        "doc_id",
        feats["n_words"].alias("n_words"),
        feats["uniq_ratio"].alias("uniq_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
    ).filter(F.col("n_words") > 0)
    too_short = F.col("n_words") < 20
    low_div = F.col("uniq_ratio") < 0.3
    too_punct = F.col("punct_ratio") > 0.1
    return scored.select(
        "doc_id",
        too_short.alias("too_short"),
        low_div.alias("low_diversity"),
        too_punct.alias("too_punctuated"),
        (~too_short & ~low_div & ~too_punct).alias("keep"),
    )


@register(
    "map_functions_events",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), '|') AS prop_keys,
               len(json_keys(props)) AS n_props,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
    tags=("json", "map"),
    description="map functions over parsed JSON: map_keys / size / "
                "element_at (keys pipe-joined at the registry boundary)",
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws("|", F.sort_array(F.map_keys(m))).alias("prop_keys"),
        F.size(m).cast("long").alias("n_props"),
        F.element_at(m, "k").alias("k_val"),
    )


@register(
    "sample_documents",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8)
              < '33333333'
    """,
    tags=("pipeline", "sampling"),
    description="content-keyed uniform 20% corpus sample (md5-threshold on "
                "doc_id: partition-independent, engine-portable, no shuffle)",
)
def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.sampling import sample_by_hash

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_by_hash(docs, 0.2, key_col="doc_id")


@register(
    "sample_stratified_by_lang",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) <
              CASE lang WHEN 'en' THEN '40000000'
                        WHEN 'de' THEN '80000000'
                        WHEN 'es' THEN '80000000'
                        WHEN 'fr' THEN 'zzzzzzzz'
                        WHEN 'zh' THEN 'zzzzzzzz' END
    """,
    tags=("pipeline", "sampling"),
    description="stratified content-keyed sampling: downweight dominant "
                "languages, keep the tail (per-stratum md5 thresholds)",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.sampling import sample_stratified_by_hash

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    fractions = {"en": 0.25, "de": 0.5, "es": 0.5, "fr": 1.0, "zh": 1.0}
    return sample_stratified_by_hash(docs, "lang", fractions, key_col="doc_id")

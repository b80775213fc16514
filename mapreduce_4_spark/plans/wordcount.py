"""The flagship queries: the reference engine's entire capability, Spark-first.

The reference computes, per input file, a word-frequency histogram via
Map -> Shuffle -> Reduce with full text materialization between stages
(SURVEY.md §0, §2.1 O1-O10; asio_deep/main.cpp:216-516). Here the same
query is one declarative plan: scan -> project (clean) -> generate
(explode/split) -> filter -> two-phase hash aggregate. Catalyst plans the
partial/final aggregate split automatically (the reference's
Shuffler-combiner + Reducer, O7/O9), and the shuffle is managed binary
exchange, not temp_mapper/temp_shuffler text trees.

Scale notes (100 TB): the only shuffle is groupBy(doc_id, word) — keyed on
the finest grain available, so cardinality is high and skew is low; partial
aggregation collapses each mapper's output to distinct (doc, word) pairs
before the exchange, exactly the map-side combine the reference hand-rolled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import CLEAN_CLASS
from mapreduce_4_spark.functions.text import clean_text
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

# Shared with the DuckDB oracle so both engines run the identical regex.
_CLEANED_SQL = f"lower(regexp_replace(text, '{CLEAN_CLASS}', '', 'g'))"


def exploded_words(docs: DataFrame) -> DataFrame:
    """(doc_id, word) pairs under reference tokenize semantics."""
    return (
        docs.select("doc_id", F.explode(F.split(clean_text("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
    )


@register(
    "wordcount_per_doc",
    oracle=f"""
        SELECT doc_id, word, COUNT(*) AS cnt
        FROM (
            SELECT doc_id,
                   unnest(string_split({_CLEANED_SQL}, ' ')) AS word
            FROM documents
        )
        WHERE length(word) > 0
        GROUP BY doc_id, word
    """,
    tags=("flagship", "aggregate", "flatmap"),
    description="Per-document word histogram — the reference's end-to-end query",
)
def wordcount_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        exploded_words(docs)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "wordcount_global",
    oracle=f"""
        SELECT word, COUNT(*) AS cnt
        FROM (
            SELECT unnest(string_split({_CLEANED_SQL}, ' ')) AS word
            FROM documents
        )
        WHERE length(word) > 0
        GROUP BY word
    """,
    tags=("aggregate", "flatmap"),
    description="Corpus-wide word histogram (the reference never merges across "
                "files — this is the generalization)",
)
def wordcount_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(F.split(clean_text("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "wordcount_topk",
    oracle=f"""
        SELECT word, COUNT(*) AS cnt
        FROM (
            SELECT unnest(string_split({_CLEANED_SQL}, ' ')) AS word
            FROM documents
        )
        WHERE length(word) > 0
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
    tags=("aggregate", "topk"),
    description="Top-20 words corpus-wide (deterministic tie-break on word)",
)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy + limit compiles to TakeOrderedAndProject: each partition
    # keeps its local top-20, the driver merges — no global sort at scale.
    return (
        wordcount_global(spark, sf_dir)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
    )

"""End-to-end pipelines — the reference's whole program as one function.

``reference_wordcount_pipeline`` is the complete migration target for a
user of vssundararaman/MapReduce-4: point it at a directory of plaintext
files (the reference's hardcoded Shakespeare corpus shape,
asio_deep/main.cpp:543) and get the final_output/ text tree with
identical per-file ``(word,count)`` lines in sorted order — but executed
as a single Catalyst plan (scan -> clean -> explode -> two-phase agg ->
partitioned text sink) instead of three TCP-sequenced stages with full
disk materialization between them (SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import clean_text
from mapreduce_4_spark.sources.sinks import write_wordcount_reference_layout


def wordcount_from_text_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """(file, word, cnt) per-file word counts over a plaintext directory.

    The reference's O1-O9 as one declarative plan; per-file attribution
    via input_file_name() replaces the reference's map-keyed-by-path
    plumbing (FileProcessorBase.hpp:24-34).
    """
    lines = spark.read.text(input_dir).withColumn(
        "file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return (
        lines.select("file", F.explode(F.split(clean_text("value"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("file", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def reference_wordcount_pipeline(spark: SparkSession, input_dir: str,
                                 output_dir: str) -> None:
    """Full reference program: text corpus in, final_output/ tree out."""
    counts = wordcount_from_text_dir(spark, input_dir).withColumnRenamed(
        "file", "doc_id"
    )
    write_wordcount_reference_layout(counts, output_dir)

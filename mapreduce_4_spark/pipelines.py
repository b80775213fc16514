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


def positioned_tokens_from_text_dir(spark: SparkSession, input_dir: str,
                                    lines_per_partition: int = 2000) -> DataFrame:
    """(doc_id, part_id, line_no, pos, word) token stream with the
    reference's partitioning rule: consecutive blocks of 2000 lines per
    file (asio_deep/main.cpp:151-157; ceil(lines/2000.0) partitions).

    Line numbering rides monotonically_increasing_id inside a per-file
    window — exact for the reference's corpus shape (each plaintext file
    read as one split; the reference is single-node, so its files are
    splits by definition). pos preserves token order within a line via
    posexplode, matching the mapper's emission order.
    """
    from pyspark.sql import Window

    lines = (
        spark.read.text(input_dir)
        .withColumn(
            "doc_id", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("doc_id").orderBy("_mid")
    numbered = lines.withColumn(
        "line_no", (F.row_number().over(w) - 1).cast("long")
    ).withColumn(
        "part_id", (F.col("line_no") / F.lit(lines_per_partition))
        .cast("long")
    )
    return (
        numbered.select(
            "doc_id", "part_id", "line_no",
            F.posexplode(F.split(clean_text("value"), " ")).alias("pos", "word"),
        )
        .filter(F.length("word") > 0)
    )


def reference_stage_artifacts_pipeline(spark: SparkSession, input_dir: str,
                                       mapper_dir: str, shuffler_dir: str,
                                       output_dir: str,
                                       lines_per_partition: int = 2000) -> None:
    """The reference program WITH its intermediate materialization
    points: temp_mapper/ + temp_shuffler/ trees alongside final_output/,
    so a migration can diff every stage artifact byte-for-byte. The
    intermediates are explicit opt-in sinks — the final answer still
    computes as one pipelined Catalyst plan, not three disk-barriered
    stages."""
    from mapreduce_4_spark.sources.sinks import (
        write_mapper_stage_layout,
        write_shuffler_stage_layout,
    )

    tokens = positioned_tokens_from_text_dir(
        spark, input_dir, lines_per_partition
    )
    tokens.persist()
    try:
        write_mapper_stage_layout(tokens, mapper_dir)
        write_shuffler_stage_layout(tokens, shuffler_dir)
        counts = (
            tokens.groupBy("doc_id", "word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        write_wordcount_reference_layout(counts, output_dir)
    finally:
        tokens.unpersist()

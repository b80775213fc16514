"""Sinks — the write side of the engine (reference O6/O8/O10: hand-rolled
``(word,count)`` text trees under temp_mapper/ temp_shuffler/
final_output/, SURVEY.md §2.1).

Spark needs none of that for its own shuffles (managed binary exchange),
so sinks here are USER outputs: columnar parquet with partition layout
(the 100 TB default), csv/json interop, and a reference-layout text sink
that reproduces the final_output/ format byte-for-byte for migration
parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format warehouses ask
    for (built into Spark, same pushdown/pruning machinery as parquet)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              mode: str = "overwrite") -> None:
    """XML sink — built into Spark 4 (the spark-xml package merged
    upstream in 4.0), completing the row-interchange matrix
    (csv/json/xml) alongside the columnar pair (parquet/orc)."""
    df.write.mode(mode).option("rowTag", row_tag).xml(path)


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema=None) -> DataFrame:
    """XML source. Pass ``schema`` for round-trip fidelity — XML carries
    no types, so inference (like csv's) widens/narrows by content."""
    r = spark.read.option("rowTag", row_tag)
    return r.schema(schema).xml(path) if schema is not None else r.xml(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read.option("header", True)
    return r.schema(schema).csv(path) if schema is not None else \
        r.option("inferSchema", True).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    r = spark.read
    return r.schema(schema).json(path) if schema is not None else r.json(path)


def write_wordcount_reference_layout(counts: DataFrame, path: str) -> None:
    """Reference final-output emulation (O10): one directory per doc,
    lines formatted ``(word,count)`` sorted by word — the std::map order
    the reference emits [FileProcessorRedOutput.so; SURVEY.md §2.2 sort
    row]. counts must have (doc_id, word, cnt)."""
    (
        counts.select(
            "doc_id",
            F.concat(F.lit("("), "word", F.lit(","), F.col("cnt").cast("string"),
                     F.lit(")")).alias("value"),
            "word",
        )
        .repartition("doc_id")
        .sortWithinPartitions("doc_id", "word")
        .select("doc_id", "value")
        .write.mode("overwrite")
        .partitionBy("doc_id")
        .text(path)
    )


def write_mapper_stage_layout(tokens: DataFrame, path: str) -> None:
    """Reference mapper-stage emulation (O6): the ``temp_mapper/<file>/
    <partition>`` tree — one directory per (doc, 2000-line partition),
    lines ``(word,1)`` in token-emission order [FileProcessorMapOutput.so
    .rodata dir literal; tuple format asio_deep/main.cpp:293-331].

    Spark never needs this tree (its shuffle is a managed binary
    exchange); it exists so a migration can diff EVERY stage artifact of
    the reference, not just final_output/. ``tokens`` must carry
    (doc_id, part_id, line_no, pos, word)."""
    (
        tokens.select(
            "doc_id", "part_id",
            F.concat(F.lit("("), "word", F.lit(",1)")).alias("value"),
            "line_no", "pos",
        )
        .repartition("doc_id", "part_id")
        .sortWithinPartitions("doc_id", "part_id", "line_no", "pos")
        .select("doc_id", "part_id", "value")
        .write.mode("overwrite")
        .partitionBy("doc_id", "part_id")
        .text(path)
    )


def write_shuffler_stage_layout(tokens: DataFrame, path: str) -> None:
    """Reference shuffler-stage emulation (O8): the ``temp_shuffler/``
    mirror — per (doc, partition), ``(word,count)`` lines sorted by word
    (std::map order), i.e. the map-side combine BEFORE the cross-
    partition reduce merge [ShufflerImpl.so :: shuffleFile;
    asio_deep/main.cpp:382-420]."""
    (
        tokens.groupBy("doc_id", "part_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "doc_id", "part_id",
            F.concat(F.lit("("), "word", F.lit(","),
                     F.col("cnt").cast("string"), F.lit(")")).alias("value"),
            "word",
        )
        .repartition("doc_id", "part_id")
        .sortWithinPartitions("doc_id", "part_id", "word")
        .select("doc_id", "part_id", "value")
        .write.mode("overwrite")
        .partitionBy("doc_id", "part_id")
        .text(path)
    )


def read_wordcount_reference_layout(spark: SparkSession, path: str) -> DataFrame:
    """Parse the reference-layout text tree back to (doc_id, word, cnt)."""
    raw = spark.read.text(path)
    with_doc = raw.withColumn(
        "doc_id",
        F.regexp_extract(F.input_file_name(), r"doc_id=(\d+)", 1).cast("long"),
    )
    m = F.regexp_extract("value", r"^\((.*),(\d+)\)$", 1)
    c = F.regexp_extract("value", r"^\((.*),(\d+)\)$", 2)
    return with_doc.select(
        "doc_id", m.alias("word"), c.cast("long").alias("cnt")
    )

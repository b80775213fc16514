"""The reference program, incremental: word count over a STREAM of
documents.

The reference's whole pipeline (scan -> clean -> tokenize -> map ->
shuffle/combine -> reduce, asio_deep/main.cpp:216-516) reruns from
scratch per corpus; here the same tokenizer feeds a streaming aggregate
whose state IS the running reduce — each arriving document batch updates
only the words it touches (update output mode), which is the shape that
matters when the corpus is a firehose rather than a directory.

Equivalence to the batch twin (``wordcount_global``) is pinned by
availableNow replay in tests/test_streaming_wordcount.py, including a
forced multi-micro-batch run — the streaming state merge must commute
with batch slicing exactly like the reference's combiner merge.

100 TB posture: state is vocabulary-sized (not corpus-sized), keyed and
sharded like any shuffle; a watermarked windowed variant bounds it
further when "all time" totals aren't the ask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import clean_text


def documents_stream(spark: SparkSession, sf_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view of the documents table (schema from a batch peek)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    reader = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def stream_wordcount(stream: DataFrame) -> DataFrame:
    """Running global word counts — identical tokenizer, incremental
    reduce. Use output mode ``update`` (emit changed words per batch)
    or ``complete`` (full table per batch)."""
    return (
        stream.select(F.explode(F.split(clean_text("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

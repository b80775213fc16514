"""Binary-file source — multimodal ingestion surface (SURVEY.md §2.2
"LLM-pipeline: multimodal columns").

``binaryFile`` is the idiomatic Spark source for opaque media blobs:
each file becomes a row (path, modificationTime, length, content) with
the bytes in a BinaryType column; partitioning/splitting is handled by
the file index exactly like any other file source, so a 100 TB image
corpus distributes the same way parquet does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str | None = None) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)

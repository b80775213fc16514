"""Parquet table sources for the synthetic star schema (TESTDATA.md).

The reference's only source was a plaintext directory scan
(SURVEY.md §2.1 O1/O2 — `asio_deep/main.cpp:230-234` plus
FileProcessorInput.so's 2,000-line partitioner). Spark's file-source
planning replaces all of it: directory globbing, split sizing
(`spark.sql.files.maxPartitionBytes`), schema from the parquet footer,
column pruning and predicate pushdown into the scan. At 100 TB these scans
are the dominant cost, so every query in ``plans/`` selects only the
columns it needs — verify with ``.explain`` → ReadSchema/PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for the ``spark.sql`` path."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

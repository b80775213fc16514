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
    # every registered query funnels through here, so pin the confs that
    # correctness depends on even when the caller's session (e.g. the
    # verify driver's) was built without mapreduce_4_spark.session:
    # timestamp semantics must match the UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS,false), which Spark's reader
    rejects outright. Read it as a raw nanosecond long (legacy conf, set at
    runtime so it works in any caller's session too) and convert via exact
    integer division — ``ts div 1000`` on longs; a double division would
    lose precision above 2^53 ns (~1970+104 days).

    The resulting ``ts`` is a microsecond timestamp, matching what the
    DuckDB oracle yields for ``CAST(ts AS TIMESTAMP)``.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for the ``spark.sql`` path."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

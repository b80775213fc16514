"""The mr4ver DataSource front door: manifest-driven partition
planning, Arrow conformance (evolution null-padding, hive value
restore), time-travel options, and bit-parity with read_version."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from mapreduce_4_spark.sources.pyds import (
    Mr4VersionedDataSource,
    Mr4VersionedReader,
    register_versioned_source,
)
from mapreduce_4_spark.sources.versioned import (
    read_manifest,
    read_version,
    write_version,
)


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def _evolved_chain(spark, tdir):
    write_version(spark.range(0, 10).withColumnRenamed("id", "k"),
                  tdir, append=True)
    t_v1 = time.time()
    write_version(
        spark.range(100, 110).withColumnRenamed("id", "k")
        .withColumn("extra", (F.col("k") * 2).cast("bigint")),
        tdir, append=True)
    return t_v1


def test_mr4ver_parity_with_read_version_evolved(spark, tmp_path):
    tdir = str(tmp_path / "t")
    t_v1 = _evolved_chain(spark, tdir)
    register_versioned_source(spark)

    got = spark.read.format("mr4ver").load(tdir)
    want = read_version(spark, tdir)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)
    assert got.filter(F.col("extra").isNull()).count() == 10

    # integer and timestamp time travel through the reader options
    v1 = spark.read.format("mr4ver").option("version", "1").load(tdir)
    assert _rows(v1) == _rows(read_version(spark, tdir, version=1))
    asof = (spark.read.format("mr4ver")
            .option("asOf", str(t_v1)).load(tdir))
    assert _rows(asof) == _rows(v1)


def test_mr4ver_partition_planning_reflects_manifest(spark, tmp_path):
    """One input partition per parquet file per chain dir, enumerated
    from the manifest's data_dirs — the planning contract the 100 TB
    fan-out rests on."""
    import glob
    import os

    tdir = str(tmp_path / "t")
    _evolved_chain(spark, tdir)
    ds = Mr4VersionedDataSource(options={"path": tdir})
    reader = ds.reader(ds.schema())
    assert isinstance(reader, Mr4VersionedReader)
    parts = reader.partitions()
    m = read_manifest(tdir, 2)
    files = [
        p for d in m["data_dirs"]
        for p in glob.glob(os.path.join(tdir, d, "**", "*.parquet"),
                           recursive=True)
    ]
    assert sorted(p.path for p in parts) == sorted(files)
    assert len(files) >= 2  # one+ file per chain dir


def test_mr4ver_hive_partition_values_restored(spark, tmp_path):
    tdir = str(tmp_path / "t")
    base = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("p"))
    write_version(base, tdir, append=True, partition_by=["p"])
    write_version(
        spark.range(100, 106).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("p")),
        tdir, append=True, partition_by=["p"])
    register_versioned_source(spark)
    got = spark.read.format("mr4ver").load(tdir)
    want = read_version(spark, tdir)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)
    assert got.filter(F.col("p") == 1).count() == \
        want.filter(F.col("p") == 1).count()


def test_mr4ver_option_and_path_errors(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _evolved_chain(spark, tdir)

    with pytest.raises(ValueError, match="not both"):
        Mr4VersionedDataSource(
            options={"path": tdir, "version": "1", "asof": "123"}
        ).schema()
    with pytest.raises(ValueError, match="needs a table dir"):
        Mr4VersionedDataSource(options={}).schema()
    with pytest.raises(ValueError, match="local table dirs"):
        Mr4VersionedDataSource(
            options={"path": f"file://{tdir}"}).schema()
    with pytest.raises(ValueError, match="predates the first commit"):
        Mr4VersionedDataSource(
            options={"path": tdir, "asof": "1.0"}).schema()
    with pytest.raises(FileNotFoundError):
        Mr4VersionedDataSource(
            options={"path": str(tmp_path / "nope")}).schema()


def test_mr4ver_empty_partitioned_chain_sentinel(spark, tmp_path):
    """A chain whose appends all wrote zero rows has no parquet files;
    the reader plans its no-files sentinel and yields an empty result
    with the manifest schema."""
    tdir = str(tmp_path / "t")
    base = spark.range(0).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("p"))
    write_version(base, tdir, append=True, partition_by=["p"])
    register_versioned_source(spark)
    got = spark.read.format("mr4ver").load(tdir)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["k", "p"]


def test_mr4ver_stream_tails_appends_exactly_once(spark, tmp_path):
    """The streaming source drains the existing chain, then a later
    drain delivers ONLY the versions appended since the checkpoint."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.pyds import register_versioned_source
    from mapreduce_4_spark.sources.versioned import write_version

    tdir = str(tmp_path / "t")
    df = spark.range(30).select(F.col("id").alias("k"))
    write_version(df.filter("k < 10").coalesce(1), tdir, append=True)
    write_version(df.filter("k >= 10 AND k < 20").coalesce(1), tdir,
                  append=True)
    register_versioned_source(spark)

    out = str(tmp_path / "out")

    def drain():
        # file sink (checkpoint-recoverable, unlike the memory sink) —
        # a restart against the same checkpoint must resume the offset
        q = (
            spark.readStream.format("mr4ver").load(tdir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(r["k"] for r in spark.read.parquet(out).collect())

    assert drain() == list(range(20))
    write_version(df.filter("k >= 20").coalesce(1), tdir, append=True)
    # same checkpoint: the restarted drain appends ONLY v3's rows
    assert drain() == list(range(30))


def test_mr4ver_stream_refuses_or_skips_non_append_commits(
        spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from mapreduce_4_spark.sources.pyds import register_versioned_source
    from mapreduce_4_spark.sources.versioned import (
        delete_version_dv,
        write_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(10).select(F.col("id").alias("k"))
    write_version(df.coalesce(1), tdir, append=True)
    delete_version_dv(spark, tdir, keys=[3], key="k")  # v2: non-append
    write_version(
        spark.range(50, 55).select(F.col("id").alias("k")).coalesce(1),
        tdir, append=True)  # v3
    register_versioned_source(spark)

    q = (
        spark.readStream.format("mr4ver").load(tdir)
        .writeStream.format("memory").queryName("mr4ver_strict")
        .option("checkpointLocation", str(tmp_path / "ck_strict"))
        .start()
    )
    try:
        with pytest.raises(StreamingQueryException,
                           match="delete-dv|non-append"):
            q.processAllAvailable()
    finally:
        q.stop()

    # ignoreChanges skips v2 entirely; appends still flow. NOTE the
    # skipped DV delete means the feed still carries k=3 — the
    # documented reason mutation consumers want the CDC feed instead
    q = (
        spark.readStream.format("mr4ver")
        .option("ignoreChanges", "true").load(tdir)
        .writeStream.format("memory").queryName("mr4ver_skip")
        .option("checkpointLocation", str(tmp_path / "ck_skip"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["k"] for r in
                 spark.sql("SELECT * FROM mr4ver_skip").collect())
    assert got == list(range(10)) + list(range(50, 55))


def test_mr4ver_stream_starting_version_latest(spark, tmp_path):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.pyds import register_versioned_source
    from mapreduce_4_spark.sources.versioned import write_version

    tdir = str(tmp_path / "t")
    df = spark.range(10).select(F.col("id").alias("k"))
    write_version(df.coalesce(1), tdir, append=True)
    register_versioned_source(spark)
    stream = (
        spark.readStream.format("mr4ver")
        .option("startingVersion", "latest").load(tdir)
    )
    q = (
        stream.writeStream.format("memory").queryName("mr4ver_latest")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM mr4ver_latest").count() == 0
        write_version(
            spark.range(100, 103).select(F.col("id").alias("k"))
            .coalesce(1), tdir, append=True)
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["k"] for r in
                 spark.sql("SELECT * FROM mr4ver_latest").collect())
    assert got == [100, 101, 102]

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
    # r14: LOCAL file: URIs resolve (the shape the SQL catalog stores
    # and forwards — _local_path normalizes); remote schemes and
    # remote-host file URIs still refuse as non-local
    assert Mr4VersionedDataSource(
        options={"path": f"file://{tdir}"}).schema() is not None
    with pytest.raises(ValueError, match="local table dirs"):
        Mr4VersionedDataSource(
            options={"path": f"s3://bucket{tdir}"}).schema()
    with pytest.raises(ValueError, match="local table dirs"):
        Mr4VersionedDataSource(
            options={"path": f"file://otherhost{tdir}"}).schema()
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


def _pruned_chain(spark, tdir, residue=False):
    base = spark.range(0, 100).withColumnRenamed("id", "k") \
        .withColumn("s", F.concat(F.lit("u"), F.col("k")))
    if residue:
        # residue-class dirs: every dir's [min, max] spans the keyspace,
        # so ONLY the bloom can prove a dir out (the bloom-pruned-read
        # fixture shape)
        for r in range(4):
            write_version(base.filter(F.col("k") % 4 == r), tdir,
                          append=True, stats_for=["k"],
                          bloom_for=["k", "s"])
    else:
        for lo in range(0, 100, 25):
            write_version(
                base.filter((F.col("k") >= lo) & (F.col("k") < lo + 25)),
                tdir, append=True, stats_for=["k"], bloom_for=["k", "s"])


def test_xxh64_twin_matches_jvm_bloom_positions(spark):
    """The planning-worker bloom probe hashes with a pure-Python XXH64
    twin (sources/xxh64.py) — it MUST be bit-identical to the JVM
    _bloom_positions_col expression the writers build with, for every
    SUPPORTED_TYPES member, or the format front door would skip dirs
    that hold matches. Edge coverage: negative longs, int extremes,
    empty/long/unicode strings (the 32-byte stripe loop and every tail
    branch)."""
    from mapreduce_4_spark.sources.versioned import (
        _BLOOM_K,
        _bloom_positions_col,
    )
    from mapreduce_4_spark.sources.xxh64 import bloom_positions

    cases = {
        "bigint": [0, 1, -1, 7, 2**62, -(2**62), 123456789012345],
        "int": [0, 1, -5, 2**31 - 1, -(2**31)],
        "string": ["", "a", "hello", "x" * 7, "y" * 8, "z" * 31,
                   "w" * 32, "q" * 57, "héllo wörld 中文" * 4],
    }
    for sql_type, vals in cases.items():
        df = spark.createDataFrame([(v,) for v in vals], f"k {sql_type}")
        rows = df.select(
            "k", _bloom_positions_col("k", 1 << 17).alias("p")).collect()
        for r in rows:
            got = bloom_positions(r["k"], sql_type, 1 << 17, _BLOOM_K)
            assert list(r["p"]) == got, (sql_type, r["k"])


def test_mr4ver_where_option_prunes_dirs_and_filters_exactly(
        spark, tmp_path):
    """option('where', 'col:lo:hi'): partitions() provably excludes the
    dirs the stats window rules out (the r11 verdict's ask — the
    format front door regains read_version_stats_pruned's skipping),
    AND the rows are exactly the closed-range slice (the residual is
    applied in read(), so results never depend on pruning
    effectiveness). Pruning state rides the load OPTIONS — relation
    identity — so an unpruned relation on the same table is untouched."""
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    _pruned_chain(spark, tdir)
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    # partition-planning proof: 4 dirs -> only the [25,50) dir survives
    r_all = Mr4VersionedReader(tdir, m, schema, {})
    r_cut = Mr4VersionedReader(tdir, m, schema, {"where": "k:30:40"})
    assert len(r_cut.partitions()) < len(r_all.partitions())
    survived = {p.path.split("/v=")[1].split("/")[0]
                for p in r_cut.partitions()}
    assert survived == {"000002"}

    df = spark.read.format("mr4ver").option("where", "k:30:40").load(tdir)
    assert sorted(r["k"] for r in df.collect()) == list(range(30, 41))
    # open upper bound; conjunct composition via ';'
    ob = spark.read.format("mr4ver").option("where", "k:75:").load(tdir)
    assert ob.count() == 25
    both = spark.read.format("mr4ver") \
        .option("where", "k:75:;k::80").load(tdir)
    assert sorted(r["k"] for r in both.collect()) == list(range(75, 81))
    # the unpruned relation is a different identity: full table
    assert spark.read.format("mr4ver").load(tdir).count() == 100
    # bad clauses fail loudly
    with pytest.raises(Exception):
        spark.read.format("mr4ver").option("where", "nope:1:2") \
            .load(tdir).count()
    with pytest.raises(Exception):
        spark.read.format("mr4ver").option("where", "k:xx:2") \
            .load(tdir).count()


def test_mr4ver_probe_option_bloom_skips_unsorted_dirs(spark, tmp_path):
    """option('probe', 'col:v1,v2'): point lookups through the format
    front door skip dirs by BLOOM where min/max windows cannot (the
    residue-class chain: every dir's window spans the keyspace), using
    the JVM-parity-pinned Python hash twin; string columns probe too."""
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    _pruned_chain(spark, tdir, residue=True)
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r_all = Mr4VersionedReader(tdir, m, schema, {})
    # k=8 and k=12 are both residue 0: one dir survives, by bloom alone
    r_probe = Mr4VersionedReader(tdir, m, schema, {"probe": "k:8,12"})
    survived = {p.path.split("/v=")[1].split("/")[0]
                for p in r_probe.partitions()}
    assert len(survived) == 1
    assert len(r_probe.partitions()) < len(r_all.partitions())

    df = spark.read.format("mr4ver").option("probe", "k:8,12").load(tdir)
    assert sorted(r["k"] for r in df.collect()) == [8, 12]
    # string bloom probe
    sdf = spark.read.format("mr4ver").option("probe", "s:u55").load(tdir)
    assert [r["k"] for r in sdf.collect()] == [55]
    # absent key: every dir bloom-proven out -> sentinel partition,
    # zero rows, schema intact
    r_none = Mr4VersionedReader(tdir, m, schema,
                                {"probe": "k:1000000"})
    assert [p.path for p in r_none.partitions()] == [None]
    nd = spark.read.format("mr4ver").option("probe", "k:1000000").load(tdir)
    assert nd.count() == 0 and nd.columns == ["k", "s"]


def test_mr4ver_pushfilters_opt_in_and_aliasing_guard(spark, tmp_path):
    """pushFilters-driven pruning is OPT-IN (option('pruneOnFilters',
    'true')) because Spark 4.1's PythonDataSourceV2 caches ONE mutable
    readInfo per relation and the pushdown path overwrites it: without
    the guard, a filtered action on a shared relation makes a later
    UNFILTERED action on the same relation silently replay the pruned
    partitions. Pin both sides: the default relation stays correct
    under the hazard pattern; the opted-in relation prunes."""
    tdir = str(tmp_path / "t")
    _pruned_chain(spark, tdir)
    register_versioned_source(spark)

    # default: the hazard pattern must stay correct
    df = spark.read.format("mr4ver").load(tdir)
    assert df.count() == 100
    assert df.filter("k >= 30 and k <= 40").count() == 11
    assert df.count() == 100  # the r4.1 cache would say 25 if we pruned

    # opt-in: filters prune partitions (and Spark still applies the
    # exact residual)
    pf = spark.read.format("mr4ver").option("pruneOnFilters", "true") \
        .load(tdir)
    cut = pf.filter("k >= 30 and k <= 40")
    assert sorted(r["k"] for r in cut.collect()) == list(range(30, 41))
    # reader-level proof (df.rdd replans WITHOUT the v2 pushdown, so
    # partition counts must be asserted on the reader itself): every
    # filter is returned for exact residual application, and the
    # partition list shrinks to the one covering dir
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    from mapreduce_4_spark.sources.pyds import Mr4VersionedPushdownReader

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r_all = Mr4VersionedReader(tdir, m, schema, {})
    r_pf = Mr4VersionedPushdownReader(tdir, m, schema,
                                      {"pruneonfilters": "true"})
    flt = [GreaterThanOrEqual(("k",), 30), LessThanOrEqual(("k",), 40)]
    assert list(r_pf.pushFilters(flt)) == flt
    assert len(r_pf.partitions()) < len(r_all.partitions())
    survived = {p.path.split("/v=")[1].split("/")[0]
                for p in r_pf.partitions()}
    assert survived == {"000002"}
    # without the opt-in the reader CLASS does not OVERRIDE
    # pushFilters (Spark 4.1 refuses to initialize overriding readers
    # under a stock session — DATA_SOURCE_PUSHDOWN_DISABLED, the r12
    # regression); the base no-op stays inherited
    from pyspark.sql.datasource import DataSourceReader

    assert Mr4VersionedReader.pushFilters is DataSourceReader.pushFilters
    assert Mr4VersionedPushdownReader.pushFilters \
        is not DataSourceReader.pushFilters


def test_mr4ver_executor_stream_matches_driver_semantics(spark, tmp_path):
    """option('streamMode', 'executor') routes the append tail through
    the partition-planning DataSourceStreamReader (round-12 verdict
    ask #5): one input partition per appended parquet file, rows read
    on executors as Arrow batches instead of the driver prefetch. The
    offset model and feed semantics are the Simple reader's EXACTLY —
    exactly-once across checkpoint restarts, hive values restored on
    partitioned chains, non-append commits loud-or-skipped."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.pyds import (
        Mr4VersionedStreamPartReader,
        _SnapshotFilePartition,
    )
    from mapreduce_4_spark.sources.versioned import (
        compact,
        read_manifest as _rm,
        write_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("band"))
    write_version(df.filter("k < 10").coalesce(1), tdir, append=True,
                  partition_by=["band"])
    write_version(df.filter("k >= 10 AND k < 20").coalesce(1), tdir,
                  append=True, partition_by=["band"])
    register_versioned_source(spark)

    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("mr4ver")
            .option("streamMode", "executor").load(tdir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.read.parquet(out)
        assert dict(got.dtypes)["band"] == "bigint"  # hive value typed
        return sorted((r["k"], r["band"]) for r in got.collect())

    assert drain() == [(k, k % 2) for k in range(20)]
    write_version(df.filter("k >= 20").coalesce(1), tdir, append=True,
                  partition_by=["band"])
    # same checkpoint: only v3's rows arrive (exactly-once restart)
    assert drain() == [(k, k % 2) for k in range(30)]

    # partition planning is per appended FILE, replayable per window
    m = _rm(tdir, 3)
    from mapreduce_4_spark.sources.versioned import _scan_schema

    r = Mr4VersionedStreamPartReader(tdir, m, _scan_schema(m),
                                     {"startingversion": "1"})
    assert r.initialOffset() == {"v": 0}
    assert r.latestOffset() == {"v": 3}
    p12 = r.partitions({"v": 0}, {"v": 2})
    p3 = r.partitions({"v": 2}, {"v": 3})
    assert all(isinstance(p, _SnapshotFilePartition) for p in p12 + p3)
    assert {p.path for p in p12}.isdisjoint({p.path for p in p3})
    # replanning the same window yields the same files (exactly-once)
    assert [p.path for p in p3] == [
        p.path for p in r.partitions({"v": 2}, {"v": 3})]

    # non-append commit: loud by default, skipped with ignoreChanges
    compact(spark, tdir)
    with pytest.raises(ValueError, match="append feed cannot"):
        r.partitions({"v": 3}, {"v": 4})
    r_skip = Mr4VersionedStreamPartReader(
        tdir, m, _scan_schema(m),
        {"startingversion": "1", "ignorechanges": "true"})
    sentinel = r_skip.partitions({"v": 3}, {"v": 4})
    assert [p.path for p in sentinel] == [None]
    assert list(r_skip.read(sentinel[0])) == []


def test_mr4ver_stream_mode_dispatch(spark, tmp_path):
    """Executor (partition-planning) streaming is the measured DEFAULT
    (the driver-prefetch Simple reader lost at every probed batch
    size — scripts/stream_mode_probe.py); option('streamMode',
    'driver') still routes to the Simple reader via the documented
    NOT_IMPLEMENTED fallback."""
    from pyspark.errors import PySparkNotImplementedError

    from mapreduce_4_spark.sources.pyds import (
        Mr4VersionedStreamPartReader,
        Mr4VersionedStreamReader,
    )

    tdir = str(tmp_path / "t")
    write_version(spark.range(5).withColumnRenamed("id", "k"), tdir,
                  append=True)
    ds = Mr4VersionedDataSource(options={"path": tdir})
    assert isinstance(ds.streamReader(ds.schema()),
                      Mr4VersionedStreamPartReader)
    ds_drv = Mr4VersionedDataSource(
        options={"path": tdir, "streammode": "driver"})
    with pytest.raises(PySparkNotImplementedError):
        ds_drv.streamReader(ds_drv.schema())
    assert isinstance(ds_drv.simpleStreamReader(ds_drv.schema()),
                      Mr4VersionedStreamReader)


def test_mr4ver_columns_option_projects_at_source(spark, tmp_path):
    """option('columns', 'a,b'): the relation schema IS the subset
    (manifest order), so executors build only those Arrow columns —
    the projection story the Python DataSource API's missing
    column-pruning hook would otherwise lose; composes with where
    pruning, evolution null-padding, and unknown names fail loudly."""
    tdir = str(tmp_path / "t")
    _evolved_chain(spark, tdir)  # cols: k, extra (evolved)
    register_versioned_source(spark)

    got = spark.read.format("mr4ver").option("columns", "k").load(tdir)
    assert [f.name for f in got.schema.fields] == ["k"]
    assert got.count() == 20
    # evolved column alone: pre-evolution rows arrive as typed nulls
    ex = spark.read.format("mr4ver").option("columns", "extra").load(tdir)
    assert [f.name for f in ex.schema.fields] == ["extra"]
    assert ex.filter(ex.extra.isNull()).count() == 10
    # composes with where pruning on a projected-IN column
    both = (spark.read.format("mr4ver")
            .option("columns", "k").option("where", "k:100:104")
            .load(tdir))
    assert sorted(r["k"] for r in both.collect()) == list(range(100, 105))
    with pytest.raises(Exception, match="columns option"):
        spark.read.format("mr4ver").option("columns", "nope").load(tdir) \
            .count()


def test_mr4ver_writer_roundtrip_and_commit_contract(spark, tmp_path):
    """df.write.format('mr4ver') (round 12): executors stage parquet
    under _staged/<nonce>, the commit hook CAS-publishes the manifest
    — append chains (evolution + DV + discipline inherited), overwrite
    replaces, COUNT stays metadata-exact from the staged dir_rows, and
    analyze_table backfills the skipping metadata the Spark-less
    commit hook cannot collect."""
    from mapreduce_4_spark.sources.versioned import (
        analyze_table,
        count_version,
        delete_version_dv,
        read_version_stats_pruned,
    )

    tdir = str(tmp_path / "t")
    register_versioned_source(spark)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))

    df.filter("k < 50").write.format("mr4ver").mode("append").save(tdir)
    m = read_manifest(tdir, 1)
    assert m["operation"] == "append-datasource"
    assert m["data_dirs"][0].startswith("_staged/")
    assert m["row_count"] == 50
    assert count_version(None, tdir) == 50  # dir_rows exact

    df.filter("k >= 50").write.format("mr4ver").mode("append").save(tdir)
    assert count_version(None, tdir) == 100
    got = read_version(spark, tdir)
    assert sorted(r["k"] for r in got.collect()) == list(range(100))

    # a DV on the chain survives a later format append (carry rule)
    delete_version_dv(spark, tdir, keys=[7], key="k")
    df.filter("k = 1000").write.format("mr4ver").mode("append").save(tdir)
    assert count_version(None, tdir) == 99
    assert read_version(spark, tdir).filter("k = 7").count() == 0

    # analyze: metadata-only commit gives the staged dirs stats; the
    # pruned read then touches exactly the covering dir
    v, info = analyze_table(spark, tdir, stats_for=["k"], detail=True)
    assert len(info["analyzed"]) == 3
    pr = read_version_stats_pruned(spark, tdir, "k", lower=0, upper=10)
    assert pr.count() == 10  # 7 is DV-dead
    # data inputs (the DV sidecar rides along) come from ONE staged dir
    staged = {f.split("_staged/")[1].split("/")[0]
              for f in pr.inputFiles() if "_staged/" in f}
    assert len(staged) == 1
    # analyze is idempotent: nothing missing -> no commit
    assert analyze_table(spark, tdir, stats_for=["k"]) is None

    # overwrite: a full replacement snapshot
    df.limit(10).write.format("mr4ver").mode("overwrite").save(tdir)
    assert count_version(None, tdir) == 10
    assert read_manifest(
        tdir, 6)["operation"] == "replace-datasource"

    # additive evolution through the writer null-pads on read
    df.withColumn("extra", F.lit(7).cast("bigint")) \
        .write.format("mr4ver").mode("append").save(tdir)
    out = read_version(spark, tdir)
    assert out.columns == ["k", "v", "extra"]
    assert out.filter(F.col("extra").isNull()).count() == 10

    # non-additive drift refuses loudly
    bad = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(Exception, match="append schema"):
        bad.write.format("mr4ver").mode("append").save(tdir)


def test_mr4ver_default_reader_survives_stock_pushdown_conf(
        spark, tmp_path):
    """The r12 regression, pinned: Spark 4.1 refuses to initialize any
    Python DataSource reader whose CLASS defines pushFilters() while
    spark.sql.python.filterPushdown.enabled is false — so the default
    mr4ver reader must not even carry the method, and every batch read
    (plain, where, probe) must work under a stock session where the
    conf is off. r13 advice: registration must NOT flip the
    session-global conf as a side effect (it would activate the
    pushdown path of every other registered Python source) — the
    pruneOnFilters opt-in route requires the caller (or
    session.get_spark) to set the conf explicitly."""
    from mapreduce_4_spark.sources.pyds import Mr4VersionedPushdownReader

    tdir = str(tmp_path / "t")
    _pruned_chain(spark, tdir)
    conf_key = "spark.sql.python.filterPushdown.enabled"
    spark.conf.set(conf_key, "false")  # the driver's stock state
    try:
        register_versioned_source(spark)
        # registration is conf-neutral: the stock state survives it
        assert spark.conf.get(conf_key) == "false"
        assert spark.read.format("mr4ver").load(tdir).count() == 100
        sliced = (spark.read.format("mr4ver")
                  .option("where", "k:30:40").load(tdir))
        assert sorted(r["k"] for r in sliced.collect()) == \
            list(range(30, 41))
        probed = (spark.read.format("mr4ver")
                  .option("probe", "k:5,55").load(tdir))
        assert sorted(r["k"] for r in probed.collect()) == [5, 55]
        # the class split is the structural guarantee behind the above
        from pyspark.sql.datasource import DataSourceReader

        assert Mr4VersionedReader.pushFilters \
            is DataSourceReader.pushFilters
        assert Mr4VersionedPushdownReader.pushFilters \
            is not DataSourceReader.pushFilters
    finally:
        spark.conf.set(conf_key, "true")


def test_mr4ver_pushfilters_pruning_matches_where_option(spark, tmp_path):
    """Verdict r12 ask #5: with the opt-in conf + option, the
    pushFilters route's planning-time dir pruning equals the
    where-option route on the same chain — same surviving partition
    list, same rows end-to-end."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from mapreduce_4_spark.sources.pyds import Mr4VersionedPushdownReader
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    _pruned_chain(spark, tdir)
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r_where = Mr4VersionedReader(tdir, m, schema, {"where": "k:30:40"})
    r_pf = Mr4VersionedPushdownReader(tdir, m, schema,
                                      {"pruneonfilters": "true"})
    r_pf.pushFilters([GreaterThanOrEqual(("k",), 30),
                      LessThanOrEqual(("k",), 40)])
    assert [p.path for p in r_pf.partitions()] == \
        [p.path for p in r_where.partitions()]

    # end-to-end: one load per query mix (the documented readInfo
    # caching contract), rows identical to the where-option route
    pf = (spark.read.format("mr4ver")
          .option("pruneOnFilters", "true").load(tdir)
          .filter("k >= 30 and k <= 40"))
    via_where = (spark.read.format("mr4ver")
                 .option("where", "k:30:40").load(tdir))
    assert sorted(r["k"] for r in pf.collect()) == \
        sorted(r["k"] for r in via_where.collect())


def test_mr4ver_stream_over_datasource_appends_and_analyze(
        spark, tmp_path):
    """ADVICE r12: commits made through the write front door
    (operation 'append-datasource') are appends and must FEED an
    append stream, not kill it; ANALYZE (metadata-only: data_dirs and
    dv unchanged) is an empty batch and must be skipped even WITHOUT
    ignoreChanges."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import analyze_table

    tdir = str(tmp_path / "t")
    df = spark.range(20).select(F.col("id").alias("k"),
                                (F.col("id") % 3).alias("v"))
    register_versioned_source(spark)
    df.filter("k < 10").write.format("mr4ver").mode("append").save(tdir)

    out = str(tmp_path / "out")

    def drain():
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

    assert drain() == list(range(10))
    # v2: ANALYZE (metadata-only) — must contribute nothing, loudly-ok
    assert analyze_table(spark, tdir, stats_for=["k"]) is not None
    # v3: another front-door append — must flow
    df.filter("k >= 10").write.format("mr4ver").mode("append").save(tdir)
    assert drain() == list(range(20))


def test_mr4ver_where_probe_on_decimal_column(spark, tmp_path):
    """ADVICE r12: decimal-typed where/probe bounds parse as exact
    Decimal and the Arrow residual casts the scalar to the column's
    decimal128 type — no kernel error, no precision loss."""
    from pyspark.sql import functions as F

    tdir = str(tmp_path / "t")
    df = spark.range(1, 11).select(
        F.col("id").alias("k"),
        (F.col("id").cast("decimal(12,2)") * 2.5).alias("price"))
    write_version(df.coalesce(1), tdir, append=True)
    register_versioned_source(spark)

    sliced = (spark.read.format("mr4ver")
              .option("where", "price:5.00:10.00").load(tdir))
    assert sorted(r["k"] for r in sliced.collect()) == [2, 3, 4]
    probed = (spark.read.format("mr4ver")
              .option("probe", "price:7.50,25.00").load(tdir))
    assert sorted(r["k"] for r in probed.collect()) == [3, 10]


def test_mr4ver_hive_partition_value_pruning(spark, tmp_path):
    """where/probe conjuncts on PARTITION columns prune hive subdirs at
    planning time, inside chain dirs the manifest could not prove out —
    the front door's twin of Spark's own partition pruning. File-level
    proof on the reader; row-level parity end-to-end."""
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("p"))
    write_version(df, tdir, append=True, partition_by=["p"])
    write_version(
        spark.range(100, 140).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p")),
        tdir, append=True, partition_by=["p"])
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r_all = Mr4VersionedReader(tdir, m, schema, {})
    r_eq = Mr4VersionedReader(tdir, m, schema, {"probe": "p:2"})
    r_rng = Mr4VersionedReader(tdir, m, schema, {"where": "p:0:1"})
    n_all = len(r_all.partitions())
    assert len(r_eq.partitions()) <= n_all // 4 + 1
    assert len(r_rng.partitions()) <= n_all // 2 + 1
    assert all("/p=2/" in p.path for p in r_eq.partitions())
    assert all("/p=0/" in p.path or "/p=1/" in p.path
               for p in r_rng.partitions())

    got = (spark.read.format("mr4ver").option("probe", "p:2").load(tdir))
    want = sorted(r["k"] for r in df.union(
        spark.range(100, 140).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("int").alias("p"))
    ).filter("p = 2").collect())
    assert sorted(r["k"] for r in got.collect()) == want
    rng = (spark.read.format("mr4ver").option("where", "p:0:1").load(tdir))
    assert rng.count() == 40  # half of 80 rows


def test_mr4ver_projection_composes_with_where_probe(spark, tmp_path):
    """`columns` projection + where/probe on NON-projected columns —
    the normal lakehouse shape (SELECT k,s WHERE b BETWEEN 2 AND 3).
    Filter-only columns are read alongside for the exact residual and
    dropped before rows are yielded; the relation schema stays the
    projected subset."""
    tdir = str(tmp_path / "t")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b"),
        F.md5(F.col("id").cast("string")).alias("s"))
    write_version(df.coalesce(1), tdir, append=True)
    register_versioned_source(spark)

    out = (spark.read.format("mr4ver")
           .option("columns", "k,s").option("where", "b:2:3").load(tdir))
    assert out.columns == ["k", "s"]
    want = sorted(r["k"] for r in df.filter("b in (2,3)").collect())
    assert sorted(r["k"] for r in out.collect()) == want

    probed = (spark.read.format("mr4ver")
              .option("columns", "s").option("probe", "k:5,9").load(tdir))
    assert probed.columns == ["s"]
    assert probed.count() == 2
    # unknown filter column still refuses loudly (full-schema check)
    with pytest.raises(Exception, match="nope"):
        (spark.read.format("mr4ver")
         .option("columns", "k").option("where", "nope:1:2")
         .load(tdir).count())


def test_mr4ver_max_versions_per_trigger(spark, tmp_path):
    """maxVersionsPerTrigger — admission control over append backlogs
    (Delta's maxFilesPerTrigger shape, at the format's version
    granularity). EXACT on the driver prefetch reader (read(start)
    knows its base); the executor partition-planning reader REFUSES
    the option loudly — the Python DataSource API gives latestOffset()
    no base/ReadLimit hook, and a stateful cap measurably produced
    backward offsets + duplicate batches on 4.1.2."""
    from mapreduce_4_spark.sources.pyds import (
        Mr4VersionedStreamPartReader,
        Mr4VersionedStreamReader,
    )
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    for i in range(5):  # a 5-version backlog before the stream starts
        write_version(
            spark.range(i * 10, (i + 1) * 10)
            .select(F.col("id").alias("k")).coalesce(1),
            tdir, append=True)
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    # Simple (driver) reader: the cap is exact from any base
    sr = Mr4VersionedStreamReader(tdir, m, schema,
                                  {"maxversionspertrigger": "2"})
    rows, end = sr.read({"v": 0})
    assert end == {"v": 2} and len(list(rows)) == 20
    rows, end = sr.read({"v": 2})
    assert end == {"v": 4}
    # executor reader: loud refusal (no admission-control hook)
    with pytest.raises(ValueError, match="streamMode"):
        Mr4VersionedStreamPartReader(
            tdir, m, schema, {"maxversionspertrigger": "2"})
    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        Mr4VersionedStreamReader(
            tdir, m, schema, {"maxversionspertrigger": "zero"})

    # end-to-end (driver mode): the drain takes ceil(5/2)=3 bounded
    # batches and delivers all 50 rows exactly once
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("mr4ver")
        .option("streamMode", "driver")
        .option("maxVersionsPerTrigger", "2").load(tdir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress
                         if p["numInputRows"] > 0])
    finally:
        q.stop()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == \
        list(range(50))
    assert n_batches >= 3  # the backlog drained bounded, not whole


def test_mr4ver_null_partition_values(spark, tmp_path):
    """NULL partition values (hive's __HIVE_DEFAULT_PARTITION__ dirs)
    read back as true nulls through the front door AND the stream —
    parity with read_version (which always handled them); a where on
    the partition column EXCLUDES null partitions (SQL predicate
    semantics: NULL fails every predicate)."""
    tdir = str(tmp_path / "t")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id") % 3).cast("int").alias("p"))
    write_version(df, tdir, append=True, partition_by=["p"])
    register_versioned_source(spark)

    fd = spark.read.format("mr4ver").load(tdir)
    assert _rows(fd) == _rows(read_version(spark, tdir))
    assert fd.filter("p is null").count() == 4
    w = spark.read.format("mr4ver").option("where", "p:1:2").load(tdir)
    assert w.filter("p is null").count() == 0
    assert w.count() == 6

    write_version(
        spark.range(20, 25).select(F.col("id").alias("k"),
                                   F.lit(None).cast("int").alias("p")),
        tdir, append=True, partition_by=["p"])
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("mr4ver").load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 15 and got.filter("p is null").count() == 9


def test_mr4ver_special_char_partitions_and_empty_probe(spark, tmp_path):
    """URL-hostile string partition values (spaces, '=', '/') round-trip
    through the hive path encoding with read_version parity, probe
    matches the decoded value, and an EMPTY probe list refuses loudly
    instead of silently matching nothing."""
    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x=y"), (3, "c/d"), (4, "plain"), (5, "a b")],
        "k int, p string")
    write_version(df, tdir, append=True, partition_by=["p"])
    register_versioned_source(spark)

    fd = spark.read.format("mr4ver").load(tdir)
    assert _rows(fd) == _rows(read_version(spark, tdir))
    pr = spark.read.format("mr4ver").option("probe", "p:a b").load(tdir)
    assert sorted(r["k"] for r in pr.collect()) == [1, 5]
    with pytest.raises(Exception, match="no values"):
        (spark.read.format("mr4ver").option("probe", "p:")
         .load(tdir).count())


def test_mr4ver_walk_prunes_subtrees_without_descending(spark, tmp_path):
    """Subtree-level hive pruning: the dir walk never DESCENDS into a
    provably-excluded partition dir — at 10^4+ hive partitions the
    enumeration itself is the planning cost. Proven by recording every
    prune callback: nested segments under pruned parents are never
    probed (non-descent), and the yielded files are exactly the
    matching subtree's."""
    from mapreduce_4_spark.sources.pyds import _walk_dir_files

    root = str(tmp_path / "v=000001")
    import os

    for p in range(4):
        for q in range(3):
            d = os.path.join(root, f"p={p}", f"q={q}")
            os.makedirs(d)
            with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
                fh.write(b"x")

    seen = []

    def prune(values):
        seen.append(dict(values))
        return values.get("p") not in (None, "3")

    files = list(_walk_dir_files(root, {"p", "q"}, prune_subdir=prune))
    assert len(files) == 3
    assert all("/p=3/" in f for f, _ in files)
    assert all(v == {"p": "3", "q": str(i)}
               for i, (_, v) in enumerate(sorted(files)))
    # non-descent: q-level values were only ever probed under p=3
    q_probes = [v for v in seen if "q" in v]
    assert q_probes and all(v["p"] == "3" for v in q_probes)


def test_mr4ver_bin_pack_small_files(spark, tmp_path):
    """option('binPackBytes', N): many small files group into ~N-byte
    read partitions (the Delta/Iceberg split-packing knob) — same rows,
    same DV masking, same where residual, ~#groups tasks instead of
    #files tasks (SCALE.md measured 13.9x on a 2048-file chain)."""
    from mapreduce_4_spark.sources.pyds import (
        _SnapshotFileGroupPartition,
    )
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        delete_version_dv,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(400).select(F.col("id").alias("k"))
    write_version(df.repartition(16), tdir, append=True)
    delete_version_dv(spark, tdir, keys=[7, 8], key="k")
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r_files = Mr4VersionedReader(tdir, m, schema, {})
    r_pack = Mr4VersionedReader(tdir, m, schema,
                                {"binpackbytes": str(1 << 20)})
    assert len(r_files.partitions()) == 16
    packed = r_pack.partitions()
    assert len(packed) < 16
    assert all(isinstance(p, _SnapshotFileGroupPartition) for p in packed)
    assert sum(len(p.items) for p in packed) == 16

    got = (spark.read.format("mr4ver")
           .option("binPackBytes", str(1 << 20)).load(tdir))
    want = sorted(k for k in range(400) if k not in (7, 8))
    assert sorted(r["k"] for r in got.collect()) == want  # DV masked
    sliced = (spark.read.format("mr4ver")
              .option("binPackBytes", str(1 << 20))
              .option("where", "k:100:110").load(tdir))
    assert sorted(r["k"] for r in sliced.collect()) == list(range(100, 111))
    with pytest.raises(Exception, match="binPackBytes"):
        (spark.read.format("mr4ver").option("binPackBytes", "-3")
         .load(tdir).count())


def test_mr4ver_stream_bin_pack(spark, tmp_path):
    """binPackBytes on the executor stream reader: a catch-up batch
    over a many-file backlog plans ~bytes/N groups instead of one task
    per file, same rows exactly-once."""
    from mapreduce_4_spark.sources.pyds import (
        Mr4VersionedStreamPartReader,
        _SnapshotFileGroupPartition,
    )
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    for i in range(3):
        write_version(
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k")).repartition(8),
            tdir, append=True)
    register_versioned_source(spark)
    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    pr = Mr4VersionedStreamPartReader(
        tdir, m, schema, {"binpackbytes": str(1 << 20)})
    parts = pr.partitions({"v": 0}, {"v": 3})
    assert all(isinstance(p, _SnapshotFileGroupPartition) for p in parts)
    assert len(parts) < 24 and sum(len(p.items) for p in parts) == 24

    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("mr4ver")
        .option("binPackBytes", str(1 << 20)).load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == \
        list(range(300))


def test_mr4ver_stream_survives_vacuum_horizon(spark, tmp_path):
    """Known-append commits stream WITHOUT reading the parent manifest
    (code-review r13 finding): a stream starting past the vacuum
    horizon — the parent manifest of its first version is GONE — must
    deliver plain appends instead of crashing on FileNotFoundError."""
    import os

    from mapreduce_4_spark.sources.pyds import _append_new_dir
    from mapreduce_4_spark.sources.versioned import _manifest_path

    tdir = str(tmp_path / "t")
    for i in range(4):
        write_version(
            spark.range(i * 10, (i + 1) * 10)
            .select(F.col("id").alias("k")).coalesce(1),
            tdir, append=True)
    # simulate the vacuum horizon: manifests 1-2 are gone
    for v in (1, 2):
        os.remove(_manifest_path(tdir, v))
    # v4's parent (v3) exists; v3's parent (v2) does NOT — both must
    # resolve as appends from the operation name alone
    assert _append_new_dir(tdir, 3, False).endswith("v=000003")
    assert _append_new_dir(tdir, 4, False).endswith("v=000004")
    register_versioned_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("mr4ver")
        .option("startingVersion", "3").load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == \
        list(range(20, 40))


def test_mr4ver_hive_pruning_type_safety(spark, tmp_path):
    """Cross-type hive-value comparisons NEVER prune (code-review r13
    finding): pushFilters delivers native Python types (date, bool)
    while path values parse as strings for non-numeric columns —
    '2024-01-01' != date(2024,1,1) must scan, not silently drop the
    matching partition; range bounds of an incomparable type must not
    crash planning."""
    import datetime

    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from mapreduce_4_spark.sources.pyds import Mr4VersionedPushdownReader
    from mapreduce_4_spark.sources.versioned import (
        _scan_schema,
        latest_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1)), (2, datetime.date(2024, 1, 2)),
         (3, datetime.date(2024, 1, 1))], "k int, d date")
    write_version(df, tdir, append=True, partition_by=["d"])
    register_versioned_source(spark)

    m = read_manifest(tdir, latest_version(tdir))
    schema = _scan_schema(m)
    r = Mr4VersionedPushdownReader(tdir, m, schema,
                                   {"pruneonfilters": "true"})
    n_all = len(Mr4VersionedReader(tdir, m, schema, {}).partitions())
    r.pushFilters([EqualTo(("d",), datetime.date(2024, 1, 1))])
    # incomparable (str path value vs date probe): scan, never prune
    assert len(r.partitions()) == n_all
    r2 = Mr4VersionedPushdownReader(tdir, m, schema,
                                    {"pruneonfilters": "true"})
    r2.pushFilters([GreaterThanOrEqual(("d",),
                                       datetime.date(2024, 1, 2))])
    assert len(r2.partitions()) == n_all  # no TypeError, no prune
    # end-to-end rows stay correct (Spark applies the exact residual)
    out = (spark.read.format("mr4ver")
           .option("pruneOnFilters", "true").load(tdir)
           .filter(F.col("d") == datetime.date(2024, 1, 1)))
    assert sorted(rw["k"] for rw in out.collect()) == [1, 3]


def test_mr4ver_stream_starting_timestamp(spark, tmp_path):
    """startingTimestamp (Delta's shape) on the mr4ver stream: a
    timestamp between commits starts delivery at the NEXT commit, a
    timestamp exactly at a commit's stamp INCLUDES that commit, one
    before the first commit streams everything, and passing both
    starting options refuses loudly."""
    from mapreduce_4_spark.sources.pyds import _starting_offset
    from mapreduce_4_spark.sources.versioned import read_manifest as _rm

    tdir = str(tmp_path / "t")
    for i in range(3):
        write_version(
            spark.range(i * 10, (i + 1) * 10)
            .select(F.col("id").alias("k")).coalesce(1),
            tdir, append=True)
    t1 = _rm(tdir, 1)["committed_at"]
    t2 = _rm(tdir, 2)["committed_at"]

    # between v2 and v3 (epsilon past v2): deliver v3 only
    assert _starting_offset(tdir, {"startingtimestamp":
                                   str(t2 + 1e-4)}) == 2
    # exactly at v2's stamp: v2 is included (at-or-after)
    assert _starting_offset(tdir, {"startingtimestamp": str(t2)}) == 1
    # before the first commit: stream everything
    assert _starting_offset(tdir, {"startingtimestamp":
                                   str(t1 - 100)}) == 0
    with pytest.raises(ValueError, match="not both"):
        _starting_offset(tdir, {"startingtimestamp": str(t2),
                                "startingversion": "1"})

    register_versioned_source(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("mr4ver")
        .option("startingTimestamp", str(t2 + 1e-4)).load(tdir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == \
        list(range(20, 30))


def test_mr4ver_stream_restore_is_not_a_structural_append(spark, tmp_path):
    """r13 advice: a restore whose manifest happens to extend the
    parent's data_dirs by exactly one (here: undoing a whole-dir CoW
    range drop) is re-surfaced OLD data, not an append — the
    structural fallback is gated on the op not being a known
    non-append. Loud by default; NOTHING under ignoreChanges (a
    running stream already emitted those rows at their append, so
    delivering the restore would duplicate them)."""
    from mapreduce_4_spark.sources.pyds import _append_new_dir
    from mapreduce_4_spark.sources.versioned import (
        delete_version_pruned,
        restore_version,
    )

    tdir = str(tmp_path / "t")
    df = spark.range(20).withColumnRenamed("id", "k")
    write_version(df.filter("k < 10").coalesce(1), tdir, append=True,
                  stats_for=["k"])
    write_version(df.filter("k >= 10").coalesce(1), tdir, append=True,
                  stats_for=["k"])
    # v3: range CoW delete that DROPS the v2 dir whole (no rewrite)
    v3, info = delete_version_pruned(spark, tdir, where={"k": (10, 19)},
                                     detail=True)
    assert info == {"dropped": 1, "untouched": 1, "rewritten": 0}
    m3 = read_manifest(tdir, v3)
    # v4: restore to v2 — parent's dirs + exactly ONE re-surfaced dir,
    # dv unchanged: byte-identical to the structural-append shape
    v4 = restore_version(tdir, 2)
    m4 = read_manifest(tdir, v4)
    assert m4["operation"] == "restore"
    assert m4["data_dirs"][:-1] == m3["data_dirs"]
    assert len(m4["data_dirs"]) == len(m3["data_dirs"]) + 1
    assert m4.get("dv") == m3.get("dv")
    with pytest.raises(ValueError, match="append feed cannot"):
        _append_new_dir(tdir, v4, ignore_changes=False)
    assert _append_new_dir(tdir, v4, ignore_changes=True) is None

    # end-to-end: an ignoreChanges stream sees each row exactly once
    register_versioned_source(spark)
    out = str(tmp_path / "out")
    q = (spark.readStream.format("mr4ver")
         .option("ignoreChanges", "true").load(tdir)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(20))  # no v2 re-delivery via the restore


def test_mr4ver_stream_future_append_op_takes_structural_path(
        spark, tmp_path):
    """The other half of the gate's contract: an UNKNOWN
    append-flavored operation name with the structural shape (parent
    dirs + one new dir, dv unchanged) still streams — a future
    append variant cannot silently kill or drop the feed."""
    import json

    from mapreduce_4_spark.sources.pyds import _append_new_dir
    from mapreduce_4_spark.sources.versioned import _manifest_path

    tdir = str(tmp_path / "t")
    write_version(spark.range(5).withColumnRenamed("id", "k"),
                  tdir, append=True)
    write_version(spark.range(5, 9).withColumnRenamed("id", "k"),
                  tdir, append=True)
    # rewrite v2's op to a name this code has never seen
    mp = _manifest_path(tdir, 2)
    m = json.load(open(mp))
    m["operation"] = "append-shiny-new-variant"
    with open(mp, "w") as f:
        json.dump(m, f)
    new_dir = _append_new_dir(tdir, 2, ignore_changes=False)
    assert new_dir is not None
    assert new_dir.endswith(m["data_dirs"][-1])


def _drain_cdc(spark, tdir, tmp_path, sub: str, **opts):
    """Drain the CDC front door to parquet; returns rows as a list of
    tuples in the CDC schema's column order."""
    out = str(tmp_path / f"{sub}_out")
    reader = (spark.readStream.format("mr4ver")
              .option("readChangeFeed", "true").option("key", "k"))
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (reader.load(tdir)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / f"{sub}_ck"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    cols = got.columns
    return cols, [tuple(r[c] for c in cols) for r in got.collect()]


def test_mr4ver_readchangefeed_parity_with_module_feed(spark, tmp_path):
    """r13 verdict ask #3: the format front door serves CDC —
    readStream.format('mr4ver').option('readChangeFeed','true') — and
    its per-version I/U/D rows equal the module feed
    (streaming/cdc.py version_changes == snapshot_diff vs parent) on a
    chain exercising every mutation class: appends (I), CoW update
    (U), DV delete (D), whole-dir CoW range drop (D), restore (I), and
    a content-preserving compact (zero rows on both feeds)."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        compact,
        delete_version_dv,
        delete_version_pruned,
        restore_version,
        update_version_pruned,
    )
    from mapreduce_4_spark.streaming.cdc import version_changes

    tdir = str(tmp_path / "t")

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("val"))

    write_version(rows(0, 10).coalesce(1), tdir, append=True,
                  stats_for=["k"])                       # v1: I x10
    write_version(rows(10, 15).coalesce(1), tdir, append=True,
                  stats_for=["k"])                       # v2: I x5
    update_version_pruned(spark, tdir, {"val": F.col("val") + 1},
                          keys=[3, 12], key="k")         # v3: U x2
    delete_version_dv(spark, tdir, keys=[5], key="k")    # v4: D x1 (DV)
    delete_version_pruned(spark, tdir, where={"k": (10, 14)})  # v5: D x5
    v6 = restore_version(tdir, 4)                        # v6: I x5
    assert v6 == 6
    compact(spark, tdir)                                 # v7: nothing

    register_versioned_source(spark)
    cols, got = _drain_cdc(spark, tdir, tmp_path, "full")
    assert cols[-1] == "_change_version"
    by_v = {}
    for r in got:
        by_v.setdefault(r[-1], []).append(r[:-1])

    # content-preserving commit: zero rows on BOTH feeds
    assert 7 not in by_v
    assert version_changes(spark, tdir, "k", 7).count() == 0

    for v in range(1, 7):
        want_df = version_changes(spark, tdir, "k", v)
        assert want_df.columns == list(cols[:-1])  # op,k,old_val,new_val
        want = sorted(tuple(r) for r in want_df.collect())
        assert sorted(by_v.get(v, [])) == want, f"version {v}"

    # headline shape: the mutation classes actually showed up
    ops = sorted((r[-1], r[0]) for r in got)
    assert {o for _, o in ops} == {"I", "U", "D"}
    assert [o for vv, o in ops if vv == 3] == ["U", "U"]
    assert [o for vv, o in ops if vv == 4] == ["D"]
    assert [o for vv, o in ops if vv == 5] == ["D"] * 5
    assert [o for vv, o in ops if vv == 6] == ["I"] * 5

    # startingVersion works on the CDC feed too
    _, tail = _drain_cdc(spark, tdir, tmp_path, "sv",
                         startingVersion="5")
    assert sorted((r[-1], r[0]) for r in tail) == \
        [(5, "D")] * 5 + [(6, "I")] * 5

    # BATCH CDF (round 14): spark.read + the version window plans one
    # partition per version and returns exactly the streamed rows
    batch = (spark.read.format("mr4ver")
             .option("readChangeFeed", "true").option("key", "k")
             .load(tdir))
    assert batch.columns == list(cols)
    assert sorted(tuple(r[c] for c in cols) for r in batch.collect()) \
        == sorted(got)
    windowed = (spark.read.format("mr4ver")
                .option("readChangeFeed", "true").option("key", "k")
                .option("startingVersion", "5")
                .option("endingVersion", "6").load(tdir))
    assert sorted((r["_change_version"], r["op"])
                  for r in windowed.collect()) == \
        [(5, "D")] * 5 + [(6, "I")] * 5
    # planning: one input partition per non-content-preserving version
    from mapreduce_4_spark.sources.pyds import Mr4VersionedCdcBatchReader
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest as _rm14,
    )

    m = _rm14(tdir, latest_version(tdir))
    r = Mr4VersionedCdcBatchReader(tdir, m, None, {"key": "k"})
    parts = r.partitions()
    assert sorted(p.v for p in parts) == [1, 2, 3, 4, 5, 6]  # v7 = compact


def test_mr4ver_readchangefeed_refusals(spark, tmp_path):
    """The CDC front door's loud-refusal contract: batch reads, the
    executor stream mode (no shuffle hook in the Python DataSource
    API), ignoreChanges, and the append/batch-only options are all
    rejected with pointed errors; a missing key option fails at
    planning."""
    tdir = str(tmp_path / "t")
    write_version(spark.range(5).withColumnRenamed("id", "k"), tdir,
                  append=True)
    register_versioned_source(spark)

    def _cdc_reader(**opts):
        # a FRESH builder per case: DataStreamReader.option() mutates
        # the shared builder, so reusing one would leak options
        r = (spark.readStream.format("mr4ver")
             .option("readChangeFeed", "true"))
        for k, v in opts.items():
            r = r.option(k, v)
        return r

    with pytest.raises(Exception, match="key"):
        _cdc_reader().load(tdir).writeStream.format("noop").start()

    def _expect_stream_error(df, sub, pattern):
        # reader construction is lazy and start() is async: the
        # refusal surfaces when the first micro-batch plans
        q = (df.writeStream.format("noop")
             .option("checkpointLocation", str(tmp_path / sub)).start())
        try:
            with pytest.raises(Exception, match=pattern):
                q.processAllAvailable()
        finally:
            q.stop()

    _expect_stream_error(
        _cdc_reader(key="k", streamMode="executor").load(tdir),
        "ck1", "driver prefetch")
    _expect_stream_error(
        _cdc_reader(key="k", ignoreChanges="true").load(tdir),
        "ck2", "REPRESENTS changes")
    with pytest.raises(Exception, match="version window"):
        (spark.read.format("mr4ver").option("readChangeFeed", "true")
         .option("key", "k").option("startingVersion", "5")
         .load(tdir).count())
    with pytest.raises(Exception, match="does not take version/asOf"):
        (spark.read.format("mr4ver").option("readChangeFeed", "true")
         .option("key", "k").option("version", "1").load(tdir).count())
    _expect_stream_error(
        _cdc_reader(key="k", where="k:0:2").load(tdir),
        "ck3", "filter the feed")


def test_mr4ver_sql_catalog_front_door_contract(spark, tmp_path):
    """r13 verdict ask #4, resolved as a documented loud refusal with
    the working half pinned: Spark 4.1.2's Python DataSource catalog
    integration forwards the stored options to DataSource.schema()
    ONLY — reader() and writer() are constructed with EMPTY options
    (verified here), so a catalog SELECT / INSERT can never learn the
    table dir. What WORKS: CREATE TABLE ... USING mr4ver registers and
    describes (schema() resolves the stored file:-URI path, which
    _local_path normalizes), and df.write.saveAsTable publishes a real
    chain readable via .load(dir). What REFUSES, loudly and pointing
    at this constraint: SELECT from the catalog table."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.pyds import _local_path

    # the URI normalization the catalog path depends on
    assert _local_path("file:/tmp/x y") == "/tmp/x y"
    assert _local_path("file:///tmp/x") == "/tmp/x"
    assert _local_path("/tmp/x") == "/tmp/x"
    assert _local_path(None) is None
    assert _local_path("file://otherhost/x") == "file://otherhost/x"
    assert _local_path("s3://b/x") == "s3://b/x"

    tdir = str(tmp_path / "t")
    write_version(
        spark.range(10).select(F.col("id").alias("k"),
                               (F.col("id") * 2).alias("v")),
        tdir, append=True)
    register_versioned_source(spark)

    spark.sql(f"CREATE TABLE mr4cat_t USING mr4ver "
              f"OPTIONS (path '{tdir}')")
    try:
        # DDL works: the catalog knows the table and its schema
        described = {r["col_name"]: r["data_type"]
                     for r in spark.sql("DESCRIBE mr4cat_t").collect()}
        assert described.get("k") == "bigint"
        assert described.get("v") == "bigint"
        # SELECT refuses with the pointed message (reader gets {})
        with pytest.raises(Exception, match="EMPTY options"):
            spark.sql("SELECT * FROM mr4cat_t").count()
        # INSERT refuses the same way (writer gets {})
        with pytest.raises(Exception, match="EMPTY options"):
            spark.sql("INSERT INTO mr4cat_t VALUES (99, 198)")
    finally:
        spark.sql("DROP TABLE IF EXISTS mr4cat_t")

    # saveAsTable: the WRITE side works (options ride the writer) and
    # publishes a normal chain; the catalog read-back hits the same
    # documented refusal, while load(dir) serves the data
    wdir = str(tmp_path / "w")
    spark.range(5).withColumnRenamed("id", "k") \
        .write.format("mr4ver").option("path", wdir).saveAsTable("mr4cat_w")
    try:
        got = spark.read.format("mr4ver").load(wdir)
        assert sorted(r["k"] for r in got.collect()) == list(range(5))
        with pytest.raises(Exception, match="EMPTY options"):
            spark.table("mr4cat_w").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS mr4cat_w")

    # file:-URI paths work through the plain DataFrame front door too
    uri = spark.read.format("mr4ver").load("file:" + tdir)
    assert uri.count() == 10


def test_mr4ver_batch_cdf_vacuumed_window_is_loud(spark, tmp_path):
    """A batch-CDF window that includes a vacuumed version must fail
    loudly at planning (that history is undeliverable, not empty) —
    while a window starting after the horizon serves normally, with
    the oldest retained version as an all-'I' initial load
    (version_changes' parent-unavailable contract)."""
    from mapreduce_4_spark.sources.versioned import vacuum

    tdir = str(tmp_path / "t")
    for lo in (0, 10, 20):
        # replace (not append): each version's manifest references only
        # its own dir, so vacuum can actually drop old versions' data
        write_version(spark.range(lo, lo + 10).withColumnRenamed(
            "id", "k").coalesce(1), tdir)
    removed = vacuum(tdir, keep_last=2)
    assert removed == [1]
    register_versioned_source(spark)

    base = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k"))
    with pytest.raises(Exception, match="(?i)not published|no such file"):
        base.option("startingVersion", "1").load(tdir).count()
    # post-horizon window works; v2 surfaces as an initial 'I' load
    got = (base.option("startingVersion", "2").load(tdir).collect())
    by_v = {}
    for r in got:
        by_v.setdefault(r["_change_version"], []).append(r)
    assert sorted(r["op"] for r in by_v[2]) == ["I"] * 10
    # v3 is a replace: delta == old snapshot out, new snapshot in
    assert sorted((r["op"], r["k"]) for r in by_v[3]) == \
        [("D", k) for k in range(10, 20)] + [("I", k) for k in range(20, 30)]


def test_mr4ver_cdc_upsert_discipline_scope(spark, tmp_path):
    """The CDC feed's duplicate-key enforcement is DELTA-scoped (r14
    review): a duplicate WITHIN one version's changed rows raises; a
    duplicate spanning a changed and an UNTOUCHED dir is the writer's
    upsert-contract violation, undetectable at O(changed rows) cost —
    the feed emits the delta's 'I' (Delta CDF's trust model) and the
    module feed's full-snapshot join remains the audit tool. Both
    behaviors pinned here so the divergence is a documented contract,
    not a surprise."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.pyds import (
        Mr4VersionedCdcBatchReader,
    )
    from mapreduce_4_spark.sources.versioned import read_manifest

    def rows(ks):
        return spark.createDataFrame(
            [(k, k * 100) for k in ks], "k long, val long")

    # in-delta duplicate: one version whose dir holds k=1 twice
    t1 = str(tmp_path / "t1")
    write_version(rows([0, 1, 1]).coalesce(1), t1, append=True)
    m = read_manifest(t1, 1)
    r = Mr4VersionedCdcBatchReader(t1, m, None, {"key": "k"})
    with pytest.raises(ValueError, match="upsert discipline"):
        for p in r.partitions():
            list(r.read(p))

    # cross-dir duplicate: v1 holds k=1, v2 appends k=1 again — the
    # delta feed emits v2's I(1) without error (documented trust model)
    t2 = str(tmp_path / "t2")
    write_version(rows([0, 1]).coalesce(1), t2, append=True)
    write_version(
        rows([1]).withColumn("val", F.lit(999).cast("long")).coalesce(1),
        t2, append=True)
    m2 = read_manifest(t2, 2)
    r2 = Mr4VersionedCdcBatchReader(t2, m2, None, {"key": "k"})
    # the batch reader yields Arrow RecordBatches (round-14 fast path)
    got = [row for p in r2.partitions() for b in r2.read(p)
           for row in b.to_pylist()]
    assert sorted((r["op"], r["k"], r["_change_version"])
                  for r in got) == [
        ("I", 0, 1), ("I", 1, 1), ("I", 1, 2)]


def test_mr4ver_cdc_stream_refuses_endingversion(spark, tmp_path):
    """r14 review: the STREAM CDC reader must refuse endingVersion
    loudly (a stream has no end) instead of silently ignoring the
    bound a user ported from the batch window."""
    tdir = str(tmp_path / "t")
    write_version(spark.range(5).withColumnRenamed("id", "k"), tdir,
                  append=True)
    register_versioned_source(spark)
    q = (spark.readStream.format("mr4ver")
         .option("readChangeFeed", "true").option("key", "k")
         .option("endingVersion", "1").load(tdir)
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        with pytest.raises(Exception, match="stream has no end"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_mr4ver_batch_cdf_timestamp_windows(spark, tmp_path):
    """Batch CDF takes timestamp windows (Delta's shape):
    startingTimestamp resolves at-or-after (the shared stream rule),
    endingTimestamp resolves to the latest commit at-or-before
    (version_at); version+timestamp mixes on the same bound refuse."""
    from mapreduce_4_spark.sources.versioned import read_manifest as _rm

    tdir = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_version(spark.range(lo, lo + 5).withColumnRenamed(
            "id", "k").coalesce(1), tdir, append=True)
    t2 = _rm(tdir, 2)["committed_at"]
    register_versioned_source(spark)

    def cdc(**opts):
        r = (spark.read.format("mr4ver")
             .option("readChangeFeed", "true").option("key", "k"))
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load(tdir)

    # starting at v2's exact stamp includes v2 (at-or-after)
    got = cdc(startingTimestamp=str(t2)).collect()
    assert sorted(set(r["_change_version"] for r in got)) == [2, 3]
    # epsilon past v2: v3 only
    got = cdc(startingTimestamp=str(t2 + 1e-4)).collect()
    assert sorted(set(r["_change_version"] for r in got)) == [3]
    # ending at v2's stamp: window [1, 2]
    got = cdc(endingTimestamp=str(t2)).collect()
    assert sorted(set(r["_change_version"] for r in got)) == [1, 2]
    # both timestamps
    got = cdc(startingTimestamp=str(t2), endingTimestamp=str(t2)).collect()
    assert sorted(set(r["_change_version"] for r in got)) == [2]
    with pytest.raises(Exception, match="not both"):
        cdc(endingVersion="2", endingTimestamp=str(t2)).count()
    with pytest.raises(Exception, match="not both"):
        cdc(startingVersion="1", startingTimestamp=str(t2)).count()


def test_mr4ver_cdc_merge_commit_mixed_iu(spark, tmp_path):
    """A MERGE (upsert) commit through the CDC front door: ONE version
    carrying both U rows (matched keys whose values changed) and I
    rows (unmatched inserts), while a matched-but-EQUAL update row —
    whose base row moved from the rewritten dir into the merge's new
    dir with identical values — emits nothing. Merge is the one
    mutation class the original parity chain (append/CoW update/DV
    delete/range drop/restore/compact) did not exercise; the delta
    diff needs no merge-specific code (old side = replaced dirs, new
    side = rewritten dirs + the merge dir), pinned here against the
    module feed."""
    from mapreduce_4_spark.sources.versioned import merge_version_pruned
    from mapreduce_4_spark.streaming.cdc import version_changes

    tdir = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(k, k * 100) for k in range(10)], "k long, val long")
    write_version(base.coalesce(1), tdir, append=True, stats_for=["k"])
    # k=3 changes, k=7's update EQUALS its base row (700), 20/21 insert
    updates = spark.createDataFrame(
        [(3, 999), (7, 700), (20, 2000), (21, 2100)], "k long, val long")
    assert merge_version_pruned(spark, tdir, updates, key="k") == 2

    register_versioned_source(spark)
    feed = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k")
            .option("startingVersion", "2").load(tdir))

    def shape(rows):
        return sorted((r["op"], r["k"], r["old_val"], r["new_val"])
                      for r in rows)

    got = shape(feed.collect())
    assert got == [("I", 20, None, 2000), ("I", 21, None, 2100),
                   ("U", 3, 300, 999)]
    assert got == shape(version_changes(spark, tdir, "k", 2).collect())


def test_mr4ver_cdc_schema_evolution_superset(spark, tmp_path):
    """Schema evolution through the CDF, both front doors:

    BATCH reads in the LATEST (superset) schema — Delta batch-CDF's
    contract — so pre-evolution versions null-pad old_/new_ for the
    late column, the evolution append itself is plain I rows carrying
    it, and a post-evolution CoW update diffs on the full superset.

    A RUNNING STREAM keeps the schema pinned at stream start (the
    append stream's documented contract): an evolution append landing
    mid-stream delivers its I rows projected to the pinned columns;
    the new column surfaces after a restart."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import update_version_pruned

    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame(
        [(k, k * 100) for k in range(3)], "k long, val long")
        .coalesce(1), tdir, append=True, stats_for=["k"])     # v1
    register_versioned_source(spark)

    # stream starts BEFORE the evolution: schema pinned at (k, val)
    out = str(tmp_path / "cdc_out")
    q = (spark.readStream.format("mr4ver")
         .option("readChangeFeed", "true").option("key", "k").load(tdir)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "cdc_ck"))
         .start())
    try:
        q.processAllAvailable()                               # drains v1
        write_version(spark.createDataFrame(
            [(10, 1000, "a"), (11, 1100, "b")],
            "k long, val long, tag string").coalesce(1),
            tdir, append=True)                                # v2: evolves
        update_version_pruned(spark, tdir,
                              {"val": F.col("val") + 5},
                              keys=[1], key="k")              # v3: U
        q.processAllAvailable()                               # mid-stream
    finally:
        q.stop()
    streamed = spark.read.parquet(out)
    assert "old_tag" not in streamed.columns                  # pinned
    assert sorted((r["_change_version"], r["op"], r["k"], r["new_val"])
                  for r in streamed.collect()) == [
        (1, "I", 0, 0), (1, "I", 1, 100), (1, "I", 2, 200),
        (2, "I", 10, 1000), (2, "I", 11, 1100),
        (3, "U", 1, 105)]

    # batch CDF after the evolution: superset schema
    feed = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k")
            .load(tdir))
    assert feed.columns == ["op", "k", "old_val", "old_tag",
                            "new_val", "new_tag", "_change_version"]
    rows = {(r["_change_version"], r["op"], r["k"]):
            (r["old_val"], r["old_tag"], r["new_val"], r["new_tag"])
            for r in feed.collect()}
    assert len(rows) == 6
    assert rows[(1, "I", 1)] == (None, None, 100, None)   # pre-evolution
    assert rows[(2, "I", 10)] == (None, None, 1000, "a")  # evolved I
    assert rows[(3, "U", 1)] == (100, None, 105, None)    # superset diff


def test_mr4ver_cdc_delta_shape(spark, tmp_path):
    """option('cdcFormat','delta') re-shapes the feed to Delta CDF's
    rows — the table's own columns as the row image plus _change_type
    / _commit_version / _commit_timestamp, updates emitting a
    preimage+postimage PAIR — on both front doors (batch window and
    stream), equal row sets; the default 'pairs' shape is untouched.
    cdcFormat refuses unknown values and refuses to apply outside
    readChangeFeed."""
    import datetime

    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        delete_version_dv,
        read_manifest,
        update_version_pruned,
    )

    tdir = str(tmp_path / "t")
    write_version(spark.createDataFrame(
        [(k, k * 100) for k in range(5)], "k long, val long")
        .coalesce(1), tdir, append=True, stats_for=["k"])     # v1: I x5
    delete_version_dv(spark, tdir, keys=[2], key="k")         # v2: D x1
    update_version_pruned(spark, tdir, {"val": F.col("val") + 1},
                          keys=[4], key="k")                  # v3: U x1
    register_versioned_source(spark)

    feed = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k")
            .option("cdcFormat", "delta").load(tdir))
    assert feed.columns == ["k", "val", "_change_type",
                            "_commit_version", "_commit_timestamp"]
    batch = sorted((r["_commit_version"], r["_change_type"], r["k"],
                    r["val"]) for r in feed.collect())
    assert batch == [
        (1, "insert", 0, 0), (1, "insert", 1, 100),
        (1, "insert", 2, 200), (1, "insert", 3, 300),
        (1, "insert", 4, 400),
        (2, "delete", 2, 200),
        (3, "update_postimage", 4, 401), (3, "update_preimage", 4, 400),
    ]
    # _commit_timestamp is the manifest's commit stamp (UTC session)
    stamps = {r["_commit_version"]: r["_commit_timestamp"]
              for r in feed.collect()}
    for v, ts in stamps.items():
        want = datetime.datetime.fromtimestamp(
            read_manifest(tdir, v)["committed_at"],
            tz=datetime.timezone.utc).replace(tzinfo=None)
        assert abs((ts - want).total_seconds()) < 1e-3, v

    # stream twin: same row set
    out = str(tmp_path / "out")
    q = (spark.readStream.format("mr4ver")
         .option("readChangeFeed", "true").option("key", "k")
         .option("cdcFormat", "delta").load(tdir)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.read.parquet(out)
    assert sorted((r["_commit_version"], r["_change_type"], r["k"],
                   r["val"]) for r in streamed.collect()) == batch

    # refusals
    with pytest.raises(Exception, match="expected 'pairs'"):
        (spark.read.format("mr4ver").option("readChangeFeed", "true")
         .option("key", "k").option("cdcFormat", "iceberg")
         .load(tdir).count())
    with pytest.raises(Exception, match="needs option..readChangeFeed"):
        (spark.read.format("mr4ver").option("cdcFormat", "delta")
         .load(tdir).count())


def _arrow_batches(rows, schema="k long, val long"):
    import pyarrow as pa
    from pyspark.sql.types import _parse_datatype_string
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(_parse_datatype_string(schema))
    cols = list(zip(*rows)) or [[] for _ in target.names]
    arrays = [pa.array(list(c), type=f.type)
              for c, f in zip(cols, target)]
    return [pa.record_batch(arrays, schema=target)]


def test_mr4ver_stream_writer_end_to_end(spark, tmp_path):
    """df.writeStream.format('mr4ver') — the streaming WRITE front
    door: each micro-batch publishes one append commit (operation
    append-datasource-stream, manifest batch_id = the replay key),
    the chain equals the fed data, and downstream consumers (the
    append stream, the CDC feed) see plain appends."""
    import os

    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    os.makedirs(src)
    register_versioned_source(spark)

    def feed(lo, hi, name):
        spark.range(lo, hi).withColumnRenamed("id", "k").coalesce(1) \
            .write.parquet(f"{src}/{name}")
        q = (spark.readStream.schema("k long").parquet(f"{src}/*")
             .writeStream.format("mr4ver")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start(tbl))
        q.awaitTermination(120)

    feed(0, 10, "f1")
    feed(10, 15, "f2")
    assert latest_version(tbl) == 2
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) \
        == list(range(15))
    m = read_manifest(tbl, 2)
    assert m["operation"] == "append-datasource-stream"
    assert m["batch_id"] == "mr4ver-stream-stream-1"

    # downstream: the append stream tails stream-written commits...
    out = str(tmp_path / "tail")
    q = (spark.readStream.format("mr4ver").load(tbl)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "tailck"))
         .start())
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 15
    # ...and the CDC batch feed diffs them as plain inserts
    feed2 = (spark.read.format("mr4ver")
             .option("readChangeFeed", "true").option("key", "k")
             .load(tbl))
    assert sorted((r["_change_version"], r["op"])
                  for r in feed2.collect()) == \
        [(1, "I")] * 10 + [(2, "I")] * 5


def test_mr4ver_stream_writer_exactly_once_and_modes(spark, tmp_path):
    """The stream writer's commit contract, driven on the writer
    object directly (the sink-commit worker shape — a FRESH writer
    instance per commit):

    - a replayed batchId (crash between sink commit and checkpoint
      advance) drops its staged files and publishes nothing;
    - distinct streamIds namespace the replay key (two streams at the
      same batchId both land);
    - overwrite=True (outputMode complete) publishes a replace commit
      that truncates per batch and is refused by the append stream's
      non-append contract;
    - abort removes staged task dirs."""
    import glob
    import os

    from pyspark.sql.types import _parse_datatype_string

    from mapreduce_4_spark.sources.pyds import Mr4VersionedStreamWriter
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )

    tbl = str(tmp_path / "t")
    schema = _parse_datatype_string("k long, val long")

    def writer(overwrite=False, **opts):
        return Mr4VersionedStreamWriter(tbl, schema, overwrite, opts)

    def run_batch(w, rows, batch_id):
        msg = w.write(iter(_arrow_batches(rows)))
        # commit on a FRESH instance, the runner's actual lifecycle
        w2 = Mr4VersionedStreamWriter(tbl, schema, w.overwrite,
                                      {"streamid": w.stream_id})
        w2.commit([msg], batch_id)

    run_batch(writer(), [(0, 0), (1, 10)], 0)
    assert latest_version(tbl) == 1
    # replay of batch 0: staged files dropped, no new version
    w = writer()
    msg = w.write(iter(_arrow_batches([(0, 0), (1, 10)])))
    writer().commit([msg], 0)
    assert latest_version(tbl) == 1
    assert glob.glob(os.path.join(tbl, "_staged", "t-*")) == []
    assert read_version(spark, tbl).count() == 2

    # a DIFFERENT streamId at the same batchId is not a replay
    w = writer(streamid="other")
    msg = w.write(iter(_arrow_batches([(2, 20)])))
    writer(streamid="other").commit([msg], 0)
    assert latest_version(tbl) == 2
    assert read_manifest(tbl, 2)["batch_id"] == "mr4ver-stream-other-0"
    assert read_version(spark, tbl).count() == 3

    # complete mode: replace commit truncates
    w = writer(overwrite=True)
    msg = w.write(iter(_arrow_batches([(9, 90)])))
    writer(overwrite=True).commit([msg], 1)
    assert read_manifest(tbl, 3)["operation"] == \
        "replace-datasource-stream"
    assert [r["k"] for r in read_version(spark, tbl).collect()] == [9]
    # the append stream refuses the replace (non-append contract)
    register_versioned_source(spark)
    q = (spark.readStream.format("mr4ver").load(tbl)
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        with pytest.raises(Exception):
            q.processAllAvailable()
    finally:
        q.stop()

    # abort drops staged task dirs
    w = writer()
    msg = w.write(iter(_arrow_batches([(5, 50)])))
    assert glob.glob(os.path.join(tbl, "_staged", "t-*"))
    writer().abort([msg], 2)
    assert glob.glob(os.path.join(tbl, "_staged", "t-*")) == []
    assert latest_version(tbl) == 3

    # empty append batch publishes nothing
    w = writer()
    msg = w.write(iter([]))
    writer().commit([msg], 3)
    assert latest_version(tbl) == 3


def test_mr4ver_stream_written_dirs_support_dv_deletes(spark, tmp_path):
    """Regression (round-14 review): stream-written data dirs must fit
    the DV path grammar (_DV_REL_RE admits v=NNNNNN and
    _staged/<hex> only) — an earlier draft named batch dirs
    _staged/b<batchId>-<hex>, whose '-' made regexp_extract return ''
    for every file, corrupting deletion-vector bookkeeping. Pin:
    a DV delete on a stream-written chain drops exactly the requested
    keys, COUNT stays metadata-exact, and the manifest's dir names
    match the grammar."""
    import re

    from pyspark.sql.types import _parse_datatype_string

    from mapreduce_4_spark.sources.pyds import Mr4VersionedStreamWriter
    from mapreduce_4_spark.sources.versioned import (
        _DV_DIR_RE,
        count_version,
        delete_version_dv,
        latest_version,
        read_manifest,
        read_version,
    )

    tbl = str(tmp_path / "t")
    schema = _parse_datatype_string("k long, val long")
    w = Mr4VersionedStreamWriter(tbl, schema, False, {})
    msg = w.write(iter(_arrow_batches([(i, i * 10) for i in range(8)])))
    Mr4VersionedStreamWriter(tbl, schema, False, {}).commit([msg], 0)

    m = read_manifest(tbl, 1)
    for d in m["data_dirs"]:
        assert re.match(_DV_DIR_RE, d), d

    delete_version_dv(spark, tbl, keys=[2, 5], key="k")
    assert latest_version(tbl) == 2
    assert count_version(None, tbl) == 6  # metadata-exact through DV
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) \
        == [0, 1, 3, 4, 6, 7]


def test_mr4ver_stream_writer_orphans_swept_by_vacuum(spark, tmp_path):
    """A crash between a stream task's write() and the batch commit
    leaves an orphan _staged/t-* dir; vacuum's staged-TTL sweep (name-
    agnostic over _staged/* entries) reclaims it, while the PUBLISHED
    stream batch dir stays live — the torn-write story the writer's
    docstring promises."""
    import glob
    import os

    from pyspark.sql.types import _parse_datatype_string

    from mapreduce_4_spark.sources.pyds import Mr4VersionedStreamWriter
    from mapreduce_4_spark.sources.versioned import (
        read_version,
        vacuum,
    )

    tbl = str(tmp_path / "t")
    schema = _parse_datatype_string("k long, val long")
    w = Mr4VersionedStreamWriter(tbl, schema, False, {})
    msg = w.write(iter(_arrow_batches([(0, 0), (1, 10)])))
    Mr4VersionedStreamWriter(tbl, schema, False, {}).commit([msg], 0)
    # simulate a crashed task of the NEXT batch: staged, never committed
    w2 = Mr4VersionedStreamWriter(tbl, schema, False, {})
    w2.write(iter(_arrow_batches([(9, 90)])))
    assert len(glob.glob(os.path.join(tbl, "_staged", "t-*"))) == 1

    vacuum(tbl, keep_last=1, staged_ttl_s=0.0)
    assert glob.glob(os.path.join(tbl, "_staged", "t-*")) == []
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) \
        == [0, 1]  # the published batch dir survived the sweep


def test_mr4ver_round14_composition_stream_write_cdc_mv(spark, tmp_path):
    """Capstone: the round-14 pieces compose. A chain is built through
    the STREAMING write front door (real writeStream, two
    micro-batches), mutated (DV delete + CoW update), and then a
    materialized aggregate is reconstructed purely from the batch CDF
    — fold I.new + U.new - U.old - D.old per group across the whole
    feed — and must equal the direct aggregate of the final snapshot.
    This is the 'CDC feed is complete and consistent' invariant over
    the round's own writers."""
    import os

    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        delete_version_dv,
        read_version,
        update_version_pruned,
    )

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    os.makedirs(src)
    register_versioned_source(spark)
    for i, (lo, hi) in enumerate([(0, 12), (12, 20)]):
        spark.range(lo, hi).select(
            F.col("id").alias("k"),
            (F.col("id") * 7).alias("val")).coalesce(1) \
            .write.parquet(f"{src}/s{i}")
    q = (spark.readStream.schema("k long, val long")
         .option("maxFilesPerTrigger", "1").parquet(f"{src}/s*/*.parquet")
         .writeStream.format("mr4ver")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start(tbl))
    assert q.awaitTermination(120)
    delete_version_dv(spark, tbl, keys=[3, 15], key="k")       # v3
    update_version_pruned(spark, tbl, {"val": F.col("val") + 1000},
                          keys=[4, 13], key="k")               # v4

    feed = (spark.read.format("mr4ver")
            .option("readChangeFeed", "true").option("key", "k")
            .load(tbl))
    mv = (feed
          .withColumn("grp", F.col("k") % 2)
          .withColumn("delta",
                      F.coalesce("new_val", F.lit(0))
                      - F.coalesce("old_val", F.lit(0)))
          .groupBy("grp").agg(F.sum("delta").alias("total"))
          .filter(F.col("total") != 0))
    direct = (read_version(spark, tbl)
              .withColumn("grp", F.col("k") % 2)
              .groupBy("grp").agg(F.sum("val").alias("total")))
    assert sorted(tuple(r) for r in mv.collect()) == \
        sorted(tuple(r) for r in direct.collect())


def test_mr4ver_batch_writer_txn_idempotent(spark, tmp_path):
    """option('txnAppId', a).option('txnVersion', n) on the batch
    write front door (Delta's idempotent-write shape): replaying the
    same (app, version) pair is a published no-op — the foreachBatch
    retry story — while a bumped txnVersion, a different appId, or no
    txn options at all append normally; one option without its pair
    refuses loudly."""
    import glob
    import os

    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )

    tbl = str(tmp_path / "t")
    register_versioned_source(spark)

    def wr(lo, hi, **opts):
        w = (spark.range(lo, hi).withColumnRenamed("id", "k")
             .write.format("mr4ver").mode("append"))
        for k, v in opts.items():
            w = w.option(k, v)
        w.save(tbl)

    wr(0, 5, txnAppId="job", txnVersion="0")
    wr(0, 5, txnAppId="job", txnVersion="0")     # retry: no-op
    assert latest_version(tbl) == 1
    assert read_manifest(tbl, 1)["batch_id"] == "mr4ver-txn-job-0"
    # the retry's own staged dir was dropped: only v1's live data dir
    # remains under _staged/
    assert len(glob.glob(os.path.join(tbl, "_staged", "*"))) == 1
    wr(5, 8, txnAppId="job", txnVersion="1")     # next txn: appends
    wr(8, 9, txnAppId="other", txnVersion="0")   # other app: appends
    wr(9, 10)                                    # no txn: appends
    assert latest_version(tbl) == 4
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) \
        == list(range(10))

    with pytest.raises(Exception, match="PAIR"):
        wr(10, 11, txnAppId="job")


def test_mr4ver_txn_replay_race_closed_in_cas_loop(spark, tmp_path):
    """r14 review: the idempotency guarantee must hold under
    CONCURRENT replays — a zombie original racing its retry. Both
    writers are constructed BEFORE either publishes (so both plan-time
    pre-checks pass, the check-then-act shape), both stage, then both
    commit: exactly one version lands, the loser's staged copy is
    swept, and rows are never doubled. The closure lives INSIDE
    commit_staged_dir's CAS loop (skip_if_batch_id_published), not in
    the pre-check."""
    import glob
    import os

    from pyspark.sql.types import _parse_datatype_string

    from mapreduce_4_spark.sources.pyds import Mr4VersionedWriter
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_version,
    )

    tbl = str(tmp_path / "t")
    schema = _parse_datatype_string("k long, val long")
    opts = {"txnappid": "job", "txnversion": "7", "path": tbl}
    a = Mr4VersionedWriter(tbl, schema, False, opts)
    b = Mr4VersionedWriter(tbl, schema, False, opts)
    assert not a.already_published and not b.already_published
    ma = a.write(iter(_arrow_batches([(0, 0), (1, 10)])))
    mb = b.write(iter(_arrow_batches([(0, 0), (1, 10)])))
    a.commit([ma])
    b.commit([mb])  # raced replay: must publish nothing
    assert latest_version(tbl) == 1
    assert sorted(r["k"] for r in read_version(spark, tbl).collect()) \
        == [0, 1]
    # exactly one staged dir remains: the winner's (now a live data
    # dir); the loser's copy was swept
    assert len(glob.glob(os.path.join(tbl, "_staged", "*"))) == 1

    # clean replay on a FRESH writer: plan-time pre-check fires and
    # write() no-ops (no staged files at all)
    c = Mr4VersionedWriter(tbl, schema, False, opts)
    assert c.already_published
    mc = c.write(iter(_arrow_batches([(0, 0), (1, 10)])))
    c.commit([mc])
    assert latest_version(tbl) == 1
    assert len(glob.glob(os.path.join(tbl, "_staged", "*"))) == 1

    # txnVersion must be an integer (key-ambiguity guard)
    with pytest.raises(ValueError, match="txnVersion must be an int"):
        Mr4VersionedWriter(tbl, schema, False,
                           {"txnappid": "job", "txnversion": "1-0"})


def test_mr4ver_history_stamp_round_trips_as_of(spark, tmp_path):
    """r14 review: history()'s committed_at is the documented AS-OF
    anchor — copying the DISPLAYED stamp back into read_version(as_of)
    must resolve to that very version, not its parent (a truncated or
    rounded-early stamp silently serves the previous snapshot)."""
    from mapreduce_4_spark.sources.versioned import (
        history,
        read_version,
        version_at,
    )

    tdir = str(tmp_path / "t")
    for lo in (0, 10, 20):
        write_version(spark.range(lo, lo + 5).withColumnRenamed(
            "id", "k").coalesce(1), tdir, append=True)
    for row in history(spark, tdir).collect():
        v, stamp = row["version"], row["committed_at"]
        assert version_at(tdir, stamp) == v, (v, stamp)
        assert read_version(spark, tdir, as_of=stamp).count() == 5 * v

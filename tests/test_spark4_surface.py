"""Tests for the Spark-4 surface queries (plans/spark4_surface.py):
recursive-CTE correctness against an independent window-based
algorithm, Python DataSource partition planning, and SQL-macro parity
with the flagship word count.

Oracle parity for all three registered queries is covered by the
blanket replay in tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_recursive_streaks_match_window_sessionization(spark, sf_oracle):
    """The WITH RECURSIVE chain closure must agree with a completely
    different algorithm: gap-flag + running-sum sessionization (the
    events_user_sessions shape) — same streaks, same lengths, same
    roots."""
    from mapreduce_4_spark.plans.spark4_surface import order_streaks_recursive
    from mapreduce_4_spark.sources import load_table

    got = {
        (r["o_custkey"], r["root_orderkey"]): (
            r["streak_len"], r["first_date"], r["last_date"]
        )
        for r in order_streaks_recursive(spark, sf_oracle).collect()
    }

    orders = load_table(spark, sf_oracle, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.withColumn(
        "new_streak",
        F.when(
            F.col("o_orderdate")
            <= F.lag("o_orderdate").over(w) + F.expr("INTERVAL 30 DAY"),
            0,
        ).otherwise(1),
    ).withColumn("sid", F.sum("new_streak").over(w))
    want_rows = (
        flagged.groupBy("o_custkey", "sid")
        .agg(
            F.min(F.struct("o_orderdate", "o_orderkey")).alias("root"),
            F.count(F.lit(1)).alias("streak_len"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .collect()
    )
    want = {
        (r["o_custkey"], r["root"]["o_orderkey"]): (
            r["streak_len"], r["first_date"], r["last_date"]
        )
        for r in want_rows
    }
    assert got == want
    # every order belongs to exactly one streak
    assert sum(v[0] for v in got.values()) == orders.count()


def test_python_datasource_partition_planning(spark):
    """The custom source must honor its partition plan: `parts` input
    partitions, contiguous non-overlapping ranges, exact row count,
    deterministic payloads."""
    from mapreduce_4_spark.sources.pyds import register_synth_source

    register_synth_source(spark)
    df = (
        spark.read.format("synthrows")
        .option("n", 1000).option("parts", 7).load()
    )
    assert df.rdd.getNumPartitions() == 7
    rows = df.collect()
    assert len(rows) == 1000
    ids = sorted(r["id"] for r in rows)
    assert ids == list(range(1000))
    import hashlib

    probe = next(r for r in rows if r["id"] == 123)
    assert probe["bucket"] == 123 % 32
    assert probe["payload"] == hashlib.md5(b"123").hexdigest()


def test_python_datasource_single_row_edge(spark):
    from mapreduce_4_spark.sources.pyds import register_synth_source

    register_synth_source(spark)
    df = (
        spark.read.format("synthrows")
        .option("n", 1).option("parts", 4).load()
    )
    assert [r["id"] for r in df.collect()] == [0]


def test_sql_udf_wordcount_equals_flagship(spark, sf_oracle):
    """The SQL-macro mechanism must produce exactly the flagship
    DataFrame word count's top-20 (same clean regex, different plugin
    surface — the O11 equivalence the reference's dlopen plugins
    promise)."""
    from mapreduce_4_spark.plans.spark4_surface import sql_udf_wordcount
    from mapreduce_4_spark.plans.wordcount import wordcount_topk

    got = [tuple(r) for r in sql_udf_wordcount(spark, sf_oracle).collect()]
    want = [tuple(r) for r in wordcount_topk(spark, sf_oracle).collect()]
    assert got == want


def test_sql_udf_inlines_without_python_boundary(spark, sf_oracle):
    """The macro body must inline into the plan: no BatchEvalPython /
    ArrowEvalPython stage (the property that distinguishes it from the
    five imperative UDF mechanisms)."""
    from mapreduce_4_spark.plans.spark4_surface import sql_udf_wordcount

    plan = (
        sql_udf_wordcount(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """The streaming reader must deliver exactly the batch reader's rows
    — same ids, same payloads — once drained, including across multiple
    micro-batches (n=600, batch=130 -> 5 batches)."""
    from mapreduce_4_spark.sources.pyds import register_synth_source

    register_synth_source(spark)
    stream = (
        spark.readStream.format("synthrows")
        .option("n", 600).option("batch", 130).load()
    )
    # The simple stream reader does not support Trigger.AvailableNow
    # (Spark falls back to ONE batch); drain with the default trigger —
    # processAllAvailable returns once read() reports an unchanged
    # offset with no rows.
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["id"], r["bucket"], r["payload"])
        for r in spark.sql("SELECT * FROM synth_stream_sink").collect()
    }
    batch = (
        spark.read.format("synthrows")
        .option("n", 600).option("parts", 3).load()
    )
    want = {(r["id"], r["bucket"], r["payload"]) for r in batch.collect()}
    assert got == want and len(got) == 600


def test_python_datasource_stream_offset_replay(spark):
    """readBetweenOffsets must regenerate any slice bit-identically —
    the checkpoint-recovery contract of the simple stream reader."""
    from mapreduce_4_spark.sources.pyds import SynthRowsStreamReader

    r = SynthRowsStreamReader({"n": "50", "batch": "20"})
    first, nxt = r.read(r.initialOffset())
    first = list(first)
    assert nxt == {"next": 20} and len(first) == 20
    replay = list(r.readBetweenOffsets({"next": 0}, {"next": 20}))
    assert replay == first
    # final batch clamps at n
    tail, end = r.read({"next": 40})
    assert end == {"next": 50} and len(list(tail)) == 10
    # drained source yields empty batches at a fixed offset
    empty, same = r.read({"next": 50})
    assert same == {"next": 50} and list(empty) == []


def test_map_in_arrow_wordcount_equals_flagship(spark, sf_oracle):
    """Arrow-combiner word count == the declarative flagship, and the
    plan carries a real MapInArrow node feeding the final aggregate."""
    from mapreduce_4_spark.plans.udf_surface import map_in_arrow_wordcount
    from mapreduce_4_spark.plans.wordcount import wordcount_global

    df = map_in_arrow_wordcount(spark, sf_oracle)
    got = {(r["word"], r["cnt"]) for r in df.collect()}
    want = {(r["word"], r["cnt"]) for r in wordcount_global(spark, sf_oracle).collect()}
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan


def test_rcte_prefix_cache_is_bounded_and_releasable(spark, sf_oracle):
    """The persisted recursive-CTE prefix must not grow the storage
    footprint across repeated builds (a full sweep / long notebook
    session), and clear_rcte_cache() must release it entirely."""
    from mapreduce_4_spark.plans import spark4_surface as s4

    def rdd_ids() -> set:
        # track id SETS, not counts: unrelated suites' cached RDDs are
        # unpersisted asynchronously (ContextCleaner) mid-test, so the
        # global count races — only the ids THIS test creates are a
        # stable signal (round-10 verdict ask #1b; the count form
        # failed `34 > 35` in full-suite runs, green alone)
        return {i.id() for i in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    s4.clear_rcte_cache()
    base_ids = rdd_ids()
    s4.order_streaks_recursive(spark, sf_oracle).count()
    ours = rdd_ids() - base_ids
    assert ours  # the two prefix tables materialized
    for _ in range(3):
        s4.order_streaks_recursive(spark, sf_oracle).count()
        assert rdd_ids() - base_ids == ours  # reused, not re-persisted
    assert len(s4._RCTE_CACHE) == 1          # one entry per (app, sf)
    s4.clear_rcte_cache()
    assert not (rdd_ids() & ours)            # fully released
    assert s4._RCTE_CACHE == {}


def test_rcte_prefix_cache_survives_session_churn(spark, sf_oracle):
    """A newSession()-per-query app (the r9-advice churn scenario) must
    neither grow the cache dict nor the persisted-RDD footprint: sibling
    sessions share the one app-scoped entry through its global temp
    views (per-session entries would alias one shared CacheManager slot
    and an eviction of a 'dead' sibling would evict live data)."""
    import gc

    from mapreduce_4_spark.plans import spark4_surface as s4

    def rdd_ids() -> set:
        # track id SETS, not counts: unrelated tests' cached RDDs can be
        # unpersisted asynchronously (ContextCleaner) mid-test, so only
        # the ids THIS test creates are a stable signal
        return {i.id() for i in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()}

    s4.clear_rcte_cache()
    base_ids = rdd_ids()
    want = s4.order_streaks_recursive(spark, sf_oracle).count()
    ours = rdd_ids() - base_ids
    assert ours  # the two prefix tables materialized
    for _ in range(3):
        sib = spark.newSession()
        assert s4.order_streaks_recursive(sib, sf_oracle).count() == want
        del sib
        gc.collect()
        # siblings share the one entry: nothing new persisted
        assert rdd_ids() - base_ids == ours
    assert len(s4._RCTE_CACHE) == 1
    # the original session still reads the shared persisted prefix
    assert s4.order_streaks_recursive(spark, sf_oracle).count() == want
    assert rdd_ids() - base_ids == ours
    s4.clear_rcte_cache()
    assert not (rdd_ids() & ours)  # our entries fully released

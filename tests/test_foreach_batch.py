"""foreachBatch exactly-once semantics: idempotent redelivery, restart
resume, and single-scan multi-sink fan-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_4_spark.sources import load_table
from mapreduce_4_spark.streaming import (
    events_stream,
    fanout_writer,
    idempotent_parquet_writer,
    run_foreach_batch,
)


def _stream(spark, sf_dir):
    return events_stream(spark, sf_dir).select("event_id", "user_id", "value")


def test_foreach_batch_drains_everything(spark, sf_smoke, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_foreach_batch(_stream(spark, sf_smoke), idempotent_parquet_writer(out), ckpt)
    got = spark.read.parquet(out)
    n = load_table(spark, sf_smoke, "events").count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_redelivered_batch_is_idempotent(spark, sf_smoke, tmp_path):
    """Crash-between-sink-and-checkpoint redelivery: calling the writer
    again with the same batch_id must overwrite, not append."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_foreach_batch(_stream(spark, sf_smoke), idempotent_parquet_writer(out), ckpt)
    before = spark.read.parquet(out)
    n = before.count()
    batch_ids = [r["batch_id"] for r in before.select("batch_id").distinct().collect()]

    # replay every delivered batch by hand with identical data
    writer = idempotent_parquet_writer(out)
    replay_data = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "value"
    )
    for bid in batch_ids:
        writer(replay_data, bid)

    after = spark.read.parquet(out)
    assert after.count() == n
    assert after.select("event_id").distinct().count() == n


def test_restart_with_checkpoint_processes_nothing_new(spark, sf_smoke, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_foreach_batch(_stream(spark, sf_smoke), idempotent_parquet_writer(out), ckpt)
    n = spark.read.parquet(out).count()
    run_foreach_batch(_stream(spark, sf_smoke), idempotent_parquet_writer(out), ckpt)
    assert spark.read.parquet(out).count() == n


def test_fanout_two_sinks_consistent(spark, sf_smoke, tmp_path):
    raw, agg, ckpt = (
        str(tmp_path / "raw"),
        str(tmp_path / "agg"),
        str(tmp_path / "ckpt"),
    )
    run_foreach_batch(
        _stream(spark, sf_smoke),
        fanout_writer(raw, agg, lambda df: df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"))),
        ckpt,
    )
    raw_df = spark.read.parquet(raw)
    agg_df = spark.read.parquet(agg)
    n = load_table(spark, sf_smoke, "events").count()
    assert raw_df.count() == n
    # fan-out aggregate must reconcile with the raw sink, batch by batch
    raw_counts = {
        (r["user_id"], r["batch_id"]): r["n"]
        for r in raw_df.groupBy("user_id", "batch_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    agg_counts = {
        (r["user_id"], r["batch_id"]): r["n_events"] for r in agg_df.collect()
    }
    assert raw_counts == agg_counts


def test_versioned_upsert_sink_exactly_once_with_time_travel(spark, sf_smoke, tmp_path):
    """Stream micro-batches merge into a versioned table: final snapshot
    equals the batch-twin aggregate, redelivery is a no-op, and history
    keeps one version per real batch (time travel over ingestion)."""
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )
    from mapreduce_4_spark.streaming import versioned_upsert_sink

    tdir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # per-user running totals, one row per user per batch (update mode)
    agg = (
        _stream(spark, sf_smoke)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.foreachBatch(versioned_upsert_sink(tdir, "user_id"))
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    v = latest_version(tdir)
    assert v is not None and v >= 1
    expected = {
        (r["user_id"], r["n_events"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")).collect()
    }
    got = {
        (r["user_id"], r["n_events"])
        for r in read_version(spark, tdir).collect()
    }
    assert got == expected

    # redeliver the last published batch by hand with GARBAGE data: the
    # batch_id is in history, so the table must not move
    last_bid = read_manifest(tdir, v)["batch_id"]
    garbage = spark.createDataFrame([(999999, -1)], ["user_id", "n_events"])
    versioned_upsert_sink(tdir, "user_id")(garbage, last_bid)
    assert latest_version(tdir) == v
    assert {
        (r["user_id"], r["n_events"])
        for r in read_version(spark, tdir).collect()
    } == expected

    # a genuinely new batch advances the table and history remembers both
    versioned_upsert_sink(tdir, "user_id")(garbage, last_bid + 1)
    assert latest_version(tdir) == v + 1
    assert (999999, -1) in {
        (r["user_id"], r["n_events"])
        for r in read_version(spark, tdir).collect()
    }
    # time travel: the pre-garbage snapshot is intact
    assert {
        (r["user_id"], r["n_events"])
        for r in read_version(spark, tdir, version=v).collect()
    } == expected


def test_versioned_upsert_sink_preserves_bucketed_layout(
    spark, sf_smoke, tmp_path
):
    """A streaming upsert into a bucketed versioned table must republish
    WITH the bucket spec (regression: the sink dropped it, so the first
    micro-batch silently cost the table its exchange-free joins)."""
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
        write_version,
    )
    from mapreduce_4_spark.streaming import versioned_upsert_sink

    tdir = str(tmp_path / "table")
    base = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    write_version(base, tdir, bucket_by=["user_id"], n_buckets=4)

    batch = spark.createDataFrame([(1, 123), (999999, 7)], ["user_id", "n_events"])
    versioned_upsert_sink(tdir, "user_id")(batch, 0)
    v = latest_version(tdir)
    assert v == 2
    m = read_manifest(tdir, v)
    assert m["bucket_by"] == ["user_id"] and m["n_buckets"] == 4, m

    # the planner still sees the bucketing: groupBy on the bucket key
    # over the post-upsert snapshot needs no Exchange
    got = read_version(spark, tdir)
    plan = (
        got.groupBy("user_id").count()
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    rows = {(r["user_id"], r["n_events"]) for r in got.collect()}
    assert (999999, 7) in rows and (1, 123) in rows


def test_versioned_upsert_sink_streaming_expectations(spark, sf_smoke,
                                                      tmp_path):
    """Streaming expectations, drop mode: arriving rows violating a rule
    never reach the table, and each version's manifest records the
    per-rule violation counts for that batch (the DLT audit trail)."""
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )
    from mapreduce_4_spark.streaming import versioned_upsert_sink

    tdir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    # poison the stream: every 5th event gets a negative value
    poisoned = _stream(spark, sf_smoke).withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, -1.0).otherwise(F.col("value")),
    ).select("event_id", "user_id", "value")
    rules = {"negative_value": F.col("value") < 0}
    q = (
        poisoned.writeStream.foreachBatch(
            versioned_upsert_sink(tdir, "event_id", expectations=rules)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = read_version(spark, tdir)
    assert got.filter(F.col("value") < 0).count() == 0
    from mapreduce_4_spark.sources import load_table

    ev = load_table(spark, sf_smoke, "events")
    n_bad = ev.filter(F.col("event_id") % 5 == 0).count()
    assert got.count() == ev.count() - n_bad
    # the audit trail: summed over versions, counts equal the poison
    total = sum(
        read_manifest(tdir, v).get("expectations", {}).get(
            "negative_value", 0
        )
        for v in range(1, latest_version(tdir) + 1)
    )
    assert total == n_bad


def test_versioned_merge_sink_cow_exactly_once(spark, sf_smoke, tmp_path):
    """The copy-on-write streaming merge sink: final snapshot equals the
    batch twin, an insert-only batch carries every prior dir BY
    REFERENCE (no rewrite), and a redelivered batch_id is a no-op."""
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
        read_version,
    )
    from mapreduce_4_spark.streaming import versioned_merge_sink

    tdir = str(tmp_path / "table")
    sink = versioned_merge_sink(tdir, "user_id")
    # three hand-driven micro-batches (the redelivery-test pattern):
    # seed, disjoint inserts, then updates touching only the seed
    seed = spark.createDataFrame(
        [(u, u * 10) for u in range(100)], ["user_id", "score"])
    inserts = spark.createDataFrame(
        [(u, u * 10) for u in range(1000, 1050)], ["user_id", "score"])
    updates = spark.createDataFrame(
        [(7, -7), (13, -13)], ["user_id", "score"])
    sink(seed, 0)
    v1_dirs = read_manifest(tdir, latest_version(tdir))["data_dirs"]
    sink(inserts, 1)
    m2 = read_manifest(tdir, latest_version(tdir))
    # insert-only batch: the seed dir(s) carried by reference
    assert set(v1_dirs or ["v=000001"]) <= set(m2["data_dirs"])
    assert m2["batch_id"] == 1
    sink(updates, 2)
    got = {(r["user_id"], r["score"])
           for r in read_version(spark, tdir).collect()}
    expected = {(u, u * 10) for u in range(100) if u not in (7, 13)}
    expected |= {(u, u * 10) for u in range(1000, 1050)}
    expected |= {(7, -7), (13, -13)}
    assert got == expected
    # redelivery with garbage: batch_id 2 already published — no move
    v = latest_version(tdir)
    garbage = spark.createDataFrame([(999999, -1)], ["user_id", "score"])
    sink(garbage, 2)
    assert latest_version(tdir) == v
    assert {(r["user_id"], r["score"])
            for r in read_version(spark, tdir).collect()} == expected


def test_versioned_merge_sink_through_real_stream(spark, sf_smoke, tmp_path):
    """End-to-end through foreachBatch: the merged table equals the
    batch-twin aggregate after an availableNow drain."""
    from mapreduce_4_spark.sources.versioned import read_version
    from mapreduce_4_spark.streaming import versioned_merge_sink

    tdir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    agg = (
        _stream(spark, sf_smoke)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.foreachBatch(versioned_merge_sink(tdir, "user_id"))
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    expected = {
        (r["user_id"], r["n_events"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")).collect()
    }
    got = {(r["user_id"], r["n_events"])
           for r in read_version(spark, tdir).collect()}
    assert got == expected


def test_versioned_merge_sink_wide_batch_degrades_not_dies(
        spark, tmp_path):
    """A micro-batch wider than max_keys (catch-up burst, backfill
    replay) must fall back to the join-classified merge — the stream
    degrades to a slower commit instead of dying on the loud
    max_keys refusal; exactly-once replay protection still holds."""
    from mapreduce_4_spark.sources.versioned import (
        count_version,
        latest_version,
        read_manifest,
        read_version,
    )
    from mapreduce_4_spark.streaming import versioned_merge_sink

    tdir = str(tmp_path / "table")
    sink = versioned_merge_sink(tdir, "user_id", max_keys=10)
    seed = spark.createDataFrame(
        [(u, u * 10) for u in range(50)], ["user_id", "score"])
    sink(seed, 0)
    # 30 keys > max_keys=10: the pruned path refuses, the joined path
    # commits (operation records the route)
    wide = spark.createDataFrame(
        [(u, -u) for u in range(20, 50)], ["user_id", "score"])
    sink(wide, 1)
    m = read_manifest(tdir, latest_version(tdir))
    assert m["operation"] == "merge-cow-joined"
    assert m["batch_id"] == 1
    got = {(r["user_id"], r["score"])
           for r in read_version(spark, tdir).collect()}
    want = {(u, u * 10) for u in range(20)} | {(u, -u)
                                               for u in range(20, 50)}
    assert got == want
    assert count_version(None, tdir) == 50
    # redelivery of the wide batch is still a no-op
    v = latest_version(tdir)
    sink(wide, 1)
    assert latest_version(tdir) == v

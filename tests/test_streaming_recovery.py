"""Streaming depth: stream-stream LEFT OUTER and FULL OUTER interval
joins (NULL rows emitted only after the watermark proves no match can
arrive), applyInPandasWithState state survival across a checkpoint
restart — on both the default HDFS-backed state store and the RocksDB
provider a large deployment would run — and watermark-scoped
dropDuplicates under at-least-once redelivery."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def _write_events(path: str, rows, mtime: float) -> None:
    # flat parquet FILES via pyarrow — the file stream source lists plain
    # files, not Spark's directory-shaped output
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "user_id": pd.Series([r[1] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[2] for r in rows]),
            "value": pd.Series([r[3] for r in rows], dtype="float64"),
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    table = table.set_column(
        2, "ts", table.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    from mapreduce_4_spark.streaming import stream_click_purchase_left_join

    clicks_dir, purch_dir = tmp_path / "clicks", tmp_path / "purchases"
    clicks_dir.mkdir()
    purch_dir.mkdir()
    t0 = time.time() - 1000
    # era 1: user 1's click is purchased within the hour; user 2's never
    _write_events(str(clicks_dir / "c1.parquet"),
                  [(10, 1, "2024-06-01 10:00:00", 1.0),
                   (20, 2, "2024-06-01 10:00:00", 1.0)], t0)
    _write_events(str(purch_dir / "p1.parquet"),
                  [(11, 1, "2024-06-01 10:30:00", 5.0)], t0)
    # era 2, ten hours later: advances the watermark far past era 1 so
    # user 2's unmatched click MUST surface; user 3 matches instantly
    _write_events(str(clicks_dir / "c2.parquet"),
                  [(30, 3, "2024-06-01 20:00:00", 1.0)], t0 + 100)
    _write_events(str(purch_dir / "p2.parquet"),
                  [(31, 3, "2024-06-01 20:00:00", 7.0)], t0 + 100)

    def side(d):
        return (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
            .select("event_id", "user_id", "ts")
        )

    joined = stream_click_purchase_left_join(
        side(clicks_dir), side(purch_dir), watermark="2 hours"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_left_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.table("t_left_outer").collect()
    }
    assert (1, 10, 11) in got, got          # matched within the hour
    assert (3, 30, 31) in got, got          # same-instant purchase matches
    assert (2, 20, None) in got, got        # unmatched click surfaces w/ NULLs
    # no speculative NULL for clicks that DID match
    assert (1, 10, None) not in got and (3, 30, None) not in got, got
    assert len(got) == 3, got


def test_stream_stream_full_outer_emits_both_unmatched_sides(
    spark, tmp_path
):
    """Full-outer interval join: unmatched CLICKS and unmatched
    PURCHASES must both surface with NULLs once the watermark proves no
    counterpart can arrive — and matched rows exactly once."""
    from mapreduce_4_spark.streaming import (
        stream_click_purchase_full_outer_join,
    )

    clicks_dir, purch_dir = tmp_path / "fo_clicks", tmp_path / "fo_purch"
    clicks_dir.mkdir()
    purch_dir.mkdir()
    t0 = time.time() - 1000
    # era 1: user 1 matches; user 2's click never purchased; user 4's
    # purchase has no click at all
    _write_events(str(clicks_dir / "c1.parquet"),
                  [(10, 1, "2024-06-01 10:00:00", 1.0),
                   (20, 2, "2024-06-01 10:00:00", 1.0)], t0)
    _write_events(str(purch_dir / "p1.parquet"),
                  [(11, 1, "2024-06-01 10:30:00", 5.0),
                   (41, 4, "2024-06-01 10:15:00", 9.0)], t0)
    # era 2 advances both watermarks far past era 1
    _write_events(str(clicks_dir / "c2.parquet"),
                  [(30, 3, "2024-06-01 20:00:00", 1.0)], t0 + 100)
    _write_events(str(purch_dir / "p2.parquet"),
                  [(31, 3, "2024-06-01 20:00:00", 7.0)], t0 + 100)

    def side(d):
        return (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
            .select("event_id", "user_id", "ts")
        )

    joined = stream_click_purchase_full_outer_join(
        side(clicks_dir), side(purch_dir), watermark="2 hours"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_full_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in spark.table("t_full_outer").collect()
    }
    assert (1, 10, 11) in got, got          # matched
    assert (3, 30, 31) in got, got          # matched same-instant
    assert (2, 20, None) in got, got        # click-side unmatched
    assert (4, None, 41) in got, got        # purchase-side unmatched
    # no speculative NULL twin for rows that DID match
    assert (1, 10, None) not in got and (1, None, 11) not in got, got
    assert len(got) == 4, got


def _run_user_totals(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    from mapreduce_4_spark.streaming.stateful import stream_user_totals

    stream = spark.readStream.schema(_SCHEMA).parquet(src_dir)
    totals = stream_user_totals(stream)

    def sink(batch_df, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(out_dir)
        )

    q = (
        totals.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_apply_in_pandas_with_state_survives_restart(spark, tmp_path):
    """Kill the query between files, restart from the checkpoint: the
    second run reads ONLY the new file (source checkpoint) yet reports
    cumulative totals — possible only if the state store recovered."""
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = time.time() - 1000
    _write_events(str(src / "f1.parquet"),
                  [(1, 7, "2024-06-01 10:00:00", 1.25),
                   (2, 7, "2024-06-01 10:10:00", 2.50),
                   (3, 8, "2024-06-01 10:20:00", 4.00)], t0)
    _run_user_totals(spark, str(src), out, ckpt)

    # stop #1 happened (availableNow drained f1 and terminated); new data
    # lands, restart against the same checkpoint
    _write_events(str(src / "f2.parquet"),
                  [(4, 7, "2024-06-01 11:00:00", 3.25),
                   (5, 9, "2024-06-01 11:10:00", 0.75)], t0 + 100)
    _run_user_totals(spark, str(src), out, ckpt)

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        key = r["user_id"]
        if key not in latest or r["batch_id"] > latest[key]["batch_id"]:
            latest[key] = r
    # user 7: 2 events in run 1 + 1 in run 2 => cumulative count 3,
    # cents 125+250+325 — run 2 saw only f2, so 3/700 proves recovery
    assert (latest[7]["total_events"], latest[7]["total_value_cents"]) == (3, 700)
    assert (latest[8]["total_events"], latest[8]["total_value_cents"]) == (1, 400)
    assert (latest[9]["total_events"], latest[9]["total_value_cents"]) == (1, 75)
    # run-2 batches must not have reprocessed user 8 (no new data for it)
    run2_batches = {r["batch_id"] for r in rows if r["user_id"] == 9}
    assert all(
        r["batch_id"] not in run2_batches for r in rows if r["user_id"] == 8
    ), rows


def test_recovery_with_rocksdb_state_store(spark, tmp_path):
    """The same checkpoint-restart recovery contract, but with the
    RocksDB state store provider — the provider a 100 TB deployment
    would run (state spills off-heap to local SST files instead of
    living in executor heap). Provider choice is fixed per checkpoint
    at first start, so both runs set it before the query starts."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    src = tmp_path / "rdb_src"
    src.mkdir()
    out, ckpt = str(tmp_path / "rdb_out"), str(tmp_path / "rdb_ckpt")
    t0 = time.time() - 1000
    try:
        spark.conf.set(key, provider)
        _write_events(str(src / "f1.parquet"),
                      [(1, 7, "2024-06-01 10:00:00", 1.25),
                       (2, 7, "2024-06-01 10:10:00", 2.50),
                       (3, 8, "2024-06-01 10:20:00", 4.00)], t0)
        _run_user_totals(spark, str(src), out, ckpt)
        _write_events(str(src / "f2.parquet"),
                      [(4, 7, "2024-06-01 11:00:00", 3.25),
                       (5, 9, "2024-06-01 11:10:00", 0.75)], t0 + 100)
        _run_user_totals(spark, str(src), out, ckpt)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    latest = {}
    for r in spark.read.parquet(out).collect():
        k = r["user_id"]
        if k not in latest or r["batch_id"] > latest[k]["batch_id"]:
            latest[k] = r
    # cumulative totals across the restart prove RocksDB state recovered
    assert (latest[7]["total_events"], latest[7]["total_value_cents"]) == (3, 700)
    assert (latest[8]["total_events"], latest[8]["total_value_cents"]) == (1, 400)
    assert (latest[9]["total_events"], latest[9]["total_value_cents"]) == (1, 75)


def test_drop_duplicates_within_watermark_dedups_redelivery(spark, tmp_path):
    """The same event_id redelivered in a later batch with a slightly
    different timestamp (at-least-once source behavior) must be emitted
    once; state for old keys is watermark-evicted."""
    from mapreduce_4_spark.streaming.events_stream import (
        stream_dedup_within_watermark,
    )

    src = tmp_path / "dd_src"
    src.mkdir()
    t0 = time.time() - 1000
    _write_events(str(src / "f1.parquet"),
                  [(1, 7, "2024-06-01 10:00:00", 1.0),
                   (2, 8, "2024-06-01 10:05:00", 1.0)], t0)
    # redelivery of event 1 with a skewed timestamp + one new event
    _write_events(str(src / "f2.parquet"),
                  [(1, 7, "2024-06-01 10:00:03", 1.0),
                   (3, 9, "2024-06-01 10:10:00", 1.0)], t0 + 100)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_dedup_within_watermark(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_dd_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["event_id"], str(r["ts"]))
        for r in spark.table("t_dd_wm").collect()
    )
    assert [e for e, _ in got] == [1, 2, 3], got
    # the kept copy of event 1 is the FIRST arrival
    assert got[0][1] == "2024-06-01 10:00:00", got

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

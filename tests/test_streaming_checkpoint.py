"""Checkpointed file-sink streaming: exactly-once across restarts.

A real deployment writes streams to object storage with a checkpoint;
restarting must not reprocess or duplicate. availableNow + a shared
checkpoint dir reproduces that contract locally.
"""

from __future__ import annotations

from mapreduce_4_spark.streaming import events_stream


def _run_to_parquet(spark, sf_dir, out, ckpt):
    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_with_checkpoint_is_exactly_once(spark, sf_smoke, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_to_parquet(spark, sf_smoke, out, ckpt)
    first = spark.read.parquet(out)
    n_events = first.count()
    from mapreduce_4_spark.sources import load_table

    assert n_events == load_table(spark, sf_smoke, "events").count()

    # restart against the same checkpoint: nothing new to process, so
    # nothing may be appended or duplicated
    _run_to_parquet(spark, sf_smoke, out, ckpt)
    again = spark.read.parquet(out)
    assert again.count() == n_events
    assert again.select("event_id").distinct().count() == n_events

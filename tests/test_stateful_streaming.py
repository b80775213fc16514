"""applyInPandasWithState: custom running totals verified against the
batch aggregation over the full replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_4_spark.streaming import events_stream, run_stream_to_memory
from mapreduce_4_spark.streaming.stateful import stream_user_totals


def test_stateful_user_totals_match_batch(spark, sf_smoke):
    stream = events_stream(spark, sf_smoke)
    run_stream_to_memory(
        stream_user_totals(stream), "t_user_totals", output_mode="update"
    )
    # update mode re-emits a key per batch; the LAST emission per user is
    # the final state — single-batch replay means one emission each
    got = {
        r["user_id"]: (r["total_events"], r["total_value_cents"])
        for r in spark.table("t_user_totals").collect()
    }
    from mapreduce_4_spark.sources import load_table

    batch = {
        r["user_id"]: (r["n"], r["cents"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == batch


def test_transform_with_state_totals_match_batch(spark, sf_smoke):
    """Same totals via Spark 4's transformWithStateInPandas (RocksDB
    state store). Both arbitrary-state surfaces must agree with the
    batch aggregation."""
    import pytest

    try:  # TWS driver worker needs protobuf to talk to the state server
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("protobuf not usable in this container; TWS needs it")
    from mapreduce_4_spark.streaming.stateful import stream_user_totals_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = events_stream(spark, sf_smoke)
        run_stream_to_memory(
            stream_user_totals_tws(stream), "t_user_totals_tws",
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = {
        r["user_id"]: (r["total_events"], r["total_value_cents"])
        for r in spark.table("t_user_totals_tws").collect()
    }
    from mapreduce_4_spark.sources import load_table

    batch = {
        r["user_id"]: (r["n"], r["cents"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert got == batch


def test_stream_forward_fill_matches_batch_across_batches(spark, sf_smoke,
                                                          tmp_path):
    """Streaming LOCF must equal the batch window query even when the
    carried value crosses micro-batch boundaries: the events table is
    replayed as three ts-ordered file slices with maxFilesPerTrigger=1,
    so most users' fill state is carried through the state store at
    least twice."""
    import math
    import os

    from mapreduce_4_spark.sources import load_table
    from mapreduce_4_spark.streaming.stateful import stream_forward_fill

    ev = load_table(spark, sf_smoke, "events")
    # three contiguous TIME slices written in order (LOCF orders by ts,
    # so cross-batch in-order delivery must hold on ts; FileStreamSource
    # processes by modification time and sequential writes preserve it)
    src = str(tmp_path / "src")
    os.makedirs(src)
    t1, t2 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    slices = [
        ev.filter(F.col("ts") <= t1),
        ev.filter((F.col("ts") > t1) & (F.col("ts") <= t2)),
        ev.filter(F.col("ts") > t2),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/tmp{i}")
        import glob
        import shutil
        part = glob.glob(f"{src}/tmp{i}/part-*.parquet")[0]
        shutil.move(part, f"{src}/slice_{i}.parquet")
        shutil.rmtree(f"{src}/tmp{i}")

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from mapreduce_4_spark.streaming import run_stream_to_memory

    run_stream_to_memory(stream_forward_fill(stream), "t_locf")

    def norm(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) \
            else v

    got = {
        r["event_id"]: (norm(r["value_gapped"]), norm(r["value_filled"]))
        for r in spark.table("t_locf").collect()
    }
    from mapreduce_4_spark.plans import REGISTRY

    batch = {
        r["event_id"]: (norm(r["value_gapped"]), norm(r["value_filled"]))
        for r in REGISTRY["forward_fill_events"].builder(
            spark, sf_smoke
        ).collect()
    }
    assert len(got) == len(batch)
    assert got == batch

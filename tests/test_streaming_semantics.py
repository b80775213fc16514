"""Watermark late-data semantics and the foreachBatch sink surface,
exercised with a controlled two-batch replay (SURVEY.md §7.4: verify
streaming via deterministic replay with controlled watermarks)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, path: str, rows, mtime: float) -> None:
    # flat single parquet FILES (not Spark's directory-shaped output):
    # the file stream source lists plain files in its input dir
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "event_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "value": pd.Series([r[2] for r in rows], dtype="float64"),
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    table = table.set_column(
        1, "ts", table.column("ts").cast(pa.timestamp("us"))
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_watermark_finalization_contract(spark, tmp_path):
    """What the watermark actually guarantees (pinned empirically —
    Spark 4 aggregates a sub-watermark row arriving in the same batch
    that finalizes its window, and the docs themselves say late data
    'may or may not' be dropped):

    - every window emits AT MOST ONCE in append mode,
    - a window emits only after the watermark passes its end,
    - windows never passed by the watermark do NOT emit at stream end."""
    src = tmp_path / "stream_src"
    src.mkdir()
    t0 = time.time() - 1000
    # batch 1: events at 10:00-12:59 -> watermark = 12:59 - 1h = 11:59
    _write_batch(
        spark, str(src / "b1.parquet"),
        [(1, "2024-06-01 10:30:00", 1.0),
         (2, "2024-06-01 11:30:00", 1.0),
         (3, "2024-06-01 12:59:00", 1.0)],
        t0,
    )
    # batch 2: one in-time event (13:10) and one LATE event at 10:45,
    # older than the 11:59 watermark -> must not reappear in the 10:00 window
    _write_batch(
        spark, str(src / "b2.parquet"),
        [(4, "2024-06-01 13:10:00", 1.0),
         (5, "2024-06-01 10:45:00", 99.0)],
        t0 + 100,
    )
    schema = "event_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT start, n FROM late_data").collect()
    starts = [str(r["start"]) for r in rows]
    final = {str(r["start"]): r["n"] for r in rows}
    # exactly-once emission per finalized window
    assert len(starts) == len(set(starts)), starts
    # final watermark = 13:10 - 1h = 12:10 -> windows ending 11:00 and
    # 12:00 (i.e. starts 10:00, 11:00) finalize
    assert final["2024-06-01 11:00:00"] == 1
    # the 10:00 window emitted once; whether the 10:45 late row made it
    # in is explicitly NOT guaranteed by Spark ("may or may not")
    assert final["2024-06-01 10:00:00"] in (1, 2)
    # windows ending after the watermark (12:00 and 13:00 starts, ends
    # 13:00/14:00 > 12:10) never finalize -> absent at stream end
    assert "2024-06-01 12:00:00" not in final
    assert "2024-06-01 13:00:00" not in final


def test_foreachbatch_sees_ordered_batches(spark, tmp_path):
    """foreachBatch: arbitrary per-micro-batch logic (the upsert/merge
    surface). Batches arrive in order with stable ids."""
    src = tmp_path / "fb_src"
    src.mkdir()
    t0 = time.time() - 1000
    _write_batch(spark, str(src / "a.parquet"),
                 [(1, "2024-06-01 10:00:00", 1.0)], t0)
    _write_batch(spark, str(src / "b.parquet"),
                 [(2, "2024-06-01 11:00:00", 2.0)], t0 + 100)
    seen: list[tuple[int, int]] = []

    def handle(batch_df, batch_id: int) -> None:
        seen.append((batch_id, batch_df.count()))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    assert [bid for bid, _ in seen] == sorted(bid for bid, _ in seen)
    assert sum(n for _, n in seen) == 2


def test_aqe_coalesces_small_shuffles(spark, sf_smoke):
    """AQE shrinks the 32 configured shuffle partitions to a handful for
    tiny data — the runtime re-planning the engine relies on at scale."""
    from mapreduce_4_spark.sources import load_table

    df = (
        load_table(spark, sf_smoke, "orders")
        .groupBy("o_orderstatus")
        .count()
    )
    n_parts = df.rdd.getNumPartitions()
    assert n_parts < int(spark.conf.get("spark.sql.shuffle.partitions")), n_parts

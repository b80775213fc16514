#!/usr/bin/env python
"""Measure the mr4ver stream readers against each other: the Simple
(driver prefetch) reader vs the partition-planning executor reader
(``option("streamMode", "executor")``), draining the same append chain
through the same parquet-sink availableNow query.

The question the r11 verdict asked: at what batch size does shipping
rows through the driver lose to executor-side Arrow reads (which pay a
per-batch task-scheduling floor)? Chains of V appends x B rows each,
drained cold per (mode, B). Results land in SCALE.md's round-12 note.

Run: python scripts/stream_mode_probe.py [rows-per-append ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_APPENDS = 6


def build_chain(spark, tdir: str, batch_rows: int) -> None:
    from mapreduce_4_spark.sources.versioned import write_version

    for i in range(N_APPENDS):
        df = spark.range(i * batch_rows, (i + 1) * batch_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
            F.concat(F.lit("payload_"), F.col("id")).alias("s"),
        )
        write_version(df.coalesce(1), tdir, append=True)


def drain(spark, tdir: str, work: str, mode: str) -> float:
    reader = spark.readStream.format("mr4ver")
    if mode == "executor":
        reader = reader.option("streamMode", "executor")
    t0 = time.perf_counter()
    q = (
        reader.load(tdir)
        .writeStream.format("parquet")
        .option("path", os.path.join(work, f"out_{mode}"))
        .option("checkpointLocation", os.path.join(work, f"ck_{mode}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = time.perf_counter() - t0
    n = spark.read.parquet(os.path.join(work, f"out_{mode}")).count()
    assert n == N_APPENDS * int(work.rsplit("_", 1)[-1]), (n, work)
    return sec


def main() -> None:
    from mapreduce_4_spark.session import get_spark

    from mapreduce_4_spark.sources.pyds import register_versioned_source

    sizes = [int(a) for a in sys.argv[1:]] or [1_000, 20_000, 150_000]
    spark = get_spark("mr4ver-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_versioned_source(spark)
    results = []
    for b in sizes:
        work = tempfile.mkdtemp(prefix=f"mr4s_probe_{b}_",
                                suffix=f"_{b}")
        try:
            tdir = os.path.join(work, "t")
            build_chain(spark, tdir, b)
            row = {"rows_per_append": b, "appends": N_APPENDS}
            # alternate order to amortize warmup bias
            for mode in ("driver", "executor", "driver", "executor"):
                sec = drain_fresh(spark, tdir, work, mode, b)
                row.setdefault(mode, []).append(round(sec, 3))
            results.append(row)
            print(json.dumps(row), file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "mr4ver_stream_mode", "results": results}))


def drain_fresh(spark, tdir, work, mode, b) -> float:
    """Cold drain: fresh checkpoint/sink per run so each measurement
    replays the full chain."""
    sub = tempfile.mkdtemp(dir=work, suffix=f"_{b}")
    try:
        return drain(spark, tdir, sub, mode)
    finally:
        shutil.rmtree(sub, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the skipping layouts at REAL file counts (r11 verdict ask
#3): `ab_scan_clustered` and `ab_scan2d_zorder` sat at parity in the
headline bench because sf0.1 snapshots are 32 files — footer skipping
can't show a win when there is nothing to skip. This probe re-runs the
same three comparisons against 512-file synthetic snapshots (and a
128-dir stats chain):

1. plain vs user-sorted snapshot, narrow 1-D range predicate;
2. 1-D-sorted vs Z-ordered snapshot, conjunctive 2-D box predicate;
3. full chain scan vs manifest-stats-pruned read on a 128-dir chain.

For each arm it reports wall-clock (min of 3 count()s) AND the number
of files whose parquet footer [min, max] intersects the predicate —
the skip evidence itself, independent of local-FS cache warmth.

Run: python scripts/file_skip_probe.py [n_rows n_files]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


COLD = "--cold" in sys.argv


def _drop_caches() -> None:
    """Cold-IO mode: drop the page cache before each timed run, so the
    measurement includes the data reads skipping actually avoids —
    warm-cache local-FS runs are task-scheduling-bound and hide the IO
    term entirely (the round-12 finding)."""
    os.sync()
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass  # not permitted: stay a warm-cache probe


def timed_count(df, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(2 if COLD else runs):
        if COLD:
            _drop_caches()
        t0 = time.perf_counter()
        df.count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def files_intersecting(root: str, bounds: dict[str, tuple]) -> tuple:
    """(intersecting, total) parquet files under root whose footer
    column min/max overlaps EVERY bound — what parquet row-group /
    file skipping can avoid reading."""
    import pyarrow.parquet as pq

    total = 0
    hit = 0
    for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        total += 1
        md = pq.read_metadata(p)
        ok = True
        for ci in range(md.num_columns):
            name = md.schema.column(ci).name
            if name not in bounds:
                continue
            lo, hi = bounds[name]
            mn = min(md.row_group(g).column(ci).statistics.min
                     for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(ci).statistics.max
                     for g in range(md.num_row_groups))
            if mx < lo or mn > hi:
                ok = False
                break
        hit += ok
    return hit, total


def main() -> None:
    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources.versioned import (
        read_version,
        read_version_stats_pruned,
        write_version,
    )

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_rows = int(args[0]) if args else 8_000_000
    n_files = int(args[1]) if len(args) > 1 else 512
    spark = get_spark("mr4ver-file-skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"probe": "file_skip", "n_rows": n_rows,
                 "n_files": n_files}

    # two independent 0..4095 dims; v is ballast so files have weight
    base = spark.range(n_rows).select(
        (F.col("id") % 4096).alias("u"),
        (F.xxhash64("id") % 4096 + 4096) .cast("bigint").alias("k"),
        (F.col("id") * 17 % 1_000_003).alias("v"),
    ).withColumn("k", F.col("k") % 4096)

    work = tempfile.mkdtemp(prefix="mr4s_fileskip_")
    try:
        # --- arm 1: plain vs 1-D clustered, 1/256 range ---
        write_version(base, f"{work}/plain", n_files=n_files)
        write_version(base, f"{work}/sorted", sort_by=["u"],
                      n_files=n_files)
        pl = read_version(spark, f"{work}/plain")
        cl = read_version(spark, f"{work}/sorted")
        pred1 = (F.col("u") >= 1024) & (F.col("u") < 1040)
        b1 = {"u": (1024, 1039)}
        out["scan_plain"] = {
            "sec": timed_count(pl.filter(pred1)),
            "files_hit": files_intersecting(f"{work}/plain/v=000001", b1),
        }
        out["scan_clustered"] = {
            "sec": timed_count(cl.filter(pred1)),
            "files_hit": files_intersecting(f"{work}/sorted/v=000001", b1),
        }

        # --- arm 2: 1-D sort vs Z-order, 2-D box (1/16 x 1/16) ---
        write_version(base, f"{work}/byz", zorder_by=["u", "k"],
                      n_files=n_files)
        byz = read_version(spark, f"{work}/byz")
        pred2 = ((F.col("u") >= 1024) & (F.col("u") < 1280)
                 & (F.col("k") >= 1024) & (F.col("k") < 1280))
        b2 = {"u": (1024, 1279), "k": (1024, 1279)}
        out["scan2d_colsort"] = {
            "sec": timed_count(cl.filter(pred2)),
            "files_hit": files_intersecting(f"{work}/sorted/v=000001", b2),
        }
        out["scan2d_zorder"] = {
            "sec": timed_count(byz.filter(pred2)),
            "files_hit": files_intersecting(f"{work}/byz/v=000001", b2),
        }

        # --- arm 3: 128-dir stats chain, 1-dir range ---
        cdir = f"{work}/chain"
        n_dirs = 128
        per = n_rows // 16 // n_dirs  # lighter chain, same dir count
        for i in range(n_dirs):
            write_version(
                spark.range(i * per, (i + 1) * per).select(
                    F.col("id").alias("o"),
                    (F.col("id") % 1000).alias("val")).coalesce(1),
                cdir, append=True,
                stats_for=["o"] if i == 0 else None)
        lo = 64 * per + 5
        hi = lo + per // 2
        full = read_version(spark, cdir).filter(
            (F.col("o") >= lo) & (F.col("o") <= hi))
        pruned = read_version_stats_pruned(spark, cdir, "o",
                                           lower=lo, upper=hi)
        out["chain_scan_full"] = {
            "sec": timed_count(full),
            "dirs": n_dirs,
        }
        out["chain_stats_pruned"] = {
            "sec": timed_count(pruned),
            "dirs_touched": len({f.rsplit("/", 2)[-2] if "/v=" not in f
                                 else f.split("/v=")[1].split("/")[0]
                                 for f in pruned.inputFiles()}),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

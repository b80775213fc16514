#!/usr/bin/env python
"""Mutation-cost probe for the round-11 lakehouse layer (SCALE.md):
measure what a targeted DELETE actually costs on an append chain under
the three commit strategies —

  full     delete_version        (read whole table, rewrite whole table)
  cow      delete_version_pruned (rewrite only provably-touched dirs)
  dv       delete_version_dv     (rewrite nothing; positional sidecar)

— plus the read-side tax each leaves behind (one full live-read after
the commit) and the compaction cost that retires the DV debt.

The table is the sf0.1 orders table appended as an N-dir chain keyed by
arrival (o_orderkey ranges per dir, stats+bloom recorded), the shape a
streaming ingest leaves behind. The delete is K keys confined to ONE
dir — the GDPR shape where the strategies differ most: full rewrites
everything, CoW rewrites one dir, DV writes K sidecar rows.

Usage:
    python scripts/cow_dv_probe.py [--dirs 12] [--keys 50] [--runs 3]

Each strategy runs on its OWN fresh copy of the chain (mutations are
destructive), timed end-to-end (commit wall-clock) with min-of-runs
reported, then one live read is timed on the mutated table. Output is
one JSON line per strategy.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_chain(spark, orders, tdir: str, n_dirs: int) -> None:
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import write_version

    n = orders.agg(F.max("o_orderkey")).first()[0] + 1
    step = (n + n_dirs - 1) // n_dirs
    for i in range(n_dirs):
        part = orders.filter(
            (F.col("o_orderkey") >= i * step)
            & (F.col("o_orderkey") < (i + 1) * step))
        write_version(part.coalesce(2), tdir, append=True,
                      stats_for=["o_orderkey"] if i == 0 else None,
                      bloom_for=["o_orderkey"] if i == 0 else None)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", type=int, default=12)
    ap.add_argument("--keys", type=int, default=50)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources import load_table
    from mapreduce_4_spark.sources.versioned import (
        compact_tail,
        delete_version,
        delete_version_dv,
        delete_version_joined,
        delete_version_pruned,
        read_version,
    )

    spark = get_spark("cow-dv-probe")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
    orders.count()  # warm

    n = orders.agg(F.max("o_orderkey")).first()[0] + 1
    step = (n + args.dirs - 1) // args.dirs
    # K keys confined to the LAST dir (worst case for nothing, fair for
    # all: one dir holds every requested key)
    lo = (args.dirs - 1) * step
    keys = [int(r[0]) for r in orders.filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") % 7 == 0)
    ).orderBy("o_orderkey").limit(args.keys).collect()]

    def timed(fn, runs):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, out

    root = tempfile.mkdtemp(prefix="mr4s_cow_dv_probe_")
    try:
        results = []
        # round 12 adds `joined`: dir classification by one chain scan
        # (the wide-key path — exact, no driver key collect); here it
        # pays the scan the manifest classifier avoids, pricing the gap
        for strategy in ("full", "cow", "joined", "dv"):
            commit_best = None
            info = None
            for r in range(args.runs):
                tdir = os.path.join(root, f"{strategy}_{r}")
                build_chain(spark, orders, tdir, args.dirs)
                kdf = spark.createDataFrame(
                    [(k,) for k in keys], "o_orderkey bigint")
                t0 = time.perf_counter()
                if strategy == "full":
                    delete_version(spark, tdir, keys=kdf, key="o_orderkey")
                elif strategy == "cow":
                    _, info = delete_version_pruned(
                        spark, tdir, keys=keys, key="o_orderkey",
                        detail=True)
                elif strategy == "joined":
                    _, info = delete_version_joined(
                        spark, tdir, kdf, "o_orderkey", detail=True)
                else:
                    _, info = delete_version_dv(
                        spark, tdir, keys=keys, key="o_orderkey",
                        detail=True)
                dt = time.perf_counter() - t0
                commit_best = dt if commit_best is None else min(
                    commit_best, dt)
                last_tdir = tdir
            read_best, n_live = timed(
                lambda: read_version(spark, last_tdir).count(), args.runs)
            rec = {
                "strategy": strategy,
                "dirs": args.dirs,
                "keys": len(keys),
                "commit_sec": round(commit_best, 3),
                "live_read_sec": round(read_best, 3),
                "live_rows": n_live,
                "detail": info,
            }
            if strategy == "dv":
                t0 = time.perf_counter()
                compact_tail(spark, last_tdir, keep_base=0)
                rec["dv_fold_sec"] = round(time.perf_counter() - t0, 3)
                read2, n2 = timed(
                    lambda: read_version(spark, last_tdir).count(), args.runs)
                rec["post_fold_read_sec"] = read2
                assert n2 == n_live
            results.append(rec)
            print(json.dumps(rec), flush=True)
        assert len({r["live_rows"] for r in results}) == 1, results
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

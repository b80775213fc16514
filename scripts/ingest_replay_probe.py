#!/usr/bin/env python
"""Sustained streaming-ingest replay probe (SCALE.md): drive
``dedup_ingest_sink`` batch-by-batch for N micro-batches and measure
the per-batch wall-clock slope under each ``index_layout``.

The corpus is the sf0.1 documents table replicated 10x with a
copy-distinct perturbation token (the ab_simhash_* construction), so
batches carry genuine near-dups both within and across batches — the
regime where the probe path, not the within-batch dedup, dominates.

Usage:
    python scripts/ingest_replay_probe.py [--layout plain|banded]
        [--batches 120] [--docs 400]

Prints one JSON line:
    {"layout": ..., "batches": N, "docs_per_batch": B,
     "early_mean_sec": ..., "late_mean_sec": ..., "slope_ratio": ...,
     "per_batch_sec": [...]}

early = batches 5-25 (post-warmup), late = the final 20 batches —
the same windows as the round-8 SCALE.md table, so slopes compare
round-over-round.
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

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", choices=["plain", "banded"], default="plain")
    ap.add_argument("--batches", type=int, default=120)
    ap.add_argument("--docs", type=int, default=400)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources import load_table
    from mapreduce_4_spark.streaming.ingest import dedup_ingest_sink

    spark = get_spark(f"ingest-replay-{args.layout}")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = docs.count()
    replicas = (args.batches * args.docs + n_base - 1) // n_base
    rep = None
    for i in range(replicas):
        c = docs.select(
            (F.col("doc_id") * replicas + F.lit(i)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copymark{i}")).alias("text"),
        )
        rep = c if rep is None else rep.unionAll(c)
    # one stable ordering so batch slices are deterministic; materialize
    # once so per-batch reads don't re-run the union
    feed_dir = tempfile.mkdtemp(prefix="ingest_feed_")
    work_dir = tempfile.mkdtemp(prefix="ingest_tables_")
    try:
        from pyspark.sql import Window

        rep.limit(args.batches * args.docs).withColumn(
            "seq",
            F.row_number().over(Window.orderBy("doc_id")) - F.lit(1),
        ).write.parquet(f"{feed_dir}/feed")
        feed = spark.read.parquet(f"{feed_dir}/feed")
        sink = dedup_ingest_sink(
            f"{work_dir}/corpus", f"{work_dir}/index",
            index_layout=args.layout,
        )
        per_batch: list[float] = []
        for b in range(args.batches):
            batch = feed.filter(
                (F.col("seq") >= b * args.docs)
                & (F.col("seq") < (b + 1) * args.docs)
            ).select("doc_id", "text")
            t0 = time.perf_counter()
            sink(batch, b)
            per_batch.append(round(time.perf_counter() - t0, 3))
            if b % 20 == 0:
                print(f"# batch {b}: {per_batch[-1]:.2f}s", file=sys.stderr)
        early = per_batch[5:26]
        late = per_batch[-20:]
        e_mean = sum(early) / len(early)
        l_mean = sum(late) / len(late)
        print(json.dumps({
            "layout": args.layout,
            "batches": args.batches,
            "docs_per_batch": args.docs,
            "early_mean_sec": round(e_mean, 3),
            "late_mean_sec": round(l_mean, 3),
            "slope_ratio": round(l_mean / e_mean, 3),
            "per_batch_sec": per_batch,
        }))
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)
        shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

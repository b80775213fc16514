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
        [--batches 120] [--docs 400] [--nparts 32] [--seed-docs 0]
        [--compact-every K]

``--seed-docs S`` pre-loads batch 0 with S documents before the timed
trickle — the "huge corpus, tiny batch" shape of the banded dial's win
condition (|batch| x bands << nparts AND corpus >> batch), which the
uniform-batch probe can't reach because its corpus only accumulates to
batches x docs. The seed batch is excluded from the slope windows.
``--seed-synthetic`` makes the seed docs fully DISTINCT (md5-word
texts derived from the doc id, built JVM-side) so they SURVIVE dedup:
the replicated-feed seed collapses to ~4.8k survivors however large S
is (the near-dup replicas are deduped away), which caps the persisted
index at ~76k band rows and keeps the probe out of the win regime's
"corpus >> batch" arm. Synthetic seeding is what actually grows the
survivor index to S, which is the quantity the banded dial prunes.
``--compact-every`` exercises the auto-compaction cadence
(dedup_ingest_sink(compact_every=K)); the output's ``chain_dirs``
records each table's final data-dir count, which the cadence must
bound.

Prints one JSON line:
    {"layout": ..., "batches": N, "docs_per_batch": B, "nparts": ...,
     "seed_docs": S, "seed_sec": ..., "compact_every": K,
     "early_mean_sec": ..., "late_mean_sec": ..., "slope_ratio": ...,
     "survivors": ..., "chain_dirs": {...}, "per_batch_sec": [...]}

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
    ap.add_argument("--nparts", type=int, default=32)
    ap.add_argument("--seed-docs", type=int, default=0)
    ap.add_argument("--seed-synthetic", action="store_true")
    ap.add_argument("--compact-every", type=int, default=None)
    ap.add_argument("--compact-mode", choices=["full", "tail"],
                    default="full")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources import load_table
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
    )
    from mapreduce_4_spark.streaming.ingest import (
        bands_table_dir,
        dedup_ingest_sink,
    )

    spark = get_spark(f"ingest-replay-{args.layout}")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_base = docs.count()
    feed_seed_docs = 0 if args.seed_synthetic else args.seed_docs
    total_docs = feed_seed_docs + args.batches * args.docs
    replicas = (total_docs + n_base - 1) // n_base
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

        rep.limit(total_docs).withColumn(
            "seq",
            F.row_number().over(Window.orderBy("doc_id")) - F.lit(1),
        ).write.parquet(f"{feed_dir}/feed")
        feed = spark.read.parquet(f"{feed_dir}/feed")
        corpus_dir, index_dir = f"{work_dir}/corpus", f"{work_dir}/index"
        sink = dedup_ingest_sink(
            corpus_dir, index_dir,
            index_layout=args.layout,
            nparts=args.nparts,
            compact_every=args.compact_every,
            compact_mode=args.compact_mode,
        )
        seed_sec = None
        if args.seed_docs:
            if args.seed_synthetic:
                # S distinct docs: 30 md5 "words" keyed off the doc id
                # (JVM-side, no Python loop over rows). Ids live above
                # 10^9 so they can never collide with feed doc_ids.
                # Materialized to parquet and read back so Catalyst
                # sizes the batch from file stats — straight off
                # spark.range the estimate is ~8 bytes/row, which
                # makes the planner broadcast the (runtime ~1 GB)
                # batch side of the dedup anti-join at S=10^6.
                spark.range(args.seed_docs).select(
                    (F.col("id") + F.lit(10**9)).alias("doc_id"),
                    F.concat_ws(" ", F.array(*[
                        F.md5(F.concat(F.col("id").cast("string"),
                                       F.lit(f"w{j}")))
                        for j in range(30)
                    ])).alias("text"),
                ).write.parquet(f"{feed_dir}/seed")
                seed = spark.read.parquet(f"{feed_dir}/seed")
            else:
                seed = feed.filter(F.col("seq") < args.seed_docs) \
                    .select("doc_id", "text")
            t0 = time.perf_counter()
            sink(seed, 0)
            seed_sec = round(time.perf_counter() - t0, 3)
            print(f"# seed ({args.seed_docs} docs): {seed_sec:.1f}s",
                  file=sys.stderr)
        per_batch: list[float] = []
        for b in range(args.batches):
            lo = feed_seed_docs + b * args.docs
            batch = feed.filter(
                (F.col("seq") >= lo) & (F.col("seq") < lo + args.docs)
            ).select("doc_id", "text")
            t0 = time.perf_counter()
            sink(batch, b + (1 if args.seed_docs else 0))
            per_batch.append(round(time.perf_counter() - t0, 3))
            if b % 20 == 0:
                print(f"# batch {b}: {per_batch[-1]:.2f}s", file=sys.stderr)
        # short smoke runs don't reach the standard windows — fall back
        # to halves so the probe still reports a slope
        early = per_batch[5:26] or per_batch[:max(1, len(per_batch) // 2)]
        late = per_batch[-20:]
        e_mean = sum(early) / len(early)
        l_mean = sum(late) / len(late)

        def chain_len(tdir: str) -> int | None:
            v = latest_version(tdir)
            if v is None:
                return None
            return len(read_manifest(tdir, v).get("data_dirs")
                       or [f"v={v:06d}"])

        chain_dirs = {"corpus": chain_len(corpus_dir),
                      "index": chain_len(index_dir)}
        if args.layout == "banded":
            chain_dirs["bands"] = chain_len(bands_table_dir(index_dir))
        survivors = read_manifest(
            corpus_dir, latest_version(corpus_dir))["row_count"]
        print(json.dumps({
            "layout": args.layout,
            "batches": args.batches,
            "docs_per_batch": args.docs,
            "nparts": args.nparts,
            "seed_docs": args.seed_docs,
            "seed_synthetic": args.seed_synthetic,
            "seed_sec": seed_sec,
            "compact_every": args.compact_every,
            "compact_mode": args.compact_mode,
            "early_mean_sec": round(e_mean, 3),
            "late_mean_sec": round(l_mean, 3),
            "slope_ratio": round(l_mean / e_mean, 3),
            "survivors": survivors,
            "chain_dirs": chain_dirs,
            "per_batch_sec": per_batch,
        }))
    finally:
        shutil.rmtree(feed_dir, ignore_errors=True)
        shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

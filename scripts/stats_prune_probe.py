"""Measure manifest-stats directory skipping on an append chain.

Builds an N-dir arrival-ordered chain (each append owns a disjoint key
range, stats collected on the key), then times a narrow range read both
ways: full chain scan + filter vs read_version_stats_pruned. Also
reports the planning side: how many dirs each path touches. The point
at fixture scale is the TOUCHED-DIR count (the term that scales with
chain length on an object store — one LIST + footer reads per dir);
wall-clock follows it once per-dir constant costs dominate, i.e.
exactly the regime a 10^3-dir chain lives in.

Usage: python scripts/stats_prune_probe.py [n_dirs] [rows_per_dir]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    n_dirs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources.versioned import (
        read_version,
        read_version_stats_pruned,
    )
    from mapreduce_4_spark.sources.versioned import write_version

    spark = get_spark("stats-prune-probe")
    with tempfile.TemporaryDirectory() as td:
        tdir = f"{td}/t"
        t0 = time.time()
        for i in range(n_dirs):
            df = (spark.range(i * rows, (i + 1) * rows)
                  .withColumnRenamed("id", "k")
                  .coalesce(4))
            write_version(df, tdir, append=True,
                          stats_for=["k"] if i == 0 else None)
        build_s = time.time() - t0
        # a range entirely inside one middle dir
        lo, hi = (n_dirs // 2) * rows + 10, (n_dirs // 2) * rows + 500

        def timed(fn, n=5):
            vals = []
            for _ in range(n):
                t0 = time.time()
                fn()
                vals.append(time.time() - t0)
            return min(vals)

        full_df = read_version(spark, tdir).filter(
            f"k between {lo} and {hi}")
        pruned_df = read_version_stats_pruned(spark, tdir, "k",
                                              lower=lo, upper=hi)
        assert sorted(r["k"] for r in pruned_df.collect()) == sorted(
            r["k"] for r in full_df.collect())
        full_s = timed(lambda: full_df.count())
        pruned_s = timed(lambda: pruned_df.count())
        # the metadata COUNT tier: a dir-aligned range (two whole middle
        # dirs) answered with spark=None — zero jobs, zero listings —
        # vs the same count through a pruned scan
        from mapreduce_4_spark.sources.versioned import count_version

        alo, ahi = (n_dirs // 2) * rows, (n_dirs // 2 + 2) * rows - 1
        n_meta, info = count_version(None, tdir, "k", lower=alo,
                                     upper=ahi, detail=True)
        assert info["scanned"] == 0 and n_meta == 2 * rows
        meta_count_s = timed(lambda: count_version(None, tdir, "k",
                                                   lower=alo, upper=ahi))
        scan_count_s = timed(lambda: read_version_stats_pruned(
            spark, tdir, "k", lower=alo, upper=ahi).count())
        print(json.dumps({
            "n_dirs": n_dirs,
            "rows_per_dir": rows,
            "build_s": round(build_s, 2),
            "dirs_touched_full": len({f.rsplit("/", 2)[-2]
                                      for f in full_df.inputFiles()}),
            "dirs_touched_pruned": len({f.rsplit("/", 2)[-2]
                                        for f in pruned_df.inputFiles()}),
            "full_scan_s": round(full_s, 4),
            "stats_pruned_s": round(pruned_s, 4),
            "speedup": round(full_s / pruned_s, 2) if pruned_s else None,
            "meta_count_s": round(meta_count_s, 6),
            "pruned_scan_count_s": round(scan_count_s, 4),
            "count_speedup": round(scan_count_s / meta_count_s, 1)
            if meta_count_s else None,
        }))


if __name__ == "__main__":
    main()

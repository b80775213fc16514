"""Measure the fixed-point Lloyd operator's corpus-size scaling.

The plan-shape claim (PLANS.md): per iteration, assignment is map-only
over one broadcast centroid row and the update is one (k, dim)-keyed
map-side-combined aggregate, so wall-clock should be ~linear in corpus
size with a fixed per-iteration scheduling overhead. This probe times
the full fit+assign at two corpus sizes (10x apart) over synthetic
deterministic integer vectors (hash-derived, no RNG state) and reports
the measured slope — the kmeans twin of the dedup family's 10x probes.

Usage: python scripts/kmeans_scale_probe.py [n_small] [factor] [dims]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def _synthetic(spark, n: int, dims: int):
    from pyspark.sql import functions as F

    # deterministic pseudo-random BIGINT coordinates from xxhash64 —
    # JVM-side, no Python RNG, reproducible across runs
    return spark.range(n).select(
        F.col("id"),
        F.expr(
            f"transform(sequence(0, {dims - 1}), "
            f"d -> pmod(xxhash64(id * {dims} + d), 1000000))"
        ).alias("q"),
    )


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dims = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    from mapreduce_4_spark.operators.clustering import kmeans_fixedpoint
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("kmeans-scale-probe")

    def timed(n: int, runs: int = 3) -> float:
        # parquet-backed so Catalyst sizes the input from file stats
        # (the SCALE.md Catalyst-size-estimate lesson)
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            _synthetic(spark, n, dims).write.parquet(f"{td}/pts")
            pts = spark.read.parquet(f"{td}/pts")
            vals = []
            kmeans_fixedpoint(pts, k=8, iters=3).write.format(
                "noop").mode("overwrite").save()
            for _ in range(runs):
                t0 = time.time()
                kmeans_fixedpoint(pts, k=8, iters=3).write.format(
                    "noop").mode("overwrite").save()
                vals.append(round(time.time() - t0, 3))
            return min(vals)

    small_s = timed(n_small)
    big_s = timed(n_small * factor)
    print(json.dumps({
        "n_small": n_small,
        "n_big": n_small * factor,
        "dims": dims,
        "k": 8,
        "iters": 3,
        "small_sec": small_s,
        "big_sec": big_s,
        "slope_vs_linear": round(big_s / (small_s * factor), 3),
        "note": "slope_vs_linear < 1 means the fixed per-iteration "
                "scheduling overhead amortizes as the corpus grows "
                "(the PLANS.md claim); ~1 is linear; >1 super-linear",
    }))


if __name__ == "__main__":
    main()

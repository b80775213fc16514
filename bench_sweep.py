#!/usr/bin/env python
"""Full-registry timing sweep: every registered query, warmed then timed
(min of N runs), at $SPARK_GRAFT_SF_DIR. Prints one JSON line
{"queries": {name: sec, ...}, "sf": ..., "runs": N}.

bench.py is the stable round-over-round headline; THIS is the outlier
finder — run it after structural changes to catch regressions in the
long tail the headline set doesn't cover (it is how the all-pairs
Jaccard, blocked-ER Levenshtein, and lambda-retokenize blowups were
found). Slowest queries print to stderr as they finish.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def main() -> None:
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("mapreduce_4_spark-sweep")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    out: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        df = spec.builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = min(runs)
        print(f"# {name}: {out[name]:.3f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "queries": out,
                "runs": N_RUNS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

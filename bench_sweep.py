#!/usr/bin/env python
"""Full-registry timing sweep: every registered query, warmed then timed
with bench.py's shared ``_timed`` discipline (min of N runs), at
$SPARK_GRAFT_SF_DIR. Prints one JSON line
{"queries": {name: sec, ...}, "raw_runs": {...}, "runs": N, "sf": ...}.

bench.py is the stable round-over-round headline; THIS is the outlier
finder — run it after structural changes to catch regressions in the
long tail the headline set doesn't cover (it is how the all-pairs
Jaccard, blocked-ER Levenshtein, and lambda-retokenize blowups were
found). Slowest queries print to stderr as they finish.
"""

from __future__ import annotations

import json

import bench


def main() -> None:
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("mapreduce_4_spark-sweep")
    spark.read.parquet(f"{bench.SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        bench._timed(timings, name, spec.builder(spark, bench.SF_DIR))

    sf = bench.SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "queries": timings,
                "raw_runs": bench._RAW,
                "runs": bench.N_RUNS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink so the full plan
(scan -> compute -> all columns) executes without collect() driver
pressure — the same shape a cluster job has.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: one representative per operator family, weighted toward
#: the scale-critical paths (fact aggregation, star join, text explode,
#: LSH dedup, window, time bucketing).
HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "wordcount_per_doc",
    "join_lineitem_part_supplier",
    "top10_customers_by_revenue",
    "window_rank_orders",
    "rollup_lineitem_flags",
    "events_tumbling_1h",
    "top_bigrams",
    "dedup_exact_docs",
    "minhash_lsh_neardup",
    "similarity_bruteforce_topk",
]


def main() -> None:
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("mapreduce_4_spark-bench")
    # warm the JVM + file index once with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = REGISTRY[name].builder
        # warm-up run: pays one-time plan compilation + whole-stage
        # codegen + file-index costs, which a long-lived cluster session
        # amortizes across thousands of queries; the timed run is the
        # steady-state cost of the physical plan itself.
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

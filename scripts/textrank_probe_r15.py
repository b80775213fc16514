#!/usr/bin/env python
"""Round-15 textrank probe: where do the 2.1 s go, and which structural
variant (broadcast-rank iterations, explode-built edge list) moves them
— all output-preserving candidates, equality-checked before timing.

Usage: python scripts/textrank_probe_r15.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RESULTS: dict[str, object] = {}


def timed(name, df, runs=3):
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    RESULTS[name] = min(ts)
    print(f"# {name}: {min(ts):.3f}s {ts}", file=sys.stderr, flush=True)


def build_variant(spark, sf_dir, broadcast_ranks=False, explode_edges=False,
                  iters=None):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import words
    from mapreduce_4_spark.plans.llm_pipeline10 import _TR_ITERS, _TR_SCALE
    from mapreduce_4_spark.sources import load_table

    iters = iters if iters is not None else _TR_ITERS
    docs = load_table(spark, sf_dir, "documents").select(
        words("text").alias("w")).filter(F.size("w") >= 2)
    pairs = docs.select(F.explode(F.expr(
        "transform(sequence(0, size(w) - 2), "
        "i -> struct(least(w[i], w[i+1]) AS a, "
        "greatest(w[i], w[i+1]) AS b))"
    )).alias("p")).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    if explode_edges:
        edges0 = und.select(F.explode(F.array(
            F.struct(F.col("a").alias("src"), F.col("b").alias("dst"),
                     F.col("w")),
            F.struct(F.col("b").alias("src"), F.col("a").alias("dst"),
                     F.col("w")),
        )).alias("e")).select("e.src", "e.dst", "e.w")
    else:
        edges0 = und.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), "w"
        ).unionAll(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
        )
    deg = edges0.groupBy("src").agg(F.sum("w").alias("wdeg"))
    edges = edges0.join(deg, "src")
    nodes = edges0.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"CAST({_TR_SCALE} div n AS BIGINT)").alias("rank")
    )
    for _ in range(iters):
        r = ranks.withColumnRenamed("node", "src")
        if broadcast_ranks:
            r = F.broadcast(r)
        contrib = edges.join(r, "src").select(
            "dst", F.expr("(rank * w) div wdeg").alias("c"))
        ranks = (
            contrib.groupBy("dst").agg(F.sum("c").alias("s"))
            .crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("node"),
                F.expr(f"CAST((3 * {_TR_SCALE}) div (20 * n) "
                       f"+ (17 * s) div 20 AS BIGINT)").alias("rank"),
            )
        )
    return (
        ranks.orderBy(F.desc("rank"), "node").limit(15)
        .select(F.col("node").alias("token"), F.col("rank").alias("rank_fp"))
    )


def main() -> None:
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("textrank-probe-r15")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    cur = REGISTRY["textrank_keywords_docs"].builder(spark, SF_DIR)
    expect = [tuple(r) for r in cur.collect()]
    # final ADAPTIVE plan after execution: does AQE reuse the edge build?
    final = cur._jdf.queryExecution().executedPlan().toString()
    RESULTS["final_plan_exchanges"] = final.count("Exchange")
    RESULTS["final_plan_reused"] = final.count("ReusedExchange")
    RESULTS["final_plan_aqe_final"] = "isFinalPlan=true" in final

    variants = {
        "textrank_now": (False, False),
        "textrank_bcast_ranks": (True, False),
        "textrank_explode_edges": (False, True),
        "textrank_both": (True, True),
    }
    dfs = {}
    for name, (br, ee) in variants.items():
        df = build_variant(spark, SF_DIR, broadcast_ranks=br,
                           explode_edges=ee)
        got = [tuple(r) for r in df.collect()]
        assert got == expect, (name, got[:3], expect[:3])
        dfs[name] = df
    print("# all variants EQUAL", file=sys.stderr)
    for name, df in dfs.items():
        spark.sparkContext.setJobDescription(name)
        timed(name, df)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()

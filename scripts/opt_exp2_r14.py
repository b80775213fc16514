#!/usr/bin/env python
"""Round-14 experiment 2: 100TB-safe q1 money variants + shingle zip3.

The pure long-cents q1 (opt_experiments_r14.py) is 2.1x but its
10^6-scaled charge sum overflows int64 around sf~70. This measures the
scale-safe hybrid: products computed in LONG per row (cheap, per-row
bound ~4e11 << 2^63), the two product sums accumulated in DECIMAL(38,0)
(overflow-free at any scale), single-column sums in long (bounds provable
through 100 TB)."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 3


def timed(name, df, results):
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    results[name] = min(runs)
    print(f"{name:45s} {min(runs):.3f}s  (runs: {runs})", flush=True)


def rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def main():
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources import load_table
    from mapreduce_4_spark.functions.text import words

    spark = get_spark("opt-exp2-r14")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    res: dict[str, float] = {}

    li = load_table(spark, SF_DIR, "lineitem")
    base = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
    cur = REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR)

    def cents(c):
        return F.round(F.col(c) * 100).cast("long")

    def fin(col, scale_pow):
        return (col.cast("decimal(38,0)") / F.lit(10 ** scale_pow)).cast("double")

    q = cents("l_quantity")
    p = cents("l_extendedprice")
    d = cents("l_discount")
    t = cents("l_tax")
    disc = p * (F.lit(100) - d)
    charge = disc * (F.lit(100) + t)

    # hybrid: product sums in decimal(38,0) from long products
    hyb = (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(q).alias("sq"), F.sum(p).alias("sp"),
             F.sum(d).alias("sdis"),
             F.sum(disc.cast("decimal(38,0)")).alias("sd"),
             F.sum(charge.cast("decimal(38,0)")).alias("sc"),
             F.count(F.lit(1)).alias("count_order"))
        .select(
            "l_returnflag", "l_linestatus",
            fin(F.col("sq"), 2).alias("sum_qty"),
            fin(F.col("sp"), 2).alias("sum_base_price"),
            fin(F.col("sd"), 4).alias("sum_disc_price"),
            fin(F.col("sc"), 6).alias("sum_charge"),
            (fin(F.col("sq"), 2) / F.col("count_order")).alias("avg_qty"),
            (fin(F.col("sp"), 2) / F.col("count_order")).alias("avg_price"),
            (fin(F.col("sdis"), 2) / F.col("count_order")).alias("avg_disc"),
            F.col("count_order"),
        )
    )
    a, b = rows(cur), rows(hyb)
    print("q1 hybrid identical:", a == b, flush=True)
    if a != b:
        for x, y in zip(a, b):
            if x != y:
                print("  DIFF", x, "\n      ", y)
                break
    else:
        timed("q1_decimal_current", cur, res)
        timed("q1_hybrid_decsum", hyb, res)

    # smaller decimal sum types: products fit decimal(19,0) per row; sum
    # buffer then decimal(29,0) — same BigDecimal class, try anyway
    hyb2 = (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(q).alias("sq"), F.sum(p).alias("sp"),
             F.sum(d).alias("sdis"),
             F.sum(disc.cast("decimal(19,0)")).alias("sd"),
             F.sum(charge.cast("decimal(19,0)")).alias("sc"),
             F.count(F.lit(1)).alias("count_order"))
        .select(
            "l_returnflag", "l_linestatus",
            fin(F.col("sq"), 2).alias("sum_qty"),
            fin(F.col("sp"), 2).alias("sum_base_price"),
            fin(F.col("sd"), 4).alias("sum_disc_price"),
            fin(F.col("sc"), 6).alias("sum_charge"),
            (fin(F.col("sq"), 2) / F.col("count_order")).alias("avg_qty"),
            (fin(F.col("sp"), 2) / F.col("count_order")).alias("avg_price"),
            (fin(F.col("sdis"), 2) / F.col("count_order")).alias("avg_disc"),
            F.col("count_order"),
        )
    )
    b2 = rows(hyb2)
    print("q1 hybrid19 identical:", a == b2, flush=True)
    if a == b2:
        timed("q1_hybrid_dec19sum", hyb2, res)

    # ---------------------------------------------------------------
    # shingles: transform+slice+concat_ws vs nested zip_with (3-gram)
    # ---------------------------------------------------------------
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ws = words("text")
    d3 = docs.select("doc_id", ws.alias("_w")).filter(F.size("_w") >= 3)
    idx = F.sequence(F.lit(1), F.size("_w") - F.lit(2))
    cur_sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_w", i, 3))))
    n1 = F.size("_w") - F.lit(2)
    new_sh = F.array_distinct(F.zip_with(
        F.zip_with(F.slice("_w", 1, n1), F.slice("_w", 2, n1),
                   lambda x, y: F.concat(x, F.lit(" "), y)),
        F.slice("_w", 3, n1),
        lambda xy, z: F.concat(xy, F.lit(" "), z)))
    sc_cur = (d3.select("doc_id", F.explode(cur_sh).alias("s"))
              .groupBy("s").agg(F.count(F.lit(1)).alias("n")))
    sc_new = (d3.select("doc_id", F.explode(new_sh).alias("s"))
              .groupBy("s").agg(F.count(F.lit(1)).alias("n")))
    a, b = rows(sc_cur), rows(sc_new)
    print("shingle zip3 identical:", a == b, flush=True)
    if a == b:
        timed("shingles_transform_slice", sc_cur, res)
        timed("shingles_zip3", sc_new, res)

    # full minhash headline with zip3 shingles is measured after the
    # operator change lands; this isolates the construction cost.

    print("\n== results ==")
    for k, v in res.items():
        print(f"{k:45s} {v:.3f}")


if __name__ == "__main__":
    main()

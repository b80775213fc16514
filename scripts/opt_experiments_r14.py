#!/usr/bin/env python
"""Round-14 optimization experiments (guide §1: measure first).

Times candidate rewrites of the hottest per-task work against the
current implementations, on the bench SF, with the bench's min-of-N
noop-sink discipline — AND asserts bit-identical results for each
candidate before timing it, because an optimization that changes any
query's output is a regression by contract.

Run on a quiet host: python scripts/opt_experiments_r14.py
"""

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
    from mapreduce_4_spark.functions.money import dec, dsum, davg
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.session import get_spark
    from mapreduce_4_spark.sources import load_table

    spark = get_spark("opt-experiments-r14")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    res: dict[str, float] = {}

    # ---------------------------------------------------------------
    # A. q1 money arithmetic: current decimal(18,2) vs long-cents
    # ---------------------------------------------------------------
    li = load_table(spark, SF_DIR, "lineitem")
    base = li.filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))

    cur = REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR)

    # long-cents: every 2-dp measure becomes exact integer cents; sums
    # are pure long aggregation (Tungsten long-backed buffers); the final
    # rescale to double goes through an exact decimal so each output is
    # ONE correctly-rounded conversion of the same exact rational as the
    # decimal path.
    def cents(c):
        return F.round(F.col(c) * 100).cast("long")

    def fin(col, scale_pow):  # exact long -> exact decimal -> double
        return (col.cast("decimal(38,0)") / F.lit(10 ** scale_pow)).cast("double")

    q = cents("l_quantity")
    p = cents("l_extendedprice")
    d = cents("l_discount")
    t = cents("l_tax")
    disc = p * (F.lit(100) - d)              # 1e4-scaled
    charge = disc * (F.lit(100) + t)         # 1e6-scaled
    fast = (
        base.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(q).alias("sq"), F.sum(p).alias("sp"),
             F.sum(d).alias("sdis"),
             F.sum(disc).alias("sd"), F.sum(charge).alias("sc"),
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
    a, b = rows(cur), rows(fast)
    print("q1 long-cents identical:", a == b, flush=True)
    if a == b:
        timed("q1_decimal_current", cur, res)
        timed("q1_long_cents", fast, res)
        from mapreduce_4_spark.plans.aggregates import q1_pricing_summary_double
        timed("q1_double_floor", q1_pricing_summary_double(spark, SF_DIR), res)
    else:
        for x, y in zip(a, b):
            if x != y:
                print("  DIFF", x, "\n      ", y)
                break

    # ---------------------------------------------------------------
    # B. clean_text: regexp_replace char-class vs translate
    # ---------------------------------------------------------------
    import string
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    PUNCT = "\n" + string.punctuation  # exactly C-locale ispunct + newline

    cur_clean = F.lower(F.regexp_replace("text", r"[\n!-/:-@\[-`{-~]", ""))
    new_clean = F.lower(F.translate("text", PUNCT, ""))

    cmp = docs.select(
        F.sum(F.when(cur_clean == new_clean, 0).otherwise(1)).alias("ndiff"))
    nd = cmp.collect()[0][0]
    print("clean_text translate identical:", nd == 0, f"(ndiff={nd})", flush=True)

    wc_cur = (docs.select(F.explode(F.split(cur_clean, " ")).alias("word"))
              .filter(F.length("word") > 0)
              .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    wc_new = (docs.select(F.explode(F.split(new_clean, " ")).alias("word"))
              .filter(F.length("word") > 0)
              .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if nd == 0:
        timed("wordcount_regexp_current", wc_cur, res)
        timed("wordcount_translate", wc_new, res)

    # ---------------------------------------------------------------
    # C. rollup / cube: direct vs pre-aggregated
    # ---------------------------------------------------------------
    cur_r = REGISTRY["rollup_lineitem_flags"].builder(spark, SF_DIR)
    li2 = load_table(spark, SF_DIR, "lineitem")
    pre = (li2.groupBy("l_returnflag", "l_linestatus")
           .agg(F.count(F.lit(1)).alias("_n"),
                F.sum(dec("l_quantity")).alias("_sq")))
    roll = (pre.rollup("l_returnflag", "l_linestatus")
            .agg(F.sum("_n").alias("n_items"),
                 F.sum("_sq").cast("double").alias("sum_qty")))
    a, b = rows(cur_r), rows(roll)
    print("rollup pre-agg identical:", a == b, flush=True)
    if a == b:
        timed("rollup_direct_current", cur_r, res)
        timed("rollup_preagg", roll, res)

    cur_c = REGISTRY["cube_orders_status_priority"].builder(spark, SF_DIR)
    od = load_table(spark, SF_DIR, "orders")
    prec = (od.groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sum(dec("o_totalprice")).alias("_sp")))
    cub = (prec.cube("o_orderstatus", "o_orderpriority")
           .agg(F.sum("_n").alias("n_orders"),
                F.sum("_sp").cast("double").alias("revenue")))
    a, b = rows(cur_c), rows(cub)
    print("cube pre-agg identical:", a == b, flush=True)
    if a == b:
        timed("cube_direct_current", cur_c, res)
        timed("cube_preagg", cub, res)

    # ---------------------------------------------------------------
    # D. top_bigrams: transform+slice vs zip_with over shifted arrays
    # ---------------------------------------------------------------
    from mapreduce_4_spark.functions.text import words
    ws = words("text")
    d2 = docs.select(ws.alias("w")).filter(F.size("w") >= 2)
    cur_bi = F.transform(
        F.sequence(F.lit(1), F.size("w") - 1),
        lambda i: F.concat_ws(" ", F.slice("w", i, 2)))
    new_bi = F.zip_with(
        F.slice("w", 1, F.size("w") - 1),
        F.slice("w", 2, F.size("w") - 1),
        lambda x, y: F.concat(x, F.lit(" "), y))
    tb_cur = (d2.select(F.explode(cur_bi).alias("bigram"))
              .groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt")))
    tb_new = (d2.select(F.explode(new_bi).alias("bigram"))
              .groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt")))
    a, b = rows(tb_cur), rows(tb_new)
    print("bigram zip_with identical:", a == b, flush=True)
    if a == b:
        timed("bigrams_transform_slice_current", tb_cur, res)
        timed("bigrams_zip_with", tb_new, res)

    print("\n== results ==")
    for k, v in res.items():
        print(f"{k:45s} {v:.3f}")


if __name__ == "__main__":
    main()

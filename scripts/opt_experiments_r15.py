#!/usr/bin/env python
"""Round-15 optimization experiments: same-session A/B of each candidate
rewrite vs the current registered shape (guide §1 measure-first).

Every variant here is a THROWAWAY copy of the candidate plan; the real
rewrite lands in the package only after the A/B and an oracle re-drive.

Usage: python scripts/opt_experiments_r15.py [arm ...]
Arms: dupngram overlap simhash textrank pq q9q11
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
    return min(ts)


# ---------------------------------------------------------------- dupngram
def dupngram_v2(spark, sf_dir):
    """No gram join-back: per-doc totals from size(w); per-doc unique-gram
    position counts routed via the gram aggregate's min(doc_id) (a gram
    with nd==1 has exactly one owning doc). n_dup = n_grams - uniq."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import ngrams_join, words
    from mapreduce_4_spark.plans.llm_pipeline4 import _DUP_N
    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N
    )
    grams = ngrams_join(F.col("w"), _DUP_N)
    pos = toks.select("doc_id", F.explode(grams).alias("gram"))
    cnt = pos.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    gram_agg = cnt.groupBy("gram").agg(
        F.count(F.lit(1)).alias("nd"),
        F.min("doc_id").alias("owner"),
        F.sum("c").alias("tc"),
    )
    uniq = (
        gram_agg.filter(F.col("nd") == 1)
        .groupBy(F.col("owner").alias("doc_id"))
        .agg(F.sum("tc").alias("uc"))
    )
    total = toks.select(
        "doc_id", (F.size("w") - F.lit(_DUP_N - 1)).cast("long").alias("n_grams")
    )
    return (
        total.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            (F.col("n_grams") - F.coalesce(F.col("uc"), F.lit(0))).alias(
                "n_dup_grams"
            ),
        )
        .select(
            "doc_id", "n_grams", "n_dup_grams",
            (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias(
                "dup_fraction"
            ),
        )
    )


def dupngram_v1_preagg(spark, sf_dir):
    """Keep the join-back but pre-aggregate positions to (doc, gram, c)."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import ngrams_join, words
    from mapreduce_4_spark.plans.llm_pipeline4 import _DUP_N
    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N
    )
    grams = ngrams_join(F.col("w"), _DUP_N)
    pos = toks.select("doc_id", F.explode(grams).alias("gram"))
    cnt = pos.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    gram_df = cnt.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (
        cnt.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(F.lit(0)))
            .alias("n_dup_grams"),
        )
        .select(
            "doc_id", "n_grams", "n_dup_grams",
            (F.col("n_dup_grams").cast("double") / F.col("n_grams")).alias(
                "dup_fraction"
            ),
        )
    )


def arm_dupngram(spark):
    from mapreduce_4_spark.plans import REGISTRY

    cur = REGISTRY["dup_ngram_fraction_docs"].builder(spark, SF_DIR)
    v1 = dupngram_v1_preagg(spark, SF_DIR)
    v2 = dupngram_v2(spark, SF_DIR)
    # equality check (exact: all-integer + one double division)
    import pandas as pd  # noqa: F401

    a = {r["doc_id"]: r for r in cur.collect()}
    for variant, nm in ((v1, "v1"), (v2, "v2")):
        b = {r["doc_id"]: r for r in variant.collect()}
        assert set(a) == set(b), nm
        for k in a:
            assert tuple(a[k]) == tuple(b[k]), (nm, k, a[k], b[k])
    print("# dupngram variants EQUAL", file=sys.stderr)
    timed("dupngram_now", cur)
    timed("dupngram_v1_preagg", v1)
    timed("dupngram_v2_nojoin", v2)


# ---------------------------------------------------------------- overlap
def overlap_v2(spark, sf_dir):
    """collect_set(source) per gram; pairs generated from the sorted set
    array; m from exploding the sets. One corpus-sized shuffle."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import ngrams_join, words
    from mapreduce_4_spark.plans.llm_pipeline4 import _DUP_N
    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select("source", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N
    )
    grams = ngrams_join(F.col("w"), _DUP_N)
    gs = (
        toks.select("source", F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
    )
    m = (
        gs.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("source_a"), y.alias("source_b")),
            ),
        )
    )
    inter = (
        gs.select(F.explode(pair_arr).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ma = m.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    mb = m.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ma), "source_a")
        .join(F.broadcast(mb), "source_b")
        .select(
            "source_a", "source_b", "shared_grams",
            (
                F.col("shared_grams").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_grams"))
            ).alias("gram_jaccard"),
        )
    )


def arm_overlap(spark):
    from mapreduce_4_spark.plans import REGISTRY

    cur = REGISTRY["source_overlap_matrix"].builder(spark, SF_DIR)
    v2 = overlap_v2(spark, SF_DIR)
    a = {(r["source_a"], r["source_b"]): tuple(r) for r in cur.collect()}
    b = {(r["source_a"], r["source_b"]): tuple(r) for r in v2.collect()}
    assert a == b, (len(a), len(b))
    print("# overlap variants EQUAL", file=sys.stderr)
    timed("overlap_now", cur)
    timed("overlap_v2_collectset", v2)


# ---------------------------------------------------------------- simhash
def _sig_packed(docs, lanes_bits: int):
    """Packed-lane simhash chunk table: per-bit vote sums accumulated in
    packed long lanes (lanes_bits=32 -> 2 lanes/long, 16 sums+count;
    lanes_bits=16 -> 4 lanes/long, 8 sums/chunk... computed generically)."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import words

    n_lanes = 64 // lanes_bits          # lanes per long
    per_chunk = 16 // n_lanes           # packed longs per 16-bit chunk
    tok = docs.select("doc_id", F.explode(words("text")).alias("_w"))
    m = F.md5(F.col("_w").cast("binary"))
    vs = [
        F.conv(F.substring(m, 1 + 4 * c, 4), 16, 10).cast("long")
        for c in range(4)
    ]
    # multiply-spread: select bits spaced per_chunk apart, multiply to
    # spread them lanes_bits apart, mask the lane positions. Cross terms
    # never land on (or carry into) a kept lane position (see r15 notes).
    sel = sum(1 << (per_chunk * lane) for lane in range(n_lanes))
    mul = sum(1 << ((lanes_bits - per_chunk) * lane)
              for lane in range(n_lanes))
    keep = sum(1 << (lanes_bits * lane) for lane in range(n_lanes))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in range(4):
        for t in range(per_chunk):
            packed = (
                F.shiftright(vs[c], t).bitwiseAND(F.lit(sel)) * F.lit(mul)
            ).bitwiseAND(F.lit(keep))
            aggs.append(F.sum(packed).alias(f"_p{c}_{t}"))
    acc = tok.groupBy("doc_id").agg(*aggs)
    mask = (1 << lanes_bits) - 1
    chunk_cols = []
    for c in range(4):
        val = F.lit(0).cast("long")
        for r in range(16):
            t, lane = r % per_chunk, r // per_chunk
            s = F.shiftrightunsigned(
                F.col(f"_p{c}_{t}"), lanes_bits * lane
            ).bitwiseAND(F.lit(mask))
            val = val + F.when(s * 2 > F.col("_n"), F.lit(1 << r)).otherwise(0)
        chunk_cols.append(val.alias(f"c{c}"))
    return acc.select("doc_id", *chunk_cols)


def arm_simhash(spark):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.operators import dedup
    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    cur = dedup.simhash_chunks_portable(docs)
    l2 = _sig_packed(docs, 32)
    l4 = _sig_packed(docs, 16)
    a = {r["doc_id"]: tuple(r) for r in cur.collect()}
    for v, nm in ((l2, "lane2"), (l4, "lane4")):
        b = {r["doc_id"]: tuple(r) for r in v.collect()}
        assert a == b, nm
    print("# simhash sig variants EQUAL", file=sys.stderr)
    timed("simhash_sig_now", cur)
    timed("simhash_sig_lane2x32", l2)
    timed("simhash_sig_lane4x16", l4)
    # full query shape via monkeypatch (throwaway): blocks6 banding
    orig = dedup.simhash_chunks_portable
    timed("simhash_blocks6_now",
          dedup.simhash_near_pairs(docs, max_hamming=3, banding="blocks6"))
    timed("simhash_chunk4_now",
          dedup.simhash_near_pairs(docs, max_hamming=3, banding="chunk4"))
    try:
        dedup.simhash_chunks_portable = lambda d, **kw: _sig_packed(d, 32)
        timed("simhash_blocks6_lane2",
              dedup.simhash_near_pairs(docs, max_hamming=3, banding="blocks6"))
        timed("simhash_chunk4_lane2",
              dedup.simhash_near_pairs(docs, max_hamming=3, banding="chunk4"))
        dedup.simhash_chunks_portable = lambda d, **kw: _sig_packed(d, 16)
        timed("simhash_blocks6_lane4",
              dedup.simhash_near_pairs(docs, max_hamming=3, banding="blocks6"))
    finally:
        dedup.simhash_chunks_portable = orig
    # where does blocks6 spend: sig vs banding+join+verify
    n = docs.count()
    RESULTS["n_docs"] = n


# ---------------------------------------------------------------- textrank
def arm_textrank(spark):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.text import words
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.sources import load_table

    cur = REGISTRY["textrank_keywords_docs"].builder(spark, SF_DIR)
    timed("textrank_now", cur)
    # corpus pass alone (adjacent-pair aggregate)
    docs = load_table(spark, SF_DIR, "documents").select(
        words("text").alias("w")).filter(F.size("w") >= 2)
    pairs = docs.select(F.explode(F.expr(
        "transform(sequence(0, size(w) - 2), "
        "i -> struct(least(w[i], w[i+1]) AS a, "
        "greatest(w[i], w[i+1]) AS b))"
    )).alias("p")).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    timed("textrank_corpus_pass", und)
    # plan stats
    plan = cur._jdf.queryExecution().executedPlan().toString()
    RESULTS["textrank_exchanges"] = plan.count("Exchange")
    RESULTS["textrank_reused"] = plan.count("ReusedExchange")


# ---------------------------------------------------------------- pq / ivf
def arm_pq(spark):
    from mapreduce_4_spark.plans import REGISTRY

    pq = REGISTRY["pq_recall_topk"].builder(spark, SF_DIR)
    ivf = REGISTRY["ivf_pq_search_recall"].builder(spark, SF_DIR)
    for nm, df in (("pq_recall", pq), ("ivf_pq", ivf)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        RESULTS[f"{nm}_exchanges"] = plan.count("Exchange")
        RESULTS[f"{nm}_reused"] = plan.count("ReusedExchange")
        RESULTS[f"{nm}_scans"] = plan.count("Scan parquet")
    timed("pq_recall_now", pq)
    timed("ivf_pq_now", ivf)


# ---------------------------------------------------------------- q9/q11
def q9_cents(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.money import cents, dsum_longs
    from mapreduce_4_spark.plans.tpch_partsupp import (
        _supplier_geo,
        derived_partsupp,
    )
    from mapreduce_4_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%")).select("p_partkey")
    )
    geo = _supplier_geo(spark, sf_dir).select("s_suppkey", "n_name")
    ps = derived_partsupp(spark, sf_dir)
    profit_1e4 = (
        cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
        - cents("ps_supplycost") * F.lit(100)
        * F.round("l_quantity").cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(geo), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum_longs(profit_1e4, 4).alias("profit"))
    )


def q11_cents(spark, sf_dir):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.functions.money import cents, dsum_longs
    from mapreduce_4_spark.plans.tpch_partsupp import (
        _supplier_geo,
        derived_partsupp,
    )

    nat_supp = _supplier_geo(spark, sf_dir).filter(
        F.col("n_name") == "NATION_7").select("s_suppkey")
    national = derived_partsupp(spark, sf_dir).join(
        F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
    value_1e2 = cents("ps_supplycost") * F.col("ps_availqty").cast("long")
    by_part = national.groupBy("ps_partkey").agg(
        dsum_longs(value_1e2, 2).alias("part_value"))
    total = national.agg(
        (dsum_longs(value_1e2, 2) * 0.001).alias("threshold"))
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
    )


def arm_q9q11(spark):
    from mapreduce_4_spark.plans import REGISTRY

    for name, vfn in (("q9_product_type_profit", q9_cents),
                      ("q11_important_stock", q11_cents)):
        cur = REGISTRY[name].builder(spark, SF_DIR)
        v = vfn(spark, SF_DIR)
        key = cur.columns[0]
        a = sorted(tuple(r) for r in cur.collect())
        b = sorted(tuple(r) for r in v.collect())
        assert a == b, (name, a[:3], b[:3])
        print(f"# {name} cents variant EQUAL (bit-identical)",
              file=sys.stderr)
        timed(f"{name}_now", cur)
        timed(f"{name}_cents", v)
        del key


ARMS = {
    "dupngram": arm_dupngram,
    "overlap": arm_overlap,
    "simhash": arm_simhash,
    "textrank": arm_textrank,
    "pq": arm_pq,
    "q9q11": arm_q9q11,
}


def main() -> None:
    from mapreduce_4_spark.session import get_spark

    spark = get_spark("opt-experiments-r15")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    names = sys.argv[1:] or list(ARMS)
    for n in names:
        spark.sparkContext.setJobDescription(f"r15-exp: {n}")
        ARMS[n](spark)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()

"""Round-15 optimization equivalence pins.

Each round-15 rewrite claims BIT-IDENTICAL output to the shape it
replaced (the oracle SQL never moved). These tests pin the claims
structurally against a reference re-implementation of the OLD shape,
so a future edit that breaks the equivalence fails here instead of in
a driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mapreduce_4_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_simhash_packed_lanes_equal_per_bit_sums(spark):
    """The packed two-lane vote accumulation must reproduce the
    per-bit-sum signature exactly, doc for doc (operators/dedup.py
    round-15 block comment)."""
    from mapreduce_4_spark.functions.text import words
    from mapreduce_4_spark.operators.dedup import simhash_chunks_portable

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    new = {r["doc_id"]: tuple(r) for r in
           simhash_chunks_portable(docs).collect()}

    # the pre-round-15 shape: one SUM per bit
    tok = docs.select("doc_id", F.explode(words("text")).alias("_w"))
    m = F.md5(F.col("_w").cast("binary"))
    vs = [F.conv(F.substring(m, 1 + 4 * c, 4), 16, 10).cast("long")
          for c in range(4)]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for j in range(64):
        c, r = divmod(j, 16)
        aggs.append(F.sum(
            F.shiftright(vs[c], r).bitwiseAND(F.lit(1))).alias(f"_a{j}"))
    acc = tok.groupBy("doc_id").agg(*aggs)
    chunk_cols = []
    for c in range(4):
        val = F.lit(0).cast("long")
        for r in range(16):
            val = val + F.when(
                F.col(f"_a{16 * c + r}") * 2 > F.col("_n"),
                F.lit(1 << r)).otherwise(0)
        chunk_cols.append(val.alias(f"c{c}"))
    old = {r["doc_id"]: tuple(r) for r in
           acc.select("doc_id", *chunk_cols).collect()}
    assert new == old


def test_simhash_packed_lane_spread_is_carry_free():
    """The multiply-spread constants: for every 16-bit chunk value v
    and shift r, ((v >> r) & 0x101) * (1 + 2^24) & (1 | 2^32) must put
    bit r in lane 0 and bit r+8 in lane 1 — exhaustively, all 2^16
    chunk values x 8 shifts."""
    sel, mul, keep = (1 << 8) | 1, (1 << 24) | 1, (1 << 32) | 1
    for v in range(1 << 16):
        for r in range(8):
            packed = (((v >> r) & sel) * mul) & keep
            assert packed & 0xFFFFFFFF == (v >> r) & 1
            assert packed >> 32 == (v >> (r + 8)) & 1


def test_simhash_packed_band_keys_are_bijective():
    """The single-long band keys are bijections of the old multi-column
    keys (NOT hashes): chunk4 packs (chunk_idx, 16-bit value) into
    idx*2^16+value; blocks6 packs (combo<20, three <=11-bit blocks) into
    combo*2^33 + k0*2^22 + k1*2^11 + k2. Injectivity checked by
    round-tripping the packing over exhaustive index/boundary grids."""
    seen = set()
    for j in range(4):
        for v in (0, 1, 0x7FFF, 0xFFFE, 0xFFFF):
            key = (j << 16) + v
            assert key not in seen
            seen.add(key)
            assert key >> 16 == j and key & 0xFFFF == v
    seen = set()
    for combo in range(20):
        for k0 in (0, 1, 0x7FF):
            for k1 in (0, 2, 0x7FF):
                for k2 in (0, 3, 0x7FF):
                    key = (combo << 33) + (k0 << 22) + (k1 << 11) + k2
                    assert key not in seen
                    seen.add(key)
                    assert (key >> 33, (key >> 22) & 0x7FF,
                            (key >> 11) & 0x7FF, key & 0x7FF) == \
                        (combo, k0, k1, k2)


def test_dup_ngram_no_joinback_equals_joinback(spark):
    """dup_ngram_fraction_docs' ownership-routed shape must equal the
    old position-join-back shape row for row (all-integer arithmetic +
    the same single double division)."""
    from mapreduce_4_spark.functions.text import ngrams_join, words
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.plans.llm_pipeline4 import _DUP_N

    new = {r["doc_id"]: tuple(r) for r in
           REGISTRY["dup_ngram_fraction_docs"].builder(spark, SF).collect()}

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    toks = docs.select("doc_id", words("text").alias("w")).filter(
        F.size("w") >= _DUP_N)
    pos = toks.select(
        "doc_id", F.explode(ngrams_join(F.col("w"), _DUP_N)).alias("gram"))
    gram_df = pos.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    old_df = (
        pos.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
             .alias("n_dup_grams"))
        .select("doc_id", "n_grams", "n_dup_grams",
                (F.col("n_dup_grams").cast("double") / F.col("n_grams"))
                .alias("dup_fraction"))
    )
    old = {r["doc_id"]: tuple(r) for r in old_df.collect()}
    assert new == old


def test_exact_span_window_owner_equals_join_back(spark):
    """exact_span_dedup_docs' in-place window ownership must produce
    the same duplicated-span set as the old owner-aggregate + join-back
    shape, row for row."""
    from mapreduce_4_spark.functions.text import ngrams_join, words
    from mapreduce_4_spark.plans import REGISTRY
    from mapreduce_4_spark.plans.llm_pipeline10 import _SPAN_N

    new = sorted(tuple(r) for r in
                 REGISTRY["exact_span_dedup_docs"].builder(spark, SF).collect())

    docs = load_table(spark, SF, "documents").select(
        "doc_id", words("text").alias("w")).filter(F.size("w") >= _SPAN_N)
    pos = docs.select(
        "doc_id",
        F.posexplode(ngrams_join(F.col("w"), _SPAN_N)).alias("p", "gram"),
    ).select("doc_id", (F.col("p") + 1).cast("long").alias("pos"), "gram")
    own = pos.groupBy("gram").agg(F.min("doc_id").alias("owner"))
    dup = (
        pos.join(own, "gram")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "pos", (F.col("pos") + _SPAN_N - 1).alias("e"))
    )
    prev_end = F.max("e").over(
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1))
    flagged = dup.withColumn(
        "new_span",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-2)) + 1, 1)
        .otherwise(0))
    span_id = F.sum("new_span").over(
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0))
    old_df = (
        flagged.withColumn("span_id", span_id)
        .groupBy("doc_id", "span_id")
        .agg(F.min("pos").alias("span_start"),
             F.max("e").alias("span_end"),
             (F.max("e") - F.min("pos") + 1).alias("span_tokens"))
        .drop("span_id")
    )
    old = sorted(tuple(r) for r in old_df.collect())
    assert new == old


def test_pq_codebook_split_arrays_equal_union_build(spark):
    """The exploded per-subspace codebook (_cb0.._cb3) must carry the
    same (cid, cw) entries in the same order as the old 4-way-union
    (m, cid, cw) array, subspace for subspace."""
    from mapreduce_4_spark.functions.vectors import as_double
    from mapreduce_4_spark.plans.quantization import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _codebook_array,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", as_double("embedding").alias("e"))
    new = _codebook_array(emb).collect()[0]

    seed = (
        emb.orderBy("vec_id").limit(_PQ_K)
        .select(F.row_number().over(Window.orderBy("vec_id")).alias("cid"),
                "e")
    )
    cb = None
    for m in range(_PQ_M):
        part = seed.select(
            "cid", F.lit(m).alias("m"),
            F.slice("e", m * _PQ_SUB + 1, _PQ_SUB).alias("cw"))
        cb = part if cb is None else cb.unionByName(part)
    old = cb.agg(
        F.array_sort(F.collect_list(F.struct("m", "cid", "cw"))).alias("_cb")
    ).collect()[0]["_cb"]

    for m in range(_PQ_M):
        old_m = [(s["cid"], list(s["cw"])) for s in old if s["m"] == m]
        new_m = [(s["cid"], list(s["cw"])) for s in new[f"_cb{m}"]]
        assert new_m == old_m, m

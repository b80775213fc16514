"""Retrieval/ER family: BM25 rank agreement vs the classic ln-idf
variant, and fuzzy-join resolution quality (SURVEY.md §5.2 strategy —
oracle parity is in test_oracle_parity; these pin semantics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import words
from mapreduce_4_spark.plans.retrieval import (
    _QUERY_TERMS,
    _TOP_N,
    bm25_retrieval_docs,
    fuzzy_join_part_names,
)
from mapreduce_4_spark.sources import load_table


def _corpus_stats(spark, sf):
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(words("text")).alias("term"))
    dl = {r["doc_id"]: r["n"] for r in
          tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    tf = {(r["doc_id"], r["term"]): r["n"] for r in
          tok.filter(F.col("term").isin(*_QUERY_TERMS))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
          .collect()}
    df = {t: sum(1 for (d, t2) in tf if t2 == t) for t in _QUERY_TERMS}
    return dl, tf, df


def _score(dl, tf, df, n_docs, avgdl, idf_fn):
    scores = {}
    for (d, t), f_ in tf.items():
        idf = idf_fn(n_docs, df[t])
        tfpart = (f_ * 2.2) / (f_ + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl)))
        scores[d] = scores.get(d, 0.0) + idf * tfpart
    return scores


def test_bm25_matches_python_model_and_ln_variant(spark, sf_oracle):
    dl, tf, df = _corpus_stats(spark, sf_oracle)
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs

    rational = _score(dl, tf, df, n_docs, avgdl,
                      lambda n, d: 1.0 + ((n - d) + 0.5) / (d + 0.5))
    ln = _score(dl, tf, df, n_docs, avgdl,
                lambda n, d: math.log(1.0 + ((n - d) + 0.5) / (d + 0.5)))

    got = bm25_retrieval_docs(spark, sf_oracle).collect()
    assert len(got) == _TOP_N
    # engine scores match the python model of the registered formula
    for r in got:
        assert abs(r["score"] - rational[r["doc_id"]]) < 1e-9, r
    # ranks are ordered and the rank column is 1..N
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, _TOP_N + 1)
    )
    # the rational idf is a monotone transform per term; across summed
    # terms rankings can reorder slightly, so require strong top-set
    # agreement with classic ln-idf BM25 rather than exact order
    top_rational = {r["doc_id"] for r in got}
    top_ln = {d for d, _ in
              sorted(ln.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_N]}
    assert len(top_rational & top_ln) >= int(0.7 * _TOP_N), (
        top_rational, top_ln
    )


def test_fuzzy_join_resolves_every_dirty_row(spark, sf_oracle):
    part = load_table(spark, sf_oracle, "part")
    got = fuzzy_join_part_names(spark, sf_oracle).collect()
    # every dirty record resolves (the original is always a same-block
    # candidate at distance 1), exactly once
    assert len(got) == part.count()
    assert len({r["dirty_key"] for r in got}) == len(got)
    # matches are near (the filter bound) and overwhelmingly recover the
    # original name string (ties on distance can pick an identical name
    # under a different key — still a correct entity match)
    assert all(r["dist"] <= 2 for r in got)
    recovered = sum(1 for r in got if r["name_recovered"]) / len(got)
    assert recovered >= 0.8, recovered

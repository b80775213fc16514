"""textrank_keywords_docs semantics on planted graphs: a hub token that
co-occurs with everything outranks the spokes, the fixed-point ranks
conserve total mass up to floor error, and the planted corpus matches
the generated unrolled-iteration oracle bit-exact."""

from __future__ import annotations

import duckdb

from mapreduce_4_spark.plans import REGISTRY
from mapreduce_4_spark.plans.llm_pipeline10 import _TR_SCALE


def _run(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = REGISTRY["textrank_keywords_docs"].builder(spark, sf)
    return sf, [(r["token"], r["rank_fp"]) for r in out.collect()]


def test_hub_token_outranks_spokes(spark, tmp_path):
    # star graph: "hub" is adjacent to every spoke, spokes only to hub
    _, got = _run(spark, tmp_path, [
        "hub alpha hub beta hub gamma hub delta hub epsilon",
    ])
    assert got[0][0] == "hub"
    ranks = dict(got)
    assert all(ranks["hub"] > ranks[s]
               for s in ("alpha", "beta", "gamma", "delta", "epsilon"))
    # rank mass is conserved up to per-node floor error: each node can
    # lose < 1 unit at its two integer divisions per iteration
    n = len(got)
    assert abs(sum(r for _, r in got) - _TR_SCALE) < 3 * n * 6


def test_self_adjacency_is_not_an_edge(spark, tmp_path):
    # "solo solo solo" has no non-self adjacency; only the pair graph
    # of doc 2 exists
    _, got = _run(spark, tmp_path, ["solo solo solo", "left right"])
    assert sorted(t for t, _ in got) == ["left", "right"]


def test_planted_corpus_matches_unrolled_oracle(spark, tmp_path):
    sf, got = _run(spark, tmp_path, [
        "key scan key sort scan key join",
        "sort join sort key scan scan",
        "lonely words here",
    ])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(
        REGISTRY["textrank_keywords_docs"].oracle).fetchall()]
    assert got == want

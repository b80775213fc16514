"""Property tests for the round-7b pipeline queries: the winnowing
guarantee, block-dedup reconstruction invariants, TVD bounds, and int8
quantization code bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_4_spark.plans import REGISTRY


def test_winnowing_guarantee_shared_span_shares_fingerprint(spark, tmp_path):
    """The winnowing theorem: two documents sharing a span of at least
    k + w - 1 (= 6) tokens must share at least one selected fingerprint.
    Probed with a planted 8-token shared span inside otherwise-different
    documents."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight nine ten {shared} eleven twelve"),
            (3, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["winnow_fingerprints_docs"].builder(spark, sf).collect()
    }
    # fp_checksum is SUM(DISTINCT wmin) — not a set equality proof, but
    # the guarantee is about intersection; recompute the selected sets
    # via the builder's own lineage at row level instead:
    from mapreduce_4_spark.plans.llm_pipeline6 import _WIN_K, _WIN_W
    from mapreduce_4_spark.functions.text import words
    from mapreduce_4_spark.operators.dedup import _base31
    from pyspark.sql import Window

    toks = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", words("text").alias("w"))
        .filter(F.size("w") >= _WIN_K + _WIN_W - 1)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("w") - (_WIN_K - 1)),
        lambda i: F.concat_ws(" ", F.slice("w", i, _WIN_K)),
    )
    pos = toks.select(
        "doc_id",
        (F.size("w") - (_WIN_K - 1)).cast("long").alias("n_grams"),
        F.posexplode(F.transform(grams, _base31)).alias("p", "h"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    sel = (
        pos.withColumn("wmin", F.min("h").over(win))
        .filter(F.col("p") <= F.col("n_grams") - _WIN_W)
        .select("doc_id", "wmin")
        .distinct()
        .collect()
    )
    sets: dict[int, set] = {}
    for r in sel:
        sets.setdefault(r["doc_id"], set()).add(r["wmin"])
    assert sets[1] & sets[2], "shared 8-token span must share a fingerprint"
    assert not (sets[1] & sets[3])
    # and the registered digest agrees with the recomputed set sizes
    for d in (1, 2, 3):
        assert out[d]["n_fingerprints"] == len(sets[d])


def test_block_dedup_reconstruction_invariants(spark, sf_oracle):
    rows = REGISTRY["block_dedup_docs"].builder(spark, sf_oracle).collect()
    assert rows
    total_blocks = sum(r["n_blocks"] for r in rows)
    total_kept = sum(r["n_kept_blocks"] for r in rows)
    assert 0 < total_kept <= total_blocks
    for r in rows:
        assert 0 <= r["n_kept_blocks"] <= r["n_blocks"]
        assert 0 <= r["n_tokens_kept"] <= r["n_tokens"]
        assert 0.0 <= r["kept_token_fraction"] <= 1.0
    # the globally first doc (id 0) can only lose blocks to ITSELF
    # (within-doc repeats), never to later docs — with distinct blocks it
    # keeps everything; weaker universal check: kept >= 1 for doc 0
    d0 = next(r for r in rows if r["doc_id"] == 0)
    assert d0["n_kept_blocks"] >= 1


def test_source_token_drift_bounds_and_degenerate_case(spark, sf_oracle,
                                                       tmp_path):
    rows = REGISTRY["source_token_drift"].builder(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert 0 < r["vocab_used"] <= r["vocab_total"]
    # single-source corpus: the source IS the corpus, drift must be 0
    one = spark.createDataFrame(
        [(1, "a b c a", "en", "only", 7), (2, "b c d", "en", "only", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path)
    one.write.parquet(f"{sf}/documents.parquet")
    got = REGISTRY["source_token_drift"].builder(spark, sf).collect()
    assert len(got) == 1 and got[0]["tvd"] == 0.0


def test_quantize_recall_bounds(spark, sf_oracle):
    rows = REGISTRY["embedding_quantize_recall"].builder(
        spark, sf_oracle
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_true"] == 10
        assert 0 <= r["n_hit"] <= 10
        assert abs(r["recall_at_10"] - r["n_hit"] / 10) < 1e-12

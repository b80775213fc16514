"""Chunking must cover every document: dropping each chunk's overlap
prefix and concatenating in index order reassembles the original text."""

from __future__ import annotations

from mapreduce_4_spark.operators.text_analysis import chunk_text
from mapreduce_4_spark.sources import load_table

CHUNK, OVERLAP = 120, 24


def test_chunks_reassemble_exactly(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    out = chunk_text(docs, chunk_chars=CHUNK, overlap=OVERLAP)
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict[int, dict[int, str]] = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
        assert len(r["chunk"]) <= CHUNK
    assert by_doc.keys() == originals.keys()
    for doc_id, chunks in by_doc.items():
        idxs = sorted(chunks)
        assert idxs == list(range(len(idxs)))
        rebuilt = chunks[0] + "".join(chunks[i][OVERLAP:] for i in idxs[1:])
        assert rebuilt == originals[doc_id], doc_id
        # neighboring chunks really share the overlap region
        for i in idxs[1:]:
            assert chunks[i][:OVERLAP] == chunks[i - 1][CHUNK - OVERLAP:][:OVERLAP]


def test_rolling_fingerprints_order_sensitive(spark):
    """Both hash-chain fingerprints distinguish token ORDER (unlike a
    set/bag hash) and are deterministic on nulls/empties."""
    from mapreduce_4_spark.operators.text_analysis import (
        fingerprint_chain_md5,
        fingerprint_rolling,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: (r["fp64"], r["fp_chain"])
        for r in df.select(
            "doc_id",
            fingerprint_rolling("text").alias("fp64"),
            fingerprint_chain_md5("text").alias("fp_chain"),
        ).collect()
    }
    assert rows[1][0] != rows[2][0] and rows[1][1] != rows[2][1]
    assert rows[3] == (0, "")  # empty -> fold inits

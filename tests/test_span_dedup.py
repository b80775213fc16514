"""exact_span_dedup_docs semantics on planted fixtures: ownership
(min-doc_id keeps, others flagged), maximal-span merging of overlapping
AND adjacent removal intervals, and oracle parity on the same planted
corpus (independent of the sf fixtures test_oracle_parity replays)."""

from __future__ import annotations

import duckdb

from mapreduce_4_spark.plans import REGISTRY

SPAN_A = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
SPAN_B = "kappa lam mu nu xi omicron pi rho"              # 8 tokens


def _run(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")
    out = REGISTRY["exact_span_dedup_docs"].builder(spark, sf)
    return sf, sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in out.collect()
    )


def test_owner_keeps_and_dup_doc_gets_one_maximal_span(spark, tmp_path):
    # doc 1 owns the span (tokens 4-11); doc 2 carries it at tokens 5-12
    _, got = _run(spark, tmp_path, [
        (1, f"one two three {SPAN_A} four five"),
        (2, f"seven eight nine ten {SPAN_A} eleven twelve"),
        (3, "completely different words with no overlap at all here"),
    ])
    # owner emits nothing; doc 2's five overlapping 4-gram removal
    # intervals (positions 5..9) merge into ONE maximal span 5..12
    assert got == [(2, 5, 12, 8)]


def test_adjacent_spans_fuse_and_gapped_spans_stay_separate(
    spark, tmp_path
):
    # doc 1 owns both spans; doc 2 carries them back-to-back (adjacent
    # removal intervals -> ONE fused span); doc 3 carries them with a
    # 3-token unique gap (-> TWO spans)
    _, got = _run(spark, tmp_path, [
        (1, f"zero {SPAN_A} filler words here {SPAN_B} ending"),
        (2, f"intro {SPAN_A} {SPAN_B} outro"),
        (3, f"start {SPAN_A} gapx gapy gapz {SPAN_B} finish"),
    ])
    assert got == [
        # doc 2: A at 2-9, B at 10-17 — fused into 2..17
        (2, 2, 17, 16),
        # doc 3: A at 2-9, gap 10-12, B at 13-20 — two islands
        (3, 2, 9, 8),
        (3, 13, 20, 8),
    ]


def test_within_owner_repetition_is_not_flagged(spark, tmp_path):
    # the shared span appears TWICE in the owner doc and once in doc 2:
    # ownership is doc-level, so both owner occurrences stay unflagged
    _, got = _run(spark, tmp_path, [
        (1, f"one {SPAN_A} two {SPAN_A} three"),
        (2, f"other {SPAN_A} stuff"),
    ])
    assert got == [(2, 2, 9, 8)]


def test_oracle_parity_on_planted_fixture(spark, tmp_path):
    sf, got = _run(spark, tmp_path, [
        (1, f"zero {SPAN_A} filler words here {SPAN_B} ending"),
        (2, f"intro {SPAN_A} {SPAN_B} outro"),
        (3, f"start {SPAN_A} gapx gapy gapz {SPAN_B} finish"),
        (4, "completely different words with no overlap at all here"),
    ])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in
        con.execute(REGISTRY["exact_span_dedup_docs"].oracle).fetchall()
    )
    assert got == want

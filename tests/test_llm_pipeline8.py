"""Tests for the round-8b queries (plans/llm_pipeline8.py): containment
prefix-filter losslessness + the scale-shaping plan properties of the
broadcast-side embedding queries, plus VARIANT surface invariants.

Oracle parity for all six registered queries is covered by the blanket
replay in tests/test_oracle_parity.py; these tests pin the operator-level
guarantees that parity alone can't (losslessness on adversarial corpora,
hot-gram behaviour, broadcast plan shape).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _sh_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, shingles array<string>"
    )


def _brute_containment(rows, threshold):
    """Driver-side ordered-pair containment oracle for tiny corpora."""
    out = {}
    for ida, la, sa in rows:
        for idb, lb, sb in rows:
            if ida == idb or la != lb:
                continue
            a, b = set(sa), set(sb)
            c = len(a & b) / len(a)
            if c >= threshold:
                out[(ida, idb)] = c
    return out


def test_containment_prefix_filter_is_lossless(spark):
    """Every ordered pair with |A∩B|/|A| >= t survives the one-sided
    prefix filter — including the asymmetric shape Jaccard misses: a
    small doc fully contained in a much larger one."""
    from mapreduce_4_spark.operators.dedup import (
        prefix_filtered_containment_pairs,
    )

    rng = random.Random(42)
    vocab = [f"g{i}" for i in range(30)]
    rows = []
    for i in range(35):
        m = rng.randint(3, 12)
        rows.append((i, rng.choice(["en", "de"]), rng.sample(vocab, m)))
    # small-doc-in-big-doc: containment 1.0, Jaccard only 4/20
    rows.append((100, "en", vocab[:4]))
    rows.append((101, "en", vocab[:20]))
    # boundary: |A|=5, shares exactly 4 with B -> containment 0.8
    rows.append((102, "en", vocab[:4] + ["only_a"]))
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in prefix_filtered_containment_pairs(
            _sh_df(spark, rows), threshold=0.8, block_col="lang"
        ).collect()
    }
    want = _brute_containment(rows, 0.8)
    assert (100, 101) in want and want[(100, 101)] == 1.0
    assert (102, 101) in want and want[(102, 101)] == pytest.approx(0.8)
    assert got == pytest.approx(want)


def test_containment_lossless_many_seeds(spark):
    from mapreduce_4_spark.operators.dedup import (
        prefix_filtered_containment_pairs,
    )

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(15)]
        rows = [
            (i, "en", rng.sample(vocab, rng.randint(1, 12)))
            for i in range(25)
        ]
        for thr in (0.6, 0.8):
            got = {
                (r["id_a"], r["id_b"]): r["containment"]
                for r in prefix_filtered_containment_pairs(
                    _sh_df(spark, rows), thr, block_col="lang"
                ).collect()
            }
            want = _brute_containment(rows, thr)
            assert got == pytest.approx(want), f"seed={seed} thr={thr}"


def test_containment_is_asymmetric(spark):
    """A contained-in B does not imply B contained-in A: the big doc's
    own containment in the small one is below threshold and must NOT be
    emitted."""
    from mapreduce_4_spark.operators.dedup import (
        prefix_filtered_containment_pairs,
    )

    vocab = [f"g{i}" for i in range(20)]
    rows = [(1, "en", vocab[:4]), (2, "en", vocab)]
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filtered_containment_pairs(
            _sh_df(spark, rows), threshold=0.8, block_col="lang"
        ).collect()
    }
    assert got == {(1, 2)}


def test_embedding_broadcast_queries_plan_shape(spark, sf_smoke):
    """The three new embedding queries must broadcast the tiny side
    (bench / centroid / query set) — never shuffle or replicate the
    corpus. BroadcastNestedLoopJoin with the SMALL side broadcast is the
    accepted physical op for the non-equi pairing (same posture as
    similarity_bruteforce_topk, PLANS.md Cart* rows)."""
    from mapreduce_4_spark.plans.llm_pipeline8 import (
        knn_label_vote_eval,
        semantic_decontam_embeddings,
        topic_assign_centroids,
    )

    for q in (semantic_decontam_embeddings, topic_assign_centroids,
              knn_label_vote_eval):
        plan = q(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan, q.__name__
        assert "CartesianProduct" not in plan, (
            f"{q.__name__}: corpus-side cartesian — would replicate the "
            "corpus at scale"
        )


def test_quality_linear_score_keep_splits(spark, sf_oracle):
    """The fixed-weight margin must separate the corpus into BOTH
    classes at sf0.01 (a degenerate all-keep/all-drop threshold would
    make the query vacuous)."""
    from mapreduce_4_spark.plans.llm_pipeline8 import quality_linear_score_docs

    counts = dict(
        quality_linear_score_docs(spark, sf_oracle)
        .groupBy("keep").count().collect()
    )
    assert set(counts) == {True, False}


def test_semantic_decontam_flags_nonempty_and_bounded(spark, sf_oracle):
    from mapreduce_4_spark.plans.llm_pipeline8 import (
        _DECON_MOD,
        semantic_decontam_embeddings,
    )

    df = semantic_decontam_embeddings(spark, sf_oracle)
    rows = df.collect()
    n_corpus = sum(1 for _ in rows)
    flagged = [r for r in rows if r["contaminated"]]
    assert 0 < len(flagged) < n_corpus
    # every nearest id really is a benchmark member
    assert all(r["nearest_bench_id"] % _DECON_MOD == 0 for r in rows)
    assert all(-1.0 <= r["max_cos"] <= 1.0 for r in rows)


def test_topic_assignment_covers_all_topics(spark, sf_oracle):
    from mapreduce_4_spark.plans.llm_pipeline8 import (
        _TOPIC_CENTROIDS,
        topic_assign_centroids,
    )

    df = topic_assign_centroids(spark, sf_oracle)
    topics = {r["topic_id"] for r in df.select("topic_id").distinct().collect()}
    assert topics <= set(_TOPIC_CENTROIDS)
    # with 495 vectors over 5 random-ish centroids every topic is hit
    assert len(topics) == len(_TOPIC_CENTROIDS)
    # centroids themselves are not assigned
    assigned = {r["vec_id"] for r in df.select("vec_id").collect()}
    assert assigned.isdisjoint(_TOPIC_CENTROIDS)


def test_variant_extract_typed_values(spark, sf_oracle):
    """VARIANT extraction: typed int == string-cast int, misses are
    NULL, buckets in range."""
    from mapreduce_4_spark.plans.llm_pipeline8 import variant_extract_events

    df = variant_extract_events(spark, sf_oracle)
    bad = df.filter(
        (F.col("k").cast("string") != F.col("k_str"))
        | F.col("missing_k").isNotNull()
        | (F.col("k_bucket") < 0) | (F.col("k_bucket") > 9)
        | F.col("k").isNull()
    ).count()
    assert bad == 0


def test_knn_vote_contract(spark, sf_oracle):
    """Each seeded query yields exactly one prediction; vote counts are
    within [1, K]; `correct` is consistent with the labels."""
    from mapreduce_4_spark.plans.llm_pipeline8 import (
        _KNN_K,
        _KNN_MOD,
        knn_label_vote_eval,
    )

    rows = knn_label_vote_eval(spark, sf_oracle).collect()
    qids = [r["query_id"] for r in rows]
    assert len(qids) == len(set(qids))
    assert all(q % _KNN_MOD == 0 for q in qids)
    assert all(1 <= r["n_votes"] <= _KNN_K for r in rows)
    assert all(
        r["correct"] == (r["predicted_label"] == r["true_label"])
        for r in rows
    )

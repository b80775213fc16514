"""Property-based fuzzing (hypothesis) of the reference-fidelity
tokenizer: for arbitrary ASCII/Latin-1 corpora, the Spark pipeline must
equal the pure-Python model of the reference exactly (SURVEY.md §5.2).

One Spark job per hypothesis example is too slow, so each example is a
whole corpus batch — hypothesis shrinks over corpora, Spark runs once
per example.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_wordcount_golden import _reference_tokens

# ASCII printable + tab + Latin-1 letters; the reference's C-locale
# tolower is ASCII-only, and exotic Unicode lowercasing (final sigma,
# Turkish I) legitimately differs between JVM and Python — out of the
# fidelity contract.
_ALPHABET = st.characters(
    codec="latin-1", min_codepoint=0x09, exclude_categories=("Cc",),
) | st.sampled_from(list(" \t  ..,!?'\"--"))

_corpora = st.lists(
    st.text(alphabet=_ALPHABET, max_size=80), min_size=1, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpora)
def test_tokenizer_fuzz_matches_reference_model(spark, texts):
    from mapreduce_4_spark.plans.wordcount import exploded_words

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = Counter(
        (r["doc_id"], r["word"]) for r in exploded_words(df).collect()
    )
    expected = Counter(
        (i, tok) for i, t in enumerate(texts) for tok in _reference_tokens(t)
    )
    assert got == expected


def _py_kmeans_fixedpoint(points: dict[int, list[int]], k: int, iters: int):
    """Pure-Python model of the fixed-point Lloyd contract: integer
    squared-L2, ties to the lowest cluster id, floor-division (toward
    zero, matching Spark `div` on the non-negative sums the operator
    guarantees via quantization offset — the fuzz feeds non-negative
    coords) centroid updates, empty clusters keep their previous
    centroid, seeds = the k smallest ids in id order."""
    ids = sorted(points)
    cents = {j: list(points[i]) for j, i in enumerate(ids[:k])}

    def assign():
        out = {}
        for i in ids:
            best = min(
                (sum((a - b) ** 2 for a, b in zip(points[i], c)), j)
                for j, c in cents.items()
            )
            out[i] = best[::-1]  # (cluster, dist2)
        return out

    for _ in range(iters):
        a = assign()
        for j in list(cents):
            members = [points[i] for i in ids if a[i][0] == j]
            if members:
                n = len(members)
                cents[j] = [sum(col) // n for col in zip(*members)]
    return assign()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=0, max_value=1000), min_size=3,
                 max_size=3),
        min_size=4, max_size=14,
    ),
    k=st.integers(min_value=1, max_value=4),
    iters=st.integers(min_value=0, max_value=3),
)
def test_kmeans_fixedpoint_fuzz_matches_python_model(spark, vecs, k, iters):
    """For arbitrary small non-negative integer corpora, the distributed
    fixed-point Lloyd operator must equal the sequential Python model
    exactly — every iteration, not just the fixture path the oracle
    replays (tests/test_oracle_parity.py)."""
    from mapreduce_4_spark.operators.clustering import kmeans_fixedpoint

    points = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        list(points.items()), "id long, q array<bigint>"
    )
    got = {
        r["id"]: (r["cluster"], r["dist2"])
        for r in kmeans_fixedpoint(df, k=k, iters=iters).collect()
    }
    assert got == _py_kmeans_fixedpoint(points, k, iters)

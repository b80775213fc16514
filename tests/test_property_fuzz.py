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

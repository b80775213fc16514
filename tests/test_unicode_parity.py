"""Engine-parity on non-ASCII input: the fixtures are ASCII word soup,
but the oracle contract (identical tokenizer regex, identical length
semantics) must also hold on unicode text — accents, CJK, emoji,
combining marks. Each case builds a documents table with unicode
content and replays registered text queries against their DuckDB
oracles bit-exact."""

from __future__ import annotations

import os
import shutil

import pytest

from mapreduce_4_spark.plans import REGISTRY
from tests.oracle import TABLES, compare

_UNICODE_DOCS = [
    (0, "café naïve fiancée déjà vu café", "fr", "src0"),
    (1, "straße größe weiß straße", "de", "src0"),
    (2, "日本語 の テスト 文書 です 日本語", "ja", "src1"),
    (3, "mixed ascii and café and 日本語 words", "en", "src1"),
    (4, "emoji 🎉 party 🎉 emoji rows", "en", "src2"),
    (5, "combining á mark vs precomposed á forms", "en", "src2"),
    (6, "tabs\tsurvive the single space split", "en", "src3"),
    (7, "punct! stays? stripped; but accents café rest", "en", "src3"),
]

#: text queries whose semantics must survive unicode unchanged. The
#: heavier dedup/LSH tiers share the same tokenizer, so parity here
#: covers their text-side behavior too.
_QUERIES = [
    "text_stats_docs",
    "token_counts_docs",
    "doc_fingerprint_md5",
    "top_bigrams",
    "char_diversity_docs",
    "winnow_fingerprints_docs",
    "block_dedup_docs",
    "source_token_drift",
    "bpe_top_pairs",
    "dedup_exact_docs",
]


@pytest.fixture(scope="module")
def unicode_sf(spark, sf_smoke, tmp_path_factory) -> str:
    sf = str(tmp_path_factory.mktemp("unicode_sf"))
    for t in TABLES:
        shutil.copy(f"{sf_smoke}/{t}.parquet", f"{sf}/{t}.parquet")
    os.remove(f"{sf}/documents.parquet")
    docs = spark.createDataFrame(
        [(i, txt, lang, src, len(txt)) for i, txt, lang, src in _UNICODE_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{sf}/tmp_docs")
    import glob

    part = glob.glob(f"{sf}/tmp_docs/part-*.parquet")[0]
    shutil.move(part, f"{sf}/documents.parquet")
    shutil.rmtree(f"{sf}/tmp_docs")
    return sf


@pytest.mark.parametrize("name", _QUERIES)
def test_unicode_text_parity(spark, unicode_sf, name):
    spec = REGISTRY[name]
    compare(spec.builder(spark, unicode_sf), spec.oracle, unicode_sf)


# --- hypothesis fuzz: random corpora must stay bit-exact vs DuckDB ----

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_FUZZ_ALPHABET = st.characters(
    codec="latin-1", min_codepoint=0x09, exclude_categories=("Cc",),
) | st.sampled_from(list(" \t àé .,!?'\"-"))

_fuzz_corpora = st.lists(
    st.text(alphabet=_FUZZ_ALPHABET, max_size=60), min_size=1, max_size=8
)

_FUZZ_QUERIES = ["winnow_fingerprints_docs", "block_dedup_docs",
                 "source_token_drift", "bpe_top_pairs",
                 "udtf_dynamic_leading_words"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(texts=_fuzz_corpora)
def test_fuzz_oracle_parity_on_random_corpora(spark, sf_smoke, texts):
    """For arbitrary latin-1 corpora (including empty/whitespace-only
    docs and punctuation soup) the four newest text queries must still
    hash-match DuckDB — the parity contract can't depend on the
    fixture's shape."""
    import tempfile

    sf = tempfile.mkdtemp(prefix="fuzz_sf_")
    try:
        for t in TABLES:
            shutil.copy(f"{sf_smoke}/{t}.parquet", f"{sf}/{t}.parquet")
        os.remove(f"{sf}/documents.parquet")
        rows = [
            (i, t, "en" if i % 2 else "de", f"src{i % 3}", len(t))
            for i, t in enumerate(texts)
        ]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        docs.coalesce(1).write.parquet(f"{sf}/tmp_docs")
        import glob

        part = glob.glob(f"{sf}/tmp_docs/part-*.parquet")[0]
        shutil.move(part, f"{sf}/documents.parquet")
        shutil.rmtree(f"{sf}/tmp_docs")
        for name in _FUZZ_QUERIES:
            spec = REGISTRY[name]
            compare(spec.builder(spark, sf), spec.oracle, sf)
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_udtf_dynamic_leading_words_whitespace_edges(spark, sf_smoke):
    """r13 advice: the UDTF splits with str.split() (ALL whitespace,
    no empty tokens), so the oracle must strip leading/trailing \\t and
    \\n too — DuckDB trim() strips only spaces, which yielded phantom
    ''-tokens on e.g. 'foo\\n'. Pinned here on a corpus the sf fixtures
    don't cover: tabs, newlines, CRs, and whitespace-only docs."""
    import glob
    import tempfile

    _EDGE_TEXTS = [
        "plain space separated words",
        "leading\tand trailing tabs\t",
        "\nnewline led doc\n",
        "\r\n crlf mix \t inner\truns \r\n",
        "   ",        # whitespace-only: zero tokens
        "",           # empty: zero tokens
        "\tone\t",    # single token fenced by tabs
        "two\n\nwords",
        "nbsp\u00a0is not a separator",   # NBSP: ONE token each side
        "\u00a0leading nbsp stays",        # ASCII contract: not stripped
        "em\u2003space also glues",        # U+2003 EM SPACE
    ]
    sf = tempfile.mkdtemp(prefix="ws_sf_")
    try:
        for t in TABLES:
            shutil.copy(f"{sf_smoke}/{t}.parquet", f"{sf}/{t}.parquet")
        os.remove(f"{sf}/documents.parquet")
        docs = spark.createDataFrame(
            [(i, t, "en", f"src{i % 2}", len(t))
             for i, t in enumerate(_EDGE_TEXTS)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        docs.coalesce(1).write.parquet(f"{sf}/tmp_docs")
        part = glob.glob(f"{sf}/tmp_docs/part-*.parquet")[0]
        shutil.move(part, f"{sf}/documents.parquet")
        shutil.rmtree(f"{sf}/tmp_docs")
        spec = REGISTRY["udtf_dynamic_leading_words"]
        compare(spec.builder(spark, sf), spec.oracle, sf)
    finally:
        shutil.rmtree(sf, ignore_errors=True)

"""Golden reference-fidelity test (SURVEY.md §5.2).

Reproduces the reference's exact O3/O4/O9 semantics in pure Python —
drop '\\n' and C-locale ispunct chars, lowercase, split on a single
space (tabs survive), drop empty tokens, count per document, never
merging across documents — and checks the Spark plan byte-for-byte.
"""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from mapreduce_4_spark.plans.wordcount import wordcount_per_doc

_ASCII_PUNCT = set(r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""")


def _reference_clean(line: str) -> str:
    # Mapper::lowerRemovePunc: remove '\n', remove ispunct, tolower
    return "".join(
        c.lower() for c in line if c != "\n" and c not in _ASCII_PUNCT
    )


def _reference_tokens(line: str) -> list[str]:
    # Mapper::tokenize: getline on ' ' only; skip empty tokens
    return [t for t in _reference_clean(line).split(" ") if t]


def test_wordcount_matches_pure_python_reference(spark, sf_smoke):
    table = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    expected: Counter = Counter()
    for doc_id, text in zip(
        table.column("doc_id").to_pylist(), table.column("text").to_pylist()
    ):
        for tok in _reference_tokens(text):
            expected[(doc_id, tok)] += 1

    got = {
        (r["doc_id"], r["word"]): r["cnt"]
        for r in wordcount_per_doc(spark, sf_smoke).collect()
    }
    assert got == dict(expected)


def test_tokenizer_edge_cases(spark):
    # mixed case, punct adjacent to letters, space runs, tabs, non-ASCII
    rows = [
        (1, "Hello, World!  double  space"),
        (2, "tab\tinside token"),
        (3, "...only punct..."),
        (4, "Café naïve UPPER"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from mapreduce_4_spark.plans.wordcount import exploded_words

    got = sorted((r["doc_id"], r["word"]) for r in exploded_words(df).collect())
    expected = sorted(
        (doc_id, tok) for doc_id, text in rows for tok in _reference_tokens(text)
    )
    assert got == expected
    # the load-bearing fidelity details:
    assert (2, "tab\tinside") in got          # tab not a separator
    assert not any(w == "" for _, w in got)   # empties dropped
    assert (3, "") not in got

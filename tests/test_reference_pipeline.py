"""Byte-level golden test for the complete reference pipeline: plaintext
corpus in, final_output/ text tree out, compared line-for-line against a
pure-Python model of the reference (SURVEY.md §2.1 end-to-end semantics).
"""

from __future__ import annotations

import glob
from collections import Counter

from mapreduce_4_spark.pipelines import reference_wordcount_pipeline

from .test_wordcount_golden import _reference_tokens

CORPUS = {
    "a.txt": "Hello, World!\nHello again  world\n",
    "b.txt": "Tab\there stays; spaces   split\n\nUPPER lower MiXeD\n",
    "c.txt": "...punct only...\n!!!\n",
    "d.txt": "!!! ... ???\n",
}


def _expected_lines(text: str) -> list[str]:
    counts: Counter = Counter()
    for line in text.splitlines():
        counts.update(_reference_tokens(line))
    # reference emits (word,count) sorted by word — std::map iteration
    return [f"({w},{c})" for w, c in sorted(counts.items())]


def test_pipeline_reproduces_reference_output_bytes(spark, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for name, text in CORPUS.items():
        (corpus / name).write_text(text)
    out = tmp_path / "final_output"
    reference_wordcount_pipeline(spark, str(corpus), str(out))

    for name, text in CORPUS.items():
        part_files = sorted(glob.glob(f"{out}/doc_id={name}/part-*"))
        got = []
        for f in part_files:
            with open(f) as fh:
                got += [ln.rstrip("\n") for ln in fh if ln.strip()]
        expected = _expected_lines(text)
        assert got == expected, (name, got, expected)

    # a file with no surviving tokens produces no entries (reference
    # emits an empty map -> no lines)
    d_files = glob.glob(f"{out}/doc_id=d.txt/part-*")
    d_lines = [ln for f in d_files for ln in open(f) if ln.strip()]
    assert d_lines == []

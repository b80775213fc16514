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


def test_stage_artifacts_reproduce_mapper_and_shuffler_trees(spark, tmp_path):
    """The intermediate temp_mapper/ and temp_shuffler/ trees, diffable
    byte-for-byte against a pure-Python model of the reference's stage
    files (partition rule forced to 2 lines to exercise multi-partition
    files without a 2000-line corpus)."""
    from mapreduce_4_spark.pipelines import reference_stage_artifacts_pipeline

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    for name, text in CORPUS.items():
        (corpus / name).write_text(text)
    mdir, sdir, fdir = (str(tmp_path / d) for d in
                        ("temp_mapper", "temp_shuffler", "final_output"))
    reference_stage_artifacts_pipeline(
        spark, str(corpus), mdir, sdir, fdir, lines_per_partition=2
    )

    def _tree_lines(root, doc, part):
        files = sorted(glob.glob(f"{root}/doc_id={doc}/part_id={part}/part-*"))
        return [ln.rstrip("\n") for f in files for ln in open(f) if ln.strip()]

    for name, text in CORPUS.items():
        lines = text.splitlines()
        parts = {}
        for i, line in enumerate(lines):
            parts.setdefault(i // 2, []).append(line)
        for pid, plines in parts.items():
            toks = [t for ln in plines for t in _reference_tokens(ln)]
            # mapper tree: (word,1) in emission order
            expected_mapper = [f"({t},1)" for t in toks]
            got_mapper = _tree_lines(mdir, name, pid)
            if expected_mapper:
                assert got_mapper == expected_mapper, (name, pid, got_mapper)
            else:
                assert got_mapper == []
            # shuffler tree: (word,count) per partition, sorted by word
            expected_shuf = [
                f"({w},{c})" for w, c in sorted(Counter(toks).items())
            ]
            got_shuf = _tree_lines(sdir, name, pid)
            assert got_shuf == expected_shuf, (name, pid, got_shuf)

    # final_output unchanged by the stage-artifact variant
    for name, text in CORPUS.items():
        files = sorted(glob.glob(f"{fdir}/doc_id={name}/part-*"))
        got = [ln.rstrip("\n") for f in files for ln in open(f) if ln.strip()]
        assert got == _expected_lines(text), name

"""Streaming corpus ingestion with online near-dup dedup
(streaming/ingest.py): the availableNow replay must equal the
sequential batch composition of minhash_incremental_neardup + the
within-batch keep rule, the corpus and its index must stay in lockstep,
and a crash between the two publishes must repair idempotently."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.dedup import (
    minhash_incremental_neardup,
    minhash_near_duplicates,
)
from mapreduce_4_spark.sources.versioned import (
    latest_version,
    read_manifest,
    read_version,
)
from mapreduce_4_spark.streaming.ingest import dedup_ingest_sink

_BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "spark shuffles hash partitions across executors for wide joins",
    "minhash signatures approximate jaccard similarity between shingle sets",
    "column pruning pushes projection into the parquet scan footer stats",
    "watermarks bound streaming state for session window aggregation",
    "broadcast joins replicate the small dimension to every executor",
]


def _mk_batches(spark):
    """Three batches with planted near-dups: batch2 repeats batch1 docs
    verbatim (cross-batch dups), batch3 perturbs one word (still above
    the 0.8 shingle-jaccard bar for these lengths? no — verbatim only)
    and adds genuinely new docs; batch1 contains one within-batch dup."""
    rows1 = [(i, _BASE_TEXTS[i]) for i in range(4)]
    rows1.append((100, _BASE_TEXTS[0]))  # within-batch dup of doc 0
    rows2 = [(200 + i, _BASE_TEXTS[i]) for i in range(2)]  # dups of corpus
    rows2.append((250, _BASE_TEXTS[4]))  # new
    rows3 = [(300, _BASE_TEXTS[5]), (301, _BASE_TEXTS[4])]  # one new, one dup
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    return [mk(rows1), mk(rows2), mk(rows3)]


def _expected_sequential(spark, batches, threshold=0.8):
    """The batch twin: fold batches through within-batch keep rule +
    minhash_incremental_neardup against the accumulated corpus."""
    corpus = None
    for b in batches:
        pairs = minhash_near_duplicates(b, threshold=threshold)
        dominated = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        survivors = b.join(dominated, "doc_id", "left_anti")
        if corpus is not None:
            matched = (
                minhash_incremental_neardup(corpus, survivors,
                                            threshold=threshold)
                .select(F.col("delta_id").alias("doc_id"))
                .distinct()
            )
            survivors = survivors.join(matched, "doc_id", "left_anti")
            corpus = corpus.unionByName(survivors)
        else:
            corpus = survivors
    return corpus


def _run_stream(spark, src_dir, ckpt, sink):
    from mapreduce_4_spark.streaming.foreach_batch import run_foreach_batch

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    run_foreach_batch(stream, sink, ckpt)


def test_streaming_ingest_equals_sequential_batch_twin(spark, tmp_path):
    batches = _mk_batches(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{src}/b{i}")
        # flatten: move part files up so maxFilesPerTrigger=1 sees 3 files
    # parquet dirs inside a stream source are fine; use file-per-batch
    # layout instead: rewrite as single files
    import glob
    import shutil
    for i in range(len(batches)):
        part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
        shutil.move(part, f"{src}/batch_{i}.parquet")
        shutil.rmtree(f"{src}/b{i}")

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    sink = dedup_ingest_sink(corpus_dir, index_dir)
    _run_stream(spark, src, str(tmp_path / "ckpt"), sink)

    got = read_version(spark, corpus_dir)
    expected = _expected_sequential(spark, batches)
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in expected.collect())

    # the planted dups are gone: 100 (within-batch), 200/201 (vs corpus),
    # 301 (vs batch-2 survivor 250); originals survive
    ids = {r["doc_id"] for r in got.collect()}
    assert {0, 1, 2, 3, 250, 300} <= ids
    assert not {100, 200, 201, 301} & ids

    # index in lockstep: same doc set (all fixture docs have >= 3 words)
    idx = read_version(spark, index_dir)
    assert sorted(r["doc_id"] for r in idx.collect()) == \
        sorted(r["doc_id"] for r in got.collect())
    assert {"doc_id", "shingles", "signature"} <= set(idx.columns)

    # restart with the same checkpoint: fully replayed, no new versions
    v_corpus, v_index = latest_version(corpus_dir), latest_version(index_dir)
    _run_stream(spark, src, str(tmp_path / "ckpt"), sink)
    assert latest_version(corpus_dir) == v_corpus
    assert latest_version(index_dir) == v_index


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_ingest_sink_repairs_missing_index_publish(spark, tmp_path, scheme):
    """Crash between the corpus and index publishes: redelivery must
    skip the corpus (batch_id already recorded) and publish ONLY the
    index, with the identical survivor set (the probe reads the index,
    still at the parent state). Parametrized over the file:// scheme so
    the whole exactly-once repair protocol also runs through the Hadoop
    FileSystem manifest path — the code an object-store deployment
    uses (r9 verdict ask #3)."""
    batches = _mk_batches(spark)
    corpus_dir = scheme + str(tmp_path / "corpus")
    index_dir = scheme + str(tmp_path / "index")
    sink = dedup_ingest_sink(corpus_dir, index_dir)

    sink(batches[0], 0)
    # simulate the crash: wipe the index publish of batch 0
    import shutil
    shutil.rmtree(str(tmp_path / "index"))
    assert latest_version(corpus_dir) == 1 and latest_version(index_dir) is None

    sink(batches[0], 0)  # redelivery
    assert latest_version(corpus_dir) == 1  # NOT republished
    assert latest_version(index_dir) == 1   # repaired
    assert read_manifest(index_dir, 1)["batch_id"] == 0
    got = sorted(r["doc_id"] for r in read_version(spark, corpus_dir).collect())
    idx = sorted(r["doc_id"] for r in read_version(spark, index_dir).collect())
    assert got == idx == [0, 1, 2, 3]

    # fully-committed redelivery is a no-op
    sink(batches[0], 0)
    assert latest_version(corpus_dir) == 1 and latest_version(index_dir) == 1


def test_ingest_short_docs_dedup_exactly_and_stay_indexed(spark, tmp_path):
    """Docs below the shingle floor (< 3 words) ride a singleton
    {normalized text} set: identical short docs dedup across batches and
    within a batch, different short docs survive, and the corpus/index
    lockstep holds for every document."""
    b1 = spark.createDataFrame(
        [(1, "hello world"), (2, "tiny doc"), (3, "hello world"),
         (4, _BASE_TEXTS[0])],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(10, "hello world"), (11, "another tiny"), (12, _BASE_TEXTS[1])],
        "doc_id long, text string",
    )
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    sink = dedup_ingest_sink(corpus_dir, index_dir)
    sink(b1, 0)
    sink(b2, 1)

    got = sorted(r["doc_id"] for r in read_version(spark, corpus_dir).collect())
    # 3 dups 1 within batch; 10 dups 1 across batches; others survive
    assert got == [1, 2, 4, 11, 12]
    idx = sorted(r["doc_id"] for r in read_version(spark, index_dir).collect())
    assert idx == got


def test_banded_index_layout_is_survivor_invariant(spark, tmp_path):
    """index_layout='banded' must admit exactly the same survivor set as
    the plain layout (routing changes the probe's PLAN — partition-
    pruned band chain + id-pruned shingle fetch — never its result),
    publish the band chain in lockstep, and lay the chains out
    hive-partitioned on disk."""
    import glob

    from mapreduce_4_spark.streaming.ingest import bands_table_dir

    batches = _mk_batches(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, b in enumerate(batches):
        b.coalesce(1).write.parquet(f"{src}/b{i}")
    import shutil
    for i in range(len(batches)):
        part = glob.glob(f"{src}/b{i}/part-*.parquet")[0]
        shutil.move(part, f"{src}/batch_{i}.parquet")
        shutil.rmtree(f"{src}/b{i}")

    plain_corpus = str(tmp_path / "pc")
    banded_corpus = str(tmp_path / "bc")
    banded_index = str(tmp_path / "bi")
    _run_stream(spark, src, str(tmp_path / "ck1"),
                dedup_ingest_sink(plain_corpus, str(tmp_path / "pi")))
    _run_stream(spark, src, str(tmp_path / "ck2"),
                dedup_ingest_sink(banded_corpus, banded_index,
                                  index_layout="banded"))

    plain_ids = sorted(r["doc_id"] for r in
                       read_version(spark, plain_corpus).collect())
    banded_ids = sorted(r["doc_id"] for r in
                        read_version(spark, banded_corpus).collect())
    assert plain_ids == banded_ids

    # band chain in lockstep with the index: same surviving doc set
    bands = read_version(spark, bands_table_dir(banded_index))
    assert sorted({r["doc_id"] for r in bands.collect()}) == banded_ids
    # hive layout on disk: bh_part=/id_part= partition dirs inside the
    # versioned data dirs
    assert glob.glob(f"{bands_table_dir(banded_index)}/v=*/bh_part=*")
    assert glob.glob(f"{banded_index}/v=*/id_part=*")

    # replay: no new versions on a full restart
    v_c = latest_version(banded_corpus)
    v_b = latest_version(bands_table_dir(banded_index))
    _run_stream(spark, src, str(tmp_path / "ck2"),
                dedup_ingest_sink(banded_corpus, banded_index,
                                  index_layout="banded"))
    assert latest_version(banded_corpus) == v_c
    assert latest_version(bands_table_dir(banded_index)) == v_b


def test_banded_ingest_survives_all_duplicate_batch(spark, tmp_path):
    """A batch whose every doc is a near-dup of the corpus publishes
    zero-row index/bands appends; the chains must stay readable and the
    next batch must still probe and dedup correctly."""
    sink = dedup_ingest_sink(str(tmp_path / "c"), str(tmp_path / "i"),
                             index_layout="banded")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string")
    sink(mk([(0, _BASE_TEXTS[0]), (1, _BASE_TEXTS[1])]), 0)
    # batch 1: ALL docs duplicate the corpus -> empty appends everywhere
    sink(mk([(10, _BASE_TEXTS[0]), (11, _BASE_TEXTS[1])]), 1)
    # batch 2: one dup, one genuinely new -> probe must still work
    sink(mk([(20, _BASE_TEXTS[0]), (21, _BASE_TEXTS[2])]), 2)

    ids = sorted(r["doc_id"] for r in
                 read_version(spark, str(tmp_path / "c")).collect())
    assert ids == [0, 1, 21]
    idx_ids = sorted(r["doc_id"] for r in
                     read_version(spark, str(tmp_path / "i")).collect())
    assert idx_ids == [0, 1, 21]


def _chain_len(tdir):
    from mapreduce_4_spark.sources.versioned import (
        latest_version,
        read_manifest,
    )

    m = read_manifest(tdir, latest_version(tdir))
    return len(m.get("data_dirs") or [f"v={latest_version(tdir):06d}"])


def test_compaction_cadence_bounds_chain_and_keeps_survivors(spark, tmp_path):
    """compact_every=K must keep every table's data-dir count < K + 1
    across an unattended many-batch ingest (the bound an unattended
    10^9-doc trickle needs — r9 verdict ask #5), with the survivor set
    identical to the cadence-off run."""
    n_batches = 9
    batches = [
        spark.createDataFrame(
            [(100 * i + j,
              f"wholly distinct document number {100 * i + j} "
              f"with its own words {100 * i + j}")
             for j in range(3)] +
            ([(999_000 + i, _BASE_TEXTS[0])] if i % 2 else []),  # dup feed
            "doc_id long, text string",
        )
        for i in range(n_batches)
    ]

    plain_c, plain_i = str(tmp_path / "pc"), str(tmp_path / "pi")
    sink = dedup_ingest_sink(plain_c, plain_i)
    for i, b in enumerate(batches):
        sink(b, i)

    cad_c, cad_i = str(tmp_path / "cc"), str(tmp_path / "ci")
    K = 4
    csink = dedup_ingest_sink(cad_c, cad_i, compact_every=K)
    for i, b in enumerate(batches):
        csink(b, i)
        assert _chain_len(cad_c) <= K and _chain_len(cad_i) <= K

    want = sorted(r["doc_id"]
                  for r in read_version(spark, plain_c).collect())
    got = sorted(r["doc_id"] for r in read_version(spark, cad_c).collect())
    idx = sorted(r["doc_id"] for r in read_version(spark, cad_i).collect())
    assert got == want        # survivor set invariant under compaction
    assert idx == got         # corpus/index lockstep preserved
    # the cadence actually fired: the plain run's chain kept growing
    assert _chain_len(plain_c) == n_batches > K


def test_compaction_cadence_survives_mid_compaction_crash(spark, tmp_path):
    """A crash BETWEEN the per-table compact() calls (corpus folded,
    index not) must leave the next batch's repair/ingest untouched: the
    trigger re-derives from each table's latest manifest, so the index
    folds at its own next cadence point and the survivor set never
    moves."""
    from mapreduce_4_spark.sources.versioned import compact, read_manifest

    batches = _mk_batches(spark)
    c_dir, i_dir = str(tmp_path / "c"), str(tmp_path / "i")
    sink = dedup_ingest_sink(c_dir, i_dir, compact_every=3)
    sink(batches[0], 0)
    sink(batches[1], 1)
    # simulate the torn cadence: corpus compacted by hand (as if the
    # process died after corpus compact, before index compact)
    compact(spark, c_dir)
    assert read_manifest(c_dir, latest_version(c_dir)).get("data_dirs") is None
    assert _chain_len(i_dir) == 2

    sink(batches[2], 2)  # next batch: ingest + cadence check proceed
    want = sorted(r["doc_id"] for r in _expected_sequential(
        spark, batches).collect())
    got = sorted(r["doc_id"] for r in read_version(spark, c_dir).collect())
    idx = sorted(r["doc_id"] for r in read_version(spark, i_dir).collect())
    assert got == want and idx == want
    # the index folded at ITS cadence point despite the torn state
    assert _chain_len(i_dir) == 1


def test_tail_compaction_cadence_bounds_chain_without_base_rewrite(
        spark, tmp_path):
    """compact_mode="tail" bounds every chain like the full fold does,
    but never rewrites the first (bulk) chain dir — the O(trickle)
    cadence SCALE.md's round-10 probe showed a huge corpus needs. The
    survivor set must match the cadence-off banded run, and the banded
    probe must keep working across folds (the folded bands dir stays
    bh_part-partitioned, so read_version_pruned keeps pruning it)."""
    import os

    n_batches = 9
    batches = [
        spark.createDataFrame(
            [(100 * i + j,
              f"wholly distinct document number {100 * i + j} "
              f"with its own words {100 * i + j}")
             for j in range(3)] +
            ([(999_000 + i, _BASE_TEXTS[0])] if i % 2 else []),
            "doc_id long, text string",
        )
        for i in range(n_batches)
    ]

    plain_c, plain_i = str(tmp_path / "pc"), str(tmp_path / "pi")
    sink = dedup_ingest_sink(plain_c, plain_i, index_layout="banded",
                             nparts=8)
    for i, b in enumerate(batches):
        sink(b, i)

    cad_c, cad_i = str(tmp_path / "cc"), str(tmp_path / "ci")
    K = 4
    csink = dedup_ingest_sink(cad_c, cad_i, index_layout="banded",
                              nparts=8, compact_every=K,
                              compact_mode="tail")
    base_dir = os.path.join(cad_c, "v=000001")
    base_files = None
    for i, b in enumerate(batches):
        csink(b, i)
        if base_files is None:
            base_files = sorted(os.listdir(base_dir))
        from mapreduce_4_spark.streaming.ingest import bands_table_dir
        for tdir in (cad_c, cad_i, bands_table_dir(cad_i)):
            assert _chain_len(tdir) <= K

    # the bulk base dir was never rewritten by any fold
    assert sorted(os.listdir(base_dir)) == base_files
    want = sorted(r["doc_id"]
                  for r in read_version(spark, plain_c).collect())
    got = sorted(r["doc_id"] for r in read_version(spark, cad_c).collect())
    idx = sorted(r["doc_id"] for r in read_version(spark, cad_i).collect())
    assert got == want and idx == want


def test_dedup_ingest_sink_rejects_unknown_compact_mode(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="compact_mode"):
        dedup_ingest_sink(str(tmp_path / "c"), str(tmp_path / "i"),
                          compact_mode="sideways")


def test_maybe_compact_default_keeps_clustered_tail_layout(spark, tmp_path):
    """r13 advice: the ingest cadence's UNSPECIFIED target_files (None,
    the new default) must pass through to compact_tail so a chain
    recording a sort_by discipline folds layout-preservingly (one file
    per shuffle partition, range-clustered) instead of silently erasing
    the discipline into ONE file; explicit 1 stays honored verbatim."""
    import inspect
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        read_manifest,
        write_version,
    )
    from mapreduce_4_spark.streaming.ingest import (
        _maybe_compact,
        dedup_ingest_sink,
    )

    # the public default is None == unspecified
    sig = inspect.signature(dedup_ingest_sink)
    assert sig.parameters["compact_target_files"].default is None

    def grid(n0, n1):
        return spark.range(n0, n1).select(
            F.col("id").alias("payload"))

    def build(tdir):
        write_version(grid(0, 1024), tdir, sort_by=["payload"],
                      n_files=4, stats_for=["payload"])
        for i in range(2):
            write_version(grid(1024 + i * 64, 1024 + (i + 1) * 64),
                          tdir, append=True)

    def folded_files(tdir):
        v = latest_version(tdir)
        assert read_manifest(tdir, v).get("operation") == "compact-tail"
        folded = os.path.join(tdir, f"v={v:06d}")
        return [os.path.join(folded, f) for f in sorted(os.listdir(folded))
                if f.endswith(".parquet")]

    # unspecified (None): multi-file, range-clustered fold
    t_none = str(tmp_path / "tn")
    build(t_none)
    _maybe_compact(spark, t_none, every=3, target_files=None, mode="tail")
    files = folded_files(t_none)
    assert len(files) > 1
    ranges = sorted(
        (min(vs), max(vs)) for vs in
        (pq.read_table(f, columns=["payload"]).column("payload").to_pylist()
         for f in files) if vs)
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:])), ranges

    # explicit 1: honored verbatim (the caller asked for one file)
    t_one = str(tmp_path / "t1")
    build(t_one)
    _maybe_compact(spark, t_one, every=3, target_files=1, mode="tail")
    assert len(folded_files(t_one)) == 1

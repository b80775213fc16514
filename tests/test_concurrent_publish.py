"""Optimistic-concurrency publish (write_version_concurrent): staged
nonce'd data + manifest CAS, loser retries onto the new head; the
single-writer paths now fail loudly (VersionConflictError) instead of
silently overwriting a concurrently-published manifest; vacuum sweeps
orphaned staged dirs behind a TTL.

Races are simulated deterministically by interposing on the one
operation the commit linearizes on (fsio.create_text_exclusive) — a
competing writer is injected exactly between a writer's version
allocation and its CAS, which is the only window where interleaving
matters.
"""

from __future__ import annotations

import json
import os

import pytest

from mapreduce_4_spark.sources import fsio, versioned
from mapreduce_4_spark.sources.versioned import (
    VersionConflictError,
    latest_version,
    read_manifest,
    read_version,
    vacuum,
    write_version,
    write_version_concurrent,
)


def _ks(spark, start, n):
    return spark.range(start, start + n).withColumnRenamed("id", "k")


def test_concurrent_publish_roundtrip_replace_and_append(spark, tmp_path):
    tdir = str(tmp_path / "t")
    v1 = write_version_concurrent(_ks(spark, 0, 5), tdir)
    assert v1 == 1
    # full replace: latest shows only the new content, v1 time-travels
    v2 = write_version_concurrent(_ks(spark, 100, 3), tdir)
    assert v2 == 2
    assert sorted(r["k"] for r in read_version(spark, tdir).collect()) == [
        100, 101, 102
    ]
    assert read_version(spark, tdir, version=1).count() == 5
    # append chains onto the staged head
    v3 = write_version_concurrent(_ks(spark, 200, 2), tdir, append=True)
    assert v3 == 3
    assert sorted(r["k"] for r in read_version(spark, tdir).collect()) == [
        100, 101, 102, 200, 201
    ]
    m = read_manifest(tdir, 3)
    assert m["row_count"] == 5
    assert len(m["data_dirs"]) == 2
    assert all(d.startswith("_staged") for d in m["data_dirs"])


def test_losing_cas_retries_onto_new_head_no_lost_update(
    spark, tmp_path, monkeypatch
):
    """Writer A allocates version 2, writer B commits version 2 first;
    A must land at 3 with B's rows still visible (append commutes)."""
    tdir = str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 5), tdir, append=True)
    orig = fsio.create_text_exclusive
    state = {"injected": False}

    def race(path, text):
        if not state["injected"]:
            state["injected"] = True
            # B publishes first, taking the version A just allocated
            write_version_concurrent(_ks(spark, 100, 3), tdir, append=True)
        return orig(path, text)

    monkeypatch.setattr(fsio, "create_text_exclusive", race)
    v = write_version_concurrent(_ks(spark, 200, 4), tdir, append=True)
    assert v == 3  # retried past B's version 2
    got = sorted(r["k"] for r in read_version(spark, tdir).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102, 200, 201, 202, 203]
    assert read_manifest(tdir, 3)["row_count"] == 12


def test_single_writer_publish_fails_loudly_on_cas_loss(
    spark, tmp_path, monkeypatch
):
    """write_version used against the contract (a second writer wins
    the manifest race) must raise, never overwrite the winner."""
    tdir = str(tmp_path / "t")
    write_version(_ks(spark, 0, 5), tdir)
    orig = fsio.create_text_exclusive
    competitor = json.dumps({"version": 2, "winner": "B"})

    def race(path, text):
        orig(path, competitor)  # B publishes in the window
        return orig(path, text)

    monkeypatch.setattr(fsio, "create_text_exclusive", race)
    with pytest.raises(VersionConflictError):
        write_version(_ks(spark, 100, 3), tdir)
    # the winner's manifest is intact — no silent overwrite
    assert json.loads(
        fsio.read_text(versioned._manifest_path(tdir, 2))
    ) == json.loads(competitor)


def test_retry_exhaustion_raises(spark, tmp_path, monkeypatch):
    tdir = str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 2), tdir)
    monkeypatch.setattr(fsio, "create_text_exclusive", lambda p, t: False)
    with pytest.raises(VersionConflictError, match="CAS"):
        write_version_concurrent(_ks(spark, 5, 2), tdir, max_retries=2)


def test_compact_tail_cas_loss_raises(spark, tmp_path, monkeypatch):
    tdir = str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 2), tdir, append=True)
    write_version_concurrent(_ks(spark, 10, 2), tdir, append=True)
    write_version_concurrent(_ks(spark, 20, 2), tdir, append=True)
    monkeypatch.setattr(fsio, "create_text_exclusive", lambda p, t: False)
    with pytest.raises(VersionConflictError):
        versioned.compact_tail(spark, tdir, keep_base=1)


def test_concurrent_partitioned_append_chain_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    tdir = str(tmp_path / "t")
    for start in (0, 10, 20):
        df = _ks(spark, start, 6).withColumn("band", F.col("k") % 3)
        write_version_concurrent(df, tdir, partition_by=["band"],
                                 append=True)
    full = read_version(spark, tdir)
    assert full.count() == 18
    pruned = versioned.read_version_pruned(spark, tdir, {"band": [0]})
    got = sorted(r["k"] for r in pruned.collect())
    assert got == [0, 3, 12, 15, 21, 24]
    # band column survives with the manifest type on both read paths
    assert dict(full.dtypes)["band"] == dict(pruned.dtypes)["band"]


def test_vacuum_sweeps_orphaned_staged_dirs_behind_ttl(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 3), tdir)  # live staged dir
    # a crashed writer: staged data no manifest ever references
    orphan = os.path.join(tdir, "_staged", "deadbeefcafe")
    _ks(spark, 50, 2).write.parquet(orphan)
    # default TTL: the fresh orphan is indistinguishable from an
    # in-flight writer and must survive
    vacuum(tdir, keep_last=1)
    assert os.path.isdir(orphan)
    # expired TTL: swept; the referenced staged dir stays live
    vacuum(tdir, keep_last=1, staged_ttl_s=0.0)
    assert not os.path.exists(orphan)
    assert read_version(spark, tdir).count() == 3


def test_vacuum_retires_replaced_staged_dirs(spark, tmp_path):
    tdir = str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 3), tdir)
    write_version_concurrent(_ks(spark, 10, 4), tdir)
    d1 = os.path.join(tdir, read_manifest(tdir, 1)["data_dirs"][0])
    d2 = os.path.join(tdir, read_manifest(tdir, 2)["data_dirs"][0])
    vacuum(tdir, keep_last=1, staged_ttl_s=0.0)
    assert not os.path.exists(d1)  # only doomed v1 referenced it
    assert os.path.isdir(d2)
    assert read_version(spark, tdir).count() == 4


def test_concurrent_publish_file_scheme(spark, tmp_path):
    """The same commit protocol through the Hadoop FileSystem route —
    file:// is the in-repo proof scheme for the code hdfs:// and s3a://
    run, including the exclusive-create CAS primitive."""
    tdir = "file://" + str(tmp_path / "t")
    write_version_concurrent(_ks(spark, 0, 3), tdir, append=True)
    write_version_concurrent(_ks(spark, 10, 2), tdir, append=True)
    assert latest_version(tdir) == 2
    assert read_version(spark, tdir).count() == 5
    # CAS primitive: second create of the same path loses
    probe = tdir + "/_versions/cas_probe.json"
    assert fsio.create_text_exclusive(probe, "a") is True
    assert fsio.create_text_exclusive(probe, "b") is False
    assert fsio.read_text(probe) == "a"


def test_concurrent_append_refuses_laid_out_parent(spark, tmp_path):
    from mapreduce_4_spark.sources.versioned import read_manifest

    tdir = str(tmp_path / "t")
    write_version(_ks(spark, 0, 4), tdir, sort_by=["k"], n_files=2)
    # round 12: a sorted base accepts concurrent appends too, with the
    # discipline recorded on the chain; bucketed bases still refuse
    v = write_version_concurrent(_ks(spark, 10, 2), tdir, append=True)
    assert read_manifest(tdir, v)["sort_by"] == ["k"]
    tb = str(tmp_path / "tb")
    write_version(_ks(spark, 0, 4), tb, bucket_by=["k"], n_buckets=2)
    with pytest.raises(ValueError, match="bucketed"):
        write_version_concurrent(_ks(spark, 10, 2), tb, append=True)
    with pytest.raises(ValueError, match="partitioning must match"):
        write_version(_ks(spark, 0, 4), tdir)  # reset to plain
        from pyspark.sql import functions as F

        write_version_concurrent(
            _ks(spark, 10, 2).withColumn("band", F.lit(0)), tdir,
            partition_by=["band"], append=True,
        )


def test_threaded_writers_all_land_without_lost_updates(spark, tmp_path):
    """Six genuinely concurrent threads (real CAS races, nothing
    injected) each append a disjoint key range; every batch must land
    exactly once — the no-lost-updates guarantee under contention."""
    import threading

    tdir = str(tmp_path / "t")
    errors: list[Exception] = []

    def writer(start):
        try:
            write_version_concurrent(_ks(spark, start, 3), tdir,
                                     append=True)
        except Exception as exc:  # surface in the main thread
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(s,))
               for s in range(0, 600, 100)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert latest_version(tdir) == 6
    got = sorted(r["k"] for r in read_version(spark, tdir).collect())
    assert got == sorted(
        k for s in range(0, 600, 100) for k in range(s, s + 3)
    )
    # every intermediate version is itself a consistent snapshot
    assert read_manifest(tdir, 6)["row_count"] == 18


def test_stream_drains_exactly_once_under_concurrent_writers(
        spark, tmp_path):
    """r13 verdict ask #5: an mr4ver append stream draining WHILE
    threaded write_version_concurrent writers land staged commits must
    deliver the exactly-once union of every landed append across its
    micro-batches — no duplicates, no holes, regardless of how the
    CAS races interleaved with the micro-batch offset windows."""
    import threading

    from mapreduce_4_spark.sources.pyds import register_versioned_source

    tdir = str(tmp_path / "t")
    out = str(tmp_path / "out")
    write_version_concurrent(_ks(spark, 0, 10), tdir, append=True)
    register_versioned_source(spark)

    n_writers, n_appends, chunk = 4, 5, 10
    errors: list = []

    def writer(wid: int) -> None:
        try:
            for i in range(n_appends):
                start = 1000 * (wid + 1) + chunk * i
                write_version_concurrent(_ks(spark, start, chunk), tdir,
                                         append=True)
        except Exception as exc:  # surfaced after the join
            errors.append((wid, exc))

    q = (spark.readStream.format("mr4ver").load(tdir)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    try:
        threads = [threading.Thread(target=writer, args=(w,))
                   for w in range(n_writers)]
        for t in threads:
            t.start()
        # drain while writers are still publishing: each call processes
        # whatever offsets exist NOW, so micro-batch windows interleave
        # with in-flight CAS commits
        q.processAllAvailable()
        for t in threads:
            t.join()
        assert not errors, errors
        q.processAllAvailable()  # the tail landed after the last drain
    finally:
        q.stop()

    want = sorted(range(10)) + sorted(
        1000 * (w + 1) + j
        for w in range(n_writers) for j in range(n_appends * chunk))
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == want  # exactly-once: every append, no duplicates

    # and the chain itself recorded every commit (seed + W x A appends)
    assert latest_version(tdir) == 1 + n_writers * n_appends

"""Snapshot-versioned table format: atomic publish, time travel, keyed
upsert lineage, history, vacuum safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_4_spark.sources.versioned import (
    history,
    latest_version,
    read_manifest,
    read_version,
    upsert_version,
    vacuum,
    write_version,
)


def _orders(spark, sf_smoke):
    from mapreduce_4_spark.sources import load_table

    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_write_read_roundtrip_and_latest(spark, sf_smoke, tmp_path):
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    v1 = write_version(base, tdir)
    assert v1 == 1 and latest_version(tdir) == 1
    got = read_version(spark, tdir)
    assert got.count() == base.count()
    assert got.schema == base.schema


def test_time_travel_preserves_old_snapshots(spark, sf_smoke, tmp_path):
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    updates = base.limit(10).withColumn("o_totalprice", F.lit(0.0))
    v2 = upsert_version(spark, tdir, updates, key="o_orderkey")
    assert v2 == 2

    # latest reflects the merge: 10 zeroed rows, same total count
    latest = read_version(spark, tdir)
    assert latest.count() == base.count()
    assert latest.filter(F.col("o_totalprice") == 0.0).count() == 10
    # v1 is untouched — time travel
    v1_df = read_version(spark, tdir, version=1)
    assert v1_df.filter(F.col("o_totalprice") == 0.0).count() == 0

    h = {r["version"]: r for r in history(spark, tdir).collect()}
    assert h[1]["parent"] is None and h[2]["parent"] == 1
    assert h[2]["row_count"] == base.count()
    assert read_manifest(tdir, 2)["schema"]["type"] == "struct"


def test_unpublished_version_is_invisible(spark, sf_smoke, tmp_path):
    tdir = str(tmp_path / "t")
    write_version(_orders(spark, sf_smoke), tdir)
    # simulate a crashed writer: data directory without a manifest
    _orders(spark, sf_smoke).limit(5).write.parquet(f"{tdir}/v=000099")
    assert latest_version(tdir) == 1
    with pytest.raises(FileNotFoundError):
        read_version(spark, tdir, version=99)


def test_vacuum_keeps_newest_and_time_travel_fails_cleanly(
    spark, sf_smoke, tmp_path
):
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    upsert_version(spark, tdir, base.limit(1), key="o_orderkey")
    upsert_version(spark, tdir, base.limit(2), key="o_orderkey")
    removed = vacuum(tdir, keep_last=2)
    assert removed == [1]
    assert list(h["version"] for h in history(spark, tdir).collect()) == [2, 3]
    with pytest.raises(FileNotFoundError):
        read_version(spark, tdir, version=1)
    assert read_version(spark, tdir).count() == base.count()


def test_scheme_paths_route_manifest_io_through_hadoop_fs(
        spark, sf_smoke, tmp_path, monkeypatch):
    """A scheme'd table_dir (file://, and by the same code path hdfs://,
    s3a://, ...) must do ALL manifest I/O through the session's Hadoop
    FileSystem — never driver-local open()/os — so manifests live on
    the same store as the data on any deployment (r9 verdict ask #3;
    file:// is the in-repo proof scheme for the exact code remote
    schemes run)."""
    from mapreduce_4_spark.sources import fsio

    hadoop_calls = {"n": 0}
    real_fs = fsio._fs

    def counting_fs(path):
        hadoop_calls["n"] += 1
        return real_fs(path)

    monkeypatch.setattr(fsio, "_fs", counting_fs)
    base = _orders(spark, sf_smoke)
    tdir = "file://" + str(tmp_path / "t")
    assert write_version(base, tdir) == 1
    assert hadoop_calls["n"] > 0, "manifest I/O bypassed the Hadoop FS"
    assert read_version(spark, tdir).count() == base.count()
    m = read_manifest(tdir, 1)
    assert m["row_count"] == base.count()
    # the manifest physically exists where a local reader expects it
    import os

    assert os.path.exists(str(tmp_path / "t/_versions/000001.json"))
    # scheme-less access to the same dir sees the same version history
    assert read_manifest(str(tmp_path / "t"), 1)["nonce"] == m["nonce"]


def test_bucketed_snapshot_roundtrip_and_manifest(spark, sf_smoke, tmp_path):
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir, bucket_by=["o_orderkey"], n_buckets=4)
    m = read_manifest(tdir, 1)
    assert m["bucket_by"] == ["o_orderkey"] and m["n_buckets"] == 4
    assert m["row_count"] == base.count()
    got = read_version(spark, tdir)
    assert got.count() == base.count()
    assert sorted(got.columns) == sorted(base.columns)


def test_clustered_snapshot_files_cover_disjoint_ranges(spark, sf_smoke, tmp_path):
    """sort_by without buckets = clustered layout: every parquet file
    covers a near-disjoint range of the sort key, so min/max footer
    stats can skip whole files on selective predicates."""
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    tdir = str(tmp_path / "t")
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    write_version(ev, tdir, sort_by=["user_id"], n_files=8)
    m = read_manifest(tdir, 1)
    assert m["sort_by"] == ["user_id"] and m["bucket_by"] is None

    data_dir = os.path.join(tdir, "v=000001")
    ranges = []
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(data_dir, f)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "user_id"
        )
        los, his = zip(*(
            (md.row_group(g).column(idx).statistics.min,
             md.row_group(g).column(idx).statistics.max)
            for g in range(md.num_row_groups)
        ))
        ranges.append((min(los), max(his)))
    assert len(ranges) >= 4
    # ranges are non-overlapping except possibly at shared boundary keys
    ranges.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_b >= hi_a, ranges

    # data intact, and a point read touches a single file's range
    got = read_version(spark, tdir)
    assert got.count() == ev.count()
    probe = ev.agg(F.min("user_id")).first()[0]
    assert (
        got.filter(F.col("user_id") == probe).count()
        == ev.filter(F.col("user_id") == probe).count()
    )


def test_table_changes_cdc_between_published_versions(spark, sf_smoke, tmp_path):
    """CDC over real published versions: upsert_version then
    table_changes(v1 -> v2) reports exactly the upserted keys as 'U'
    (values actually changed) and nothing else for untouched keys."""
    from mapreduce_4_spark.sources.versioned import table_changes

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    updates = base.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 7
    )
    v2 = upsert_version(spark, tdir, updates, "o_orderkey")
    assert v2 == 2

    diff = table_changes(spark, tdir, "o_orderkey", 1, 2).collect()
    assert diff, "upsert must surface as changes"
    assert {r["op"] for r in diff} == {"U"}
    changed_keys = {r["o_orderkey"] for r in diff}
    expected = {r["o_orderkey"] for r in updates.select("o_orderkey").collect()}
    assert changed_keys == expected
    for r in diff:
        assert r["new_o_totalprice"] == r["old_o_totalprice"] + 7


def test_compact_reduces_files_without_changing_rows(spark, sf_smoke, tmp_path):
    """Small-file compaction publishes a new version with fewer data
    files and a byte-identical row set (table_changes v_n -> v_n+1 is
    empty); the pre-compaction snapshot stays readable (immutability)."""
    import glob

    from mapreduce_4_spark.sources.versioned import compact, table_changes

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke).repartition(8)
    write_version(base, tdir)
    n_before = len(glob.glob(f"{tdir}/v=000001/*.parquet"))
    assert n_before > 1

    v2 = compact(spark, tdir, target_files=1)
    assert v2 == 2
    n_after = len(glob.glob(f"{tdir}/v=000002/*.parquet"))
    assert n_after == 1
    assert table_changes(spark, tdir, "o_orderkey", 1, 2).count() == 0
    assert read_version(spark, tdir, 1).count() == read_version(
        spark, tdir, 2
    ).count()


def test_recreated_bucketed_table_never_rebinds_stale_catalog_entry(
    spark, sf_smoke, tmp_path
):
    """Delete-and-recreate a bucketed table dir at the same path with a
    DIFFERENT schema and bucket spec: read_version must bind the NEW
    manifest's nonce-derived catalog name, never the stale session
    entry from the first incarnation (wrong schema / bucket count would
    silently corrupt exchange-free join planning)."""
    import shutil

    tdir = str(tmp_path / "t")
    first = _orders(spark, sf_smoke).select("o_orderkey", "o_totalprice")
    write_version(first, tdir, bucket_by=["o_orderkey"], n_buckets=4)
    # populate the session catalog with the first incarnation's binding
    assert read_version(spark, tdir).count() == first.count()

    shutil.rmtree(tdir)
    second = _orders(spark, sf_smoke).select("o_orderkey", "o_orderstatus")
    write_version(second, tdir, bucket_by=["o_orderkey"], n_buckets=8)

    got = read_version(spark, tdir)
    assert sorted(got.columns) == sorted(second.columns)
    assert got.count() == second.count()
    m = read_manifest(tdir, 1)
    assert m["n_buckets"] == 8 and m.get("nonce")


def test_table_changes_key_only_table(spark, sf_smoke, tmp_path):
    """CDC on a key-only table (no compared columns): rows can only
    appear or disappear — ops are exactly I/D, never U, and the empty
    compare list must not crash (regression: ``same`` stayed None and
    ``~same`` raised TypeError)."""
    from mapreduce_4_spark.sources.versioned import table_changes

    tdir = str(tmp_path / "t")
    keys_v1 = spark.range(1, 11).select(F.col("id").alias("k"))
    keys_v2 = spark.range(2, 12).select(F.col("id").alias("k"))
    write_version(keys_v1, tdir)
    write_version(keys_v2, tdir)

    diff = table_changes(spark, tdir, "k", 1, 2).collect()
    ops = {r["k"]: r["op"] for r in diff}
    assert ops == {1: "D", 11: "I"}


def test_upsert_and_compact_preserve_bucketed_layout(spark, sf_smoke, tmp_path):
    """A bucketed table must STAY bucketed through upsert_version and
    compact: the manifest carries the spec forward and a bucket-key join
    against another bucketed table stays exchange-free after the full
    maintenance cycle (regression: rewrites silently dropped the
    layout, breaking every downstream zero-Exchange plan)."""
    from mapreduce_4_spark.sources.versioned import compact

    li_dir, od_dir = str(tmp_path / "li"), str(tmp_path / "od")
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_version(li, li_dir, bucket_by=["l_orderkey"], n_buckets=4)
    write_version(od, od_dir, bucket_by=["o_orderkey"], n_buckets=4)

    updates = od.limit(5).withColumn("o_totalprice", F.lit(0.0))
    v2 = upsert_version(spark, od_dir, updates, key="o_orderkey")
    v3 = compact(spark, od_dir)
    for v in (v2, v3):
        m = read_manifest(od_dir, v)
        assert m["bucket_by"] == ["o_orderkey"], m
        assert m["n_buckets"] == 4, m

    a = read_version(spark, li_dir)
    b = read_version(spark, od_dir)  # post-upsert, post-compaction
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        n_rows = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert n_rows == li.count()
    # the merge itself is correct on top of layout preservation
    assert b.filter(F.col("o_totalprice") == 0.0).count() == 5


def test_compact_preserves_clustered_and_partitioned_layouts(
    spark, sf_smoke, tmp_path
):
    """compact() on a clustered (sort_by) table re-range-partitions into
    target_files and keeps the manifest's sort spec; on a hive-
    partitioned table it keeps the directory scheme."""
    import glob

    from mapreduce_4_spark.sources.versioned import compact

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    cdir = str(tmp_path / "clustered")
    write_version(ev, cdir, sort_by=["user_id"], n_files=8)
    compact(spark, cdir, target_files=2)
    m = read_manifest(cdir, 2)
    assert m["sort_by"] == ["user_id"]
    assert len(glob.glob(f"{cdir}/v=000002/*.parquet")) == 2

    pdir = str(tmp_path / "partitioned")
    write_version(ev, pdir, partition_by=["event_type"])
    compact(spark, pdir)
    m = read_manifest(pdir, 2)
    assert m["partition_by"] == ["event_type"]
    assert glob.glob(f"{pdir}/v=000002/event_type=*"), "hive dirs must survive"
    assert read_version(spark, pdir).count() == ev.count()


def test_pre_nonce_manifest_still_readable(spark, sf_smoke, tmp_path):
    """Manifests written before the nonce field existed (no 'nonce' key)
    must still read: the catalog name falls back to the path-only
    derivation."""
    import json
    import os

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke).select("o_orderkey", "o_totalprice")
    write_version(base, tdir, bucket_by=["o_orderkey"], n_buckets=4)
    mpath = os.path.join(tdir, "_versions", "000001.json")
    with open(mpath) as fh:
        m = json.load(fh)
    del m["nonce"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    got = read_version(spark, tdir)
    assert got.count() == base.count()


def test_maintenance_rewrites_accept_file_scheme(spark, sf_smoke, tmp_path):
    """upsert_version and compact must keep working on file:// paths —
    they read the manifest for layout propagation, and the manifest
    reader has to strip the scheme like every other entry point."""
    from mapreduce_4_spark.sources.versioned import compact

    tdir = "file://" + str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    v2 = upsert_version(
        spark, tdir, base.limit(1).withColumn("o_totalprice", F.lit(0.0)),
        key="o_orderkey",
    )
    assert v2 == 2
    assert compact(spark, tdir) == 3
    assert read_version(spark, tdir).count() == base.count()


def test_delete_version_keyed_with_cdc_and_layout(spark, sf_smoke, tmp_path):
    """GDPR delete: keyed delete publishes a new version whose diff vs
    the parent is exactly the deleted rows as 'D' ops, and a bucketed
    layout survives the rewrite."""
    from mapreduce_4_spark.sources.versioned import (
        delete_version,
        table_changes,
    )

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir, bucket_by=["o_orderkey"], n_buckets=4)

    doomed = base.select("o_orderkey").filter(F.col("o_orderkey") % 7 == 0)
    n_doomed = doomed.count()
    v2 = delete_version(spark, tdir, keys=doomed, key="o_orderkey")
    assert v2 == 2

    latest = read_version(spark, tdir)
    assert latest.count() == base.count() - n_doomed
    assert latest.filter(F.col("o_orderkey") % 7 == 0).count() == 0
    # parent snapshot untouched (time travel), layout preserved
    assert read_version(spark, tdir, 1).count() == base.count()
    m2 = read_manifest(tdir, 2)
    assert m2["bucket_by"] == ["o_orderkey"] and m2["n_buckets"] == 4

    cdc = table_changes(spark, tdir, "o_orderkey", 1, 2)
    ops = {r["op"] for r in cdc.select("op").distinct().collect()}
    assert ops == {"D"}
    assert cdc.count() == n_doomed


def test_delete_version_predicate_null_semantics(spark, sf_smoke, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL are
    KEPT — only a definitely-TRUE predicate deletes."""
    from mapreduce_4_spark.sources.versioned import delete_version

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    write_version(base, tdir)
    n_null = base.filter(F.col("o_totalprice").isNull()).count()
    n_cheap = base.filter(F.col("o_totalprice") < 50000).count()
    assert n_null > 0 and n_cheap > 0

    delete_version(spark, tdir, predicate=F.col("o_totalprice") < 50000)
    latest = read_version(spark, tdir)
    # NULL-price rows survive; only definitely-cheap rows deleted
    assert latest.filter(F.col("o_totalprice").isNull()).count() == n_null
    assert latest.count() == base.count() - n_cheap


def test_delete_rows_argument_validation(spark, sf_smoke):
    from mapreduce_4_spark.operators.maintenance import delete_rows

    base = _orders(spark, sf_smoke)
    with pytest.raises(ValueError, match="exactly one"):
        delete_rows(base)
    with pytest.raises(ValueError, match="exactly one"):
        delete_rows(base, keys=base.select("o_orderkey"),
                    key="o_orderkey", predicate="o_totalprice < 0")
    with pytest.raises(ValueError, match="key column"):
        delete_rows(base, keys=base.select("o_orderkey"))


def test_publish_checked_fail_mode_refuses_and_leaves_no_version(
        spark, sf_smoke, tmp_path):
    from mapreduce_4_spark.sources.versioned import publish_checked

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    rules = {
        "null_key": F.col("o_orderkey").isNull(),
        "nonpositive_price": F.col("o_totalprice") <= 0,
    }
    # clean data publishes, and the manifest records the audited rules
    v = publish_checked(base, tdir, rules)
    assert v == 1
    assert read_manifest(tdir, 1)["expectations"] == {
        "null_key": 0, "nonpositive_price": 0,
    }

    # poisoned data refuses — and the refused publish wrote NOTHING
    poisoned = base.unionByName(
        spark.createDataFrame(
            [(999999999, "F", -1.0)],
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    with pytest.raises(ValueError, match="nonpositive_price"):
        publish_checked(poisoned, tdir, rules)
    assert latest_version(tdir) == 1


def test_publish_checked_drop_mode_keeps_nulls_and_audits(spark, sf_smoke,
                                                          tmp_path):
    """SQL CHECK semantics: a NULL rule result is not a definite
    violation — the row survives; definite violations drop, with
    per-rule counts recorded in the manifest."""
    from mapreduce_4_spark.sources.versioned import publish_checked

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 11 == 0, None)      # NULL rule result
        .when(F.col("o_orderkey") % 7 == 0, -5.0)        # definite violation
        .otherwise(F.col("o_totalprice")),
    )
    n_bad = base.filter(F.col("o_totalprice") <= 0).count()
    n_null = base.filter(F.col("o_totalprice").isNull()).count()
    assert n_bad > 0 and n_null > 0

    v = publish_checked(
        base, tdir, {"nonpositive_price": F.col("o_totalprice") <= 0},
        mode="drop",
    )
    got = read_version(spark, tdir, v)
    assert got.count() == base.count() - n_bad
    assert got.filter(F.col("o_totalprice").isNull()).count() == n_null
    m = read_manifest(tdir, v)
    assert m["expectations"] == {"nonpositive_price": n_bad}


def test_publish_checked_quarantines_dropped_rows(spark, sf_smoke, tmp_path):
    """Drop mode with a dead-letter table: violating rows land in their
    own versioned table, tagged with the publish version that rejected
    them; kept + quarantined partitions the input exactly."""
    from mapreduce_4_spark.sources.versioned import publish_checked

    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    base = _orders(spark, sf_smoke).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, -5.0)
        .otherwise(F.col("o_totalprice")),
    )
    n_bad = base.filter(F.col("o_totalprice") <= 0).count()
    v = publish_checked(
        base, tdir, {"nonpositive_price": F.col("o_totalprice") <= 0},
        mode="drop", quarantine_dir=qdir,
    )
    kept = read_version(spark, tdir, v)
    quar = read_version(spark, qdir)
    assert quar.count() == n_bad
    assert kept.count() + quar.count() == base.count()
    assert quar.filter(F.col("o_totalprice") > 0).count() == 0
    assert read_manifest(qdir, 1)["quarantined_from_version"] == v


def test_publish_checked_empty_input_publishes_zero_counts(spark, sf_smoke,
                                                           tmp_path):
    """An empty-but-valid input (everything filtered upstream) must
    publish an empty version with zero violation counts in BOTH modes —
    not crash on NULL aggregate counts."""
    from mapreduce_4_spark.sources.versioned import publish_checked

    base = _orders(spark, sf_smoke).filter(F.lit(False))
    rules = {"nonpositive_price": F.col("o_totalprice") <= 0}
    v1 = publish_checked(base, str(tmp_path / "a"), rules, mode="fail")
    v2 = publish_checked(base, str(tmp_path / "b"), rules, mode="drop")
    assert v1 == 1 and v2 == 1
    assert read_manifest(str(tmp_path / "a"), 1)["expectations"] == {
        "nonpositive_price": 0
    }
    assert read_manifest(str(tmp_path / "b"), 1)["expectations"] == {
        "nonpositive_price": 0
    }
    assert read_version(spark, str(tmp_path / "b")).count() == 0


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_append_chain_reads_union_and_counts(spark, sf_smoke, tmp_path,
                                             scheme):
    """append=True publishes only the new rows but every version reads
    as the full table; manifest row_count is the chain total. Runs both
    scheme-less (os manifest I/O) and file:// (Hadoop FS manifest I/O —
    the object-store code path, r9 verdict ask #3)."""
    tdir = scheme + str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    a = base.filter(F.col("o_orderkey") % 3 == 0)
    b = base.filter(F.col("o_orderkey") % 3 == 1)
    c = base.filter(F.col("o_orderkey") % 3 == 2)
    write_version(a, tdir, append=True)
    write_version(b, tdir, append=True)
    v3 = write_version(c, tdir, append=True)
    assert v3 == 3
    assert read_version(spark, tdir).count() == base.count()
    assert read_manifest(tdir, 3)["row_count"] == base.count()
    # time travel into the middle of the chain
    assert read_version(spark, tdir, 2).count() == a.count() + b.count()
    # only the delta was written: v=000002 holds b's rows alone
    import os
    assert read_manifest(tdir, 2)["data_dirs"] == ["v=000001", "v=000002"]
    assert spark.read.parquet(os.path.join(tdir, "v=000002")).count() == b.count()


def test_append_vacuum_keeps_dirs_live_manifests_reference(spark, sf_smoke, tmp_path):
    """Vacuuming an append chain drops old MANIFESTS but must keep any
    data dir the retained head still reads."""
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    for m in range(3):
        write_version(base.filter(F.col("o_orderkey") % 3 == m), tdir,
                      append=True)
    removed = vacuum(tdir, keep_last=1)
    assert removed == [1, 2]
    # the head still reads the whole chain
    assert read_version(spark, tdir).count() == base.count()


def test_append_refuses_laid_out_parent_and_layouts(spark, sf_smoke, tmp_path):
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    with pytest.raises(ValueError, match="no bucket/cluster layout"):
        write_version(base, tdir, append=True, sort_by=["o_orderkey"])
    write_version(base, tdir, sort_by=["o_orderkey"])
    # round 12: a SORTED base accepts appends and the chain keeps
    # recording the discipline (the layout-preserving-fold contract);
    # only BUCKETED bases still refuse (correctness contract)
    v = write_version(base.limit(5), tdir, append=True)
    from mapreduce_4_spark.sources.versioned import read_manifest

    assert read_manifest(tdir, v)["sort_by"] == ["o_orderkey"]
    tb = str(tmp_path / "tb")
    write_version(base, tb, bucket_by=["o_orderkey"], n_buckets=4)
    with pytest.raises(ValueError, match="bucketed"):
        write_version(base.limit(5), tb, append=True)


def test_compact_resets_append_chain(spark, sf_smoke, tmp_path):
    """compact() publishes a full snapshot, so later vacuum can actually
    reclaim the chain's many small dirs."""
    from mapreduce_4_spark.sources.versioned import compact

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    for m in range(3):
        write_version(base.filter(F.col("o_orderkey") % 3 == m), tdir,
                      append=True)
    v = compact(spark, tdir, target_files=1)
    assert read_manifest(tdir, v).get("data_dirs") is None
    assert read_version(spark, tdir).count() == base.count()
    vacuum(tdir, keep_last=1)
    import os
    assert not os.path.isdir(os.path.join(tdir, "v=000001"))


def test_vacuum_reclaims_orphaned_chain_dirs(spark, sf_smoke, tmp_path):
    """The append -> vacuum -> compact -> vacuum leak: a chain dir kept
    alive by a retained manifest in the FIRST vacuum loses its own
    manifest there; after compact() supersedes the chain, the SECOND
    vacuum must still find and reclaim it (mark-and-sweep over every
    v=* dir, not just the doomed versions' own dirs)."""
    import os

    from mapreduce_4_spark.sources.versioned import compact

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    for m in range(3):
        write_version(base.filter(F.col("o_orderkey") % 3 == m), tdir,
                      append=True)
    vacuum(tdir, keep_last=1)  # drops manifests 1,2; dirs stay (live)
    assert os.path.isdir(os.path.join(tdir, "v=000001"))
    compact(spark, tdir, target_files=1)  # v4: full snapshot
    vacuum(tdir, keep_last=1)  # doomed=[3]; dirs 1,2 have no manifest
    for v in ("v=000001", "v=000002", "v=000003"):
        assert not os.path.isdir(os.path.join(tdir, v)), f"{v} leaked"
    assert read_version(spark, tdir).count() == base.count()


def test_published_batch_ids_survive_table_recreation(spark, sf_smoke, tmp_path):
    """The replay-guard cache must not serve stale batch ids after a
    table dir is wiped and recreated in the same process (exactly-once
    would silently break on the recreated table)."""
    import shutil

    from mapreduce_4_spark.sources.versioned import published_batch_ids

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke).limit(10)
    write_version(base, tdir, batch_id=0)
    write_version(base, tdir, batch_id=1)
    assert published_batch_ids(tdir) == {0, 1}
    shutil.rmtree(tdir)
    write_version(base, tdir, batch_id=5)
    assert published_batch_ids(tdir) == {5}


def test_partitioned_append_chain_prunes_and_guards(spark, tmp_path):
    """Appends MAY carry a hive partition layout when the whole chain
    shares it: content is the union of the chain, a partition filter
    reaches every chain dir as a PartitionFilter (directory pruning,
    not a post-scan filter), and a mismatched partitioning raises."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        read_version,
        write_version,
    )

    tdir = str(tmp_path / "pchain")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(4)).alias("p")
    )
    write_version(mk(0, 100), tdir, partition_by=["p"], append=True)
    write_version(mk(100, 200), tdir, partition_by=["p"], append=True)
    write_version(mk(200, 300), tdir, partition_by=["p"], append=True)

    full = read_version(spark, tdir)
    assert full.count() == 300
    pruned = full.filter(F.col("p") == 1)
    assert pruned.count() == 75
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan

    # time travel still sees each version as one immutable snapshot
    assert read_version(spark, tdir, version=2).count() == 200

    with pytest.raises(ValueError, match="partitioning must match"):
        write_version(spark.range(5).select("id"), tdir, append=True)
    with pytest.raises(ValueError, match="partitioning must match"):
        write_version(
            spark.range(5).select("id", F.lit(0).alias("q")),
            tdir, partition_by=["q"], append=True,
        )


def test_read_version_pruned_touches_only_matching_subdirs(spark, tmp_path):
    """Path-level pruning: read_version_pruned must plan over exactly
    the requested col=value subdirectories of every chain dir (the
    manifest-level pruning move) — not scan-then-filter. Pinned by the
    scan's input-file list."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        read_version,
        read_version_pruned,
        write_version,
    )

    tdir = str(tmp_path / "chain")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(8)).alias("p")
    )
    write_version(mk(0, 80).repartition("p"), tdir,
                  partition_by=["p"], append=True)
    write_version(mk(80, 160).repartition("p"), tdir,
                  partition_by=["p"], append=True)

    got = read_version_pruned(spark, tdir, {"p": [2, 5]})
    rows = got.select("id").collect()
    assert sorted(r["id"] % 8 for r in rows) == [2] * 20 + [5] * 20
    files = [r[0] for r in got.select(
        F.input_file_name()).distinct().collect()]
    assert files
    assert all(("/p=2/" in f) or ("/p=5/" in f) for f in files)
    # both chain dirs contribute
    assert any("/v=000001/" in f for f in files)
    assert any("/v=000002/" in f for f in files)
    # schema contract shared with read_version: the partition column is
    # IN the result (restored from the dir names), same types both ways
    full = read_version(spark, tdir)
    assert got.schema == full.select(*got.columns).schema
    assert {(r["id"], r["p"]) for r in got.collect()} == {
        (r["id"], r["p"]) for r in full.filter(F.col("p").isin(2, 5)).collect()
    }
    # no matching dirs yet -> EMPTY DataFrame with the manifest schema,
    # never None (callers compose filters/joins without a null-check)
    miss = read_version_pruned(spark, tdir, {"p": [99]})
    assert miss.count() == 0
    assert miss.schema == got.schema


def test_partitioned_append_chain_survives_empty_appends(spark, tmp_path):
    """A zero-row partitioned append writes NO parquet files (only
    _SUCCESS); the chain read must skip such dirs instead of raising
    UNABLE_TO_INFER_SCHEMA, and an all-empty chain must come back as an
    empty DataFrame with the manifest schema (the all-dup-batch case of
    the banded ingest sink)."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources.versioned import (
        read_version,
        write_version,
    )

    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(4)).alias("p")
    )
    empty = mk(0, 0)

    tdir = str(tmp_path / "chain")
    write_version(mk(0, 40), tdir, partition_by=["p"], append=True)
    write_version(empty, tdir, partition_by=["p"], append=True)
    write_version(mk(40, 80), tdir, partition_by=["p"], append=True)
    got = read_version(spark, tdir)
    assert got.count() == 80
    assert got.filter(F.col("p") == 1).count() == 20

    tdir2 = str(tmp_path / "allempty")
    write_version(empty, tdir2, partition_by=["p"], append=True)
    write_version(empty, tdir2, partition_by=["p"], append=True)
    got2 = read_version(spark, tdir2)
    assert got2.count() == 0
    assert set(got2.columns) == {"id", "p"}


def test_compact_tail_folds_only_the_trickle(spark, sf_smoke, tmp_path):
    """compact_tail folds every chain dir after the first into ONE new
    dir without touching the base dir — the O(trickle) fold an
    unattended huge-corpus ingest needs (SCALE.md round 10: full
    compact() is corpus-proportional, ~85 s per fold at 200k docs)."""
    import os

    from mapreduce_4_spark.sources.versioned import compact_tail

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir, append=True)  # v1: the bulk base dir
    for m in range(3):                       # v2..v4: the trickle
        write_version(
            base.filter(F.col("o_orderkey") % 7 == m).limit(5),
            tdir, append=True,
        )
    want = sorted(map(tuple, read_version(spark, tdir).collect()))
    total = read_manifest(tdir, 4)["row_count"]
    base_dir = os.path.join(tdir, "v=000001")
    base_files = sorted(os.listdir(base_dir))

    v = compact_tail(spark, tdir)
    assert v == 5
    m5 = read_manifest(tdir, v)
    assert m5["data_dirs"] == ["v=000001", "v=000005"]
    assert m5["row_count"] == total
    # the base dir was NOT rewritten
    assert sorted(os.listdir(base_dir)) == base_files
    got = sorted(map(tuple, read_version(spark, tdir).collect()))
    assert got == want
    # nothing left to fold: one base + one folded dir is already tight
    assert compact_tail(spark, tdir) is None
    # the chain keeps appending off the folded head
    write_version(base.limit(2), tdir, append=True)
    assert read_manifest(tdir, 6)["data_dirs"] == [
        "v=000001", "v=000005", "v=000006"
    ]


def test_compact_tail_no_op_on_full_snapshot(spark, sf_smoke, tmp_path):
    from mapreduce_4_spark.sources.versioned import compact_tail

    tdir = str(tmp_path / "t")
    write_version(_orders(spark, sf_smoke), tdir)
    assert compact_tail(spark, tdir) is None


def test_compact_tail_partitioned_chain_keeps_pruning(spark, tmp_path):
    """Folding a hive-partitioned append chain keeps the partition
    layout (one folded dir, partitioned the same way), so both chain
    read paths — union scan and read_version_pruned — stay correct."""
    from mapreduce_4_spark.sources.versioned import (
        compact_tail,
        read_version_pruned,
    )

    tdir = str(tmp_path / "pchain")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(4)).alias("p")
    )
    write_version(mk(0, 100), tdir, partition_by=["p"], append=True)
    write_version(mk(100, 160), tdir, partition_by=["p"], append=True)
    write_version(mk(160, 200), tdir, partition_by=["p"], append=True)

    v = compact_tail(spark, tdir)
    assert v == 4
    assert read_manifest(tdir, v)["data_dirs"] == ["v=000001", "v=000004"]
    full = read_version(spark, tdir)
    assert full.count() == 200
    assert dict(full.groupBy("p").count().collect())[1] == 50
    pruned = read_version_pruned(spark, tdir, {"p": [1, 2]})
    assert pruned.count() == 100
    assert pruned.schema == full.schema


def test_compact_tail_crash_leaves_old_chain_and_vacuumable_orphan(
        spark, sf_smoke, tmp_path):
    """A crash between the folded-dir write and the manifest publish
    must leave the previous chain live (manifest-last publish) and an
    orphan v=* dir that vacuum's mark-and-sweep reclaims."""
    import os

    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir, append=True)
    write_version(base.limit(5), tdir, append=True)
    write_version(base.limit(3), tdir, append=True)
    # simulate the torn fold: data dir exists, manifest never written
    orphan = os.path.join(tdir, "v=000004")
    base.limit(2).write.parquet(orphan)
    assert latest_version(tdir) == 3
    assert read_version(spark, tdir).count() == base.count() + 8
    # the NEXT publish allocates the same version number; the torn
    # leftover must be reclaimed, not brick every later write on
    # errorifexists (publishes are self-healing, not fatal)
    v = write_version(base.limit(1), tdir, append=True)
    assert v == 4
    assert read_version(spark, tdir).count() == base.count() + 9
    removed = vacuum(tdir, keep_last=1)
    assert removed == [1, 2, 3]
    assert read_version(spark, tdir).count() == base.count() + 9


def test_compact_tail_recovers_from_its_own_torn_fold(spark, tmp_path):
    """A fold that died between its data write and manifest publish
    leaves an unmanifested v=* dir; the RE-RUN fold (same version
    number) must reclaim it and succeed."""
    import os

    from mapreduce_4_spark.sources.versioned import compact_tail

    tdir = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(3)).alias("p")
    )
    write_version(mk(0, 30), tdir, partition_by=["p"], append=True)
    write_version(mk(30, 40), tdir, partition_by=["p"], append=True)
    write_version(mk(40, 50), tdir, partition_by=["p"], append=True)
    # torn fold: the folded dir exists, its manifest never landed
    mk(30, 50).write.partitionBy("p").parquet(os.path.join(tdir, "v=000004"))
    v = compact_tail(spark, tdir)
    assert v == 4
    assert read_manifest(tdir, 4)["data_dirs"] == ["v=000001", "v=000004"]
    assert read_version(spark, tdir).count() == 50


def test_compact_tail_all_empty_tail_lists_no_phantom_dir(spark, tmp_path):
    """Folding a partitioned chain whose tail appended zero rows writes
    no folded dir and must not LIST one — data_dirs only ever names
    dirs that exist (the chain still shrinks to the base)."""
    import os

    from mapreduce_4_spark.sources.versioned import compact_tail

    tdir = str(tmp_path / "t")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(3)).alias("p")
    )
    empty = mk(0, 0)
    write_version(mk(0, 20), tdir, partition_by=["p"], append=True)
    write_version(empty, tdir, partition_by=["p"], append=True)
    write_version(empty, tdir, partition_by=["p"], append=True)
    v = compact_tail(spark, tdir)
    assert v == 4
    m = read_manifest(tdir, 4)
    assert m["data_dirs"] == ["v=000001"]
    assert not os.path.exists(os.path.join(tdir, "v=000004"))
    assert read_version(spark, tdir).count() == 20


def test_compact_tail_fuzz_content_invariant(spark, tmp_path):
    """Property: for ANY append chain (partitioned or not, with empty
    appends sprinkled in) and ANY interleaving of tail folds, the
    table's content, row_count, and listed-dirs-exist invariant hold.

    Deterministic derangement fuzz (seeded stdlib Random, no wall-clock
    dependence): 6 scenarios x up to 7 appends with folds interleaved —
    cheap enough for every run, broad enough to catch fold/read
    disagreements the example tests miss."""
    import os
    import random

    from mapreduce_4_spark.sources.versioned import compact_tail

    rng = random.Random(20260815)
    for case in range(6):
        partitioned = case % 2 == 0
        tdir = str(tmp_path / f"t{case}")
        expected: list[tuple] = []
        next_id = 0
        n_appends = rng.randint(3, 7)
        for step in range(n_appends):
            n = rng.choice([0, 0, 1, 3, 5]) if step else rng.randint(1, 5)
            rows = [(next_id + i, (next_id + i) % 3) for i in range(n)]
            next_id += n
            expected.extend(rows)
            df = spark.createDataFrame(rows, "id long, p long") if rows \
                else spark.createDataFrame([], "id long, p long")
            write_version(
                df, tdir, append=True,
                partition_by=["p"] if partitioned else None,
            )
            if rng.random() < 0.4:
                compact_tail(spark, tdir)
            got = sorted(map(tuple, read_version(spark, tdir).collect()))
            assert got == sorted(expected), (case, step)
            v = latest_version(tdir)
            m = read_manifest(tdir, v)
            assert m["row_count"] == len(expected), (case, step)
            for d in m.get("data_dirs") or []:
                assert os.path.exists(os.path.join(tdir, d)), (case, step, d)


def test_append_refuses_schema_drift(spark, tmp_path):
    """NON-ADDITIVE drift would silently corrupt the chain's multi-path
    read (parquet resolves mixed file schemas from whichever file it
    samples), so both publish paths refuse it loudly. Additive drift —
    new columns appended at the end — is the one legal evolution
    (round-11): it null-pads soundly at read."""
    from mapreduce_4_spark.sources.versioned import write_version_concurrent

    tdir = str(tmp_path / "t")
    base = spark.range(5).withColumnRenamed("id", "k")
    write_version(base, tdir, append=True)
    with pytest.raises(ValueError, match="append schema must match"):
        write_version(base.withColumn("k", F.col("k").cast("int")), tdir,
                      append=True)
    with pytest.raises(ValueError, match="append schema must match"):
        write_version(base.withColumnRenamed("k", "kk"), tdir, append=True)
    with pytest.raises(ValueError, match="append schema must match"):
        write_version_concurrent(
            base.withColumn("k", F.col("k").cast("int")), tdir, append=True)
    # same names+types (nullability-insensitive) still appends fine
    write_version(base.filter("k >= 3"), tdir, append=True)
    # additive appends are evolutions now — on BOTH publish paths
    v = write_version_concurrent(base.withColumn("extra", F.lit(1)), tdir,
                                 append=True)
    assert read_manifest(tdir, v)["schema_evolved"] is True
    # ...and once evolved, a SUBSET append (the old schema) is refused:
    # dropping a column is not additive
    with pytest.raises(ValueError, match="append schema must match"):
        write_version(base, tdir, append=True)
    from mapreduce_4_spark.sources.versioned import read_version as rv

    got = rv(spark, tdir)
    assert "extra" in got.columns
    assert got.filter(F.col("extra").isNull()).count() == 7


def test_read_version_pruned_is_listing_free_with_manifest_index(
        spark, tmp_path, monkeypatch):
    """Partitioned publishes index their col=value subdirs in the
    manifest (dir_parts), so a pruned probe touches NO filesystem
    listing at all — proven by making fsio.listdir explode; legacy
    manifests without the index fall back to one listing per dir."""
    import json
    import os

    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources import fsio
    from mapreduce_4_spark.sources import versioned as vt

    tdir = str(tmp_path / "chain")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.pmod("id", F.lit(4)).alias("p")
    )
    vt.write_version(mk(0, 40).repartition("p"), tdir,
                     partition_by=["p"], append=True)
    vt.write_version(mk(40, 80).repartition("p"), tdir,
                     partition_by=["p"], append=True)
    # empty append: no parquet written, dir_parts records []
    vt.write_version(mk(0, 0).repartition("p"), tdir,
                     partition_by=["p"], append=True)
    m = vt.read_manifest(tdir, 3)
    assert m["dir_parts"]["v=000001"] == [f"p={i}" for i in range(4)]
    assert m["dir_parts"]["v=000003"] == []

    real_listdir = fsio.listdir

    def boom(path):
        # resolving the head version legitimately lists _versions/ —
        # the claim is zero listings of DATA dirs
        if path.rstrip("/").endswith("_versions"):
            return real_listdir(path)
        raise AssertionError(f"listdir({path}) called on indexed probe")

    monkeypatch.setattr(fsio, "listdir", boom)
    got = vt.read_version_pruned(spark, tdir, {"p": [1]})
    assert sorted(r["id"] % 4 for r in got.collect()) == [1] * 20
    monkeypatch.undo()

    # the index carries through tail compaction (folded dir re-listed)
    vt.write_version(mk(80, 120).repartition("p"), tdir,
                     partition_by=["p"], append=True)
    v = vt.compact_tail(spark, tdir, keep_base=1)
    m = vt.read_manifest(tdir, v)
    assert set(m["dir_parts"]) == {"v=000001", f"v={v:06d}"}
    assert m["dir_parts"][f"v={v:06d}"] == [f"p={i}" for i in range(4)]
    monkeypatch.setattr(fsio, "listdir", boom)
    got = vt.read_version_pruned(spark, tdir, {"p": [2]})
    assert sorted(r["id"] % 4 for r in got.collect()) == [2] * 30
    monkeypatch.undo()

    # legacy manifest: strip the index -> probe lists, still correct
    mpath = os.path.join(tdir, "_versions", f"{v:06d}.json")
    legacy = json.loads(open(mpath).read())
    legacy.pop("dir_parts")
    with open(mpath, "w") as fh:
        json.dump(legacy, fh)
    got = vt.read_version_pruned(spark, tdir, {"p": [2]})
    assert sorted(r["id"] % 4 for r in got.collect()) == [2] * 30


# --- timestamp AS-OF time travel (round-11) --------------------------------


def test_timestamp_as_of_round_trip(spark, tmp_path):
    """read_version(as_of=ts) resolves to the latest version committed
    at or before ts, for epoch/datetime/ISO inputs alike; history()
    exposes the commit stamps a user copies back in."""
    import time
    from datetime import datetime, timezone

    from mapreduce_4_spark.sources.versioned import (
        table_changes,
        version_at,
    )

    tdir = str(tmp_path / "t")
    stamps = []
    for s in (0, 100, 200):
        write_version(spark.range(s, s + 10).withColumnRenamed("id", "k"),
                      tdir, append=True)
        stamps.append(time.time())

    assert version_at(tdir, stamps[0]) == 1
    assert version_at(tdir, stamps[1]) == 2
    assert version_at(tdir, stamps[2]) == 3
    got = read_version(spark, tdir, as_of=stamps[1])
    assert got.count() == 20  # v2's content, not v3's
    # datetime and ISO forms resolve identically to the epoch form
    dt = datetime.fromtimestamp(stamps[1], tz=timezone.utc)
    assert version_at(tdir, dt) == 2
    assert version_at(tdir, dt.isoformat()) == 2

    with pytest.raises(ValueError, match="not both"):
        read_version(spark, tdir, version=1, as_of=stamps[0])
    with pytest.raises(ValueError, match="predates the first commit"):
        version_at(tdir, stamps[0] - 3600)

    h = history(spark, tdir).orderBy("version").collect()
    assert all(r["committed_at"] is not None for r in h)
    assert [r["committed_at"] for r in h] == sorted(
        r["committed_at"] for r in h)

    # table_changes(since=ts) == table_changes(from_version=resolved)
    by_ts = {(r["k"], r["op"]) for r in
             table_changes(spark, tdir, "k", since=stamps[0]).collect()}
    by_v = {(r["k"], r["op"]) for r in
            table_changes(spark, tdir, "k", from_version=1).collect()}
    assert by_ts == by_v and len(by_ts) == 20  # v2+v3 appends as inserts
    with pytest.raises(ValueError, match="exactly one"):
        table_changes(spark, tdir, "k")
    with pytest.raises(ValueError, match="exactly one"):
        table_changes(spark, tdir, "k", from_version=1, since=stamps[0])


def test_as_of_vacuum_horizon_legacy_and_skew(spark, tmp_path):
    """The three resolver edge cases: vacuumed-away history errors
    loudly (not silently resolving to a newer snapshot), pre-stamping
    manifests count as arbitrarily old, and clock-skewed concurrent
    stamps get Delta's monotonic adjustment."""
    import json as _json
    import time

    from mapreduce_4_spark.sources.versioned import (
        _manifest_path,
        version_at,
    )

    tdir = str(tmp_path / "t")
    for s in (0, 100, 200):
        write_version(spark.range(s, s + 10).withColumnRenamed("id", "k"),
                      tdir, append=True)
    t_mid = time.time()
    write_version(spark.range(300, 310).withColumnRenamed("id", "k"),
                  tdir, append=True)
    assert version_at(tdir, t_mid) == 3
    vacuum(tdir, keep_last=1)
    with pytest.raises(ValueError, match="vacuum horizon"):
        version_at(tdir, t_mid)

    # synthetic stamps: legacy (None) + skew (v3 stamped BEFORE v2)
    tdir2 = str(tmp_path / "t2")
    for s in (0, 100, 200):
        write_version(spark.range(s, s + 10).withColumnRenamed("id", "k"),
                      tdir2, append=True)
    for v, stamp in ((1, None), (2, 300.0), (3, 200.0)):
        path = _manifest_path(tdir2, v)
        m = _json.loads(open(path).read())
        if stamp is None:
            m.pop("committed_at", None)
        else:
            m["committed_at"] = stamp
        with open(path, "w") as f:
            f.write(_json.dumps(m))
    assert version_at(tdir2, 100.0) == 1   # legacy manifest: always old
    # v3's effective time adjusts up to v2's 300 — at 250 only v1 is
    # visible (returning v3 would travel BACKWARD past v2)
    assert version_at(tdir2, 250.0) == 1
    assert version_at(tdir2, 300.0) == 3


# --- additive schema evolution on append chains (round-11) ------------------


def _kdf(spark, lo, hi, extra=False):
    df = spark.range(lo, hi).withColumnRenamed("id", "k")
    if extra:
        df = df.withColumn("extra", (F.col("k") * 2).cast("bigint"))
    return df


def test_additive_schema_evolution_append_chain(spark, tmp_path):
    """Appending a superset schema (new columns at the end) evolves the
    chain in place: pre-evolution dirs read as typed nulls, version
    reads stay time-travel-correct, and non-additive drift is still
    refused."""
    tdir = str(tmp_path / "t")
    write_version(_kdf(spark, 0, 10), tdir, append=True, stats_for=["k"])
    v2 = write_version(_kdf(spark, 100, 110, extra=True), tdir,
                       append=True, stats_for=["k", "extra"])
    assert v2 == 2
    got = read_version(spark, tdir)
    assert [f.name for f in got.schema.fields] == ["k", "extra"]
    assert got.count() == 20
    assert got.filter(F.col("extra").isNull()).count() == 10  # old dirs pad
    assert got.filter(F.col("extra") == F.col("k") * 2).count() == 10
    # time travel: v1 keeps its own (pre-evolution) schema
    assert [f.name for f in
            read_version(spark, tdir, version=1).schema.fields] == ["k"]

    # a same-superset append after evolution is NOT itself an evolution
    v3 = write_version(_kdf(spark, 200, 205, extra=True), tdir, append=True)
    assert read_manifest(tdir, 3)["schema_evolved"] is True
    assert read_version(spark, tdir).count() == 25

    # non-additive drift still refused loudly
    for bad in (
        _kdf(spark, 0, 5, extra=True).select("extra", "k"),   # reorder
        _kdf(spark, 0, 5).withColumn(
            "k", F.col("k").cast("int")),                      # type change
        _kdf(spark, 0, 5).withColumnRenamed("k", "kk"),        # rename
        _kdf(spark, 0, 5, extra=True).drop("k"),               # drop
    ):
        with pytest.raises(ValueError, match="append schema"):
            write_version(bad, tdir, append=True)


def test_evolution_metadata_aggregates_stay_metadata_only(spark, tmp_path):
    """The evolution backfill ([None, None, dir_rows] for brand-new
    stats columns) keeps COUNT/COUNT(col)/MIN/MAX/SUM/AVG answerable
    with spark=None across the evolved chain — old dirs contribute
    provable zeros instead of degrading to scans."""
    from mapreduce_4_spark.sources.versioned import (
        avg_version,
        count_version,
        minmax_version,
        read_version_stats_pruned,
        sum_version,
    )

    tdir = str(tmp_path / "t")
    write_version(_kdf(spark, 0, 10), tdir, append=True, stats_for=["k"])
    write_version(_kdf(spark, 100, 110, extra=True), tdir,
                  append=True, stats_for=["k", "extra"])

    m = read_manifest(tdir, 2)
    assert m["col_stats"]["v=000001"]["extra"] == [None, None, 10, None]

    # every aggregate below asserts the metadata-only path (spark=None)
    assert count_version(None, tdir) == 20
    assert count_version(None, tdir, count_col="extra") == 10
    assert count_version(None, tdir, count_col="k") == 20
    n, info = count_version(None, tdir, col="extra", lower=200, upper=220,
                            detail=True)
    assert (n, info["missed"], info["counted"]) == (10, 1, 1)
    assert sum_version(None, tdir, "extra") == 2 * sum(range(100, 110))
    assert minmax_version(None, tdir, "extra") == (200, 218)
    assert avg_version(None, tdir, "extra") == 209.0
    # bounded AVG: old dir provably misses, new dir provably covered
    assert avg_version(None, tdir, "extra", lower=200, upper=220) == 209.0

    # the stats-pruned read composes with the padding read path
    assert read_version_stats_pruned(
        spark, tdir, "extra", lower=0, upper=100).count() == 0
    assert read_version_stats_pruned(
        spark, tdir, "extra", lower=200, upper=210).count() == 6


def test_evolution_partitioned_chain_and_folds(spark, tmp_path):
    """Evolved partitioned chains null-pad through both the full chain
    read and the manifest-pruned probe; compact_tail folds conform the
    tail, and a full compact() resets the evolved flag."""
    from mapreduce_4_spark.sources.versioned import (
        compact,
        compact_tail,
        read_version_pruned,
    )

    tdir = str(tmp_path / "t")
    p1 = _kdf(spark, 0, 10).withColumn("p", (F.col("k") % 2).cast("int"))
    p2 = (_kdf(spark, 100, 110, extra=True)
          .withColumn("p", (F.col("k") % 2).cast("int")))
    write_version(p1, tdir, append=True, partition_by=["p"])
    write_version(p2, tdir, append=True, partition_by=["p"])
    got = read_version(spark, tdir)
    assert got.count() == 20
    assert got.filter(F.col("extra").isNull()).count() == 10
    pruned = read_version_pruned(spark, tdir, {"p": [0]})
    assert pruned.count() == 10
    assert pruned.filter(F.col("extra").isNull()).count() == 5

    # third append so the tail (dirs 2..3) folds; base dir 1 stays old
    write_version(_kdf(spark, 200, 206, extra=True)
                  .withColumn("p", (F.col("k") % 2).cast("int")),
                  tdir, append=True, partition_by=["p"])
    v = compact_tail(spark, tdir)
    assert v == 4 and read_manifest(tdir, 4)["schema_evolved"] is True
    got = read_version(spark, tdir)
    assert got.count() == 26
    assert got.filter(F.col("extra").isNull()).count() == 10

    v = compact(spark, tdir)
    m = read_manifest(tdir, v)
    assert not m.get("schema_evolved") and m.get("data_dirs") is None
    got = read_version(spark, tdir)
    assert got.count() == 26
    assert got.filter(F.col("extra").isNull()).count() == 10


def test_count_col_and_avg_on_null_bearing_chain(spark, tmp_path):
    """COUNT(col)/AVG from recorded null counts on a chain with real
    nulls — the non-evolution base case of the round-11 aggregates."""
    from mapreduce_4_spark.sources.versioned import (
        avg_version,
        count_version,
    )

    tdir = str(tmp_path / "t")
    d1 = spark.range(10).select(
        F.when(F.col("id") < 3, F.lit(None))
        .otherwise(F.col("id")).cast("bigint").alias("k"))
    write_version(d1, tdir, append=True, stats_for=["k"])
    write_version(_kdf(spark, 100, 105), tdir, append=True)

    assert count_version(None, tdir) == 15
    assert count_version(None, tdir, count_col="k") == 12
    want = (sum(range(3, 10)) + sum(range(100, 105))) / 12
    assert avg_version(None, tdir, "k") == want
    # bounded: dir 1 provably misses [100, ...], dir 2 fully covered
    assert avg_version(None, tdir, "k", lower=100, upper=200) == \
        sum(range(100, 105)) / 5
    # bounds straddling dir 1 need a scan: spark=None refuses loudly
    with pytest.raises(ValueError, match="pass a SparkSession"):
        avg_version(None, tdir, "k", lower=5, upper=200)
    assert avg_version(spark, tdir, "k", lower=5, upper=200) == \
        (sum(range(5, 10)) + sum(range(100, 105))) / 10


def test_as_of_threads_through_every_aggregate(spark, tmp_path):
    """version= and as_of= are interchangeable addressing modes on every
    reader and metadata aggregate (round-11 completion of the AS-OF
    surface), resolved by the one shared helper."""
    import time

    from mapreduce_4_spark.sources.versioned import (
        avg_version,
        count_version,
        minmax_version,
        read_version_stats_pruned,
        sum_version,
    )

    tdir = str(tmp_path / "t")
    write_version(_kdf(spark, 0, 10), tdir, append=True, stats_for=["k"])
    t1 = time.time()
    write_version(_kdf(spark, 100, 110), tdir, append=True)

    assert count_version(None, tdir, as_of=t1) == 10
    assert sum_version(None, tdir, "k", as_of=t1) == sum(range(10))
    assert minmax_version(None, tdir, "k", as_of=t1) == (0, 9)
    assert avg_version(None, tdir, "k", as_of=t1) == 4.5
    assert read_version_stats_pruned(
        spark, tdir, "k", lower=0, upper=1000, as_of=t1).count() == 10
    with pytest.raises(ValueError, match="not both"):
        count_version(None, tdir, version=1, as_of=t1)

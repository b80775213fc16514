"""Snapshot-versioned parquet tables — a minimal lakehouse table format
(Delta/Iceberg-shaped, dependency-free) for the maintenance operators to
target: every write is an immutable snapshot directory plus a JSON
manifest, so readers get time travel and writers get atomic publish.

Layout:

    table_dir/
      _versions/000001.json   {"version", "row_count", "schema", "parent"}
      v=000001/  ...parquet...

Commit protocol: data lands under ``v=N/`` FIRST, the manifest is
written LAST (rename-free single-file publish) — a reader only sees a
version once its manifest exists, so a crashed writer leaves garbage
data but never a readable half-snapshot. That is exactly the
object-store-safe publish order real table formats use; what they add
beyond this (optimistic concurrency on the manifest swap, column stats
for file skipping, compaction) is orthogonal to the read/write surface
exposed here.

Scale: manifests are O(1) metadata; snapshots are plain parquet
directories, so reads keep pushdown/pruning, and time travel costs
nothing at write time (old snapshots are simply not deleted until
``vacuum``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_versions")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_versions_dir(table_dir), f"{version:06d}.json")


def _data_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v={version:06d}")


def list_versions(table_dir: str) -> list[int]:
    vdir = _versions_dir(table_dir)
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(f.split(".")[0]) for f in os.listdir(vdir) if f.endswith(".json")
    )


def latest_version(table_dir: str) -> int | None:
    versions = list_versions(table_dir)
    return versions[-1] if versions else None


def write_version(df: DataFrame, table_dir: str) -> int:
    """Publish a new immutable snapshot; returns its version number."""
    parent = latest_version(table_dir)
    version = (parent or 0) + 1
    data_dir = _data_dir(table_dir, version)
    df.write.mode("errorifexists").parquet(data_dir)
    row_count = df.sparkSession.read.parquet(data_dir).count()
    os.makedirs(_versions_dir(table_dir), exist_ok=True)
    manifest = {
        "version": version,
        "parent": parent,
        "row_count": row_count,
        "schema": df.schema.jsonValue(),
    }
    # manifest written last = the publish point
    with open(_manifest_path(table_dir, version), "w") as fh:
        json.dump(manifest, fh)
    return version


def read_version(spark: SparkSession, table_dir: str,
                 version: int | None = None) -> DataFrame:
    """Latest snapshot, or time-travel to an explicit ``version``."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no published versions in {table_dir}")
    elif not os.path.exists(_manifest_path(table_dir, version)):
        raise FileNotFoundError(f"version {version} not published in {table_dir}")
    return spark.read.parquet(_data_dir(table_dir, version))


def read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as fh:
        return json.load(fh)


def history(spark: SparkSession, table_dir: str) -> DataFrame:
    """One row per published snapshot (version, parent, row_count)."""
    rows = [
        (m["version"], m["parent"], m["row_count"])
        for m in (read_manifest(table_dir, v) for v in list_versions(table_dir))
    ]
    return spark.createDataFrame(
        rows, "version long, parent long, row_count long"
    )


def upsert_version(spark: SparkSession, table_dir: str, updates: DataFrame,
                   key: str) -> int:
    """Keyed merge against the latest snapshot, published as a new
    version — the maintenance upsert with time travel for free."""
    from mapreduce_4_spark.operators.maintenance import upsert

    base = read_version(spark, table_dir)
    return write_version(upsert(base, updates, key), table_dir)


def compact(spark: SparkSession, table_dir: str, target_files: int = 1) -> int:
    """Rewrite the latest snapshot into ``target_files`` files as a NEW
    version — the small-files maintenance pass. Readers of the previous
    version are untouched (snapshots are immutable); vacuum reclaims it
    when it ages out."""
    latest = read_version(spark, table_dir)
    return write_version(latest.coalesce(target_files), table_dir)


def vacuum(table_dir: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (data + manifest,
    manifest FIRST so concurrent readers never see a published version
    whose data is disappearing). Returns removed versions."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_dir)
    doomed = versions[:-keep_last] if keep_last < len(versions) else []
    for v in doomed:
        os.remove(_manifest_path(table_dir, v))
        shutil.rmtree(_data_dir(table_dir, v), ignore_errors=True)
    return doomed

"""CDC read tier for snapshot-versioned tables: subscribe to a table's
changes the way ``versioned_upsert_sink`` writes them.

``table_changes`` (sources/versioned.py) answers the point-in-time
question — the diff between two versions. This module turns it into a
FEED: an incremental, checkpointed replay that delivers one change
batch per published version to a ``foreachBatch``-style callback
``(changes_df, version)``. The loop is the exact read-side mirror of
the write-side exactly-once contract in streaming/foreach_batch.py:

- delivery is at-least-once (the checkpoint is committed AFTER the
  callback returns, so a crash in between redelivers that version);
- the callback makes it exactly-once by being idempotent on the
  version id — the stable replay key, same role batch_id plays on the
  write side (``changes_to_parquet`` below is the canonical example:
  dynamic partition overwrite on ``version``).

Each delivered batch is ``snapshot_diff(v-1, v)`` — the SAME operator
the batch ``table_changes`` read uses, so the streamed feed and the
batch oracle agree by construction (pinned in tests). Version 1 diffs
against an empty snapshot: every initial row surfaces as an 'I'.

Scale: one full-outer join per version pair, the manifest listing is
O(versions) driver-side metadata, and nothing is ever collected — the
change batches stay distributed DataFrames. With snapshots bucketed on
the key (sources/versioned.py) the per-pair join is exchange-free. A
subscriber far behind (or first-subscribing to a long-lived table)
opts into ``coalesce_after=N``: catch-up is then ONE net diff
last->latest instead of one join per missed version. A checkpoint that
predates the vacuum retention window refuses to resume (deletes in the
gap are undeliverable) unless the subscriber opts into a full reload;
schema evolution between versions is absorbed by typed-null padding so
adds/drops surface as updates instead of wedging the feed.

The reference has no streaming or CDC at all (SURVEY.md §2.2); this
generalizes its stage-to-stage file handoff (O6/O8: a consumer stage
re-reads what the producer stage materialized, asio_deep/main.cpp:
293-331) into an incremental, resumable subscription.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _read_checkpoint(path: str) -> int:
    """Last fully-delivered version, 0 if the feed has never run."""
    if not os.path.exists(path):
        return 0
    with open(path) as fh:
        return int(json.load(fh)["last_version"])


def _commit_checkpoint(path: str, version: int) -> None:
    """Atomic single-file commit (write-temp + rename), the same
    publish-point discipline as the table's own manifests."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"last_version": version}, fh)
    os.replace(tmp, path)


def _aligned_diff(old: DataFrame, new: DataFrame, key: str,
                  compare: list[str] | None) -> DataFrame:
    """Schema-evolution-tolerant diff. The alignment logic lives one
    layer down, in operators/maintenance.py::snapshot_diff_aligned,
    shared with the batch ``table_changes`` read — so the feed and the
    batch oracle agree on evolved schemas by construction, not by two
    parallel implementations."""
    from mapreduce_4_spark.operators.maintenance import snapshot_diff_aligned

    return snapshot_diff_aligned(old, new, key, compare)


def version_changes(spark: SparkSession, table_dir: str, key: str,
                    version: int,
                    compare: list[str] | None = None) -> DataFrame:
    """The change batch a CDC subscriber sees for ``version``:
    ``snapshot_diff`` against its parent, or against an empty snapshot
    when the parent is unavailable — version 1, AND the oldest version
    still retained after ``vacuum`` dropped its ancestors. A NEW
    subscriber arriving later than the retention window gets the oldest
    retained snapshot as its initial 'I' load, the same catch-up
    semantics Delta CDF readers have past the retention boundary. (For
    an EXISTING checkpoint that predates the window, ``replay_changes``
    refuses instead of silently reloading — see its retention guard.)"""
    from mapreduce_4_spark.sources.versioned import list_versions, read_version

    new = read_version(spark, table_dir, version)
    if version - 1 in list_versions(table_dir):
        old = read_version(spark, table_dir, version - 1)
    else:
        from pyspark.sql import functions as F

        old = new.filter(F.lit(False))
    return _aligned_diff(old, new, key, compare)


def replay_changes(spark: SparkSession, table_dir: str, key: str,
                   checkpoint_path: str,
                   batch_fn: Callable[[DataFrame, int], None],
                   compare: list[str] | None = None,
                   coalesce_after: int | None = None,
                   allow_full_reload: bool = False) -> list[int]:
    """Drain every version published since the checkpoint through
    ``batch_fn(changes_df, version)``; returns the versions delivered
    this call. Re-invoking after new publishes resumes where it left
    off — the availableNow-trigger shape of a CDC subscription.

    The checkpoint commits after each callback, so one version is the
    unit of redelivery: a crash mid-feed never skips a version and
    never half-commits one.

    Retention guard: if the checkpoint names a version older than the
    oldest retained parent (``vacuum`` dropped the gap), per-version
    replay would silently deliver the oldest retained snapshot as a
    full 'I' initial load — redelivering rows the subscriber already
    holds and NEVER delivering deletes that happened inside the gap.
    That corrupts any downstream state applying I/U/D ops, so it raises
    instead (Delta CDF does the same); pass ``allow_full_reload=True``
    only when the subscriber treats each batch as a full refresh.

    Catch-up compaction: with ``coalesce_after=N``, a subscriber more
    than N versions behind gets ONE batch — the net diff
    ``last_checkpointed -> latest`` (same operator the batch
    ``table_changes`` read uses) delivered with the latest version as
    its replay key — instead of one full-outer join per missed version.
    A feed 10⁴ versions behind catches up with one join; intermediate
    flip-flops collapse away, net result identical by construction.
    """
    from mapreduce_4_spark.sources.versioned import list_versions, read_version

    last = _read_checkpoint(checkpoint_path)
    versions = list_versions(table_dir)

    # Checkpoint AHEAD of the whole retained history: the table was
    # recreated or rolled back underneath the subscriber. Per-version
    # replay would silently deliver nothing forever while the table's
    # content was fully replaced — the same corruption class as the
    # retention gap below, in the other direction.
    if versions and last > max(versions):
        if not allow_full_reload:
            raise ValueError(
                f"CDC checkpoint at version {last} is AHEAD of the table's "
                f"entire history (latest retained: {max(versions)}): the "
                "table was recreated or rolled back, so resuming would "
                "silently deliver nothing while its content changed. Pass "
                "allow_full_reload=True to restart as an initial load, or "
                "re-subscribe from a fresh checkpoint."
            )
        last = 0

    pending = [v for v in versions if v > last]
    if not pending:
        return []

    if last > 0 and last not in versions and last < min(versions):
        if not allow_full_reload:
            raise ValueError(
                f"CDC checkpoint at version {last} predates the retention "
                f"window (oldest retained: {min(versions)}): deletes inside "
                "the vacuumed gap can no longer be delivered, so resuming "
                "would silently corrupt I/U/D-applying subscribers. Pass "
                "allow_full_reload=True to accept initial-load semantics, "
                "or re-subscribe from a fresh checkpoint."
            )
        # explicit opt-in: restart as a full reload of the latest state
        last = 0

    if coalesce_after is not None and len(pending) > coalesce_after:
        latest = max(pending)
        new = read_version(spark, table_dir, latest)
        if last > 0 and last in versions:
            old = read_version(spark, table_dir, last)
        else:
            from pyspark.sql import functions as F

            old = new.filter(F.lit(False))
        batch_fn(_aligned_diff(old, new, key, compare), latest)
        _commit_checkpoint(checkpoint_path, latest)
        return [latest]

    delivered: list[int] = []
    for v in pending:
        batch_fn(version_changes(spark, table_dir, key, v, compare), v)
        _commit_checkpoint(checkpoint_path, v)
        delivered.append(v)
    return delivered


def changes_readstream(spark: SparkSession, out_dir: str,
                       schema=None) -> DataFrame:
    """Subscribe to a ``changes_to_parquet`` changelog as a LIVE stream:
    each version the feed lands under ``out_dir/version=N/`` is a new
    set of files for the FileStreamSource, so a downstream streaming
    pipeline (enrichment, rollup refresh, audit sink) consumes the
    table's changes continuously — versioned table -> change feed ->
    changelog -> readStream completes the subscription story without a
    message bus.

    File streams need the schema up front. By default it comes from a
    batch peek of the changelog, which requires at least one delivered
    batch; to subscribe BEFORE the first delivery, pass ``schema``
    explicitly (op string, the key, old_*/new_* columns, version int).
    """
    if schema is None:
        from pyspark.errors import AnalysisException

        try:
            schema = spark.read.parquet(out_dir).schema
        except AnalysisException as ex:
            raise ValueError(
                f"changelog at {out_dir!r} is empty or absent; run "
                "replay_changes first or pass schema= to subscribe "
                "ahead of the first delivery"
            ) from ex
    return spark.readStream.schema(schema).parquet(out_dir)


def changes_to_parquet(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Canonical exactly-once CDC subscriber: append each version's
    change rows under ``out_dir/version=N/`` with dynamic partition
    overwrite, so a redelivered version replaces its own partition
    instead of duplicating rows — idempotent on the replay key, which
    upgrades the feed's at-least-once delivery to exactly-once."""
    from pyspark.sql import functions as F

    def write_batch(changes: DataFrame, version: int) -> None:
        (
            changes.withColumn("version", F.lit(version))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("version")
            .parquet(out_dir)
        )

    return write_batch

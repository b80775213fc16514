"""CDC read tier (streaming/cdc.py): incremental checkpointed replay of
a versioned table's changes, agreeing with the batch table_changes
oracle and exactly-once under redelivery."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_4_spark.sources import load_table
from mapreduce_4_spark.sources.versioned import (
    table_changes,
    upsert_version,
    write_version,
)
from mapreduce_4_spark.streaming import (
    changes_to_parquet,
    replay_changes,
    version_changes,
)


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def _orders(spark, sf_smoke):
    return load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _publish_three_versions(spark, sf_smoke, tdir):
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    upsert_version(
        spark, tdir,
        base.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1),
        "o_orderkey",
    )
    upsert_version(
        spark, tdir,
        base.limit(3).withColumn("o_orderstatus", F.lit("X")),
        "o_orderkey",
    )
    return base


def test_feed_batches_equal_batch_table_changes(spark, sf_smoke, tmp_path):
    """Each delivered batch IS table_changes(v-1, v); version 1 is the
    initial load — every row an 'I' with NULL old_* columns."""
    tdir = str(tmp_path / "t")
    base = _publish_three_versions(spark, sf_smoke, tdir)

    seen: dict[int, list] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", str(tmp_path / "ckpt.json"),
        lambda df, v: seen.__setitem__(v, _rows(df)),
    )
    assert delivered == [1, 2, 3]

    v1 = version_changes(spark, tdir, "o_orderkey", 1)
    assert seen[1] == _rows(v1)
    assert v1.count() == base.count()
    one = v1.first()
    assert one["op"] == "I" and one["old_o_totalprice"] is None

    for v in (2, 3):
        assert seen[v] == _rows(
            table_changes(spark, tdir, "o_orderkey", v - 1, v)
        ), f"feed batch v{v} != batch table_changes"


def test_feed_resumes_from_checkpoint(spark, sf_smoke, tmp_path):
    """A second replay delivers nothing; publishing a new version then
    delivers exactly that version — the availableNow subscription."""
    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    base = _publish_three_versions(spark, sf_smoke, tdir)
    calls: list[int] = []
    fn = lambda df, v: calls.append(v)  # noqa: E731

    assert replay_changes(spark, tdir, "o_orderkey", ckpt, fn) == [1, 2, 3]
    assert replay_changes(spark, tdir, "o_orderkey", ckpt, fn) == []

    upsert_version(
        spark, tdir,
        base.limit(1).withColumn("o_totalprice", F.lit(-1.0)),
        "o_orderkey",
    )
    assert replay_changes(spark, tdir, "o_orderkey", ckpt, fn) == [4]
    assert calls == [1, 2, 3, 4]


def test_feed_exactly_once_under_redelivery(spark, sf_smoke, tmp_path):
    """Crash-between-callback-and-checkpoint: rewinding the checkpoint
    redelivers the last version, and the idempotent parquet subscriber
    (partition overwrite on version) leaves the sink byte-identical."""
    import json

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    out = str(tmp_path / "changes")
    _publish_three_versions(spark, sf_smoke, tdir)

    replay_changes(spark, tdir, "o_orderkey", ckpt, changes_to_parquet(out))
    before = _rows(spark.read.parquet(out))

    # simulate the crash: checkpoint says v2 was the last committed,
    # so v3 gets redelivered into a sink that already holds it
    with open(ckpt, "w") as fh:
        json.dump({"last_version": 2}, fh)
    redeliv = replay_changes(
        spark, tdir, "o_orderkey", ckpt, changes_to_parquet(out)
    )
    assert redeliv == [3]
    assert _rows(spark.read.parquet(out)) == before

    # and the sink reconciles with the batch oracle per version
    sunk = spark.read.parquet(out)
    for v in (2, 3):
        assert _rows(sunk.filter(F.col("version") == v).drop("version")) == _rows(
            table_changes(spark, tdir, "o_orderkey", v - 1, v)
        )


def test_feed_over_bucketed_table_is_exchange_free(spark, sf_smoke, tmp_path):
    """With snapshots bucketed on the CDC key, the per-version diff join
    plans with zero Exchange — the layout contract carries through the
    read tier (and through upsert_version's layout propagation)."""
    tdir = str(tmp_path / "t")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir, bucket_by=["o_orderkey"], n_buckets=4)
    upsert_version(
        spark, tdir,
        base.limit(5).withColumn("o_totalprice", F.lit(0.0)),
        "o_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = version_changes(spark, tdir, "o_orderkey", 2)
        plan = diff._jdf.queryExecution().executedPlan().toString()
        n = diff.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert n == 5


def test_cdc_roundtrip_reconstructs_streamed_table(spark, sf_smoke, tmp_path):
    """Write side meets read side: a streaming upsert sink publishes
    versions, the CDC feed replays them, and folding the change batches
    (last op per key wins; 'D' removes) reconstructs exactly the latest
    snapshot — the end-to-end proof that the feed loses and duplicates
    nothing across the whole ingestion history."""
    from pyspark.sql import Window

    from mapreduce_4_spark.sources.versioned import read_version
    from mapreduce_4_spark.streaming import (
        events_stream,
        versioned_upsert_sink,
    )

    tdir, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    feed_ckpt, out = str(tmp_path / "feed.json"), str(tmp_path / "changes")

    agg = (
        events_stream(spark, sf_smoke, max_files_per_trigger=1)
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.writeStream.foreachBatch(versioned_upsert_sink(tdir, "user_id"))
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    delivered = replay_changes(
        spark, tdir, "user_id", feed_ckpt, changes_to_parquet(out)
    )
    assert delivered, "feed must deliver every published version"

    ch = spark.read.parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.desc("version"))
    rebuilt = (
        ch.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.col("new_n_events").alias("n_events"))
    )
    expected = {
        (r["user_id"], r["n_events"])
        for r in read_version(spark, tdir).collect()
    }
    assert {
        (r["user_id"], r["n_events"]) for r in rebuilt.collect()
    } == expected


def test_changelog_is_consumable_as_a_stream(spark, sf_smoke, tmp_path):
    """changes_readstream over the feed's parquet changelog: an
    availableNow drain sees exactly the batch rows, and a version
    published AFTER the first drain arrives incrementally on the next —
    the changelog is a live source, not a one-shot export."""
    from mapreduce_4_spark.streaming import changes_readstream

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    out = str(tmp_path / "changes")
    base = _publish_three_versions(spark, sf_smoke, tdir)
    replay_changes(spark, tdir, "o_orderkey", ckpt, changes_to_parquet(out))

    def drain(name):
        q = (
            changes_readstream(spark, out)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"sckpt_{name}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.table(name)

    got = drain("cdc_stream_1")
    assert _rows(got) == _rows(spark.read.parquet(out))

    # a fourth version lands; the stream (fresh drain, same source dir)
    # picks up exactly the new files
    upsert_version(
        spark, tdir,
        base.limit(2).withColumn("o_totalprice", F.lit(-9.0)),
        "o_orderkey",
    )
    assert replay_changes(
        spark, tdir, "o_orderkey", ckpt, changes_to_parquet(out)
    ) == [4]
    got2 = drain("cdc_stream_2")
    assert _rows(got2) == _rows(spark.read.parquet(out))
    assert got2.filter(F.col("version") == 4).count() == 2


def test_feed_past_vacuum_retention_gives_initial_load(spark, sf_smoke, tmp_path):
    """A subscriber arriving after vacuum dropped the older versions
    gets the oldest retained snapshot as its 'I' initial load instead
    of crashing on the missing parent manifest."""
    from mapreduce_4_spark.sources.versioned import read_version, vacuum

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    _publish_three_versions(spark, sf_smoke, tdir)
    vacuum(tdir, keep_last=1)

    seen: dict[int, int] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: seen.__setitem__(
            v, df.filter(F.col("op") == "I").count()
        ),
    )
    assert delivered == [3]
    assert seen[3] == read_version(spark, tdir, 3).count()


def test_changes_readstream_clear_error_before_first_delivery(
    spark, tmp_path
):
    import pytest

    from mapreduce_4_spark.streaming import changes_readstream

    with pytest.raises(ValueError, match="empty or absent"):
        changes_readstream(spark, str(tmp_path / "nowhere"))


def test_feed_refuses_checkpoint_past_retention(spark, sf_smoke, tmp_path):
    """An EXISTING checkpoint older than the retention window must not
    silently become an initial load: rows the subscriber already holds
    would be redelivered as 'I' and deletes inside the vacuumed gap
    would never be delivered. The feed raises (Delta-CDF semantics)
    unless the subscriber explicitly opts into a full reload."""
    import json

    import pytest

    from mapreduce_4_spark.sources.versioned import read_version, vacuum

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    _publish_three_versions(spark, sf_smoke, tdir)
    with open(ckpt, "w") as fh:
        json.dump({"last_version": 1}, fh)
    vacuum(tdir, keep_last=1)  # only v3 retained; v2 (= ckpt+1) is gone

    with pytest.raises(ValueError, match="retention window"):
        replay_changes(spark, tdir, "o_orderkey", ckpt, lambda df, v: None)

    # explicit opt-in: full reload of the latest state, all 'I'
    seen: dict[int, int] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: seen.__setitem__(v, df.filter(F.col("op") == "I").count()),
        allow_full_reload=True,
    )
    assert delivered == [3]
    assert seen[3] == read_version(spark, tdir, 3).count()


def test_feed_coalesced_catchup_single_join(spark, sf_smoke, tmp_path):
    """A subscriber more than coalesce_after versions behind gets ONE
    net batch — diff(checkpoint -> latest), the same operator as the
    batch table_changes oracle — instead of one join per version."""
    import json

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    _publish_three_versions(spark, sf_smoke, tdir)
    with open(ckpt, "w") as fh:
        json.dump({"last_version": 1}, fh)

    batches: dict[int, list] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: batches.__setitem__(v, _rows(df)),
        coalesce_after=1,
    )
    assert delivered == [3]  # one batch, keyed by the latest version
    assert batches[3] == _rows(
        table_changes(spark, tdir, "o_orderkey", 1, 3)
    ), "coalesced catch-up must equal the batch table_changes net diff"

    # and a NEW subscriber coalesces to one initial load of latest
    ckpt2 = str(tmp_path / "ckpt2.json")
    n_i: dict[int, int] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt2,
        lambda df, v: n_i.__setitem__(v, df.filter(F.col("op") == "I").count()),
        coalesce_after=2,
    )
    from mapreduce_4_spark.sources.versioned import read_version

    assert delivered == [3]
    assert n_i[3] == read_version(spark, tdir, 3).count()


def test_feed_survives_schema_evolution(spark, sf_smoke, tmp_path):
    """A column added between versions must not wedge the feed with an
    AnalysisException mid-replay: the old side is padded with typed
    nulls, so the add surfaces as NULL -> value updates."""
    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    write_version(base.withColumn("o_tier", F.lit("gold")), tdir)  # add
    write_version(base.drop("o_orderstatus"), tdir)                # drop

    seen: dict[int, object] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: seen.__setitem__(v, df),
    )
    assert delivered == [1, 2, 3]
    # v2: every row updates NULL -> 'gold' on the added column
    v2 = seen[2]
    assert v2.filter(F.col("op") == "U").count() == base.count()
    assert v2.filter(F.col("old_o_tier").isNull()).count() == base.count()
    assert v2.filter(F.col("new_o_tier") == "gold").count() == base.count()
    # v3: both the dropped columns surface as value -> NULL updates
    v3 = seen[3]
    assert v3.filter(F.col("op") == "U").count() == base.count()
    assert v3.filter(F.col("new_o_orderstatus").isNull()).count() == base.count()
    # an explicit compare naming a column on neither side still fails
    import pytest

    with pytest.raises(ValueError, match="neither snapshot"):
        from mapreduce_4_spark.streaming import version_changes as vc

        vc(spark, tdir, "o_orderkey", 3, compare=["no_such_col"]).collect()


def test_feed_refuses_checkpoint_ahead_of_history(spark, sf_smoke, tmp_path):
    """A checkpoint AHEAD of the whole retained history means the table
    was recreated or rolled back: per-version replay would silently
    deliver nothing forever while the content changed. The feed raises
    unless the subscriber opts into a full reload."""
    import json

    import pytest

    from mapreduce_4_spark.sources.versioned import read_version

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    _publish_three_versions(spark, sf_smoke, tdir)
    with open(ckpt, "w") as fh:
        json.dump({"last_version": 10}, fh)  # table history tops out at 3

    with pytest.raises(ValueError, match="AHEAD"):
        replay_changes(spark, tdir, "o_orderkey", ckpt, lambda df, v: None)

    seen: dict[int, int] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: seen.__setitem__(v, df.count()),
        allow_full_reload=True,
    )
    assert delivered == [1, 2, 3]  # restarted as a full replay
    assert seen[1] == read_version(spark, tdir, 1).count()


def test_batch_table_changes_survives_schema_evolution(spark, sf_smoke, tmp_path):
    """The BATCH read and the feed share one aligned diff: a column
    added between versions must not wedge table_changes either, and the
    coalesced feed catch-up must equal it on the evolved range."""
    import json

    tdir, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt.json")
    base = _orders(spark, sf_smoke)
    write_version(base, tdir)
    write_version(base.withColumn("o_tier", F.lit("gold")), tdir)
    write_version(base.drop("o_orderstatus"), tdir)

    batch = table_changes(spark, tdir, "o_orderkey", 1, 3)
    assert batch.filter(F.col("op") == "U").count() == base.count()

    with open(ckpt, "w") as fh:
        json.dump({"last_version": 1}, fh)
    got: dict[int, list] = {}
    delivered = replay_changes(
        spark, tdir, "o_orderkey", ckpt,
        lambda df, v: got.__setitem__(v, _rows(df)),
        coalesce_after=1,
    )
    assert delivered == [3]
    assert got[3] == _rows(batch)

"""Physical-layout operator tests: bucketed joins plan without
exchanges; salted joins return exactly the plain-join result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.partitioning import salted_join, write_bucketed
from mapreduce_4_spark.sources import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "orders_bucketed", ["l_orderkey"], n_buckets=8,
    )
    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    # bucketed joins need SMJ, not broadcast, to exploit the layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == (
            load_table(spark, sf_smoke, "lineitem")
            .join(
                load_table(spark, sf_smoke, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_salted_join_equals_plain_join(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(orders, "k")
    salted = salted_join(li, orders, "k", n_salts=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A single hot key must land in multiple salt buckets."""
    hot = spark.range(10000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(hot, dim, "k", n_salts=8)
    assert out.count() == 10000
    # verify the salt actually fans out (probe the internal column)
    salt = F.pmod(F.xxhash64(F.struct("k", "payload")), F.lit(8))
    n_buckets = hot.select(salt.alias("s")).distinct().count()
    assert n_buckets == 8


def test_auto_salted_join_detects_hot_key_and_matches_plain(spark):
    """95%-hot fixture: detection must surface the hot key, and the
    adaptive join must return exactly the plain-join result (inner AND
    left, including unmatched and NULL left keys)."""
    from mapreduce_4_spark.operators.partitioning import detect_hot_keys

    left = spark.range(20000).select(
        F.when(F.col("id") % 100 < 95, F.lit(7))
        .when(F.col("id") % 100 == 99, F.lit(None))
        .otherwise(F.col("id") % 100 + 1000)  # 1000.. never in right
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    hot = detect_hot_keys(left, "k", hot_threshold=0.5)
    assert hot == [7]
    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        auto = salted_join(left, right, "k", n_salts=4, how=how, auto=True,
                           hot_threshold=0.5)
        canon = lambda df: sorted(map(repr, map(tuple, df.collect())))  # noqa: E731
        assert canon(auto) == canon(plain), how


def test_hot_keys_salted_join_matches_plain_without_sampling(spark):
    """Caller-supplied hot_keys take the same hot/cold split as auto
    but with zero sampling jobs; result must equal the plain join."""
    left = spark.range(10000).select(
        F.when(F.col("id") % 10 < 8, F.lit(3))
        .otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("rv")
    )
    got = salted_join(left, right, "k", n_salts=4, hot_keys=[3])
    plain = left.join(right, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # empty hot_keys degenerates to the plain join plan
    assert "_salt" not in salted_join(left, right, "k", hot_keys=[]).columns


def test_auto_salted_join_without_skew_is_plain_join(spark):
    """No key over the threshold -> the plan IS the plain join (no salt
    column, no right-side replication)."""
    left = spark.range(5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    auto = salted_join(left, right, "k", n_salts=4, auto=True,
                       hot_threshold=0.3)
    assert "_salt" not in auto.columns
    plain = left.join(right, "k")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, plain.collect()))


def test_zorder_bucket_locality(spark, sf_oracle):
    """THE z-order property: within one zbucket (top byte of the 16-bit
    z-value), BOTH dimensions span at most 16 values (their high
    nibbles are fixed) — one sort order gives min/max file-skipping
    selectivity on either column. A single-column sort has this only
    for its own column."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.plans.maintenance import zorder_interleave_events

    df = zorder_interleave_events(spark, sf_oracle)
    spans = df.groupBy("zbucket").agg(
        (F.max("u8") - F.min("u8")).alias("u_span"),
        (F.max("k8") - F.min("k8")).alias("k_span"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = spans.filter((F.col("u_span") > 15) | (F.col("k_span") > 15)).count()
    assert bad == 0
    # z-value round-trip: de-interleaving recovers both dimensions
    row = df.filter(F.col("event_id") == df.select(F.min("event_id"))
                    .first()[0]).first()
    z = row["zval"]
    u = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    k = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (u, k) == (row["u8"], row["k8"])


def test_incremental_join_refresh_partials_are_disjoint_complete(spark, sf_oracle):
    """The delta predicate must partition orders exactly (every order in
    exactly one of base/delta) — the invariant that makes the merged MV
    equal the full recompute (equality itself is oracle-checked)."""
    from pyspark.sql import functions as F

    from mapreduce_4_spark.plans.maintenance import _JMV_MOD
    from mapreduce_4_spark.sources import load_table

    orders = load_table(spark, sf_oracle, "orders").select("o_orderkey")
    n = orders.count()
    nb = orders.filter(F.col("o_orderkey") % _JMV_MOD != 0).count()
    nd = orders.filter(F.col("o_orderkey") % _JMV_MOD == 0).count()
    assert nb + nd == n and nb > 0 and nd > 0

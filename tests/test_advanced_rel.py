from __future__ import annotations


def test_approx_count_distinct_bounded_error(spark, sf_oracle):
    """The registered query folds the HLL++ sketch into a 5%-bound boolean
    (the oracle expects TRUE); assert the bound holds for every group and
    that exact counts are positive."""
    from mapreduce_4_spark.plans.advanced_rel import approx_distinct_users

    for r in approx_distinct_users(spark, sf_oracle).collect():
        assert r["exact_users"] > 0
        assert r["approx_ok"], (r["event_type"], r["exact_users"])


def test_percentile_sketch_properties(spark, sf_oracle):
    """The registered query folds the rank-window check (flags must all
    be TRUE); the raw sketch values are additionally checked here for
    ordering, min/max bounds, and closeness to exact numpy quantiles."""
    import numpy as np
    from pyspark.sql import functions as F

    from mapreduce_4_spark.plans.statistics import percentile_sketch_prices
    from mapreduce_4_spark.sources import load_table

    for r in percentile_sketch_prices(spark, sf_oracle).collect():
        for k in ("ok_p25", "ok_p50", "ok_p75", "ok_p99"):
            assert r[k] is True, (r["o_orderstatus"], k)

    orders = load_table(spark, sf_oracle, "orders")
    got = {
        r["o_orderstatus"]: r
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.25, 0.5, 0.75, 0.99], 10_000
            ).alias("p")
        )
        .select(
            "o_orderstatus",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
            F.col("p")[3].alias("p99"),
        )
        .collect()
    }
    rows = orders.select("o_orderstatus", "o_totalprice").collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r["o_totalprice"])
    for status, vals in by_status.items():
        r = got[status]
        assert min(vals) <= r["p25"] <= r["p50"] <= r["p75"] <= r["p99"] <= max(vals)
        exact = np.quantile(vals, [0.25, 0.5, 0.75])
        for k, e in zip(("p25", "p50", "p75"), exact):
            assert abs(float(r[k]) - e) / e < 0.05, (status, k, r[k], e)


def test_rdd_wordcount_equals_dataframe_flagship(spark, sf_smoke):
    from mapreduce_4_spark.plans.advanced_rel import rdd_wordcount
    from mapreduce_4_spark.plans.wordcount import wordcount_per_doc

    a = sorted(map(tuple, rdd_wordcount(spark, sf_smoke).collect()))
    b = sorted(map(tuple, wordcount_per_doc(spark, sf_smoke).collect()))
    assert a == b


def test_registry_rejects_duplicate_names():
    import pytest as _pytest

    from mapreduce_4_spark.registry import REGISTRY, register

    name = next(iter(REGISTRY))
    with _pytest.raises(ValueError, match="duplicate"):
        register(name)(lambda spark, sf: None)


def test_row_id_operator_unique(spark, sf_smoke):
    from pyspark.sql import functions as F

    from mapreduce_4_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    with_ids = docs.withColumn("row_id", F.monotonically_increasing_id())
    n = with_ids.count()
    assert with_ids.select("row_id").distinct().count() == n

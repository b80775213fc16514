from __future__ import annotations


def test_approx_count_distinct_bounded_error(spark, sf_oracle):
    """HLL++ default rsd is 5%; assert the sketch lands within 10% of the
    exact count for every group (deterministic given fixed data)."""
    from mapreduce_4_spark.plans.advanced_rel import approx_distinct_users

    for r in approx_distinct_users(spark, sf_oracle).collect():
        exact, approx = r["exact_users"], r["approx_users"]
        assert exact > 0
        assert abs(approx - exact) / exact <= 0.10, (r["event_type"], approx, exact)


def test_rdd_wordcount_equals_dataframe_flagship(spark, sf_smoke):
    from mapreduce_4_spark.plans.advanced_rel import rdd_wordcount
    from mapreduce_4_spark.plans.wordcount import wordcount_per_doc

    a = sorted(map(tuple, rdd_wordcount(spark, sf_smoke).collect()))
    b = sorted(map(tuple, wordcount_per_doc(spark, sf_smoke).collect()))
    assert a == b

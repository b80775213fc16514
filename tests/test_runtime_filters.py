"""Runtime-filter evidence: Catalyst's two runtime row-pruning rewrites,
pinned so a conf or version change can't silently drop them.

- Runtime bloom-filter join pruning: a selective dim filter is turned
  into a bloom filter built on the dim's join keys and pushed into the
  fact scan as might_contain() — the fact rows that cannot join die at
  the scan instead of crossing the shuffle. At 100 TB this is the
  difference between shuffling the whole fact and shuffling the matching
  slice; the default thresholds (creation side <= 10 MB, application
  side >= 10 GB scan) are tuned for exactly that scale, so the tests
  lower them to fire at sf0.01.
- Dynamic partition pruning: when the fact is PARTITIONED on the join
  key, the dim filter prunes entire partitions at planning/runtime via
  a dynamicpruning subquery on the partition column.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bloom_confs(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_bloom_filter_prunes_fact_scan(spark, sf_oracle, bloom_confs):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_oracle}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(od, li.l_orderkey == od.o_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the dim's keys become a bloom filter probed on the FACT side...
    assert "might_contain" in plan, plan
    assert "xxhash64(l_orderkey" in plan, plan
    # ...built by a two-phase (partial + merge) aggregate on the dim side
    assert "partial_bloom_filter_agg" in plan, plan
    # and the join result is unchanged by the rewrite
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        expected = li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert j.count() == expected


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_oracle, tmp_path):
    fact_dir = str(tmp_path / "events_by_type")
    (
        spark.read.parquet(f"{sf_oracle}/events.parquet")
        .write.partitionBy("event_type")
        .parquet(fact_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # dim with a selective non-partition-column filter, too big to prove
    # statically: DPP injects a runtime subquery on the partition column
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("purchase", 1), ("signup", 0),
         ("refund", 1)],
        "event_type string, important int",
    )
    j = fact.join(dim, "event_type").filter(F.col("important") == 1)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # semantics unchanged: only the three matching partitions' rows
    expected = (
        spark.read.parquet(f"{sf_oracle}/events.parquet")
        .filter(F.col("event_type").isin("click", "purchase", "refund"))
        .count()
    )
    assert j.count() == expected

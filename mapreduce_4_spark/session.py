"""SparkSession factory with scale-aware defaults.

The reference engine hand-rolled its execution plumbing (std::async task
pools, stage barriers, text-file shuffles — SURVEY.md §2.1 O6/O8/O12/O13).
Here all of that is Spark's job: we only pin the configs that matter for
determinism (UTC session time zone), for Python interop (Arrow), and for
scale (AQE, partition sizing).

On a real cluster the same builder is used via ``spark-submit``; local[N]
is only the test harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for the 100 TB north star, not just local tests:
#: AQE re-plans shuffles at runtime (coalesces small partitions, splits
#: skewed ones, converts sort-merge joins to broadcast when a side turns
#: out small); Arrow keeps any unavoidable Python stage vectorized;
#: UTC keeps timestamp semantics identical to the DuckDB oracle.
_BASE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB splits: the sweet spot for the vectorized parquet reader; at
    # 100 TB this yields ~800k input tasks, well within scheduler limits.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md), which the Spark
    # reader rejects; read it as raw long and convert in sources.tables.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Keep planner free to broadcast dimension tables (region/nation/...).
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # InferFiltersFromGenerate adds size(arr)>0 / isnotnull(arr) guards
    # below every Generate; PushDownPredicates then substitutes the
    # array-producing expression (tokenize + gram transforms here) into
    # those filters, re-evaluating the whole pipeline 2-3x per row —
    # measured 10-40% on the explode-heavy dedup family and up to 7x on
    # winnowing before its query-level fix. Our exploded arrays are
    # never null and rarely empty, so the inferred guards only burn CPU.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.sql.shuffle.partitions": "32",
    # Python DataSource filter pushdown (off by default in 4.1): lets
    # the mr4ver format's pushFilters prune chain dirs at planning
    # time (stats windows + bloom probes); the source still returns
    # every filter for exact post-scan application, so enabling this
    # only ever REMOVES provably-empty input partitions.
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # local[N] runs the whole engine inside the driver JVM, whose default
    # 1g heap starves 32 concurrent tasks' execution memory (observed:
    # UNABLE_TO_ACQUIRE_MEMORY during the full-registry sweep). Size it
    # like one real executor instead; harmless under spark-submit, where
    # --driver-memory / executor memory take precedence over this default
    # (only applied at JVM launch, overridable via SPARK_GRAFT_DRIVER_MEM).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "mapreduce_4_spark", master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same code
    runs unchanged under a cluster manager (where ``master`` comes from
    spark-submit and this arg stays None with an existing session).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not SparkSession.getActiveSession():
        master = f"local[{default_parallelism()}]"
    if master:
        builder = builder.master(master)
    confs = dict(_BASE_CONFS)
    # shuffle partitions sized to the harness; on a real cluster AQE
    # coalesces from a larger initial number instead.
    confs["spark.sql.shuffle.partitions"] = str(default_parallelism())
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

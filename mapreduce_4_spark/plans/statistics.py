"""Statistical aggregates with exact arithmetic.

Built-in variance/stddev use streaming (Welford-style) accumulation in
both engines — order-dependent in the last bits, so NOT oracle-safe.
Instead the moments are assembled from exact decimal sums:
var = (n*sum_sq - sum^2) / (n*(n-1)), evaluated in double from
bit-identical inputs on both sides. Same scale behavior as the built-in
(two exact partial aggregates + merge), deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.money import dec
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table


@register(
    "variance_order_prices",
    oracle="""
        WITH s AS (
            SELECT o_orderstatus,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                            * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, n,
               (n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1)) AS var_samp,
               sqrt((n * s2 - s1 * s1) / (CAST(n AS DOUBLE) * (n - 1))) AS stddev_samp,
               s1 / n AS mean_price
        FROM s
    """,
    tags=("aggregate", "statistics"),
    description="sample variance/stddev/mean from exact decimal moments "
                "(deterministic, unlike Welford-accumulated built-ins)",
)
def variance_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = dec("o_totalprice")
    agg = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).cast("double").alias("s1"),
        F.sum(p * p).cast("double").alias("s2"),
    )
    n = F.col("n")
    var = (n * F.col("s2") - F.col("s1") * F.col("s1")) / (
        n.cast("double") * (n - F.lit(1))
    )
    return agg.select(
        "o_orderstatus",
        "n",
        var.alias("var_samp"),
        F.sqrt(var).alias("stddev_samp"),
        (F.col("s1") / n).alias("mean_price"),
    )


@register(
    "correlation_qty_price",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        FROM s
    """,
    tags=("aggregate", "statistics"),
    description="Pearson correlation from exact decimal moments "
                "(deterministic, unlike the streaming corr() built-in)",
)
def correlation_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@register(
    "histogram_event_values",
    oracle="""
        SELECT event_type,
               CAST(floor(value / 50.0) AS BIGINT) AS bucket,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type, bucket
    """,
    tags=("aggregate", "statistics"),
    description="fixed-width value histogram per event type (the "
                "distribution-profile one-pass at any scale)",
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 50.0).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "percentile_sketch_prices",
    oracle=None,  # sketch internals differ across engines; bounds and
    # monotonicity are property-tested in tests/test_advanced_rel.py
    tags=("aggregate", "statistics", "approx"),
    description="approx percentiles (p25/p50/p75/p99) of order prices per "
                "status — the quantile-sketch path for 100 TB distributions",
)
def percentile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", [0.25, 0.5, 0.75, 0.99], 10_000
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(pct.alias("p"))
        .select(
            "o_orderstatus",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
            F.col("p")[3].alias("p99"),
        )
    )


@register(
    "array_higher_order_fns",
    oracle="""
        SELECT vec_id,
               len(list_filter(embedding, x -> x > 0)) AS n_positive,
               len(list_filter(embedding, x -> abs(x) > 0.2)) AS n_large,
               (len(list_filter(embedding, x -> x > -1)) = len(embedding)) AS all_above_neg1,
               (len(list_filter(embedding, x -> x > 0.5)) > 0) AS any_above_half,
               array_to_string(list_sort([round(CAST(x AS DECIMAL(9,4)), 2) for x in embedding[1:3]]), '|') AS head_rounded
        FROM embeddings
    """,
    tags=("array", "higher-order"),
    description="higher-order array functions: filter/forall/exists/"
                "transform/slice/sort over embeddings",
)
def array_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.size(F.filter(e, lambda x: F.abs(x) > 0.2)).cast("long").alias("n_large"),
        F.forall(e, lambda x: x > -1).alias("all_above_neg1"),
        F.exists(e, lambda x: x > 0.5).alias("any_above_half"),
        F.concat_ws(
            "|",
            F.transform(
                F.sort_array(
                    F.transform(
                        F.slice(e, 1, 3),
                        lambda x: F.round(x.cast("decimal(9,4)"), 2)
                        .cast("decimal(9,2)"),
                    )
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("head_rounded"),
    )

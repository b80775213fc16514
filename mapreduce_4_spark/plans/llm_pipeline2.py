"""Round-2 LLM-pipeline queries: target-mixture rebalancing, benchmark
decontamination, and exact rank-based percentiles — the selection/audit
stages between raw corpus and training shards, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_MIX_WEIGHTS = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15}
_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_WEIGHTS.items())


@register(
    "rebalance_language_mixture",
    oracle=f"""
        WITH w(lang, w) AS (VALUES {_MIX_VALUES}),
        c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        k AS (SELECT MIN(c.n / w.w) AS k FROM c JOIN w USING (lang)),
        r AS (SELECT c.lang, w.w * k.k / c.n AS rate
              FROM c JOIN w USING (lang), k)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN r ON d.lang = r.lang
        WHERE substring(md5(CAST(d.doc_id AS VARCHAR) || ':42'), 1, 8) <
              CASE WHEN r.rate >= 1 THEN 'zzzzzzzz'
                   ELSE printf('%08x',
                               CAST(floor(r.rate * 4294967296) AS BIGINT))
              END
    """,
    tags=("pipeline", "sampling", "mixture"),
    description="data-mixing: downsample languages to 30/20/20/15/15 "
                "target weights, keeping the maximum feasible corpus "
                "(content-keyed selection, rates from exact counts)",
)
def rebalance_language_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.sampling import rebalance_mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return rebalance_mixture(docs, "lang", _MIX_WEIGHTS, key_col="doc_id")


_W = sql_words("text")
_G3 = (
    f"list_distinct(CASE WHEN len({_W}) >= 3 THEN "
    f"[{_W}[i] || ' ' || {_W}[i+1] || ' ' || {_W}[i+2] "
    f"for i in range(1, len({_W}) - 1)] ELSE [] END)"
)


@register(
    "decontaminate_vs_holdout",
    oracle=f"""
        WITH g AS (SELECT doc_id, {_G3} AS grams FROM documents),
        eval_grams AS (
            SELECT DISTINCT unnest(grams) AS gram FROM g
            WHERE doc_id % 97 = 0
        ),
        train AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
        shared AS (
            SELECT t.doc_id, COUNT(*) AS n_shared_grams
            FROM (SELECT doc_id, unnest(grams) AS gram FROM train) t
            JOIN eval_grams e ON t.gram = e.gram
            GROUP BY t.doc_id
        )
        SELECT train.doc_id,
               COALESCE(shared.n_shared_grams, 0) AS n_shared_grams,
               COALESCE(shared.n_shared_grams, 0) >= 3 AS contaminated
        FROM train LEFT JOIN shared ON train.doc_id = shared.doc_id
    """,
    tags=("pipeline", "text", "dedup"),
    description="benchmark decontamination: flag training docs sharing "
                ">= 3 distinct word 3-grams with the held-out eval slice "
                "(eval gram set broadcast against the training explosion)",
)
def decontaminate_vs_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.text_analysis import decontaminate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(train, evalset, n=3, min_shared=3)


@register(
    "exact_percentiles_orders",
    oracle="""
        WITH ranked AS (
            SELECT o_orderstatus, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        )
        SELECT o_orderstatus,
               MAX(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
                        THEN o_totalprice END) AS p50,
               MAX(CASE WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT) + 1
                        THEN o_totalprice END) AS p90,
               MAX(CASE WHEN rn = CAST(floor((n-1) * 0.99) AS BIGINT) + 1
                        THEN o_totalprice END) AS p99
        FROM ranked
        GROUP BY o_orderstatus
    """,
    tags=("statistics", "window"),
    description="EXACT percentiles via rank selection (lower-index "
                "discretization): picks existing values, so results are "
                "bit-identical across engines — unlike interpolating "
                "quantile functions, whose interpolation rules differ. "
                "The sketch-based variant is percentile_sketch_prices.",
)
def exact_percentiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice", "o_orderkey"
    )
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, name: str):
        idx = F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1
        return F.max(
            F.when(F.col("rn") == idx, F.col("o_totalprice"))
        ).alias(name)

    return ranked.groupBy("o_orderstatus").agg(
        pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99")
    )

"""TF-IDF-style term scoring and event funnels — ranking/sequence
analytics over the text and event tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_W = sql_words("text")


@register(
    "tf_rarity_top_terms",
    oracle=f"""
        WITH tokens AS (
            SELECT doc_id, unnest({_W}) AS word FROM documents
        ),
        tf AS (
            SELECT doc_id, word, COUNT(*) AS tf FROM tokens GROUP BY doc_id, word
        ),
        df AS (
            SELECT word, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY word
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.word,
                   tf.tf * (CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df) AS score
            FROM tf JOIN df ON tf.word = df.word
        )
        SELECT doc_id, word, score FROM (
            SELECT doc_id, word, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, word) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    tags=("text", "aggregate", "topk"),
    description="TF-IDF-shaped term scoring with an exact rarity weight "
                "(tf * N/df — no log, so the oracle is bit-exact) and "
                "top-3 terms per document",
)
def tf_rarity_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.plans.wordcount import exploded_words

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = exploded_words(docs)
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size arrives as a broadcast one-row aggregate inside the
    # same job — no separate driver-side count() pass over the corpus
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (F.col("tf") * (F.col("_n_docs") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "score")
    )


@register(
    "user_event_funnel",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   list(event_type ORDER BY CAST(ts AS TIMESTAMP), event_id) AS types
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               array_to_string(types[1:3], '>') AS funnel,
               len(types) AS n_events
        FROM seq
    """,
    tags=("events", "aggregate", "sequence"),
    description="per-user first-3-events funnel (ordered collect -> "
                "sequence string), the event-path analysis shape",
)
def user_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                                    "event_type")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        ev.groupBy("user_id")
        .agg(ordered.alias("seq"))
        .select(
            "user_id",
            F.concat_ws(
                ">", F.transform(F.slice("seq", 1, 3), lambda s: s["event_type"])
            ).alias("funnel"),
            F.size("seq").cast("long").alias("n_events"),
        )
    )


@register(
    "similarity_ivf_topk",
    oracle=None,  # see rows_only_reason; recall property-tested
    tags=("similarity", "ivf", "rows-only"),
    description="IVF ANN: k-means-lite coarse quantizer, nprobe=2 probed "
                "exact search — the clustered scale path beside LSH",
    rows_only_reason="UNSEEDED Lloyd k-means trains the coarse quantizer "
                     "(sampled init, iterative refinement) — no SQL can "
                     "reproduce the trained centroids, so a driver row "
                     "logs `err: no_oracle` BY DESIGN. The deterministic "
                     "twin similarity_ivf_topk_seeded (zero Lloyd rounds) "
                     "is fully DuckDB-oracled, and recall-vs-brute-force "
                     "is property-tested in tests/test_similarity.py",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.ann_ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=10, n_clusters=8, nprobe=2)

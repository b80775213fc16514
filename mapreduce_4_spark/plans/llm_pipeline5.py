"""Round-7 LLM-pipeline queries: the semantic-dedup tail (clusters and
keep-list over the exact embedding-cosine pair set, completing the
pairs -> clusters -> survivors story the Jaccard tier already has),
temperature-based source mixture resampling, and the deterministic
train/val/test split assignment. All fully oracle-checked.

Reference anchor: each is the reference's Reduce contract
(asio_deep/main.cpp:434-516) generalized — key-grouped consolidation
over derived keys (component labels, stratum rates, hash buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.text import sql_words, words
from mapreduce_4_spark.registry import REGISTRY, register
from mapreduce_4_spark.sources import load_table

#: the all-pairs cosine oracle the exact tier proves itself against
_EMB_PAIRS_SQL = REGISTRY["embedding_near_dup_pairs"].oracle

_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({_EMB_PAIRS_SQL}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT vec_id AS node, vec_id AS reached FROM embeddings
        UNION
        SELECT r.node, e.dst AS reached
        FROM reach r JOIN edges e ON r.reached = e.src
    )
    SELECT node AS vec_id, MIN(reached) AS cluster_id
    FROM reach GROUP BY node
"""


@register(
    "embedding_dedup_clusters",
    oracle=_CLUSTERS_SQL,
    tags=("dedup", "similarity", "iterative"),
    description="semantic near-dup cluster assignment: connected "
                "components over the exact cosine>=0.4 pair set "
                "(pruned block GEMM candidates, pointer-jumping label "
                "propagation), oracled with a recursive transitive "
                "closure — the embedding twin of dedup_clusters",
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same distributed pointer-jumping operator as the Jaccard tier's
    dedup_clusters (operators/clustering.py, O(log D) rounds) — the
    pair set swaps from gram-Jaccard to exact embedding cosine."""
    from mapreduce_4_spark.operators.clustering import dedup_cluster_assignments
    from mapreduce_4_spark.plans.dedup import embedding_near_dup_pairs

    nodes = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("vec_id").alias("doc_id"))
    )
    pairs = embedding_near_dup_pairs(spark, sf_dir).select("id_a", "id_b")
    return dedup_cluster_assignments(nodes, pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@register(
    "embedding_dedup_survivors",
    oracle=f"""
        SELECT vec_id FROM ({_CLUSTERS_SQL}) WHERE vec_id = cluster_id
    """,
    tags=("dedup", "similarity"),
    description="semantic dedup keep-list: one representative (min "
                "vec_id) per cosine-similarity component — the "
                "embedding twin of neardup_survivors",
)
def embedding_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        embedding_dedup_clusters(spark, sf_dir)
        .filter(F.col("vec_id") == F.col("cluster_id"))
        .select("vec_id")
    )


_W = sql_words("text")


@register(
    "temperature_sample_sources",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source, len({_W}) AS w FROM documents
        ),
        tot AS (SELECT source, SUM(w) AS tot FROM tok GROUP BY source),
        mn AS (SELECT MIN(tot) AS mn FROM tot),
        r AS (SELECT source, sqrt(mn / tot) AS rate FROM tot, mn)
        SELECT t.doc_id, t.source
        FROM tok t JOIN r USING (source)
        WHERE substring(md5(CAST(t.doc_id AS VARCHAR) || ':42'), 1, 8) <
              CASE WHEN r.rate >= 1 THEN 'zzzzzzzz'
                   ELSE printf('%08x',
                               CAST(floor(r.rate * 4294967296) AS BIGINT))
              END
    """,
    tags=("pipeline", "sampling", "mixture"),
    description="temperature (alpha=1/2) mixture resampling over "
                "sources, weighted by TOKEN totals: keep rate "
                "sqrt(min_tokens/source_tokens), so dominant feeds are "
                "tempered and the smallest keeps everything — "
                "content-keyed selection, bit-exact across engines",
)
def temperature_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.operators.sampling import temperature_resample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(words("text")).alias("w")
    )
    return temperature_resample(
        docs, "source", weight_col="w", key_col="doc_id"
    ).select("doc_id", "source")


@register(
    "train_split_assignment_docs",
    oracle="""
        SELECT doc_id, source,
               CASE WHEN h < 'e6666666' THEN 'train'
                    WHEN h < 'f3333333' THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, source,
                   substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8) AS h
            FROM documents
        )
    """,
    tags=("pipeline", "sampling"),
    description="deterministic 90/5/5 train/val/test assignment via the "
                "same content-keyed md5 buckets as the samplers: "
                "partition-independent, engine-portable, a document "
                "never migrates between splits as the corpus grows",
)
def train_split_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket split assignment — the lineage-stable alternative to
    randomSplit (whose assignment changes with partitioning). Thresholds
    are the hex images of 0.90 and 0.95 of the 32-bit hash space; the
    per-row predicate costs no shuffle at any scale."""
    from mapreduce_4_spark.operators.sampling import _hash_bucket

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    h = _hash_bucket(F.col("doc_id"), "42")
    return docs.select(
        "doc_id",
        "source",
        F.when(h < "e6666666", F.lit("train"))
        .when(h < "f3333333", F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )

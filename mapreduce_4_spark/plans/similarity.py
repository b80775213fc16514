"""Similarity-search queries over the embeddings table.

Brute-force cosine top-k is the exact baseline with a full DuckDB oracle
(bit-identical doubles, see functions/vectors.py). The LSH-bucketed
variant is the approximate scale path — rows-only for the driver, with a
recall-vs-brute-force property test in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_4_spark.operators.similarity import brute_force_topk, lsh_topk
from mapreduce_4_spark.registry import register
from mapreduce_4_spark.sources import load_table

_N_QUERIES = 5  # vec_id < 5 serve as the query set
_K = 10


@register(
    "similarity_bruteforce_topk",
    oracle=f"""
        SELECT query_id, vec_id, cosine_sim, rank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])) AS cosine_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                       CAST(c.embedding AS DOUBLE[])) DESC,
                                c.vec_id
                   ) AS rank
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < {_N_QUERIES} AND q.vec_id <> c.vec_id
        )
        WHERE rank <= {_K}
    """,
    tags=("similarity",),
    description="exact cosine top-10 for 5 query vectors (broadcast query side)",
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=_K)


@register(
    "similarity_lsh_topk",
    oracle=None,  # approximate by construction; recall measured in tests
    tags=("similarity", "lsh"),
    description="LSH-bucketed approximate top-10 (8 hyperplanes): the 100 TB "
                "ANN path, exact ranking within bucket collisions only",
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=_K, n_planes=8, dim=64)


@register(
    "embedding_norms",
    oracle="""
        SELECT vec_id,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS l2_norm,
               list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS sq_norm
        FROM embeddings
    """,
    tags=("similarity", "array"),
    description="per-vector L2 norms via zip_with/aggregate (no UDF)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_4_spark.functions.vectors import as_double, dot, norm

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v = as_double(F.col("embedding"))
    return emb.select(
        "vec_id",
        norm(v).alias("l2_norm"),
        dot(v, v).alias("sq_norm"),
    )

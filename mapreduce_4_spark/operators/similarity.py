"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (task north star — similarity search over array<float>):

- brute-force cosine top-k: the exact baseline. Query set x corpus via
  broadcast of the (small) query side; per-query top-k with a window,
  which TakeOrdered-style keeps k rows per query per partition before the
  final shuffle. Exact-oracle-checkable (bit-identical to DuckDB, see
  functions/vectors.py).
- random-hyperplane LSH buckets: the 100 TB path. p signed projections
  give a p-bit bucket id; candidates are bucket collisions only, so the
  join is linear-ish in collisions instead of |queries| x |corpus|.
  Hyperplanes are generated once from a fixed seed on the driver and
  broadcast — tiny (p x dim doubles).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.vectors import as_double, dot, norm

def _pair_sim() -> F.Column:
    """Per-pair cosine with per-SIDE precomputed double vectors and
    norms: dot/(|a|*|b|) evaluates bit-identically whether the norms are
    computed inside the pair expression or once per row, but higher-order
    functions are interpreted (not codegen'd), so hoisting the cast + two
    norm aggregates out of the |Q| x |corpus| pair space cuts the
    per-pair work from 5 array traversals to 1 — the difference between
    O(pairs x 5d) and O(pairs x d + rows x 4d) interpreted ops at any
    scale."""
    return dot(F.col("_qvec"), F.col("_cvec")) / (
        F.col("_qnorm") * F.col("_cnorm")
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id",
                     exclude_self: bool = True) -> DataFrame:
    """Exact cosine top-k per query. Queries are broadcast.

    Returns (query_id, vec_id, cosine_sim, rank), rank 1..k, ties broken
    by corpus id for determinism. ``exclude_self`` drops pairs with
    query_id == vec_id — set it False when query and corpus ids come from
    DIFFERENT domains, where an id collision is a legitimate neighbor.
    """
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("_qvec")
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_cvec")
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    cond = (
        F.col(query_id_col) != F.col(id_col) if exclude_self else F.lit(True)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        c.join(F.broadcast(q), cond)
        .select(query_id_col, id_col, _pair_sim().alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_ids(df: DataFrame, planes: np.ndarray,
                   vec_col: str = "embedding") -> DataFrame:
    """Add a ``bucket`` column: p-bit signature of hyperplane signs.

    The projection is a pure column expression per plane (dot with a
    literal array) — broadcast-free, codegen'd, no Python.
    """
    from mapreduce_4_spark.functions.vectors import dot

    bucket = F.lit(0).cast("long")
    v = as_double(F.col(vec_col))
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(v, lit_plane) > 0, F.lit(1 << j)).otherwise(0)
    return df.withColumn("bucket", bucket)


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id",
             multiprobe: bool = False,
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: exact ranking within LSH bucket collisions.

    Recall < 1.0 by construction; the property test measures it against
    brute force. More planes -> smaller buckets -> faster and less
    recall. ``multiprobe=True`` additionally probes every bucket at
    hamming distance 1 from the query's bucket (each sign bit flipped
    once) — the standard recall-vs-cost knob: probe cost grows by
    n_planes x, recall approaches brute force, corpus side is untouched.

    ``dim`` (the embedding dimensionality) is REQUIRED so plan
    construction stays action-free — no driver-side probe of the corpus.
    ``exclude_self`` as in :func:`brute_force_topk`.
    """
    if not isinstance(dim, int) or dim < 1:
        raise ValueError(f"dim must be a positive int, got {dim!r}")
    planes = hyperplanes(dim, n_planes)
    c = lsh_bucket_ids(
        corpus.select(id_col, as_double(F.col(vec_col)).alias("_cvec")),
        planes, "_cvec",
    ).withColumn("_cnorm", norm(F.col("_cvec")))
    q = lsh_bucket_ids(
        queries.select(query_id_col, as_double(F.col(vec_col)).alias("_qvec")),
        planes, "_qvec",
    ).withColumn("_qnorm", norm(F.col("_qvec")))
    if multiprobe:
        probe_buckets = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
        )
        q = q.withColumn("bucket", F.explode(probe_buckets))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    out = c.join(F.broadcast(q), "bucket")
    if exclude_self:
        out = out.filter(F.col(query_id_col) != F.col(id_col))
    return (
        out.select(query_id_col, id_col, _pair_sim().alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )

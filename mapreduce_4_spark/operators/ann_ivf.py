"""IVF-style approximate nearest neighbor: coarse quantization + probed
exact search — the other classic ANN architecture beside LSH (task spec:
"an IVF or LSH-bucketed variant as the scale path").

Training is a small Lloyd's k-means run expressed entirely as DataFrame
ops: deterministic seeding (lowest ids), assignment via broadcast
centroid cross-score, re-centering via exact per-dimension means
(posexplode -> groupBy(cluster, dim) -> avg -> collect back to arrays).
At 100 TB the centroid table stays tiny (k x dim) and is always
broadcast; only assignments shuffle, once per iteration.

Search probes the ``nprobe`` nearest centroids per query and ranks
exactly within those inverted lists only — corpus contact is
|lists probed| / k of brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreduce_4_spark.functions.vectors import as_double, dot, norm

# Every cosine below hoists the double-cast and the two norm aggregates
# out of the pair space (computed once per row / per centroid, not once
# per pair) — bit-identical values, ~5x fewer interpreted higher-order
# traversals; see operators/similarity.py::_pair_sim.


def _with_centroid_norms(centroids: DataFrame) -> DataFrame:
    return centroids.select(
        F.col("cluster_id").alias("_cid"),
        F.col("centroid").alias("_centroid"),
        norm(as_double(F.col("centroid"))).alias("_cnorm"),
    )


def _assign(df: DataFrame, centroids: DataFrame, vec: str, id_col: str,
            out: str = "cluster") -> DataFrame:
    """Nearest centroid by cosine for every row (broadcast centroids)."""
    sim = dot(F.col("_v"), as_double(F.col("_centroid"))) / (
        F.col("_vn") * F.col("_cnorm")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("_cid"))
    scored = (
        df.withColumn("_v", as_double(F.col(vec)))
        .withColumn("_vn", norm(F.col("_v")))
        .join(F.broadcast(_with_centroid_norms(centroids)), how="cross")
        .withColumn("_sim", sim)
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_sim", "_rn", "_centroid", "_cnorm", "_v", "_vn")
        .withColumnRenamed("_cid", out)
    )
    return best


def train_centroids(corpus: DataFrame, k: int = 8, iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """k-means-lite: seed from the k lowest ids, run ``iters`` Lloyd
    rounds. Returns (cluster_id, centroid: array<double>)."""
    centroids = (
        corpus.orderBy(id_col).limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cluster_id"),
            as_double(F.col(vec_col)).alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = _assign(
            corpus.select(id_col, vec_col), centroids, vec_col, id_col
        )
        # exact per-dimension mean via posexplode; decimal-free because
        # averages here only steer clustering, not query results
        dims = assigned.select(
            "cluster", F.posexplode(as_double(F.col(vec_col))).alias("dim", "val")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(
                F.col("cluster").alias("cluster_id"),
                F.transform("dm", lambda s: s["m"]).alias("centroid"),
            )
        )
        centroids = means
    return centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_clusters: int = 8, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             centroids: DataFrame | None = None,
             exclude_self: bool = True) -> DataFrame:
    """Probed IVF search: exact cosine ranking within the ``nprobe``
    closest inverted lists per query.

    Pass pre-trained ``centroids`` (from :func:`train_centroids`, ideally
    ``.persist()``-ed or checkpointed) to search repeatedly without
    re-running k-means — the index-build / index-search split every real
    ANN deployment uses. ``exclude_self`` as in similarity.brute_force_topk.
    """
    if centroids is None:
        centroids = train_centroids(corpus, k=n_clusters)
    lists = _assign(
        corpus.select(id_col, vec_col), centroids, vec_col, id_col
    ).withColumn("_cvec", as_double(F.col(vec_col))).withColumn(
        "_cn", norm(F.col("_cvec"))
    )

    qsim = dot(F.col("_qvec"), as_double(F.col("_centroid"))) / (
        F.col("_qn") * F.col("_cnorm")
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("_sim"), F.asc("_cid"))
    probes = (
        queries.select(
            query_id_col, as_double(F.col(vec_col)).alias("_qvec")
        )
        .withColumn("_qn", norm(F.col("_qvec")))
        .join(F.broadcast(_with_centroid_norms(centroids)), how="cross")
        .withColumn("_sim", qsim)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "_qvec", "_qn", F.col("_cid").alias("cluster"))
    )
    sim = dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    out = lists.join(F.broadcast(probes), "cluster")
    if exclude_self:
        out = out.filter(F.col(query_id_col) != F.col(id_col))
    return (
        out.select(query_id_col, id_col, sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )

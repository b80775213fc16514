"""IVF-style approximate nearest neighbor: coarse quantization + probed
exact search — the other classic ANN architecture beside LSH (task spec:
"an IVF or LSH-bucketed variant as the scale path").

Training is a small Lloyd's k-means run expressed entirely as DataFrame
ops: deterministic seeding (lowest ids), assignment via a MAP-ONLY
broadcast-array argmin (below), re-centering via exact per-dimension
means (posexplode -> groupBy(cluster, dim) -> avg -> collect back to
arrays). At 100 TB the centroid table stays tiny (k x dim) and is
always broadcast; only the re-centering aggregate shuffles, once per
iteration, and its key space is (k, dim).

Assignment/routing plan shape: the k centroids collapse into ONE
broadcast row holding a sorted array of (cid, centroid, norm) structs;
the nearest-centroid argmin is then a per-row JVM expression
``array_sort(transform(cents, ...))[0]`` — zero row blowup, zero
corpus-side Exchange (the shape ``operators/clustering.py``'s
fixed-point k-means established; plan-asserted in
tests/test_plan_properties.py). The earlier corpus x k broadcast-join +
window row_number pattern shuffled the corpus on vec_id ~k times —
avoidable data movement in precisely the stage that exists to avoid
data movement.

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


def centroid_array(centroids: DataFrame) -> DataFrame:
    """Collapse the (cluster_id, centroid) relation into ONE row holding
    a cid-sorted array of (cid, centroid, norm) structs — the broadcast
    payload every map-only argmin below consumes. k x dim doubles total,
    tiny at any scale."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("cluster_id").alias("_cid"),
                    as_double(F.col("centroid")).alias("_c"),
                    norm(as_double(F.col("centroid"))).alias("_cn"),
                )
            )
        ).alias("_cents")
    )


def _sim_structs(vec: F.Column, vnorm: F.Column) -> F.Column:
    """(-cosine, cid) struct per centroid for one row — the shared
    payload of the argmin (array_min) and ranked (array_sort) views.
    sim = dot/(|v|*|c|), the exact arithmetic of the window variant and
    of DuckDB's list_cosine_similarity (functions/vectors.py)."""
    return F.transform(
        F.col("_cents"),
        lambda s: F.struct(
            (-(dot(vec, s["_c"]) / (vnorm * s["_cn"]))).alias("_negsim"),
            s["_cid"].alias("_cid"),
        ),
    )


def _ranked_by_sim(vec: F.Column, vnorm: F.Column) -> F.Column:
    """Sorted (ascending by -cosine, ties to lowest cid) struct array of
    all centroids for one row: element 0 is the nearest centroid, the
    first ``nprobe`` are the probe set."""
    return F.array_sort(_sim_structs(vec, vnorm))


def _assign(df: DataFrame, centroids: DataFrame, vec: str, id_col: str,
            out: str = "cluster") -> DataFrame:
    """Nearest centroid by cosine for every row — map-only: one-row
    broadcast centroid array, per-row argmin expression, no corpus-side
    Exchange and no row blowup (plan-asserted)."""
    return (
        df.withColumn("_v", as_double(F.col(vec)))
        .withColumn("_vn", norm(F.col("_v")))
        .crossJoin(F.broadcast(centroid_array(centroids)))
        # array_min of the same struct array == ranked[0] (round-14)
        .withColumn(out, F.array_min(
            _sim_structs(F.col("_v"), F.col("_vn")))["_cid"])
        .drop("_v", "_vn", "_cents")
    )


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

    Plan shape: routing (corpus side) and probe selection (query side)
    are both map-only over the one-row broadcast centroid array — probe
    selection takes ``slice(sorted, 1, nprobe)`` + explode of the same
    ranked array the argmin uses. The only shuffles left are the
    candidate ranking window (query_id-keyed, bounded by the probe-list
    volume) — routing itself moves no data.
    """
    if centroids is None:
        centroids = train_centroids(corpus, k=n_clusters)
    lists = _assign(
        corpus.select(id_col, vec_col), centroids, vec_col, id_col
    ).withColumn("_cvec", as_double(F.col(vec_col))).withColumn(
        "_cn", norm(F.col("_cvec"))
    )

    probes = (
        queries.select(
            query_id_col, as_double(F.col(vec_col)).alias("_qvec")
        )
        .withColumn("_qn", norm(F.col("_qvec")))
        .crossJoin(F.broadcast(centroid_array(centroids)))
        .select(
            query_id_col, "_qvec", "_qn",
            F.explode(
                F.slice(_ranked_by_sim(F.col("_qvec"), F.col("_qn")), 1, nprobe)
            ).alias("_p"),
        )
        .select(query_id_col, "_qvec", "_qn", F.col("_p._cid").alias("cluster"))
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

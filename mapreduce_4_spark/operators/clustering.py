"""Connected components over near-duplicate pairs — turns pairwise dedup
hits into cluster assignments (doc -> canonical representative), the
final step of a real dedup pipeline: transitive closure means A~B, B~C
collapse to one keeper even when A~C was never directly detected.

Min-label propagation with a POINTER-JUMPING shortcut: every vertex
starts labeled with its own id; each round (1) adopts the minimum label
among itself and its neighbors, then (2) compresses one hop through the
label table itself (label := label(label)). The shortcut roughly halves
the remaining chain depth each round, so a component of diameter D
converges in O(log2 D) rounds instead of D — the property that matters
at 100 TB, where a pathological near-dup chain (boilerplate documents
that each match their neighbor) can be thousands of hops deep.

Each round is a constant number of shuffles on the edge/label tables —
all data movement is distributed; the driver loop only sequences rounds
and checks the converged flag. Lineage is cut per round with
localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cc_rounds(pairs: DataFrame, max_iter: int) -> tuple[DataFrame, int, int]:
    """Run propagation; returns (labels, rounds_used, final_changed)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    changed = -1
    for rounds in range(1, max_iter + 1):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("label").alias("nlabel"))
        )
        propagated = (
            labels.join(neighbor_min, labels.id == neighbor_min.id2, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: follow the label one hop through the label
        # table itself — label(v) := label(label(v)). Halves chain depth.
        lookup = propagated.select(
            F.col("id").alias("_lid"), F.col("label").alias("_llabel")
        )
        new_labels = (
            propagated.join(
                lookup, propagated.label == F.col("_lid"), "left"
            )
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("_llabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels, rounds, changed


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id_a, id_b) undirected edges -> (doc_id, cluster_id) where
    cluster_id is the minimum member id of the component.

    Raises if min-label propagation has not converged within
    ``max_iter`` rounds — silently-split components would corrupt the
    dedup keep-list downstream. With pointer jumping, 20 rounds cover
    component diameters up to ~2^20, far beyond any real dedup graph.
    """
    labels, rounds, changed = _cc_rounds(pairs, max_iter)
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); component diameter "
            "exceeds 2^max_iter — raise max_iter"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_cluster_assignments(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """All documents with their cluster representative: singletons map to
    themselves, members of a near-dup component to its min doc_id."""
    cc = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


# --- seeded fixed-point Lloyd k-means -------------------------------------
#
# Training loop over ALREADY-QUANTIZED integer vectors (array<bigint>):
# integer squared-L2 assignment with ties to the lowest cluster id,
# truncating-integer-division centroid updates (Spark `div` truncates
# toward zero, as does DuckDB's `//` on integers; truncation equals
# floor only on the NON-NEGATIVE domain the +1 quantization offset in
# plans/llm_pipeline10.py guarantees — the fuzz model's documented
# contract too), empty clusters keep their
# previous centroid. All-integer arithmetic makes every iteration
# bit-exact regardless of summation order or engine — the property that
# lets plans/llm_pipeline10.py oracle the FULL training loop against
# generated unrolled SQL, where float Lloyd would drift in the last ulp
# through order-dependent double accumulation.
#
# Scale shape per iteration: the assignment is MAP-ONLY — the K
# centroids collapse to one broadcast row (sorted array of K structs)
# and the argmin is a per-row JVM expression, so there is no
# |corpus| x K row blowup and no corpus-side shuffle; the update is one
# (k, dim)-keyed hash aggregate (map-side combine, K x dim result rows)
# plus a K-row rebuild/left-join. T iterations = T corpus scans + T tiny
# shuffles, the canonical distributed Lloyd, composed as ONE declarative
# plan with no actions or driver state at plan-construction time.

_KM_DIST2 = ("aggregate(zip_with({v}, s.c, (x, y) -> (x - y) * (x - y)), "
             "0L, (acc, v) -> acc + v)")


def kmeans_seed_centroids(points: DataFrame, k: int,
                          id_col: str = "id",
                          vec_col: str = "q") -> DataFrame:
    """Deterministic seeds: the k smallest ids become centroids 0..k-1.

    Returns (k: bigint, c: array<bigint>). The single-partition window
    runs over k rows only (post-limit), so the WindowExec warning it
    triggers is bounded by k, never by the corpus.
    """
    from pyspark.sql import Window

    seeds = points.orderBy(id_col).limit(k)
    return seeds.select(
        (F.row_number().over(Window.orderBy(id_col)) - 1)
        .cast("bigint").alias("k"),
        F.col(vec_col).alias("c"),
    )


def kmeans_assign_fixedpoint(points: DataFrame, centroids: DataFrame,
                             id_col: str = "id",
                             vec_col: str = "q") -> DataFrame:
    """Nearest-centroid assignment: (id, cluster, dist2), exact integer
    squared-L2, ties to the lowest cluster id. Map-only over one
    broadcast centroid-array row."""
    cents_arr = centroids.agg(
        F.array_sort(F.collect_list(F.struct("k", "c"))).alias("cents")
    )
    # array_min == array_sort(...)[0] for the (dist2, k) struct order
    # (lexicographic struct comparison), without materializing and
    # sorting a K-struct array per row (round-14, guide §1.2)
    best = (f"array_min(transform(cents, s -> "
            f"struct({_KM_DIST2.format(v=vec_col)} AS dist2, s.k AS k)))")
    return points.crossJoin(F.broadcast(cents_arr)).select(
        F.col(id_col), F.col(vec_col), F.expr(best).alias("best")
    ).select(
        id_col, vec_col,
        F.col("best.k").alias("cluster"),
        F.col("best.dist2").alias("dist2"),
    )


def kmeans_fit_fixedpoint(points: DataFrame, k: int, iters: int,
                          id_col: str = "id",
                          vec_col: str = "q") -> DataFrame:
    """Run ``iters`` Lloyd iterations from the deterministic seeds;
    returns the final centroids (k, c). Empty clusters keep their
    previous centroid (K-row left join + coalesce), so the centroid
    count is invariant across iterations."""
    if k < 1 or iters < 0:
        raise ValueError(f"need k >= 1 and iters >= 0, got {k}, {iters}")
    cent = kmeans_seed_centroids(points, k, id_col=id_col, vec_col=vec_col)
    for _ in range(iters):
        assigned = kmeans_assign_fixedpoint(
            points, cent, id_col=id_col, vec_col=vec_col
        )
        upd_kd = (
            assigned.select(
                F.col("cluster").alias("k"),
                F.posexplode(vec_col).alias("d", "val"),
            )
            .groupBy("k", "d")
            .agg(F.expr("sum(val) div count(1)").alias("cd"))
        )
        upd = upd_kd.groupBy("k").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cd"))),
                lambda s: s["cd"],
            ).alias("c")
        )
        cent = (
            cent.alias("o")
            .join(upd.alias("n"), "k", "left")
            .select("k", F.coalesce(F.col("n.c"), F.col("o.c")).alias("c"))
        )
    return cent


def kmeans_fixedpoint(points: DataFrame, k: int, iters: int,
                      id_col: str = "id",
                      vec_col: str = "q") -> DataFrame:
    """fit + final assignment: (id, cluster, dist2)."""
    cent = kmeans_fit_fixedpoint(
        points, k, iters, id_col=id_col, vec_col=vec_col
    )
    return kmeans_assign_fixedpoint(
        points, cent, id_col=id_col, vec_col=vec_col
    ).drop(vec_col)

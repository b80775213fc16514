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

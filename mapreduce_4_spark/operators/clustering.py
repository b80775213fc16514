"""Connected components over near-duplicate pairs — turns pairwise dedup
hits into cluster assignments (doc -> canonical representative), the
final step of a real dedup pipeline: transitive closure means A~B, B~C
collapse to one keeper even when A~C was never directly detected.

Label propagation with DataFrame joins: every vertex starts labeled with
its own id; each round adopts the minimum label among itself and its
neighbors; converged when no label changes. Each round is one shuffle on
the edge list — the standard distributed-CC shape (alternating-star
variants optimize constants, not the asymptotics). The driver-side loop
only sequences rounds; all data movement is distributed, and lineage is
cut per round with localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(id_a, id_b) undirected edges -> (doc_id, cluster_id) where
    cluster_id is the minimum member id of the component."""
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
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.id2, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
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
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


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

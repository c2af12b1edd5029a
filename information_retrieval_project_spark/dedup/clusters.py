"""Duplicate clustering: connected components over a near-dup pair graph.

Pair generators (exact_dedup, minhash_lsh_pairs, simhash_near_dup_pairs,
emb near-dup) emit EDGES; the keep-one-per-cluster step of a dedup pipeline
needs the transitive closure — a doc transitively connected to a kept doc
must not survive as "unique". This is iterative (graph diameter rounds), so
it is one of the few operators here that cannot be a single Catalyst plan.

Algorithm: minimum-label propagation (the simple variant of Kiveris et al.'s
large-star/small-star map-reduce CC). Each round every node takes
min(own label, neighbor labels) — one join + one aggregate per round,
converging in graph-diameter rounds. Near-dup graphs are overwhelmingly
tiny cliques/chains (diameter ≤ ~3), so rounds stay single digits at any
corpus size; the per-round cost is one shuffle on node id. Lineage is cut
each round with localCheckpoint — an iterative plan would otherwise grow
exponentially. At extreme diameters switch to alternating large/small-star
(same join shape, O(log d) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """(doc_id, cluster): cluster = min doc_id of the node's component.

    nodes: one row per doc (singletons cluster to themselves);
    pairs: undirected edges (doc_a, doc_b). Deterministic; converges when a
    full round changes no label (checked with a 1-row count per round)."""
    lab = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(lab, edges.src == lab.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_lab = (
            lab.join(nbr_min, lab.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        lab = new_lab
        if changed == 0:
            break
    return lab.select(F.col("node").alias(id_col), F.col("label").alias("cluster"))

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
    pairs: undirected edges (doc_a, doc_b). Deterministic. Labels are
    monotone non-increasing, so any change strictly decreases the exact
    label sum — convergence is one decimal-sum aggregate per round (no
    join-against-previous shuffle; decimal(38,0) holds 10^12 64-bit labels
    exactly)."""
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
    def label_sum(df):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(lab)
    converged = False
    changing_rounds = 0
    while True:
        nbr_min = (
            edges.join(lab, edges.src == lab.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        lab = (
            lab.join(nbr_min, lab.node == nbr_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = label_sum(lab)
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
        # max_iter bounds CHANGING rounds; the confirming (no-change) round
        # is free, so a diameter-d graph needs max_iter >= d, not d+1
        changing_rounds += 1
        if changing_rounds >= max_iter:
            break
    if not converged:
        # unconverged labels are silently-wrong clusters (the dedup would
        # keep multiple docs of one component) — refuse to return them
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    return lab.select(F.col("node").alias(id_col), F.col("label").alias("cluster"))

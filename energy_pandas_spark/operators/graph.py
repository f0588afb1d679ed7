"""Connected components over an edge DataFrame — the transitive-closure
pass that turns near-dup PAIRS (minhash/simhash/embedding LSH output)
into dedup CLUSTERS, and a general entity-resolution primitive.

Algorithm: iterative min-label propagation. Each round every node
takes the minimum label among itself and its neighbors (one join + one
hash-aggregate, both keyed on node id); converged when no label
changes. Rounds needed = graph diameter — near-dup graphs are
overwhelmingly tiny cliques/chains, so 3-6 rounds in practice. Each
round's result is ``localCheckpoint``-ed to truncate lineage (without
it the plan doubles per round and Catalyst analysis time explodes).
Convergence is detected from ``sum(label)``: labels only ever
decrease, so an unchanged sum means a fixpoint — one cheap aggregate
per round instead of a change-count join.

Scale path: for adversarial graphs (long chains, giant components)
the alternating large-star/small-star formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log^2 n) rounds with the same per-round join+agg shape; the
propagation loop below is the same skeleton, so swapping the round
body is local. The reference library has no graph surface at all
(SURVEY.md §2.5: no joins beyond index alignment) — this exists for
the training-data dedup pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node in ``edges``; ``component`` is the
    smallest node id reachable from ``id``. Nodes are whatever appears
    in either endpoint column (longs)."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.distinct().localCheckpoint(eager=False)
    # init = one propagation step for free: the same groupBy that
    # discovers the node set also takes the 1-hop min, replacing a
    # distinct shuffle + a full join round with a single aggregate
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("u"), F.col("__mv")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = labels.join(sym, labels["id"] == sym["u"]).select(
            F.col("v").alias("id"), F.col("label")
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, is_survivor). The cluster
    id is the smallest doc id in the transitive closure; exactly one
    survivor per cluster. Unlike greedy pair-dropping (drop every
    ``id_b``), this is correct on chains: pairs (2,3),(1,3) form ONE
    cluster {1,2,3} with survivor 1, where the greedy rule would keep
    both 1 and 2."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_survivor"),
    )

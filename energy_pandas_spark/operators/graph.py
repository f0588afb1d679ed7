"""Connected components over an edge DataFrame — the transitive-closure
pass that turns near-dup PAIRS (minhash/simhash/embedding LSH output)
into dedup CLUSTERS, and a general entity-resolution primitive.

Algorithm: iterative min-label propagation WITH pointer jumping. Each
round every node takes the minimum label among itself and its
neighbors (one join + one hash-aggregate, both keyed on node id), then
follows its label one step (label-of-label join) — the classic
path-compression trick, so label information travels a doubling
distance per round and convergence is O(log diameter) instead of
O(diameter): a 10,000-node chain converges in ~14 rounds, tiny
near-dup cliques still in 2-3. Each round's result is
``localCheckpoint``-ed to truncate lineage (without it the plan
doubles per round and Catalyst analysis time explodes). Convergence is
detected from ``sum(label)``: labels only ever decrease, so an
unchanged sum means a fixpoint — one cheap aggregate per round instead
of a change-count join. Exhausting ``max_iter`` without a fixpoint
raises instead of silently returning partially-merged components.

The reference library has no graph surface at all (SURVEY.md §2.5: no
joins beyond index alignment) — this exists for the training-data
dedup pipeline.
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
    # distinct() leaves sym partitioned on (u, v); repartition on u once
    # so EVERY round's propagation join reuses the partitioning instead
    # of re-exchanging the edge table per iteration (localCheckpoint
    # preserves outputPartitioning through LogicalRDD)
    sym = sym.distinct().repartition("u").localCheckpoint(eager=False)
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
    for it in range(max_iter):
        nbr = labels.join(sym, labels["id"] == sym["u"]).select(
            F.col("v").alias("id"), F.col("label")
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: follow the label one step (labels are node ids,
        # so label-of-label always resolves). This halves remaining path
        # length every round — O(log diameter) total rounds.
        hop = merged.select(
            F.col("id").alias("__lid"), F.col("label").alias("__llabel")
        )
        labels = (
            merged.join(hop, merged["label"] == F.col("__lid"), "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("__llabel", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (rounds needed ~ log2 of the longest path)"
        )
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

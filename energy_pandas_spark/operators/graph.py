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

__all__ = ["connected_components", "connected_components_star", "dedup_clusters"]


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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    2014) — the scale path for graphs with HUGE components: unlike
    label propagation, each round REWRITES the edge set toward stars,
    so the working set shrinks as components collapse, and per-round
    work is two keyed aggregates + joins (no neighbor lists are ever
    collected, so a billion-degree star center costs an aggregate, not
    a task-local array).

    large-star: every node's strictly-larger neighbors re-attach to
    the minimum of its closed neighborhood; small-star: every node's
    smaller-or-equal neighbors (plus itself) attach to that minimum.
    Both emit edges (x, m) with m < x, so edges stay canonical and
    labels only fall. Fixpoint = unchanged (count, hash-sum) of the
    edge set over a full L+S cycle.

    Returns (id, component) identical to :func:`connected_components`
    (smallest reachable id), verified by equivalence tests.
    """
    # canonical (hi, lo) edges, self-loops dropped
    e = (
        edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        e.select(F.col("hi").alias("id"))
        .union(e.select(F.col("lo").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: ANSI long sum overflows on random
            # 64-bit hash values
            F.sum(F.xxhash64("hi", "lo").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _sig(e)
    for _ in range(max_iter):
        # large-star over the symmetric view: m(u) = min(N(u) ∪ {u});
        # every neighbor v > u re-attaches to m(u)
        sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m_u = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(m_u, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star over (hi -> lo) direction: m(hi) = min of smaller
        # neighbors; all of them plus hi itself attach to m
        m_hi = large.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = large.join(m_hi, "hi")
        small = (
            joined.filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(m_hi.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e = small
        cur = _sig(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds"
        )
    # final stars: every non-center points at its component min
    labels = e.groupBy(F.col("hi").alias("id")).agg(F.min("lo").alias("component"))
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )

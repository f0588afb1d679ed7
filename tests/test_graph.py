"""Connected components + dedup clustering (operators.graph)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_components_chain_and_islands(spark):
    from energy_pandas_spark.operators.graph import connected_components

    # chain 1-3-2 (one component via 3), island pair 10-11, singleton via
    # self-loop 99
    edges = spark.createDataFrame(
        [(2, 3), (1, 3), (10, 11), (99, 99)], "src long, dst long"
    )
    got = {
        r.id: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_components_long_chain_converges(spark):
    from energy_pandas_spark.operators.graph import connected_components

    n = 40
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    rows = connected_components(edges).collect()
    assert len(rows) == n + 1
    assert all(r.component == 0 for r in rows)


def test_dedup_clusters_chain(spark):
    from energy_pandas_spark.operators.graph import dedup_clusters

    # greedy pair-dropping would keep both 1 and 2 here; CC keeps only 1
    pairs = spark.createDataFrame([(2, 3), (1, 3)], "id_a long, id_b long")
    rows = dedup_clusters(pairs).collect()
    survivors = sorted(r.doc_id for r in rows if r.is_survivor)
    assert survivors == [1]
    assert {r.doc_id: r.cluster_id for r in rows} == {1: 1, 2: 1, 3: 1}


def test_minhash_dedup_uses_clusters(spark):
    from energy_pandas_spark.operators.dedup import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + "extra tail words here"),
            (3, base + "extra tail words here and more"),
            (4, "completely different content about spark engines " * 6),
        ],
        "doc_id long, text string",
    )
    dropped = sorted(
        r.doc_id for r in minhash_dedup(docs, threshold=0.5).collect()
    )
    assert 1 not in dropped and 4 not in dropped
    assert set(dropped) <= {2, 3} and len(dropped) >= 1


def test_long_chain_converges_logarithmically(spark):
    """Pointer jumping: a 500-node chain (diameter 500) must converge
    well inside max_iter ~ log2(500) rounds, not O(diameter)."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.graph import connected_components

    edges = spark.range(0, 500).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    cc = connected_components(edges, max_iter=15)
    assert cc.select("component").distinct().count() == 1
    assert cc.count() == 501


def test_nonconvergence_raises(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.graph import connected_components

    edges = spark.range(0, 2000).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


class TestStarCC:
    def _compare(self, spark, edges):
        from energy_pandas_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )

        df = spark.createDataFrame(edges, "src long, dst long")
        a = {
            (r["id"], r["component"])
            for r in connected_components(df).collect()
        }
        b = {
            (r["id"], r["component"])
            for r in connected_components_star(df).collect()
        }
        assert a == b

    def test_matches_minlabel_on_chain(self, spark):
        # a 60-node chain: worst case for plain propagation, the shape
        # the star algorithm exists for
        self._compare(spark, [(i, i + 1) for i in range(60)])

    def test_matches_minlabel_on_random_graph(self, spark):
        import random

        rng = random.Random(42)
        edges = [
            (rng.randrange(100), rng.randrange(100)) for _ in range(120)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        self._compare(spark, edges)

    def test_matches_minlabel_on_cliques_and_isolated_pair(self, spark):
        edges = (
            [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
            + [(10, 11), (11, 12), (10, 12)]                     # triangle
            + [(20, 21)]                                         # pair
        )
        self._compare(spark, edges)


def test_components_huge_hash_ids_no_overflow(spark):
    """Content-addressed ids near Long.MAX: the convergence sum must not
    overflow (ANSI mode turns a long-sum wrap into a crash), so both
    variants accumulate in decimal(38,0)."""
    from energy_pandas_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    top = 9_223_372_036_854_775_807  # Long.MAX
    edges = spark.createDataFrame(
        [(top, top - 1), (top - 2, top - 3), (top - 1, top - 4)],
        "src long, dst long",
    )
    want = {
        top: top - 4,
        top - 1: top - 4,
        top - 4: top - 4,
        top - 2: top - 3,
        top - 3: top - 3,
    }
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == want
    got_star = {
        r.id: r.component for r in connected_components_star(edges).collect()
    }
    assert got_star == want

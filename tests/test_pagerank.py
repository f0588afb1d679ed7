"""PageRank (integer arithmetic) and TextRank keyword tests.

The operator's claim is BIT-EXACTNESS: because every step is integer
multiply / floor-divide / order-free sum, the distributed result must
equal a single-threaded pure-Python recomputation EXACTLY — not
approximately — on any graph. These tests hold it to that.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.operators.graph import pagerank
from energy_pandas_spark.operators.text import textrank_keywords

Q = 1 << 40


def ref_pagerank(edges, n_iter=10, anum=17, aden=20, scale=Q):
    """Single-threaded integer PageRank — the executable spec."""
    outw: dict = defaultdict(int)
    for u, v, w in edges:
        outw[u] += w
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(nodes)
    r = {x: scale // n for x in nodes}
    base = (aden - anum) * (scale // n)
    for _ in range(n_iter):
        s: dict = defaultdict(int)
        for u, v, w in edges:
            s[v] += (r[u] * w) // outw[u]
        r = {x: (base + anum * s[x]) // aden for x in nodes}
    return r


def _run(spark, edges, weighted=False, **kw):
    if weighted:
        df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = pagerank(df, weight="w", **kw)
    else:
        df = spark.createDataFrame(
            [(u, v) for u, v, _ in edges], "src long, dst long"
        )
        got = pagerank(df, **kw)
    return {r["id"]: r["rank_q"] for r in got.collect()}


def test_two_node_cycle_hand_computed(spark):
    # 1 <-> 2: perfectly symmetric, ranks stay equal at the fixpoint.
    # r0 = Q//2; every iteration maps r -> (3*(Q//2) + 17*r) // 20,
    # whose fixpoint is Q//2 (up to floor rounding).
    edges = [(1, 2, 1), (2, 1, 1)]
    got = _run(spark, edges)
    assert got == ref_pagerank(edges)
    assert got[1] == got[2]
    assert abs(got[1] - Q // 2) <= 20  # floor-rounding slack only


def test_star_hub_outranks_leaves(spark):
    # leaves 1..5 all point at hub 0 and hub points back: the hub must
    # dominate, and the exact values must match the reference
    edges = [(i, 0, 1) for i in range(1, 6)] + [(0, i, 1) for i in range(1, 6)]
    got = _run(spark, edges)
    ref = ref_pagerank(edges)
    assert got == ref
    assert got[0] > max(got[i] for i in range(1, 6))


def test_dangling_node_mass_dropped(spark):
    # 1 -> 2 and nothing out of 2: documented semantics — 2's mass is
    # damped away, not redistributed; exactness vs the reference holds
    # (the reference drops it identically: node 2 contributes nothing)
    edges = [(1, 2, 1)]
    got = _run(spark, edges)
    assert got == ref_pagerank(edges)


def test_random_digraph_exact(spark):
    import random

    rng = random.Random(7)
    raw = {(rng.randrange(40), rng.randrange(40)) for _ in range(300)}
    edges = [(u, v, 1) for u, v in raw if u != v]
    got = _run(spark, edges)
    assert got == ref_pagerank(edges)


def test_weighted_random_graph_exact(spark):
    import random

    rng = random.Random(11)
    raw = {(rng.randrange(25), rng.randrange(25)) for _ in range(150)}
    edges = [(u, v, rng.randrange(1, 9)) for u, v in raw if u != v]
    got = _run(spark, edges, weighted=True)
    assert got == ref_pagerank(edges)


def test_iteration_count_matters_and_is_deterministic(spark):
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 1)]
    r2 = _run(spark, edges, n_iter=2)
    r10 = _run(spark, edges, n_iter=10)
    assert r2 == ref_pagerank(edges, n_iter=2)
    assert r10 == ref_pagerank(edges, n_iter=10)
    assert r2 != r10  # 2 iterations has not converged on a 3-cycle


def test_string_node_ids(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "src string, dst string"
    )
    got = {r["id"]: r["rank_q"] for r in pagerank(df).collect()}
    ref = ref_pagerank([("a", "b", 1), ("b", "a", 1), ("b", "c", 1), ("c", "b", 1)])
    assert got == ref
    assert got["b"] > got["a"]


def test_partitioning_invariance(spark):
    # same graph, adversarial partitioning: 1 partition vs many — the
    # integer arithmetic must make layout invisible in the result
    import random

    rng = random.Random(3)
    raw = {(rng.randrange(30), rng.randrange(30)) for _ in range(200)}
    edges = [(u, v) for u, v in raw if u != v]
    df1 = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    dfn = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    a = {r["id"]: r["rank_q"] for r in pagerank(df1).collect()}
    b = {r["id"]: r["rank_q"] for r in pagerank(dfn).collect()}
    assert a == b


def ref_textrank(texts, top=20, n_iter=10):
    """Pure-Python TextRank replay with the operator's tokenizer."""
    und = set()
    for t in texts:
        toks = [w for w in (t or "").lower().split() if w]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    edges = [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und]
    r = ref_pagerank(edges, n_iter=n_iter)
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(t, q, i + 1) for i, (t, q) in enumerate(ranked)]


def test_textrank_matches_reference_replay(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat sleeps",
        "a lazy dog and a lazy cat",
        "fox and dog chase the cat",
        None,
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["term"], r["rank_q"], r["rank"])
        for r in textrank_keywords(df, top=10).orderBy("rank").collect()
    ]
    assert got == ref_textrank(texts, top=10)
    # hub words (high co-occurrence diversity) must lead the board
    top_terms = [t for t, _, _ in got[:4]]
    assert "the" in top_terms or "lazy" in top_terms


def test_textrank_plan_single_corpus_scan(spark):
    # the edge build is one bigram aggregate over one scan of the input
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(50)],
        "doc_id long, text string",
    )
    out = textrank_keywords(df, top=5, n_iter=2)
    assert out.count() == 5


def ref_ppr(edges, seeds, n_iter=10, anum=17, aden=20, scale=Q):
    """Single-threaded integer personalized PageRank."""
    outw: dict = defaultdict(int)
    for u, v, w in edges:
        outw[u] += w
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    sset = set(seeds) & set(nodes)
    ns = len(sset)
    r = {x: (scale // ns if x in sset else 0) for x in nodes}
    base = (aden - anum) * (scale // ns)
    for _ in range(n_iter):
        s: dict = defaultdict(int)
        for u, v, w in edges:
            s[v] += (r[u] * w) // outw[u]
        r = {
            x: ((base if x in sset else 0) + anum * s[x]) // aden
            for x in nodes
        }
    return r


class TestPersonalizedPagerank:
    def test_random_graph_exact_vs_reference(self, spark):
        import random

        rng = random.Random(23)
        raw = {(rng.randrange(30), rng.randrange(30)) for _ in range(200)}
        edges = [(u, v, 1) for u, v in raw if u != v]
        df = spark.createDataFrame(
            [(u, v) for u, v, _ in edges], "src long, dst long"
        )
        seeds = spark.createDataFrame([(0,), (1,)], "id long")
        got = {
            r["id"]: r["rank_q"]
            for r in pagerank(df, seeds=seeds).collect()
        }
        assert got == ref_ppr(edges, [0, 1])

    def test_proximity_to_seed_dominates(self, spark):
        # two disconnected 3-cycles; seeding in one leaves the other at 0
        edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
        df = spark.createDataFrame(edges, "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "id long")
        got = {r["id"]: r["rank_q"] for r in pagerank(df, seeds=seeds).collect()}
        assert got[10] == got[11] == got[12] == 0
        assert got[1] > 0 and got[2] > 0

    def test_missing_seeds_ignored_all_missing_raises(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        some = spark.createDataFrame([(1,), (99,)], "id long")
        got = {r["id"]: r["rank_q"] for r in pagerank(df, seeds=some).collect()}
        assert got == ref_ppr([(1, 2, 1), (2, 1, 1)], [1])
        none = spark.createDataFrame([(99,)], "id long")
        with pytest.raises(ValueError, match="no seed id"):
            pagerank(df, seeds=none)


def test_related_terms_expand_seed_topic(spark):
    from energy_pandas_spark.operators.text import related_terms

    texts = [
        "solar panel energy grid",
        "solar energy storage battery",
        "battery storage grid",
        "cat dog pet food",
        "dog food bowl",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = related_terms(df, ["solar"], top=5).orderBy("rank").collect()
    terms = [r["term"] for r in got]
    assert "solar" not in terms  # seeds excluded by default
    # everything reachable from 'solar' outranks the pet cluster
    energy_terms = {"panel", "energy", "grid", "storage", "battery"}
    assert set(terms[:3]) <= energy_terms
    pet = {"cat", "dog", "pet", "food", "bowl"}
    ranked_pet = [t for t in terms if t in pet]
    assert not ranked_pet or all(
        got[i]["rank_q"] == 0 for i, t in enumerate(terms) if t in pet
    )

"""Inverted-index retrieval: hand-computed exact scores, BM25 parity
with an independent Python recomputation, and the persisted index's
partition pruning + result identity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

CORPUS = [
    (1, "spark hash join beats sort merge join here"),
    (2, "the sort merge join path"),
    (3, "hash hash hash table"),
    (4, "window sort window sort window"),
    (5, "totally unrelated words only"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _py_postings():
    post = {}
    for did, text in CORPUS:
        toks = text.lower().split()
        for t in toks:
            key = (did, t)
            post[key] = post.get(key, 0) + 1
    return post


def test_search_topk_hand_computed(spark):
    from energy_pandas_spark.operators.retrieval import query_terms, search_topk

    q = query_terms(spark, {0: "hash join", 1: "sort sort window"})
    got = {
        (r.query_id, r.doc_id): (r.score_q, r.rank)
        for r in search_topk(_docs(spark), q, k=3).collect()
    }

    post = _py_postings()
    n = len(CORPUS)
    expected = {}
    for qid, qtext in {0: "hash join", 1: "sort sort window"}.items():
        qtf = {}
        for t in qtext.split():
            qtf[t] = qtf.get(t, 0) + 1
        df = {
            t: sum(1 for (d, tt) in post if tt == t) for t in qtf
        }
        scores = {}
        for (d, t), tf in post.items():
            if t in qtf:
                scores[d] = scores.get(d, 0) + tf * qtf[t] * ((n * 1024) // df[t])
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, s) in enumerate(top, 1):
            expected[(qid, d)] = (s, rank)
    assert got == expected


def test_query_terms_counts_repeats(spark):
    from energy_pandas_spark.operators.retrieval import query_terms

    rows = query_terms(spark, {7: "Table TABLE value"}).collect()
    assert {(r.term, r.qtf) for r in rows} == {("table", 2), ("value", 1)}
    assert all(r.query_id == 7 for r in rows)


def test_bm25_matches_python_reference(spark):
    from energy_pandas_spark.operators.retrieval import bm25_topk, query_terms

    k1, b = 1.2, 0.75
    q = {0: "hash join", 1: "sort window"}
    got = {
        (r.query_id, r.doc_id): (r.score_q, r.rank)
        for r in bm25_topk(_docs(spark), query_terms(spark, q), k=5, k1=k1, b=b).collect()
    }

    post = _py_postings()
    n = len(CORPUS)
    dl = {did: len(text.split()) for did, text in CORPUS}
    avgdl = sum(dl.values()) / n
    for qid, qtext in q.items():
        qtf = {}
        for t in qtext.split():
            qtf[t] = qtf.get(t, 0) + 1
        dfreq = {t: sum(1 for (d, tt) in post if tt == t) for t in qtf}
        scores = {}
        for (d, t), tf in post.items():
            if t in qtf and dfreq[t] > 0:
                idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
                scores[d] = scores.get(d, 0) + round(1024.0 * qtf[t] * idf * tfn)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rank, (d, s) in enumerate(top, 1):
            qs, qr = got[(qid, d)]
            # 1-ulp ln() divergence can move a quantized contribution
            # by 1; ranks must still agree on this well-separated data
            assert abs(qs - s) <= len(qtf) and qr == rank
    assert len(got) == sum(
        min(5, len({d for (d, t) in post if t in qtext.split()})) for qid, qtext in q.items()
    )


def test_postings_carry_doc_length(spark):
    from energy_pandas_spark.operators.retrieval import build_postings

    p = build_postings(_docs(spark))
    got = {(r.doc_id, r.term): (r.tf, r.dl) for r in p.collect()}
    assert got[(3, "hash")] == (3, 4)
    assert got[(1, "join")] == (2, 8)


def test_index_roundtrip_and_partition_pruning(spark, tmp_path):
    from energy_pandas_spark.operators.retrieval import (
        build_postings,
        query_terms,
        search_index,
        search_topk,
        write_postings_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "postings")
    manifest = write_postings_index(build_postings(docs), path, n_buckets=16)
    assert manifest.agg(F.sum("n_postings")).collect()[0][0] == len(
        {(d, t) for d, t in _py_postings()}
    )

    q = query_terms(spark, {0: "hash join"})
    direct = {
        (r.query_id, r.doc_id, r.score_q, r.rank)
        for r in search_topk(docs, q, k=3).collect()
    }
    via_index = search_index(spark, path, docs, q, k=3, n_buckets=16)
    assert {
        (r.query_id, r.doc_id, r.score_q, r.rank) for r in via_index.collect()
    } == direct

    # pruning: the scan plan must carry the bucket partition filter
    # (directory-level skip), and the query terms' buckets must be a
    # strict subset of the index's populated partition directories
    import os

    buckets = sorted(
        r.b
        for r in spark.createDataFrame([("hash",), ("join",)], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(16)).cast("int").alias("b"))
        .collect()
    )
    pruned = spark.read.parquet(path).filter(F.col("bucket").isin(buckets))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    on_disk = {d for d in os.listdir(path) if d.startswith("bucket=")}
    assert 0 < len({f"bucket={b}" for b in buckets} & on_disk) < len(on_disk)


def test_search_handles_no_hit_and_null_text(spark):
    from energy_pandas_spark.operators.retrieval import query_terms, search_topk

    docs = spark.createDataFrame(
        CORPUS + [(9, None)], "doc_id long, text string"
    )
    q = query_terms(spark, {0: "zzzz absent", 1: "hash"})
    rows = search_topk(docs, q, k=3).collect()
    assert {r.query_id for r in rows} == {1}  # no-hit query returns nothing
    assert all(r.doc_id != 9 for r in rows)


def test_search_require_all_and_semantics(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.retrieval import query_terms, search_topk

    docs = _docs(spark)
    q = query_terms(spark, {0: "hash join"})
    any_hits = {r.doc_id for r in search_topk(docs, q, k=10).collect()}
    all_hits = {r.doc_id for r in search_topk(docs, q, k=10, require_all=True).collect()}
    # doc 1 has both terms; docs 2 (join only) and 3 (hash only) match OR not AND
    assert 1 in all_hits and all_hits < any_hits
    assert {2, 3} <= any_hits and not {2, 3} & all_hits
    # AND scores equal the OR scores for surviving docs
    or_scores = {r.doc_id: r.score_q for r in search_topk(docs, q, k=10).collect()}
    for r in search_topk(docs, q, k=10, require_all=True).collect():
        assert or_scores[r.doc_id] == r.score_q


def test_append_postings_index_matches_rebuild(spark, tmp_path):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.retrieval import (
        append_postings_index,
        build_postings,
        query_terms,
        search_index,
        write_postings_index,
    )

    docs = _docs(spark)
    first = docs.filter(F.col("doc_id") <= 3)
    rest = docs.filter(F.col("doc_id") > 3)
    inc = str(tmp_path / "inc")
    write_postings_index(build_postings(first), inc, n_buckets=16)
    manifest = append_postings_index(build_postings(rest), inc, n_buckets=16)

    full = str(tmp_path / "full")
    write_postings_index(build_postings(docs), full, n_buckets=16)
    q = query_terms(spark, {0: "hash join", 1: "sort window"})
    got_inc = {
        (r.query_id, r.doc_id, r.score_q, r.rank)
        for r in search_index(spark, inc, docs, q, k=4, n_buckets=16).collect()
    }
    got_full = {
        (r.query_id, r.doc_id, r.score_q, r.rank)
        for r in search_index(spark, full, docs, q, k=4, n_buckets=16).collect()
    }
    assert got_inc == got_full
    assert manifest.agg(F.sum("n_postings")).collect()[0][0] == len(
        {(d, t) for d, t in _py_postings()}
    )


def test_compact_postings_index_preserves_results(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.retrieval import (
        append_postings_index,
        build_postings,
        compact_postings_index,
        query_terms,
        search_index,
        write_postings_index,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "cidx")
    write_postings_index(build_postings(docs.filter(F.col("doc_id") <= 2)), idx, n_buckets=8)
    append_postings_index(build_postings(docs.filter(F.col("doc_id") == 3)), idx, n_buckets=8)
    append_postings_index(build_postings(docs.filter(F.col("doc_id") >= 4)), idx, n_buckets=8)

    q = query_terms(spark, {0: "hash join", 1: "sort window"})
    before = {
        (r.query_id, r.doc_id, r.score_q, r.rank)
        for r in search_index(spark, idx, docs, q, k=4, n_buckets=8).collect()
    }

    def n_files():
        total = 0
        for d in os.listdir(idx):
            if d.startswith("bucket="):
                total += sum(
                    1 for f in os.listdir(os.path.join(idx, d)) if f.endswith(".parquet")
                )
        return total

    frag = n_files()
    manifest = compact_postings_index(spark, idx, files_per_bucket=1)
    assert n_files() < frag  # appends actually compacted away
    after = {
        (r.query_id, r.doc_id, r.score_q, r.rank)
        for r in search_index(spark, idx, docs, q, k=4, n_buckets=8).collect()
    }
    assert after == before
    assert manifest.agg(F.sum("n_postings")).collect()[0][0] == len(
        {(d, t) for d, t in _py_postings()}
    )


class TestIndexMetaAndRecovery:
    def test_bucket_count_persisted_and_validated(self, spark, tmp_path):
        from energy_pandas_spark.operators.retrieval import (
            append_postings_index,
            build_postings,
            query_terms,
            read_bucket_meta,
            search_index,
            write_postings_index,
        )

        docs = spark.createDataFrame(
            [(i, f"term{i} shared word") for i in range(20)],
            "doc_id long, text string",
        )
        p = str(tmp_path / "idx")
        post = build_postings(docs)
        write_postings_index(post, p, n_buckets=8)
        assert read_bucket_meta(spark, p) == 8
        q = query_terms(spark, {0: "shared"})
        # meta-resolved bucket count: no n_buckets argument needed
        hits = search_index(spark, p, docs, q, k=5)
        assert hits.count() == 5
        # a contradicting explicit count raises instead of silently
        # pruning the wrong partitions
        import pytest as _pt

        with _pt.raises(ValueError, match="n_buckets=8"):
            search_index(spark, p, docs, q, k=5, n_buckets=64)
        with _pt.raises(ValueError, match="n_buckets=8"):
            append_postings_index(post, p, n_buckets=16)

    def test_query_terms_ascii_whitespace_matches_index(self, spark):
        from energy_pandas_spark.operators.retrieval import (
            build_postings,
            query_terms,
            search_topk,
        )

        # U+00A0 is NOT a token break for the JVM \s+ tokenizer; the
        # query tokenizer must agree or this document is unfindable
        docs = spark.createDataFrame(
            [(1, "hello world elsewhere")], "doc_id long, text string"
        )
        q = query_terms(spark, {0: "hello world"})
        assert [r.term for r in q.collect()] == ["hello world"]
        top = search_topk(docs, q, k=3)
        assert [r.doc_id for r in top.collect()] == [1]

    def test_search_releases_its_cache(self, spark):
        from energy_pandas_spark.operators.retrieval import (
            query_terms,
            search_topk,
        )

        docs = spark.createDataFrame(
            [(i, f"alpha beta doc{i}") for i in range(10)],
            "doc_id long, text string",
        )
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getRDDStorageInfo()
        out = search_topk(docs, query_terms(spark, {0: "alpha"}), k=3)
        assert out.count() == 3
        # the matched-postings persist must not outlive the call
        # (localCheckpoint blocks are the only acceptable residue)
        names = [
            str(i.name()) for i in jsc.getRDDStorageInfo()
        ]
        assert not any("MEMORY_AND_DISK" in n or "Exchange" in n for n in names) or len(
            jsc.getRDDStorageInfo()
        ) <= len(before) + 1


class TestRrfFuse:
    def _ranking(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, score_q long, rank int"
        )

    def test_hand_computed_fusion(self, spark):
        from energy_pandas_spark.operators.retrieval import RRF_SCALE, rrf_fuse

        # system A ranks (10, 11, 12); system B ranks (11, 12, 13).
        a = self._ranking(spark, [(0, 10, 900, 1), (0, 11, 800, 2), (0, 12, 700, 3)])
        b = self._ranking(spark, [(0, 11, 50, 1), (0, 12, 40, 2), (0, 13, 30, 3)])
        out = {r.doc_id: r for r in rrf_fuse([a, b], k=4, rrf_k=60).collect()}

        def rr(rank):
            return RRF_SCALE // (60 + rank)

        assert out[11].score_q == rr(2) + rr(1)  # both systems
        assert out[12].score_q == rr(3) + rr(2)
        assert out[10].score_q == rr(1)
        assert out[13].score_q == rr(3)
        assert out[11].rank == 1  # consensus beats either solo #1
        assert out[11].n_systems == 2 and out[10].n_systems == 1
        # rr(1)=17189 < rr(3)+rr(2)=16644+16912 -> 12 outranks solo 10
        assert out[12].rank == 2 and out[10].rank == 3 and out[13].rank == 4

    def test_per_query_isolation_and_k(self, spark):
        from energy_pandas_spark.operators.retrieval import rrf_fuse

        a = self._ranking(
            spark, [(0, 1, 9, 1), (0, 2, 8, 2), (1, 5, 9, 1), (1, 6, 8, 2)]
        )
        b = self._ranking(
            spark, [(0, 2, 9, 1), (0, 3, 8, 2), (1, 6, 9, 1), (1, 7, 8, 2)]
        )
        out = rrf_fuse([a, b], k=1).collect()
        top = {r.query_id: r.doc_id for r in out}
        assert top == {0: 2, 1: 6}  # the doc both systems agree on
        assert len(out) == 2

    def test_single_system_preserves_order(self, spark):
        from energy_pandas_spark.operators.retrieval import rrf_fuse

        a = self._ranking(spark, [(0, 7, 9, 1), (0, 3, 8, 2), (0, 9, 7, 3)])
        out = rrf_fuse([a], k=3).orderBy("rank").collect()
        assert [r.doc_id for r in out] == [7, 3, 9]

    def test_validation(self, spark):
        from energy_pandas_spark.operators.retrieval import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([])
        a = self._ranking(spark, [(0, 1, 9, 1)])
        with pytest.raises(ValueError):
            rrf_fuse([a], rrf_k=0)

    def test_end_to_end_hybrid(self, spark):
        from energy_pandas_spark.operators.retrieval import (
            bm25_topk,
            query_terms,
            rrf_fuse,
            search_topk,
        )

        docs = _docs(spark)
        q = query_terms(spark, {0: "spark join", 1: "window stream"})
        fused = rrf_fuse(
            [search_topk(docs, q, k=5), bm25_topk(docs, q, k=5)], k=3
        )
        rows = fused.collect()
        assert rows and all(r.n_systems in (1, 2) for r in rows)
        assert all(1 <= r.rank <= 3 for r in rows)
        # no single-partition global sort anywhere in the fusion
        plan = fused._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan

"""Training-data pipeline operator tests: dedup, similarity, text,
multimodal plumbing, streaming windows.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.functions.textfns import jaccard, word_shingles
from energy_pandas_spark.functions.vectors import cosine_similarity, l2_norm
from energy_pandas_spark.operators.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    simhash_neardup_pairs,
)
from energy_pandas_spark.operators.multimodal import (
    decode_features,
    frame_sample_plan,
    media_table,
)
from energy_pandas_spark.operators.similarity import cosine_topk, ivf_topk
from energy_pandas_spark.operators.text import language_id, quality_score, token_count
from energy_pandas_spark.streaming.events import sessionize, windowed_aggregate


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (1, "the quick brown fox jumps over the lazy dog again and again", "en"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog again and again", "en"),  # near dup of 0
        (3, "der schnelle braune fuchs springt über den faulen hund", "de"),
        (4, "le renard brun rapide saute par dessus le chien paresseux et le chat", "fr"),
        (5, "completely different content about spark query engines and shuffles", "en"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestVectorFns:
    def test_cosine_and_norm(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0]), ([0.0, 0.0], [1.0, 0.0])],
            "a array<double>, b array<double>",
        )
        out = df.select(
            F.round(cosine_similarity("a", "b"), 9).alias("c"),
            F.round(l2_norm("a"), 9).alias("n"),
        ).collect()
        assert out[0]["c"] == 0.0
        assert out[1]["c"] == 1.0
        assert out[2]["c"] == 0.0  # zero-vector guard
        assert out[1]["n"] == round(math.sqrt(2), 9)

    def test_jaccard_shingles(self, spark):
        df = spark.createDataFrame([("a b c d", "a b c e")], "x string, y string")
        out = df.select(
            jaccard(word_shingles("x", 2), word_shingles("y", 2)).alias("j")
        ).collect()[0]["j"]
        # bigrams: {ab,bc,cd} vs {ab,bc,ce} -> 2/4
        assert out == 0.5


class TestDedup:
    def test_exact(self, docs):
        groups = dedup_exact(docs).collect()
        dup = [g for g in groups if g["n_copies"] > 1]
        assert len(dup) == 1 and dup[0]["doc_id"] == 0 and dup[0]["n_copies"] == 2

    def test_minhash_finds_neardup(self, docs):
        pairs = minhash_lsh_pairs(
            docs, threshold=0.3, num_hashes=64, bands=32, shingle_size=2
        ).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (0, 1) in got  # exact dup always found
        assert (0, 2) in got or (1, 2) in got  # near dup
        assert all({a, b} != {0, 5} for a, b in got)  # unrelated not paired

    def test_simhash(self, docs):
        pairs = simhash_neardup_pairs(docs, max_hamming=10).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (0, 1) in got
        hams = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
        assert hams[(0, 1)] == 0

    def test_simhash_null_and_empty_text(self, spark):
        # NULL / empty / whitespace-only docs must get signature 0, not
        # abort the Arrow kernel (regression: len(None) in the sign kernel).
        from energy_pandas_spark.operators.dedup import simhash64

        df = spark.createDataFrame(
            [(0, None), (1, ""), (2, "   "), (3, "hello world")],
            "doc_id long, text string",
        )
        sigs = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
        assert sigs[0] == 0 and sigs[1] == 0 and sigs[2] == 0
        assert sigs[3] != 0
        # and the pair operator survives degenerate docs end-to-end
        pairs = simhash_neardup_pairs(df, max_hamming=3).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        # the three token-less docs share signature 0 -> mutual near-dups
        assert (0, 1) in got and (0, 2) in got and (1, 2) in got

    def test_embedding_neardup(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = embedding_neardup_pairs(
            df, threshold=0.95, n_planes=16, bands=8, dim=4
        ).collect()
        got = {(p["id_a"], p["id_b"]) for p in pairs}
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got

    def test_embedding_neardup_collapse_exact(self, spark):
        """r7 sf10 ledger regression: a corpus where every unique
        vector has many exact copies overflows EVERY bucket past
        max_bucket, so the uncollapsed query silently returns zero
        rows; collapse_exact restores the near-dup pair over min-id
        representatives."""
        base = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),  # near dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        ]
        rows = [
            (vid + 10 * rep, vec)
            for rep in range(30)
            for (vid, vec) in base
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        kw = dict(
            threshold=0.95, n_planes=16, bands=8, dim=4, max_bucket=20
        )
        # every bucket holds >= 30 identical-vector members > max_bucket
        assert embedding_neardup_pairs(df, **kw).count() == 0
        got = {
            (p["id_a"], p["id_b"])
            for p in embedding_neardup_pairs(
                df, collapse_exact=True, **kw
            ).collect()
        }
        # min-id representatives of the two near-dup groups
        assert got == {(0, 1)}

    def test_embedding_neardup_collapse_cache_released(self, spark):
        """r7 optimization pin: collapse_exact persists the collapsed
        representative frame (it feeds the auto_bits count, the banding
        scan AND both verify joins — four recomputes of the collapse
        shuffle without it) and must expose the persist through the
        repo-standard release handle so no cache outlives the caller."""
        from energy_pandas_spark.util import release_caches

        spark.catalog.clearCache()
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),  # exact copy of 0 -> collapses
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = embedding_neardup_pairs(
            df, threshold=0.95, n_planes=16, bands=8, dim=4,
            collapse_exact=True,
        )
        caches = getattr(out, "_eps_caches", ())
        assert len(caches) == 1, "collapse path must attach its persist"
        assert out.count() >= 1  # (0, 1) survives over representatives
        jcm = spark._jsparkSession.sharedState().cacheManager()
        assert not jcm.isEmpty()
        release_caches(out)
        assert jcm.isEmpty(), "release handle must drop the collapse cache"
        # no-collapse path attaches nothing
        lazy = embedding_neardup_pairs(
            df, threshold=0.95, n_planes=16, bands=8, dim=4
        )
        assert getattr(lazy, "_eps_caches", ()) == ()

    def test_embedding_neardup_auto_bits(self, spark):
        """r7 capacity fix: fixed band-key bits degenerate every
        bucket once uniques outgrow 2^bits * max_bucket; auto_bits
        grows the key width with measured cardinality, and exact-dup
        (cosine 1.0) pairs survive at ANY width (identical sign
        patterns share every bucket)."""
        import numpy as np

        rng = np.random.default_rng(11)
        X = rng.standard_normal((400, 8))
        rows = [(i, [float(x) for x in X[i]]) for i in range(400)]
        rows.append((1000, rows[0][1]))  # planted exact dup of vec 0
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        # 1 bit/band -> 2 buckets/band -> all ~200-member buckets
        # exceed max_bucket=50 -> the planted pair is silently lost
        kw = dict(threshold=0.999, bands=4, dim=8, max_bucket=50)
        assert (
            embedding_neardup_pairs(df, n_planes=4, **kw).count() == 0
        )
        got = {
            (p["id_a"], p["id_b"])
            for p in embedding_neardup_pairs(
                df, n_planes=4, auto_bits=True, **kw
            ).collect()
        }
        assert (0, 1000) in got


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        X = rng.standard_normal((200, 16))
        return spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(200)],
            "vec_id long, embedding array<double>",
        )

    def test_topk_self_is_rank1(self, emb):
        queries = emb.limit(3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        out = cosine_topk(emb, queries, k=3).collect()
        r1 = {r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1}
        assert all(q == v for q, v in r1.items())  # self-similarity = 1.0
        assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in out if r["rank"] == 1)

    def test_arrow_topk_matches_jvm_path(self, emb):
        from energy_pandas_spark.operators.similarity import cosine_topk_arrow

        queries = emb.limit(5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        jvm = sorted(map(tuple, cosine_topk(emb, queries, k=4).collect()))
        blas = sorted(map(tuple, cosine_topk_arrow(emb, queries, k=4).collect()))
        assert jvm == blas

    def test_ivf_contains_self(self, emb):
        queries = emb.limit(3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        out = ivf_topk(emb, queries, k=3, n_cells=4, nprobe=2).collect()
        r1 = {r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1}
        assert all(q == v for q, v in r1.items())


class TestText:
    def test_token_count(self, docs):
        out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
        assert out[0] == 12 and out[6] == 0

    def test_quality_bounds(self, docs):
        out = quality_score(docs).select("quality").collect()
        assert all(0.0 <= r["quality"] <= 1.0 for r in out)

    def test_language_id(self, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
        assert out[0] == "en" and out[3] == "de" and out[4] == "fr"
        assert out[6] == "und"  # empty text

    def test_script_mix(self, spark):
        from energy_pandas_spark.operators.text import script_mix

        texts = [
            (0, "hello world"),
            (1, "привет мир hello"),       # cyrillic-dominant mix
            (2, "你好世界"),
            (3, None),
            (4, "123 !@#"),
            (5, "mixed 混合 текст"),        # latin/cyr tie -> latin
            (6, "こんにちは カタカナ"),      # hiragana+katakana = kana
            (7, "ꦗꦮ"),                     # Javanese: outside the classes
            (8, "٣٣٣ a"),                  # Arabic-Indic DIGITS + 1 letter
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r.doc_id: r for r in script_mix(df).collect()}
        assert got[0].dominant_script == "latin"
        assert got[0].script_purity_permille == 1000
        assert got[1].dominant_script == "cyrillic"
        assert got[1].n_cyrillic == 9 and got[1].n_latin == 5
        assert got[1].script_purity_permille == 9000 // 14
        assert got[2].dominant_script == "han" and got[2].n_han == 4
        assert got[3].dominant_script == "none"
        assert got[3].script_purity_permille == 0 and got[3].n_letters == 0
        assert got[4].dominant_script == "none"
        # exact latin/cyrillic tie: first class in SCRIPT_CLASSES wins
        assert got[5].n_latin == got[5].n_cyrillic == 5
        assert got[5].dominant_script == "latin"
        assert got[6].dominant_script == "kana"
        # unclassified letters land in n_script_other and can dominate
        assert got[7].dominant_script == "other"
        assert got[7].n_script_other == 2 == got[7].n_letters
        # script DIGITS are not letters: they must not count, push
        # n_script_other negative, or flip dominance
        assert got[8].n_arabic == 0 and got[8].n_letters == 1
        assert got[8].dominant_script == "latin"
        assert got[8].n_script_other == 0
        assert got[8].script_purity_permille == 1000


class TestMultimodal:
    def test_decode_features_deterministic(self, spark):
        df = media_table(
            spark.createDataFrame(
                [(0, b"payload-a"), (1, b"payload-b"), (2, b"payload-a")],
                "media_id long, content binary",
            )
        )
        out = {r["media_id"]: r["features"] for r in decode_features(df, dim=8).collect()}
        assert len(out[0]) == 8
        assert out[0] == out[2]  # same content -> same features
        assert out[0] != out[1]

    def test_strict_raises(self, spark):
        from py4j.protocol import Py4JJavaError

        df = media_table(
            spark.createDataFrame([(0, b"x")], "media_id long, content binary")
        )
        with pytest.raises(Exception, match="NotImplementedError|no decoder"):
            decode_features(df, strict=True).collect()

    def test_frame_sample_plan(self, spark):
        df = spark.createDataFrame(
            [(0, b"", ("video/mp4", None, None, 3500))],
            "media_id long, content binary, "
            "meta struct<mime string, width int, height int, duration_ms long>",
        )
        out = frame_sample_plan(df, every_ms=1000).collect()
        assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]


class TestStreamingSemantics:
    def test_windowed_agg_batch_streaming_parity(self, spark, tmp_path, sf_dir):
        """The SAME windowed_aggregate definition over a readStream file
        source (availableNow) must equal the batch result."""
        from energy_pandas_spark.sources.readers import load_table
        from energy_pandas_spark.streaming.events import stream_events

        ev = load_table(spark, sf_dir, "events")
        # write a clean (µs-timestamp) copy for the stream source
        src = str(tmp_path / "events_stream")
        ev.write.parquet(src)
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in windowed_aggregate(ev, "1 hour").collect()
        }
        stream = stream_events(spark, src)
        q = (
            windowed_aggregate(stream, "1 hour")
            .writeStream.format("memory")
            .queryName("wagg")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
            for r in spark.sql("select * from wagg").collect()
        }
        assert got == batch

    def test_sessionize_batch(self, spark, sf_dir):
        from energy_pandas_spark.sources.readers import load_table

        ev = load_table(spark, sf_dir, "events")
        out = sessionize(ev, "30 minutes")
        total = out.agg(F.sum("n_events")).collect()[0][0]
        assert total == ev.count()  # every event lands in exactly one session


def test_dedup_incremental(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.dedup import dedup_incremental

    store = spark.createDataFrame(
        [("known text",)], "text string"
    ).select(F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias("digest"))
    new = spark.createDataFrame(
        [
            (10, "known   text"),   # dup of store (normalization collapses ws)
            (11, "fresh text"),
            (12, "fresh text"),     # in-batch dup of 11
            (13, "other"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_incremental(new, store).collect())
    assert kept == [11, 13]


def test_edit_distance_lsh_candidates_subset_of_exact(spark, sf_dir):
    """The LSH-accelerated fuzzy matcher may only MISS pairs (bounded
    by the shingle-Jaccard recall guarantee), never invent them; on the
    near-identical dup pairs planted in the corpus it finds the same
    close pairs as brute force."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.dedup import edit_distance_pairs
    from energy_pandas_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_pairs(
            docs, max_distance=10, prefix_len=80, method="exact"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_pairs(
            docs, max_distance=10, prefix_len=80, method="lsh"
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, d in lsh.items():
        assert exact[k] == d
    # the planted near-identical dups (distance 0-2) must all be found
    close_exact = {k for k, d in exact.items() if d <= 2}
    close_lsh = {k for k, d in lsh.items() if d <= 2}
    assert close_exact == close_lsh


def test_ivf_index_persist_and_search(spark, sf_dir, tmp_path):
    """Persisted IVF index: probe scan prunes to the probed cell
    directories, and search results match in-memory ivf_topk with the
    same centroids."""
    import os

    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_search,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") % 100 == 3)
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=8)
    assert os.path.isdir(idx + "/cells") and os.path.isdir(idx + "/centroids")
    # hive layout: one directory per cell
    cell_dirs = [d for d in os.listdir(idx + "/cells") if d.startswith("cell=")]
    assert len(cell_dirs) >= 4

    got = ivf_search(spark, idx, queries, k=3, nprobe=4).collect()
    assert len(got) == 15  # 5 queries x k=3
    # each query's own vector is its best match at cosine ~1
    best = {r.query_id: (r.vec_id, r.cosine) for r in got if r.rank == 1}
    for qid, (vid, cos) in best.items():
        assert vid == qid and cos > 0.999
    # recall vs exact brute force at same k
    exact = cosine_topk(emb, queries, k=3).collect()
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    got_set = {(r.query_id, r.vec_id) for r in got}
    assert len(got_set & exact_set) / len(exact_set) >= 0.6


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style)
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_near_dup_keeps_distinct(spark):
    from energy_pandas_spark.operators.dedup import (
        assign_semantic_clusters,
        semantic_dedup,
        semantic_dedup_pairs,
    )

    # two tight groups along orthogonal axes + one isolated vector;
    # centroids seeded from ids 0 and 1 put the groups in different
    # clusters, so the cross-group pair is never compared.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0, 0.0]),   # near-dup of 0
        (3, [0.05, 0.99, 0.0, 0.0]),  # near-dup of 1
        (4, [0.0, 0.0, 1.0, 0.0]),    # isolated (assigned somewhere, no dup)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = assign_semantic_clusters(df, n_centroids=2)
    by_id = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert by_id[2] == by_id[0] and by_id[3] == by_id[1]
    assert by_id[0] != by_id[1]

    pairs = semantic_dedup_pairs(df, n_centroids=2, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, 2), (1, 3)}

    kept = sorted(r["vec_id"] for r in semantic_dedup(df, n_centroids=2, threshold=0.9).collect())
    assert kept == [0, 1, 4]


def test_semantic_dedup_pairs_one_cluster_shuffle(spark):
    from energy_pandas_spark.operators.dedup import semantic_dedup_pairs

    df = spark.createDataFrame(
        [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.1]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    plan = semantic_dedup_pairs(df, n_centroids=3)._jdf.queryExecution().executedPlan().toString()
    # centroid assignment must not add an exchange of its own: the only
    # exchanges are the cluster groupBy and the two pair-verify joins.
    assert plan.count("Exchange") <= 6


def test_end_to_end_corpus_pipeline_shuffle_budget(spark):
    """The composed cleaning pipeline — classifier gate -> span-dedup
    filter -> token stats — must stay within a fixed shuffle budget
    when chained into ONE plan: operators may not sneak per-stage
    global sorts or unkeyed windows in when composed."""
    from energy_pandas_spark.operators.text import (
        classifier_score,
        span_dedup_filter,
        token_count,
    )

    rows = [(i, f"tok{i % 7} common words for doc {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = classifier_score(df).filter("score > -1.0")
    kept = span_dedup_filter(
        scored.select("doc_id", "text"), k=4, max_dup_frac=0.9
    )
    final = kept.withColumn("n_tokens", token_count("text"))
    plan = final._jdf.queryExecution().executedPlan().toString()
    # textual count includes the persisted span-stream subtree (it
    # executes once); the invariants that matter at scale: no global
    # sort, no single-partition funnel, no cross product
    assert plan.count("Exchange") <= 14
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert final.count() == 50


def test_crosscorpus_neardup_only_cross_pairs(spark, docs):
    from energy_pandas_spark.operators.dedup import crosscorpus_neardup_pairs

    new = docs.filter("doc_id >= 3")      # de, fr, distinct, empty
    store = docs.filter("doc_id < 3")     # dup pair 0/1, near-dup 2
    got = crosscorpus_neardup_pairs(
        new, store, threshold=0.3, shingle_size=3
    ).collect()
    # nothing in the new slice resembles the store -> empty, and never
    # any within-side pair
    assert got == []

    # now make the split cut across the duplicate cluster
    new2, store2 = docs.filter("doc_id IN (1, 2)"), docs.filter("doc_id = 0")
    pairs = {
        (r["id_new"], r["id_store"])
        for r in crosscorpus_neardup_pairs(
            new2, store2, threshold=0.3
        ).collect()
    }
    assert (1, 0) in pairs  # exact dup across the split
    assert all(b == 0 for _, b in pairs)


def test_crosscorpus_id_collision_across_sides(spark, docs):
    """The single-pass tagged-union banding keys signatures on
    (side, id): an id value reused by BOTH corpora must stay two
    separate documents (the r7 restructure's collision-safety
    property), not merge into one shared signature."""
    from energy_pandas_spark.operators.dedup import crosscorpus_neardup_pairs

    # store doc 0 reuses id 1, which also exists in the new slice with
    # UNRELATED text; new doc 1 is an exact dup of store "1"'s text only
    # through the genuine pairing (1 <- 0's text renamed)
    new = docs.filter("doc_id IN (1, 2)")
    store = docs.filter("doc_id = 0").selectExpr(
        "CAST(1 AS BIGINT) AS doc_id", "text"
    )
    pairs = {
        (r["id_new"], r["id_store"], r["jaccard_micro"])
        for r in crosscorpus_neardup_pairs(
            new, store, threshold=0.3
        ).collect()
    }
    # docs 0 and 1 are exact dups in the fixture: the cross pair must
    # surface with jaccard 1.0 despite the id collision
    assert (1, 1, 1_000_000) in pairs
    assert all(b == 1 for _, b, _ in pairs)


def test_crosscorpus_with_persisted_band_store(spark, docs, tmp_path):
    """Precomputed band store must give identical pairs to direct
    banding — the once-per-epoch store pattern."""
    from energy_pandas_spark.operators.dedup import (
        build_band_store,
        crosscorpus_neardup_pairs,
        load_band_store,
    )

    new, store = docs.filter("doc_id IN (1, 2)"), docs.filter("doc_id = 0")
    direct = sorted(
        map(tuple, crosscorpus_neardup_pairs(new, store, threshold=0.3).collect())
    )
    path = str(tmp_path / "bands")
    build_band_store(store, path)
    via_store = sorted(
        map(
            tuple,
            crosscorpus_neardup_pairs(
                new,
                store,
                threshold=0.3,
                store_bands=load_band_store(spark, path),
            ).collect(),
        )
    )
    assert via_store == direct and len(direct) >= 1


def test_ivf_distributed_trainer_recall(spark, sf_dir):
    """ML-KMeans-trained centroids (full-corpus, cosine distance) keep
    the same recall bound as the sample trainer and the same downstream
    plan (assign/probe unchanged)."""
    import numpy as np
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_centroids_distributed,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent = train_centroids_distributed(emb, n_cells=8, iters=5)
    assert cent.shape[0] == 8
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)  # unit contract

    queries = (
        emb.filter(F.col("vec_id") % 100 == 3)
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    got = ivf_topk(emb, queries, k=3, n_cells=8, nprobe=4, centroids=cent).collect()
    best = {r.query_id: (r.vec_id, r.cosine) for r in got if r.rank == 1}
    for qid, (vid, cos) in best.items():
        assert vid == qid and cos > 0.999  # own vector always found
    exact = {(r.query_id, r.vec_id) for r in cosine_topk(emb, queries, k=3).collect()}
    assert len({(r.query_id, r.vec_id) for r in got} & exact) / len(exact) >= 0.6


def test_dedup_keep_best_prefers_quality_then_lowest_id(spark):
    from energy_pandas_spark.operators.dedup import dedup_keep_best

    rows = [
        (0, "same content here", 3),
        (1, "same content here", 7),   # best copy of the group
        (2, "same content here", 7),   # quality tie -> loses to id 1
        (3, "unique document", 2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, quality long")
    out = {r["doc_id"]: (r["quality"], r["n_copies"])
           for r in dedup_keep_best(df, "quality").collect()}
    assert out == {1: (7, 3), 3: (2, 1)}
    # single digest shuffle, no window
    plan = dedup_keep_best(df, "quality")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Window" not in plan


# ---------------------------------------------------------------------------
# product quantization (ADC search over int codes)
# ---------------------------------------------------------------------------


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    """Codes are (m) int16 in [0, k); encoding is rerun-stable."""
    from energy_pandas_spark.operators.similarity import pq_encode, train_pq
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=8, k=16)
    assert books.shape == (8, 16, 8)  # 64-dim corpus
    enc = pq_encode(emb, books).collect()
    assert len(enc) == emb.count()
    for r in enc[:20]:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
    again = pq_encode(load_table(spark, sf_dir, "embeddings"), books).collect()
    assert sorted((r.vec_id, tuple(r.codes)) for r in enc) == sorted(
        (r.vec_id, tuple(r.codes)) for r in again
    )


def test_pq_exact_on_codebook_vectors(spark):
    """Vectors that ARE codebook centroids reconstruct losslessly, so
    ADC ranks them exactly: each query's top-1 is itself."""
    import numpy as np

    from energy_pandas_spark.operators.similarity import pq_encode, pq_topk

    rng = np.random.default_rng(7)
    m, k, dsub = 4, 8, 4
    books = rng.normal(size=(m, k, dsub))
    # rows assembled from one centroid per subspace, then normalized --
    # normalization keeps the subvector *directions*, and our codebooks
    # are trained on normalized vectors, so re-derive books from the
    # normalized rows to make reconstruction exact
    rows = []
    for i in range(k):  # k distinct rows: picks wrap at k, more would duplicate
        picks = [(i + j) % k for j in range(m)]
        v = np.concatenate([books[j][picks[j]] for j in range(m)])
        rows.append(v / np.linalg.norm(v))
    X = np.array(rows)
    # codebooks containing exactly the normalized rows' subvectors
    books2 = np.zeros((m, len(X), dsub))
    for j in range(m):
        books2[j] = X[:, j * dsub : (j + 1) * dsub]
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    queries = df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    enc = pq_encode(df, books2)
    out = pq_topk(enc, queries, books2, k=1).collect()
    r1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
    assert all(q == v for q, v in r1.items())


def test_pq_recall_vs_exact(spark, sf_dir):
    """ADC top-k on sf embeddings overlaps exact cosine top-k: recall@5
    >= 0.5 with a 16x compressed index (8 int16 codes vs 64 floats)."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        cosine_topk,
        pq_recall_topk,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") % 97 == 1)
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    approx = pq_recall_topk(emb, queries, k=5, m=8, n_codes=32).collect()
    exact = cosine_topk(emb, queries, k=5).collect()
    approx_set = {(r.query_id, r.vec_id) for r in approx}
    exact_set = {(r.query_id, r.vec_id) for r in exact}
    assert len(approx) == len(exact)
    assert len(approx_set & exact_set) / len(exact_set) >= 0.5


# ---------------------------------------------------------------------------
# distributed quality-classifier training (DataFrame-native logistic
# regression over hashed features)
# ---------------------------------------------------------------------------


def _labeled_quality_corpus(spark):
    rows = []
    good = ["clean prose with varied words and structure",
            "another well formed document about engines",
            "measured discussion of storage formats here",
            "careful analysis of query planning today"]
    bad = ["buy now spam spam click here spam",
           "spam click spam buy spam now spam",
           "click click spam offer spam buy buy",
           "spam offer click now buy spam click"]
    for i, t in enumerate(good):
        rows.append((i, t, 1))
    for i, t in enumerate(bad):
        rows.append((100 + i, t, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_trains_to_separation(spark):
    from energy_pandas_spark.operators.text import (
        score_with_weights,
        train_text_classifier,
    )

    labeled = _labeled_quality_corpus(spark)
    weights, bias = train_text_classifier(
        labeled, n_features=512, iters=40, lr=4.0
    )
    scored = score_with_weights(
        labeled, weights, bias, n_features=512
    ).collect()
    preds = {r.doc_id: r.label_pred for r in scored}
    truth = {r.doc_id: r.label for r in labeled.collect()}
    assert preds == truth  # linearly separable by construction
    # unseen docs built from the same vocabulary generalize
    holdout = spark.createDataFrame(
        [(900, "varied prose about query engines"),
         (901, "spam buy click now offer")],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.label_pred for r in
         score_with_weights(holdout, weights, bias, n_features=512).collect()}
    assert h[900] == 1 and h[901] == 0


def test_classifier_scoring_is_codegen_only(spark):
    """The inference path must stay JVM-side: no Python workers in the
    scoring plan (training may use driver numpy, scoring may not)."""
    from energy_pandas_spark.operators.text import score_with_weights

    labeled = _labeled_quality_corpus(spark)
    w = spark.createDataFrame([(1, 0.5), (7, -0.25)], "bucket int, weight double")
    plan = (
        score_with_weights(labeled, w, 0.1, n_features=512)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classifier_empty_doc_gets_bias_score(spark):
    import math

    from energy_pandas_spark.operators.text import score_with_weights

    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    w = spark.createDataFrame([(3, 9.9)], "bucket int, weight double")
    r = score_with_weights(df, w, bias=-2.0, n_features=64).collect()[0]
    assert abs(r.score - round(1 / (1 + math.exp(2.0)), 6)) < 1e-9
    assert r.label_pred == 0


def test_classifier_sample_trainer_matches_distributed(spark):
    """The bounded-sample trainer and the distributed trainer optimize
    the same objective on the same data -> same predictions (the
    sample covers the whole tiny corpus here)."""
    from energy_pandas_spark.operators.text import (
        score_with_weights,
        train_text_classifier,
    )

    labeled = _labeled_quality_corpus(spark)
    w_d, b_d = train_text_classifier(labeled, n_features=512, iters=40, lr=4.0)
    w_s, b_s = train_text_classifier(
        labeled, n_features=512, iters=40, lr=4.0, trainer="sample"
    )
    pd_ = {r.doc_id: r.label_pred for r in
           score_with_weights(labeled, w_d, b_d, n_features=512).collect()}
    ps_ = {r.doc_id: r.label_pred for r in
           score_with_weights(labeled, w_s, b_s, n_features=512).collect()}
    truth = {r.doc_id: r.label for r in labeled.collect()}
    assert pd_ == truth and ps_ == truth
    # the two trainers agree numerically too (same GD, same order-free
    # float sums up to aggregation order; compare loosely)
    wd = {r.bucket: r.weight for r in w_d.collect()}
    ws = {r.bucket: r.weight for r in w_s.collect()}
    assert set(wd) == set(ws)
    assert all(abs(wd[k] - ws[k]) < 1e-6 for k in wd)
    assert abs(b_d - b_s) < 1e-6


def test_ivf_append_then_search_finds_new_vectors(spark, sf_dir, tmp_path):
    """Append-per-batch index growth: vectors appended after the build
    are immediately searchable; their self-query ranks them first."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_search,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / "ivf-inc")
    build_ivf_index(first, idx, n_cells=8)
    append_ivf_index(second, idx)

    queries = second.limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ivf_search(spark, idx, queries, k=3, nprobe=4).collect()
    best = {r.query_id: (r.vec_id, r.cosine) for r in got if r.rank == 1}
    assert len(best) == 4
    for qid, (vid, cos) in best.items():
        assert vid == qid and cos > 0.999


def test_corpus_report_hand_computed(spark):
    from energy_pandas_spark.operators.pipeline import corpus_report

    df = spark.createDataFrame(
        [
            (0, "a b c", "en", "s1"),
            (1, "a  B c", "en", "s1"),   # same normalized content as 0
            (2, "d e", "fr", "s2"),
            (3, "", "en", "s2"),         # empty
        ],
        "doc_id long, text string, lang string, source string",
    )
    r = corpus_report(df).collect()[0]
    assert r.n_docs == 4 and r.total_tokens == 8 and r.n_empty_docs == 1
    assert r.n_unique_contents == 3  # docs 0/1 collapse
    assert r.n_langs == 2 and r.n_sources == 2
    assert r.dup_ratio == round(1 / 4, 6)
    assert r.avg_tokens == 2.0


def test_ivfpq_index_build_and_search(spark, sf_dir, tmp_path):
    """Persisted IVF-PQ: partition-pruned probe + ADC + exact rerank
    from vectors stored in the index; recall holds against brute force
    and each query's own vector ranks first."""
    import os

    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        build_ivfpq_index,
        cosine_topk,
        ivfpq_search,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx, n_cells=8, m=8, n_codes=32)
    for part in ("cells", "centroids", "codebooks"):
        assert os.path.isdir(f"{idx}/{part}")

    queries = (
        emb.filter(F.col("vec_id") % 101 == 5)
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    got = ivfpq_search(spark, idx, queries, k=3, nprobe=4, refine=4).collect()
    assert len(got) == 15
    best = {r.query_id: (r.vec_id, r.cosine) for r in got if r.rank == 1}
    for qid, (vid, cos) in best.items():
        assert vid == qid and cos > 0.999
    exact = cosine_topk(emb, queries, k=3).collect()
    overlap = {(r.query_id, r.vec_id) for r in got} & {
        (r.query_id, r.vec_id) for r in exact
    }
    assert len(overlap) / len(exact) >= 0.6


def test_ivfpq_minimal_index_without_vectors(spark, sf_dir, tmp_path):
    """keep_vectors=False: the index holds only codes; search returns
    ADC-ranked results (no rerank source) and still finds self."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_search,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq-min")
    build_ivfpq_index(emb, idx, n_cells=4, m=8, n_codes=32, keep_vectors=False)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ivfpq_search(spark, idx, queries, k=3, nprobe=3).collect()
    assert len(got) == 9
    r1 = {r.query_id: r.vec_id for r in got if r.rank == 1}
    assert all(q == v for q, v in r1.items())


def test_pq_distributed_trainer_recall(spark, sf_dir):
    """Distributed (pyspark.ml per-subspace KMeans) codebooks hold the
    same recall bound as the sample trainer and share the (m, k, dsub)
    contract end-to-end."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        cosine_topk,
        pq_recall_topk,
        train_pq_distributed,
    )
    from energy_pandas_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq_distributed(emb, m=8, k=16)
    assert books.shape == (8, 16, 8)
    queries = (
        emb.filter(F.col("vec_id") % 97 == 1)
        .limit(5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    approx = pq_recall_topk(emb, queries, k=5, codebooks=books).collect()
    exact = cosine_topk(emb, queries, k=5).collect()
    overlap = {(r.query_id, r.vec_id) for r in approx} & {
        (r.query_id, r.vec_id) for r in exact
    }
    assert len(overlap) / len(exact) >= 0.5


def test_corpus_diff_statuses(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.pipeline import corpus_diff, corpus_diff_stats

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA  "), (4, ""), (5, "delta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    # 3: normalization folds case/whitespace -> unchanged; 4: NULL and
    # empty normalize to the same digest -> unchanged
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "unchanged",
        4: "unchanged",
        5: "added",
    }
    changed = corpus_diff(
        old, new.withColumn("text", F.concat_ws("", F.col("text"), F.lit("!")))
    ).collect()
    assert {r.doc_id: r.status for r in changed}[2] == "changed"
    stats = {r.status: r.n for r in corpus_diff_stats(old, new).collect()}
    assert stats == {"removed": 1, "unchanged": 3, "added": 1}


def test_minhash_cluster_stats_hand_built(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.dedup import minhash_cluster_stats

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base), (2, base), (3, base + " extra"),          # one 3-cluster
        (4, "completely different words live in this one"),
        (5, "completely different words live in this one"),  # one 2-cluster
        (6, "a singleton document with its very own text body"),
        (7, "another lonely unique document body here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in minhash_cluster_stats(df, threshold=0.5, bands=32).collect()
    }
    assert got == {1: (2, 2), 2: (1, 2), 3: (1, 3)}


def test_hard_negative_topk_excludes_same_label(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        cosine_topk,
        hard_negative_topk,
    )

    rows = [
        (i, [float(i % 4 == j) + 0.1 * j for j in range(4)], i % 3)
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    got = hard_negative_topk(corpus, q, k=4).collect()
    labels = {r.vec_id: r.label for r in corpus.collect()}
    for r in got:
        assert labels[r.vec_id] != r.query_id % 3  # query i has label i%3
    # ranks contiguous per query
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    # agreement with plain cosine_topk on the allowed subset
    allowed = corpus.filter(F.col("label") != 0)  # query 0 has label 0
    plain = {
        (r.vec_id, r.rank)
        for r in cosine_topk(
            allowed, q.filter(F.col("query_id") == 0).drop("query_label"), k=4
        ).collect()
    }
    hard = {(r.vec_id, r.rank) for r in got if r.query_id == 0}
    assert hard == plain


def test_whiten_embeddings_standardizes(spark):
    import math

    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import (
        embedding_dim_stats,
        whiten_embeddings,
    )

    # dim 0 dominates (scale 100), dim 1 has an offset, dim 2 is dead
    rows = [(i, [100.0 * i, 5.0 + 0.1 * i, 7.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert set(stats) == {0, 1, 2}
    assert stats[2].std == 0.0  # dead dimension detected
    assert stats[1].mean == round(5.0 + 0.1 * (19 / 2), 6)

    white = whiten_embeddings(df)
    import numpy as np

    X = np.array([r.embedding for r in white.orderBy("vec_id").collect()])
    # live dims standardize to mean ~0, population std ~1
    for d in (0, 1):
        assert abs(X[:, d].mean()) < 1e-6
        assert abs(X[:, d].std() - 1.0) < 1e-3
    # dead dim centers to 0 without dividing by zero
    assert np.allclose(X[:, 2], 0.0)
    # idempotent shape: output column replaces the input by default
    assert white.columns == df.columns


def test_distribution_shift_ks(spark):
    from energy_pandas_spark.operators.pipeline import distribution_shift

    old = spark.createDataFrame(
        [(i, v) for i, v in enumerate([1, 1, 2, 3, 4])], "doc_id long, x long"
    )
    # identical distribution -> ks = 0
    same = distribution_shift(old, old, "x").collect()[0]
    assert same.ks_stat == 0.0 and same.n_old == same.n_new == 5
    # fully shifted -> ks = 1, attained at the old support's top
    new = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 11, 12])], "doc_id long, x long"
    )
    far = distribution_shift(old, new, "x").collect()[0]
    assert far.ks_stat == 1.0 and far.at_value == 4
    # hand-computed partial shift: old {1,1,2,3,4}, new {2,3,4,4,5}
    new2 = spark.createDataFrame(
        [(i, v) for i, v in enumerate([2, 3, 4, 4, 5])], "doc_id long, x long"
    )
    mid = distribution_shift(old, new2, "x").collect()[0]
    # cdfs at v=1: .4 vs 0 -> gap .4 (the max)
    assert mid.ks_stat == 0.4 and mid.at_value == 1
    # NULLs are excluded
    withnull = old.union(
        spark.createDataFrame([(9, None)], "doc_id long, x long")
    )
    assert distribution_shift(withnull, old, "x").collect()[0].ks_stat == 0.0


def test_corpus_delta_patch_round_trip(spark):
    """patch(old, delta(old, new)) == new, and the delta ships only the
    non-unchanged rows."""
    import random

    from energy_pandas_spark.operators.pipeline import (
        corpus_delta,
        corpus_patch,
    )

    rng = random.Random(42)
    old_rows = [(i, f"doc {i} body {rng.randint(0, 9)}") for i in range(80)]
    new_rows = []
    for i, t in old_rows:
        r = rng.random()
        if r < 0.2:
            continue  # removed
        if r < 0.4:
            new_rows.append((i, t + " amended"))  # changed
        else:
            new_rows.append((i, t))  # unchanged
    new_rows += [(1000 + i, f"fresh {i}") for i in range(10)]  # added
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    delta = corpus_delta(old, new)
    by_status = {}
    for r in delta.collect():
        by_status.setdefault(r.status, []).append(r)
    assert set(by_status) <= {"added", "changed", "removed"}
    assert all(r.text is None for r in by_status.get("removed", []))
    assert all(r.text is not None for r in by_status.get("added", []))
    n_unchanged = len(new_rows) - len(by_status.get("added", [])) - len(
        by_status.get("changed", [])
    )
    assert delta.count() == len(old_rows) + len(new_rows) - 2 * n_unchanged - (
        len(by_status.get("changed", []))
    )

    rebuilt = corpus_patch(old, delta)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_corpus_patch_empty_delta_is_identity(spark):
    from energy_pandas_spark.operators.pipeline import (
        corpus_delta,
        corpus_patch,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    delta = corpus_delta(old, old)
    assert delta.count() == 0
    rebuilt = corpus_patch(old, delta)
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, old.collect())
    )


class TestNeardupEval:
    def _docs(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (1, base),
            (2, base),                               # j=1.0 with 1
            (3, base + " lambda mu"),                # high j with 1/2
            (4, "one two three four five six seven"),
            (5, "totally different words entirely here now"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_perfect_predictor_scores_1000(self, spark):
        from energy_pandas_spark.operators.dedup import (
            minhash_lsh_pairs,
            neardup_eval,
        )

        docs = self._docs(spark)
        pred = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=100)
        # sample = whole corpus
        card = neardup_eval(
            docs, pred, truth_threshold=(1, 2), sample_permille=1000
        ).collect()[0]
        assert card.n_sample == 5
        assert card.n_true_pairs == card.tp == card.n_pred_pairs
        assert card.fp == 0 and card.fn == 0
        assert card.precision_permille == 1000
        assert card.recall_permille == 1000
        assert card.n_true_pairs == 3  # (1,2), (1,3), (2,3)

    def test_misses_and_false_positives_counted(self, spark):
        from energy_pandas_spark.operators.dedup import neardup_eval

        docs = self._docs(spark)
        pred = spark.createDataFrame(
            [(1, 2), (1, 4)], "id_a long, id_b long"  # one hit, one junk
        )
        card = neardup_eval(
            docs, pred, truth_threshold=(1, 2), sample_permille=1000
        ).collect()[0]
        assert (card.tp, card.fp, card.fn) == (1, 1, 2)
        assert card.precision_permille == 500
        assert card.recall_permille == 333

    def test_pairs_outside_sample_ignored(self, spark):
        from energy_pandas_spark.operators.dedup import neardup_eval

        docs = self._docs(spark)
        # empty sample cut -> everything vacuous
        pred = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        card = neardup_eval(
            docs, pred, sample_permille=0
        ).collect()[0]
        assert card.n_sample == 0 and card.n_pred_pairs == 0
        assert card.precision_permille == 1000
        assert card.recall_permille == 1000

    def test_threshold_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.dedup import neardup_eval

        docs = self._docs(spark)
        pred = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with _pytest.raises(ValueError):
            neardup_eval(docs, pred, truth_threshold=(3, 2))

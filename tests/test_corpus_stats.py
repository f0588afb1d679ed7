"""Vocabulary / TF-IDF / n-gram / clean-corpus operators."""

from __future__ import annotations

import math

import pytest

from energy_pandas_spark.operators.pipeline import clean_corpus
from energy_pandas_spark.operators.text import (
    ngram_counts,
    term_frequencies,
    tfidf_top_terms,
    vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the log", "en"),
        (2, "cat cat cat", "en"),
        (3, "", "en"),
        (4, "unique", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_term_frequencies(spark, docs):
    tf = {
        (r.doc_id, r.term): r.tf for r in term_frequencies(docs).collect()
    }
    assert tf[(0, "the")] == 2
    assert tf[(2, "cat")] == 3
    assert (3, "") not in tf  # empty doc contributes nothing


def test_vocabulary_ordering(spark, docs):
    top = vocabulary(docs, top=3).collect()
    # doc_freq: the->2, sat->2, on->2, cat->2 ... tie-broken by term asc
    assert [r.term for r in top] == ["cat", "on", "sat"]
    assert top[0].doc_freq == 2 and top[0].total_count == 4


def test_tfidf_rank_is_integer_exact(spark, docs):
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 'cat' tf=3 dominates
    assert by_doc[2][0].term == "cat" and by_doc[2][0].tf == 3
    # score value: tf * ln(N/df) with N=5 distinct docs
    assert by_doc[2][0].tfidf == pytest.approx(3 * math.log(5 / 2))
    # ranks are 1..k with no gaps
    assert [r.rank for r in by_doc[0]] == [1, 2]


def test_ngram_counts_includes_short_docs(spark, docs):
    grams = {r.ngram: r.n for r in ngram_counts(docs, n=2, top=100).collect()}
    assert grams["the cat"] == 1
    assert grams["cat cat"] == 2
    assert grams["unique"] == 1  # < n tokens -> whole text as one shingle
    assert grams[""] == 1  # empty doc


def test_clean_corpus_dedups_and_filters(spark):
    text = "the quick brown fox jumps over a lazy dog and runs to that old market for it"
    rows = [
        (0, text, "en"),
        (1, text, "en"),  # exact duplicate -> dropped by keep-first
        (2, "der hund und die katze sind nicht auf dem markt heute hier", "de"),
        (3, "x y z", "en"),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    kept = clean_corpus(df, min_tokens=10).select("doc_id").collect()
    assert [r.doc_id for r in kept] == [0]  # dup 1 dropped, de dropped, short dropped


def test_sketch_stats_bounded_error(spark, sf_dir):
    """HLL/percentile sketches must land within their advertised error
    of the exact answers."""
    import __spark_entry__ as entrymod

    row = entrymod.corpus_sketch_stats(spark, sf_dir).first()
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    exact_terms = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    assert abs(row.approx_terms - exact_terms) <= max(3, 0.1 * exact_terms)
    ev = load_table(spark, sf_dir, "events")
    exact_p50 = ev.agg(F.expr("percentile(value, 0.5)")).first()[0]
    assert row.p50 == __import__("pytest").approx(exact_p50, rel=0.05)


def test_redact_pii_staged_counts(spark):
    from energy_pandas_spark.operators.text import redact_pii

    rows = [
        (0, "mail me at a.user+x@mail.example.org today"),
        (1, "server 192.168.0.1 and backup 10.0.0.2"),
        (2, "call +1 (415) 555-0134 now"),
        # an email whose digits must NOT feed the phone pattern
        (3, "u12345678901@example.com"),
        (4, "clean text, nothing to scrub"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[0].n_email == 1 and out[0].redacted == "mail me at <EMAIL> today"
    assert out[1].n_ip == 2 and out[1].redacted == "server <IP> and backup <IP>"
    assert out[2].n_phone == 1 and out[2].redacted == "call <PHONE> now"
    assert out[3].n_email == 1 and out[3].n_phone == 0
    assert out[3].redacted == "<EMAIL>"
    r4 = out[4]
    assert (r4.n_email, r4.n_ip, r4.n_phone) == (0, 0, 0)
    assert r4.redacted == r4.text


def test_redact_pii_is_shuffle_free(spark):
    from energy_pandas_spark.operators.text import redact_pii

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_contamination_overlap(spark):
    from energy_pandas_spark.operators.text import contamination_overlap

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),      # fully contained
            (1, "zeta eta theta iota"),          # disjoint
            (2, "alpha beta gamma delta kappa"), # 2 grams, 1 hits
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination_overlap(train, bench, n=4, threshold=0.5).collect()
    }
    assert out[0].n_grams == 1 and out[0].n_hits == 1 and out[0].contaminated
    assert out[1].n_hits == 0 and not out[1].contaminated
    assert out[2].n_grams == 2 and out[2].n_hits == 1
    assert out[2].overlap == pytest.approx(0.5) and out[2].contaminated


def test_repetition_stats(spark):
    from energy_pandas_spark.operators.text import repetition_stats

    rows = [
        (0, "a a a a a a"),        # all 2-grams identical; 5-grams duplicated
        (1, "a b c d e f"),        # no repetition at all
        (2, "x y x y x y x y"),    # alternating: "x y" dominates 2-grams
        (3, "one"),                # < n tokens: single whole-text gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[0].n_top_grams == 5 and out[0].top_gram_frac == 1.0
    assert out[0].n_dup_grams == 2 and out[0].dup_gram_frac == 1.0
    assert out[1].top_gram_frac == pytest.approx(0.2)  # 5 distinct 2-grams
    assert out[1].dup_gram_frac == 0.0
    assert out[2].top_gram_count == 4 and out[2].n_top_grams == 7
    assert out[3].n_top_grams == 1 and out[3].n_dup_grams == 1
    assert out[3].top_gram_frac == 1.0 and out[3].dup_gram_frac == 0.0


def test_repetition_stats_single_scan(spark):
    """Both gram sizes must come off ONE scan of the text column."""
    from energy_pandas_spark.operators.text import repetition_stats

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1 and "Join" not in plan


def test_pack_sequences_by_key(spark):
    from energy_pandas_spark.operators.packing import pack_sequences

    rows = [  # (doc_id, grp, n_tokens)
        (0, "g1", 4),
        (1, "g1", 4),
        (2, "g1", 5),   # starts at 8, spans the 10-token boundary
        (3, "g1", 10),  # starts at 13 -> seq 1 offset 3, spans into seq 2
        (4, "g2", 3),   # other group packs independently
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tokens long")
    out = {
        r.doc_id: r
        for r in pack_sequences(df, "n_tokens", budget=10, by="grp").collect()
    }
    assert (out[0].seq_id, out[0].seq_offset, out[0].n_seqs) == (0, 0, 1)
    assert (out[1].seq_id, out[1].seq_offset, out[1].n_seqs) == (0, 4, 1)
    assert (out[2].seq_id, out[2].seq_offset, out[2].n_seqs) == (0, 8, 2)
    assert (out[3].seq_id, out[3].seq_offset, out[3].n_seqs) == (1, 3, 2)
    assert (out[4].seq_id, out[4].seq_offset, out[4].n_seqs) == (0, 0, 1)
    assert out[4].pack_bucket == "g2"


def test_pack_sequences_hashed_single_shuffle(spark):
    from energy_pandas_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, 7) for i in range(100)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, "n_tokens", budget=16, n_buckets=4)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the bucket window's shuffle
    rows = packed.collect()
    # deterministic: same input -> same assignment on rerun
    again = {r.doc_id: (r.seq_id, r.seq_offset) for r in
             pack_sequences(df, "n_tokens", budget=16, n_buckets=4).collect()}
    for r in rows:
        assert again[r.doc_id] == (r.seq_id, r.seq_offset)
    # every sequence position is consistent: offsets within budget
    assert all(0 <= r.seq_offset < 16 for r in rows)


# ---------------------------------------------------------------------------
# hashed linear classifier + bigram LM scoring
# ---------------------------------------------------------------------------


def test_classifier_score_deterministic_and_bounded(spark):
    from energy_pandas_spark.operators.text import classifier_score

    df = spark.createDataFrame(
        [(0, "spark shuffles are expensive"), (1, ""), (2, "spark shuffles are expensive")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in classifier_score(df).collect()}
    assert rows[0]["score"] == rows[2]["score"]  # same text -> same score
    assert rows[1]["score"] == 0.0 and rows[1]["label_pred"] == 0
    assert -1.0 <= rows[0]["score"] <= 1.0


def test_classifier_score_micro_exact_at_decimal_half(spark):
    """The sf1-probe regression: this 25-token text hashes to
    S = -1608, so score = -1608/(1024*25) = -0.0628125 EXACTLY — a
    decimal half where Spark's round (HALF_UP) and DuckDB's round on
    doubles (ties-to-even) disagree in the 6th decimal. The shipped
    comparison column is therefore score_micro, pure integer
    (S * 1e6) div (1024 * n): assert both the exact micro value and
    its agreement with an independent Python integer replay."""
    import hashlib

    from energy_pandas_spark.operators.text import classifier_score

    text = (
        "merge agg filter window batch hash line spark table~7 sort~7 "
        "order filter small small order slow customer~7 window agg part "
        "window customer~7 key~7 line filter"
    )
    row = classifier_score(
        spark.createDataFrame([(0, text)], "doc_id long, text string")
    ).collect()[0]
    toks = text.split()
    s = sum(
        int(hashlib.md5(("clf-v1" + t).encode()).hexdigest()[:15], 16) % 2049
        - 1024
        for t in toks
    )
    assert s == -1608 and len(toks) == 25
    # trunc-toward-zero division (Spark `div` / DuckDB `//`); s < 0
    want_micro = -((-s * 1_000_000) // (1024 * len(toks)))
    assert row["score_micro"] == want_micro == -62812
    # the float column still carries the human-readable score
    assert row["score"] == -0.062813 or row["score"] == -0.062812


def test_classifier_score_single_agg_plan(spark):
    """One exploded hash aggregate + the id join — no HOF interpreter
    nodes in the hot path."""
    from energy_pandas_spark.operators.text import classifier_score

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = classifier_score(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final, one agg
    assert "aggregate(" not in plan  # no interpreted fold expression


def test_bigram_lm_score_known_counts(spark):
    from energy_pandas_spark.operators.text import bigram_lm_score, bigram_lm_train

    train = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    lm = bigram_lm_train(train)
    counts = {(r["w1"], r["w2"]): r["c12"] for r in lm.collect()}
    # bigrams: doc0 -> (a,b),(b,a),(a,b); doc1 -> (a,b),(b,c)
    assert counts == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    score = bigram_lm_score(
        spark.createDataFrame([(10, "a b"), (11, "z"), (12, "q q")], "doc_id long, text string"),
        lm,
    )
    got = {r["doc_id"]: r for r in score.collect()}
    # V = 2 (left contexts a, b); c1(a) = 3, so p(b|a) = (3+1)/(3+2)
    assert got[10]["n_bigrams"] == 1 and abs(got[10]["avg_p"] - 0.8) < 1e-6
    assert got[11]["n_bigrams"] == 0 and got[11]["avg_p"] == 0.0
    # unseen bigram with unseen context: p = 1/V = 1/2... (0+1)/(0+2)
    assert got[12]["n_bigrams"] == 1 and abs(got[12]["avg_p"] - 0.5) < 1e-6


def test_span_dup_stats_and_filter(spark):
    from energy_pandas_spark.operators.text import span_dedup_filter, span_dup_stats

    shared = "alpha beta gamma delta"  # 4-token span shared by docs 0 and 1
    rows = [
        (0, shared + " one two"),
        (1, shared + " three four"),
        (2, "totally different words here now ok"),
        (3, "tiny"),  # shorter than k -> no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dup_stats(df, k=4).collect()}
    # doc0: spans at pos 1..3; only 'alpha beta gamma delta' is shared
    assert got[0]["n_spans"] == 3 and got[0]["n_dup_spans"] == 1
    assert got[1]["n_spans"] == 3 and got[1]["n_dup_spans"] == 1
    assert got[2]["n_dup_spans"] == 0
    assert got[3]["n_spans"] == 0 and got[3]["dup_frac"] == 0.0

    kept = sorted(
        r["doc_id"]
        for r in span_dedup_filter(df, k=4, max_dup_frac=0.2).collect()
    )
    assert kept == [2, 3]


# ---------------------------------------------------------------------------
# mergeable sketch rollups (HLL distinct, KLL quantiles)
# ---------------------------------------------------------------------------


def test_sketch_rollup_matches_exact_within_bounds(spark, sf_dir):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.sketches import (
        cardinality_sketches,
        merge_cardinality,
        merge_quantiles,
        quantile_sketches,
    )
    from energy_pandas_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    # build fine-grained (type, day) sketches; merge up to per-type
    daily = cardinality_sketches(ev, "user_id", by=["event_type", "day"])
    per_type = merge_cardinality(daily, by="event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    joined = per_type.join(exact, "event_type").collect()
    assert len(joined) == 5
    for r in joined:
        assert abs(r["approx_distinct"] - r["exact"]) <= max(5, 0.05 * r["exact"])

    dq = quantile_sketches(ev, "value", by=["event_type", "day"])
    qt = merge_quantiles(dq, [0.5, 0.9], by="event_type")
    exact_q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    )
    for r in qt.join(exact_q, "event_type").collect():
        spread = ev.agg(F.max("value") - F.min("value")).first()[0]
        assert abs(r["q_50"] - r["p50"]) <= 0.05 * spread
        assert abs(r["q_90"] - r["p90"]) <= 0.05 * spread


def test_sketch_merge_associativity(spark):
    """Merging per-part sketches must equal sketching the whole — the
    property that makes incremental/hierarchical rollups sound."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.sketches import (
        cardinality_sketches,
        merge_cardinality,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 4).alias("part"), (F.col("id") % 997).alias("v")
    )
    via_parts = merge_cardinality(
        cardinality_sketches(df, "v", by="part"), by=None
    ).first()[0]
    direct = merge_cardinality(
        cardinality_sketches(df, "v", by=None).withColumn("g", F.lit(1)),
        by=None,
    ).first()[0]
    assert via_parts == direct


def test_vocab_index_and_encode_docs(spark):
    from energy_pandas_spark.operators.text import encode_docs, vocab_index

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, ""),
        (3, "zebra unknown words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = vocab_index(df, size=4)
    vmap = {r["term"]: r["token_id"] for r in vocab.collect()}
    # doc_freq: the->2, sat->2, then ties at 1 broken by term asc
    assert vmap["sat"] == 1 and vmap["the"] == 2  # sat < the alphabetically
    assert len(vmap) == 4 and min(vmap.values()) == 1

    enc = {r["doc_id"]: r["token_ids"] for r in encode_docs(df, vocab).collect()}
    # order preserved; OOV -> 0
    toks0 = "the cat sat on the mat".split()
    assert len(enc[0]) == len(toks0)
    assert enc[0][0] == vmap["the"] and enc[0][2] == vmap["sat"]
    assert enc[2] == []
    assert all(t == 0 for t in enc[3])  # none of doc 3's words in top-4... 
    # (unless a tie pulled one in; ensure consistency with the vocab)
    for t, tok in zip(enc[3], "zebra unknown words only".split()):
        assert t == vmap.get(tok, 0)


class TestZipfFit:
    def _py_ref(self, texts, quant=1024):
        import math
        from collections import Counter

        cnt = Counter(
            w for t in texts for w in (t or "").lower().split() if w
        )
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(ranked)
        xs = [round(quant * math.log(i + 1)) for i in range(n)]
        ys = [round(quant * math.log(c)) for _, c in ranked]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den
        intercept = (sy * sxx - sx * sxy) / den / quant
        return n, sum(cnt.values()), slope, intercept

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import zipf_fit

        texts = [
            "the the the the cat sat on the mat",
            "the cat and the dog",
            "a dog a cat a mat",
            "on and on and on",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        row = zipf_fit(df).collect()[0]
        n, tot, slope, intercept = self._py_ref(texts)
        assert row["n_terms"] == n
        assert row["total_tokens"] == tot
        # quantized-integer sums are exact; the only slack is a
        # possible 1-ulp ln() difference between JVM and libm
        assert abs(row["slope"] - slope) < 1e-9
        assert abs(row["intercept"] - intercept) < 1e-9
        assert row["slope"] < 0  # frequency falls with rank

    def test_partitioning_invariance_exact(self, spark):
        from energy_pandas_spark.operators.text import zipf_fit

        rows = [(i, f"w{i % 17} w{i % 5} w{i % 3} common") for i in range(300)]
        a = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        b = spark.createDataFrame(rows, "doc_id long, text string").repartition(23)
        ra = zipf_fit(a).collect()[0]
        rb = zipf_fit(b).collect()[0]
        assert tuple(ra) == tuple(rb)  # bit-exact, not approximate


class TestNgramNovelty:
    def _py_ref(self, docs, n=3):
        from collections import Counter

        def grams(t):
            toks = [w for w in (t or "").lower().split() if w]
            if len(toks) < n:
                return {" ".join(toks)}
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

        per_doc = {i: grams(t) for i, t in docs}
        df = Counter(g for gs in per_doc.values() for g in gs)
        out = {}
        for i, gs in per_doc.items():
            novel = sum(1 for g in gs if df[g] == 1)
            out[i] = (len(gs), novel, (1000 * novel) // len(gs))
        return out

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import ngram_novelty

        docs = [
            (0, "the cat sat on the mat"),
            (1, "the cat sat on the rug"),          # shares a prefix with 0
            (2, "completely original sentence here today"),
            (3, "the cat sat on the mat"),          # exact dup of 0
            (4, "short"),                            # < n tokens
            (5, ""),                                 # empty
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_grams"], r["novel"], r["novelty_pm"])
            for r in ngram_novelty(df).collect()
        }
        assert got == self._py_ref(docs)
        # the exact dup pair has zero novelty; the original doc is full
        assert got[0][1] == 0 and got[3][1] == 0
        assert got[2][2] == 1000

    def test_partitioning_invariance(self, spark):
        from energy_pandas_spark.operators.text import ngram_novelty

        rows = [(i, f"tok{i%7} tok{i%3} tok{i%11} tok{i%5} tail") for i in range(120)]
        a = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        b = spark.createDataFrame(rows, "doc_id long, text string").repartition(19)
        ra = sorted(map(tuple, ngram_novelty(a).collect()))
        rb = sorted(map(tuple, ngram_novelty(b).collect()))
        assert ra == rb


class TestSpearmanGini:
    def test_spearman_perfect_and_reversed(self, spark):
        from energy_pandas_spark.operators.analytics import spearman_corr

        rows = [(i, float(i), float(i * 2)) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, a double, b double")
        r = spearman_corr(df, "a", "b").collect()[0]
        assert (r["n"], r["sum_d2"], r["rho"]) == (50, 0, 1.0)
        rev = spark.createDataFrame(
            [(i, float(i), float(-i)) for i in range(50)],
            "doc_id long, a double, b double",
        )
        r2 = spearman_corr(rev, "a", "b").collect()[0]
        assert r2["rho"] == -1.0

    def test_spearman_matches_python_replay(self, spark):
        import random

        from energy_pandas_spark.operators.analytics import spearman_corr

        rng = random.Random(5)
        rows = [
            (i, rng.random(), rng.random()) for i in range(200)
        ] + [(200, None, 1.0), (201, 0.5, None)]  # nulls excluded
        df = spark.createDataFrame(rows, "doc_id long, a double, b double")
        keep = [(i, a, b) for i, a, b in rows if a is not None and b is not None]
        ra = {
            i: p
            for p, (i, a, _) in enumerate(
                sorted(keep, key=lambda t: (-t[1], t[0]))
            )
        }
        rb = {
            i: p
            for p, (i, _, b) in enumerate(
                sorted(keep, key=lambda t: (-t[2], t[0]))
            )
        }
        n = len(keep)
        sd2 = sum((ra[i] - rb[i]) ** 2 for i, _, _ in keep)
        rho = 1 - 6 * sd2 / (n * (n * n - 1))
        r = spearman_corr(df, "a", "b").collect()[0]
        assert r["n"] == n and r["sum_d2"] == sd2
        assert r["rho"] == rho  # exact: same integer inputs, one division

    def test_gini_uniform_zero_concentrated_high(self, spark):
        from energy_pandas_spark.operators.analytics import gini_concentration

        uni = spark.createDataFrame(
            [(f"s{i}", 100) for i in range(10)], "src string, w long"
        )
        g = gini_concentration(uni, "src", "w").collect()[0]
        assert g["gini"] == 0.0 and g["total"] == 1000
        conc = spark.createDataFrame(
            [("big", 10_000)] + [(f"s{i}", 1) for i in range(9)],
            "src string, w long",
        )
        g2 = gini_concentration(conc, "src", "w").collect()[0]
        assert g2["gini"] > 0.85

    def test_gini_matches_python_replay(self, spark):
        import random

        from energy_pandas_spark.operators.analytics import gini_concentration

        rng = random.Random(9)
        rows = [(f"s{i}", rng.randrange(1, 500)) for i in range(40)]
        df = spark.createDataFrame(rows, "src string, w long").repartition(7)
        xs = [x for _, x in sorted(rows, key=lambda t: (t[1], t[0]))]
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * six - (n + 1) * sx) / (n * sx)
        r = gini_concentration(df, "src", "w").collect()[0]
        assert (r["n_groups"], r["total"]) == (n, sx)
        assert r["gini"] == gini


class TestVocabGrowth:
    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import vocab_growth

        texts = [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(40)]
        df = spark.createDataFrame(texts, "doc_id long, text string").repartition(7)
        got = [
            (r["checkpoint"], r["n_docs"], r["up_to_id"], r["vocab"])
            for r in vocab_growth(df, checkpoints=4).collect()
        ]
        # python replay
        n = 40
        ranks = sorted({max((n * d) // 4, 1) for d in range(1, 5)})
        ids = sorted(i for i, _ in texts)
        first = {}
        for i, t in texts:
            for w in t.split():
                first.setdefault(w, i)
        want = []
        for c, r in enumerate(ranks, start=1):
            up = ids[r - 1]
            want.append((c, r, up, sum(1 for v in first.values() if v <= up)))
        assert got == want
        # doc i introduces exactly term w{i}: growth is linear here
        assert [v for _, _, _, v in got] == [10, 20, 30, 40]

    def test_growth_flattens_on_stale_corpus(self, spark):
        from energy_pandas_spark.operators.text import vocab_growth

        rows = [(i, "same words every time") for i in range(30)]
        rows[0] = (0, "unique opening vocabulary right here")
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [r["vocab"] for r in vocab_growth(df, checkpoints=3).collect()]
        assert got[0] == got[-1]  # no growth after the first slice


class TestPoolEmbeddings:
    def test_mean_matches_python_replay_exactly(self, spark):
        import random

        from energy_pandas_spark.operators.similarity import pool_embeddings

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3)
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(11)
        got = {
            r["label"]: (r["pooled"], r["n_vectors"])
            for r in pool_embeddings(df, "label").collect()
        }
        import struct as _s

        q = 1 << 20
        for lab in (0, 1, 2):
            vecs = [
                [_s.unpack("f", _s.pack("f", x))[0] for x in v]
                for i, v, l in rows
                if l == lab
            ]  # replay float32 storage
            n = len(vecs)
            want = []
            for d in range(8):
                sq = sum(int(_round_half_away(q * v[d])) for v in vecs)
                want.append(sq / (q * n))
            assert got[lab][1] == n
            assert got[lab][0] == want, f"label {lab}"

    def test_max_mode_exact(self, spark):
        from energy_pandas_spark.operators.similarity import pool_embeddings

        rows = [
            (0, [1.0, -2.0, 3.0], 0),
            (1, [2.0, -5.0, 1.0], 0),
            (2, [0.0, 0.0, 0.0], 1),
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = {
            r["label"]: r["pooled"]
            for r in pool_embeddings(df, "label", mode="max").collect()
        }
        assert got[0] == [2.0, -2.0, 3.0]
        assert got[1] == [0.0, 0.0, 0.0]

    def test_partitioning_invariance(self, spark):
        import random

        from energy_pandas_spark.operators.similarity import pool_embeddings

        rng = random.Random(8)
        rows = [
            (i, [rng.uniform(-5, 5) for _ in range(16)], i % 4)
            for i in range(200)
        ]
        a = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1)
        b = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(23)
        ra = sorted(
            (r["label"], tuple(r["pooled"]))
            for r in pool_embeddings(a, "label").collect()
        )
        rb = sorted(
            (r["label"], tuple(r["pooled"]))
            for r in pool_embeddings(b, "label").collect()
        )
        assert ra == rb  # bit-exact


def _round_half_away(x: float) -> float:
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


class TestNearestCentroidEval:
    def test_separable_clusters_perfect_diagonal(self, spark):
        from energy_pandas_spark.operators.similarity import (
            nearest_centroid_eval,
        )

        rows = []
        for i in range(60):
            lab = i % 3
            base = [0.0, 0.0, 0.0]
            base[lab] = 10.0  # three orthogonal tight clusters
            rows.append((i, [b + (i % 5) * 0.01 for b in base], lab))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = {
            (r["label"], r["assigned"]): r["n"]
            for r in nearest_centroid_eval(df).collect()
        }
        assert got == {(0, 0): 20, (1, 1): 20, (2, 2): 20}

    def test_matches_python_replay(self, spark):
        import random

        from energy_pandas_spark.operators.similarity import (
            nearest_centroid_eval,
        )

        rng = random.Random(4)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)], i % 4)
            for i in range(80)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).repartition(9)
        got = {
            (r["label"], r["assigned"]): r["n"]
            for r in nearest_centroid_eval(df).collect()
        }

        # python replay with float32 storage + the same quantization
        import struct as _s

        q = 1 << 20
        f32 = lambda x: _s.unpack("f", _s.pack("f", x))[0]  # noqa: E731
        vecs = [(i, [f32(x) for x in v], l) for i, v, l in rows]
        cents = {}
        for lab in range(4):
            vs = [v for _, v, l in vecs if l == lab]
            cents[lab] = [
                sum(_round_half_away(q * v[d]) for v in vs) / (q * len(vs))
                for d in range(6)
            ]
        cq = {
            lab: [int(_round_half_away(q * x)) for x in c]
            for lab, c in cents.items()
        }
        want: dict = {}
        for _, v, l in vecs:
            vq = [int(_round_half_away(q * x)) for x in v]
            best = min(
                (sum((a - b) ** 2 for a, b in zip(vq, cq[lab])), lab)
                for lab in range(4)
            )[1]
            want[(l, best)] = want.get((l, best), 0) + 1
        assert got == want


class TestSeasonalDecompose:
    def _series(self, spark):
        # 10 days of hourly data: trend ramp + daily sine-ish pattern
        import datetime as dt

        rows = []
        t0 = dt.datetime(2024, 1, 1)
        for h in range(240):
            season = [0, -1, -2, -1, 0, 1, 2, 3, 4, 3, 2, 1] [h % 12]
            rows.append(
                ("m1", t0 + dt.timedelta(hours=h), 10.0 + 0.01 * h + season)
            )
        return spark.createDataFrame(rows, "key string, ts timestamp, v double")

    def test_components_reconstruct_and_match_python(self, spark):
        from energy_pandas_spark.operators.analytics import seasonal_decompose

        df = self._series(spark)
        out = seasonal_decompose(
            df, "ts", "v", by="key", period=12, trend_window=12
        ).orderBy("ts")
        rows = out.collect()
        assert len(rows) == 240
        # exact reconstruction by construction
        for r in rows:
            assert r["v"] - r["trend"] - r["seasonal"] == r["residual"]

        # python replay (same quantization)
        data = sorted((r["ts"], r["v"]) for r in df.collect())
        q = 1_000_000
        qs = [int(_round_half_away(q * v)) for _, v in data]
        n = len(qs)
        trends = []
        for i in range(n):
            lo, hi = max(0, i - 6), min(n, i + 6)
            w = qs[lo:hi]
            trends.append(sum(w) / (q * len(w)))
        phases = [ts.hour % 12 for ts, _ in data]
        dq = [
            int(_round_half_away(q * (v - t)))
            for (_, v), t in zip(data, trends)
        ]
        ssum: dict = {}
        scnt: dict = {}
        for p, d in zip(phases, dq):
            ssum[p] = ssum.get(p, 0) + d
            scnt[p] = scnt.get(p, 0) + 1
        for r, t in zip(rows, trends):
            assert r["trend"] == t
            p = r["ts"].hour % 12
            assert r["seasonal"] == ssum[p] / (q * scnt[p])

    def test_partitioning_invariance(self, spark):
        from energy_pandas_spark.operators.analytics import seasonal_decompose

        df = self._series(spark)
        a = seasonal_decompose(
            df.coalesce(1), "ts", "v", by="key", period=12
        )
        b = seasonal_decompose(
            df.repartition(13), "ts", "v", by="key", period=12
        )
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb


class TestSeasonalNaiveBacktest:
    def test_matches_python_replay(self, spark):
        import datetime as dt
        import random

        from energy_pandas_spark.operators.analytics import (
            seasonal_naive_backtest,
        )

        rng = random.Random(2)
        t0 = dt.datetime(2024, 3, 1)
        rows = []
        for key in ("a", "b"):
            for h in range(100):
                rows.append(
                    (key, t0 + dt.timedelta(hours=h), round(rng.uniform(-5, 20), 2))
                )
        df = spark.createDataFrame(
            rows, "key string, ts timestamp, v double"
        ).repartition(7)
        got = {
            r["key"]: (r["n"], r["mae"], r["mape_pm"])
            for r in seasonal_naive_backtest(
                df, "ts", "v", by="key", period=24
            ).collect()
        }
        q = 1_000_000
        for key in ("a", "b"):
            series = [v for k, _, v in rows if k == key]
            pairs = [
                (series[i], series[i - 24]) for i in range(24, len(series))
            ]
            n = len(pairs)
            sae = sum(int(_round_half_away(q * abs(v - p))) for v, p in pairs)
            apes = [
                int(_round_half_away(q * abs((v - p) / v)))
                for v, p in pairs
                if v != 0
            ]
            want = (n, sae / (q * n), 1000 * sum(apes) / (q * len(apes)))
            assert got[key] == want

    def test_perfect_seasonality_zero_error(self, spark):
        import datetime as dt

        from energy_pandas_spark.operators.analytics import (
            seasonal_naive_backtest,
        )

        t0 = dt.datetime(2024, 3, 1)
        rows = [
            ("k", t0 + dt.timedelta(hours=h), float(1 + h % 24))
            for h in range(96)
        ]
        df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
        r = seasonal_naive_backtest(df, "ts", "v", by="key").collect()[0]
        assert (r["n"], r["mae"], r["mape_pm"]) == (72, 0.0, 0.0)


class TestCusum:
    def test_matches_sequential_recurrence(self, spark):
        import datetime as dt
        import random

        from energy_pandas_spark.operators.analytics import cusum_alarms

        rng = random.Random(6)
        t0 = dt.datetime(2024, 5, 1)
        rows = []
        for key in ("a", "b"):
            level = 0.0
            for h in range(150):
                if h == 90 and key == "a":
                    level = 3.0  # level shift for key a only
                rows.append(
                    (
                        key,
                        t0 + dt.timedelta(hours=h),
                        round(level + rng.uniform(-1, 1), 3),
                    )
                )
        df = spark.createDataFrame(
            rows, "key string, ts timestamp, v double"
        ).repartition(9)
        got = {
            (r["key"], r["ts"]): (r["cusum"], r["alarm"])
            for r in cusum_alarms(
                df, "ts", "v", by="key", target=0.0, drift=0.5, threshold=8.0
            ).collect()
        }
        # sequential replay with the same quantization
        q = 1_000_000
        kq = round(q * 0.5)
        for key in ("a", "b"):
            s = 0
            for k2, ts, v in rows:
                if k2 != key:
                    continue
                d = int(_round_half_away(q * v)) - kq
                s = max(0, s + d)
                assert got[(key, ts)] == (s / q, s >= 8.0 * q), (key, ts)
        # the shifted key alarms, the stable key never does
        assert any(a for (k, _), (_, a) in got.items() if k == "a")
        assert not any(a for (k, _), (_, a) in got.items() if k == "b")

    def test_partitioning_invariance(self, spark):
        import datetime as dt

        from energy_pandas_spark.operators.analytics import cusum_alarms

        t0 = dt.datetime(2024, 5, 1)
        rows = [
            ("k", t0 + dt.timedelta(hours=h), float((h * 7) % 5 - 2))
            for h in range(200)
        ]
        a = spark.createDataFrame(rows, "key string, ts timestamp, v double").coalesce(1)
        b = spark.createDataFrame(rows, "key string, ts timestamp, v double").repartition(17)
        ra = sorted(map(tuple, cusum_alarms(a, "ts", "v", by="key").collect()))
        rb = sorted(map(tuple, cusum_alarms(b, "ts", "v", by="key").collect()))
        assert ra == rb


class TestRfmSegments:
    def test_matches_python_replay(self, spark):
        import datetime as dt
        import random

        from energy_pandas_spark.operators.behavior import rfm_segments

        rng = random.Random(12)
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(23):
            for _ in range(1 + (u % 7)):
                rows.append(
                    (
                        u,
                        t0 + dt.timedelta(hours=rng.randrange(0, 24 * 60)),
                        round(rng.uniform(0, 30), 2),
                    )
                )
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).repartition(5)
        got = {
            r["user_id"]: (
                r["recency_days"],
                r["frequency"],
                r["monetary_q"],
                r["r"],
                r["f"],
                r["m"],
                r["segment"],
            )
            for r in rfm_segments(df).collect()
        }

        # python replay
        q = 100
        ref = max(ts for _, ts, _ in rows)
        per = {}
        for u, ts, v in rows:
            last, cnt, mon = per.get(u, (None, 0, 0))
            last = ts if last is None or ts > last else last
            per[u] = (last, cnt + 1, mon + int(_round_half_away(q * v)))
        n = len(per)
        days = lambda a, b: (a.date() - b.date()).days  # noqa: E731
        quint = lambda rank0: 5 - (5 * rank0) // n  # noqa: E731
        r_order = sorted(per, key=lambda u: (per[u][0], -u), reverse=True)
        f_order = sorted(per, key=lambda u: (per[u][1], -u), reverse=True)
        m_order = sorted(per, key=lambda u: (per[u][2], -u), reverse=True)
        for u, (last, cnt, mon) in per.items():
            r = quint(r_order.index(u))
            f = quint(f_order.index(u))
            m = quint(m_order.index(u))
            assert got[u] == (
                days(ref, last),
                cnt,
                mon,
                r,
                f,
                m,
                r * 100 + f * 10 + m,
            ), u

    def test_quintiles_cover_1_to_5(self, spark):
        import datetime as dt

        from energy_pandas_spark.operators.behavior import rfm_segments

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (u, t0 + dt.timedelta(days=u), float(u * 10)) for u in range(25)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        got = rfm_segments(df).collect()
        assert {r["r"] for r in got} == {1, 2, 3, 4, 5}
        assert {r["m"] for r in got} == {1, 2, 3, 4, 5}


class TestTokenEntropy:
    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import token_entropy

        texts = [
            (0, "a a a a a a"),                        # zero entropy
            (1, "one two three four five six"),       # max entropy
            (2, "spam spam spam buy now buy now"),
            (3, ""),                                   # empty -> 0
            (4, None),                                 # null -> 0
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["entropy_q"])
            for r in token_entropy(df).collect()
        }
        import math
        from collections import Counter

        q = 1024
        for i, t in texts:
            cnt = Counter(w for w in (t or "").lower().split() if w)
            n = sum(cnt.values())
            if n == 0:
                assert got[i] == (0, 0)
                continue
            s = sum(c * int(_round_half_away(q * math.log(c))) for c in cnt.values())
            eq = int(_round_half_away(q * math.log(n))) - s // n
            assert got[i] == (n, eq), i
        assert got[0][1] == 0
        assert got[1][1] > got[2][1] > got[0][1]

    def test_partitioning_invariance(self, spark):
        from energy_pandas_spark.operators.text import token_entropy

        rows = [(i, f"w{i%5} w{i%3} w{i%5} filler text here") for i in range(150)]
        a = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
        b = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
        assert sorted(map(tuple, token_entropy(a).collect())) == sorted(
            map(tuple, token_entropy(b).collect())
        )


class TestFrequentPairs:
    def test_matches_python_replay(self, spark):
        import itertools
        import random
        from collections import Counter

        from energy_pandas_spark.operators.behavior import frequent_pairs

        rng = random.Random(17)
        rows = []
        for b in range(40):
            items = rng.sample("abcdefg", rng.randrange(1, 5))
            rows += [(b, i) for i in items]
            rows += [(b, items[0])]  # duplicate delivery, must dedup
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        got = {
            (r["item_a"], r["item_b"]): (
                r["support"],
                r["support_a"],
                r["support_b"],
            )
            for r in frequent_pairs(df, min_support=3).collect()
        }
        baskets: dict = {}
        for b, i in rows:
            baskets.setdefault(b, set()).add(i)
        sup = Counter(i for s in baskets.values() for i in s)
        pc: Counter = Counter()
        for s in baskets.values():
            for x, y in itertools.combinations(sorted(s), 2):
                pc[(x, y)] += 1
        want = {
            p: (c, sup[p[0]], sup[p[1]]) for p, c in pc.items() if c >= 3
        }
        assert got == want

    def test_confidence_lift_derivable(self, spark):
        from energy_pandas_spark.operators.behavior import frequent_pairs

        rows = [(b, i) for b in range(10) for i in ("x", "y")] + [
            (100 + b, "x") for b in range(10)
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        r = frequent_pairs(df, min_support=1).collect()[0]
        # x in 20 baskets, y in 10, together in 10
        assert (r["support"], r["support_a"], r["support_b"]) == (10, 20, 10)


class TestChiSquare:
    def test_matches_python_replay(self, spark):
        import random

        from energy_pandas_spark.operators.analytics import (
            chi_square_independence,
        )

        rng = random.Random(21)
        rows = [
            (rng.choice("abc"), rng.choice(["x", "y", "z", "w"]))
            for _ in range(500)
        ]
        df = spark.createDataFrame(rows, "a string, b string").repartition(7)
        r = chi_square_independence(df, "a", "b").collect()[0]

        from collections import Counter

        q = 1_000_000
        cells = Counter(rows)
        ra = Counter(a for a, _ in rows)
        cb = Counter(b for _, b in rows)
        n = len(rows)
        s = 0
        for a in ra:                      # FULL grid: zero cells count
            for b in cb:
                o = cells.get((a, b), 0)
                e = (ra[a] * cb[b]) / n
                s += int(_round_half_away(q * ((o - e) * (o - e)) / e))
        assert (r["n"], r["n_a"], r["n_b"], r["dof"]) == (500, 3, 4, 6)
        assert r["chi2"] == s / q

    def test_independent_vs_dependent(self, spark):
        from energy_pandas_spark.operators.analytics import (
            chi_square_independence,
        )

        dep = [(c, c.upper()) for c in "abcd" * 100]  # perfectly dependent
        df = spark.createDataFrame(dep, "a string, b string")
        r = chi_square_independence(df, "a", "b").collect()[0]
        # chi2 = n * (k-1) for a perfect k x k diagonal
        assert r["chi2"] == 400 * 3.0


class TestTrimmedMean:
    def test_matches_python_replay_and_rejects_outliers(self, spark):
        import random

        from energy_pandas_spark.operators.analytics import trimmed_mean

        rng = random.Random(31)
        rows = []
        for g in ("a", "b"):
            for _ in range(97):
                rows.append((g, round(rng.uniform(10, 20), 3)))
            rows.append((g, 1e6))   # outliers the trim must reject
            rows.append((g, -1e6))
        df = spark.createDataFrame(rows, "g string, v double").repartition(7)
        got = {
            r["g"]: (r["n"], r["n_kept"], r["trimmed_mean"])
            for r in trimmed_mean(df, "v", by="g", trim_permille=50).collect()
        }
        q = 1_000_000
        for g in ("a", "b"):
            vals = sorted(v for k2, v in rows if k2 == g)
            n = len(vals)
            k = (n * 50) // 1000
            kept = vals[k : n - k]
            s = sum(int(_round_half_away(q * v)) for v in kept)
            want = (n, len(kept), s / (q * len(kept)))
            assert got[g] == want
            assert 10 <= got[g][2] <= 20  # outliers gone

    def test_partitioning_invariance(self, spark):
        from energy_pandas_spark.operators.analytics import trimmed_mean

        rows = [("k", float((i * 13) % 101)) for i in range(500)]
        a = spark.createDataFrame(rows, "g string, v double").coalesce(1)
        b = spark.createDataFrame(rows, "g string, v double").repartition(19)
        ra = sorted(map(tuple, trimmed_mean(a, "v", by="g").collect()))
        rb = sorted(map(tuple, trimmed_mean(b, "v", by="g").collect()))
        assert ra == rb


class TestCrossCorrelation:
    def test_shifted_copy_peaks_at_its_lag(self, spark):
        import datetime as dt
        import random

        from energy_pandas_spark.operators.analytics import cross_correlation

        rng = random.Random(13)
        t0 = dt.datetime(2024, 6, 1)
        a = [rng.uniform(0, 10) for _ in range(120)]
        rows = [
            # b is a copy of a shifted 3 steps later: b[t] = a[t-3]
            (t0 + dt.timedelta(hours=h), a[h], a[h - 3] if h >= 3 else 0.0)
            for h in range(120)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, a double, b double")
        got = {
            r["lag"]: (r["n"], r["r"])
            for r in cross_correlation(df, "ts", "a", "b", max_lag=5).collect()
        }
        assert set(got) == set(range(-5, 6))
        best = max(got, key=lambda k: got[k][1])
        assert best == 3  # a leads b by 3
        assert got[3][1] > 0.99

    def test_matches_python_replay(self, spark):
        import datetime as dt
        import math
        import random

        from energy_pandas_spark.operators.analytics import cross_correlation

        rng = random.Random(14)
        t0 = dt.datetime(2024, 6, 1)
        rows = [
            (
                t0 + dt.timedelta(hours=h),
                round(rng.uniform(-5, 5), 3),
                round(rng.uniform(-5, 5), 3),
            )
            for h in range(80)
        ]
        df = spark.createDataFrame(
            rows, "ts timestamp, a double, b double"
        ).repartition(7)
        got = {
            r["lag"]: (r["n"], r["r"])
            for r in cross_correlation(df, "ts", "a", "b", max_lag=4).collect()
        }
        q = 1 << 20
        aq = [int(_round_half_away(q * a)) for _, a, _ in rows]
        bq = [int(_round_half_away(q * b)) for _, _, b in rows]
        m = len(rows)
        for lag in range(-4, 5):
            pairs = [
                (aq[i], bq[i + lag])
                for i in range(m)
                if 0 <= i + lag < m
            ]
            n = len(pairs)
            sa = sum(x for x, _ in pairs)
            sb = sum(y for _, y in pairs)
            sab = sum(x * y for x, y in pairs)
            saa = sum(x * x for x, _ in pairs)
            sbb = sum(y * y for _, y in pairs)
            den = math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
            want = (n * sab - sa * sb) / den
            assert got[lag][0] == n
            assert abs(got[lag][1] - want) < 1e-12, lag


def test_autocorrelation_finds_period(spark):
    import datetime as dt
    import random

    from energy_pandas_spark.operators.analytics import autocorrelation

    rng = random.Random(19)
    t0 = dt.datetime(2024, 7, 1)
    rows = [
        (
            t0 + dt.timedelta(hours=h),
            [0, 3, 6, 3, 0, -3, -6, -3][h % 8] + rng.uniform(-0.5, 0.5),
        )
        for h in range(200)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    got = {r["lag"]: r["r"] for r in autocorrelation(df, "ts", "v", max_lag=12).collect()}
    assert set(got) == set(range(13))
    # x/(sqrt(x)*sqrt(x)) is deterministic but not exactly 1.0
    assert abs(got[0] - 1.0) < 1e-12
    assert got[8] > 0.9           # the planted period
    assert got[4] < -0.9          # anti-phase


class TestJsDivergence:
    def test_matches_python_replay(self, spark):
        import math
        import random
        from collections import Counter

        from energy_pandas_spark.operators.text import js_divergence_matrix

        rng = random.Random(41)
        vocab = [f"w{i}" for i in range(12)]
        rows = []
        for i in range(200):
            srcname = f"s{i % 3}"
            # each source has its own skew
            words = rng.choices(
                vocab, weights=[(j + 1) ** (1 + (i % 3)) for j in range(12)], k=20
            )
            rows.append((i, srcname, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            (r["src_a"], r["src_b"]): (r["js_q"], r["js"])
            for r in js_divergence_matrix(df).collect()
        }

        q = 1 << 20  # the operator default
        cnt: dict = {}
        for _, s, t in rows:
            cnt.setdefault(s, Counter()).update(t.split())
        tot = {s: sum(c.values()) for s, c in cnt.items()}

        def hq(pairs):
            # pairs: iterable of probabilities > 0
            return -sum(
                int(_round_half_away(q * p * math.log(p))) for p in pairs
            )

        hps = {s: hq(c / tot[s] for c in cnt[s].values()) for s in cnt}
        want = {}
        for a in sorted(cnt):
            for b in sorted(cnt):
                if a >= b:
                    continue
                terms = set(cnt[a]) | set(cnt[b])
                hm = hq(
                    cnt[a].get(t, 0) / (2 * tot[a])
                    + cnt[b].get(t, 0) / (2 * tot[b])
                    for t in terms
                )
                jsq = hm - (hps[a] + hps[b]) // 2
                want[(a, b)] = (jsq, jsq / q)
        assert got == want
        # identical distributions would give ~0; distinct skews must not
        assert all(v[1] > 0 for v in got.values())

    def test_identical_sources_near_zero(self, spark):
        from energy_pandas_spark.operators.text import js_divergence_matrix

        rows = [(i, f"s{i % 2}", "alpha beta gamma delta") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        r = js_divergence_matrix(df).collect()[0]
        assert abs(r["js"]) < 0.01  # quantization slack only


def test_readability_stats_known_values(spark):
    from energy_pandas_spark.operators.text import readability_stats

    df = spark.createDataFrame(
        [
            (1, "The cat sat on the mat. It was happy!"),
            (2, "Incomprehensibility characterizes multidimensional "
                "heterogeneous organizations."),
            (3, ""),
            (4, None),
            (5, "No terminal punctuation here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability_stats(df).collect()}
    r = rows[1]
    # 9 words / 2 sentences / 10 vowel-group syllables
    assert (r.n_words, r.n_sentences, r.n_syllables) == (9, 2, 10)
    assert (r.wps_milli, r.spw_milli) == (4500, 1111)
    # 206835 - (1015*4500)//1000 - (84600*1111)//1000
    assert r.flesch_milli == 206835 - 4567 - 93990
    assert r.fk_grade_milli == 1755 + 13109 - 15590
    # dense academic prose scores deeply negative (very hard)
    assert rows[2].flesch_milli < 0 and rows[2].fk_grade_milli > 50000
    # empty and NULL text behave identically: all counts zero
    for d in (3, 4):
        assert (rows[d].n_words, rows[d].n_sentences, rows[d].n_syllables) == (0, 0, 0)
        assert rows[d].flesch_milli == 206835
    # no sentence terminator: the 1-sentence floor applies in the ratio
    assert rows[5].n_sentences == 0 and rows[5].wps_milli == 4000


def test_readability_stats_zero_shuffle_no_python(spark):
    from energy_pandas_spark.operators.text import readability_stats

    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = readability_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


class TestKneserNey:
    TRAIN = ["the cat sat", "the dog sat", "a cat ran"]

    @staticmethod
    def _replay(train_texts, score_texts, dn=3, dd=4, quant=1 << 20):
        """Pure-Python interpolated-KN replay (the operator's contract)."""
        import math

        def bigrams(t):
            w = t.lower().split()
            return list(zip(w, w[1:]))

        c12 = {}
        for t in train_texts:
            for p in bigrams(t):
                c12[p] = c12.get(p, 0) + 1
        c1, n1p, ncont = {}, {}, {}
        for (w1, w2), c in c12.items():
            c1[w1] = c1.get(w1, 0) + c
            n1p[w1] = n1p.get(w1, 0) + 1
            ncont[w2] = ncont.get(w2, 0) + 1
        b = len(c12)
        out = []
        for t in score_texts:
            n_bg = n_oov = lp = 0
            for w1, w2 in bigrams(t):
                n_bg += 1
                cc = c12.get((w1, w2), 0)
                nc = ncont.get(w2, 0)
                if w1 not in c1 or (cc == 0 and nc == 0):
                    n_oov += 1
                    continue
                p = max(dd * cc - dn, 0) / (dd * c1[w1]) + (
                    (dn * n1p[w1]) / (dd * c1[w1])
                ) * (nc / b)
                v = math.log(p) * quant
                lp += int(math.floor(v + 0.5)) if v >= 0 else int(
                    math.ceil(v - 0.5)
                )
            out.append((n_bg, n_oov, lp))
        return out

    def test_normalizes_to_one(self):
        # sanity of the formula itself: for each seen context, P sums
        # to 1 over the continuation vocabulary
        import math

        vocab = ["the", "cat", "dog", "sat", "ran", "a"]
        for w1 in ["the", "cat", "a"]:
            rows = self._replay(
                self.TRAIN, [f"{w1} {w2}" for w2 in vocab]
            )
            total = sum(
                math.exp(lp / (1 << 20)) for (_, oov, lp) in rows if oov == 0
            )
            assert abs(total - 1.0) < 1e-4

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import (
            bigram_lm_train,
            kneser_ney_score,
        )

        score_texts = [
            "the cat sat",        # all seen bigrams
            "the cat ran",        # unseen bigram, seen continuation
            "zebra cat sat",      # unseen context -> OOV position
            "cat zebra",          # unseen continuation -> OOV position
            "single",             # no bigrams
        ]
        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TRAIN)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(score_texts)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_bigrams, r.n_oov, r.logprob_q)
            for r in kneser_ney_score(docs, bigram_lm_train(train)).collect()
        }
        want = dict(enumerate(self._replay(self.TRAIN, score_texts)))
        assert got == want
        assert got[4] == (0, 0, 0)
        assert got[2][1] == 1 and got[3][1] == 1

    def test_discount_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.text import (
            bigram_lm_train,
            kneser_ney_score,
        )

        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        lm = bigram_lm_train(df)
        with _pytest.raises(ValueError):
            kneser_ney_score(df, lm, discount=(4, 4))
        with _pytest.raises(ValueError):
            kneser_ney_score(df, lm, discount=(0, 4))


class TestKneserNeyTrigram:
    TRAIN = [
        "the cat sat on the mat",
        "the dog sat on a mat",
        "a cat ran to the mat",
    ]

    @staticmethod
    def _replay(train_texts, score_texts, dn=3, dd=4, quant=1 << 20):
        """Pure-Python interpolated trigram-KN replay (the operator's
        contract: everything derived from the trigram count table)."""
        import math

        def trigrams(t):
            w = t.lower().split()
            return list(zip(w, w[1:], w[2:]))

        c123 = {}
        for t in train_texts:
            for g in trigrams(t):
                c123[g] = c123.get(g, 0) + 1
        c12, n3t, nc23 = {}, {}, {}
        for (w1, w2, w3), c in c123.items():
            c12[(w1, w2)] = c12.get((w1, w2), 0) + c
            n3t[(w1, w2)] = n3t.get((w1, w2), 0) + 1
            nc23[(w2, w3)] = nc23.get((w2, w3), 0) + 1
        den2, n2t, nc3 = {}, {}, {}
        for (w2, w3), c in nc23.items():
            den2[w2] = den2.get(w2, 0) + c
            n2t[w2] = n2t.get(w2, 0) + 1
            nc3[w3] = nc3.get(w3, 0) + 1
        b = len(nc23)
        out = []
        for t in score_texts:
            n_tg = n_oov = lp = 0
            for w1, w2, w3 in trigrams(t):
                n_tg += 1
                nc = nc3.get(w3, 0)
                if nc == 0:
                    n_oov += 1
                    continue
                p1 = nc / b
                if w2 in den2:
                    p2 = max(dd * nc23.get((w2, w3), 0) - dn, 0) / (
                        dd * den2[w2]
                    ) + ((dn * n2t[w2]) / (dd * den2[w2])) * p1
                else:
                    p2 = p1
                if (w1, w2) in c12:
                    p3 = max(dd * c123.get((w1, w2, w3), 0) - dn, 0) / (
                        dd * c12[(w1, w2)]
                    ) + ((dn * n3t[(w1, w2)]) / (dd * c12[(w1, w2)])) * p2
                else:
                    p3 = p2
                v = math.log(p3) * quant
                lp += int(math.floor(v + 0.5)) if v >= 0 else int(
                    math.ceil(v - 0.5)
                )
            out.append((n_tg, n_oov, lp))
        return out

    def test_normalizes_to_one(self):
        # per seen (w1, w2) context, P sums to 1 over the continuation
        # vocabulary (every w3 with nonzero continuation mass)
        import math

        vocab = ["the", "cat", "dog", "sat", "ran", "on", "a", "to", "mat"]
        for ctx in ["the cat", "sat on", "a cat"]:
            rows = self._replay(
                self.TRAIN, [f"{ctx} {w3}" for w3 in vocab]
            )
            total = sum(
                math.exp(lp / (1 << 20)) for (_, oov, lp) in rows if oov == 0
            )
            assert abs(total - 1.0) < 1e-4, ctx

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import (
            kneser_ney_trigram_score,
            trigram_lm_train,
        )

        score_texts = [
            "the cat sat on the mat",   # all seen trigrams
            "the cat ran to a mat",     # unseen trigrams, seen pieces
            "zebra cat sat",            # unseen (w1,w2) -> bigram backoff
            "cat zebra sat",            # unseen w2 -> unigram backoff
            "the cat zebra",            # unseen w3 -> OOV position
            "two words",                # no trigrams
        ]
        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TRAIN)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(score_texts)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_trigrams, r.n_oov, r.logprob_q)
            for r in kneser_ney_trigram_score(
                docs, trigram_lm_train(train)
            ).collect()
        }
        want = dict(enumerate(self._replay(self.TRAIN, score_texts)))
        assert got == want
        assert got[5] == (0, 0, 0)
        assert got[4][1] == 1  # the OOV continuation
        assert got[2][1] == 0 and got[3][1] == 0  # backoffs still score

    def test_in_domain_outscores_out_of_domain(self, spark):
        from energy_pandas_spark.operators.text import (
            kneser_ney_trigram_score,
            trigram_lm_train,
        )

        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TRAIN * 4)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(0, "the cat sat on the mat"), (1, "mat the on sat cat the")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r
            for r in kneser_ney_trigram_score(
                docs, trigram_lm_train(train)
            ).collect()
        }
        a, b = rows[0], rows[1]
        assert a.logprob_q / a.n_trigrams > b.logprob_q / b.n_trigrams

    def test_discount_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.text import (
            kneser_ney_trigram_score,
            trigram_lm_train,
        )

        df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
        lm = trigram_lm_train(df)
        with _pytest.raises(ValueError):
            kneser_ney_trigram_score(df, lm, discount=(4, 4))


class TestSpanCorrupt:
    @staticmethod
    def _replay(texts, start_permille=60, span=3, seed="span-v1"):
        import hashlib

        out = []
        for d, t in texts:
            toks = [w for w in t.lower().split() if w]
            n = len(toks)
            start = [
                int(
                    hashlib.md5(f"{seed}:{d}:{i}".encode()).hexdigest()[:15],
                    16,
                )
                % 1000
                < start_permille
                for i in range(1, n + 1)
            ]
            covered = [
                any(start[max(0, i - span + 1): i + 1]) for i in range(n)
            ]
            inp, tgt, run = [], [], 0
            for i in range(n):
                if not covered[i]:
                    inp.append(toks[i])
                    continue
                if i == 0 or not covered[i - 1]:
                    inp.append(f"<extra_id_{run}>")
                    tgt.append(f"<extra_id_{run}>")
                    run += 1
                tgt.append(toks[i])
            out.append(
                (d, " ".join(inp), " ".join(tgt), n, sum(covered))
            )
        return out

    def test_matches_python_replay_and_reconstructs(self, spark):
        from energy_pandas_spark.operators.text import span_corrupt

        texts = [
            (i, " ".join(f"w{i}t{j}" for j in range(5 + (i * 7) % 40)))
            for i in range(30)
        ] + [(99, ""), (100, None)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = sorted(
            (r.doc_id, r.input_text, r.target_text, r.n_tokens, r.n_masked)
            for r in span_corrupt(df).collect()
        )
        want = sorted(
            self._replay([(d, t or "") for d, t in texts])
        )
        assert got == want
        # lossless: substituting each sentinel's target span back into
        # the input reproduces the original token stream
        for d, inp, tgt, n, masked in got:
            spans = {}
            cur = None
            for w in tgt.split():
                if w.startswith("<extra_id_"):
                    cur = w
                    spans[cur] = []
                else:
                    spans[cur].append(w)
            rebuilt = []
            for w in inp.split():
                rebuilt.extend(spans[w] if w.startswith("<extra_id_") else [w])
            orig = [w for w in (dict(texts)[d] or "").lower().split() if w]
            assert rebuilt == orig

    def test_partitioning_invariance_and_epoch_seed(self, spark):
        from energy_pandas_spark.operators.text import span_corrupt

        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(50))) for i in range(20)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, span_corrupt(df).collect()))
        b = sorted(map(tuple, span_corrupt(df.repartition(7)).collect()))
        assert a == b
        c = sorted(map(tuple, span_corrupt(df, seed="span-v2").collect()))
        assert a != c  # a new epoch seed re-rolls the masks
        # mask fraction lands near start_permille * span / 1000
        tot = sum(r[3] for r in a)
        masked = sum(r[4] for r in a)
        assert 0.08 < masked / tot < 0.30

    def test_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.text import span_corrupt

        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            span_corrupt(df, start_permille=1001)
        with _pytest.raises(ValueError):
            span_corrupt(df, span=0)


class TestLangidNgram:
    EN = ["the quick brown fox jumps over the lazy dog and runs away",
          "it is a truth universally acknowledged that a single man",
          "all happy families are alike in the usual manner of things"]
    DE = ["der schnelle braune fuchs springt ueber den faulen hund",
          "es ist eine allgemein anerkannte wahrheit dass ein mann",
          "alle gluecklichen familien aehneln einander in der weise"]

    @staticmethod
    def _replay(train, score_texts, top=200, n=3):
        """Independent Python recomputation of the Cavnar-Trenkle
        pipeline (normalized text, ranked profiles, out-of-place
        distance with `top` penalty, lang-asc tiebreaks)."""
        import re

        def norm(t):
            return re.sub(r"\s+", " ", (t or "").lower()).strip()

        def grams(t):
            t = norm(t)
            return [t[i:i + n] for i in range(len(t) - n + 1)]

        def profile(gs):
            c = {}
            for g in gs:
                c[g] = c.get(g, 0) + 1
            ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
            return {g: r + 1 for r, (g, _) in enumerate(ranked)}

        profs = {
            lang: profile([g for t in texts for g in grams(t)])
            for lang, texts in train.items()
        }
        out = []
        for t in score_texts:
            dp = profile(grams(t))
            if not dp:
                out.append(("und", None))
                continue
            best = None
            for lang, lp in profs.items():
                hits = [g for g in dp if g in lp]
                if not hits:
                    continue
                d = sum(abs(dp[g] - lp[g]) for g in hits)
                d += (len(dp) - len(hits)) * top
                if best is None or (d, lang) < best:
                    best = (d, lang)
            out.append((best[1], best[0]) if best else ("und", None))
        return out

    def _frames(self, spark):
        rows = [(i, "en", t) for i, t in enumerate(self.EN)]
        rows += [(100 + i, "de", t) for i, t in enumerate(self.DE)]
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def test_classifies_held_out_text(self, spark):
        from energy_pandas_spark.operators.text import (
            langid_ngram,
            train_langid_profiles,
        )

        profiles = train_langid_profiles(self._frames(spark))
        docs = spark.createDataFrame(
            [(0, "the man jumps over the dog"),
             (1, "der mann springt ueber den hund"),
             (2, "ab")],  # sub-3-char after norm -> no grams
            "doc_id long, text string",
        )
        got = {r.doc_id: r.lang_pred
               for r in langid_ngram(docs, profiles).collect()}
        assert got == {0: "en", 1: "de", 2: "und"}

    def test_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.text import (
            langid_ngram,
            train_langid_profiles,
        )

        score = [
            "the quick dog runs",
            "der faule hund",
            "families are alike und aehneln",  # mixed
            "zzz qqq xxx",                     # gram misses everywhere
            "",
        ]
        profiles = train_langid_profiles(self._frames(spark), top=50)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.lang_pred, r.lang_dist)
            for r in langid_ngram(docs, profiles, top=50).collect()
        }
        want = dict(enumerate(self._replay(
            {"en": self.EN, "de": self.DE}, score, top=50
        )))
        assert got == want

    def test_profile_shape_and_determinism(self, spark):
        from energy_pandas_spark.operators.text import train_langid_profiles

        p = train_langid_profiles(self._frames(spark), top=30)
        rows = p.collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r.lang, []).append(r.rank)
        for lang, ranks in by_lang.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 30
        # rerun-stable
        again = {(r.lang, r.gram, r.rank) for r in
                 train_langid_profiles(self._frames(spark), top=30).collect()}
        assert again == {(r.lang, r.gram, r.rank) for r in rows}

    def test_validation(self, spark):
        import pytest as _pt

        from energy_pandas_spark.operators.text import (
            langid_ngram,
            train_langid_profiles,
        )

        from pyspark.sql import functions as F

        df = self._frames(spark)
        with _pt.raises(ValueError):
            train_langid_profiles(df, top=0)
        with _pt.raises(ValueError):
            langid_ngram(df, df.select("lang", F.lit("abc").alias("gram"),
                                       F.lit(1).alias("rank")), n=0)


def test_langid_ngram_top_mismatch_raises(spark):
    import pytest as _pt

    from energy_pandas_spark.operators.text import (
        langid_ngram,
        train_langid_profiles,
    )

    df = spark.createDataFrame(
        [(1, "en", "the quick brown fox jumps over the lazy dog ran")],
        "doc_id long, lang string, text string",
    )
    profiles = train_langid_profiles(df, top=40)
    with _pt.raises(ValueError):
        langid_ngram(df, profiles, top=20)  # shallower than training


def test_langid_ngram_rerun_overwrites_lang_dist(spark):
    from energy_pandas_spark.operators.text import (
        langid_ngram,
        train_langid_profiles,
    )

    df = spark.createDataFrame(
        [(1, "en", "the quick brown fox jumps over the lazy dog ran")],
        "doc_id long, lang string, text string",
    )
    profiles = train_langid_profiles(df, top=40)
    once = langid_ngram(df, profiles, top=40)
    twice = langid_ngram(once, profiles, top=40)
    assert twice.columns.count("lang_dist") == 1
    assert twice.collect()[0].lang_pred == "en"


def _langid_corpus(spark):
    rows = []
    en = [
        "the quick brown fox jumps over the lazy dog and then runs home",
        "there is a house in new orleans they call the rising sun",
        "all the world is a stage and all the men and women players",
        "to be or not to be that is the question for the ages",
    ]
    fr = [
        "le chat noir dort sur le tapis rouge dans la maison",
        "il etait une fois une petite fille qui vivait dans la foret",
        "tous les chemins menent a rome et les routes sont longues",
        "la vie est belle quand le soleil brille sur les champs",
    ]
    for i, t in enumerate(en):
        rows.append((i, "en", t))
    for i, t in enumerate(fr):
        rows.append((100 + i, "fr", t))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_langid_selftrain_matches_two_pass_composition(spark):
    """The single-tokenize selftrain (VERDICT r3 #6) must be bit-equal
    to the train_langid_profiles + langid_ngram composition it
    replaces: the per-language counts are the persisted per-doc counts
    re-summed, so predictions AND distances agree exactly."""
    from energy_pandas_spark.operators.text import (
        langid_ngram,
        langid_ngram_selftrain,
        train_langid_profiles,
    )

    df = _langid_corpus(spark)
    compose = {
        (r.doc_id, r.lang, r.lang_pred, r.lang_dist)
        for r in langid_ngram(
            df, train_langid_profiles(df, top=50), top=50
        ).select("doc_id", "lang", "lang_pred", "lang_dist").collect()
    }
    fused = {
        (r.doc_id, r.lang, r.lang_pred, r.lang_dist)
        for r in langid_ngram_selftrain(df, top=50).collect()
    }
    assert fused == compose
    # every doc classified correctly on this trivially separable corpus
    assert all(lang == pred for (_, lang, pred, _) in fused)


def test_langid_selftrain_custom_lang_col(spark):
    """The returned label column keeps the CALLER's name — the
    docstring promises (id_col, lang_col, out_col, lang_dist), so a
    corpus labeled 'language' must come back as 'language', not a
    hard-coded 'lang'."""
    from energy_pandas_spark.operators.text import langid_ngram_selftrain

    df = _langid_corpus(spark).withColumnRenamed("lang", "language")
    out = langid_ngram_selftrain(df, lang_col="language", top=50)
    assert out.columns == ["doc_id", "language", "lang_pred", "lang_dist"]
    rows = out.collect()
    assert all(r.language == r.lang_pred for r in rows)


def test_langid_selftrain_single_gram_explode(spark):
    """Plan lock for the r3 #6 fix: both the language profiles and the
    per-doc profiles must read the SAME persisted char-gram count
    relation — the lazy plan shows >=2 InMemoryTableScan consumers and
    exactly one Generate (the explode) inside the cached build."""
    from energy_pandas_spark.operators.text import langid_ngram_selftrain

    out = langid_ngram_selftrain(_langid_corpus(spark), top=50, eager=False)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2


def test_langid_ngram_prof_top_smaller_warns(spark):
    """ADVICE r3: profiles trained with a SMALLER top than the scoring
    top must not pass silently (skewed miss penalty)."""
    import warnings

    from energy_pandas_spark.operators.text import (
        langid_ngram,
        train_langid_profiles,
    )

    df = _langid_corpus(spark)
    profiles = train_langid_profiles(df, top=5)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        langid_ngram(df, profiles, top=60).collect()
    assert any("miss penalty" in str(w.message) for w in caught)


def test_strip_templates_metachar_sep_roundtrips(spark):
    """ADVICE r3: sep is documented as a LITERAL separator but was
    passed raw to F.split (a Java regex). A '|' sep must split
    literally and round-trip non-template lines."""
    from energy_pandas_spark.operators.text import strip_templates

    df = spark.createDataFrame(
        [
            (1, "s", "COMMON FOOTER|unique one a.b"),
            (2, "s", "COMMON FOOTER|unique two c.d"),
        ],
        "doc_id long, site string, text string",
    )
    out = {
        r.doc_id: r.text
        for r in strip_templates(df, "site", sep="|").collect()
    }
    assert out == {1: "unique one a.b", 2: "unique two c.d"}


def test_line_dedup_metachar_sep(spark):
    """line_dedup with a regex-metachar sep ('.') treats it literally:
    identical sentences dedup across docs and survivors rejoin with
    the same literal sep."""
    from energy_pandas_spark.operators.text import line_dedup

    df = spark.createDataFrame(
        [(1, "shared line.first unique"), (2, "shared line.second unique")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in line_dedup(df, sep=".").collect()}
    assert out[1] == "shared line.first unique"
    assert out[2] == "second unique"

"""Raw-text corpus ingestion: documents-shaped output, stable ids."""

from __future__ import annotations

from energy_pandas_spark.sources.textcorpus import read_text_corpus


def test_read_text_corpus_lines(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc\nsecond doc\n\nthird doc\n")
    (d / "b.txt").write_text("other file doc\n")

    docs = read_text_corpus(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 4  # the empty line is dropped
    assert {r.text for r in rows} == {
        "first doc", "second doc", "third doc", "other file doc"
    }
    assert all(r.n_chars == len(r.text) for r in rows)
    assert all(r.source.endswith((".txt",)) for r in rows)
    # ids are unique and rerun-stable
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == 4
    again = {r.text: r.doc_id for r in read_text_corpus(spark, str(d)).collect()}
    for r in rows:
        assert again[r.text] == r.doc_id


def test_read_text_corpus_wholefile(spark, tmp_path):
    d = tmp_path / "books"
    d.mkdir()
    (d / "x.txt").write_text("line1\nline2\n")
    (d / "y.txt").write_text("solo")

    docs = read_text_corpus(spark, str(d), doc_per="file").collect()
    assert len(docs) == 2
    by_src = {r.source.rsplit("/", 1)[-1]: r for r in docs}
    assert by_src["x.txt"].text == "line1\nline2\n"
    assert by_src["y.txt"].text == "solo"


def test_read_text_corpus_feeds_pipeline(spark, tmp_path):
    """The ingested frame drives the documents-shaped operators."""
    from energy_pandas_spark.operators.text import quality_score, token_count
    from pyspark.sql import functions as F

    d = tmp_path / "c2"
    d.mkdir()
    (d / "a.txt").write_text("the quick brown fox\njumps over the dog\n")
    docs = read_text_corpus(spark, str(d))
    out = quality_score(docs).withColumn("n_tokens", token_count("text"))
    rows = out.collect()
    assert all(r.n_tokens == 4 for r in rows)
    assert all(0.0 <= r.quality <= 1.0 for r in rows)


def test_vocab_coverage_hand_computed(spark):
    from energy_pandas_spark.operators.text import vocab_coverage

    # corpus tokens: a x4 (df 3), b x3 (df 3), c x1, d x1 -> 9 total
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, "a b d")],
        "doc_id long, text string",
    )
    r = vocab_coverage(df, top=2).collect()[0]
    assert (r.vocab_size, r.covered_tokens, r.total_tokens) == (2, 7, 9)
    assert r.coverage == round(7 / 9, 6)
    # empty corpus: defined, not a division error
    empty = spark.createDataFrame([], "doc_id long, text string")
    r0 = vocab_coverage(empty, top=5).collect()[0]
    assert (r0.covered_tokens is None or r0.covered_tokens == 0) and r0.total_tokens == 0


def test_boilerplate_stats_hand_computed(spark):
    from energy_pandas_spark.operators.text import boilerplate_stats

    # df over 4 docs: "the" in 3 (0.75), "cat" in 2 (0.5), others in 1.
    # df_ratio=0.6 -> boilerplate = {"the"} only.
    df = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the the dog"),
            (2, "the bird"),
            (3, "cat alone"),
            (4, ""),  # empty doc: zeros, no division error
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in boilerplate_stats(df, df_ratio=0.6).collect()
    }
    assert len(out) == 5
    assert (out[0].n_tokens, out[0].boilerplate_tokens) == (3, 1)
    assert (out[1].n_tokens, out[1].boilerplate_tokens) == (3, 2)
    assert (out[2].n_tokens, out[2].boilerplate_tokens) == (2, 1)
    assert (out[3].n_tokens, out[3].boilerplate_tokens) == (2, 0)
    assert (out[4].n_tokens, out[4].boilerplate_tokens) == (0, 0)
    assert out[1].boilerplate_fraction == round(2 / 3, 6)
    assert out[4].boilerplate_fraction == 0.0


def test_bloom_no_false_negatives_and_low_fp():
    import numpy as np

    from energy_pandas_spark.functions.bloom import bloom_hits, build_bloom

    rng = np.random.default_rng(3)
    members = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    bits = build_bloom(members, n_bits=1 << 16, k=4)  # ~13 bits/member
    assert bloom_hits(bits, members, k=4).all()  # no false negatives
    fp = bloom_hits(bits, others, k=4).mean()
    assert fp < 0.02  # ~1% expected at 13 bits/member, k=4


def test_contamination_bloom_matches_exact(spark, sf_dir):
    """The Bloom-prefiltered decontamination is result-identical to the
    exact-join version (no false negatives; survivors re-verify)."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.text import (
        contamination_overlap,
        contamination_overlap_bloom,
    )
    from energy_pandas_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    train = docs.filter(F.col("doc_id") % 10 != 0)
    exact = sorted(map(tuple, contamination_overlap(train, bench, n=3).collect()))
    bloom = sorted(map(tuple, contamination_overlap_bloom(train, bench, n=3).collect()))
    assert exact == bloom
    contaminated = [r for r in exact if r[4]]
    assert len(exact) > 0


def test_chunk_documents_cdc_properties(spark):
    """Boundaries are content-defined: chunks cover the doc exactly,
    empty docs vanish, and an edit far from a boundary leaves the other
    chunks' text identical (the CDC robustness property)."""
    from energy_pandas_spark.operators.text import chunk_documents

    base = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, base), (1, ""), (2, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, target_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 1 not in by_doc  # empty doc -> no rows
    # coverage: concatenating chunks in order reconstructs the tokens
    chunks0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert " ".join(c.chunk_text for c in chunks0) == base
    assert sum(c.n_tokens for c in chunks0) == 200
    assert [c.chunk_idx for c in chunks0] == list(range(len(chunks0)))
    assert len(chunks0) > 5  # expected ~200/8 boundaries
    # single-token doc: one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "solo"

    # CDC robustness: append tokens at the END; the earlier chunks'
    # text is unchanged (a fixed-width chunker would pass this too,
    # so also check an INSERT near the end only disturbs local chunks)
    df2 = spark.createDataFrame(
        [(0, base + " extra tokens here")], "doc_id long, text string"
    )
    chunks0b = sorted(
        chunk_documents(df2, target_tokens=8).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [c.chunk_text for c in chunks0b[:-1]][: len(chunks0) - 1] == [
        c.chunk_text for c in chunks0[:-1]
    ][: len(chunks0) - 1]


def test_hashed_embedding_geometry_and_ann_composition(spark):
    """Identical docs → identical unit vectors; near-dups → high
    cosine; unrelated → low. The column feeds cosine_topk directly."""
    import numpy as np
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.similarity import cosine_topk
    from energy_pandas_spark.operators.text import hashed_embedding

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox leaps over the lazy dog again and again"),
        (3, "completely different content about spark query engines"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hashed_embedding(df, dim=64)
    vecs = {r.doc_id: np.array(r.embedding) for r in emb.collect()}
    assert np.array_equal(vecs[0], vecs[1])
    assert abs(np.linalg.norm(vecs[0]) - 1.0) < 1e-5
    assert np.linalg.norm(vecs[4]) == 0.0
    assert vecs[0] @ vecs[2] > 0.8          # near-dup
    assert vecs[0] @ vecs[3] < 0.5          # unrelated

    corpus = emb.select(F.col("doc_id").alias("vec_id"), "embedding").filter(
        F.col("vec_id") != 4
    )
    queries = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = cosine_topk(corpus, queries, k=3).collect()
    got = [r.vec_id for r in sorted(top, key=lambda r: r.rank)]
    assert set(got[:2]) == {0, 1} and got[2] == 2


def test_null_text_rows_are_safe(spark):
    """NULL text must behave like empty text everywhere (the oracle's
    left-join + coalesce convention), and null quality/token values
    must not crash the token-budget driver walk."""
    from energy_pandas_spark.operators.sampling import select_token_budget
    from energy_pandas_spark.operators.text import (
        boilerplate_stats,
        chunk_documents,
        hashed_embedding,
    )

    df = spark.createDataFrame(
        [(0, "the cat"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    bp = {r.doc_id: r for r in boilerplate_stats(df, df_ratio=0.5).collect()}
    assert (bp[1].n_tokens, bp[1].boilerplate_tokens) == (0, 0)
    assert bp[1].boilerplate_fraction == 0.0

    emb = {r.doc_id: r.embedding for r in hashed_embedding(df, dim=8).collect()}
    assert emb[1] == [0.0] * 8

    assert chunk_documents(df).filter("doc_id = 1").count() == 0

    q = spark.createDataFrame(
        [(0, 0.9, 10), (1, None, None), (2, 0.5, 10)],
        "doc_id long, quality double, tok int",
    )
    kept = select_token_budget(q, 10, "quality", "tok", key="doc_id").collect()
    assert {r.doc_id for r in kept} == {0}  # nulls sink to bucket 0, weigh 0


def test_read_jsonl_corpus(spark, tmp_path):
    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus

    d = tmp_path / "jsonl"
    d.mkdir()
    (d / "part0.jsonl").write_text(
        '{"text": "hello world", "lang": "en"}\n'
        '{"text": "hallo welt", "lang": "de"}\n'
        "{this is not json}\n"
        '{"text": "", "lang": "en"}\n'
    )
    docs = read_jsonl_corpus(spark, str(d), schema="lang STRING")
    rows = docs.collect()
    assert {r.text for r in rows} == {"hello world", "hallo welt"}
    assert all(r.n_chars == len(r.text) for r in rows)
    assert {r.lang for r in rows} == {"en", "de"}
    # rerun-stable ids
    again = {r.text: r.doc_id for r in read_jsonl_corpus(
        spark, str(d), schema="lang STRING").collect()}
    for r in rows:
        assert again[r.text] == r.doc_id


def test_read_jsonl_corpus_keep_corrupt(spark, tmp_path):
    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus

    d = tmp_path / "jsonl2"
    d.mkdir()
    (d / "a.jsonl").write_text('{"text": "fine"}\nnot json at all\n')
    docs = read_jsonl_corpus(spark, str(d), on_corrupt="keep").collect()
    assert len(docs) == 2
    bad = [r for r in docs if r.is_corrupt]
    assert len(bad) == 1 and bad[0].text is None


def test_read_jsonl_corpus_failfast(spark, tmp_path):
    import pytest

    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus

    d = tmp_path / "jsonl3"
    d.mkdir()
    (d / "a.jsonl").write_text('{"text": "fine"}\nbroken\n')
    with pytest.raises(Exception) as exc:
        read_jsonl_corpus(spark, str(d), on_corrupt="fail").collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_read_csv_corpus(spark, tmp_path):
    from energy_pandas_spark.sources.textcorpus import read_csv_corpus

    d = tmp_path / "csv"
    d.mkdir()
    (d / "a.csv").write_text(
        "text,lang\nhello world,en\nhallo welt,de\n,en\n"
    )
    docs = read_csv_corpus(spark, str(d), schema="lang STRING")
    rows = docs.collect()
    assert {r.text for r in rows} == {"hello world", "hallo welt"}
    assert {r.lang for r in rows} == {"en", "de"}
    assert all(r.n_chars == len(r.text) for r in rows)


def test_read_csv_corpus_corrupt_modes(spark, tmp_path):
    import pytest

    from energy_pandas_spark.sources.textcorpus import read_csv_corpus

    d = tmp_path / "csv2"
    d.mkdir()
    # second line has too many fields for the 2-column schema
    (d / "a.csv").write_text('text,n\nfine,1\n"x",2,EXTRA,FIELDS\n')
    ok = read_csv_corpus(spark, str(d), schema="n INT").collect()
    assert [r.text for r in ok] == ["fine"]
    kept = read_csv_corpus(spark, str(d), schema="n INT", on_corrupt="keep").collect()
    assert len(kept) == 2 and sum(r.is_corrupt for r in kept) == 1
    with pytest.raises(Exception):
        read_csv_corpus(spark, str(d), schema="n INT", on_corrupt="fail").collect()


def test_stable_ids_are_split_plan_invariant(spark, tmp_path):
    """The stable-id tier must produce the same id SET no matter how
    the file splits — the default position-salted tier is expected to
    re-key when the split plan changes (that is its documented
    limitation)."""
    import json

    from pyspark.sql import functions as F

    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus

    d = tmp_path / "stable"
    d.mkdir()
    lines = [json.dumps({"text": f"document number {i} body"}) for i in range(40)]
    lines.append(json.dumps({"text": "document number 3 body"}))  # exact repeat
    (d / "a.jsonl").write_text("\n".join(lines) + "\n")

    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        id_sets, pos_sets = [], []
        for mpb in ("128m", "200"):
            spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
            stable = read_jsonl_corpus(spark, str(d), stable_ids=True)
            id_sets.append(sorted(r.doc_id for r in stable.select("doc_id").collect()))
            pos = read_jsonl_corpus(spark, str(d))
            pos_sets.append(sorted(r.doc_id for r in pos.select("doc_id").collect()))
        assert id_sets[0] == id_sets[1]  # layout-invariant
        assert len(set(id_sets[0])) == 41  # repeat line disambiguated by occ
        # the id->text binding is invariant too, not just the id set
        spark.conf.set("spark.sql.files.maxPartitionBytes", "80")
        again = read_jsonl_corpus(spark, str(d), stable_ids=True)
        bind = {(r.doc_id, r.text) for r in again.collect()}
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        base = read_jsonl_corpus(spark, str(d), stable_ids=True)
        assert {(r.doc_id, r.text) for r in base.collect()} == bind
        assert len(pos_sets[0]) == len(pos_sets[1]) == 41  # counts survive
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_id_field_passthrough(spark, tmp_path):
    """id_field hashes the corpus's own key: stable, layout-free, and
    the extra schema column still rides along."""
    import json

    from pyspark.sql import functions as F

    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus

    d = tmp_path / "keyed"
    d.mkdir()
    rows = [{"uid": f"warc-{i:04d}", "text": f"body {i}", "lang": "en"} for i in range(5)]
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    docs = read_jsonl_corpus(
        spark, str(d), schema="uid STRING, lang STRING", id_field="uid"
    )
    got = docs.select("doc_id", "uid").collect()
    expect = {
        r.uid: spark.range(1)
        .select(F.xxhash64(F.lit(r.uid)).alias("h"))
        .collect()[0]
        .h
        for r in got
    }
    assert {r.uid: r.doc_id for r in got} == expect
    assert docs.count() == 5


def test_blocklist_stats_and_filter(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.text import blocklist_filter, blocklist_stats

    df = spark.createDataFrame(
        [
            (1, "clean words only here"),
            (2, "one BAD word appears"),
            (3, "bad bad worse bad"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r for r in blocklist_stats(df, ["bad", "WORSE"]).collect()}
    assert (s[1].n_blocklist_hits, s[1].n_blocklist_terms) == (0, 0)
    assert (s[2].n_blocklist_hits, s[2].n_blocklist_terms) == (1, 1)  # case-folded
    assert (s[3].n_blocklist_hits, s[3].n_blocklist_terms) == (4, 2)
    assert s[3].blocklist_frac == 1.0
    assert (s[4].n_blocklist_hits, s[4].blocklist_frac) == (0, 0.0)
    kept = {r.doc_id for r in blocklist_filter(df, ["bad", "worse"]).collect()}
    assert kept == {1, 4}
    lenient = {r.doc_id for r in blocklist_filter(df, ["bad"], max_hits=1).collect()}
    assert lenient == {1, 2, 4}


def test_html_to_text_extraction(spark):
    from energy_pandas_spark.operators.text import html_to_text

    html = (
        "<html><head><title>T</title><script>var x = '<p>';</script>"
        "<style>p { color: red }</style></head>"
        "<body><!-- hidden --><h1>Big News</h1>"
        "<p>first &amp;amp; second &lt;tag&gt;</p>"
        "<div>alpha <b>bold</b> beta</div>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "no markup")],
                               "doc_id long, text string")
    got = {r.doc_id: r.text for r in html_to_text(df).collect()}
    lines = got[1].split("\n")
    assert lines[0] == "T"
    assert "Big News" in lines
    assert "first &amp; second <tag>" in lines   # &amp;amp; decodes ONCE
    assert "alpha bold beta" in lines
    assert "one" in lines and "two" in lines
    assert "var x" not in got[1] and "color" not in got[1] and "hidden" not in got[1]
    assert got[2] == "" and got[3] == "no markup"


def test_perplexity_buckets_semantics(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.text import (
        bigram_lm_train,
        perplexity_buckets,
    )

    # reference LM = repetitions of one phrase; docs range from pure
    # target phrasing to gibberish -> likelihood separates them
    target = [(100 + i, "the quick brown fox jumps", "en") for i in range(4)]
    docs = spark.createDataFrame(
        target
        + [
            (1, "the quick brown fox jumps", "en"),
            (2, "the quick brown fox sleeps", "en"),
            (3, "quick fox the brown jumps", "en"),
            (4, "zz yy xx ww vv", "en"),
            (5, "aa bb cc dd ee", "en"),
            (6, "the quick brown fox jumps", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    lm = bigram_lm_train(docs.filter(F.col("doc_id") >= 100))
    got = perplexity_buckets(
        docs.filter(F.col("doc_id") < 100), lm, by="lang"
    )
    buckets = {r.doc_id: r.bucket for r in got.collect()}
    scores = {r.doc_id: r.score_q for r in got.collect()}
    # exact-phrase docs must outrank gibberish
    assert buckets[1] == "head" and buckets[6] == "head"
    # all-unseen-bigram docs score identically (1/V per bigram) and sit
    # at the bottom tie: same bucket, never head
    assert buckets[4] == buckets[5] != "head"
    assert scores[4] == scores[5]
    assert scores[1] > scores[4]
    # every bucket value is one of the three labels
    assert set(buckets.values()) <= {"head", "middle", "tail"}


def test_chunk_fixed_overlap_semantics(spark):
    import pytest

    from energy_pandas_spark.operators.text import chunk_fixed

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_fixed(df, size=4, overlap=2).collect()
    )
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "c d e f", 4),
        (1, 2, "e f g h", 4),
        (1, 3, "g h i j", 4),
        (1, 4, "i j", 2),
        (2, 0, "x y", 2),
    ]
    # reconstruction invariant at overlap=0: concatenating chunks in
    # order restores the tokenized document
    flat = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_fixed(df, size=3, overlap=0).collect()
    )
    doc1 = " ".join(t for d, i, t in flat if d == 1)
    assert doc1 == "a b c d e f g h i j"
    with pytest.raises(ValueError):
        chunk_fixed(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_fixed(df, size=0)


def test_source_vocab_overlap_hand_computed(spark):
    from energy_pandas_spark.operators.text import source_vocab_overlap

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "b c d", "s1"),     # s1 vocab {a,b,c,d}
            (3, "c d e", "s2"),     # s2 vocab {c,d,e}
            (4, "x y", "s3"),       # s3 vocab {x,y} (disjoint)
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r.source_a, r.source_b): r for r in source_vocab_overlap(df).collect()}
    r = rows[("s1", "s2")]
    assert (r.vocab_a, r.vocab_b, r.n_shared) == (4, 3, 2)
    assert r.jaccard == round(2 / 5, 6)
    # disjoint pairs simply do not appear (no shared terms)
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows


def test_vocabulary_by_group_hand_computed(spark):
    from energy_pandas_spark.operators.text import vocabulary_by_group

    df = spark.createDataFrame(
        [
            (1, "a a b", "s1"),
            (2, "a c", "s1"),
            (3, "z z z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (r.source, r.rank, r.term, r.doc_freq, r.total_count)
        for r in vocabulary_by_group(df, top=2).collect()
    )
    # s1: a in 2 docs (3 occurrences), b/c tie at df=1 -> 'b' wins by term asc
    assert got == [
        ("s1", 1, "a", 2, 3),
        ("s1", 2, "b", 1, 1),
        ("s2", 1, "z", 1, 3),
    ]


def test_exact_substring_dedup_hand_built(spark):
    import pytest
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.text import exact_substring_dedup

    boiler = "all rights reserved contact us today"  # 6 tokens
    rows = [
        (1, f"alpha beta gamma {boiler}"),
        (2, f"{boiler} delta epsilon zeta"),
        (3, "unique words that appear nowhere else at all"),
        (4, "tiny doc"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in exact_substring_dedup(df, k=6).collect()}

    # doc 1 holds the globally-first occurrence (smallest (id,pos)) ->
    # its text survives intact
    assert out[1].text == f"alpha beta gamma {boiler}"
    assert out[1].n_tokens_removed == 0
    # doc 2's copy of the span is cut; its own tail survives
    assert out[2].text == "delta epsilon zeta"
    assert (out[2].n_tokens_before, out[2].n_tokens_removed) == (9, 6)
    # untouched docs round-trip (tokenized join)
    assert out[3].text == rows[2][1] and out[3].n_tokens_removed == 0
    assert out[4].text == "tiny doc"  # shorter than k -> verbatim
    assert out[5].text == "" and out[5].n_tokens_before == 0

    # WITHIN-doc repetition: the same k-span twice in one doc loses its
    # second occurrence
    rep = spark.createDataFrame(
        [(7, "one two three four one two three four tail")],
        "doc_id long, text string",
    )
    r7 = exact_substring_dedup(rep, k=4).collect()[0]
    assert r7.text == "one two three four tail"
    assert r7.n_tokens_removed == 4

    with pytest.raises(ValueError):
        exact_substring_dedup(df, k=0)
    with pytest.raises(ValueError):
        exact_substring_dedup(df, min_count=1)


def test_mixed_language_stats(spark):
    from energy_pandas_spark.operators.text import mixed_language_stats

    en = "the quick fox and it is that for"
    de = "der hund und die katze ist nicht ein"
    rows = [
        (1, f"{en}\n{en}\n{en}"),          # pure en
        (2, f"{en}\n{de}"),                # 50/50 -> mixed at 0.7
        (3, f"{en}\n{en}\n{de}"),          # 2/3 en -> still under 0.7
        (4, f"{en}\n{en}\n{en}\n{de}"),    # 3/4 = 0.75 -> NOT mixed
        (5, ""),                           # zero lines
        (6, "zzz qqq vvv"),                # no stopword hits -> 'und'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in mixed_language_stats(df).collect()}
    assert (got[1].majority_lang, got[1].is_mixed) == ("en", False)
    assert got[1].majority_share == 1.0
    assert got[2].is_mixed and got[2].n_langs == 2
    assert got[3].is_mixed and got[3].majority_lang == "en"
    assert not got[4].is_mixed and got[4].majority_share == 0.75
    assert (got[5].n_lines, got[5].majority_lang, got[5].is_mixed) == (0, "und", False)
    assert got[6].majority_lang == "und" and not got[6].is_mixed


def test_pii_stats_matches_redactor(spark):
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.text import pii_stats, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b@example.com or c@d.org from 10.0.0.1"),
            (2, "call +1 (415) 555-0100 now"),
            (3, "clean text"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r for r in pii_stats(df).collect()}
    assert (s[1].n_email, s[1].n_ip, s[1].n_phone, s[1].n_pii) == (2, 1, 0, 3)
    assert (s[2].n_phone, s[2].n_pii) == (1, 1)
    assert s[3].n_pii == 0 and s[4].n_pii == 0
    r = {x.doc_id: x for x in redact_pii(df).collect()}
    for i in (1, 2, 3):
        assert (s[i].n_email, s[i].n_ip, s[i].n_phone) == (
            r[i].n_email, r[i].n_ip, r[i].n_phone
        )


def test_compression_ratio_orders_repetitiveness(spark):
    import random

    from energy_pandas_spark.operators.text import compression_ratio

    random.seed(7)
    noise = " ".join(
        "".join(random.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(8))
        for _ in range(120)
    )
    prose = (
        "the quick brown fox jumps over the lazy dog while the cat naps "
        "quietly near a warm window and the afternoon light fades slowly "
    ) * 10
    boiler = "buy now click here " * 100
    df = spark.createDataFrame(
        [(1, noise), (2, prose), (3, boiler), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in compression_ratio(df).collect()}
    # repetition orders strictly: boilerplate << prose << random noise
    assert got[3].compression_ratio < got[2].compression_ratio < got[1].compression_ratio
    assert got[1].compression_ratio > 0.5  # noise barely compresses
    assert got[3].compression_ratio < 0.05  # pure boilerplate collapses
    assert got[4].compression_ratio == 1.0 and got[5].compression_ratio == 1.0
    assert got[2].raw_bytes == len(prose.encode())
    # deterministic across runs
    again = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    assert again == {k: v.compression_ratio for k, v in got.items()}


def test_collocations_pmi_ordering(spark):
    import math

    from energy_pandas_spark.operators.text import collocations

    # "san francisco" always adjacent (strong collocation); "the" pairs
    # with everything (weak PMI despite high count)
    rows = [(i, "the visit to san francisco was the best trip in the city") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations(df, top=10, min_count=2).collect()
    pairs = {(r.w1, r.w2): r for r in got}
    assert ("san", "francisco") in pairs
    sf = pairs[("san", "francisco")]
    # hand-compute: every bigram count is 6x its per-doc count; PMI of
    # a deterministic pair: c12=6, c1(left 'san')=6, c2(right 'francisco')=6, T=66
    assert sf.c12 == 6
    assert sf.pmi_q == round(1024 * math.log(6 * 66 / (6 * 6)))
    # 'the'-led pairs score lower than the exclusive pair
    the_pairs = [r for r in got if r.w1 == "the"]
    assert all(sf.pmi_q > r.pmi_q for r in the_pairs)
    # ranks contiguous from 1
    assert sorted(r.rank for r in got) == list(range(1, len(got) + 1))

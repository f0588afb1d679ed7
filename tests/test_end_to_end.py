"""Full-product integration story: raw JSONL corpus in, training-ready
WebDataset shards out — every stage an engine operator, every boundary
checked. This is the flow README's quickstart describes, executed for
real:

  read_jsonl_corpus -> gopher_filter -> line_dedup (corpus-wide)
  -> dedup_exact keep-first -> dsir_score -> hash_split
  -> write_webdataset (train split) -> read_webdataset round-trip
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

HEADER = "subscribe to the newsletter of this site"
GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog and that is a fine "
    "thing to have said with some more words of filler so the gopher "
    "word count rule passes for this document body easily enough "
    "because it keeps going and going with the usual test filler terms"
)


def test_jsonl_to_webdataset_pipeline(spark, tmp_path):
    from energy_pandas_spark.operators.sampling import hash_split
    from energy_pandas_spark.operators.text import (
        dsir_score,
        dsir_weights,
        gopher_filter,
        line_dedup,
    )
    from energy_pandas_spark.sources.textcorpus import read_jsonl_corpus
    from energy_pandas_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    # --- raw corpus: 30 docs, some sharing a boilerplate header, one
    # exact dup pair, one junk doc, one malformed line -----------------
    src = tmp_path / "raw"
    src.mkdir()
    lines = []
    for i in range(28):
        body = f"{GOOD_BODY} variant {i}"
        text = f"{HEADER}\n{body}" if i % 2 == 0 else body
        lines.append(json.dumps({"text": text, "lang": "en"}))
    lines.append(json.dumps({"text": lines and f"{GOOD_BODY} variant 0", "lang": "en"}))
    lines.append(json.dumps({"text": "#### ####", "lang": "en"}))  # junk
    lines.append("{broken json")
    (src / "part0.jsonl").write_text("\n".join(lines) + "\n")

    # stable_ids: the whole chain below (line-dedup winners, exact-dedup
    # keep-first, hash_split) is keyed on doc_id, so the assertions are
    # only deterministic if ids don't depend on Spark's file-split plan
    docs = read_jsonl_corpus(spark, str(src), schema="lang STRING", stable_ids=True)
    assert docs.count() == 30  # malformed line dropped

    # --- quality gate: junk doc out ----------------------------------
    gated = gopher_filter(docs, min_words=30, min_stopword_hits=2)
    assert gated.count() == 29

    # --- corpus-wide line dedup: the header survives exactly once ----
    deduped = line_dedup(gated, drop_empty=True)
    header_carriers = deduped.filter(
        F.col("text").contains(HEADER)
    ).count()
    assert header_carriers == 1

    # --- exact dedup keep-first on the rebuilt text ------------------
    digest = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    win = (
        deduped.withColumn("__d", digest)
        .groupBy("__d")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    unique = deduped.join(win.select("doc_id"), "doc_id", "left_semi")
    # the "variant 0" body existed three times (with header, bare, and
    # the appended dup); after line-dedup + exact dedup one bare copy
    # and the header-carrying original remain
    assert unique.count() == 28

    # --- DSIR scoring attaches importance ----------------------------
    target = unique.limit(5)
    w = dsir_weights(unique, target, n_buckets=256)
    scored = dsir_score(unique, w, n_buckets=256)
    assert scored.filter(F.col("importance_q").isNull()).count() == 0

    # --- deterministic split + shard the train set -------------------
    split = hash_split(scored, key="doc_id")
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 28
    train = split.filter(F.col("split") == "train").select(
        "doc_id", "text", F.col("score").cast("string").alias("score")
    )
    out = str(tmp_path / "shards")
    manifest = write_webdataset(
        train, out, "doc_id", {"text": "txt", "score": "score.txt"}, n_shards=2
    )
    assert sum(r.n_samples for r in manifest.collect()) == train.count()

    # --- loader-side round trip --------------------------------------
    back = read_webdataset(spark, out, {"text": "txt", "score": "score.txt"})
    src_rows = {r.doc_id: r.text for r in train.collect()}
    got_rows = {r.key: r.text for r in back.collect()}
    assert got_rows == src_rows

    # multi-part extensions decode as text, and scores survive verbatim
    src_scores = {r.doc_id: r.score for r in train.collect()}
    got_scores = {r.key: r.score for r in back.collect()}
    assert got_scores == src_scores


def test_crawl_to_corpus_chain(spark, tmp_path):
    """The crawl front end as ONE chain: WET shards stream in ->
    URL-dedup ingest (mirrors/tracking relinks dropped by canonical
    URL, text untouched) -> MinHash near-dup ingest (content-level) —
    the stage-boundary composition where each stage verifies in
    isolation but bugs hide between them."""
    import gzip

    from energy_pandas_spark.sources.wet import encode_warc, stream_wet_corpus
    from energy_pandas_spark.streaming.ingest import (
        make_neardup_ingest_writer,
        read_corpus,
    )
    from energy_pandas_spark.streaming.url_ingest import (
        read_url_corpus,
        url_dedup_ingest,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox leaps over the lazy dog again and again"
    other = "completely different content about spark query engines and shuffles"
    third = "yet another unrelated document mentioning catalysts and codegen"
    shards = {
        "s1.wet.gz": [
            ("<urn:uuid:a>", "http://www.example.com/p?utm_source=x",
             "2024-01-01T00:00:00Z", base),
            ("<urn:uuid:b>", "http://other.org/q",
             "2024-01-01T00:00:00Z", other),
        ],
        "s2.wet.gz": [
            # URL dup of <a> with DIFFERENT text: only the URL stage
            # can drop it
            ("<urn:uuid:c>", "http://example.com/p/",
             "2024-01-02T00:00:00Z", third),
            # new URL, text NEAR-dup of <a>: only the content stage
            # can drop it
            ("<urn:uuid:d>", "http://third.net/r",
             "2024-01-02T00:00:00Z", near),
        ],
    }
    wet_dir = tmp_path / "wet"
    wet_dir.mkdir()
    for name, recs in shards.items():
        (wet_dir / name).write_bytes(gzip.compress(encode_warc(recs)))

    url_corpus = str(tmp_path / "url_corpus")
    q = url_dedup_ingest(
        stream_wet_corpus(spark, str(wet_dir) + "/*.wet.gz",
                          max_files_per_trigger=1),
        url_corpus,
        str(tmp_path / "url_store"),
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    stage1 = read_url_corpus(spark, url_corpus)
    assert {r.record_id for r in stage1.collect()} == {
        "<urn:uuid:a>", "<urn:uuid:b>", "<urn:uuid:d>"
    }

    w = make_neardup_ingest_writer(
        str(tmp_path / "corpus"), str(tmp_path / "bands"),
        num_hashes=64, bands=32, shingle_size=2, threshold=0.3,
    )
    w(stage1, 0)
    final = read_corpus(spark, str(tmp_path / "corpus"))
    got = {r.record_id for r in final.collect()}
    # the a~d near-dup cluster keeps exactly ONE survivor (smallest
    # content-addressed doc_id — either record); b always survives
    assert "<urn:uuid:b>" in got and len(got) == 2
    assert len(got & {"<urn:uuid:a>", "<urn:uuid:d>"}) == 1


def test_web_front_half_unmasks_cross_site_duplicates(spark):
    """Two sites republish the SAME prose wrapped in different nav/
    footer chrome and per-site boilerplate lines. On raw HTML, exact
    dedup sees different byte streams and drops nothing; after
    prepare_web_corpus (hygiene -> jusText extraction -> per-site
    template strip) the pages reduce to identical prose and the
    cross-site duplicate falls out of plain exact dedup — the whole
    point of running the front half before fingerprinting."""
    from energy_pandas_spark.operators.dedup import dedup_exact
    from energy_pandas_spark.operators.pipeline import prepare_web_corpus

    prose = ("It is the case that a good result of the work is in the "
             "text and that it is for a test of the whole chain.")
    uniq = [f"And it is also true that page {i} has its own words in it."
            for i in range(8)]

    def a_page(i, body):
        return (
            '<nav><a href="/">Home of site A</a> <a href="/x">All of A</a></nav>'
            f"<p>\t {body}</p>"
            "<p>A Corp all rights reserved forever and ever.</p>"
        )

    def b_page(i, body):
        return (
            '<div><a href="/b">B net navigation here</a></div>'
            f"<p>{body}</p>"
            "<p>The B net footer line of the site is here.</p>"
        )

    rows = [(1, "a.com", a_page(1, prose))]
    rows += [(i, "a.com", a_page(i, uniq[i])) for i in (2, 3, 4)]
    rows += [(5, "b.net", b_page(5, prose))]
    rows += [(i, "b.net", b_page(i, uniq[i])) for i in (6, 7)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")

    # raw HTML: byte streams all differ -> nothing to dedup
    assert dedup_exact(df).count() == 7

    prepared = prepare_web_corpus(df, "domain")
    texts = {r.doc_id: r.text for r in prepared.collect()}
    # chrome + per-site templates gone; shared prose now IDENTICAL
    assert texts[1] == texts[5] == prose
    assert "Home of site A" not in texts[2]
    assert "rights reserved" not in texts[2]
    assert "footer line" not in texts[6]
    survivors = dedup_exact(prepared)
    assert survivors.count() == 6  # the cross-site duplicate collapsed
    ids = {r.doc_id for r in survivors.collect()}
    assert 1 in ids and 5 not in ids  # smallest id wins the shared prose

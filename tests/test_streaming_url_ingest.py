"""Streaming cross-batch URL dedup (streaming/url_ingest.py)."""

from __future__ import annotations

import pytest

from energy_pandas_spark.streaming.url_ingest import (
    make_url_dedup_ingest_writer,
    read_url_corpus,
)


@pytest.fixture()
def writer_and_paths(tmp_path):
    corpus = str(tmp_path / "corpus")
    urls = str(tmp_path / "urls")
    return make_url_dedup_ingest_writer(corpus, urls), corpus, urls


def test_url_ingest_dedups_within_and_across_batches(spark, writer_and_paths):
    w, corpus_path, urls_path = writer_and_paths
    b0 = spark.createDataFrame(
        [
            (1, "https://www.example.com/p?utm_source=a", "first copy"),
            (2, "https://example.com/p", "same page, tracking-free"),
            (3, "https://other.org/q", "different page"),
            (4, "garbage", "no url"),
        ],
        "doc_id long, url string, text string",
    )
    w(b0, 0)
    got0 = {r.doc_id for r in read_url_corpus(spark, corpus_path).collect()}
    # 1 and 2 share a canonical URL -> smallest id wins; garbage kept
    assert got0 == {1, 3, 4}

    b1 = spark.createDataFrame(
        [
            (10, "https://example.com/p/", "late mirror -> rejected"),
            (11, "https://example.com/new", "genuinely new"),
            (12, "junk", "another no-url row"),
        ],
        "doc_id long, url string, text string",
    )
    w(b1, 1)
    got1 = {r.doc_id for r in read_url_corpus(spark, corpus_path).collect()}
    assert got1 == {1, 3, 4, 11, 12}


def test_url_ingest_replay_idempotent(spark, writer_and_paths):
    w, corpus_path, urls_path = writer_and_paths
    b0 = spark.createDataFrame(
        [(1, "https://a.io/x", "t")], "doc_id long, url string, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "https://a.io/y", "t"), (3, "https://a.io/x#f", "dup of 1")],
        "doc_id long, url string, text string",
    )
    w(b0, 0)
    w(b1, 1)
    before = sorted(map(tuple, read_url_corpus(spark, corpus_path).collect()))
    w(b1, 1)  # replay the last batch
    after = sorted(map(tuple, read_url_corpus(spark, corpus_path).collect()))
    assert after == before
    assert {r[0] for r in after} == {1, 2}
    store = spark.read.parquet(urls_path)
    assert store.count() == store.select("h").distinct().count() == 2


def test_url_ingest_quality_survivor(spark, tmp_path):
    w = make_url_dedup_ingest_writer(
        str(tmp_path / "c"), str(tmp_path / "u"), quality_col="q"
    )
    b0 = spark.createDataFrame(
        [
            (1, "https://site.io/a", 0.2, "low"),
            (2, "https://www.site.io/a", 0.9, "high"),
        ],
        "doc_id long, url string, q double, text string",
    )
    w(b0, 0)
    got = read_url_corpus(spark, str(tmp_path / "c")).collect()
    assert [r.doc_id for r in got] == [2]


def test_url_ingest_streaming_end_to_end(spark, tmp_path):
    from energy_pandas_spark.streaming.url_ingest import url_dedup_ingest

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "https://www.example.com/p", "a"),
            (2, "https://example.com/p#frag", "b"),
            (3, "https://example.com/other", "c"),
        ],
        "doc_id long, url string, text string",
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, url string, text string"
    ).parquet(src)
    q = url_dedup_ingest(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "urls"),
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(300)
    got = {
        r.doc_id for r in read_url_corpus(spark, str(tmp_path / "corpus")).collect()
    }
    assert got == {1, 3}

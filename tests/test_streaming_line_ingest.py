"""Streaming cross-batch line dedup (streaming/line_ingest.py)."""

from __future__ import annotations

import pytest

from energy_pandas_spark.streaming.line_ingest import (
    make_line_dedup_ingest_writer,
    read_line_corpus,
)


@pytest.fixture()
def writer_and_paths(tmp_path):
    corpus = str(tmp_path / "corpus")
    digests = str(tmp_path / "digests")
    return make_line_dedup_ingest_writer(corpus, digests), corpus, digests


HEADER = "subscribe to our newsletter"
FOOTER = "all rights reserved"


def test_line_ingest_dedups_within_and_across_batches(spark, writer_and_paths):
    w, corpus_path, digests_path = writer_and_paths
    b0 = spark.createDataFrame(
        [
            (0, f"{HEADER}\nalpha body zero\n{FOOTER}"),
            (1, f"{HEADER}\nbeta body one"),
        ],
        "doc_id long, text string",
    )
    w(b0, 0)
    got0 = {r.doc_id: r.text for r in read_line_corpus(spark, corpus_path).collect()}
    assert got0[0] == f"{HEADER}\nalpha body zero\n{FOOTER}"
    assert got0[1] == "beta body one"  # header deduped within the batch

    b1 = spark.createDataFrame(
        [
            (10, f"{HEADER}\n{FOOTER}"),  # nothing novel -> dropped
            (11, f"{FOOTER}\ngamma body two"),
        ],
        "doc_id long, text string",
    )
    w(b1, 1)
    got1 = {r.doc_id: r.text for r in read_line_corpus(spark, corpus_path).collect()}
    assert set(got1) == {0, 1, 11}
    assert got1[11] == "gamma body two"  # footer rejected against history


def test_line_ingest_replay_idempotent(spark, writer_and_paths):
    w, corpus_path, digests_path = writer_and_paths
    b0 = spark.createDataFrame(
        [(0, f"{HEADER}\nalpha")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, f"{HEADER}\nbeta")], "doc_id long, text string"
    )
    w(b0, 0)
    w(b1, 1)
    before = sorted(
        map(tuple, read_line_corpus(spark, corpus_path).collect())
    )
    w(b1, 1)  # replay the last batch
    after = sorted(map(tuple, read_line_corpus(spark, corpus_path).collect()))
    assert after == before
    digests = spark.read.parquet(digests_path)
    assert digests.count() == digests.select("h").distinct().count()


def test_line_ingest_blank_lines_survive(spark, writer_and_paths):
    w, corpus_path, _ = writer_and_paths
    w(
        spark.createDataFrame(
            [(0, "a\n\nb"), (1, "a\n\nc")], "doc_id long, text string"
        ),
        0,
    )
    got = {r.doc_id: r.text for r in read_line_corpus(spark, corpus_path).collect()}
    assert got[0] == "a\n\nb"
    assert got[1] == "\nc"


def test_line_ingest_streaming_end_to_end(spark, tmp_path):
    from energy_pandas_spark.streaming.line_ingest import line_dedup_ingest

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (0, f"{HEADER}\nunique zero"),
            (1, f"{HEADER}\nunique one"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = line_dedup_ingest(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "digests"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.text
        for r in read_line_corpus(spark, str(tmp_path / "corpus")).collect()
    }
    assert set(got) == {0, 1}
    texts = sorted(got.values())
    # exactly one of the two kept the header line
    assert sum(HEADER in t for t in texts) == 1


def test_line_ingest_pre_filter_gate(spark, tmp_path):
    from energy_pandas_spark.operators.text import gopher_filter
    from energy_pandas_spark.streaming.line_ingest import (
        make_line_dedup_ingest_writer,
    )

    w = make_line_dedup_ingest_writer(
        str(tmp_path / "corpus"),
        str(tmp_path / "digests"),
        pre_filter=lambda df: gopher_filter(
            df, min_words=3, min_stopword_hits=1
        ),
    )
    b0 = spark.createDataFrame(
        [
            (0, "the good line stays here"),
            (1, "##"),  # fails the gate: too short, no stopwords
        ],
        "doc_id long, text string",
    )
    w(b0, 0)
    got = {
        r.doc_id for r in read_line_corpus(spark, str(tmp_path / "corpus")).collect()
    }
    assert got == {0}
    # the rejected doc left NO digests (only doc 0's single line landed)
    digests = spark.read.parquet(str(tmp_path / "digests"))
    assert digests.count() == 1
    # and a later passing doc still lands
    b1 = spark.createDataFrame(
        [(10, "the brand new line is here")], "doc_id long, text string"
    )
    w(b1, 1)
    got1 = {
        r.doc_id for r in read_line_corpus(spark, str(tmp_path / "corpus")).collect()
    }
    assert got1 == {0, 10}


def test_line_ingest_keep_empty_docs(spark, tmp_path):
    """drop_empty=False mirrors the batch line_dedup contract: a doc
    whose every line was already in the store stays in the corpus with
    empty text (0 lines kept) instead of being silently dropped."""
    w = make_line_dedup_ingest_writer(
        str(tmp_path / "corpus"),
        str(tmp_path / "digests"),
        drop_empty=False,
    )
    w(
        spark.createDataFrame(
            [(0, f"{HEADER}\nalpha body")], "doc_id long, text string"
        ),
        0,
    )
    w(
        spark.createDataFrame(
            [(10, HEADER), (11, f"{HEADER}\nbeta body")],
            "doc_id long, text string",
        ),
        1,
    )
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    got = {r.doc_id: (r.text, r.n_lines_kept) for r in corpus.collect()}
    assert set(got) == {0, 10, 11}
    assert got[0] == (f"{HEADER}\nalpha body", 2)
    assert got[10] == ("", 0)  # nothing novel, still present
    assert got[11] == ("beta body", 1)

"""Streaming passage-dup ingest (streaming/winnow_ingest.py): the
corpus rejects documents that copy a passage from history even when
globally dissimilar, replays are idempotent, and the fingerprint
store stays consistent with the accepted corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.streaming.ingest import read_corpus
from energy_pandas_spark.streaming.winnow_ingest import (
    make_winnow_ingest_writer,
    read_fp_store,
)

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOC_A = f"opening words {PASSAGE} closing words here"
# globally different doc that quotes the same passage
DOC_QUOTE = f"unrelated intro sentence {PASSAGE} and a totally different tail"
DOC_OTHER = "spark shuffles exchange partitions codegen stages adaptive plans"
DOC_THIRD = "streams watermark state store checkpoints replay semantics matter"


@pytest.fixture()
def writer_and_paths(tmp_path):
    corpus = str(tmp_path / "corpus")
    fps = str(tmp_path / "fps")
    w = make_winnow_ingest_writer(corpus, fps, min_shared=2)
    return w, corpus, fps


def test_passage_dup_rejected_within_and_across_batches(
    spark, writer_and_paths
):
    w, corpus_path, fps_path = writer_and_paths

    b0 = spark.createDataFrame(
        [(0, DOC_A), (1, DOC_QUOTE), (2, DOC_OTHER)],
        "doc_id long, text string",
    )
    w(b0, 0)
    got0 = {r.doc_id for r in read_corpus(spark, corpus_path).collect()}
    assert got0 == {0, 2}  # in-batch passage copy dropped, smallest id kept

    # batch 1: another quote of the accepted passage, plus a novel doc
    b1 = spark.createDataFrame(
        [(10, f"fresh frame {PASSAGE} different ending"), (11, DOC_THIRD)],
        "doc_id long, text string",
    )
    w(b1, 1)
    got1 = {r.doc_id for r in read_corpus(spark, corpus_path).collect()}
    assert got1 == {0, 2, 11}

    # store covers exactly the accepted corpus
    fps = read_fp_store(spark, fps_path)
    assert {
        r.doc_id for r in fps.select("doc_id").distinct().collect()
    } == got1


def test_replay_is_idempotent(spark, writer_and_paths):
    w, corpus_path, fps_path = writer_and_paths
    b0 = spark.createDataFrame(
        [(0, DOC_A), (1, DOC_OTHER)], "doc_id long, text string"
    )
    w(b0, 0)
    b1 = spark.createDataFrame(
        [(10, DOC_THIRD)], "doc_id long, text string"
    )
    w(b1, 1)
    before = sorted(
        (r.doc_id, r.text)
        for r in read_corpus(spark, corpus_path).collect()
    )
    n_fps_before = read_fp_store(spark, fps_path).count()
    # crash-replay batch 1: same batch id, same data
    w(b1, 1)
    after = sorted(
        (r.doc_id, r.text)
        for r in read_corpus(spark, corpus_path).collect()
    )
    assert after == before
    assert read_fp_store(spark, fps_path).count() == n_fps_before
    # the replayed batch was NOT rejected against its own half-written
    # fingerprints: doc 10 is still in the corpus
    assert any(i == 10 for i, _ in after)


def test_globally_dissimilar_quote_is_the_point(spark, writer_and_paths):
    # sanity: the quote doc shares < 30% of its tokens with DOC_A
    # overall, so a global-similarity dedup at a high threshold would
    # accept it; the winnow ingest rejects it on the copied passage
    w, corpus_path, fps_path = writer_and_paths
    a = set(DOC_A.split())
    q = set(DOC_QUOTE.split())
    assert len(a & q) / len(a | q) < 0.6  # not globally near-identical
    w(
        spark.createDataFrame([(0, DOC_A)], "doc_id long, text string"),
        0,
    )
    w(
        spark.createDataFrame([(1, DOC_QUOTE)], "doc_id long, text string"),
        1,
    )
    got = {r.doc_id for r in read_corpus(spark, corpus_path).collect()}
    assert got == {0}

"""Gopher-style rule-based quality filtering."""

from __future__ import annotations

from pyspark.sql import Row

from energy_pandas_spark.operators.text import gopher_filter, gopher_rules


def _docs(spark):
    good = " ".join(["the quick brown fox jumps over the lazy dog and that"] * 6)
    return spark.createDataFrame(
        [
            Row(doc_id=0, text=good),  # passes everything (66 words)
            Row(doc_id=1, text="too short to have fifty words"),
            Row(doc_id=2, text=" ".join(["####"] * 60)),  # symbols, no letters
            Row(doc_id=3, text=" ".join(["supercalifragilistic"] * 60)),  # long words, no stopwords
            Row(doc_id=4, text="- one\n- two\n- three\nthe end of and that have with " + " ".join(["word"] * 50)),
            Row(doc_id=5, text=None),
        ]
    )


def test_gopher_rules_outcomes(spark):
    out = {r.doc_id: r for r in gopher_rules(_docs(spark)).collect()}
    assert out[0].passes_gopher
    assert out[0].r_word_count and out[0].r_stopwords and out[0].r_alpha_words
    # doc 1: word count fails, everything char-level passes
    assert not out[1].r_word_count and not out[1].passes_gopher
    # doc 2: symbol ratio and alpha-word fraction both fail
    assert not out[2].r_symbol_ratio and not out[2].r_alpha_words
    # doc 3: mean word length (20) and stopword rules fail
    assert not out[3].r_mean_word_len and not out[3].r_stopwords
    assert out[3].r_word_count
    # doc 4: bullet lines are 3 of 4 (< 90%), passes that rule
    assert out[4].r_bullet_lines
    assert out[4].n_bullet_lines == 3
    # null text: zero words
    assert out[5].n_words == 0 and not out[5].passes_gopher


def test_gopher_filter_keeps_schema(spark):
    df = _docs(spark)
    kept = gopher_filter(df)
    assert kept.columns == df.columns
    assert {r.doc_id for r in kept.collect()} == {0, 4}


def test_gopher_threshold_overrides(spark):
    out = gopher_rules(_docs(spark), min_words=5, min_stopword_hits=1)
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].r_word_count  # 6 words >= 5 now
    assert got[1].r_stopwords  # "to" hits with min 1


def test_gopher_counts_exact(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="see spot run... … ## the be to of and")]
    )
    r = gopher_rules(df).collect()[0]
    assert r.n_symbol_chars == 1 + 1 + 2  # one "...", one unicode, two '#'
    assert r.n_stopword_hits == 5
    assert r.n_alpha_words == 8  # all 10 tokens except "…" and "##"

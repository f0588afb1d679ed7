"""Unigram-LM tokenizer tests (operators/unigram.py): lossless
segmentation, determinism, distributed/local bit-equality, and a
pure-Python EM replay."""

from __future__ import annotations

import math

import pytest

from energy_pandas_spark.operators.unigram import (
    UNIGRAM_QUANT,
    _prune,
    _rescore,
    _viterbi,
    train_unigram,
    unigram_encode,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cats sat on the mats"),
    (2, "concatenate the catalogue"),
    (3, "the the the cat cat mat"),
    (4, "unrelated words entirely different here"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


class TestViterbi:
    def test_lossless_and_deterministic(self):
        scores = _rescore({"cat": 10, "c": 1, "a": 1, "t": 1, "s": 1})
        for w in ("cat", "cats", "catcat", "tact"):
            segs = _viterbi(w, scores, 8)
            assert "".join(segs) == w
            assert segs == _viterbi(w, scores, 8)

    def test_prefers_high_probability_piece(self):
        scores = _rescore({"cat": 100, "c": 1, "a": 1, "t": 1})
        assert _viterbi("cat", scores, 8) == ["cat"]

    def test_tie_prefers_fewer_pieces(self):
        # "ab" piece and chars score so that ab == a+b exactly
        scores = {"ab": -10, "a": -5, "b": -5}
        assert _viterbi("ab", scores, 8) == ["ab"]

    def test_oov_char_survives(self):
        scores = _rescore({"a": 1, "b": 1})
        assert _viterbi("axb", scores, 8) == ["a", "x", "b"]


class TestTrain:
    def test_vocab_contract(self, spark):
        v = train_unigram(_docs(spark), vocab_size=40, n_iter=2)
        rows = v.collect()
        pieces = [r["piece"] for r in rows]
        assert len(pieces) == len(set(pieces)) <= 40
        # all single chars of the corpus survive (coverage)
        chars = {c for _, t in CORPUS for c in t.replace(" ", "")}
        assert chars <= set(pieces)
        # ordered count desc, piece asc; scores are valid quantized logs
        key = [(-r["count"], r["piece"]) for r in rows]
        assert key == sorted(key)
        for r in rows:
            assert r["logprob_q"] < 0

    def test_frequent_word_becomes_piece(self, spark):
        v = train_unigram(_docs(spark), vocab_size=40, n_iter=3)
        assert "the" in {r["piece"] for r in v.collect()}

    def test_local_and_distributed_bit_equal(self, spark):
        docs = _docs(spark)
        a = train_unigram(docs, vocab_size=40, n_iter=2)
        b = train_unigram(
            docs, vocab_size=40, n_iter=2, driver_vocab_threshold=0
        )
        assert [tuple(r) for r in a.collect()] == [
            tuple(r) for r in b.collect()
        ]

    def test_em_replay_matches(self, spark):
        """Full pure-Python EM replay: seed -> (rescore, viterbi-count,
        prune) x n must reproduce the operator's vocabulary exactly."""
        from collections import Counter

        docs = _docs(spark)
        wc = Counter(w for _, t in CORPUS for w in t.lower().split())
        counts: dict[str, int] = {}
        for w, c in wc.items():
            for i in range(len(w)):
                for ln in range(1, min(8, len(w) - i) + 1):
                    counts[w[i : i + ln]] = counts.get(w[i : i + ln], 0) + c
        counts = _prune(counts, 20_000)
        size = len(counts)
        for _ in range(2):
            scores = _rescore(counts)
            new: dict[str, int] = {}
            for w, c in wc.items():
                for p in _viterbi(w, scores, 8):
                    new[p] = new.get(p, 0) + c
            for p in list(counts):
                if len(p) == 1:
                    new.setdefault(p, 0)
            size = max(40, int(size * 0.75))
            counts = _prune(new, size)
        counts = _prune(counts, 40)
        scores = _rescore(counts)
        want = sorted(
            ((p, c, scores[p]) for p, c in counts.items()),
            key=lambda r: (-r[1], r[0]),
        )
        got = [tuple(r) for r in train_unigram(docs, 40, n_iter=2).collect()]
        assert got == want


class TestEncode:
    def test_lossless_roundtrip(self, spark):
        docs = _docs(spark)
        v = train_unigram(docs, vocab_size=40, n_iter=2)
        enc = {r["doc_id"]: r for r in unigram_encode(docs, v).collect()}
        for i, text in CORPUS:
            words = text.lower().split()
            assert "".join(enc[i]["pieces"]) == "".join(words)
            assert enc[i]["n_pieces"] == len(enc[i]["pieces"])
            # at least as many pieces as words, at most chars
            assert len(words) <= enc[i]["n_pieces"] <= sum(map(len, words))

    def test_oov_document(self, spark):
        docs = _docs(spark)
        v = train_unigram(docs, vocab_size=40, n_iter=1)
        oov = spark.createDataFrame([(9, "zzz qqq")], "doc_id long, text string")
        row = unigram_encode(oov, v).collect()[0]
        assert "".join(row["pieces"]) == "zzzqqq"

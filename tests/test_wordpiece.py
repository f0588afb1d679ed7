"""Distributed WordPiece training/encoding vs a pure-Python reference
(likelihood-scored merges, greedy longest-match-first segmentation)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from energy_pandas_spark.operators.wordpiece import (
    CONT,
    UNK,
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocabulary,
)


def ref_train_wordpiece(texts, num_merges, min_pair_count=2):
    """Independent reference trainer: merge the pair maximizing
    count(pair) / (count(l) * count(r)), tiebreak (left, right) asc."""
    wc = Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    vocab = {}
    for w, c in wc.items():
        if not w:
            continue
        k = (w[0],) + tuple(CONT + ch for ch in w[1:])
        vocab[k] = vocab.get(k, 0) + c
    merges = []
    for rank in range(num_merges):
        syms_c, pairs_c = Counter(), Counter()
        for syms, c in vocab.items():
            for s in syms:
                syms_c[s] += c
            for i in range(len(syms) - 1):
                pairs_c[(syms[i], syms[i + 1])] += c
        eligible = {p: c for p, c in pairs_c.items() if c >= min_pair_count}
        if not eligible:
            break
        best = min(
            eligible.items(),
            key=lambda kv: (
                -(float(kv[1]) / (float(syms_c[kv[0][0]]) * float(syms_c[kv[0][1]]))),
                kv[0][0],
                kv[0][1],
            ),
        )
        (l, r), pc = best
        score = float(pc) / (float(syms_c[l]) * float(syms_c[r]))
        merged = l + (r[len(CONT):] if r.startswith(CONT) else r)
        merges.append((rank, l, r, merged, pc, score))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "low newer low wider new new",
    "",
]


def _df(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )


def test_train_wordpiece_matches_reference(spark):
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count, r.score)
        for r in train_wordpiece(_df(spark), 12).orderBy("rank").collect()
    ]
    assert got == ref_train_wordpiece(TEXTS, 12)
    assert len(got) > 5
    # merges stay well-formed: the merged symbol inherits the left
    # side's continuation status and drops the right side's ## prefix
    for _, l, r, merged, _, _ in got:
        assert merged.startswith(CONT) == l.startswith(CONT)
        assert merged == l + (r[len(CONT):] if r.startswith(CONT) else r)


def test_wordpiece_differs_from_raw_frequency_order(spark):
    # the likelihood score genuinely reorders merges vs plain BPE on
    # this corpus: the top WordPiece merge is NOT the most frequent
    # pair (which involves high-count unigrams and scores low)
    from energy_pandas_spark.operators.bpe import train_bpe

    wp = train_wordpiece(_df(spark), 3).orderBy("rank").collect()
    bp = train_bpe(_df(spark), 3).orderBy("rank").collect()
    assert (wp[0].left, wp[0].right) != (bp[0].left, bp[0].right)


def test_rare_perfect_score_pair_does_not_halt_training(spark):
    # a single 'qz' typo: pair (q, ##z) scores a perfect 1/(1*1) but
    # occurs once — it must be EXCLUDED, not halt training at rank 0
    texts = TEXTS + ["qz"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for threshold in (0, 200_000):  # distributed and local twin
        got = train_wordpiece(
            df, 8, driver_vocab_threshold=threshold
        ).collect()
        assert len(got) == 8
        assert all(r.pair_count >= 2 for r in got)
        assert not any(r.left == "q" for r in got)


def test_train_wordpiece_distributed_matches_local(spark):
    dist = [
        tuple(r)
        for r in train_wordpiece(_df(spark), 10, driver_vocab_threshold=0)
        .orderBy("rank")
        .collect()
    ]
    local = [
        tuple(r)
        for r in train_wordpiece(_df(spark), 10).orderBy("rank").collect()
    ]
    assert dist == local == [tuple(m) for m in ref_train_wordpiece(TEXTS, 10)]


def test_train_wordpiece_partition_invariant(spark):
    a = [tuple(r) for r in train_wordpiece(_df(spark), 6).orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in train_wordpiece(_df(spark).repartition(7), 6)
        .orderBy("rank")
        .collect()
    ]
    assert a == b


def test_vocabulary_contains_alphabet_and_merges(spark):
    df = _df(spark)
    merges = train_wordpiece(df, 8)
    vocab = {r.token for r in wordpiece_vocabulary(df, merges).collect()}
    corpus_words = {w for t in TEXTS for w in t.split()}
    for w in corpus_words:
        assert w[0] in vocab
        for ch in w[1:]:
            assert CONT + ch in vocab
    for r in merges.collect():
        assert r.merged in vocab


def test_greedy_encode_known_example(spark):
    # the BERT-paper style example with a hand-built vocabulary
    vocab = spark.createDataFrame(
        [("un",), ("##aff",), ("##able",), ("u",), ("##n",)],
        "token string",
    )
    df = spark.createDataFrame([(0, "unaffable")], "doc_id long, text string")
    row = wordpiece_encode(df, vocab).collect()[0]
    assert row.wp_tokens == ["un", "##aff", "##able"]
    assert row.n_wp_tokens == 3 and row.n_unk == 0


def test_greedy_encode_unk_and_longest_match(spark):
    vocab = spark.createDataFrame(
        [("ab",), ("a",), ("##b",), ("##c",)], "token string"
    )
    df = spark.createDataFrame(
        [(0, "abc ax AB")], "doc_id long, text string"
    )
    row = wordpiece_encode(df, vocab).collect()[0]
    # longest prefix wins: ab + ##c, not a + ##b + ##c
    # "ax": 'x' has no continuation token -> whole word is UNK
    # "AB" lowercases to "ab" (mirrors the trainer's word counting)
    assert row.wp_tokens == ["ab", "##c", UNK, "ab"]
    assert row.n_unk == 1


def test_encode_covers_trained_corpus(spark):
    # a vocabulary built from the corpus alphabet covers every corpus
    # word: zero UNK, and stripping ## reconstructs the text's words
    df = _df(spark)
    merges = train_wordpiece(df, 10)
    vocab = wordpiece_vocabulary(df, merges)
    enc = {r.doc_id: r for r in wordpiece_encode(df, vocab).collect()}
    for i, t in enumerate(TEXTS):
        assert enc[i].n_unk == 0
        rebuilt, cur = [], ""
        for tok in enc[i].wp_tokens:
            if tok.startswith(CONT):
                cur += tok[len(CONT):]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = tok
        if cur:
            rebuilt.append(cur)
        assert rebuilt == t.lower().split()


def test_encode_null_text(spark):
    vocab = spark.createDataFrame([("a",)], "token string")
    df = spark.createDataFrame(
        [(0, None), (1, "   ")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in wordpiece_encode(df, vocab).collect()}
    assert got[0].wp_tokens == [] and got[0].n_wp_tokens == 0
    assert got[1].wp_tokens == [] and got[1].n_unk == 0

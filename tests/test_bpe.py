"""Distributed BPE training vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from energy_pandas_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    train_bpe,
    word_counts,
)


def ref_train_bpe(texts, num_merges, min_pair_count=2):
    """Reference BPE trainer (Sennrich-style, deterministic tiebreak)."""
    wc = Counter()
    for t in texts:
        wc.update((t or "").lower().split())
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in wc.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        if c < min_pair_count:
            break
        merges.append((rank, l, r, l + r, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
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


def test_word_counts(spark):
    got = {r.word: r["count"] for r in word_counts(_df(spark)).collect()}
    expect = Counter()
    for t in TEXTS:
        expect.update(t.split())
    assert got == dict(expect)


def test_train_bpe_matches_reference(spark):
    learned = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe(_df(spark), num_merges=12, driver_vocab_threshold=0)
        .orderBy("rank")
        .collect()
    ]
    assert learned == ref_train_bpe(TEXTS, 12)
    assert len(learned) > 5  # the corpus genuinely supports many merges


def test_train_bpe_min_count_stops_early(spark):
    learned = train_bpe(_df(spark), num_merges=50, min_pair_count=4).collect()
    ref = ref_train_bpe(TEXTS, 50, min_pair_count=4)
    assert len(learned) == len(ref) < 50


def test_train_bpe_partition_invariant(spark):
    a = [tuple(r) for r in train_bpe(_df(spark), 8).orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in train_bpe(_df(spark).repartition(7), 8).orderBy("rank").collect()
    ]
    assert a == b


def test_train_bpe_distributed_path_matches_local(spark):
    # driver_vocab_threshold=0 forces the distributed merge loop; the
    # default path collects the tiny word table and trains driver-side
    dist = [
        tuple(r)
        for r in train_bpe(_df(spark), 10, driver_vocab_threshold=0)
        .orderBy("rank")
        .collect()
    ]
    local = [tuple(r) for r in train_bpe(_df(spark), 10).orderBy("rank").collect()]
    assert dist == local == [tuple(m) for m in ref_train_bpe(TEXTS, 10)]


def test_bpe_encode_roundtrip(spark):
    df = _df(spark)
    merges = train_bpe(df, num_merges=10)
    enc = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        toks = enc[i].bpe_tokens
        assert enc[i].n_bpe_tokens == len(toks)
        # concatenating subwords reconstructs the words + markers
        joined = "".join(toks).replace(END_OF_WORD, " ").split()
        assert joined == t.lower().split()
    # frequent whole words become single symbols
    m_set = {r.merged for r in merges.collect()}
    if "new" + END_OF_WORD in m_set:
        assert "new" + END_OF_WORD in enc[1].bpe_tokens


def test_bpe_encode_no_merges(spark):
    df = _df(spark)
    empty = train_bpe(df.limit(0), 5)
    assert empty.count() == 0
    enc = bpe_encode(df, empty).collect()
    by_id = {r.doc_id: r for r in enc}
    assert by_id[0].bpe_tokens[:4] == ["l", "o", "w", END_OF_WORD]


def test_train_bpe_corpus_matches_reference(spark, sf_dir):
    from energy_pandas_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    learned = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in train_bpe(docs, num_merges=8).orderBy("rank").collect()
    ]
    assert learned == ref_train_bpe(texts, 8)


def test_bpe_vocabulary_conserves_tokens(spark):
    from collections import Counter

    from energy_pandas_spark.operators.bpe import bpe_vocabulary

    df = _df(spark)
    merges = train_bpe(df, num_merges=10)
    vocab = {r.symbol: r["count"] for r in bpe_vocabulary(df, merges).collect()}
    # recompute from the encoded docs: identical multiset of symbols
    enc = bpe_encode(df, merges).collect()
    expect = Counter()
    for r in enc:
        expect.update(r.bpe_tokens)
    assert vocab == dict(expect)
    # every merged symbol that survives in encoded text is in the vocab,
    # and total symbol mass equals the total encoded token count
    assert sum(vocab.values()) == sum(r.n_bpe_tokens for r in enc)

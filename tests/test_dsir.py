"""DSIR-style importance reweighting: hashed-unigram log-ratio weights."""

from __future__ import annotations

import math

from pyspark.sql import Row

from energy_pandas_spark.operators.text import dsir_score, dsir_select, dsir_weights


def _corpora(spark):
    raw = spark.createDataFrame(
        [
            Row(doc_id=0, text="code code compiler loop"),
            Row(doc_id=1, text="recipe butter sugar flour"),
            Row(doc_id=2, text="code compiler"),
            Row(doc_id=3, text="butter sugar"),
            Row(doc_id=4, text=""),
        ]
    )
    target = spark.createDataFrame(
        [
            Row(doc_id=100, text="code compiler loop code"),
            Row(doc_id=101, text="compiler code"),
        ]
    )
    return raw, target


def test_dsir_weights_match_numpy(spark):
    raw, target = _corpora(spark)
    n_buckets, scale = 64, 1024
    w = dsir_weights(raw, target, n_buckets=n_buckets, scale=scale)
    rows = {r.bucket: r for r in w.collect()}
    assert len(rows) == n_buckets
    T = sum(r.tc for r in rows.values())
    R = sum(r.rc for r in rows.values())
    assert T == 6 and R == 12
    for b, r in rows.items():
        expect = round(
            scale
            * (
                math.log((r.tc + 1) / (T + n_buckets))
                - math.log((r.rc + 1) / (R + n_buckets))
            )
        )
        assert r.iw == expect, (b, r)


def test_dsir_score_prefers_target_domain(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target, n_buckets=64)
    scored = {r.doc_id: r for r in dsir_score(raw, w, n_buckets=64).collect()}
    # code-like docs must outrank recipe-like docs
    assert scored[0].score > scored[1].score
    assert scored[2].score > scored[3].score
    # empty doc: zero tokens, zero importance
    assert scored[4].importance_q == 0 and scored[4].n_tokens == 0
    # integer importance is the exact sum of per-token weights
    wmap = {r.bucket: r.iw for r in w.collect()}
    import hashlib

    def bucket(tok):
        h = int(hashlib.md5(("dsir-v1" + tok).encode()).hexdigest()[:15], 16)
        return h % 64

    for did, text in [(0, "code code compiler loop"), (3, "butter sugar")]:
        toks = text.split()
        assert scored[did].importance_q == sum(wmap[bucket(t)] for t in toks)


def test_dsir_select_topk_deterministic(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target, n_buckets=64)
    sel = dsir_select(raw, w, k=2, n_buckets=64).collect()
    assert [r.doc_id for r in sel] == [0, 2]
    again = dsir_select(raw.repartition(5), w, k=2, n_buckets=64).collect()
    assert [r.doc_id for r in again] == [0, 2]


def test_dsir_score_order_free(spark):
    raw, target = _corpora(spark)
    w = dsir_weights(raw, target, n_buckets=64)
    a = dsir_score(raw, w, n_buckets=64).orderBy("doc_id").collect()
    b = (
        dsir_score(raw.repartition(7), w, n_buckets=64)
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.importance_q, r.score) for r in a] == [
        (r.doc_id, r.importance_q, r.score) for r in b
    ]


def test_dsir_resample_deterministic_and_temperature(spark):
    import math

    from energy_pandas_spark.operators.text import dsir_resample

    raw, target = _corpora(spark)
    w = dsir_weights(raw, target, n_buckets=64)
    sel = dsir_resample(raw, w, k=3, temperature=1.0, n_buckets=64).collect()
    again = dsir_resample(
        raw.repartition(5), w, k=3, temperature=1.0, n_buckets=64
    ).collect()
    assert [r.doc_id for r in sel] == [r.doc_id for r in again]
    # keys match the closed-form recomputation
    import hashlib

    for r in sel:
        h = int(
            hashlib.md5(("dsir-g1" + str(r.doc_id)).encode()).hexdigest()[:15], 16
        )
        u = (h % (1 << 20) + 0.5) / float(1 << 20)
        g = -math.log(-math.log(u))
        assert r.gumbel_key_q == round(r.importance_q / 1.0 + 1024 * g)
    # temperature -> infinity approaches pure-noise selection: keys are
    # dominated by the Gumbel term
    hot = dsir_resample(raw, w, k=5, temperature=1e9, n_buckets=64).collect()
    for r in hot:
        h = int(
            hashlib.md5(("dsir-g1" + str(r.doc_id)).encode()).hexdigest()[:15], 16
        )
        u = (h % (1 << 20) + 0.5) / float(1 << 20)
        assert r.gumbel_key_q == round(1024 * -math.log(-math.log(u)))


def test_dsir_bigram_features_match_numpy(spark):
    import hashlib
    import math

    raw, target = _corpora(spark)
    n_buckets, scale = 64, 1024
    w = dsir_weights(raw, target, n_buckets=n_buckets, scale=scale, ngram_max=2)
    rows = {r.bucket: r for r in w.collect()}

    def feats(text):
        toks = text.split()
        return toks + [
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        ]

    def bucket(tok):
        h = int(hashlib.md5(("dsir-v1" + tok).encode()).hexdigest()[:15], 16)
        return h % n_buckets

    from collections import Counter

    t_counts, r_counts = Counter(), Counter()
    for df, ctr in ((raw, r_counts), (target, t_counts)):
        for r in df.collect():
            for f in feats(r.text or ""):
                ctr[bucket(f)] += 1
    T, R = sum(t_counts.values()), sum(r_counts.values())
    for b, r in rows.items():
        assert (r.tc, r.rc) == (t_counts.get(b, 0), r_counts.get(b, 0))
        expect = round(
            scale
            * (
                math.log((r.tc + 1) / (T + n_buckets))
                - math.log((r.rc + 1) / (R + n_buckets))
            )
        )
        assert r.iw == expect
    # scoring consumes the same feature space
    scored = {
        r.doc_id: r
        for r in dsir_score(raw, w, n_buckets=64, ngram_max=2).collect()
    }
    wmap = {r.bucket: r.iw for r in w.collect()}
    for r in raw.collect():
        fs = feats(r.text or "")
        assert scored[r.doc_id].n_tokens == len(fs)
        assert scored[r.doc_id].importance_q == sum(wmap[bucket(f)] for f in fs)

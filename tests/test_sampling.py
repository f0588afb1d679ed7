"""Deterministic sampling/splitting + corpus statistics operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
    weighted_mixture,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "key")


def test_split_is_deterministic_and_total(spark, ids):
    s1 = hash_split(ids, "key").groupBy("split").count().collect()
    s2 = hash_split(ids, "key").groupBy("split").count().collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert sum(r["count"] for r in s1) == 2000
    by = {r["split"]: r["count"] for r in s1}
    assert by["train"] > 1800  # ~98%


def test_split_fractions_validated(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"a": 0.9, "b": 0.3})


def test_samples_are_nested(spark, ids):
    """A row kept at rate r is kept at every rate >= r."""
    k10 = {r.key for r in hash_sample(ids, "key", 0.1).collect()}
    k30 = {r.key for r in hash_sample(ids, "key", 0.3).collect()}
    assert k10 <= k30
    assert len(k10) == pytest.approx(200, rel=0.25)


def test_sample_rate_bounds(spark, ids):
    with pytest.raises(ValueError):
        hash_sample(ids, "key", 1.5)
    assert hash_sample(ids, "key", 0.0).count() == 0
    assert hash_sample(ids, "key", 1.0).count() == 2000


def test_mixture_labels_and_rates(spark, ids):
    a = ids.filter(F.col("key") < 1000)
    b = ids.filter(F.col("key") >= 1000)
    mix = weighted_mixture([(a, 1.0), (b, 0.2)], key="key")
    by = {r.source_id: r.n for r in mix.groupBy("source_id").agg(F.count("*").alias("n")).collect()}
    assert by[0] == 1000
    assert by[1] == pytest.approx(200, rel=0.3)


def test_bucket_range(spark, ids):
    mn, mx = ids.select(hash_bucket("key", 100).alias("b")).agg(
        F.min("b"), F.max("b")
    ).first()
    assert 0 <= mn and mx <= 99


def test_mixture_is_map_only(spark, ids):
    """Scale contract: the mixture plan contains no Exchange at all."""
    a = ids.filter(F.col("key") < 1000)
    plan = weighted_mixture([(a, 0.5), (ids, 0.1)], key="key")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_rates_and_determinism(spark):
    from energy_pandas_spark.operators.sampling import hash_sample_by

    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "key long, lang string")
    out = hash_sample_by(df, "key", "lang", {"en": 0.5, "de": 0.1})
    by = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by["en"] == pytest.approx(1000, rel=0.15)
    assert by["de"] == pytest.approx(200, rel=0.3)
    # default_rate=0 drops unknown strata entirely
    df2 = spark.createDataFrame([(1, "fr")], "key long, lang string")
    assert hash_sample_by(df2, "key", "lang", {"en": 1.0}).count() == 0
    # deterministic: same rows kept on rerun
    a = sorted(r.key for r in out.collect())
    b = sorted(r.key for r in hash_sample_by(df, "key", "lang", {"en": 0.5, "de": 0.1}).collect())
    assert a == b


def test_stratified_is_map_only(spark):
    from energy_pandas_spark.operators.sampling import hash_sample_by

    df = spark.createDataFrame([(1, "en")], "key long, lang string")
    plan = hash_sample_by(df, "key", "lang", {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_weighted_bernoulli_rate_tracks_weight(spark):
    from energy_pandas_spark.operators.sampling import weighted_bernoulli_sample

    rows = [(i, 10 if i < 4000 else 100) for i in range(8000)]
    df = spark.createDataFrame(rows, "key long, w long")
    out = weighted_bernoulli_sample(df, "key", "w", max_weight=100)
    kept = out.groupBy("w").agg(F.count("*").alias("n")).collect()
    by = {r.w: r.n for r in kept}
    # keep prob = w/max_weight: 10% of the light rows, 100% of the heavy
    assert by[100] == 4000  # w == max_weight keeps everything
    assert by[10] == pytest.approx(400, rel=0.25)
    # deterministic + nested: every key kept at w=10 is kept at w=50
    light = spark.createDataFrame([(i, 10) for i in range(4000)], "key long, w long")
    heavier = spark.createDataFrame([(i, 50) for i in range(4000)], "key long, w long")
    k10 = {r.key for r in weighted_bernoulli_sample(light, "key", "w", 100).collect()}
    k50 = {r.key for r in weighted_bernoulli_sample(heavier, "key", "w", 100).collect()}
    assert k10 <= k50
    # map-only contract
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_balanced_cap_sample(spark):
    from energy_pandas_spark.operators.sampling import balanced_cap_sample

    rows = [(i, "big" if i < 9000 else "small") for i in range(9500)]
    df = spark.createDataFrame(rows, "key long, grp string")
    out = balanced_cap_sample(df, "key", "grp", cap=500)
    by = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert by["small"] == 500  # under cap: untouched
    assert by["big"] == pytest.approx(500, rel=0.2)  # capped near target
    assert by["big"] < 1500
    # schema passthrough (no helper columns leak)
    assert out.columns == ["grp", "key"] or set(out.columns) == {"key", "grp"}
    # the count side is broadcast, not a shuffled join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_split_leakage_stats_counts_straddling_dups(spark):
    from energy_pandas_spark.operators.sampling import split_leakage_stats

    # same text under many keys: with 50/50 splits some copies land on
    # each side; pair count must equal n_a * n_b exactly
    rows = [(i, "identical leaked content") for i in range(40)]
    rows += [(100 + i, f"unique doc {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_stats(
        df, "doc_id", splits={"train": 0.5, "test": 0.5}
    ).collect()
    assert len(out) == 1  # one split pair
    r = out[0]
    assert (r.split_a, r.split_b) == ("test", "train")
    # recompute expectation from the same hash assignment
    from energy_pandas_spark.operators.sampling import hash_split

    tagged = hash_split(
        df.filter(F.col("text") == "identical leaked content"),
        "doc_id",
        {"train": 0.5, "test": 0.5},
    )
    by = {x["split"]: x["n"] for x in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert r.n_digests == (1 if by.get("train", 0) and by.get("test", 0) else 0)
    assert r.n_pairs == by.get("train", 0) * by.get("test", 0) > 0
    # unique docs contribute nothing


def test_select_token_budget_boundary_math(spark):
    """Full buckets above the boundary survive whole; the boundary
    bucket keeps a hash slice sized to the remaining budget; lower
    buckets drop entirely."""
    from energy_pandas_spark.operators.sampling import (
        hash_bucket,
        select_token_budget,
    )
    from pyspark.sql import functions as F

    # quality tiers: 0.9 (200 tokens total), 0.5 (400), 0.1 (400)
    rows = []
    for i in range(10):
        rows.append((i, 0.95, 20))        # qb 950: 200 tokens
    for i in range(10, 30):
        rows.append((i, 0.55, 20))        # qb 550: 400 tokens
    for i in range(30, 50):
        rows.append((i, 0.15, 20))        # qb 150: 400 tokens
    df = spark.createDataFrame(rows, "doc_id long, quality double, tok int")

    # budget 300: all of qb950 (200) + hash-slice of qb550 for ~100
    out = select_token_budget(
        df, 300, "quality", "tok", key="doc_id"
    ).collect()
    got = {r.doc_id for r in out}
    assert set(range(10)) <= got           # top tier fully kept
    assert got.isdisjoint(range(30, 50))   # bottom tier fully dropped
    mid = got & set(range(10, 30))
    # slice threshold = (300-200)*10000 div 400 = 2500 -> expect ~1/4
    thr = (300 - 200) * 10_000 // 400
    expect_mid = {
        r.doc_id
        for r in df.filter(F.col("doc_id").between(10, 29))
        .withColumn("b", hash_bucket("doc_id"))
        .collect()
        if r.b < thr
    }
    assert mid == expect_mid

    # budget >= total keeps everything; budget 0 keeps nothing
    assert len(select_token_budget(df, 10_000, "quality", "tok", key="doc_id").collect()) == 50
    assert len(select_token_budget(df, 0, "quality", "tok", key="doc_id").collect()) == 0


def test_temperature_mixture_flattens_group_mass(spark):
    """alpha=0.5: group mass ~ sqrt(n) — the dominant group downsamples
    while the smallest keeps (near) everything; alpha=1 keeps natural
    proportions (no filtering at all)."""
    from energy_pandas_spark.operators.sampling import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string")

    kept = temperature_mixture(df, key="doc_id", group_col="src", alpha=0.5)
    by = {r[0]: r[1] for r in kept.groupBy("src").count().collect()}
    # rates: small -> 1.0, big -> sqrt(900)/900 / (sqrt(100)/100) = 1/3
    assert by["small"] >= 95          # near-complete (hash granularity)
    assert 250 <= by["big"] <= 350    # ~1/3 of 900
    # determinism: rerun identical
    again = {r[0]: r[1] for r in
             temperature_mixture(df, key="doc_id", group_col="src", alpha=0.5)
             .groupBy("src").count().collect()}
    assert by == again

    # alpha=1 keeps everything (natural proportions)
    full = temperature_mixture(df, key="doc_id", group_col="src", alpha=1.0)
    assert full.count() == 1000


def test_sample_k_per_group_exact_and_stable(spark):
    import pytest
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.sampling import (
        hash_bucket,
        sample_k_per_group,
    )

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(200)] + [(900, "tiny")],
        "doc_id long, src string",
    )
    got = sample_k_per_group(df, "src", 5, key="doc_id")
    counts = {r.src: r.n for r in got.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5, "c": 5, "tiny": 1}  # min(k, |group|)
    # ranks are 1..k and ordered by (bucket, id) within each group
    rows = got.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
    keys = {
        r.doc_id: r.b
        for r in df.select("doc_id", hash_bucket("doc_id", 1_000_000).alias("b")).collect()
    }
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.sample_rank)
        assert [r.sample_rank for r in rs] == list(range(1, len(rs) + 1))
        ordered = sorted((keys[r.doc_id], r.doc_id) for r in rs)
        assert [d for _, d in ordered] == [r.doc_id for r in rs]
    # deterministic under repartitioning
    again = sample_k_per_group(df.repartition(13), "src", 5, key="doc_id")
    assert {(r.src, r.doc_id) for r in again.collect()} == {
        (r.src, r.doc_id) for r in rows
    }
    with pytest.raises(ValueError):
        sample_k_per_group(df, "src", 0)


def test_group_quantile_gate_exact(spark):
    import pytest
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.sampling import (
        drop_below_group_quantile,
        group_quantile_thresholds,
    )

    # group a: scores 1..10 -> 10% quantile needs ceil(10*100/1000)=1
    # row -> threshold 1 (nothing dropped); at permille=300 needs 3
    # rows -> threshold 3 (drops scores 1,2)
    rows = [(i, "a", i) for i in range(1, 11)] + [
        (100 + i, "b", v) for i, v in enumerate([5, 5, 5, 9])
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, score long")
    thr = {
        r.src: (r.threshold, r.n_rows)
        for r in group_quantile_thresholds(df, "score", "src", permille=300).collect()
    }
    # b: need ceil(4*0.3)=2 rows -> cum at score 5 is 3 >= 2 -> threshold 5
    assert thr == {"a": (3, 10), "b": (5, 4)}
    kept = drop_below_group_quantile(df, "score", "src", permille=300)
    got = {r.src: sorted(x.score for x in rows_) for r, rows_ in []} or {
        s: sorted(r.score for r in kept.filter(F.col("src") == s).collect())
        for s in ("a", "b")
    }
    assert got["a"] == list(range(3, 11))  # 1,2 dropped; 3 kept (boundary)
    assert got["b"] == [5, 5, 5, 9]  # ties at threshold all survive
    with pytest.raises(ValueError):
        group_quantile_thresholds(df, "score", "src", permille=0)
    # NULL scores are excluded from count and quantile, and gated out
    withnull = df.union(
        spark.createDataFrame([(999, "a", None)], "doc_id long, src string, score long")
    )
    thr2 = {
        r.src: (r.threshold, r.n_rows)
        for r in group_quantile_thresholds(withnull, "score", "src", permille=300).collect()
    }
    assert thr2 == thr
    assert 999 not in {
        r.doc_id
        for r in drop_below_group_quantile(withnull, "score", "src", permille=300).collect()
    }


class TestEpochOrder:
    def _py_ref(self, ids, epochs, seed):
        import hashlib

        out = []
        for ep in range(epochs):
            keyed = sorted(
                ids,
                key=lambda i: (
                    hashlib.md5(f"{seed}:{ep}:{i}".encode()).hexdigest(),
                    i,
                ),
            )
            out += [(ep, pos, i) for pos, i in enumerate(keyed)]
        return sorted(out)

    def test_matches_python_md5_replay(self, spark):
        from energy_pandas_spark.operators.sampling import epoch_order

        ids = list(range(200))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = sorted(
            (r["epoch"], r["position"], r["doc_id"])
            for r in epoch_order(df, epochs=3, seed="s7").collect()
        )
        assert got == self._py_ref(ids, 3, "s7")

    def test_positions_contiguous_per_epoch_and_permutation(self, spark):
        from energy_pandas_spark.operators.sampling import epoch_order

        df = spark.range(0, 137).withColumnRenamed("id", "doc_id")
        rows = epoch_order(df, epochs=2, seed="a").collect()
        for ep in (0, 1):
            pos = sorted(r["position"] for r in rows if r["epoch"] == ep)
            assert pos == list(range(137))
            ids = {r["doc_id"] for r in rows if r["epoch"] == ep}
            assert ids == set(range(137))

    def test_epochs_are_different_permutations(self, spark):
        from energy_pandas_spark.operators.sampling import epoch_order

        df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
        rows = epoch_order(df, epochs=2, seed="a").collect()
        order = {
            ep: [
                r["doc_id"]
                for r in sorted(
                    (x for x in rows if x["epoch"] == ep),
                    key=lambda x: x["position"],
                )
            ]
            for ep in (0, 1)
        }
        assert order[0] != order[1]

    def test_partitioning_invariance(self, spark):
        from energy_pandas_spark.operators.sampling import epoch_order

        ids = [(i,) for i in range(300)]
        a = spark.createDataFrame(ids, "doc_id long").coalesce(1)
        b = spark.createDataFrame(ids, "doc_id long").repartition(17)
        ra = sorted(map(tuple, epoch_order(a, epochs=2, seed="x").collect()))
        rb = sorted(map(tuple, epoch_order(b, epochs=2, seed="x").collect()))
        assert ra == rb

    def test_seed_changes_order(self, spark):
        from energy_pandas_spark.operators.sampling import epoch_order

        df = spark.range(0, 64).withColumnRenamed("id", "doc_id")
        a = sorted(map(tuple, epoch_order(df, epochs=1, seed="s1").collect()))
        b = sorted(map(tuple, epoch_order(df, epochs=1, seed="s2").collect()))
        assert a != b


class TestLeakageSafeSplit:
    """Cluster-aware splitting: whole dup clusters land in one split."""

    def _leaky_corpus(self, spark):
        # same text under many keys — plain hash_split scatters them
        rows = [(i, "identical leaked content") for i in range(40)]
        rows += [(100 + i, f"unique doc {i}") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_mode_zero_leakage(self, spark):
        from energy_pandas_spark.operators.sampling import leakage_safe_split

        df = self._leaky_corpus(spark)
        out = leakage_safe_split(
            df, "doc_id", splits={"train": 0.5, "test": 0.5}
        )
        # every copy of the duplicated text shares one split
        dup_splits = (
            out.filter(F.col("text") == "identical leaked content")
            .select("split")
            .distinct()
            .collect()
        )
        assert len(dup_splits) == 1
        # and the audit agrees: zero cross-split exact-dup pairs
        per = (
            out.groupBy(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))))
            .agg(
                F.count_if(F.col("split") == "train").alias("a"),
                F.count_if(F.col("split") == "test").alias("b"),
            )
            .agg(F.sum(F.col("a") * F.col("b")).alias("pairs"))
            .collect()[0]
        )
        assert per.pairs == 0

    def test_unique_rows_match_hash_split(self, spark):
        from energy_pandas_spark.operators.sampling import (
            hash_split,
            leakage_safe_split,
        )

        df = self._leaky_corpus(spark).filter(F.col("doc_id") >= 100)
        a = {
            r.doc_id: r.split
            for r in leakage_safe_split(df, "doc_id").collect()
        }
        b = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
        assert a == b  # dedup-awareness is a no-op on unique content

    def test_pairs_mode_chains(self, spark):
        from energy_pandas_spark.operators.sampling import leakage_safe_split

        df = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
        )
        # chain 1-2, 2-3 => cluster {1,2,3}; pair 5-6 => cluster {5,6}
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
        )
        out = leakage_safe_split(
            df,
            "doc_id",
            pairs=pairs,
            splits={"train": 0.5, "test": 0.5},
            rep_col="rep",
        )
        rows = {r.doc_id: r for r in out.collect()}
        assert rows[1].rep == rows[2].rep == rows[3].rep == 1
        assert rows[1].split == rows[2].split == rows[3].split
        assert rows[5].rep == rows[6].rep == 5
        assert rows[5].split == rows[6].split
        assert rows[4].rep == 4 and rows[7].rep == 7

    def test_rep_col_hidden_by_default(self, spark):
        from energy_pandas_spark.operators.sampling import leakage_safe_split

        df = self._leaky_corpus(spark)
        out = leakage_safe_split(df, "doc_id")
        assert set(out.columns) == {"doc_id", "text", "split"}

    def test_null_text_rows_keep_own_key(self, spark):
        # regression: NULL text digests to NULL, the rep join misses,
        # and hash_bucket(NULL) used to dump every such row into the
        # LAST split; they must fall back to their own key instead
        from energy_pandas_spark.operators.sampling import (
            hash_split,
            leakage_safe_split,
        )

        rows = [(i, None) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.split, r.rep)
            for r in leakage_safe_split(df, "doc_id", rep_col="rep").collect()
        }
        want = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
        assert {k: v[0] for k, v in got.items()} == want
        assert all(rep == k for k, (_, rep) in got.items())
        assert len({v[0] for v in got.values()}) > 1  # not one split


class TestSelectionCurve:
    def test_hand_computed_curve(self, spark):
        from energy_pandas_spark.operators.sampling import selection_curve

        # scores 0..9, weight = score*10
        df = spark.createDataFrame(
            [(i, i, i * 10) for i in range(10)],
            "doc_id long, score long, toks long",
        )
        out = selection_curve(
            df, "score", lo=0, hi=10, weight_col="toks", n_bins=5
        ).collect()
        assert [r.threshold for r in out] == [0, 2, 4, 6, 8]
        assert [r.n_docs for r in out] == [2, 2, 2, 2, 2]
        assert [r.weight for r in out] == [10, 50, 90, 130, 170]
        # cumulative-from-above
        assert [r.n_docs_at_or_above for r in out] == [10, 8, 6, 4, 2]
        assert [r.weight_at_or_above for r in out] == [450, 440, 390, 300, 170]
        total = 450
        assert [r.weight_permille_retained for r in out] == [
            (w * 1000) // total for w in (450, 440, 390, 300, 170)
        ]

    def test_clamping_null_and_empty_bins(self, spark):
        from energy_pandas_spark.operators.sampling import selection_curve

        df = spark.createDataFrame(
            [(1, -5, 1), (2, 99, 1), (3, None, 7)],
            "doc_id long, score long, toks long",
        )
        out = selection_curve(
            df, "score", lo=0, hi=10, weight_col="toks", n_bins=5
        ).collect()
        assert len(out) == 5  # dense bins even when empty
        assert out[0].n_docs == 1  # -5 clamps into bin 0
        assert out[4].n_docs == 1  # 99 clamps into the top bin
        assert sum(r.n_docs for r in out) == 2  # NULL score excluded

    def test_docs_weight_default(self, spark):
        from energy_pandas_spark.operators.sampling import selection_curve

        df = spark.createDataFrame(
            [(i, i % 4) for i in range(8)], "doc_id long, score long"
        )
        out = selection_curve(df, "score", lo=0, hi=4, n_bins=4).collect()
        assert [r.weight for r in out] == [2, 2, 2, 2]  # weight = docs

    def test_validation(self, spark):
        import pytest as _pt

        from energy_pandas_spark.operators.sampling import selection_curve

        df = spark.createDataFrame([(1, 1)], "doc_id long, score long")
        with _pt.raises(ValueError):
            selection_curve(df, "score", lo=5, hi=5)
        with _pt.raises(ValueError):
            selection_curve(df, "score", lo=0, hi=10, n_bins=0)

    def test_non_divisible_span_threshold_is_bin_floor(self, spark):
        # regression: with span=10, n_bins=3 the bins are scores
        # {0..3},{4..6},{7..9}; a floor(i*span/n_bins) threshold would
        # report 3 for bin 1 even though score 3 lives in bin 0
        from energy_pandas_spark.operators.sampling import selection_curve

        df = spark.createDataFrame(
            [(i, i) for i in range(10)], "doc_id long, score long"
        )
        out = selection_curve(df, "score", lo=0, hi=10, n_bins=3).collect()
        assert [r.threshold for r in out] == [0, 4, 7]
        assert [r.n_docs for r in out] == [4, 3, 3]
        for r in out:
            kept = sum(1 for s in range(10) if s >= r.threshold)
            assert r.n_docs_at_or_above == kept

    def test_awkward_column_name(self, spark):
        from energy_pandas_spark.operators.sampling import selection_curve

        df = spark.createDataFrame(
            [(1, 5)], "doc_id long, `my score` long"
        )
        out = selection_curve(df, "my score", lo=0, hi=10, n_bins=2)
        assert out.count() == 2


class TestMixturePlan:
    @staticmethod
    def _replay(avail, weights, budget, max_rate_permille=1000):
        """Exact Fraction water-filling: clamp the scarcest source,
        redistribute, repeat; floor-divide final unclamped takes."""
        from fractions import Fraction

        caps = {s: a * max_rate_permille // 1000 for s, a in avail.items()}
        clamped = {}
        pool = dict(weights)
        b = budget
        while pool:
            wtot = sum(pool.values())
            lam = Fraction(b, wtot)
            worst = min(
                pool, key=lambda s: (Fraction(caps[s], pool[s]), s)
            )
            if Fraction(caps[worst], pool[worst]) < lam:
                clamped[worst] = caps[worst]
                b -= caps[worst]
                del pool[worst]
            else:
                break
        out = {}
        wrem = sum(pool.values())
        for s in avail:
            if s in clamped:
                out[s] = (clamped[s], True)
            else:
                out[s] = (min(pool[s] * b // max(wrem, 1), caps[s]), False)
        return out

    def _run(self, spark, avail, weights, budget, mrp=1000):
        from energy_pandas_spark.operators.sampling import mixture_plan

        df = spark.createDataFrame(
            list(avail.items()), "source string, n_tokens long"
        )
        return {
            r.source: r
            for r in mixture_plan(
                df, budget, weights, max_rate_permille=mrp
            ).collect()
        }

    def test_no_clamping_splits_by_weight(self, spark):
        got = self._run(
            spark, {"web": 10_000, "code": 10_000}, {"web": 600, "code": 400},
            budget=5_000,
        )
        assert got["web"].take == 3_000 and not got["web"].clamped
        assert got["code"].take == 2_000 and not got["code"].clamped
        assert got["web"].rate_bp == 3_000  # 30% of the source

    def test_scarce_source_clamps_and_redistributes(self, spark):
        # books wants 50% of 10k = 5k but only has 1k: web absorbs
        got = self._run(
            spark, {"web": 100_000, "books": 1_000},
            {"web": 500, "books": 500}, budget=10_000,
        )
        assert got["books"].clamped and got["books"].take == 1_000
        assert not got["web"].clamped and got["web"].take == 9_000

    def test_upsampling_cap(self, spark):
        # 2000 permille = 2 epochs max: cap doubles the take
        got = self._run(
            spark, {"web": 100_000, "books": 1_000},
            {"web": 500, "books": 500}, budget=10_000, mrp=2_000,
        )
        assert got["books"].take == 2_000 and got["books"].rate_bp == 20_000
        assert got["web"].take == 8_000

    def test_underfilled_when_everything_clamps(self, spark):
        got = self._run(
            spark, {"a": 100, "b": 100}, {"a": 1, "b": 1}, budget=10_000
        )
        assert all(r.clamped for r in got.values())
        assert sum(r.take for r in got.values()) == 200  # all there is

    def test_matches_fraction_replay_randomized(self, spark):
        import random

        rng = random.Random(7)
        for trial in range(6):
            n = rng.randint(2, 6)
            avail = {f"s{i}": rng.randint(10, 100_000) for i in range(n)}
            weights = {f"s{i}": rng.randint(1, 900) for i in range(n)}
            budget = rng.randint(100, 200_000)
            mrp = rng.choice([500, 1000, 3000])
            got = self._run(spark, avail, weights, budget, mrp)
            want = self._replay(avail, weights, budget, mrp)
            for s in avail:
                assert (got[s].take, got[s].clamped) == want[s], (
                    trial, s, avail, weights, budget, mrp)
            assert sum(r.take for r in got.values()) <= budget or all(
                r.clamped for r in got.values()
            )

    def test_validation(self, spark):
        from energy_pandas_spark.operators.sampling import mixture_plan

        df = spark.createDataFrame([("a", 10)], "source string, n_tokens long")
        with pytest.raises(ValueError):
            mixture_plan(df, -1, {"a": 1})
        with pytest.raises(ValueError):
            mixture_plan(df, 10, {})
        with pytest.raises(ValueError):
            mixture_plan(df, 10, {"a": 0})

    def test_missing_source_is_visible_zero_row(self, spark):
        # a weighted source with no counts row must NOT silently
        # shrink the mixture: it shows up clamped at zero
        got = self._run(
            spark, {"web": 10_000}, {"web": 500, "boks": 500}, budget=4_000
        )
        assert got["boks"].take == 0 and got["boks"].clamped
        assert got["boks"].n_tokens == 0
        assert got["web"].take == 4_000  # the full budget, visibly

    def test_awkward_source_column_and_bounds(self, spark):
        from energy_pandas_spark.operators.sampling import mixture_plan

        df = spark.createDataFrame(
            [("a", 100)], "`my source` string, n_tokens long"
        )
        out = mixture_plan(df, 50, {"a": 1}, source_col="my source")
        assert out.count() == 1
        with pytest.raises(ValueError):
            mixture_plan(df, 10**13, {"a": 1}, source_col="my source")
        with pytest.raises(ValueError):
            mixture_plan(df, 10, {"a": 10**7}, source_col="my source")

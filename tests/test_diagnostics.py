"""Skew-diagnostics operator tests (operators/diagnostics.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from energy_pandas_spark.operators.diagnostics import (
    key_skew_stats,
    partition_skew_stats,
    top_keys,
)


def _df(spark):
    # skewed: key "hot" holds 60 of 100 rows, one NULL-key row
    rows = (
        [("hot", i) for i in range(60)]
        + [(f"k{i % 13}", i) for i in range(39)]
        + [(None, 99)]
    )
    return spark.createDataFrame(rows, "k string, v long")


class TestKeySkew:
    def test_matches_python_replay(self, spark):
        df = _df(spark)
        got = key_skew_stats(df, "k").collect()[0]
        cnt = Counter(r["k"] for r in df.collect())
        n, nk, mx = sum(cnt.values()), len(cnt), max(cnt.values())
        assert (
            got["n_rows"], got["n_keys"], got["max_key_rows"]
        ) == (n, nk, mx)
        assert got["skew_ratio_pm"] == (1000 * mx) // max(n // nk, 1)
        assert got["top1_share_pm"] == (1000 * mx) // n

    def test_null_key_is_a_group(self, spark):
        df = _df(spark)
        assert key_skew_stats(df, "k").collect()[0]["n_keys"] == 15
        # a NULL-dominated key must surface as the hot key
        nulls = spark.createDataFrame(
            [(None, i) for i in range(9)] + [("a", 0)], "k string, v long"
        )
        top = top_keys(nulls, "k", k=1).collect()[0]
        assert top["k"] is None and top["key_rows"] == 9
        assert top["share_pm"] == 900

    def test_top_keys_order_and_shares(self, spark):
        df = _df(spark)
        rows = top_keys(df, "k", k=3).collect()
        assert [r["k"] for r in rows][0] == "hot"
        assert rows[0]["key_rows"] == 60 and rows[0]["share_pm"] == 600
        # ties (all k* have 3 rows) break by key asc
        assert [r["k"] for r in rows[1:]] == ["k0", "k1"]

    def test_uniform_is_1000(self, spark):
        df = spark.createDataFrame(
            [(f"k{i % 10}", i) for i in range(100)], "k string, v long"
        )
        got = key_skew_stats(df, "k").collect()[0]
        assert got["skew_ratio_pm"] == 1000


class TestPartitionSkew:
    def test_counts_and_layout(self, spark):
        df = _df(spark).repartition(8)
        got = partition_skew_stats(df).collect()[0]
        assert got["n_rows"] == 100
        assert got["n_partitions"] <= 8
        assert got["min_rows"] >= 1 and got["max_rows"] <= 100
        # a single-partition layout is perfectly "balanced"
        one = partition_skew_stats(_df(spark).coalesce(1)).collect()[0]
        assert one["n_partitions"] == 1 and one["skew_ratio_pm"] == 1000


class TestLengthHistogram:
    def test_buckets_exact(self, spark):
        from energy_pandas_spark.operators.diagnostics import length_histogram

        vals = [0, 1, 1, 2, 3, 4, 7, 8, 1023, 1024, 2**40]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r.bucket: (r.lo, r.hi, r.n_rows, r.sum_value)
            for r in length_histogram(df, "v").collect()
        }
        assert got[-1] == (0, 0, 1, 0)
        assert got[0] == (1, 1, 2, 2)
        assert got[1] == (2, 3, 2, 5)
        assert got[2] == (4, 7, 2, 11)
        assert got[3] == (8, 15, 1, 8)
        assert got[9] == (512, 1023, 1, 1023)
        assert got[10] == (1024, 2047, 1, 1024)
        assert got[40] == (1 << 40, (1 << 41) - 1, 1, 1 << 40)

    def test_grouped(self, spark):
        from energy_pandas_spark.operators.diagnostics import length_histogram

        df = spark.createDataFrame(
            [("a", 5), ("a", 6), ("b", 5)], "g string, v long"
        )
        got = {
            (r.g, r.bucket): r.n_rows
            for r in length_histogram(df, "v", by="g").collect()
        }
        assert got == {("a", 2): 2, ("b", 2): 1}


class TestPackingStats:
    def test_report_matches_hand_computation(self, spark):
        from energy_pandas_spark.operators.packing import (
            pack_sequences,
            packing_stats,
        )

        rows = [(i, 10 + (i % 3)) for i in range(20)]  # tokens 10/11/12
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        packed = pack_sequences(df, "n_tokens", budget=16, n_buckets=4)
        got = packing_stats(packed, "n_tokens", budget=16).collect()[0]
        # replay per bucket in python
        import hashlib

        buckets = {}
        for i, t in rows:
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 4
            buckets[b] = buckets.get(b, 0) + t
        seqs = sum((t + 15) // 16 for t in buckets.values())
        total = sum(buckets.values())
        assert got.n_docs == 20 and got.total_tokens == total
        assert got.n_buckets_used == len(buckets)
        assert got.n_seqs == seqs
        assert got.capacity == seqs * 16
        assert got.waste_tokens == seqs * 16 - total
        assert got.utilization_permille == (1000 * total) // (seqs * 16)

    def test_budget_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.packing import packing_stats

        df = spark.createDataFrame([(0, 1, 1)], "doc_id long, n_tokens long, pack_bucket int")
        with _pytest.raises(ValueError):
            packing_stats(df, "n_tokens", budget=0)


class TestCalibration:
    def _scored(self, spark, n=4000):
        # score = u; label ~ Bernoulli(u^2) via an independent hash ->
        # overconfident at low scores, underconfident near 1
        import hashlib

        rows = []
        for i in range(n):
            s_pm = (i * 37) % 1000
            h = int(hashlib.md5(f"lbl:{i}".encode()).hexdigest()[:15], 16) % 1000
            rows.append((i, s_pm / 1000.0, 1 if h < (s_pm * s_pm) // 1000 else 0))
        return spark.createDataFrame(rows, "id long, score double, label int"), rows

    def test_curve_matches_python_replay(self, spark):
        from energy_pandas_spark.operators.diagnostics import calibration_curve

        df, rows = self._scored(spark)
        got = {
            r.bin: (r.n_rows, r.n_positive, r.score_q_sum,
                    r.positive_permille, r.conf_permille)
            for r in calibration_curve(df, "score", "label").collect()
        }
        bins = {}
        for _, s, y in rows:
            b = min(int(s * 10), 9)
            n, p, sq = bins.get(b, (0, 0, 0))
            bins[b] = (n + 1, p + y, sq + round(s * 1_000_000))
        want = {
            b: (n, p, sq, (1000 * p) // n, (1000 * sq) // (1_000_000 * n))
            for b, (n, p, sq) in bins.items()
        }
        assert got == want
        # the planted miscalibration (label rate s^2 < score s) shows:
        # every bin observes no more positives than it predicts, with
        # the mid bins diverging most (s - s^2 peaks at 0.5)
        assert all(v[3] <= v[4] for v in got.values())
        mid_gap = got[5][4] - got[5][3]
        assert mid_gap > got[9][4] - got[9][3]
        assert mid_gap > 150

    def test_ece_exact(self, spark):
        from energy_pandas_spark.operators.diagnostics import calibration_ece

        df, rows = self._scored(spark)
        got = calibration_ece(df, "score", "label").collect()[0]
        bins = {}
        for _, s, y in rows:
            b = min(int(s * 10), 9)
            n, p, sq = bins.get(b, (0, 0, 0))
            bins[b] = (n + 1, p + y, sq + round(s * 1_000_000))
        want = sum(
            abs(p * 1_000_000 - sq) for (n, p, sq) in bins.values()
        ) // len(rows)
        assert got.ece_ppm == want and got.n_rows == len(rows)
        # a perfectly calibrated synthetic scorer lands near zero
        from energy_pandas_spark.operators.diagnostics import calibration_curve  # noqa: F401
        import hashlib

        cal = spark.createDataFrame(
            [
                (
                    i,
                    ((i * 37) % 1000) / 1000.0,
                    1
                    if int(hashlib.md5(f"lbl:{i}".encode()).hexdigest()[:15], 16)
                    % 1000
                    < (i * 37) % 1000
                    else 0,
                )
                for i in range(4000)
            ],
            "id long, score double, label int",
        )
        good = calibration_ece(cal, "score", "label").collect()[0]
        assert good.ece_ppm < got.ece_ppm / 3

    def test_out_of_range_scores_clamp(self, spark):
        from energy_pandas_spark.operators.diagnostics import calibration_curve

        df = spark.createDataFrame(
            [(1, -0.2, 0), (2, 1.0, 1), (3, 1.7, 1)],
            "id long, score double, label int",
        )
        got = {r.bin: r.n_rows for r in
               calibration_curve(df, "score", "label").collect()}
        assert got == {0: 1, 9: 2}

    def test_n_bins_validation(self, spark):
        import pytest as _pytest

        from energy_pandas_spark.operators.diagnostics import calibration_curve

        df = spark.createDataFrame([(1, 0.5, 1)], "id long, score double, label int")
        with _pytest.raises(ValueError):
            calibration_curve(df, "score", "label", n_bins=0)

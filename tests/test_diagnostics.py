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

"""Distributed prefix-sum shard planner (operators/sharding.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.operators.sharding import (
    sequential_shards,
    shard_manifest,
)

TARGET = 5000


@pytest.fixture(scope="module")
def weighted(spark):
    # deterministic pseudo-random weights; ids deliberately shuffled
    # across partitions so physical layout cannot leak into results
    rows = [(i, (i * 2654435761) % 400 + 1) for i in range(1500)]
    return spark.createDataFrame(rows, "doc_id long, wt long").repartition(7)


def _naive(rows):
    acc, out = 0, {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        out[r.doc_id] = (acc, acc // TARGET)
        acc += r.wt
    return out


def test_matches_naive_global_cumsum(spark, weighted):
    expected = _naive(weighted.collect())
    got = sequential_shards(weighted, "wt", "doc_id", TARGET, n_buckets=8)
    for r in got.collect():
        assert (r.cum_before, r.shard_id) == expected[r.doc_id]


def test_bucket_count_never_changes_results(spark, weighted):
    a = {
        r.doc_id: (r.cum_before, r.shard_id)
        for r in sequential_shards(weighted, "wt", "doc_id", TARGET, n_buckets=1).collect()
    }
    b = {
        r.doc_id: (r.cum_before, r.shard_id)
        for r in sequential_shards(weighted, "wt", "doc_id", TARGET, n_buckets=13).collect()
    }
    assert a == b


def test_null_weights_count_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, wt long"
    )
    rows = {
        r.doc_id: r.cum_before
        for r in sequential_shards(df, "wt", "doc_id", 100, n_buckets=2).collect()
    }
    assert rows == {1: 0, 2: 10, 3: 10}


def test_shard_fill_bound(spark, weighted):
    planned = sequential_shards(weighted, "wt", "doc_id", TARGET, n_buckets=8)
    m = shard_manifest(planned, "wt", "doc_id")
    max_w = weighted.agg(F.max("wt")).collect()[0][0]
    worst = m.agg(F.max("total_weight")).collect()[0][0]
    # greedy fill: a shard never exceeds target + heaviest row - 1
    assert worst <= TARGET + max_w - 1
    # shards partition the corpus: weights and rows add up
    tot = m.agg(F.sum("total_weight"), F.sum("n_rows")).collect()[0]
    assert (tot[0], tot[1]) == (weighted.agg(F.sum("wt")).collect()[0][0], 1500)
    # order ranges are disjoint and consecutive
    rows = m.orderBy("shard_id").collect()
    for prev, cur in zip(rows, rows[1:]):
        assert prev.last_order < cur.first_order


def test_no_single_partition_window(spark, weighted):
    plan = (
        sequential_shards(weighted, "wt", "doc_id", TARGET, n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point: a distributed prefix sum, not Window.orderBy
    # over SinglePartition; and the row path stays JVM-side
    assert "SinglePartition" not in plan
    assert "Python" not in plan
    assert plan.count("Exchange") <= 2


def test_rejects_bad_target(spark, weighted):
    with pytest.raises(ValueError, match="positive"):
        sequential_shards(weighted, "wt", "doc_id", 0)

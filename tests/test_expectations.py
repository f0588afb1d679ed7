"""Single-pass expectations suite: rule correctness, the one-scan
plan contract, and the violations helper."""

import pytest
from pyspark.sql import Row, functions as F

from energy_pandas_spark.operators.expectations import (
    expect_in_range,
    expect_in_set,
    expect_matches,
    expect_min_rows,
    expect_no_nulls,
    expect_null_share_below,
    expect_share_at_least,
    expect_unique,
    validate,
    violations,
)


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        [
            Row(id=1, lang="en", score=10, text="hello world"),
            Row(id=2, lang="fr", score=55, text=""),
            Row(id=3, lang=None, score=120, text="ok"),
            Row(id=3, lang="en", score=-5, text="dup id"),
            Row(id=5, lang="xx", score=40, text=None),
        ]
    )


def _suite():
    # built lazily: Column construction needs an active session
    return [
        expect_min_rows(3),
        expect_no_nulls("id"),
        expect_no_nulls("lang"),
        expect_null_share_below("text", 300),
        expect_unique("id"),
        expect_in_range("score", 0, 100),
        expect_in_set("lang", ["en", "fr", "de"]),
        expect_matches("lang", "[a-z]{2}"),
        expect_share_at_least("nonempty_text", F.length("text") > 0, 600),
    ]


def test_validate_metrics_and_verdicts(sample):
    suite = _suite()
    rows = {(r.expectation, r.column): r for r in validate(sample, suite).collect()}
    assert len(rows) == len(suite)

    r = rows[("min_rows", "*")]
    assert (r.metric, r.bound, r.ok) == (5, 3, True)
    r = rows[("no_nulls", "id")]
    assert (r.metric, r.ok) == (0, True)
    r = rows[("no_nulls", "lang")]
    assert (r.metric, r.ok) == (1, False)
    # 1 NULL text of 5 rows -> 200 pm <= 300
    r = rows[("null_share_below", "text")]
    assert (r.metric, r.bound, r.ok) == (200, 300, True)
    # ids 1,2,3,3,5 -> 5 complete rows, 4 distinct -> 1 duplicate
    r = rows[("unique", "id")]
    assert (r.metric, r.ok) == (1, False)
    # 120 and -5 are out of [0, 100]
    r = rows[("in_range", "score")]
    assert (r.metric, r.ok) == (2, False)
    # 'xx' is outside the accepted set (NULL lang is not counted)
    r = rows[("in_set", "lang")]
    assert (r.metric, r.ok) == (1, False)
    # every non-NULL lang matches [a-z]{2}
    r = rows[("matches", "lang")]
    assert (r.metric, r.ok) == (0, True)
    # 3 of 5 rows have non-empty text -> 600 pm >= 600
    r = rows[("share_at_least", "nonempty_text")]
    assert (r.metric, r.bound, r.ok) == (600, 600, True)


def test_single_pass_plan(sample):
    # the whole point: N rules, ONE scan of the input
    plan = validate(sample, _suite())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1
    # and no Python on the path
    assert "Python" not in plan


def test_row_order_matches_suite_order(sample):
    suite = _suite()
    names = [r.expectation for r in validate(sample, suite).collect()]
    assert names == [e.name for e in suite]


def test_violations_filter(sample):
    bad = violations(sample, expect_in_range("score", 0, 100)).collect()
    assert sorted(r.score for r in bad) == [-5, 120]
    bad = violations(sample, expect_in_set("lang", ["en", "fr", "de"]), limit=1).collect()
    assert len(bad) == 1 and bad[0].lang == "xx"
    # share_at_least's violations are the rows NOT satisfying the predicate
    # (NULL predicate counts as violating, same as the metric side)
    bad = violations(
        sample, expect_share_at_least("nonempty_text", F.length("text") > 0, 600)
    ).collect()
    assert sorted((r.id for r in bad)) == [2, 5]


def test_violations_rejects_aggregate_only(sample):
    with pytest.raises(ValueError, match="aggregate-only"):
        violations(sample, expect_unique("id"))
    with pytest.raises(ValueError, match="aggregate-only"):
        violations(sample, expect_min_rows(1))


def test_validate_requires_rules(sample):
    with pytest.raises(ValueError, match="at least one"):
        validate(sample, [])


def test_unique_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [Row(k=None), Row(k=None), Row(k=1), Row(k=1), Row(k=2)]
    )
    r = validate(df, [expect_unique("k")]).collect()[0]
    # two NULL keys are excluded; 1,1,2 -> one duplicate
    assert (r.metric, r.ok) == (1, False)


def test_multicol_unique(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=1, b="y"), Row(a=1, b="y"), Row(a=2, b=None)]
    )
    r = validate(df, [expect_unique("a", "b")]).collect()[0]
    # (2, NULL) excluded as incomplete; (1,y) duplicated once
    assert (r.metric, r.ok) == (1, False)

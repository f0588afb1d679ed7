"""Bucketed tables eliminate the join-time shuffle (sources.bucketing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.sources.bucketing import bucketed_table, save_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    save_bucketed(li, "b_li", 4, "l_orderkey", sort_cols="l_orderkey")
    save_bucketed(orders, "b_ord", 4, "l_orderkey", sort_cols="l_orderkey")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_table(spark, "b_li").join(
            bucketed_table(spark, "b_ord"), "l_orderkey"
        )
        joined.write.format("noop").mode("overwrite").save()
        plan = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # same bucketing on both sides: the sort-merge join reads buckets
    # zipped — no exchange anywhere in the executed plan
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan

    # and the result is the plain-join result
    n_bucketed = joined.count()
    n_plain = li.join(orders, "l_orderkey").count()
    assert n_bucketed == n_plain


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(li.join(orders, "l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" in plan  # the contrast case

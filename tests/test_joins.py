"""Temporal + skew-guard joins (operators.joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.operators.joins import asof_join, interval_join, salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed: 90% of left rows share key 1
    left = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 100 + k) for k in range(2, 12)],
        "k long, lv long",
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(0, 12)], "k long, rv long"
    )
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", salt=4).collect()}
    assert salted == plain and len(plain) == 100


def test_salted_join_left_how(spark):
    left = spark.createDataFrame([(1, 10), (99, 11)], "k long, lv long")
    right = spark.createDataFrame([(1, 100)], "k long, rv long")
    rows = sorted(
        (r.k, r.lv, r.rv) for r in salted_join(left, right, "k", how="left").collect()
    )
    assert rows == [(1, 10, 100), (99, 11, None)]


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "id long, ts_s string"
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", 5.0), ("2024-01-01 09:00:00", 3.0)],
        "ts_s string, v double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "v")
    out = asof_join(left, right, on="ts", right_cols=["v"]).collect()
    assert out[0].v == 5.0  # same-instant right row matches


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:30:00")], "id long, ts_s string"
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 11:00:00", 2.0)],
        "ts_s string, v double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "v")
    back = asof_join(left, right, on="ts", right_cols=["v"]).collect()[0].v
    fwd = asof_join(
        left, right, on="ts", right_cols=["v"], direction="forward"
    ).collect()[0].v
    assert (back, fwd) == (1.0, 2.0)


def test_interval_join_half_open(spark):
    facts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 06:00:00")],
        "id long, ts_s string",
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 06:00:00", 1)],
        "s string, e string, w long",
    ).select(
        F.to_timestamp("s").alias("start"), F.to_timestamp("e").alias("end"), "w"
    )
    got = sorted(r.id for r in interval_join(facts, iv).collect())
    assert got == [1]  # start inclusive, end exclusive


def test_asof_broadcast_matches_union_variant(spark, sf_dir):
    from energy_pandas_spark.sources.readers import load_table
    from energy_pandas_spark.operators.joins import asof_join_broadcast

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts")).agg(
        F.round(F.avg("value"), 6).alias("hr_avg")
    )
    a = asof_join(ev, hourly, on="ts", by="user_id", right_cols=["hr_avg"])
    b = asof_join_broadcast(ev, hourly, on="ts", by="user_id", right_cols=["hr_avg"])
    ra = {(r.event_id, r.hr_avg) for r in a.select("event_id", "hr_avg").collect()}
    rb = {(r.event_id, r.hr_avg) for r in b.select("event_id", "hr_avg").collect()}
    assert ra == rb and len(ra) == ev.count()


def test_asof_broadcast_no_left_shuffle(spark, sf_dir):
    from energy_pandas_spark.sources.readers import load_table
    from energy_pandas_spark.operators.joins import asof_join_broadcast

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts")).agg(
        F.avg("value").alias("hr_avg")
    )
    out = asof_join_broadcast(ev, hourly, on="ts", by="user_id", right_cols=["hr_avg"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only exchanges allowed are the broadcast + the right side's
    # packing aggregate; the left/fact side must join broadcast-style
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    import re
    shuffles = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # any hash exchange must belong to the packed right side (group on
    # user_id), never re-key the left fact rows
    assert all("user_id" in s for s in shuffles)


def test_interval_join_bucketed_matches_plain(spark, sf_dir):
    """Range-bucketed equi-join formulation == broadcast range join."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.joins import interval_join_bucketed
    from energy_pandas_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    cal = spark.sql(
        """
        SELECT w AS start, w + INTERVAL 6 HOURS AS end,
               CAST(date_format(w, 'yyyyMMddHH') AS LONG) AS window_id
        FROM (SELECT explode(sequence(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-31',
                                      INTERVAL 24 HOURS)) AS w)
        """
    )
    plain = sorted(
        (r.event_id, r.window_id)
        for r in interval_join(ev, cal, ts_col="ts").select("event_id", "window_id").collect()
    )
    bucketed = sorted(
        (r.event_id, r.window_id)
        for r in interval_join_bucketed(ev, cal, ts_col="ts", grain="1 hour")
        .select("event_id", "window_id")
        .collect()
    )
    assert plain == bucketed and len(plain) > 0


def test_interval_join_bucketed_edges(spark):
    """Half-open semantics + degenerate intervals on the bucketed path."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.operators.joins import interval_join_bucketed

    facts = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "id long, ts_s string",
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),  # [10, 12)
            ("b", "2024-01-01 12:00:00", "2024-01-01 12:00:00"),  # empty
            ("c", "2024-01-01 13:00:00", "2024-01-01 11:00:00"),  # inverted
        ],
        "name string, s string, e string",
    ).select(
        "name",
        F.to_timestamp("s").alias("start"),
        F.to_timestamp("e").alias("end"),
    )
    got = sorted(
        (r.id, r.name)
        for r in interval_join_bucketed(facts, iv, grain="30 minutes").collect()
    )
    assert got == [(1, "a")]  # 12:00 excluded (half-open); b, c match nothing


def test_asof_join_tolerance(spark):
    from energy_pandas_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "lid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("2024-01-01 09:59:00", 1.0)], "ts string, price double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    loose = {r["lid"]: r["price"] for r in asof_join(left, right).collect()}
    assert loose == {1: 1.0, 2: 1.0}  # both match the 09:59 row

    tight = {
        r["lid"]: r["price"]
        for r in asof_join(
            left, right, tolerance_seconds=300
        ).collect()
    }
    # 10:00 is 60s after the match (within 5 min); 12:00 is 2h past
    assert tight == {1: 1.0, 2: None}

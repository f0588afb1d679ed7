"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins, each verified against the identical
batch join (availableNow drains the stream; watermarks are no-ops in
batch, so the results must agree exactly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.streaming.joins import enrich_stream, stream_interval_join

_EV = "event_id long, ts_s string, user_id long, event_type string, value double"


def _events(spark, rows):
    return (
        spark.createDataFrame(rows, _EV)
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
    )


def test_stream_static_enrichment(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    _events(
        spark,
        [
            (0, "2024-01-01 10:00:00", 1, "click", 1.0),
            (1, "2024-01-01 10:01:00", 2, "view", 2.0),
            (2, "2024-01-01 10:02:00", 3, "signup", 3.0),
        ],
    ).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [("click", 0.5), ("view", 1.5)], "event_type string, weight double"
    )
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).parquet(src)
    q = (
        enrich_stream(stream, dim, "event_type")
        .withColumn("weighted", F.col("value") * F.col("weight"))
        .writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r.event_id: r.weighted for r in spark.sql("select * from enriched").collect()
    }
    assert got == {0: 0.5, 1: 3.0, 2: None}  # no dim row for id 2 -> left join null


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks_rows = [
        (0, "2024-01-01 10:00:00", 1, "click", 1.0),
        (1, "2024-01-01 11:00:00", 2, "click", 1.0),
        (2, "2024-01-01 12:00:00", 1, "click", 1.0),
    ]
    buys_rows = [
        (10, "2024-01-01 10:05:00", 1, "purchase", 9.0),   # joins click 0
        (11, "2024-01-01 11:20:00", 2, "purchase", 8.0),   # outside 10 min
        (12, "2024-01-01 12:01:00", 1, "purchase", 7.0),   # joins click 2
    ]
    csrc, bsrc = str(tmp_path / "c"), str(tmp_path / "b")
    _events(spark, clicks_rows).coalesce(1).write.parquet(csrc)
    _events(spark, buys_rows).coalesce(1).write.parquet(bsrc)

    schema = "event_id long, user_id long, event_type string, value double, ts timestamp"
    cs = spark.readStream.schema(schema).parquet(csrc)
    bs = spark.readStream.schema(schema).parquet(bsrc)
    joined = stream_interval_join(cs, bs, key="user_id", upper="10 minutes")
    chk = str(tmp_path / "chk")
    q = (
        joined.select("event_id", "event_id_r")
        .writeStream.format("memory")
        .queryName("ssjoin")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = sorted(
        (r.event_id, r.event_id_r)
        for r in spark.sql("select * from ssjoin").collect()
    )
    # batch equivalence: same function over batch frames
    batch = sorted(
        (r.event_id, r.event_id_r)
        for r in stream_interval_join(
            _events(spark, clicks_rows), _events(spark, buys_rows),
            key="user_id", upper="10 minutes",
        ).select("event_id", "event_id_r").collect()
    )
    assert got == batch == [(0, 10), (2, 12)]


def test_interval_join_self_derived_sources(spark, sf_dir):
    """Both sides sliced from the SAME base frame: the key equality
    must not collapse into a trivially-true self-join predicate (which
    would silently produce a time-filtered cross join)."""
    from energy_pandas_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    out = stream_interval_join(clicks, buys, key="user_id", upper="10 minutes")
    clicks.createOrReplaceTempView("c")
    buys.createOrReplaceTempView("b")
    truth = spark.sql(
        """
        SELECT count(*) FROM c JOIN b ON c.user_id = b.user_id
        AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTES
        """
    ).first()[0]
    assert out.count() == truth


def test_burst_dedup_stream_matches_batch(spark, tmp_path):
    """availableNow drains the stream; the emitted survivors must equal
    the batch operator on the same data (append mode emits each burst
    once its watermark passes; a final far-future event closes all)."""
    from energy_pandas_spark.operators.analytics import dedup_bursts
    from energy_pandas_spark.streaming.events import burst_dedup_stream

    rows = [
        (0, "2024-01-01 10:00:00", 1, "click", 1.0),
        (1, "2024-01-01 10:00:30", 1, "click", 2.0),   # chains -> dropped
        (2, "2024-01-01 10:05:00", 1, "click", 3.0),   # new burst
        (3, "2024-01-01 10:00:10", 2, "view", 4.0),
        (4, "2024-01-01 10:00:40", 2, "view", 5.0),    # chains -> dropped
        (9, "2024-01-02 00:00:00", 9, "late", 0.0),    # closes watermarks
    ]
    src = str(tmp_path / "bsrc")
    chk = str(tmp_path / "bchk")
    batch = _events(spark, rows)
    batch.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, value double, ts timestamp"
    ).parquet(src)
    q = (
        burst_dedup_stream(stream, tolerance="60 seconds", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("burst_dedup")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.event_id for r in spark.sql("select * from burst_dedup").collect()}
    expect = {
        r.event_id
        for r in dedup_bursts(batch, tolerance="60 seconds").collect()
    }
    # the watermark-closing sentinel may or may not have been emitted
    # (its own burst is still open at end-of-stream) — compare on the
    # closed keys only
    assert got - {9} == expect - {9}
    assert {0, 2, 3} <= got and 1 not in got and 4 not in got

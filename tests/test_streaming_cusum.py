"""Streaming CUSUM: keyed integer state across micro-batches; a
drained stream equals the batch operator bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from energy_pandas_spark.operators.analytics import cusum_alarms
from energy_pandas_spark.streaming.cusum import streaming_cusum


def _write(spark, rows, dest):
    (
        spark.createDataFrame(rows, "event_type string, ts_s string, value double")
        .select("event_type", F.to_timestamp("ts_s").alias("ts"), "value")
        .coalesce(1)
        .write.parquet(dest)
    )


def test_drained_stream_equals_batch_exactly(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    rows1 = [
        ("a", f"2024-01-01 10:{i:02d}:00", 1.0 + (i % 3) * 0.5)
        for i in range(10)
    ]
    # batch 2: key a shifts level (alarms should fire); key b stays calm
    rows2 = [
        ("a", f"2024-01-01 11:{i:02d}:00", 6.0 + (i % 2) * 0.25)
        for i in range(10)
    ] + [("b", f"2024-01-01 11:{i:02d}:00", 0.5) for i in range(10)]
    _write(spark, rows1, src + "/b1")
    _write(spark, rows2, src + "/b2")

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema("event_type string, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            streaming_cusum(
                stream, target=1.5, drift=0.5, threshold=10.0
            )
            .writeStream.format("memory")
            .queryName("cusums")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    streamed = {
        (r["key"], r["ts"]): (r["value"], r["cusum"], r["alarm"])
        for r in spark.sql("select * from cusums").collect()
    }

    batch_df = spark.read.parquet(src + "/*")
    batch = {
        (r["event_type"], r["ts"]): (r["value"], r["cusum"], r["alarm"])
        for r in cusum_alarms(
            batch_df, "ts", "value", by="event_type",
            target=1.5, drift=0.5, threshold=10.0,
        ).collect()
    }
    assert streamed == batch  # bit-for-bit, state carried across batches

    # the shifted key alarms eventually; the calm key never does
    assert any(a for (k, _), (_, _, a) in streamed.items() if k == "a")
    assert not any(a for (k, _), (_, _, a) in streamed.items() if k == "b")


def test_null_value_does_not_kill_the_query(spark, tmp_path):
    """A NULL value must not crash the kernel (int(nan) raises) nor
    poison the accumulator: the row scores at the unchanged running
    statistic, exactly like the batch twin whose quantized NULL is
    skipped by the prefix window sum."""
    src = str(tmp_path / "srcn")
    chk = str(tmp_path / "chkn")
    rows = [("a", "2024-01-01 10:00:00", 5.0),
            ("a", "2024-01-01 10:01:00", None),
            ("a", "2024-01-01 10:02:00", 5.0)]
    _write(spark, rows, src + "/b1")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .parquet(src + "/*")
    )
    q = (
        streaming_cusum(stream, target=1.0, threshold=3.0)
        .writeStream.format("memory")
        .queryName("cusums_null")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        str(r["ts"]): (r["cusum"], r["alarm"])
        for r in spark.sql("select * from cusums_null").collect()
    }
    assert len(got) == 3
    # NULL row carries the statistic forward unchanged (s after row 1
    # is 4.0; the NULL row repeats it; row 3 adds another +4)
    assert got["2024-01-01 10:00:00"] == (4.0, True)
    assert got["2024-01-01 10:01:00"] == (4.0, True)
    assert got["2024-01-01 10:02:00"] == (8.0, True)


def test_leading_nulls_emit_null_like_batch(spark, tmp_path):
    """A key whose rows so far are ALL null must emit NULL cusum/alarm
    (the batch twin's prefix SUM over zero non-null deviations is
    NULL), not the zero-initialized statistic — including across a
    micro-batch boundary, where the 'seen' flag rides the state
    (ADVICE r4). Once the first non-null lands, later NULL rows carry
    the running statistic as before. Pinned as a full batch/stream
    equality, not just spot values."""
    src = str(tmp_path / "srcln")
    chk = str(tmp_path / "chkln")
    # batch 1: key a starts with two NULLs; key b starts non-null
    _write(spark, [("a", "2024-01-01 10:00:00", None),
                   ("a", "2024-01-01 10:01:00", None),
                   ("b", "2024-01-01 10:00:00", 5.0)], src + "/b1")
    # batch 2: key a is STILL all-null at its head (flag must have
    # crossed the checkpoint), then gets its first value
    _write(spark, [("a", "2024-01-01 11:00:00", None),
                   ("a", "2024-01-01 11:01:00", 5.0),
                   ("a", "2024-01-01 11:02:00", None),
                   ("b", "2024-01-01 11:00:00", None)], src + "/b2")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_cusum(stream, target=1.0, threshold=3.0)
        .writeStream.format("memory")
        .queryName("cusums_lnull")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    streamed = {
        (r["key"], str(r["ts"])): (r["cusum"], r["alarm"])
        for r in spark.sql("select * from cusums_lnull").collect()
    }
    batch = {
        (r["event_type"], str(r["ts"])): (r["cusum"], r["alarm"])
        for r in cusum_alarms(
            spark.read.parquet(src + "/*"), "ts", "value",
            by="event_type", target=1.0, threshold=3.0,
        ).collect()
    }
    assert streamed == batch
    # and the shape is what the batch semantics dictate: NULLs until
    # first value, running statistic after
    assert streamed[("a", "2024-01-01 10:00:00")] == (None, None)
    assert streamed[("a", "2024-01-01 11:00:00")] == (None, None)
    assert streamed[("a", "2024-01-01 11:01:00")] == (4.0, True)
    assert streamed[("a", "2024-01-01 11:02:00")] == (4.0, True)
    assert streamed[("b", "2024-01-01 11:00:00")] == (4.0, True)

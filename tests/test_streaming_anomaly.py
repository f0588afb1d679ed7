"""Streaming running z-score: per-key Welford state carried across
micro-batches; each event scored only against its predecessors."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from energy_pandas_spark.streaming.anomaly import streaming_zscore


def _write(spark, rows, dest):
    (
        spark.createDataFrame(rows, "user_id long, ts_s string, value double")
        .select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
        .coalesce(1)
        .write.parquet(dest)
    )


def test_running_zscore_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    # batch 1: a stable baseline for user 1
    _write(
        spark,
        [(1, f"2024-01-01 10:{i:02d}:00", 10.0 + (i % 3)) for i in range(8)],
        src + "/b1",
    )
    # batch 2 (later trigger): a wild outlier + a normal point
    _write(
        spark,
        [
            (1, "2024-01-01 11:00:00", 500.0),
            (1, "2024-01-01 11:01:00", 11.0),
        ],
        src + "/b2",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            streaming_zscore(stream, threshold=3.0)
            .writeStream.format("memory")
            .queryName("zscores")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    rows = sorted(
        spark.sql("select * from zscores").collect(), key=lambda r: r.ts
    )
    assert len(rows) == 10
    by_value = {r.value: r for r in rows}
    # the outlier is flagged, using state accumulated in batch 1
    assert by_value[500.0].is_anomaly == "yes"
    assert by_value[500.0].zscore > 3.0
    # early events (no variance yet) and normal events are not flagged
    assert by_value[10.0].is_anomaly == "no"
    assert by_value[11.0].is_anomaly == "no"
    # z-score of the outlier matches a hand Welford over batch 1
    import statistics

    base = [10.0 + (i % 3) for i in range(8)]
    expect = (500.0 - statistics.mean(base)) / statistics.stdev(base)
    assert math.isclose(by_value[500.0].zscore, expect, rel_tol=1e-9)

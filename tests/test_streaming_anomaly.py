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


def test_streaming_heavy_hitters(spark, tmp_path):
    """SpaceSaving sketch across micro-batches: heavy items are present
    with counts inside the [count - error, count] bound vs exact."""
    from collections import Counter

    from energy_pandas_spark.streaming.heavy_hitters import (
        streaming_heavy_hitters,
    )

    src = str(tmp_path / "hhsrc")
    chk = str(tmp_path / "hhchk")
    # skewed stream: item_i has frequency ~ 1000/i (zipf-ish), split
    # across two files -> two micro-batches
    items = []
    for i in range(1, 40):
        items.extend([f"item{i:02d}"] * (1000 // i))
    b1, b2 = items[::2], items[1::2]
    for n, batch in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            [(x,) for x in batch], "event_type string"
        ).coalesce(1).write.parquet(f"{src}/{n}")

    stream = (
        spark.readStream.schema("event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_heavy_hitters(stream, capacity=12, n_groups=4)
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    # the final sketch per group = the emission with that group's
    # largest group_total (totals only grow)
    rows = spark.sql("select * from hh").collect()
    max_total = {}
    for r in rows:
        max_total[r.group] = max(max_total.get(r.group, 0), r.group_total)
    sketch = {
        r.item: r for r in rows if r.group_total == max_total[r.group]
    }
    exact = Counter(items)
    # every tracked item obeys the SpaceSaving bound
    for item, r in sketch.items():
        true = exact[item]
        assert r["count"] >= true >= r["count"] - r.error, (item, r, true)
    # guaranteed-heavy items (true count > group_total/capacity) present
    groups = {
        r.i: r.g
        for r in spark.createDataFrame(
            [(x,) for x in exact], "i string"
        ).select(
            "i", F.pmod(F.xxhash64("i"), F.lit(4)).cast("int").alias("g")
        ).collect()
    }
    for item, true in exact.items():
        if true > max_total[groups[item]] / 12:
            assert item in sketch, (item, true)
    # the heaviest items were never evicted: exact counts, zero error
    for item, _ in exact.most_common(3):
        assert sketch[item].error == 0 and sketch[item]["count"] == exact[item]


def test_zscore_string_key_and_nan_values(spark, tmp_path):
    """A NULL value must pass through unscored WITHOUT entering the
    Welford state (one NaN would poison mean/m2 for the key forever),
    and the output key field mirrors the input key's name and type."""
    src = str(tmp_path / "nансrc".replace("ан", "an"))
    chk = str(tmp_path / "nanchk")
    rows = [("dev-a", f"2024-01-01 10:{i:02d}:00", 10.0 + (i % 3)) for i in range(8)]
    rows.append(("dev-a", "2024-01-01 10:30:00", None))  # mid-stream NULL
    rows.append(("dev-a", "2024-01-01 11:00:00", 500.0))  # still an outlier
    (
        spark.createDataFrame(rows, "device string, ts_s string, value double")
        .select("device", F.to_timestamp("ts_s").alias("ts"), "value")
        .coalesce(1)
        .write.parquet(src)
    )
    stream = (
        spark.readStream.schema("device string, ts timestamp, value double")
        .parquet(src)
    )
    q = (
        streaming_zscore(stream, key="device", threshold=3.0)
        .writeStream.format("memory")
        .queryName("zdev")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.sql("select * from zdev")
    assert out.schema["device"].dataType.simpleString() == "string"
    rows = out.collect()
    assert len(rows) == 10
    def _is_null(v):
        return v is None or math.isnan(v)

    by_value = {r.value: r for r in rows if not _is_null(r.value)}
    nan_rows = [r for r in rows if _is_null(r.value)]
    # the NULL row is emitted, unscored
    assert len(nan_rows) == 1
    assert nan_rows[0].is_anomaly == "no" and nan_rows[0].zscore == 0.0
    # the outlier's z-score is computed from the 8 REAL baseline points
    import statistics

    base = [10.0 + (i % 3) for i in range(8)]
    expect = (500.0 - statistics.mean(base)) / statistics.stdev(base)
    assert by_value[500.0].is_anomaly == "yes"
    assert math.isclose(by_value[500.0].zscore, expect, rel_tol=1e-9)
    assert all(r.device == "dev-a" for r in rows)

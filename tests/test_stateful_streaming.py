"""Stateful streaming dedup: duplicates dropped ACROSS micro-batches
(the per-batch case plus keyed state across triggers).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def test_streaming_dedup_across_batches(spark, tmp_path):
    from energy_pandas_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "docs_stream")
    chk = str(tmp_path / "chk")
    # batch 1: two distinct docs + an in-batch duplicate
    spark.createDataFrame(
        [
            (0, "alpha beta gamma", "2024-01-01 00:00:00"),
            (1, "alpha beta gamma", "2024-01-01 00:00:01"),
            (2, "delta epsilon", "2024-01-01 00:00:02"),
        ],
        "doc_id long, text string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1).write.parquet(
        src + "/b1"
    )
    # batch 2 (separate file -> later micro-batch): cross-batch dup + new
    spark.createDataFrame(
        [
            (3, "ALPHA   beta gamma", "2024-01-01 00:01:00"),  # dup after normalize
            (4, "zeta eta", "2024-01-01 00:01:01"),
        ],
        "doc_id long, text string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").coalesce(1).write.parquet(
        src + "/b2"
    )

    # fewer state-store partitions -> fewer per-batch checkpoint syncs
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        q = (
            streaming_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "streaming query did not finish in time"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    rows = spark.sql("select * from dedup_out").collect()
    emitted = sorted(r["doc_id"] for r in rows)
    # one row per distinct content; in-batch dup (1) and cross-batch dup
    # (3) suppressed; 3 distinct contents total
    assert len(rows) == 3
    assert 1 not in emitted and 3 not in emitted
    assert set(emitted) == {0, 2, 4}


def test_streaming_dedup_ts_tie_breaks_on_doc_id(spark, tmp_path):
    """Two copies of one digest with IDENTICAL timestamps in one batch:
    the emitted first-seen row must be the smallest doc_id — a
    deterministic winner across retries/replays, not shuffle order."""
    from pyspark.sql import functions as F

    from energy_pandas_spark.streaming.stateful import (
        streaming_dedup,
        with_digest,
    )

    src = str(tmp_path / "tiesrc")
    chk = str(tmp_path / "tiechk")
    (
        spark.createDataFrame(
            [(9, "2024-01-01 10:00:00", "same text"),
             (3, "2024-01-01 10:00:00", "same text"),
             (5, "2024-01-01 10:00:00", "same text")],
            "doc_id long, ts_s string, text string",
        )
        .select("doc_id", F.to_timestamp("ts_s").alias("ts"), "text")
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).parquet(src)
    q = (
        streaming_dedup(with_digest(stream))
        .writeStream.format("memory")
        .queryName("dedup_tie")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.sql("select * from dedup_tie").collect()
    assert len(rows) == 1 and rows[0].doc_id == 3

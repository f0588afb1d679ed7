"""load_table layout coverage: the driver testdata stores events.ts as
parquet TIMESTAMP(NANOS) in a single FILE (no Spark row-metadata), while
Spark-written copies (e.g. the sf1 scale probe, any user pipeline
output) are DIRECTORIES whose footers carry Spark's own schema metadata
— there nanosAsLong does NOT apply and ts resolves straight to a
timestamp type, so the nanos->micros rebuild must be gated on the
ACTUAL read dtype (the r5 sf1 probe caught the footer-only gate
failing analysis with `ts div 1000` on a TimestampType column)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

from energy_pandas_spark.sources.readers import load_table

from conftest import SF_DIR


def test_driver_layout_micros_exact(spark):
    """Driver-file layout (single file, pyarrow-written, currently
    timestamp[us]): ts values must equal the raw stored integers."""
    ev = load_table(spark, SF_DIR, "events")
    assert isinstance(
        ev.schema["ts"].dataType, (TimestampType, TimestampNTZType)
    )
    got = {
        r["event_id"]: r["us"]
        for r in ev.select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        .limit(50)
        .collect()
    }
    raw = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "ts"]
    )
    ids = raw.column("event_id").to_pylist()
    us_vals = raw.column("ts").cast("int64").to_pylist()
    checked = 0
    for eid, us in zip(ids, us_vals):
        if eid in got:
            assert got[eid] == us, eid
            checked += 1
    assert checked >= 50


def test_nanos_file_rebuilds_micros_floor(spark, tmp_path):
    """A TIMESTAMP(NANOS) parquet file WITHOUT Spark row-metadata (the
    layout rounds 1-4 driver testdata shipped) must come back as a
    timestamp column floor-divided to micros — DuckDB's truncation."""
    import pyarrow as pa

    ns_vals = [
        1704067200_123456789,  # sub-microsecond tail -> floor, not round
        1704067200_999999999,
        1704067201_000000001,
    ]
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ns_vals, pa.timestamp("ns")),
        }
    )
    dest = tmp_path / "events.parquet"
    pq.write_table(table, dest)
    ev = load_table(spark, str(tmp_path), "events")
    assert isinstance(
        ev.schema["ts"].dataType, (TimestampType, TimestampNTZType)
    )
    got = {
        r["event_id"]: r["us"]
        for r in ev.select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        ).collect()
    }
    assert got == {i + 1: ns // 1000 for i, ns in enumerate(ns_vals)}


def test_spark_written_layout_loads_unrebuild(spark, tmp_path):
    """Spark-written directory layout: ts is already a timestamp; the
    rebuild must NOT fire (it would be an analysis error), and values
    must round-trip exactly."""
    ev = load_table(spark, SF_DIR, "events").limit(200)
    want = [
        (r["event_id"], r["us"])
        for r in ev.select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        .orderBy("event_id")
        .collect()
    ]
    dest = str(tmp_path / "events.parquet")
    ev.write.mode("overwrite").parquet(dest)
    back = load_table(spark, str(tmp_path), "events")
    assert not isinstance(back.schema["ts"].dataType, LongType)
    got = [
        (r["event_id"], r["us"])
        for r in back.select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        .orderBy("event_id")
        .collect()
    ]
    assert got == want


def test_spark_written_layout_survives_time_ops(spark, tmp_path):
    """The failure shape the sf1 probe caught: a time-bucketing query
    over a Spark-written events table must analyze and agree with the
    same query over the original layout."""
    ev = load_table(spark, SF_DIR, "events").limit(500)
    dest = str(tmp_path / "events.parquet")
    ev.write.mode("overwrite").parquet(dest)
    back = load_table(spark, str(tmp_path), "events")

    def hourly(df):
        return (
            df.groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("h")
            .collect()
        )

    assert hourly(back) == hourly(ev)

"""Structured Streaming ingestion of event streams.

The reference has no streaming surface (SURVEY.md §2.9); this is the
north-star addition: the same windowed aggregations the batch engine
exposes (tumbling / sliding windows, watermarks for late data), plus
gap-based sessionization, expressed so one definition serves BOTH the
batch tables and a ``readStream`` source.

Scale notes: windowed aggregation state is bounded by the watermark;
session windows use ``session_window`` (state pruned at watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "EVENTS_SCHEMA",
    "stream_events",
    "windowed_aggregate",
    "sessionize",
    "burst_dedup_stream",
]

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over an events directory (parquet). The same
    schema as the batch ``events`` table, so every batch operator
    composes."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    by_type: bool = True,
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) windowed count /
    sum / avg, watermarked for late data. Works identically on batch and
    streaming frames (watermark is a no-op in batch)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    keys = [win] + ([F.col("event_type")] if by_type else [])
    return (
        src.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(["event_type"] if by_type else []),
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions per user via ``session_window`` — state is
    merged incrementally and pruned at the watermark on streams."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def burst_dedup_stream(
    events: DataFrame,
    keys: "tuple[str, ...]" = ("user_id", "event_type"),
    tolerance: str = "60 seconds",
    watermark: str = "10 minutes",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of
    :func:`energy_pandas_spark.operators.analytics.dedup_bursts`: per
    key, gap-chained bursts keep only their earliest event. On a
    stream the ``session_window`` aggregate holds one open session per
    active key, merges incrementally, and emits the survivor once the
    watermark closes the burst (append mode) — state is pruned at the
    watermark, so memory is bounded by ACTIVE bursts, not history.

    Identical semantics to the batch operator (same aggregate, same
    ``min_by`` survivor, same boundary chaining), so a replayed batch
    yields the same survivors the stream emitted."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    cols = events.columns
    kept = src.groupBy(
        *[F.col(k) for k in keys], F.session_window("ts", tolerance)
    ).agg(
        F.min_by(
            F.struct(*[F.col(c) for c in cols]),
            F.struct(F.col("ts"), F.col(id_col)),
        ).alias("__first")
    )
    return kept.select("__first.*")

"""Continuous rollup: maintain a queryable aggregate TABLE from a
stream (the "hypertable rollup" / materialized-view pattern).

``continuous_rollup`` attaches a ``foreachBatch`` sink that, per
micro-batch, recomputes the windowed aggregate for exactly the date
partitions the batch touched and overwrites those partitions
(``partitionOverwriteMode=dynamic``). Properties that matter at scale:

- **Idempotent**: every written partition is stamped with the writing
  batch's id (``__batch_id`` column). A replayed micro-batch skips any
  day partition already stamped with its id, so partial sums never
  merge twice under at-least-once delivery — even when the failure
  happened between the data write and the high-water-marker write, or
  when only SOME of the touched partitions were swapped before the
  crash. The marker file is a fast-path optimization only; correctness
  never depends on it.
- **Bounded work per batch**: only partitions with new data are
  rewritten; the rollup table grows append-mostly by date.
- **Readers need no coordination**: plain ``spark.read.parquet`` sees
  whole partitions before/after, never mid-write (parquet committers
  swap directories atomically enough for batch readers).

The aggregate itself is the SAME ``windowed_aggregate`` used on batch
tables (streaming/events.py), so batch backfill and streaming
maintenance produce byte-identical rollups.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from energy_pandas_spark.streaming.events import windowed_aggregate

__all__ = ["continuous_rollup", "make_rollup_writer", "rollup_batch"]


def rollup_batch(batch: DataFrame, window: str = "1 hour") -> DataFrame:
    """One micro-batch -> its windowed aggregate with the date partition
    column attached."""
    return windowed_aggregate(batch, window=window).withColumn(
        "day", F.to_date("window_start")
    )


def make_rollup_writer(
    path: str,
    window: str = "1 hour",
    accumulate: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the idempotent per-micro-batch writer (exposed separately
    from :func:`continuous_rollup` so crash/replay behavior is testable
    without driving a real stream)."""
    agg_fn = accumulate or (lambda b: rollup_batch(b, window))

    marker = path.rstrip("/") + "__high_water"

    def write_marker(spark, batch_id: int) -> None:
        spark.createDataFrame([(batch_id,)], "b long").coalesce(1).write.mode(
            "overwrite"
        ).json(marker)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # fast path only: a missing/corrupt marker degrades to the
        # per-partition stamp check below, never to a double merge
        try:
            last = spark.read.json(marker).collect()[0]["b"]
        except Exception:
            last = -1
        if batch_id <= last:
            return
        fresh = agg_fn(batch)
        days = [r[0] for r in fresh.select("day").distinct().collect()]
        if not days:
            write_marker(spark, batch_id)
            return
        try:
            existing = spark.read.parquet(path).filter(F.col("day").isin(days))
            if "__batch_id" not in existing.columns:  # pre-stamp table
                existing = existing.withColumn(
                    "__batch_id", F.lit(-1).cast("long")
                )
        except Exception:  # first batch: nothing to merge
            existing = None
        if existing is not None:
            # replay guard: whole partitions are swapped atomically, so a
            # day stamped with this batch's id (or a later one) already
            # contains this batch's contribution — leave it untouched.
            # Days the crashed attempt did NOT swap merge normally.
            done = {
                r[0]
                for r in existing.filter(F.col("__batch_id") >= batch_id)
                .select("day")
                .distinct()
                .collect()
            }
            todo = [d for d in days if d not in done]
            if not todo:
                write_marker(spark, batch_id)
                return
            # merge: stored grain == query grain, so union + re-aggregate
            # on the window key is an exact combine of partial counts/sums
            merged = (
                existing.filter(F.col("day").isin(todo))
                .drop("__batch_id")
                .unionByName(fresh.filter(F.col("day").isin(todo)))
                .groupBy("window_start", "window_end", "event_type", "day")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").alias("sum_value"),
                )
                .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
                .select(
                    "window_start", "window_end", "event_type",
                    "n_events", "sum_value", "avg_value", "day",
                )
            )
        else:
            merged = fresh
        merged = merged.withColumn("__batch_id", F.lit(batch_id).cast("long"))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("day").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        write_marker(spark, batch_id)

    return write_batch


def continuous_rollup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    window: str = "1 hour",
    trigger_available_now: bool = True,
    accumulate: Callable[[DataFrame], DataFrame] | None = None,
):
    """Start the maintenance query; returns the StreamingQuery.

    Each micro-batch's windowed aggregate REPLACES the date partitions
    it touches. Because a batch may cover only part of an hour, the
    batch aggregate is first merged with the existing partition content
    by re-aggregating (sum/count merge; avg recomputed from sum+count
    would be the purist path — here windows re-aggregate from the
    union, which is exact because the stored grain equals the query
    grain)."""
    write_batch = make_rollup_writer(path, window, accumulate)
    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

- ``enrich_stream``: join a stream against a bounded dimension table.
  Spark re-plans the static side per micro-batch (broadcast when small),
  so dimension updates between triggers are picked up; no state is kept.
- ``stream_interval_join``: inner join of two streams where the right
  event must fall inside ``[left.ts + lower, left.ts + upper]``. Both
  sides are watermarked; the time-range condition bounds the state each
  side must buffer, so state size is O(rate x window), independent of
  stream age — the only formulation that survives an unbounded run.

Batch/stream parity: both functions run identically on batch frames
(watermarks are no-ops), which is how the tests verify results —
stream output with availableNow == the plain batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["enrich_stream", "stream_interval_join"]


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: attach dimension attributes to a stream.
    The static side is re-read per micro-batch; broadcast it unless it
    is too large (then Spark shuffles the batch side per trigger)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    suffix: str = "_r",
) -> DataFrame:
    """Watermarked stream-stream inner join on ``key`` with the right
    timestamp constrained to ``[left_ts + lower, left_ts + upper]``.

    The watermark + range condition lets Spark evict buffered rows:
    left rows older than (watermark + upper) and right rows older than
    the watermark can never match again and are dropped from state."""
    l = left
    r = right
    if left.isStreaming:
        l = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        r = right.withWatermark(right_ts, watermark)
    # Suffix EVERY overlapping right column including the key: joining
    # with l[key] == r[key] silently degrades to a trivially-true
    # predicate (i.e. a time-filtered CROSS join) when both streams
    # derive from the same source plan — Spark's self-join ambiguity.
    # Distinct column names make the condition unambiguous by name.
    renames = {
        c: c + suffix
        for c in r.columns
        if c in l.columns
    }
    r = r.withColumnsRenamed(renames)
    rkey = key + suffix if key in renames else key
    rts = right_ts + suffix if right_ts in renames else right_ts
    cond = (
        (F.col(rkey) == F.col(key))
        & (F.col(rts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner").drop(rkey)

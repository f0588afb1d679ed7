"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9 names this the engine's user-extensible stateful
surface; the reference has no streaming at all).

``streaming_dedup``: exactly-once-per-content emission over a stream —
the canonical training-data ingestion guard (drop re-crawled
documents). State per content digest holds only the first-seen count;
expiry is **event-time** (watermark + ``GroupStateTimeout.
EventTimeTimeout``): a digest's state lives until the watermark passes
``newest occurrence + horizon``, so state size is bounded by the dedup
horizon, not the stream length. Event-time (not processing-time)
expiry also means a catch-up replay of historical data behaves
identically to the live run, and ``Trigger.AvailableNow`` terminates —
a processing-time timeout would keep scheduling empty "state cleanup"
micro-batches until wall-clock expiry.

At 100 TB scale: state is hash-partitioned by digest across
executors' state stores; per-key payload is one long, so memory is
O(distinct digests within horizon), and the digest itself is computed
map-side (no extra shuffle beyond the one groupBy exchange).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["streaming_dedup", "with_digest"]

_OUT_SCHEMA = StructType(
    [
        StructField("digest", StringType()),
        StructField("doc_id", LongType()),
        StructField("first_seen", TimestampType()),
    ]
)

# STATE SCHEMA v2 (seen, max_ms) — v1 was (seen) only. Structured
# Streaming does not evolve applyInPandasWithState state schemas: a
# query checkpointed under v1 must restart from a FRESH checkpoint
# (the digest store itself is unaffected; only in-flight dedup
# horizons reset).
_STATE_SCHEMA = StructType(
    [StructField("seen", LongType()), StructField("max_ms", LongType())]
)


def with_digest(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content digest column (same digest as batch
    ``dedup_exact`` — batch and stream agree on identity)."""
    from energy_pandas_spark.functions.textfns import normalized_text

    return df.withColumn("digest", F.md5(normalized_text(text_col)))


def _make_dedup_fn(horizon_ms: int):
    def _dedup_fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last-seen + horizon: forget the digest
            state.remove()
            return
        first: pd.DataFrame | None = None
        n = 0
        max_ts: pd.Timestamp | None = None
        for pdf in pdfs:
            n += len(pdf)
            # stable sort + doc_id tiebreak: ts ties must pick ONE
            # deterministic winner, or a task retry/replay could emit a
            # different "first seen" doc_id than the original attempt
            # (batch dedup ties on id the same way)
            pdf = pdf.sort_values(["ts", "doc_id"], kind="mergesort")
            cand = pdf.iloc[:1]
            first = (
                cand
                if first is None
                else pd.concat([first, cand])
                .sort_values(["ts", "doc_id"], kind="mergesort")
                .iloc[:1]
            )
            batch_max = pdf["ts"].iloc[-1]
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        emitted = state.exists
        prev_ms = state.get[1] if emitted else 0
        batch_ms = int(max_ts.value // 1_000_000) if max_ts is not None else 0
        # the horizon anchors at the NEWEST occurrence ever seen: a
        # late-but-valid duplicate must not SHORTEN a timeout already
        # set from a newer event, or the state would expire early and
        # a later duplicate inside the horizon would re-emit
        high_ms = max(prev_ms, batch_ms)
        if emitted:
            state.update((state.get[0] + n, high_ms))
        elif first is not None:
            state.update((n, high_ms))
        if high_ms > 0:
            state.setTimeoutTimestamp(high_ms + horizon_ms)
        if not emitted and first is not None:
            yield pd.DataFrame(
                {
                    "digest": [key[0]],
                    "doc_id": first["doc_id"].to_numpy(),
                    "first_seen": first["ts"].to_numpy(),
                }
            )

    return _dedup_fn


def streaming_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 seconds",
    horizon_ms: int = 3600 * 1000,
) -> DataFrame:
    """First occurrence of each content digest on the stream; later
    duplicates within ``horizon_ms`` of event time are dropped across
    micro-batches via keyed state."""
    keyed = (
        with_digest(stream, text_col)
        .select("digest", F.col(id_col).alias("doc_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark_delay)
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _make_dedup_fn(horizon_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

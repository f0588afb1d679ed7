"""Streaming per-key anomaly detection via ``applyInPandasWithState``
(the engine's user-extensible stateful surface, SURVEY.md §2.9).

Keeps Welford running statistics (count, mean, M2) per key in keyed
state and emits every event with its z-score against the statistics
ACCUMULATED SO FAR — the incremental formulation of the batch z-score
operator (operators/analytics.py), which a windowed aggregate cannot
express because each event must be scored against only its
predecessors.

Scale shape: state is three numbers per key (constant, never grows
with stream age); rows move in Arrow batches; the only shuffle is the
groupBy(key) any keyed stateful operator needs. Rows inside a batch
are sorted by timestamp so replayed/merged micro-batches score
deterministically.

(Spark 4's ``transformWithStateInPandas`` is the successor API for
this operator — it needs the protobuf runtime, which this build
environment lacks, and ``applyInPandasWithState`` expresses identical
semantics here.)
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["streaming_zscore", "ZSCORE_OUTPUT_SCHEMA"]

ZSCORE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _make_zscore_fn(threshold: float, key_name: str = "user_id"):
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("ts", kind="mergesort")
        out_ts, out_v, out_z, out_a = [], [], [], []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            v = float(v)
            if math.isnan(v):
                # a NULL/NaN value must not enter the accumulator: one
                # NaN would poison mean/m2 and silently disable the
                # detector for this key forever (the batch z-score
                # skips nulls the same way). Emit unscored.
                out_ts.append(ts)
                out_v.append(v)
                out_z.append(0.0)
                out_a.append("no")
                continue
            # score against the PRE-update statistics: the first two
            # events of a key can never be anomalies (no variance yet)
            if n >= 2 and m2 > 0:
                z = (v - mean) / math.sqrt(m2 / (n - 1))
            else:
                z = 0.0
            out_ts.append(ts)
            out_v.append(v)
            out_z.append(z)
            out_a.append("yes" if abs(z) > threshold else "no")
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                key_name: [key[0]] * len(out_v),
                "ts": out_ts,
                "value": out_v,
                "zscore": out_z,
                "is_anomaly": out_a,
            }
        )

    return fn


def streaming_zscore(
    events: "DataFrame",
    key: str = "user_id",
    threshold: float = 3.0,
    watermark: str = "1 hour",
) -> "DataFrame":
    """Attach running z-scores per key on a stream; each event is
    scored against its key's history across ALL previous micro-batches
    (keyed state carries the Welford accumulator forward)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    # the output key field mirrors the INPUT key column's name and
    # type (ZSCORE_OUTPUT_SCHEMA documents the default user_id shape;
    # a string device key must not be forced into a long user_id slot)
    schema = StructType(
        [StructField(key, events.schema[key].dataType)]
        + [f for f in ZSCORE_OUTPUT_SCHEMA.fields if f.name != "user_id"]
    )
    return (
        src.select(key, "ts", "value")
        .groupBy(key)
        .applyInPandasWithState(
            _make_zscore_fn(threshold, key),
            outputStructType=schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

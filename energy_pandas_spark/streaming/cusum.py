"""Streaming CUSUM level-shift alarms via ``applyInPandasWithState``
— the incremental form of operators/analytics.py:cusum_alarms.

The batch operator computes Page's recurrence through its prefix-sum
closed form (``s_i = P_i - min(0, min_{j<=i} P_j)``); the SAME closed
form makes the streaming state O(1): two integer accumulators per key
(the running prefix sum ``P`` of quantized compensated deviations and
the running ``min(0, min P)``), carried across micro-batches. Because
both are exact integers, a drained stream reproduces the batch
operator's output BIT-FOR-BIT — the equivalence test holds them equal,
not approximately equal.

Scale shape: state is two longs per key, never grows with stream age;
rows move in Arrow batches; the only shuffle is the keyed grouping.
Rows inside a batch sort by timestamp so replayed/merged micro-batches
score deterministically.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["streaming_cusum", "CUSUM_OUTPUT_SCHEMA"]

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("cusum", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("p", LongType()),
        StructField("mp", LongType()),
        # 0 until the key's first non-null value: the batch twin's
        # prefix SUM over zero non-null deviations is NULL, so leading
        # all-null rows must emit NULL cusum/alarm, not the
        # zero-initialized statistic (ADVICE r4).
        StructField("seen", LongType()),
    ]
)


from energy_pandas_spark.util import round_half_away as _round_half_away


def _make_cusum_fn(kq: int, hq: int, quant: int):
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        p, mp, seen = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("ts", kind="mergesort")
        out_ts, out_v, out_c, out_a = [], [], [], []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            v = float(v)
            if v != v:  # NULL/NaN: must not enter the accumulator —
                # int(nan) raises and would kill the whole query; the
                # batch twin's F.round(quant*value).cast('long') yields
                # NULL, which the prefix window SUM skips, so the row
                # scores at the UNCHANGED running statistic — which is
                # NULL (not 0) while the key has seen no non-null
                # value at all, because SUM over zero non-null rows is
                # NULL in the batch twin.
                out_ts.append(ts)
                out_v.append(v)
                if seen:
                    s = p - mp
                    out_c.append(s / quant)
                    out_a.append(s >= hq)
                else:
                    out_c.append(None)
                    out_a.append(None)
                continue
            seen = 1
            p += _round_half_away(quant * v) - kq
            mp = min(mp, p)  # mp starts at 0, so min(0, min P) for free
            s = p - mp
            out_ts.append(ts)
            out_v.append(v)
            out_c.append(s / quant)
            out_a.append(s >= hq)
        state.update((p, mp, seen))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_v),
                "ts": out_ts,
                "value": out_v,
                "cusum": out_c,
                "alarm": out_a,
            }
        )

    return fn


def streaming_cusum(
    events: "DataFrame",
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    target: float = 0.0,
    drift: float = 0.0,
    threshold: float = 1.0,
    quant: int = 1_000_000,
    watermark: str = "1 hour",
) -> "DataFrame":
    """Attach running CUSUM + alarm per key on a stream; the keyed
    integer state carries the detector across micro-batches, and a
    drained stream equals the batch :func:`cusum_alarms` bit-for-bit
    (same quantization, same closed form)."""
    from pyspark.sql import functions as F

    kq = _round_half_away(quant * (target + drift))
    hq = _round_half_away(quant * threshold)
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.select(
            F.col(key).cast("string").alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        .groupBy("key")
        .applyInPandasWithState(
            _make_cusum_fn(kq, hq, quant),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Time-window analytics: rolling aggregates over physical time ranges
and cumulative (running) aggregates — RANGE-framed so ties on the
ordering timestamp are deterministic (every tied row sees the same
frame; a ROWS frame would depend on arbitrary tie order).

Scale shape: one shuffle on the partition keys; frames evaluate inside
the sorted partitions. Partition keys must bound partition size: pick
keys whose cardinality grows with the data (user, device, order — not
a 5-value category, which would put the whole table under 5 sort
tasks). For genuinely low-cardinality keys, pre-aggregate to a coarser
time grain first (bucketed partial sums + edge combine) so the window
runs over bounded rows per key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["rolling_aggregate", "cumulative_aggregate", "ewma"]

_US = 1_000_000


def _micros(ts_col: str) -> Column:
    return F.unix_micros(F.col(ts_col))


def rolling_aggregate(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    by: str | Sequence[str] | None = None,
    aggs: Sequence[str] = ("avg",),
) -> DataFrame:
    """Trailing-window aggregates over ``[ts - window, ts]`` (inclusive
    bounds, physical time, microsecond precision)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(_micros(ts_col))
        .rangeBetween(-window_seconds * _US, 0)
    )
    out = df
    for a in aggs:
        out = out.withColumn(
            f"rolling_{a}", getattr(F, a)(value_col).over(w)
        )
    return out


def cumulative_aggregate(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: str | Sequence[str] | None = None,
    agg: str = "sum",
) -> DataFrame:
    """Running aggregate over all rows up to and including the current
    timestamp (RANGE frame: timestamp ties share the same value)."""
    keys = [by] if isinstance(by, str) else list(by or [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(_micros(ts_col))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(f"cum_{agg}", getattr(F, agg)(value_col).over(w))


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float,
    by: str | Sequence[str] | None = None,
    out_col: str = "ewma",
    tiebreak: str | Sequence[str] | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average per key, ordered by event
    time — pandas ``ewm(alpha=..., adjust=False)`` semantics
    (``y_t = (1-a)*y_{t-1} + a*x_t``, seeded at the first value).

    The recursion is inherently sequential per key, so this is the one
    window op that runs through ``applyInPandas`` (Arrow batches, one
    group per key) instead of a SQL window frame: a log-space prefix-sum
    reformulation underflows for long series and a per-row UDF would be
    100x slower. Scale shape: ONE shuffle on the keys; each key's series
    must fit a task (the same contract as any per-key sort). Un-keyed
    use funnels through a single task — documented driver for small
    frames only, exactly like un-keyed ``diff``/``fill_gaps``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    sort_cols = [ts_col, *ties]

    def fn(pdf):
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    if keys:
        return df.groupBy(*keys).applyInPandas(fn, schema=schema)
    return df.groupBy(F.lit(1)).applyInPandas(fn, schema=schema)

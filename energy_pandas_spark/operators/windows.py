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

from pyspark.sql import DataFrame, Window, functions as F

from ..util import epoch_micros

__all__ = ["rolling_aggregate", "cumulative_aggregate", "ewma"]

_US = 1_000_000


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
        .orderBy(epoch_micros(df, ts_col))
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
        .orderBy(epoch_micros(df, ts_col))
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
    window op that runs on pandas kernels: data shuffles ONCE on the
    keys (``repartition``) and sorts within partitions on (keys, ts),
    then ``mapInPandas`` runs pandas' cython ``groupby(...).ewm()`` over
    every key in an Arrow batch AT ONCE — no per-group Python call (the
    ``applyInPandas`` fn-per-key shape costs ~ms per key, which at 1e6+
    keys is hours of pure overhead). Groups that straddle Arrow batch
    boundaries are stitched by holding back each batch's trailing
    partial group, so memory is bounded by one batch + one group
    regardless of partition size. Un-keyed use funnels through a single
    partition — documented for small frames only, exactly like un-keyed
    ``diff``/``fill_gaps``.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    ties = [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    import pandas as pd

    def compute(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if keys:
            # groups are contiguous (partition-sorted); sort=False keeps
            # them in order, so the cython ewm output aligns row-for-row.
            # dropna=False: a NULL key is a real group — the default
            # would silently drop its rows and the assignment below
            # would crash on the length mismatch
            vals = (
                pdf.groupby(keys, sort=False, dropna=False)[value_col]
                .ewm(alpha=alpha, adjust=False)
                .mean()
                .to_numpy()
            )
        else:
            vals = pdf[value_col].ewm(alpha=alpha, adjust=False).mean().to_numpy()
        out = pdf.copy()
        out[out_col] = vals
        return out

    def fn(it):
        carry: "pd.DataFrame | None" = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            if keys:
                # hold back the trailing (possibly incomplete) group so
                # a group spanning two Arrow batches stays one series
                last = pdf.iloc[-1]
                tail_mask = pd.Series(True, index=pdf.index)
                for k in keys:
                    if pd.isna(last[k]):
                        # NaN != NaN would make the mask all-False and
                        # split a NULL-key group across Arrow batches
                        tail_mask &= pdf[k].isna()
                    else:
                        tail_mask &= pdf[k] == last[k]
                # trailing contiguous block of the last key
                split = int(tail_mask[::-1].idxmin()) + 1 if not tail_mask.all() else 0
                head, carry = pdf.iloc[:split], pdf.iloc[split:]
                if len(head):
                    yield compute(head)
            else:
                carry = pdf
        if carry is not None and len(carry):
            yield compute(carry)

    if keys:
        n = df.sparkSession.sparkContext.defaultParallelism
        parts = df.repartition(n, *keys).sortWithinPartitions(
            *keys, ts_col, *ties
        )
    else:
        parts = df.coalesce(1).sortWithinPartitions(ts_col, *ties)
    return parts.mapInPandas(fn, schema=schema)

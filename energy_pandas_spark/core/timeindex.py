"""Time-index synthesis — the Spark-native replacement for the
reference's ``with_timeindex`` DatetimeIndex construction
(energypandas.py:175-229, index built at :226-228).

A pandas ``date_range(start, periods, freq)`` becomes either

- ``spark.range(n)`` + interval arithmetic (pure codegen, no data
  movement, parallelized by Spark's range partitioning), or
- interval arithmetic over an existing ordinal column
  (``attach_timeindex``), which distributes trivially because each row's
  timestamp depends only on its own ordinal — no window, no shuffle.
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["freq_to_seconds", "time_index", "attach_timeindex"]

_FREQ_RE = re.compile(r"^(\d*)\s*([A-Za-z]+)$")

_BASE_SECONDS = {
    "h": 3600, "hr": 3600, "hour": 3600,
    "t": 60, "min": 60, "minute": 60,
    "s": 1, "sec": 1, "second": 1,
    "d": 86400, "day": 86400,
    "w": 7 * 86400,
}


def freq_to_seconds(frequency: str) -> int:
    """Parse a pandas-style fixed frequency ('h', '15T', '15min', 'D')
    into seconds. Calendar frequencies (month/quarter/year) are not fixed
    intervals and are handled by dedicated operators (``monthly``).
    """
    m = _FREQ_RE.match(frequency.strip())
    if not m:
        raise ValueError(f"unsupported frequency {frequency!r}")
    mult = int(m.group(1)) if m.group(1) else 1
    base = m.group(2).lower()
    if base not in _BASE_SECONDS:
        raise ValueError(f"unsupported frequency {frequency!r}")
    return mult * _BASE_SECONDS[base]


def _ts_expr(ordinal: Column, start: datetime, step_seconds: int) -> Column:
    return F.lit(start).cast("timestamp") + F.make_interval(
        secs=(ordinal.cast("long") * F.lit(step_seconds)).cast("double")
    )


def time_index(
    spark: SparkSession,
    n: int,
    base_year: int = 2018,
    frequency: str = "h",
    start: datetime | None = None,
    ordinal_name: str = "idx",
    ts_name: str = "ts",
) -> DataFrame:
    """``n`` evenly spaced timestamps starting Jan-1 of ``base_year``
    (reference default, energypandas.py:226-228) as a distributed
    DataFrame ``(idx, ts)``.
    """
    start = start or datetime(base_year, 1, 1)
    step = freq_to_seconds(frequency)
    return spark.range(n).select(
        F.col("id").alias(ordinal_name),
        _ts_expr(F.col("id"), start, step).alias(ts_name),
    )


def attach_timeindex(
    df: DataFrame,
    ordinal_col: str,
    base_year: int = 2018,
    frequency: str = "h",
    start: datetime | None = None,
    ts_name: str = "ts",
) -> DataFrame:
    """Map an existing 0-based ordinal column to timestamps. Embarrassingly
    parallel (per-row arithmetic only)."""
    start = start or datetime(base_year, 1, 1)
    step = freq_to_seconds(frequency)
    return df.withColumn(ts_name, _ts_expr(F.col(ordinal_col), start, step))

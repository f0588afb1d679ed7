"""Period reshaping — the engine's version of tsam's ``unstackToPeriods``
(used by the reference's plotting at energypandas.py:503, 526, 538, 767).

A 1-D series of length n becomes an (n/periodlength x periodlength)
matrix keyed by period index. With a fixed-frequency time index the
ordinal is computed arithmetically from the timestamp — per-row math
against a broadcast global minimum, no global window, no single-partition
stage — then the matrix is one ``groupBy(period).pivot(step)`` hash
aggregation (shuffle keyed on the period, pivot width = periodlength).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["unstack_to_periods", "with_ordinal"]


def with_ordinal(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    ordinal_name: str = "__ord",
) -> DataFrame:
    """Ordinal position of each row on a fixed-frequency time grid:
    ``(ts - min(ts)) / step``. The global min is a 1-row broadcast —
    fully distributed, order-independent. Epoch math goes through
    :func:`~energy_pandas_spark.util.epoch_micros`, not
    ``unix_timestamp`` — the latter interprets TIMESTAMP_NTZ wall
    clocks in the session timezone, where a DST gap would collapse two
    grid slots onto one ordinal."""
    from energy_pandas_spark.util import epoch_micros

    stats = df.agg(F.min(ts_col).alias("__ts0"))
    joined = df.crossJoin(F.broadcast(stats))
    micros = epoch_micros(df, ts_col) - epoch_micros(
        df, ts_col, F.col("__ts0")
    )
    return joined.withColumn(
        ordinal_name,
        (micros / F.lit(step_seconds * 1_000_000)).cast("long"),
    ).drop("__ts0")


def unstack_to_periods(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    periodlength: int,
    step_seconds: int | None = None,
) -> DataFrame:
    """Reshape to one row per period with columns ``s0..s{periodlength-1}``.

    ``step_seconds`` defaults to the inferred spacing of the first two
    timestamps (driver-side look at 2 rows, mirroring the reference's
    ``infer_freq(self.index[0:3])`` at energypandas.py:752-756).
    """
    if step_seconds is None:
        step_seconds = infer_step_seconds(df, ts_col)
    ord_df = with_ordinal(df, ts_col, step_seconds)
    keyed = ord_df.select(
        (F.col("__ord") / periodlength).cast("long").alias("period"),
        (F.col("__ord") % periodlength).cast("int").alias("__step"),
        F.col(value_col),
    )
    return (
        keyed.groupBy("period")
        .pivot("__step", list(range(periodlength)))
        .agg(F.first(value_col))
        .withColumnsRenamed({str(i): f"s{i}" for i in range(periodlength)})
        .orderBy("period")
    )


def infer_step_seconds(df: DataFrame, ts_col: str) -> int:
    """Infer the grid spacing from the two earliest timestamps (cheap
    driver action on 2 rows; the reference infers frequency from the
    first 3 index values, energypandas.py:752-756)."""
    rows = df.select(ts_col).distinct().orderBy(ts_col).limit(2).collect()
    if len(rows) < 2:
        raise ValueError("cannot infer step from fewer than 2 rows")
    return int((rows[1][0] - rows[0][0]).total_seconds())

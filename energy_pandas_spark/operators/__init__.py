"""Engine operators: pure functions over pyspark DataFrames.

Each operator is expressed with built-in Column expressions so Catalyst
can optimize (pushdown, partial aggregation, whole-stage codegen); Python
touches data only where genuinely unavoidable (Arrow-batched
mapInPandas/applyInPandas), never row-at-a-time.
"""

from energy_pandas_spark.operators.analytics import (
    capacity_factor,
    ldc,
    ldc_source,
    monthly,
    normalize,
    p_max,
    source_side,
    time_at_min,
)

__all__ = [
    "normalize",
    "ldc",
    "ldc_source",
    "monthly",
    "p_max",
    "capacity_factor",
    "time_at_min",
    "source_side",
]

"""Core facade: EnergyFrame over (lazy DataFrame, units dict, meta)."""

from energy_pandas_spark.core.frame import EnergyFrame
from energy_pandas_spark.core.timeindex import attach_timeindex, time_index

__all__ = ["EnergyFrame", "time_index", "attach_timeindex"]

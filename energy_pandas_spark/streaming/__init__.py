"""Structured Streaming surface."""

from energy_pandas_spark.streaming.events import (
    sessionize,
    stream_events,
    windowed_aggregate,
)

__all__ = ["stream_events", "windowed_aggregate", "sessionize"]

"""Structured Streaming surface."""

from energy_pandas_spark.streaming.events import (
    sessionize,
    stream_events,
    windowed_aggregate,
)
from energy_pandas_spark.streaming.joins import (
    enrich_stream,
    stream_interval_join,
)
from energy_pandas_spark.streaming.rollup import (
    continuous_rollup,
    make_rollup_writer,
    rollup_batch,
)
from energy_pandas_spark.streaming.anomaly import streaming_zscore
from energy_pandas_spark.streaming.heavy_hitters import streaming_heavy_hitters
from energy_pandas_spark.streaming.ingest import (
    make_neardup_ingest_writer,
    neardup_ingest,
    read_corpus,
)
from energy_pandas_spark.streaming.stateful import streaming_dedup
from energy_pandas_spark.streaming.url_ingest import (
    make_url_dedup_ingest_writer,
    read_url_corpus,
    url_dedup_ingest,
)

__all__ = [
    "make_neardup_ingest_writer",
    "neardup_ingest",
    "read_corpus",
    "make_url_dedup_ingest_writer",
    "url_dedup_ingest",
    "read_url_corpus",
    "streaming_zscore",
    "stream_events",
    "windowed_aggregate",
    "sessionize",
    "enrich_stream",
    "stream_interval_join",
    "continuous_rollup",
    "make_rollup_writer",
    "rollup_batch",
    "streaming_dedup",
    "streaming_heavy_hitters",
]

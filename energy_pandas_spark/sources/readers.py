"""Testdata/table readers.

The synthetic tables (TESTDATA.md) store ``events.ts`` as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). We read nano-timestamp columns as raw int64
(``spark.sql.legacy.parquet.nanosAsLong``) and rebuild microsecond
timestamps with ``timestamp_micros(ns div 1000)`` — the same floor
truncation DuckDB applies when it reads nanosecond parquet into its
microsecond TIMESTAMP, so oracle comparisons agree exactly.

Column pruning and predicate pushdown still reach the scan: the int64 →
timestamp conversion is a projection on top of the pushed-down read.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

__all__ = ["load_table", "load_tables", "TABLE_NAMES"]

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as timestamp[ns] in the parquet footer (driver-side
    metadata peek via pyarrow; no data read)."""
    import pyarrow.parquet as pq

    try:
        schema = pq.read_schema(path)
    except Exception:
        first = next(
            (os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".parquet")),
            None,
        ) if os.path.isdir(path) else None
        if first is None:
            return ()
        schema = pq.read_schema(first)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, transparently repairing nano-timestamps."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nanos_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # nanosAsLong only applies when Spark infers the schema from
        # the parquet footer: files that carry Spark's own row-metadata
        # (e.g. the Spark-written sf1 scale probe) resolve the column
        # straight to TimestampType, so gate the rebuild on the ACTUAL
        # read dtype — rebuilding a TimestampType column would be a
        # type error, and it needs no repair.
        if not isinstance(df.schema[c].dataType, LongType):
            continue
        # integer `div`, NOT double division: ns values exceed the 2^53
        # exact-double range, so a float path rounds the microsecond
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLE_NAMES}

"""Small shared engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_partitions"]


def spread_partitions(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work is spread across all cores: a small
    single-file parquet scan arrives as ONE partition, serializing the
    expensive expression / Arrow-batch work behind it. At real scale the
    scan has plenty of splits and this is a no-op (the round-robin
    repartition only fires when the input has fewer partitions than the
    cluster has slots)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

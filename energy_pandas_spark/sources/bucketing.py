"""Bucketed-table sinks — the shuffle-elimination tool for repeated
big-to-big joins and aggregations on a stable key.

A table written with ``bucketBy(n, key)`` is hash-partitioned on disk;
a join or groupBy on that key between two tables bucketed the same way
needs NO exchange at read time — at 100 TB this turns every
fact-to-fact join on the bucket key from a full double shuffle into a
zipped per-bucket scan. ``sortBy`` inside the bucket additionally
removes the sort from sort-merge joins.

The reference library has no storage layer at all (SURVEY.md §2.1:
"No file-format readers/writers exist"); this is engine-side
north-star surface. Bucketed output goes through ``saveAsTable`` (the
bucket metadata lives in the catalog, not the parquet footer), so
callers address results by table name, not path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_bucketed", "bucketed_table"]


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: str | Sequence[str],
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) parquet
    table. Both sides of a future join must use the SAME bucket count
    for the exchange-free plan."""
    bcols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *bcols)
    if sort_cols is not None:
        scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog and drives exchange removal in downstream plans)."""
    return spark.table(table)

"""Physical file-layout management — the part of a 100 TB deployment
that lives OUTSIDE the query plan: how rows are arranged into parquet
files so later scans can skip most of them.

- ``write_clustered``: range-partition + sort rows by the clustering
  keys before writing, so each output file covers a narrow, disjoint
  key range and its parquet footer min/max statistics actually cut:
  a point/range predicate on the cluster key touches O(1) of the
  files (footer-level skip) and O(1) row groups inside them
  (row-group-level skip). Without clustering every file spans the full
  key range and statistics never eliminate anything.
- ``compact``: the small-file fix. Streaming sinks and incremental
  loads leave thousands of tiny files; a scan pays per-file open/seek
  and the driver pays per-file listing. Rewrite into ``num_files``
  range-clustered files.
- ``file_column_stats``: per-file min/max of a column straight from
  the parquet footers (pyarrow, no Spark job) — the observability hook
  the tests use to PROVE disjointness rather than assert it by faith.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["write_clustered", "compact", "file_column_stats"]


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: str | list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``num_files`` parquet files range-clustered on
    ``cluster_by``: repartitionByRange gives each file a disjoint key
    range, sortWithinPartitions orders rows inside so row-group
    statistics are tight too."""
    cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    cluster_by: str | list[str],
    num_files: int = 8,
) -> None:
    """Rewrite a (fragmented) parquet directory into ``num_files``
    range-clustered files: stage the full rewrite into a sibling
    directory, then swap (delete + rename — one metadata op per
    filesystem call, so readers see old-or-new, never a partial mix).
    Do not run two compactions or a compaction and a writer
    concurrently on the same path."""
    tmp = path.rstrip("/") + "__compacting"
    write_clustered(spark.read.parquet(path), tmp, cluster_by, num_files)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(conf)
    fs.delete(dst, True)
    if not fs.rename(src, dst):
        raise IOError(f"compact: rename {tmp} -> {path} failed")


def file_column_stats(path: str, column: str) -> list[tuple[str, object, object]]:
    """[(file, min, max)] for ``column`` read from parquet footers via
    pyarrow — no Spark job, no data read. The per-file (min, max) of a
    well-clustered table are pairwise disjoint."""
    import pyarrow.parquet as pq

    out: list[tuple[str, object, object]] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.names.index(column)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return out

"""Tuned SparkSession factory — the engine's recommended configuration
posture, one place instead of per-script copies.

Local mode runs the same settings the cluster profile needs: AQE on
(runtime shuffle-partition coalescing, skew-join splitting), a
broadcast threshold sized for dimension tables, Arrow batching for the
few pandas-backed kernels, dynamic partition overwrite for idempotent
partition rewrites (streaming rollup), UTC session time.

At 100 TB the knobs that matter and their reasoning:
- ``spark.sql.shuffle.partitions`` starts high (cluster: 2-4x total
  cores); AQE coalesces small post-shuffle partitions down, so
  over-provisioning is cheap and under-provisioning (spills) is not.
- ``spark.sql.files.maxPartitionBytes`` (default 128m) bounds scan
  task memory; with wide parquet rows lower it rather than raising
  executor memory.
- ``spark.sql.autoBroadcastJoinThreshold`` at 64m broadcasts every
  TPC-H-style dimension; fact-to-fact joins still sort-merge (or go
  through bucketing — sources/bucketing.py).
- AQE skew-join splitting handles moderate key skew; pathological
  producers use operators.joins.salted_join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["make_session"]


def make_session(
    master: str | None = None,
    app_name: str = "energy-pandas-spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing assumes bytes ~ cost; the corpus pipelines
        # have many byte-LIGHT CPU-DENSE exchanges (vocab-/stats-sized
        # streams of strings + log()/md5 per row, sub-MB compressed)
        # that the default 1m floor collapses to one straggler task —
        # and this class stays sub-advisory at ANY corpus scale (vocab
        # saturates), so the floor maps to production, not just
        # local[32]. 64kb measured best of {16kb, 64kb, 256kb, 1m} on
        # the straggler-audit-flagged set (r8 probe, 4 interleaved
        # legs x 13 queries: 24.10s -> 20.86s elementwise-best;
        # containment_pairs 7.6 -> 5.3, rolling_trend 1.5 -> 1.0,
        # doc_lm 1.7 -> 1.3; no query outside noise on the tiny-
        # exchange controls). Callers override via extra_conf.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64kb"
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", driver_memory)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

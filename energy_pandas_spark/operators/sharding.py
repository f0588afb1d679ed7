"""Size-targeted sequential sharding — the token-shard export planner.

A training-data export wants shards of ~N tokens each, with documents
kept in a deterministic global order (curriculum order, dedup-epoch
order, plain id order). That is an EXCLUSIVE running sum over the
whole corpus — the textbook "needs one global window" trap. The
classic single-partition ``Window.orderBy`` would serialize 100 TB
through one task; this module computes the same numbers with the
two-level distributed prefix-sum pattern:

1. bucket every row by range over the order column (boundaries from
   ``approxQuantile`` — boundary placement only affects balance,
   never the result, so the sketch's approximation is harmless);
2. per-bucket exclusive prefix sums via a bucket-partitioned window
   (one hash shuffle, each bucket sorts locally);
3. bucket offsets = one tiny aggregate (n_buckets rows) collected and
   re-broadcast as a literal map — the only driver traffic.

``shard_id = cum_before div target`` (greedy fill: a document
straddling a boundary belongs to the shard where it starts, so every
shard holds at most ``target + max_row_weight - 1`` weight). All
exact integer arithmetic — the driver query carries a bit-exact
DuckDB oracle whose naive global-window SQL computes the identical
plan.

The order column must be a TOTAL order (unique values): exclusive
prefix sums under ties are not well-defined. Callers with composite
orderings should pre-encode them into one comparable column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["sequential_shards", "shard_manifest"]


def _bucket_expr(order_col: str, bounds: list[float]) -> Column:
    """Range-bucket id: number of boundaries strictly below the value
    (a when-chain fold — n_buckets is small, the comparisons are
    codegen'd longs)."""
    b: Column = F.lit(0).cast("int")
    for v in bounds:
        b = b + F.when(F.col(order_col) > F.lit(v), 1).otherwise(0)
    return b


def sequential_shards(
    df: DataFrame,
    weight_col: str,
    order_col: str,
    target: int,
    n_buckets: int | None = None,
) -> DataFrame:
    """Assign every row a ``shard_id`` (and its ``cum_before``
    exclusive running weight) for size-targeted export in ``order_col``
    order. NULL weights count as 0; ``target`` must be positive.

    Scale shape: one light scan for the quantile sketch of the order
    column (column-pruned), one hash shuffle for the bucket-local
    windows, one n_buckets-row aggregate for the offsets. No global
    sort, no single-partition window, no row ever leaves the JVM.
    """
    if target <= 0:
        raise ValueError("target must be positive")
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_buckets = max(1, n_buckets)

    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.stat.approxQuantile(order_col, probs, 0.001)
        # dedupe degenerate boundaries (heavily repeated order values
        # would violate the total-order contract anyway)
        bounds = sorted(set(bounds))
    else:
        bounds = []

    w = F.coalesce(F.col(weight_col), F.lit(0)).cast("long")
    bucketed = df.withColumn("__b", _bucket_expr(order_col, bounds))

    local_win = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "__local_excl", F.coalesce(F.sum(w).over(local_win), F.lit(0).cast("long"))
    )

    # offsets come from a SLIM re-scan (order + weight only, column-
    # pruned at the source) rather than a persist of the full rows:
    # the bucket expression is deterministic over the same data, so
    # both scans see the identical bucket set, and no persist lifetime
    # escapes this function. The aggregate output is n_buckets rows —
    # the only driver traffic.
    slim = df.select(F.col(order_col), w.alias("__w")).withColumn(
        "__b", _bucket_expr(order_col, bounds)
    )
    per_bucket = (
        slim.groupBy("__b").agg(F.sum("__w").alias("__t")).orderBy("__b").collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in per_bucket:
        offsets[r["__b"]] = acc
        acc += int(r["__t"] or 0)
    if offsets:
        entries: list[Column] = []
        for k, v in offsets.items():
            entries.append(F.lit(int(k)))
            entries.append(F.lit(int(v)).cast("long"))
        off = F.element_at(F.create_map(*entries), F.col("__b"))
    else:
        off = F.lit(0).cast("long")

    return (
        local.withColumn("cum_before", (off + F.col("__local_excl")).cast("long"))
        .withColumn("shard_id", F.expr(f"cum_before div {int(target)}"))
        .drop("__b", "__local_excl")
    )


def shard_manifest(
    planned: DataFrame,
    weight_col: str,
    order_col: str,
) -> DataFrame:
    """The export manifest over a :func:`sequential_shards` result:
    ``(shard_id, n_rows, total_weight, first_order, last_order)`` —
    one map-combined aggregate, shard-count-sized output."""
    w = F.coalesce(F.col(weight_col), F.lit(0)).cast("long")
    return planned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(w).alias("total_weight"),
        F.min(order_col).alias("first_order"),
        F.max(order_col).alias("last_order"),
    )

"""Scale diagnostics: key-skew and partition-skew observability.

Skew is the dominant 100 TB failure mode — one hot key turns a
32-way shuffle into a 1-straggler job, and nothing in the query's
LOGICAL shape warns about it. These operators are the measurement
side of the engine's mitigation toolbox (``salted_join``, AQE skew
join, ``max_bucket`` LSH caps, broadcast thresholds): run them on the
join/aggregate keys BEFORE picking a strategy.

Everything reduces map-side: the key histogram is one hash aggregate
(distinct-key-sized, never row-sized), the summary is one more
aggregate over it, and the top-k ride a bounded sort. Integer counts
end-to-end; the only divisions are final per-mille integer ratios —
engine-exact, so ``key_skew_stats`` carries a DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "key_skew_stats",
    "top_keys",
    "partition_skew_stats",
    "length_histogram",
    "calibration_curve",
    "calibration_ece",
]


def key_skew_stats(
    df: DataFrame,
    *keys: str | Column,
) -> DataFrame:
    """One-row skew card for a prospective shuffle key: how unbalanced
    would a hash shuffle on ``keys`` be?

    Returns (n_rows, n_keys, max_key_rows, skew_ratio_pm,
    top1_share_pm) where ``skew_ratio_pm`` = per-mille ratio of the
    hottest key's row count to the mean rows-per-key (1000 = perfectly
    uniform; 32000 on 32 partitions ≈ one partition does all the
    work), and ``top1_share_pm`` = per-mille share of all rows held by
    the hottest key (the broadcast/salt decision number). NULL keys
    count as a real group — a NULL-heavy join key is the classic
    accidental hot key.

    Integer arithmetic: both per-milles are ``(1000 * x) div y`` floor
    divisions of exact counts; the ratio divides by the FLOORED mean
    rows-per-key (``n_rows div n_keys``) rather than multiplying
    ``max * n_keys * 1000`` — the triple product would silently wrap
    past 2^63 at ~1e9 keys with a 1e7-row hot key, exactly the scale
    this card exists for.
    """
    hist = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
    return hist.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_key_rows"),
    ).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr(
            "(1000 * max_key_rows) div greatest(n_rows div n_keys, 1)"
        ).alias("skew_ratio_pm"),
        F.expr("(1000 * max_key_rows) div n_rows").alias("top1_share_pm"),
    )


def top_keys(
    df: DataFrame,
    *keys: str | Column,
    k: int = 10,
) -> DataFrame:
    """The ``k`` hottest key values with row counts and per-mille
    share — the candidates for salting (or for an explicit skew-side
    broadcast split). Deterministic order: count desc, then the key
    columns asc as tiebreak. One distinct-key-sized aggregate + a
    bounded top-k (compiles to TakeOrderedAndProject — no global
    sort)."""
    hist = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_rows"))
    total = hist.agg(F.sum("key_rows").alias("__t"))
    key_cols = [c for c in hist.columns if c != "key_rows"]
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "key_rows",
            F.expr("(1000 * key_rows) div __t").alias("share_pm"),
        )
        .orderBy(F.desc("key_rows"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def partition_skew_stats(df: DataFrame) -> DataFrame:
    """One-row card for the CURRENT physical layout: rows per
    ``spark_partition_id`` → (n_partitions, n_rows, min_rows,
    max_rows, skew_ratio_pm). Unlike :func:`key_skew_stats` this
    measures the layout the plan actually produced (file splits,
    AQE coalescing, a previous repartition) — run it after a suspect
    stage to see whether stragglers are data skew or split skew.
    Layout-dependent by nature (rows-only; no SQL twin)."""
    per = df.select(F.spark_partition_id().alias("__p")).groupBy("__p").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("__c").alias("n_rows"),
        F.min("__c").alias("min_rows"),
        F.max("__c").alias("max_rows"),
    ).select(
        "n_partitions",
        "n_rows",
        "min_rows",
        "max_rows",
        # floored-mean divisor, same overflow-safe shape as the key card
        F.expr(
            "(1000 * max_rows) div greatest(n_rows div n_partitions, 1)"
        ).alias("skew_ratio_pm"),
    )


def length_histogram(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Power-of-two histogram of a non-negative integer column —
    the sequence-length / document-size distribution card:
    ``(keys..., bucket, lo, hi, n_rows, sum_value)`` where bucket b
    holds values in ``[2^b, 2^(b+1))`` and zeros land in bucket -1
    (``lo = hi = 0``).

    The bucket is ``length(bin(v)) - 1`` — exact integer floor(log2),
    no float ``log`` anywhere, so the histogram is engine-portable
    (``bin`` prints without leading zeros on Spark and DuckDB alike).
    One map-combined aggregate; only (keys, bucket, value) longs enter
    the shuffle, ~64 buckets per group out."""
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("long")
    bucket = (
        F.when(v <= 0, F.lit(-1))
        .otherwise(F.length(F.bin(v)) - 1)
        .cast("int")
    )
    agg = (
        df.select(*keys, bucket.alias("bucket"), v.alias("__v"))
        .groupBy(*keys, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__v").alias("sum_value"),
        )
    )
    lo = F.when(F.col("bucket") < 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
    )
    hi = F.when(F.col("bucket") < 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1")
    )
    return agg.select(
        *keys,
        "bucket",
        lo.alias("lo"),
        hi.alias("hi"),
        "n_rows",
        "sum_value",
    )


def _calibration_bins(
    df: DataFrame, score_col: str, label_col: str, n_bins: int, quant: int
) -> DataFrame:
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    s = F.col(score_col).cast("double")
    b = (
        F.greatest(
            F.least(F.floor(s * n_bins), F.lit(n_bins - 1)), F.lit(0)
        )
    ).cast("int")
    sq = F.round(s * F.lit(float(quant))).cast("long")
    return (
        df.select(
            b.alias("bin"),
            sq.alias("__sq"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__y").cast("long").alias("n_positive"),
            F.sum("__sq").cast("long").alias("score_q_sum"),
        )
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    quant: int = 1_000_000,
) -> DataFrame:
    """Reliability card for a probabilistic scorer (quality classifier,
    LM-based filter): rows bin by predicted score (``floor(score *
    n_bins)``, clamped to [0, n_bins)), each bin reporting observed
    positive rate vs mean predicted confidence — ``(bin, n_rows,
    n_positive, score_q_sum, positive_permille, conf_permille)``.

    A well-calibrated scorer has positive_permille tracking
    conf_permille per bin; divergence says the filter's threshold
    doesn't mean what its probability claims. All integer arithmetic
    after one deterministic quantization (``round(score * quant)`` —
    identical doubles round identically on any engine); one
    map-combined aggregate, <= n_bins rows out."""
    agg = _calibration_bins(df, score_col, label_col, n_bins, quant)
    return agg.select(
        "bin",
        "n_rows",
        "n_positive",
        "score_q_sum",
        F.expr("(1000 * n_positive) div n_rows").alias("positive_permille"),
        F.expr(f"(1000 * score_q_sum) div ({quant} * n_rows)").alias(
            "conf_permille"
        ),
    )


def calibration_ece(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    quant: int = 1_000_000,
) -> DataFrame:
    """One-row expected calibration error in integer parts-per-million:
    ``ECE = sum_b |acc_b - conf_b| * n_b / N`` folds to the exact
    integer form ``sum_b |n_pos_b * quant - score_q_sum_b| div N``
    (which IS ppm when ``quant`` = 1e6) — no float accumulation
    anywhere."""
    agg = _calibration_bins(df, score_col, label_col, n_bins, quant)
    return agg.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.expr(
            "sum(abs(n_positive * "
            f"{quant}"
            " - score_q_sum)) div sum(n_rows)"
        )
        .cast("long")
        .alias("ece_ppm"),
    )

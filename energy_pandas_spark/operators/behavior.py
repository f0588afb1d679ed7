"""Behavioral event-sequence analytics: funnels and cohort retention.

Both reduce to per-user aggregates joined on the user key, so every
exchange is hash-partitioned on ``user_id`` and reusable between
stages — no sessions are materialized, no event-order window spans
more than one user.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel", "funnel_users", "cohort_retention"]


def funnel_users(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> list[DataFrame]:
    """Per-prefix completion frames: element i holds one row per user
    who performed ``steps[0..i]`` in order (step k strictly after the
    user's EARLIEST qualifying completion of step k-1), with columns
    (user, __t = completion ts of step i, __start = funnel start ts).

    Each stage is one conditional min-timestamp aggregate joined to
    the previous stage on the user key — k small hash aggregates
    co-partitioned on ``user_id``; never a per-user event sort.
    ``within_seconds`` bounds ``__t - __start`` at every stage.
    """
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__type"),
        F.col(ts_col).alias("__ts"),
    )
    cur = (
        ev.filter(F.col("__type") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__t"))
        .withColumn("__start", F.col("__t"))
    )
    out = [cur]
    for step in steps[1:]:
        nxt = (
            ev.filter(F.col("__type") == step)
            .join(cur.select("__u", "__t", "__start"), "__u")
            .filter(F.col("__ts") > F.col("__t"))
            .groupBy("__u")
            .agg(
                F.min("__ts").alias("__t"),
                # constant per user: the funnel-start timestamp
                F.first("__start").alias("__start"),
            )
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.unix_micros("__t") - F.unix_micros("__start")
                <= within_seconds * 1_000_000
            )
        out.append(nxt)
        cur = nxt
    return out


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion counts: one row per step with the
    number of users who completed the funnel up to and including it,
    in order. All prefix frames union into ONE lazy plan (a single
    action), so no driver-side per-step counting."""
    frames = funnel_users(
        df, steps, ts_col, user_col, type_col, within_seconds
    )
    spark = df.sparkSession
    labels = spark.createDataFrame(
        list(enumerate(steps)), "step_index int, step string"
    )
    reached = None
    for i, fr in enumerate(frames):
        part = fr.select(F.lit(i).alias("step_index"), F.col("__u"))
        reached = part if reached is None else reached.unionByName(part)
    counts = reached.groupBy("step_index").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return (
        labels.join(counts, "step_index", "left")
        .select(
            "step_index",
            "step",
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
        .orderBy("step_index")
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users bucket into a cohort by their
    FIRST activity period; ``n_active`` counts distinct cohort members
    active ``period_offset`` periods later.

    Two hash aggregates (first-activity per user, distinct
    user-periods) joined on the user key, then one count-distinct per
    (cohort, offset) — all keyed exchanges, no windows over events.
    """
    trunc = F.date_trunc(period, F.col(ts_col))
    firsts = df.groupBy(user_col).agg(F.min(trunc).alias("__cohort"))
    active = df.select(F.col(user_col), trunc.alias("__p")).distinct()
    if period == "month":
        offset = (F.month("__p") - F.month("__cohort")) + 12 * (
            F.year("__p") - F.year("__cohort")
        )
    elif period in ("week", "day"):
        days = {"week": 7, "day": 1}[period]
        offset = (
            F.datediff(F.to_date("__p"), F.to_date("__cohort")) / days
        ).cast("int")
    else:
        raise ValueError(f"cohort_retention: unsupported period {period!r}")
    return (
        active.join(firsts, user_col)
        .select(
            F.to_date("__cohort").alias("cohort"),
            offset.alias("period_offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )

"""Physical-plan introspection: extract the properties that matter for
100 TB execution (pushdown, pruning, broadcast strategy, shuffle count,
codegen coverage) as testable values instead of eyeballed explain()
output. Used by tests/test_plans.py to LOCK IN plan shapes — a
regression that drops a pushed filter or turns a broadcast join into a
shuffle join fails CI, not production.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "simple_plan",
    "pushed_filters",
    "read_schemas",
    "exchange_count",
    "broadcast_join_count",
    "codegen_stage_count",
    "single_partition_exchanges",
]


def _capture(df: DataFrame, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def formatted_plan(df: DataFrame) -> str:
    return _capture(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return _capture(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the data source scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def broadcast_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(
        re.findall(r"^\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan, flags=re.M)
    )


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen stages covering the plan.

    AQE hides codegen ids until the adaptive plan finalizes, so the
    plan is captured with AQE momentarily disabled."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = simple_plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def single_partition_exchanges(df: DataFrame) -> int:
    """Exchanges that collapse to ONE partition (the scalability smell:
    global windows without PARTITION BY, global limits mid-plan)."""
    plan = formatted_plan(df)
    return len(re.findall(r"Exchange SinglePartition", plan))

"""Single-pass data-quality expectations (the ingest gate).

A 100 TB ingest cannot afford one validation scan per rule — a
deequ-style constraint suite has to compile to ONE pass. Every
expectation here contributes aggregate expressions to a single
map-combined ``df.agg(...)``; the 1-row result is then unpivoted
driver-cheap into one row per expectation (name, column, metric,
bound, ok). Ten rules or fifty, the table is read once.

All metrics are exact integer counts (or floor-division per-milles of
counts), so the suite is engine-exact and carries a DuckDB oracle in
the driver harness (`validate_docs`). Uniqueness is the one rule that
is not a pure conditional count — it uses exact ``count_distinct``,
which Catalyst plans as an Expand inside the same single scan (still
one pass over the data, one shuffle for the final 1-row reduce).

Row-level rules (`no_nulls`, `in_range`, `matches`, `in_set`,
`share_at_least`) also carry a row predicate, so
:func:`violations` can surface offending rows as a map-only filter —
no second aggregate, fully pushdown-friendly.

No reference counterpart (energy-pandas validates nothing); this is
part of the training-data-pipeline surface the build brief makes
first-class.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "Expectation",
    "expect_min_rows",
    "expect_no_nulls",
    "expect_null_share_below",
    "expect_unique",
    "expect_in_range",
    "expect_matches",
    "expect_in_set",
    "expect_share_at_least",
    "validate",
    "violations",
]


@dataclass(frozen=True)
class Expectation:
    """One compiled rule: ``aggs`` are the aggregate expressions this
    rule needs from the single shared pass; ``final`` combines the
    resulting scalar slots into the reported metric; the rule passes
    when ``metric <= bound`` (``op='<='``) or ``metric >= bound``.
    ``row_predicate`` (violating-row filter), when present, powers
    :func:`violations`."""

    name: str
    column: str
    aggs: tuple[Column, ...]
    final: Callable[[Sequence[str]], Column]
    bound: int
    op: str = "<="
    row_predicate: Column | None = field(default=None, compare=False)

    def ok_expr(self, metric: Column) -> Column:
        return metric <= F.lit(self.bound) if self.op == "<=" else metric >= F.lit(self.bound)


def _count_if(pred: Column) -> Column:
    # map-combined conditional count; NULL predicate counts as false
    return F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).cast("long")


def expect_min_rows(n: int) -> Expectation:
    """Table has at least ``n`` rows (empty-partition / broken-glob
    tripwire)."""
    return Expectation(
        name="min_rows",
        column="*",
        aggs=(F.count(F.lit(1)).cast("long"),),
        final=lambda s: F.col(s[0]),
        bound=int(n),
        op=">=",
    )


def expect_no_nulls(col: str) -> Expectation:
    """Zero NULLs in ``col``."""
    pred = F.col(col).isNull()
    return Expectation(
        name="no_nulls",
        column=col,
        aggs=(_count_if(pred),),
        final=lambda s: F.col(s[0]),
        bound=0,
        row_predicate=pred,
    )


def expect_null_share_below(col: str, max_pm: int) -> Expectation:
    """NULL share of ``col`` is at most ``max_pm`` per mille (integer
    ``div`` floor division of exact counts — engine-exact, no float
    rounding even past 2^53 rows)."""
    return Expectation(
        name="null_share_below",
        column=col,
        aggs=(_count_if(F.col(col).isNull()), F.count(F.lit(1)).cast("long")),
        final=lambda s: F.expr(f"(1000 * {s[0]}) div greatest({s[1]}, 1)"),
        bound=int(max_pm),
        row_predicate=F.col(col).isNull(),
    )


def expect_unique(*cols: str) -> Expectation:
    """No duplicate (non-NULL) key tuples: metric = rows-with-complete-
    key minus distinct key tuples. Rows with a NULL key component are
    excluded (pair with :func:`expect_no_nulls` for a full key
    contract) — ``count_distinct`` skips NULL tuples, so counting them
    here would report phantom duplicates."""
    complete = None
    for c in cols:
        p = F.col(c).isNotNull()
        complete = p if complete is None else (complete & p)
    return Expectation(
        name="unique",
        column=",".join(cols),
        aggs=(_count_if(complete), F.count_distinct(*[F.col(c) for c in cols]).cast("long")),
        final=lambda s: F.expr(f"{s[0]} - {s[1]}"),
        bound=0,
    )


def expect_in_range(col: str, lo, hi, bound: int = 0) -> Expectation:
    """At most ``bound`` non-NULL values outside ``[lo, hi]``."""
    pred = F.col(col).isNotNull() & (~F.col(col).between(F.lit(lo), F.lit(hi)))
    return Expectation(
        name="in_range",
        column=col,
        aggs=(_count_if(pred),),
        final=lambda s: F.col(s[0]),
        bound=int(bound),
        row_predicate=pred,
    )


def expect_matches(col: str, regex: str, bound: int = 0) -> Expectation:
    """At most ``bound`` non-NULL values NOT fully matching ``regex``
    (keep the pattern in the Java∩RE2 subset if an oracle will replay
    it)."""
    pred = F.col(col).isNotNull() & (~F.col(col).rlike(f"^(?:{regex})$"))
    return Expectation(
        name="matches",
        column=col,
        aggs=(_count_if(pred),),
        final=lambda s: F.col(s[0]),
        bound=int(bound),
        row_predicate=pred,
    )


def expect_in_set(col: str, values: Sequence, bound: int = 0) -> Expectation:
    """At most ``bound`` non-NULL values outside the accepted set (the
    set ships in-plan as a literal — keep it small; a large set should
    be a broadcast anti-join, not an expectation)."""
    pred = F.col(col).isNotNull() & (~F.col(col).isin(list(values)))
    return Expectation(
        name="in_set",
        column=col,
        aggs=(_count_if(pred),),
        final=lambda s: F.col(s[0]),
        bound=int(bound),
        row_predicate=pred,
    )


def expect_share_at_least(name: str, pred: Column, min_pm: int) -> Expectation:
    """At least ``min_pm`` per mille of rows satisfy ``pred`` (e.g.
    non-empty text share >= 990). NULL predicate counts as false."""
    return Expectation(
        name="share_at_least",
        column=name,
        aggs=(_count_if(pred), F.count(F.lit(1)).cast("long")),
        final=lambda s: F.expr(f"(1000 * {s[0]}) div greatest({s[1]}, 1)"),
        bound=int(min_pm),
        op=">=",
        row_predicate=~F.coalesce(pred, F.lit(False)),
    )


def validate(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """Run the whole suite in ONE aggregate pass over ``df``.

    Returns one row per expectation: (expectation, column, metric,
    bound, ok), in the order given. The single ``agg`` computes every
    rule's slots together (map-combined partials → one 1-row reduce);
    the unpivot that follows operates on literally one row.
    """
    if not expectations:
        raise ValueError("validate() needs at least one expectation")
    slots: list[Column] = []
    spans: list[tuple[int, int]] = []
    for e in expectations:
        spans.append((len(slots), len(slots) + len(e.aggs)))
        slots.extend(e.aggs)
    row = df.agg(*[c.alias(f"__s{i}") for i, c in enumerate(slots)])

    per_rule: list[Column] = []
    for e, (lo, hi) in zip(expectations, spans):
        metric = e.final([f"__s{i}" for i in range(lo, hi)])
        per_rule.append(
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.column).alias("column"),
                metric.cast("long").alias("metric"),
                F.lit(e.bound).cast("long").alias("bound"),
                e.ok_expr(metric.cast("long")).alias("ok"),
            )
        )
    return (
        row.select(F.explode(F.array(*per_rule)).alias("r"))
        .select("r.expectation", "r.column", "r.metric", "r.bound", "r.ok")
    )


def violations(df: DataFrame, expectation: Expectation, limit: int | None = None) -> DataFrame:
    """Offending rows for a row-level rule — a map-only filter (the
    predicate pushes into the scan), optionally bounded by ``limit``
    for triage. Aggregate-only rules (``unique``, ``min_rows``) have
    no row predicate and raise."""
    if expectation.row_predicate is None:
        raise ValueError(
            f"expectation {expectation.name!r} on {expectation.column!r} "
            "is aggregate-only; it has no per-row violation predicate"
        )
    out = df.filter(expectation.row_predicate)
    return out.limit(limit) if limit is not None else out

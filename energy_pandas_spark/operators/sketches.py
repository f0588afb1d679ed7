"""Mergeable sketch rollups: distinct counts (HLL) and quantiles (KLL)
that aggregate hierarchically WITHOUT rescanning history.

The 100 TB pattern: the corpus lands in time/source partitions; each
partition reduces once to a tiny binary sketch row; every downstream
question (distinct users this month? p99 latency all-time?) merges
sketches instead of re-reading data. Spark 4's DataSketches functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``kll_sketch_agg_double`` /
``kll_sketch_merge_double``) are mergeable monoids, so partial
aggregation, AQE re-partitioning, and incremental (streaming
``foreachBatch``) maintenance all compose.

Exact counterparts (``countDistinct``, ``percentile``) remain the
oracle contract elsewhere in the engine; sketches are the documented
approximate scale path with error bounded in tests (HLL lgK=12 ->
~1.6% rse; KLL k=200 -> ~1.3% rank error).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "cardinality_sketches",
    "merge_cardinality",
    "quantile_sketches",
    "merge_quantiles",
    "fold_kll",
    "cm_sketch",
    "cm_merge",
    "cm_query",
    "cm_md5_hasher",
]


def _keys(by: str | Sequence[str] | None) -> list[str]:
    return [by] if isinstance(by, str) else list(by or [])


def fold_kll(arr) -> F.Column:
    """Pairwise fold of an ARRAY of KLL sketch blobs into one sketch
    (``kll_sketch_merge_double`` is a binary scalar — Spark ships no
    union aggregate for KLL). THE shared fold — merge_quantiles and
    the streaming quantile writer both use it, so ANSI/empty-array
    edge fixes land once. The fold is associative, so collect order
    does not matter."""
    return F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, s: F.kll_sketch_merge_double(acc, s),
    )


def _qlabel(q: float) -> str:
    """Collision-proof quantile column label: integral percents keep
    the established ``q_50`` form; sub-percent quantiles spell their
    decimals (``0.999 -> q_99_9``) instead of rounding into a
    neighbor's name (0.999 and 1.0 must not both emit ``q_100``)."""
    pct = q * 100.0
    if abs(pct - round(pct)) < 1e-9:
        return f"q_{int(round(pct)):02d}"
    return "q_" + f"{pct:g}".replace(".", "_").replace("-", "m")


def cardinality_sketches(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str] | None = None,
    lgk: int = 12,
    out_col: str = "hll",
) -> DataFrame:
    """Reduce each group to one mergeable HLL sketch (binary column).
    One map-combined hash aggregate — the shuffle carries sketches
    (~2^lgk bytes), never the raw values."""
    keys = _keys(by)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(out_col)
    )


def merge_cardinality(
    sketches: DataFrame,
    by: str | Sequence[str] | None = None,
    sketch_col: str = "hll",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Union sketch rows up a hierarchy level and estimate. Input rows
    are sketches (e.g. per day); output is the coarser group (e.g. per
    month) — no scan of the underlying data."""
    keys = _keys(by)
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(out_col)
    )


def quantile_sketches(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str] | None = None,
    k: int = 200,
    out_col: str = "kll",
) -> DataFrame:
    """Reduce each group to one mergeable KLL quantile sketch over a
    double column."""
    keys = _keys(by)
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            out_col
        )
    )


def merge_quantiles(
    sketches: DataFrame,
    quantiles: Sequence[float],
    by: str | Sequence[str] | None = None,
    sketch_col: str = "kll",
) -> DataFrame:
    """Merge KLL sketch rows up a hierarchy level and read out the
    requested quantiles as ``q_<pct>`` columns.

    ``kll_sketch_merge_double`` is a binary scalar (no union
    aggregate exists for KLL), so the group's sketches collect into an
    array and fold pairwise. Safe because hierarchy fan-ins are small
    (days -> month is ~31 KB-sized sketches per group), and the fold
    is associative so the collect order does not matter."""
    keys = _keys(by)
    merged = sketches.groupBy(*keys).agg(
        fold_kll(F.collect_list(F.col(sketch_col))).alias("__m")
    )
    outs = [
        F.kll_sketch_get_quantile_double(F.col("__m"), F.lit(float(q))).alias(
            _qlabel(q)
        )
        for q in quantiles
    ]
    return merged.select(*[F.col(c) for c in keys], *outs)


# ---------------------------------------------------------------------------
# Count-Min: mergeable point-frequency estimates
# ---------------------------------------------------------------------------
#
# Spark ships no Count-Min aggregate, so the sketch lives as a SPARSE
# count table: (group keys..., row, col, count) with at most
# depth * width rows per group. That representation is the mergeable
# monoid the HLL/KLL tables are — rollup = one integer sum on
# (row, col) — with two properties the dense-blob form lacks: the
# merge is EXACTLY equal to a single-shot build (deterministic BIGINT
# sums, asserted bit-equal in tests, no binary-blob equality caveats),
# and Catalyst sees plain longs (column pruning, partial aggregation,
# AQE all apply). Row i's hash is xxhash64(i, value) pmod width — the
# engine's house hash, so sketches built by different jobs merge.
#
# Estimates carry the classic CM guarantee: est >= true count, and
# est <= true + eps*N with probability 1 - (1/2)^depth for
# width >= e/eps (point queries take the min over depth rows).


def _cm_default_hasher(i, v):
    """Row i's counter position source: the engine's house hash. Pass
    ``hasher=cm_md5_hasher`` instead when the sketch must be
    replayable by an engine without xxhash64 (the DuckDB oracles)."""
    return F.xxhash64(i, v)


def cm_md5_hasher(i, v):
    """Engine-portable CM hasher: top 60 bits of md5("i:value") — the
    same md5-hex-prefix scheme as ``sampling.hash_bucket``, so DuckDB
    replicates it with ('0x' || substr(md5(...), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(i.cast("string"), F.lit(":"), v.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def cm_sketch(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str] | None = None,
    depth: int = 4,
    width: int = 2048,
    hasher=None,
) -> DataFrame:
    """Reduce each group to a sparse Count-Min table ``(keys..., row,
    col, count)`` — one explode(depth) + map-combined hash aggregate;
    the shuffle carries (row, col, partial count) longs, never values."""
    keys = _keys(by)
    h = hasher or _cm_default_hasher
    rows = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: F.struct(
                i.alias("row"),
                F.pmod(h(i, F.col(value_col)), F.lit(width)).alias("col"),
            ),
        )
    ).alias("__rc")
    return (
        df.select(*keys, rows)
        .groupBy(*keys, F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def cm_merge(
    sketches: DataFrame,
    by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Merge sparse CM tables up a hierarchy level: one integer sum on
    (keys..., row, col) — bit-equal to building one sketch over the
    union of the inputs."""
    keys = _keys(by)
    return sketches.groupBy(*keys, "row", "col").agg(
        F.sum("count").alias("count")
    )


def cm_query(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 2048,
    out_col: str = "cm_est",
    hasher=None,
) -> DataFrame:
    """Point-frequency estimates for each row of ``queries``: the min
    over depth rows of the matching counters (absent counter = 0).
    ``depth`` / ``width`` (and ``hasher``) MUST match the build. ``sketch`` is ONE
    sketch (build ungrouped, or filter/pre-merge a grouped table to
    one group first). The SKETCH side broadcasts (<= depth * width
    counter rows by construction — the whole point of a sketch); the
    probe side is left-outer preserved, so estimates cover values the
    sketch never saw (0). Per-query cost scales with depth."""
    h = hasher or _cm_default_hasher
    probe = queries.select(
        F.col(value_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.alias("row"),
                    F.pmod(h(i, F.col(value_col)), F.lit(width)).alias("col"),
                ),
            )
        ).alias("__rc"),
    ).select(value_col, F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
    joined = probe.join(
        F.broadcast(sketch.select("row", "col", "count")),
        ["row", "col"],
        "left",
    )
    return (
        joined.groupBy(value_col)
        .agg(
            F.min(F.coalesce(F.col("count"), F.lit(0).cast("long"))).alias(
                out_col
            )
        )
    )

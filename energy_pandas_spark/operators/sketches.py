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
    "hll_registers",
    "hll_merge",
    "hll_estimate",
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


# ---------------------------------------------------------------------------
# Engine-portable HyperLogLog (md5 registers — replayable by any SQL engine)
# ---------------------------------------------------------------------------
#
# The DataSketches HLL path above is the fast production sketch, but
# its binary blobs are opaque to other engines. This variant keeps the
# sketch as a SPARSE register table (group keys..., bucket, r) built
# from the package's md5-hex-prefix hash — the same engine-portable
# scheme as cm_md5_hasher / sampling.hash_bucket — so a DuckDB oracle
# REPLAYS the sketch bit-for-bit, hash collisions included, and the
# estimate itself sits under the value-hash gate (integer register
# state + ONE IEEE division both engines evaluate identically).
#
# Register algebra (classic Flajolet HLL): the 60-bit md5 value v
# splits into bucket = v % m (m = 2^lgm) and a B = 60 - lgm bit word
# w = v div m; rho(w) = position of the leftmost 1-bit in the B-bit
# word (B + 1 for w = 0); register r_j = max rho over the bucket.
# Merge = max per (keys, bucket), BIT-equal to a single-shot build.
# The raw estimate is alpha_m * m^2 / sum_j 2^(-r_j); absent buckets
# contribute 2^0. Scaling the harmonic sum by 2^(B+1) keeps it an
# exact BIGINT: z_scaled = sum_present 2^(B+1-r_j)
#                          + (m - present) * 2^(B+1)   <= m * 2^(B+1).
#
# hll_estimate emits the raw-HLL estimate only (no small/large-range
# correction branch: linear counting needs ln(), whose libm rounding
# is engine-specific — n_zero is in the output so callers can apply
# m * ln(m / n_zero) themselves when est < 2.5 m). Relative standard
# error ~= 1.04 / sqrt(m) (~6.5% at the default lgm = 8).


def hll_registers(
    df: DataFrame,
    value_col: str,
    by: str | Sequence[str] | None = None,
    lgm: int = 8,
) -> DataFrame:
    """Reduce each group to its sparse HLL register table ``(keys...,
    bucket, r)`` (at most ``2^lgm`` rows per group). One map-combined
    hash aggregate — the shuffle carries (bucket, partial max) ints,
    never the values; duplicates collapse map-side by construction."""
    if not 4 <= lgm <= 16:
        raise ValueError(f"lgm must be in [4, 16], got {lgm}")
    keys = _keys(by)
    b = 60 - lgm
    v = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    bucket = (v % F.lit(1 << lgm)).cast("int")
    # exact floor-div by 2^lgm: a right shift (v / m in DOUBLE would
    # lose bits — v has up to 60 significant bits, doubles carry 53)
    w = F.shiftright(v, lgm)
    rho = (
        F.when(w == 0, F.lit(b + 1))
        .otherwise(F.lit(b) - (F.length(F.bin(w)) - 1))
        .cast("int")
    )
    return (
        df.select(*keys, bucket.alias("bucket"), rho.alias("__rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("__rho").alias("r"))
    )


def hll_merge(
    registers: DataFrame,
    by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Merge register tables up a hierarchy level: one integer max on
    (keys..., bucket) — bit-equal to building one register table over
    the union of the inputs."""
    keys = _keys(by)
    return registers.groupBy(*keys, "bucket").agg(F.max("r").alias("r"))


def hll_estimate(
    registers: DataFrame,
    by: str | Sequence[str] | None = None,
    lgm: int = 8,
    out_col: str = "est_distinct",
    quantize: int | None = None,
) -> DataFrame:
    """Read a register table out to ``(keys..., m, n_zero, z_scaled,
    est_distinct)``: exact integer sketch state plus the estimate with
    the standard small-range correction — linear counting
    ``m * ln(m / V)`` when the raw estimate falls under ``2.5 m`` and
    zero registers remain (raw HLL overestimates ~10x in that regime).
    ``lgm`` MUST match the build.

    Portability: the raw branch is one IEEE expression over exact
    integers — bit-identical on any engine. The linear-counting branch
    calls runtime ``ln``, where JVM ``Math.log`` and C libm disagree by
    1 ulp on ~7% of inputs (measured) — so with ``quantize`` set the
    output column becomes ``<out_col>_q``: BIGINT
    ``round(quantize * est)`` where the linear-counting values come
    from an EXACT in-plan integer lookup table over the m possible
    ``V`` values (built driver-side with Python's libm, replayable as
    a list literal by any engine) and the raw branch rounds a double
    both engines already agree on bit-for-bit — no float leaves the
    plan, hash-gate safe. Quantized mode needs ``lgm <= 10`` (the
    lookup literal is m entries)."""
    keys = _keys(by)
    m = 1 << lgm
    b = 60 - lgm
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    scale = F.lit(float(m * m * (1 << (b + 1))))  # exact: a power of two
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {b + 1} - r)")).alias(
            "__zp"
        ),
    )
    z = (
        F.col("__zp")
        + (F.lit(m) - F.col("__present")) * F.lit(1 << (b + 1)).cast("long")
    ).cast("long")
    nz = (F.lit(m) - F.col("__present")).cast("long")
    raw = alpha * scale / z.cast("double")
    small = (raw <= F.lit(2.5 * m)) & (nz > 0)
    if quantize is None:
        lc = F.lit(float(m)) * F.log(F.lit(float(m)) / nz.cast("double"))
        est = F.when(small, lc).otherwise(raw).alias(out_col)
    else:
        if lgm > 10:
            raise ValueError(
                f"quantized estimates need lgm <= 10, got {lgm}"
            )
        import math

        from energy_pandas_spark.util import round_half_away

        lc_table = F.array(
            *[
                F.lit(round_half_away(quantize * m * math.log(m / v))).cast(
                    "long"
                )
                for v in range(1, m + 1)
            ]
        )
        lc_q = F.element_at(lc_table, nz.cast("int"))
        raw_q = F.round(raw * F.lit(float(quantize))).cast("long")
        est = F.when(small, lc_q).otherwise(raw_q).alias(out_col + "_q")
    return agg.select(
        *keys,
        F.lit(m).alias("m"),
        nz.alias("n_zero"),
        z.alias("z_scaled"),
        est,
    )

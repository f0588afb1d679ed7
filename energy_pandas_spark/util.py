"""Small shared engine utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "spread_partitions",
    "epoch_micros",
    "round_half_away",
    "attach_caches",
    "release_caches",
    "track_cache",
    "drain_tracked_caches",
]

# Every persist an operator takes out is registered here as well as on
# the returned frame (``_eps_caches``): DataFrame transformations drop
# custom attributes, so a caller that wraps an operator's result in
# further ``select``/``join`` steps loses the per-frame handle — the
# registry is the release path that survives wrapping. Entries are held
# strongly until drained (a weakly-held frame that gets GC'd would
# orphan its JVM cache entry with no way left to unpersist it).
_TRACKED_CACHES: list[DataFrame] = []


def attach_caches(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """``eager=False`` twin of the localCheckpoint-and-unpersist hygiene
    pattern (ADVICE r6): operators that persist internal frames and are
    asked NOT to materialize eagerly return the lazy plan with those
    persisted inputs attached (``_eps_caches``), so the caller can
    release exactly these persists with :func:`release_caches` instead
    of nuking the whole session via ``spark.catalog.clearCache()``.

    The same frames are also recorded in a module-level registry so
    that harnesses which materialize many operator results in sequence
    (bench, correctness sweeps, long-lived pipelines) can release
    everything in one :func:`drain_tracked_caches` call even when the
    per-frame handle was lost to an intervening transformation."""
    held = list(getattr(out, "_eps_caches", ())) + list(caches)
    out._eps_caches = tuple(held)
    _TRACKED_CACHES.extend(caches)
    return out


def track_cache(df: DataFrame) -> DataFrame:
    """Register a persisted frame for :func:`drain_tracked_caches`
    without attaching it to an output frame — for sites where the
    output is assembled far from the persist call."""
    _TRACKED_CACHES.append(df)
    return df


def drain_tracked_caches() -> int:
    """Unpersist every operator-held cache registered since the last
    drain and return how many were released. Call after materializing
    an operator's result (or a batch of them) in harness code; safe to
    call at any time — frames already unpersisted are a no-op."""
    n = len(_TRACKED_CACHES)
    for c in _TRACKED_CACHES:
        try:
            c.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _TRACKED_CACHES.clear()
    return n


def release_caches(df: DataFrame) -> None:
    """Release the internal persists attached to an ``eager=False``
    result (see :func:`attach_caches`). Safe to call more than once and
    on frames with nothing attached. The frame's plan remains valid
    afterwards — recomputation just stops hitting the caches."""
    for c in getattr(df, "_eps_caches", ()):
        c.unpersist()
    df._eps_caches = ()

def epoch_micros(df: DataFrame, ts_col: str, col: Column | None = None) -> Column:
    """Microseconds since epoch, type-tolerant: ``unix_micros`` rejects
    TIMESTAMP_NTZ (how parquet written without isAdjustedToUTC reads
    when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on), and
    casting NTZ -> TIMESTAMP first would shift by the session timezone.
    NTZ wall clocks are measured against an NTZ epoch instead, so the
    result is timezone-independent for both types.

    ``ts_col`` names the column whose dtype decides the branch; ``col``
    optionally supplies a derived expression of that column (e.g. a
    ``lead`` over a window) to convert instead of the raw column.
    """
    expr = col if col is not None else F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # calendar decomposition, NOT timestamp_diff: Spark routes
        # timestamp_diff on NTZ operands through the SESSION timezone,
        # so in a DST-observing session the spring-forward wall hour
        # collapses onto its neighbor (02:00 == 03:00 on the gap day).
        # unix_date/hour/minute/date_part are pure wall-clock reads.
        return (
            F.unix_date(F.to_date(expr)).cast("long") * F.lit(86_400_000_000)
            + F.hour(expr).cast("long") * F.lit(3_600_000_000)
            + F.minute(expr).cast("long") * F.lit(60_000_000)
            + (F.date_part(F.lit("SECOND"), expr) * 1_000_000).cast("long")
        )
    return F.unix_micros(expr)


def spread_partitions(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work is spread across all cores: a small
    single-file parquet scan arrives as ONE partition, serializing the
    expensive expression / Arrow-batch work behind it. At real scale the
    scan has plenty of splits and this is a no-op (the round-robin
    repartition only fires when the input has fewer partitions than the
    cluster has slots).

    Probe contract (ADVICE r6): ``df.rdd.getNumPartitions()`` forces a
    logical→physical conversion, so callers pass the SCAN-STAGE frame
    (a projection straight off the read) — planning a bare scan is
    cheap; never call this on a deep plan mid-pipeline. Under Spark
    Connect neither ``sparkContext`` nor ``df.rdd`` exists; the probe
    degrades to a no-op there (the classic-mode single-file pathology
    is a local-testing concern — Connect clusters read real multi-split
    scans, and an unconditional repartition would tax every caller with
    a shuffle to fix a case that does not occur)."""
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no sparkContext / RDD API
        return df
    if n < target:
        return df.repartition(target)
    return df


def round_half_away(x: float) -> int:
    """Driver-side half-away-from-zero rounding — the engine's house
    rounding rule (matches Spark/DuckDB ``round`` on doubles), shared
    by the batch and streaming CUSUM so their integer thresholds stay
    bit-identical. Python's builtin ``round`` is banker's rounding and
    MUST NOT be substituted."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

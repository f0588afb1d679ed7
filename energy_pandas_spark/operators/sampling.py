"""Deterministic sampling / splitting for training-data pipelines.

A 100 TB corpus cannot be split with ``rand()`` — reruns, backfills,
and per-source incremental loads must all agree on which row belongs
to which split. The standard fix is HASH-based assignment: a stable
content key (doc id, url, fingerprint) hashes to a bucket in
[0, denominator); split boundaries are cumulative bucket ranges. The
assignment is a pure projection — no shuffle, no state, reproducible
on any engine that has the same hash (we use md5, which every engine
and the DuckDB oracle share bit-for-bit).

``weighted_mixture`` composes per-source hash-sampling into a corpus
mixture ("60% web, 30% code, 10% books"): each source keeps rows whose
bucket falls under its sampling rate. At scale this is a map-only
filter on each source followed by a union — the parquet scans prune
columns, the filter pushes down nothing (hash of a column) but costs
one md5 per row, and NO shuffle happens at all.

Reference scope note: the reference library (energy-pandas) has no
sampling surface at all; this module is north-star pipeline surface
(SURVEY.md §7 step 8).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "hash_sample",
    "hash_sample_by",
    "sample_k_per_group",
    "group_quantile_thresholds",
    "group_quantile_thresholds_multi",
    "drop_below_group_quantile",
    "weighted_mixture",
    "weighted_bernoulli_sample",
    "balanced_cap_sample",
    "temperature_mixture",
    "select_token_budget",
    "split_leakage_stats",
    "leakage_safe_split",
    "selection_curve",
    "mixture_plan",
    "epoch_order",
]


def hash_bucket(key: Column | str, denominator: int = 10_000) -> Column:
    """Stable bucket in [0, denominator) from md5 of the key.

    Uses the top 60 bits of the md5 hex digest (15 nibbles keep the
    value inside a signed 64-bit long, so ``conv`` never saturates);
    md5 is uniform enough that bucket populations deviate < 0.1% at
    corpus scale."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % F.lit(denominator)).cast("int")


def hash_split(
    df: DataFrame,
    key: str,
    splits: Mapping[str, float] | None = None,
    out_col: str = "split",
    denominator: int = 10_000,
) -> DataFrame:
    """Assign every row to a named split by hashed key.

    ``splits`` maps name -> fraction (must sum to <= 1; any remainder
    becomes the last split's overflow guard and is assigned to it).
    Default is the classic 98/1/1 train/val/test. Same key => same
    split, forever, on every engine."""
    splits = dict(splits or {"train": 0.98, "val": 0.01, "test": 0.01})
    total = sum(splits.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"split fractions must sum to (0, 1], got {total}")
    b = hash_bucket(key, denominator)
    expr = None
    hi = 0
    names = list(splits)
    for name in names[:-1]:
        hi += int(round(splits[name] * denominator))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame,
    key: str,
    rate: float,
    denominator: int = 10_000,
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashed key.

    Unlike ``df.sample``, the kept set is a pure function of the key:
    incremental reruns keep exactly the same rows, and a row kept at
    rate=0.1 is also kept at every rate >= 0.1 (nested samples)."""
    if not 0 <= rate <= 1:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(key, denominator) < int(round(rate * denominator)))


def hash_sample_by(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep rates (the
    rerun-stable analogue of ``df.sampleBy``). Strata missing from
    ``rates`` keep ``default_rate``. Pure map-side filter — one
    CASE-threshold per stratum, no shuffle, no RNG state."""
    for s, r in rates.items():
        if not 0 <= r <= 1:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0 <= default_rate <= 1:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    b = hash_bucket(key, denominator)
    thresh = F.lit(int(round(default_rate * denominator)))
    for s, r in rates.items():
        thresh = (
            F.when(F.col(strata_col) == s, F.lit(int(round(r * denominator))))
            .otherwise(thresh)
        )
    return df.filter(b < thresh)


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key: str = "doc_id",
    denominator: int = 1_000_000,
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, deterministically:
    the per-group min-k by ``(hash_bucket(key), key)``. The rerun-
    stable analogue of "show me k random rows from every source" —
    inspection samples, eval panels, per-domain spot checks.

    Rate-based sampling (:func:`hash_sample_by`) can't pin an exact
    count; a plain ``Window.partitionBy(group)`` rank would pile the
    biggest group into one task. This is the two-stage top-k the
    engine uses everywhere: a bounded rank per (group, input
    partition) prunes to ``k × partitions`` survivors, then the
    global rank runs over that small set. Output adds ``sample_rank``
    (1..k within group)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    b = hash_bucket(key, denominator)
    order = [F.asc("__b"), F.asc(key)]
    local = (
        df.withColumn("__b", b)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__lr",
            F.row_number().over(
                Window.partitionBy(group_col, "__pid").orderBy(*order)
            ),
        )
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__pid")
    )
    return (
        local.withColumn(
            "sample_rank",
            F.row_number().over(Window.partitionBy(group_col).orderBy(*order)),
        )
        .filter(F.col("sample_rank") <= k)
        .drop("__b")
    )


def group_quantile_thresholds(
    df: DataFrame,
    score_col: str,
    by: str,
    permille: int = 100,
) -> DataFrame:
    """Exact per-group ``permille``/1000 quantile of an integer score
    (percentile_disc semantics: the smallest score whose cumulative
    count reaches ``ceil(n * permille / 1000)``), computed WITHOUT a
    per-row window: one map-combined ``(group, score)`` count
    aggregate, then the cumulative walk runs over that small table
    (distinct scores per group, not rows per group). The quantile rank
    is pure integer arithmetic — ``(n * permille + 999) div 1000`` —
    so the threshold is engine-exact, no float quantile semantics.
    NULL scores are excluded from both the count and the quantile
    (engines disagree on where NULL sorts; an unscored row has no
    place in a score quantile).

    Returns (by, threshold, n_rows)."""
    return group_quantile_thresholds_multi(df, score_col, by, (permille,)).select(
        by, F.col(f"threshold_{int(permille)}").alias("threshold"), "n_rows"
    )


def group_quantile_thresholds_multi(
    df: DataFrame,
    score_col: str,
    by: str,
    permilles: tuple[int, ...],
) -> DataFrame:
    """Several exact per-group quantiles of an integer score in ONE
    pass — the (group, score) count aggregate and the cumulative walk
    are identical for every ``permille``, so asking for N thresholds
    separately re-aggregated the input N times (perplexity_buckets
    paid two full passes over the scored corpus for its two cuts).
    Each threshold is a conditional ``min`` over the same cumulative
    table, bit-identical to the single-permille result per quantile.

    Returns (by, threshold_<p1>, ..., n_rows)."""
    if not permilles:
        raise ValueError("permilles must be non-empty")
    for p in permilles:
        if not 0 < p <= 1000:
            raise ValueError(f"permille must be in (0, 1000], got {p}")
    from pyspark.sql import Window

    counts = (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(by, score_col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    tot = counts.groupBy(by).agg(F.sum("__n").alias("n_rows"))
    cum = counts.withColumn(
        "__cum",
        F.sum("__n").over(
            Window.partitionBy(by)
            .orderBy(score_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum")
                >= F.expr(f"(n_rows * {int(p)} + 999) div 1000"),
                F.col(score_col),
            )
        ).alias(f"threshold_{int(p)}")
        for p in permilles
    ]
    return (
        cum.join(tot, by)
        .groupBy(by, "n_rows")
        .agg(*aggs)
        .select(by, *[f"threshold_{int(p)}" for p in permilles], "n_rows")
    )


def drop_below_group_quantile(
    df: DataFrame,
    score_col: str,
    by: str,
    permille: int = 100,
) -> DataFrame:
    """Per-group quality gate: drop rows whose score is strictly BELOW
    the group's ``permille``/1000 quantile — "cut the bottom decile of
    every source" as one broadcast threshold join + map-side filter.
    Boundary-inclusive: rows tied AT the threshold survive, so the
    kept fraction is >= 1 - permille/1000 (exact-count trimming of a
    tied boundary would need an arbitrary within-tie order; a quality
    gate should not split ties)."""
    thr = group_quantile_thresholds(df, score_col, by, permille).select(
        by, "threshold"
    )
    return df.join(F.broadcast(thr), by, "left").filter(
        F.col("threshold").isNull() | (F.col(score_col) >= F.col("threshold"))
    ).drop("threshold")


def weighted_bernoulli_sample(
    df: DataFrame,
    key: str,
    weight: Column | str,
    max_weight: int,
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep probability is
    proportional to an INTEGER row weight (e.g. token count), capped at
    ``max_weight`` (which keeps with probability 1).

    keep iff ``hash_bucket(key) * max_weight < weight * denominator`` —
    all-integer arithmetic, so the decision is bit-identical on every
    engine (no pow/exp boundary, see the float-priority trap in
    Efraimidis-Spirakis style sampling). Rerun-stable, map-only, no
    shuffle; the classic use is length-proportional document sampling
    so a token-budgeted subcorpus is unbiased in tokens, not in docs."""
    if max_weight <= 0:
        raise ValueError(f"max_weight must be positive, got {max_weight}")
    w = F.col(weight) if isinstance(weight, str) else weight
    b = hash_bucket(key, denominator).cast("long")
    wl = F.least(w.cast("long"), F.lit(max_weight))
    return df.filter(b * F.lit(max_weight) < wl * F.lit(denominator))


def balanced_cap_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    cap: int,
    denominator: int = 10_000,
) -> DataFrame:
    """Approximately cap each group's row count at ``cap`` (downweight
    dominant sources so one crawl can't drown the mixture), keeping a
    deterministic hash-subset of oversized groups.

    Two stages: a tiny per-group count aggregate (broadcast back), then
    a map-only filter ``bucket < floor(cap * denominator / n_group)`` —
    INTEGER threshold arithmetic, so the kept set is engine-exact and
    rerun-stable. Groups at or under ``cap`` keep everything. The kept
    count is within ``n_group/denominator`` of ``cap`` (bucket
    granularity), which is the price of staying map-only: an exact cap
    needs a per-group rank, i.e. a skewed window over the largest
    group — the wrong trade at 100 TB."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    # integer division (div), NOT double division + floor: a quotient
    # epsilon below an integer can round UP in binary64 and shift the
    # threshold by one bucket, diverging between engines
    thresh = F.when(
        F.col("__n") <= F.lit(cap), F.lit(denominator)
    ).otherwise(F.expr(f"CAST({cap} AS BIGINT) * {denominator} div __n"))
    capped = counts.select(group_col, thresh.cast("int").alias("__thresh"))
    return (
        df.join(F.broadcast(capped), group_col)
        .filter(hash_bucket(key, denominator) < F.col("__thresh"))
        .drop("__thresh")
    )


def temperature_mixture(
    df: DataFrame,
    key: str,
    group_col: str,
    alpha: float = 0.7,
    total_rows: int | None = None,
    denominator: int = 10_000,
) -> DataFrame:
    """Temperature-flattened source mixture: sample each group at a
    rate proportional to ``n_group^(alpha-1)``, so group MASS in the
    output is proportional to ``n_group^alpha`` — the GPT-3/multilingual
    recipe that upweights small sources without letting one giant crawl
    dominate (``alpha=1`` keeps natural proportions, ``alpha=0`` makes
    groups uniform).

    ``total_rows`` scales the output to approximately that many rows;
    the default pins the group with the highest implied rate at rate 1
    — for ``alpha < 1`` that is the SMALLEST group (kept whole, while
    larger groups downsample), for ``alpha > 1`` the largest.

    Two stages like :func:`balanced_cap_sample`: a tiny per-group count
    aggregate broadcasts back, then a map-only deterministic
    ``hash_bucket(key) < rate`` filter — rerun-stable, no shuffle of
    the data, no RNG state. Rates are computed driver-side on the
    (small) group table so the float ``pow`` happens ONCE per group in
    one engine, then ships as integer bucket thresholds."""
    import math

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n")).collect()
    if not counts:
        return df
    # sqrt is IEEE correctly-rounded on every engine, pow is not — use
    # it for the common alpha=0.5 so integer thresholds are exactly
    # reproducible by a SQL oracle computing sqrt(n)
    def _pow(n: int) -> float:
        return math.sqrt(n) if alpha == 0.5 else float(n) ** alpha

    weights = {r[0]: (r["__n"], _pow(r["__n"])) for r in counts}
    total_mass = sum(w for _, w in weights.values())
    if total_rows is None:
        # keep the group with the highest implied rate at rate 1
        scale = 1.0 / max(w / n for n, w in weights.values())
    else:
        scale = total_rows / total_mass
    spark = df.sparkSession
    thresh_rows = [
        (
            g,
            int(
                min(max(weights[g][1] * scale / weights[g][0], 0.0), 1.0)
                * denominator
            ),
        )
        for g in weights
    ]
    thresh = spark.createDataFrame(
        thresh_rows, f"{group_col} string, __thresh int"
    )
    return (
        df.join(F.broadcast(thresh), group_col)
        .filter(hash_bucket(key, denominator) < F.col("__thresh"))
        .drop("__thresh")
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: Column | str,
    token_col: Column | str,
    key: str,
    n_buckets: int = 1000,
    denominator: int = 10_000,
    out_col: str = "qb",
) -> DataFrame:
    """Select the highest-quality subcorpus that fits a TOKEN budget —
    "give me the best ~10B tokens" — without a global sort.

    The scalable shape: quality (in [0, 1]) discretizes to ``n_buckets``
    integer buckets; ONE map-combined aggregate yields per-bucket token
    sums (<= ``n_buckets`` rows reach the driver); the driver walks the
    histogram from the top to find the boundary bucket; the selection
    is then a map-only filter — full buckets above the boundary, a
    deterministic hash-slice of the boundary bucket sized to the
    remaining budget. Contrast the naive ``ORDER BY quality DESC`` +
    running-sum cutoff: a full shuffle sort of the corpus plus a
    single-partition window.

    Integer discipline end-to-end: token sums are longs, the boundary
    slice threshold is ``remaining * denominator div bucket_tokens``
    (never a float ratio), so the kept set is engine-exact and
    rerun-stable. Kept tokens land within one hash-bucket granule of
    the budget (expected deviation ``bucket_tokens / denominator``).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    t = F.col(token_col) if isinstance(token_col, str) else token_col
    # null-safe: a null quality lands in the LOWEST bucket (kept last),
    # null token counts weigh 0 — without the coalesces a single null
    # row would put a None bucket / None sum into the driver walk below
    # and crash it
    qb = F.coalesce(
        F.least(
            F.greatest(F.floor(q * F.lit(n_buckets)).cast("int"), F.lit(0)),
            F.lit(n_buckets - 1),
        ),
        F.lit(0),
    )
    src = df.withColumn(out_col, qb)
    hist = (
        src.groupBy(out_col)
        .agg(
            F.coalesce(
                F.sum(F.coalesce(t.cast("long"), F.lit(0))), F.lit(0)
            ).alias("__tok")
        )
        .collect()
    )
    acc = 0
    boundary = None
    boundary_thresh = 0
    for r in sorted(hist, key=lambda r: -r[0]):
        if acc + r["__tok"] <= budget_tokens:
            acc += r["__tok"]
            continue
        boundary = r[0]
        boundary_thresh = (budget_tokens - acc) * denominator // r["__tok"]
        break
    if boundary is None:  # whole corpus fits
        return src
    b = hash_bucket(key, denominator)
    return src.filter(
        (F.col(out_col) > F.lit(boundary))
        | ((F.col(out_col) == F.lit(boundary)) & (b < F.lit(int(boundary_thresh))))
    )


def split_leakage_stats(
    df: DataFrame,
    key: str,
    text_col: str = "text",
    splits: Mapping[str, float] | None = None,
    denominator: int = 10_000,
) -> DataFrame:
    """Train/eval contamination audit: exact-content duplicates that
    straddle split boundaries after :func:`hash_split` (hash-splitting
    is by KEY, so two ids with identical text can land in different
    splits — exactly the leakage an eval must not have).

    One digest-keyed shuffle: per content group, count members per
    split, then the cross-split pair count is the product of the two
    counts — no self-join, no pair materialization, integer-exact.
    Returns one row per split pair: (split_a, split_b, n_digests,
    n_pairs)."""
    from energy_pandas_spark.functions.textfns import normalized_text

    tagged = hash_split(df, key, splits, out_col="__split", denominator=denominator)
    names = sorted(dict(splits or {"train": 0.98, "val": 0.01, "test": 0.01}))
    per = tagged.groupBy(F.md5(normalized_text(text_col)).alias("digest")).agg(
        *[
            F.count_if(F.col("__split") == s).alias(f"__n_{s}")
            for s in names
        ]
    )
    # ONE final aggregate for every pair (a union of per-pair aggs would
    # rescan the digest aggregate once per pair), then a literal stack
    # of the single stats row into (split_a, split_b) rows.
    pairs = [
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        aggs.append(
            F.count_if(
                (F.col(f"__n_{a}") > 0) & (F.col(f"__n_{b}") > 0)
            ).alias(f"__d_{a}_{b}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.col(f"__n_{a}") * F.col(f"__n_{b}")), F.lit(0)
            ).alias(f"__p_{a}_{b}")
        )
    stats = per.agg(*aggs)
    stacked = ", ".join(
        f"'{a}', '{b}', __d_{a}_{b}, __p_{a}_{b}" for a, b in pairs
    )
    return stats.selectExpr(
        f"stack({len(pairs)}, {stacked}) AS (split_a, split_b, n_digests, n_pairs)"
    )


def selection_curve(
    df: DataFrame,
    score_col: str,
    lo: int,
    hi: int,
    weight_col: str | None = None,
    n_bins: int = 20,
) -> DataFrame:
    """The quality-vs-quantity curve: how many documents (and how much
    token mass) survive at each candidate filter threshold — the table
    you read BEFORE picking a quality cutoff, instead of guessing one
    and re-scanning per guess.

    Scores are INTEGER (the engine's quantized-score convention —
    classifier per-mille, readability milli-units, token counts);
    ``[lo, hi)`` splits into ``n_bins`` equal integer bins (scores
    below ``lo`` clamp into bin 0, at/above ``hi`` into the last bin).
    Output, one row per bin ordered ascending: ``threshold`` (the
    bin's lower edge), per-bin ``n_docs``/``weight``, cumulative
    ``n_docs_at_or_above``/``weight_at_or_above`` (documents a filter
    at that threshold KEEPS), and ``weight_permille_retained``. Bin
    0's row is the keep-everything baseline — below-``lo`` scores
    clamp into it, so its cumulative includes the underflow.

    Shape at scale: one map-combined histogram aggregate over the
    corpus (n_bins rows out), then the descending cumulative runs as a
    window over the BIN table — ``n_bins`` rows, so the single
    partition is bounded by construction, never by the data. NULL
    scores are excluded (a doc with no score can't pass any
    threshold); NULL weights count 0."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    from pyspark.sql import Window

    s = F.col(score_col).cast("long")
    w = (
        F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    span = int(hi) - int(lo)
    bin_ = F.least(
        F.greatest(
            F.expr(
                f"((`{score_col}` - {int(lo)}) * {int(n_bins)}) div {span}"
            ),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    hist = (
        df.filter(s.isNotNull())
        .select(bin_.alias("bin"), w.alias("__w"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__w").alias("weight"))
    )
    # dense bins: every threshold appears even when its bin is empty
    # bin i's lowest member score is lo + CEIL(i*span/n_bins) — floor
    # would report a threshold one below the bin's true start whenever
    # span % n_bins != 0, and "keeps at this threshold" would lie
    bins = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin"),
        F.expr(
            f"{int(lo)} + (id * {span} + {int(n_bins) - 1}) div {int(n_bins)}"
        )
        .cast("long")
        .alias("threshold"),
    )
    full = bins.join(hist, "bin", "left").select(
        "bin",
        "threshold",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("weight", F.lit(0)).alias("weight"),
    )
    desc = (
        Window.orderBy(F.desc("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("weight").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        full.withColumn("n_docs_at_or_above", F.sum("n_docs").over(desc))
        .withColumn("weight_at_or_above", F.sum("weight").over(desc))
        .withColumn("__total", total)
        .withColumn(
            "weight_permille_retained",
            F.expr(
                "(weight_at_or_above * 1000)"
                " div greatest(__total, cast(1 as bigint))"
            ),
        )
        .drop("__total")
        .orderBy("bin")
    )


def mixture_plan(
    counts: DataFrame,
    budget: int,
    weights: Mapping[str, int],
    max_rate_permille: int = 1000,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Water-filling mixture solver: turn a target mixture into
    per-source token takes that RESPECT what each source actually has.

    ``weights`` are integer shares (any scale — permille is
    conventional); the ideal take for source i is ``w_i/W * budget``
    tokens, but a source can supply at most ``cap_i = n_tokens *
    max_rate_permille div 1000`` (``1000`` = no upsampling; ``3000``
    = up to 3 epochs). Scarce sources clamp to their cap and the
    deficit redistributes over the others proportionally to weight —
    the standard water-filling: sort by ``cap/w`` ascending (the
    clamp order), and a source is clamped iff its cap is below its
    share of what remains when every scarcer source is clamped:
    ``cap_i * W_rem < w_i * B_rem``, an INTEGER cross-multiplication
    over prefix sums, exact on any engine (the double ``cap/w`` is a
    single correctly-rounded division used for ORDERING only, with a
    source-name tiebreak). Unclamped takes floor-divide the remaining
    budget, so ``sum(take) <= budget`` within one token per source.

    Returns one row per WEIGHTED source: (source, n_tokens, cap, take,
    clamped, rate_bp) where ``rate_bp`` = take per ten-thousand of
    the source's tokens — the threshold :func:`hash_sample` /
    :func:`weighted_mixture` consume (rate_bp > 10000 means epochs).
    A weighted source absent from ``counts`` (typo, or a source that
    produced nothing this batch) appears as a VISIBLE zero-token
    clamped row instead of silently shrinking the mixture; sources in
    ``counts`` without a weight are excluded by definition (weights
    define the plan). Bounds: ``sum(weights) <= 10^6`` and
    ``budget <= 10^12`` keep the weight-side products inside int64
    (scale the units — budget in thousands of tokens — beyond that);
    the cap-side clamp test multiplies in DECIMAL(38,0) because caps
    are data-sized. The windows run over the SOURCES table — bounded
    by the number of sources, never by data."""
    if not 0 <= budget <= 10**12:
        raise ValueError(
            f"budget must be in [0, 1e12] (scale the unit), got {budget}"
        )
    if max_rate_permille < 1:
        raise ValueError("max_rate_permille must be >= 1")
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w < 1:
            raise ValueError(f"weight for {s!r} must be >= 1, got {w}")
    if sum(weights.values()) > 10**6:
        raise ValueError("sum(weights) must be <= 1e6 (scale the shares)")
    from pyspark.sql import Window

    spark = counts.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in weights.items()],
        f"`{source_col}` string, __w long",
    )
    base = (
        wdf.join(
            counts.select(
                F.col(source_col),
                F.col(tokens_col).cast("long").alias("__a"),
            ),
            source_col,
            "left",
        )
        .withColumn("__a", F.coalesce("__a", F.lit(0)))
        .withColumn(
            "__cap",
            F.expr(f"(__a * {int(max_rate_permille)}) div 1000"),
        )
    )
    order = Window.orderBy(
        (F.col("__cap").cast("double") / F.col("__w").cast("double")).asc(),
        F.col(source_col).asc(),
    )
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        base.withColumn("__cumcap", F.coalesce(F.sum("__cap").over(prev), F.lit(0)))
        .withColumn("__cumw", F.coalesce(F.sum("__w").over(prev), F.lit(0)))
        .withColumn("__wtot", F.sum("__w").over(everything))
        .withColumn(
            "__clamped",
            # both sides in DECIMAL(38,0): caps and their prefix sums
            # are data-sized (epochs x corpus tokens), so either
            # product can overflow int64 at web scale. The final take
            # division stays long: budget - capsum is in [0, budget]
            # (clamped caps never exceed the budget they won) and
            # w <= 1e6, so the product is <= 1e18.
            F.col("__cap").cast("decimal(38,0)")
            * (F.col("__wtot") - F.col("__cumw")).cast("decimal(38,0)")
            < F.col("__w").cast("decimal(38,0)")
            * (F.lit(int(budget)) - F.col("__cumcap")).cast("decimal(38,0)"),
        )
    )
    # remaining budget/weight after ALL clamped sources (the clamp set
    # is a prefix of the sort order — water-filling's structure)
    rem = staged.agg(
        F.coalesce(
            F.sum(F.when(F.col("__clamped"), F.col("__cap"))), F.lit(0)
        ).alias("__capsum"),
        F.coalesce(
            F.sum(F.when(~F.col("__clamped"), F.col("__w"))), F.lit(0)
        ).alias("__wrem"),
    )
    take = F.when(F.col("__clamped"), F.col("__cap")).otherwise(
        F.expr(f"(__w * ({int(budget)} - __capsum)) div greatest(__wrem, 1)")
    )
    out = (
        staged.crossJoin(F.broadcast(rem))
        .withColumn("take", F.least(take, F.col("__cap")))
        .select(
            source_col,
            F.col("__a").alias(tokens_col),
            F.col("__cap").alias("cap"),
            "take",
            F.col("__clamped").alias("clamped"),
            F.expr("(take * 10000) div greatest(__a, 1)").alias("rate_bp"),
        )
    )
    return out


def leakage_safe_split(
    df: DataFrame,
    key: str,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    splits: Mapping[str, float] | None = None,
    out_col: str = "split",
    rep_col: str | None = None,
    denominator: int = 10_000,
) -> DataFrame:
    """Split assignment that CANNOT leak duplicates across splits.

    :func:`hash_split` hashes each row's own key, so two documents with
    identical (or near-identical) content can land in different splits
    — exactly the train/eval contamination :func:`split_leakage_stats`
    audits. This variant hashes the duplicate CLUSTER's representative
    (its smallest member key) instead, so a whole cluster always lands
    in one split and the cross-split dup-pair count is zero by
    construction.

    Clusters come from ``pairs`` — the output of any near-dup pair
    operator (``minhash_pairs`` / ``simhash_pairs`` /
    ``containment_pairs``, columns ``id_a``/``id_b`` matching ``key``'s
    values) resolved through connected components so chains can't
    straddle — or, when ``pairs`` is None, from exact
    normalized-content groups (the :func:`split_leakage_stats` digest).

    Scale shape: the pairs path is one CC over the (small) dup-pair
    edge set plus one equi-join of (id, component) longs against the
    corpus — text never shuffles. The exact path is one digest-keyed
    map-combined aggregate (two longs per distinct content) plus one
    digest equi-join. Non-duplicate rows (the overwhelming majority)
    keep ``rep == key``, so their assignment is identical to
    :func:`hash_split` — adding dedup-awareness reshuffles only the
    documents that have duplicates.

    ``rep_col`` optionally exposes the representative key for audits.
    """
    from energy_pandas_spark.functions.textfns import normalized_text

    if pairs is not None:
        from energy_pandas_spark.operators.graph import connected_components

        cc = connected_components(pairs, src="id_a", dst="id_b").select(
            F.col("id").alias(key), F.col("component").alias("__cc")
        )
        tagged = (
            df.join(cc, key, "left")
            .withColumn("__rep", F.coalesce("__cc", F.col(key)))
            .drop("__cc")
        )
    else:
        # NULL text digests to NULL, which matches nothing in the join:
        # such rows fall back to their own key below (no content = no
        # dup grouping) instead of all landing in the last split
        # (hash_bucket(NULL) would fall through hash_split's when-chain)
        digest = F.md5(normalized_text(text_col)).alias("__digest")
        reps = (
            df.select(F.col(key), digest)
            .groupBy("__digest")
            .agg(F.min(key).alias("__rep"))
        )
        tagged = (
            df.withColumn("__digest", digest)
            .join(reps, "__digest", "left")
            .drop("__digest")
            .withColumn("__rep", F.coalesce("__rep", F.col(key)))
        )
    out = hash_split(tagged, "__rep", splits, out_col, denominator)
    if rep_col is not None:
        return out.withColumnRenamed("__rep", rep_col)
    return out.drop("__rep")


def weighted_mixture(
    sources: Sequence[tuple[DataFrame, float]],
    key: str,
    label_col: str | None = "source_id",
    denominator: int = 10_000,
) -> DataFrame:
    """Deterministic corpus mixture: per-source hash-sample + union.

    ``sources`` is [(frame, keep_rate), ...]; all frames must share a
    schema. Map-only per source (no shuffle); the union is a plan-level
    concat, so the mixture of N parquet sources stays one scan stage
    each."""
    out = None
    for i, (src, rate) in enumerate(sources):
        part = hash_sample(src, key, rate, denominator)
        if label_col:
            part = part.withColumn(label_col, F.lit(i))
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("weighted_mixture needs at least one source")
    return out


def epoch_order(
    df: DataFrame,
    id_col: str = "doc_id",
    epochs: int = 2,
    seed: str = "seed",
    position_col: str = "position",
) -> DataFrame:
    """Deterministic multi-epoch training-order manifest: (epoch,
    position, id) where ``position`` is a contiguous 0..n-1 per-epoch
    rank in a seed-keyed pseudo-random order — the reproducible
    "global shuffle" a training run needs (resume after preemption,
    replay a run bit-for-bit, audit which examples a checkpoint saw)
    without ever calling ``rand()``. Each epoch gets an independent
    permutation (the sort key is ``md5(seed:epoch:id)``), and the
    whole manifest is a pure function of (corpus, seed, epochs) on any
    engine — same md5-keyed scheme as :func:`hash_bucket`.

    Scale shape: NO single-partition window. Rows range-partition on
    (epoch, key), sort within partitions, and take global contiguous
    indexes from per-partition ``monotonically_increasing_id`` offset
    by broadcast cumulative partition counts (the :func:`~energy_
    pandas_spark.operators.analytics.ldc` machinery); per-epoch
    positions subtract broadcast epoch offsets. The projection is
    persisted spill-safe because ``repartitionByRange`` samples its
    boundaries — both consumers must see one layout.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    from pyspark.sql import Window

    from energy_pandas_spark.operators.analytics import global_order_index

    keyed = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch"),
        F.col(id_col),
    ).withColumn(
        "__k",
        F.md5(
            F.concat_ws(
                ":",
                F.lit(seed),
                F.col("epoch").cast("string"),
                F.col(id_col).cast("string"),
            )
        ),
    )
    # the global index over (epoch, key, id) — the shared distributed-
    # rank machinery; epoch leads the sort, so each epoch's rows form a
    # contiguous index block
    gidx = global_order_index(
        keyed,
        [F.asc("epoch"), F.asc("__k"), F.asc(id_col)],
        "__g",
    )
    # per-epoch start = cumulative count of earlier epochs (epochs-sized
    # agg over the same persisted projection the index came from)
    estarts = (
        gidx.groupBy("epoch")
        .count()
        .select(
            "epoch",
            F.sum("count")
            .over(
                Window.orderBy("epoch").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("__es"),
        )
        .fillna({"__es": 0})
    )
    return gidx.join(F.broadcast(estarts), "epoch").select(
        F.col("epoch").cast("int").alias("epoch"),
        (F.col("__g") - F.col("__es")).alias(position_col),
        F.col(id_col),
    )

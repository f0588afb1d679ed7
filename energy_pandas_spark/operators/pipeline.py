"""End-to-end corpus-cleaning composition — the canonical
training-data preprocessing pipeline, assembled from the individual
operators so the whole chain stays one Catalyst plan:

    language filter  ->  quality filter  ->  exact-dedup keep-first

Everything before the dedup window is a pure projection/filter (no
shuffle); the dedup costs exactly one hash shuffle on the content
fingerprint. At 100 TB that is the minimum possible: you cannot dedup
without co-locating equal fingerprints once.
"""

from __future__ import annotations
from energy_pandas_spark.util import track_cache

from pyspark.sql import DataFrame, Window, functions as F

from energy_pandas_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
)

__all__ = [
    "clean_corpus",
    "prepare_web_corpus",
    "prepare_training_corpus",
    "corpus_report",
    "corpus_diff",
    "corpus_diff_stats",
    "corpus_delta",
    "corpus_patch",
    "distribution_shift",
]


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.6,
    max_repetition_ratio: float = 0.4,
) -> DataFrame:
    """Filter to the wanted languages, drop low-quality docs, and keep
    one document per exact-content fingerprint (the smallest id wins —
    deterministic, engine-independent).

    All thresholds compare integer-ratio doubles (single IEEE divides),
    so the kept set is bit-identical on any engine — the pipeline has a
    full DuckDB oracle."""
    scored = quality_features(language_id(df, text_col), text_col)
    kept = scored.filter(
        F.col("lang_pred").isin(*keep_langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("repetition_ratio") <= max_repetition_ratio)
    )
    fp = fingerprint(kept, text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def prepare_web_corpus(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    repair_mojibake: bool = False,
    min_words: int = 5,
    max_link_permille: int = 330,
    min_stop_permille: int = 150,
    stopwords: tuple[str, ...] | None = None,
    min_doc_permille: int = 500,
    min_docs: int = 2,
    drop_empty: bool = True,
    templates: DataFrame | None = None,
) -> DataFrame:
    """Raw crawl HTML -> clean prose, the one-call front half of a web
    pipeline: Unicode hygiene (controls / zero-width / Unicode-space
    dirt folds; optional mojibake repair — the only Python-kernel
    stage, off by default) -> jusText block extraction (nav / footer /
    link-farm boilerplate drops, prose survives) -> per-site template
    stripping keyed on ``group_col`` (registrable domain for crawls;
    pass ``templates=`` to scrub against a persisted store instead of
    in-batch detection). Hand the result to ``clean_corpus`` /
    ``prepare_training_corpus`` for language / quality / dedup.

    Hygiene + extraction fuse into ONE zero-shuffle whole-JVM
    projection (plan-locked in tests); the template strip adds its
    digest-only detection shuffles and the per-doc rebuild. Every
    stage is individually oracle-verified, and the composition itself
    is driver-checked end to end (``web_corpus_docs``)."""
    from energy_pandas_spark.operators.extraction import (
        DEFAULT_STOPWORDS,
        extract_main_content,
    )
    from energy_pandas_spark.operators.normalize import (
        clean_text,
        fix_mojibake,
    )
    from energy_pandas_spark.operators.text import strip_templates

    out = df
    if repair_mojibake:
        out = fix_mojibake(out, text_col)
    out = clean_text(out, text_col)
    out = extract_main_content(
        out,
        text_col,
        out_col="__main",
        stopwords=DEFAULT_STOPWORDS if stopwords is None else stopwords,
        min_words=min_words,
        max_link_permille=max_link_permille,
        min_stop_permille=min_stop_permille,
    )
    out = out.withColumn(text_col, F.col("__main")).drop("__main")
    return strip_templates(
        out,
        group_col,
        text_col,
        id_col,
        min_doc_permille=min_doc_permille,
        min_docs=min_docs,
        drop_empty=drop_empty,
        templates=templates,
    )


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.6,
    max_repetition_ratio: float = 0.4,
    min_score: float = -0.05,
    span_k: int = 8,
    max_dup_frac: float = 0.5,
) -> DataFrame:
    """The full corpus-preparation pipeline in ONE lazy plan:
    language/quality filter + exact dedup (``clean_corpus``) ->
    hashed-classifier quality gate -> sub-document span-dedup filter.

    Composition keeps each stage's scale shape: the cleaning stage is
    one exchange (fingerprint co-location), the classifier one
    (doc-keyed sum), the span stats two (span-hash + doc re-agg) over
    the ALREADY-REDUCED corpus — filters run early, text is scanned
    once per hashing stage and never shuffled as raw strings. Every
    predicate compares integer-ratio doubles or dyadic sums, so the
    kept set is engine-exact end to end.

    Cache ownership: the returned plan depends on an internal persist
    of the classifier-gated frame (it feeds both the span stats and
    the final join). The CALLER owns release — materialize the result
    (write / localCheckpoint / collect), then
    ``spark.catalog.clearCache()`` or keep a long-lived pipeline
    session aware that the gated frame stays registered (the
    kneser_ney / anchor_text_summary contract)."""
    from energy_pandas_spark.operators.text import (
        classifier_score,
        span_dup_stats,
    )

    cleaned = clean_corpus(
        df,
        text_col,
        id_col,
        keep_langs,
        min_tokens,
        min_alpha_ratio,
        max_repetition_ratio,
    )
    from pyspark import StorageLevel

    from energy_pandas_spark.util import round_half_away

    # gated feeds BOTH the span-stats input and the final join's left
    # side; without a persist the whole clean+classify chain (two text
    # scans, a window, an aggregate) runs twice.
    # The gate compares the EXACT integer micro-score (BIGINT div,
    # truncation identical on any engine), never the rounded float
    # `score` column — a rounded dyadic score can land on a 6-decimal
    # half where engines' round() tie-breaks differ, and a gate riding
    # the rounded value would flip WITH the tie (the contamination-
    # threshold precedent; observed live by the sf10 probe).
    gated = (
        classifier_score(cleaned, text_col, id_col)
        .filter(F.col("score_micro") >= round_half_away(min_score * 1e6))
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    track_cache(gated)
    stats = span_dup_stats(gated, text_col, id_col, span_k)
    # same tie-safety rule as the classifier gate: compare the exact
    # integer micro-ratio, not the rounded float
    keep = stats.filter(
        F.col("dup_frac_micro") <= round_half_away(max_dup_frac * 1e6)
    )
    return gated.join(
        keep.select(
            id_col, "n_spans", "n_dup_spans", "dup_frac", "dup_frac_micro"
        ),
        id_col,
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str | None = "source",
) -> DataFrame:
    """One-row corpus data card: the summary table a dataset release
    ships with (doc/token/char volume, language & source breadth,
    exact-dup rate, empty-doc count).

    ONE aggregate pass over the corpus: token counts and the
    normalized-content digest are per-row projections at the scan;
    ``count_distinct`` on digest/lang/source rides the same hash
    aggregate (Spark expands multi-distinct into one pass over the
    mapped rows). Output is integers plus two rounded ratios, so the
    row compares exactly across engines."""
    from energy_pandas_spark.functions.textfns import normalized_text, tokens

    t = F.col(text_col)
    n_toks = F.size(tokens(text_col))
    digest = F.md5(normalized_text(text_col))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(n_toks.cast("long")), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum(F.length(t).cast("long")), F.lit(0)).alias(
            "total_chars"
        ),
        F.count_distinct(digest).alias("n_unique_contents"),
        F.coalesce(F.sum((n_toks == 0).cast("long")), F.lit(0)).alias(
            "n_empty_docs"
        ),
    ]
    if lang_col is not None:
        aggs.append(F.count_distinct(F.col(lang_col)).alias("n_langs"))
    if source_col is not None:
        aggs.append(F.count_distinct(F.col(source_col)).alias("n_sources"))
    out = df.agg(*aggs)
    return out.select(
        "*",
        F.round(
            (F.col("n_docs") - F.col("n_unique_contents"))
            / F.greatest(F.col("n_docs"), F.lit(1)),
            6,
        ).alias("dup_ratio"),
        F.round(
            F.col("total_tokens") / F.greatest(F.col("n_docs"), F.lit(1)), 6
        ).alias("avg_tokens"),
        # engine-exact integer twins (round-at-tie class)
        F.expr(
            "((n_docs - n_unique_contents) * 1000000L)"
            " div greatest(n_docs, 1L)"
        ).alias("dup_ratio_micro"),
        F.expr(
            "(total_tokens * 1000000L) div greatest(n_docs, 1L)"
        ).alias("avg_tokens_micro"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Row-level diff between two corpus snapshots: for every id in
    either snapshot, ``status`` is ``added`` (new only), ``removed``
    (old only), ``changed`` (both, normalized-content digests differ)
    or ``unchanged``. The audit primitive for continuous ingest —
    "what did this refresh actually do" — and the precondition check
    before reprocessing only the delta.

    Scale shape: each side reduces map-side to ``(id, xxhash64 of
    normalized text)`` — two longs per row — before the single
    full-outer equi-join on the id; the full text never shuffles.
    Returns (id, status). Assumes ids are unique within each snapshot
    (the documents contract); duplicate ids would fan out the join —
    run :func:`~energy_pandas_spark.operators.dedup.dedup_exact`
    first if the snapshot may contain repeated ids."""
    from energy_pandas_spark.functions.textfns import normalized_text

    def digests(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.xxhash64(normalized_text(F.coalesce(F.col(text_col), F.lit("")))).alias(
                name
            ),
        )

    j = digests(old, "__od").join(digests(new, "__nd"), id_col, "full_outer")
    status = (
        F.when(F.col("__od").isNull(), F.lit("added"))
        .when(F.col("__nd").isNull(), F.lit("removed"))
        .when(F.col("__od") == F.col("__nd"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def corpus_delta(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SHIPPABLE form of :func:`corpus_diff`: one row per
    added/changed/removed id, carrying the new snapshot's full payload
    for added/changed rows (payload columns NULL for removed rows).
    Unchanged rows — the bulk of any refresh — are absent, so a
    downstream consumer syncs a 100 TB corpus by moving only the
    delta; :func:`corpus_patch` reconstructs the new snapshot from
    ``(old, delta)`` exactly.

    Scale shape: the diff itself shuffles two longs per row; payload
    (text) then ships ONLY for the added/changed ids via one semi-ish
    inner join against ``new``. Same unique-id assumption as
    corpus_diff."""
    d = corpus_diff(old, new, text_col, id_col).filter(
        F.col("status") != "unchanged"
    )
    add_chg = d.filter(F.col("status") != "removed").join(new, id_col)
    removed = d.filter(F.col("status") == "removed")
    return add_chg.unionByName(removed, allowMissingColumns=True)


def corpus_patch(
    old: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a :func:`corpus_delta` to reconstruct the new snapshot:
    every delta id leaves ``old`` (removed and changed rows must go;
    added ids were never there), then added/changed payload rows union
    in. ``corpus_patch(old, corpus_delta(old, new)) == new`` row for
    row (delta payload columns must match ``old``'s schema).

    One anti-join on the id plus a union — old text never shuffles
    (the anti-join ships ids), delta text is delta-sized."""
    kept = old.join(delta.select(F.col(id_col)), id_col, "left_anti")
    adds = delta.filter(F.col("status") != "removed").drop("status")
    return kept.unionByName(adds.select(*old.columns))


def corpus_diff_stats(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per diff status with its count — the summary view of
    :func:`corpus_diff` (same single-join plan; the count aggregate
    combines map-side)."""
    return (
        corpus_diff(old, new, text_col, id_col)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def distribution_shift(
    old: DataFrame,
    new: DataFrame,
    col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the ``col``
    distributions of two corpus snapshots — the drift alarm for a
    refresh ("did this crawl change the length/quality profile"), the
    numeric companion to :func:`corpus_diff`'s row accounting.

    Exactness: cumulative counts are integers and the final
    ``|cum_a/n_a - cum_b/n_b|`` uses only correctly-rounded IEEE
    division/subtraction on them, so the statistic is bit-identical on
    any engine — no approximation, no sampling.

    Scale shape: one map-combined count aggregate per side keyed on
    the value, a full-outer merge of the two (value, count) tables,
    then the cumulative walk as a window over DISTINCT VALUES (the
    count-table, never per-row — the same shape as the quantile
    thresholds). NULL values are excluded (they have no place on the
    CDF). Returns one row: (ks_stat, at_value, n_old, n_new)."""
    from pyspark.sql import Window

    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("__v"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = side(old, "__ca").join(side(new, "__cb"), "__v", "full_outer").select(
        "__v",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the cumulative window runs over the distinct-value table; its
    # single-partition sort is value-cardinality sized, not corpus
    # sized (document the bound: for high-cardinality float columns,
    # quantize first)
    cdf = merged.select(
        "__v",
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    totals = merged.agg(
        F.sum("__ca").alias("n_old"), F.sum("__cb").alias("n_new")
    )
    # greatest(n, 1): an empty side degenerates to "everything
    # drifted" (ks -> 1) instead of division-by-zero infinities
    gap = F.abs(
        F.col("__cuma") / F.greatest(F.col("n_old"), F.lit(1))
        - F.col("__cumb") / F.greatest(F.col("n_new"), F.lit(1))
    )
    return (
        cdf.crossJoin(F.broadcast(totals))
        .select("__v", gap.alias("__gap"), "n_old", "n_new")
        .groupBy("n_old", "n_new")
        .agg(
            F.max("__gap").alias("ks_stat"),
            F.min_by("__v", F.struct((-F.col("__gap")).alias("g"), F.col("__v").alias("v"))).alias("at_value"),
        )
        .select(
            F.round("ks_stat", 6).alias("ks_stat"),
            "at_value",
            "n_old",
            "n_new",
        )
    )


def corpus_health(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """One-row corpus HEALTH card — the statistical companion to
    :func:`corpus_report`'s volume card: Zipf slope (is the language
    natural or templated?), source-concentration Gini (is the mass a
    few domains?), and mean per-document 3-gram novelty (how much of
    the corpus is boilerplate?). Composes :func:`~energy_pandas_spark.
    operators.text.zipf_fit`, :func:`~energy_pandas_spark.operators.
    analytics.gini_concentration` and :func:`~energy_pandas_spark.
    operators.text.ngram_novelty`; the three 1-row branches broadcast-
    cross-join into one row, and every figure is engine-exact by the
    component guarantees (integer aggregates, one final division
    each; the novelty mean is an integer floor division in per-mille).

    Returns (n_terms, total_tokens, zipf_slope, n_sources,
    source_gini, n_docs, mean_novelty_pm).
    """
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.analytics import gini_concentration
    from energy_pandas_spark.operators.text import ngram_novelty, zipf_fit

    z = zipf_fit(df, text_col).select(
        "n_terms", "total_tokens", F.col("slope").alias("zipf_slope")
    )
    g = gini_concentration(
        df.select(source_col, F.size(tokens(text_col)).alias("__w")),
        source_col,
        "__w",
    ).select(
        F.col("n_groups").alias("n_sources"), F.col("gini").alias("source_gini")
    )
    nv = (
        ngram_novelty(df, text_col, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("novelty_pm").alias("__s"),
        )
        .select(
            "n_docs",
            F.expr("__s div n_docs").alias("mean_novelty_pm"),
        )
    )
    return z.crossJoin(F.broadcast(g)).crossJoin(F.broadcast(nv))

"""Engine operators: pure functions over pyspark DataFrames.

Each operator is expressed with built-in Column expressions so Catalyst
can optimize (pushdown, partial aggregation, whole-stage codegen); Python
touches data only where genuinely unavoidable (Arrow-batched
mapInPandas/applyInPandas), never row-at-a-time.
"""

from energy_pandas_spark.operators.analytics import (
    capacity_factor,
    dedup_bursts,
    ldc,
    ldc_source,
    monthly,
    normalize,
    p_max,
    source_side,
    time_at_min,
    spearman_corr,
    gini_concentration,
    global_order_index,
    seasonal_decompose,
    seasonal_naive_backtest,
    cusum_alarms,
    chi_square_independence,
    trimmed_mean,
    cross_correlation,
    autocorrelation,
)
from energy_pandas_spark.operators.behavior import frequent_pairs, rfm_segments
from energy_pandas_spark.operators.bpe import (
    bpe_encode,
    bpe_vocabulary,
    train_bpe,
    word_counts,
)
from energy_pandas_spark.operators.unigram import (
    train_unigram,
    unigram_encode,
)
from energy_pandas_spark.operators.wordpiece import (
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocabulary,
)
from energy_pandas_spark.operators.dedup import (
    dedup_exact,
    dedup_incremental,
    edit_distance_pairs,
    embedding_neardup_pairs,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
    winnow_fingerprints,
    winnow_pairs,
    simhash_neardup_pairs,
    lsh_plan,
)
from energy_pandas_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    pagerank,
)
from energy_pandas_spark.operators.joins import (
    asof_join,
    asof_join_broadcast,
    interval_join,
    interval_join_bucketed,
    salted_join,
)
from energy_pandas_spark.operators.extraction import (
    content_blocks,
    extract_main_content,
)
from energy_pandas_spark.operators.normalize import (
    clean_text,
    fix_mojibake,
    nfc_text,
)
from energy_pandas_spark.operators.pipeline import (
    clean_corpus,
    prepare_web_corpus,
    corpus_diff,
    corpus_health,
    corpus_diff_stats,
    distribution_shift,
)
from energy_pandas_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    rrf_fuse,
    search_topk,
)
from energy_pandas_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_sample_by,
    hash_split,
    weighted_mixture,
    sample_k_per_group,
    drop_below_group_quantile,
    epoch_order,
    leakage_safe_split,
    selection_curve,
    mixture_plan,
)
from energy_pandas_spark.operators.packing import pack_sequences
from energy_pandas_spark.operators.sketches import (
    cardinality_sketches,
    cm_merge,
    cm_query,
    cm_sketch,
    merge_cardinality,
    merge_quantiles,
    quantile_sketches,
)
from energy_pandas_spark.operators.diagnostics import (
    key_skew_stats,
    top_keys,
    partition_skew_stats,
)
from energy_pandas_spark.operators.text import (
    blocklist_filter,
    template_lines,
    strip_templates,
    kneser_ney_trigram_score,
    trigram_lm_train,
    train_langid_profiles,
    langid_ngram,
    langid_ngram_selftrain,
    chunk_fixed,
    chunk_sentences,
    split_sentences,
    contamination_overlap,
    compression_ratio,
    exact_substring_dedup,
    mixed_language_stats,
    script_mix,
    pii_stats,
    html_to_text,
    perplexity_buckets,
    ngram_counts,
    redact_pii,
    repetition_stats,
    term_frequencies,
    tfidf_top_terms,
    textrank_keywords,
    related_terms,
    zipf_fit,
    ngram_novelty,
    vocab_growth,
    token_entropy,
    js_divergence_matrix,
    vocabulary,
)
from energy_pandas_spark.operators.reshape import unstack_to_periods, with_ordinal
from energy_pandas_spark.operators.urls import (
    canonical_url,
    domain_stats,
    registrable_domain,
    url_dedup,
    url_domain,
)
from energy_pandas_spark.operators.similarity import (
    cosine_topk,
    hard_negative_topk,
    ivf_topk,
    pool_embeddings,
    nearest_centroid_eval,
)
from energy_pandas_spark.operators.dedup import minhash_cluster_stats
from energy_pandas_spark.operators.windows import (
    cumulative_aggregate,
    rolling_aggregate,
)

__all__ = [
    # session-10: hygiene / boilerplate / retrieval-fusion / splits
    "prepare_web_corpus",
    "clean_text",
    "fix_mojibake",
    "nfc_text",
    "content_blocks",
    "extract_main_content",
    "template_lines",
    "strip_templates",
    "rrf_fuse",
    "leakage_safe_split",
    "selection_curve",
    "mixture_plan",
    "lsh_plan",
    "kneser_ney_trigram_score",
    "trigram_lm_train",
    "train_langid_profiles",
    "langid_ngram",
    "langid_ngram_selftrain",
    # analytics (reference parity)
    "normalize",
    "ldc",
    "ldc_source",
    "monthly",
    "p_max",
    "capacity_factor",
    "time_at_min",
    "source_side",
    "dedup_bursts",
    "spearman_corr",
    "gini_concentration",
    "global_order_index",
    "seasonal_decompose",
    "seasonal_naive_backtest",
    "cusum_alarms",
    "chi_square_independence",
    "trimmed_mean",
    "cross_correlation",
    "autocorrelation",
    "rfm_segments",
    "frequent_pairs",
    # reshape
    "unstack_to_periods",
    "with_ordinal",
    # tokenizer training (BPE / unigram-LM / WordPiece)
    "train_bpe",
    "train_unigram",
    "unigram_encode",
    "train_wordpiece",
    "wordpiece_encode",
    "wordpiece_vocabulary",
    "bpe_encode",
    "bpe_vocabulary",
    "word_counts",
    # dedup
    "dedup_exact",
    "dedup_incremental",
    "edit_distance_pairs",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "minhash_cluster_stats",
    "simhash64",
    "winnow_fingerprints",
    "winnow_pairs",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    # graph
    "connected_components",
    "dedup_clusters",
    "pagerank",
    # joins
    "asof_join",
    "asof_join_broadcast",
    "interval_join",
    "interval_join_bucketed",
    "salted_join",
    # sampling / pipeline
    "hash_bucket",
    "hash_split",
    "epoch_order",
    # scale diagnostics
    "key_skew_stats",
    "top_keys",
    "partition_skew_stats",
    "hash_sample",
    "hash_sample_by",
    "weighted_mixture",
    "sample_k_per_group",
    "drop_below_group_quantile",
    "clean_corpus",
    "corpus_health",
    "corpus_diff",
    "corpus_diff_stats",
    "distribution_shift",
    # crawl URL layer
    "canonical_url",
    "registrable_domain",
    "url_domain",
    "url_dedup",
    "domain_stats",
    # retrieval
    "build_postings",
    "search_topk",
    "bm25_topk",
    # corpus statistics / text pipeline
    "blocklist_filter",
    "chunk_fixed",
    "chunk_sentences",
    "split_sentences",
    "exact_substring_dedup",
    "compression_ratio",
    "mixed_language_stats",
    "script_mix",
    "pii_stats",
    "html_to_text",
    "perplexity_buckets",
    "term_frequencies",
    "vocabulary",
    "tfidf_top_terms",
    "textrank_keywords",
    "related_terms",
    "zipf_fit",
    "ngram_novelty",
    "vocab_growth",
    "token_entropy",
    "js_divergence_matrix",
    "ngram_counts",
    "redact_pii",
    "contamination_overlap",
    "repetition_stats",
    "pack_sequences",
    # mergeable sketches
    "cardinality_sketches",
    "merge_cardinality",
    "quantile_sketches",
    "merge_quantiles",
    "cm_sketch",
    "cm_merge",
    "cm_query",
    # similarity
    "cosine_topk",
    "hard_negative_topk",
    "ivf_topk",
    "pool_embeddings",
    "nearest_centroid_eval",
    # windows
    "rolling_aggregate",
    "cumulative_aggregate",
]

"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Each query materializes through the noop sink so the full plan executes
(collect() would be driver-bound for the large outputs; count() would
let Catalyst prune the projections we are trying to measure).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


import __spark_entry__ as entrymod

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "to_units_kelvin",
    "normalize_minmax",
    "ldc",
    "reportdata_pivot",
    "tumbling_1h",
    "sessionize_30m",
    "asof_join_hourly",
    "rolling_1h_avg",
    "salted_join_priority_revenue",
    "graph_components",
    "dedup_exact",
    "doc_token_count",
    "minhash_pairs",
    "simhash_pairs",
    "cosine_topk",
    "embedding_neardup",
    "discretize_typical_periods",
    "hash_split_dist",
    "tfidf_top3",
    "clean_corpus_docs",
    "doc_repetition",
    "pack_sequences_docs",
    "ewma_final_per_user",
    "semdedup_pairs",
    "doc_classifier_score",
    "doc_lm_score",
    "value_trend_by_type",
    "robust_scale_by_type",
    "doc_dup_spans",
    "funnel_events",
    "cohort_retention_weekly",
    "prepare_corpus_docs",
    "crosscorpus_neardup",
    "encode_docs_vocab",
    "rolling_trend_by_type",
    # variant paths: regression-track the alternates, not just the mains
    "ngram_jaccard",
    "cosine_topk_blas",
    "ivf_topk",
    "media_features",
    "benchmark_contamination",
    "stratified_sample_langs",
    # round-3 additions
    "boilerplate_docs",
    "pq_topk_embeddings",
    "token_budget_select_docs",
    "contamination_bloom_docs",
    "audio_features_media",
    "video_features_media",
    "chunk_docs_cdc",
    "temperature_mixture_docs",
    "corpus_report_docs",
    # round-3 second-wave additions
    "line_dedup_docs",
    "dsir_select_docs",
    "gopher_rules_docs",
    "bpe_merges_docs",
    "curate_corpus_docs",
    "containment_pairs_docs",
    "search_topk_docs",
    "bm25_topk_docs",
    "sample_per_source_docs",
    "corpus_diff_docs",
    "minhash_cluster_stats_docs",
    "hard_negatives_topk",
    "quantile_gate_docs",
    "blocklist_docs",
    "html_extract_docs",
    "perplexity_buckets_docs",
    "chunk_docs_fixed",
    "source_overlap_docs",
    "search_all_terms_docs",
    "embedding_dim_stats_q",
    "vocab_by_lang_docs",
    "distribution_shift_docs",
    "exact_substring_scrub_docs",
    "dedup_bursts_events",
    "mixed_language_docs",
    "compression_ratio_docs",
    "collocations_docs",
    "textrank_docs",
    "epoch_order_docs",
    "related_terms_docs",
    "zipf_docs",
    "ngram_novelty_docs",
    "score_agreement_docs",
    "source_concentration_docs",
    "winnow_fp_docs",
    "vocab_growth_docs",
    "corpus_health_docs",
    "pool_embeddings_label",
    "centroid_eval_embeddings",
    "seasonal_profile_events",
    "seasonal_backtest_events",
    "cusum_events",
    "rfm_users_events",
    "event_graph_rank",
    "token_entropy_docs",
    "frequent_pairs_events",
    "chi2_type_hour_events",
    "trimmed_mean_events",
    "ccf_click_error_events",
    "acf_hourly_events",
    "js_divergence_docs",
    "wet_roundtrip_docs",
    "image_neardup_media",
    "skew_card_events",
    "unigram_vocab_docs",
    "wordpiece_merges_docs",
    "script_mix_docs",
    "url_canonical_docs",
    "url_dedup_docs",
    "domain_stats_docs",
    "cm_term_counts_docs",
    "domain_cap_docs",
    "chunk_docs_sentences",
    # round-3 session-8 additions
    "validate_docs",
    "readability_docs",
    "link_graph_docs",
    "link_degrees_docs",
    "domain_rank_docs",
    "shard_plan_docs",
    "shard_manifest_docs",
    # round-3 session-9 additions
    "robots_rules_docs",
    "robots_gate_docs",
    "fetch_waves_docs",
    "hll_distinct_docs",
    "pack_stats_docs",
    "token_length_hist_docs",
    "kn_lm_score_docs",
    "corpus_delta_docs",
    "neardup_eval_docs",
    "span_corrupt_docs",
    "calibration_docs",
    # round-3 session-10 additions
    "clean_text_docs",
    "mojibake_stats_docs",
    "fix_mojibake_docs",
    "nfc_docs",
    "leakage_safe_split_docs",
    "rrf_fuse_docs",
    "anchor_texts_docs",
    "content_blocks_docs",
    "main_content_docs",
    "domain_templates_docs",
    "strip_templates_docs",
    "kn3_lm_score_docs",
    "selection_curve_docs",
    "web_corpus_docs",
    "langid_ngram_docs",
    "mixture_plan_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="energy-pandas-spark-bench",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + file index so the first timed query measures the
    # query, not session bootstrap
    from energy_pandas_spark.sources.readers import TABLE_NAMES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # fork the Python worker pool + Arrow serialization once, so the
    # first pandas-backed query measures the query, not worker startup
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    queries = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        try:
            # best-of-3: the box this runs on shows multi-x CPU-steal
            # spikes; the min is the real query cost
            for _ in range(3):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
                # r7 measurement fix (guide §1 honesty): release the
                # operators' internal persists after the timer stops.
                # Before this, 26 queries leaked live InMemoryRelations
                # out of their noop write, so iterations 2-3 (and any
                # later query sharing a subplan) were served warm and
                # the best-of-3 floor was a cache artifact, not the
                # query's cost. Population happens INSIDE the timed
                # region; the release is bookkeeping outside it.
                drain_tracked_caches()
            timings[name] = round(best, 3)
            # incremental per-query line on stderr: partial timings
            # survive a crash / kill, and stdout stays one-line clean
            print(f"# {name} {best:.3f}s", file=sys.stderr, flush=True)
        except Exception as exc:  # report per-query failures, keep going
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    # Full per-query payload goes to the durable file artifact
    # (BENCH.json, untracked — the driver's own run must not dirty the
    # tree; calm baselines are committed as BENCH_calm.json).
    full = {
        "metric": "headline-queries wall time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "slowest10": slowest,
        "queries": timings,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.json"), "w") as fh:
        fh.write(json.dumps(full, separators=(",", ":")) + "\n")
    # The stdout contract stays ONE JSON line, but the driver records
    # only a ~2000-char tail of it: a 150-query map overflows that
    # window and came back "parsed": null in r3 AND r4. So the stdout
    # line carries totals + the slowest-10 map only — short enough to
    # survive ANY tail capture intact and json.loads cleanly — and
    # points at BENCH.json for the full per-query map.
    compact = {
        "metric": "headline-queries wall time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": slowest,
        "queries_note": (
            f"slowest 10 of {len(timings)}; full per-query map in "
            "BENCH.json"
        ),
    }
    spark.stop()
    print(json.dumps(compact, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()

"""Plan-shape regression tests: lock in the physical-plan properties
the engine is designed around (SURVEY.md §4, the 100 TB design rules).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from energy_pandas_spark.plans import (
    broadcast_join_count,
    codegen_stage_count,
    pushed_filters,
    read_schemas,
)
from energy_pandas_spark.plans.explain import single_partition_exchanges


class TestPushdownPruning:
    def test_q1_filter_pushed_to_scan(self, spark, sf_dir):
        df = entrymod.q1_pricing_summary(spark, sf_dir)
        pushed = pushed_filters(df)
        assert any("l_shipdate" in p and "LessThanOrEqual" in p for p in pushed)

    def test_q1_column_pruning(self, spark, sf_dir):
        df = entrymod.q1_pricing_summary(spark, sf_dir)
        (cols,) = read_schemas(df)
        # 7 of 11 lineitem columns; the key/ship columns must be pruned
        assert "l_orderkey" not in cols and "l_partkey" not in cols
        assert set(cols) >= {"l_quantity", "l_extendedprice", "l_discount"}

    def test_q3_all_three_filters_pushed(self, spark, sf_dir):
        df = entrymod.q3_shipping_priority(spark, sf_dir)
        pushed = " ".join(pushed_filters(df))
        assert "l_shipdate" in pushed
        assert "o_orderdate" in pushed
        assert "c_mktsegment" in pushed

    def test_events_projection_pruned(self, spark, sf_dir):
        df = entrymod.to_units_kelvin(spark, sf_dir)
        (cols,) = read_schemas(df)
        assert set(cols) == {"event_id", "value"}  # ts/props/etc pruned


class TestJoinStrategy:
    def test_q3_broadcasts_dims(self, spark, sf_dir):
        df = entrymod.q3_shipping_priority(spark, sf_dir)
        assert broadcast_join_count(df) >= 2

    def test_q5_broadcasts_region_nation(self, spark, sf_dir):
        df = entrymod.q5_nation_revenue(spark, sf_dir)
        assert broadcast_join_count(df) >= 2

    def test_normalize_uses_broadcast_not_window(self, spark, sf_dir):
        df = entrymod.normalize_minmax(spark, sf_dir)
        # global stats attach via 1-row broadcast, not a global window
        assert broadcast_join_count(df) >= 1
        assert single_partition_exchanges(df) == 0


class TestScalabilitySmells:
    def test_ldc_no_global_window(self, spark, sf_dir):
        df = entrymod.ldc(spark, sf_dir)
        # distributed rank: the big side never passes through a
        # single-partition exchange (the tiny offsets branch may)
        from energy_pandas_spark.plans.explain import formatted_plan

        plan = formatted_plan(df)
        # the offsets window is over the per-partition counts (rows =
        # #partitions); assert the data-side path has no SinglePartition
        # by checking the plan keeps a range-partitioned exchange
        assert "rangepartitioning" in plan.lower()

    def test_capacity_factor_partial_agg(self, spark, sf_dir):
        df = entrymod.capacity_factor(spark, sf_dir)
        from energy_pandas_spark.plans.explain import formatted_plan

        plan = formatted_plan(df)
        assert "partial" in plan.lower()  # map-side partial aggregation

    def test_codegen_covers_q1(self, spark, sf_dir):
        df = entrymod.q1_pricing_summary(spark, sf_dir)
        assert codegen_stage_count(df) >= 2

    def test_minhash_path_is_arrow_kernel_with_partial_agg(self, spark, sf_dir):
        # r7 shape: the signature minima run in ONE vectorized Arrow
        # kernel (MapInPandas — the simhash64 precedent; measured
        # 1.8s -> 1.1s over the explode + 64-min hash aggregate at
        # sf0.1), never row-at-a-time Python (BatchEvalPython), and
        # the docs-sized merge aggregate after it still runs partial
        # map-side before its one shuffle.
        # eager=False keeps the LAZY verify plan inspectable (the
        # default eagerly checkpoints the result and releases caches,
        # which collapses the inspected plan to a checkpoint scan);
        # the caller owns the caches on this path — release after.
        from energy_pandas_spark.operators.dedup import minhash_lsh_pairs
        from energy_pandas_spark.plans.explain import formatted_plan
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        df = minhash_lsh_pairs(
            docs, threshold=0.5, num_hashes=64, bands=16, eager=False
        )
        plan = formatted_plan(df)
        spark.catalog.clearCache()
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python
        assert "ArrowEvalPython" not in plan  # kernel is MapInPandas,
        assert "MapInPandas" in plan  # ... the batch minima kernel
        assert "partial" in plan.lower()

    def test_simhash_signature_is_map_side(self, spark, sf_dir):
        """The signature itself must add NO exchange (it is a per-row
        computation: tokenize+hash JVM-side, bit-vote majority in one
        Arrow batch kernel — never row-at-a-time Python); the only
        shuffles in the pair query are banding + pair distinct."""
        from energy_pandas_spark.operators.dedup import simhash64
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        sig_plan = (
            simhash64(docs)._jdf.queryExecution().executedPlan().toString()
        )
        # the only permissible exchange is spread_partitions' roundrobin
        # (single-split local scans); no key shuffle belongs here
        assert "hashpartitioning" not in sig_plan
        assert "SinglePartition" not in sig_plan
        assert "BatchEvalPython" not in sig_plan  # Arrow batches only

        df = entrymod.simhash_pairs(spark, sf_dir)
        from energy_pandas_spark.plans.explain import formatted_plan

        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan

    def test_clean_corpus_is_single_shuffle(self, spark, sf_dir):
        """The whole cleaning pipeline (langid + quality + dedup) must
        cost exactly ONE exchange — the fingerprint co-location — and
        one scan; everything upstream is projection/filter."""
        from energy_pandas_spark.operators.pipeline import clean_corpus
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = clean_corpus(docs)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert plan.count("Scan parquet") == 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_rollup_is_one_scan_one_expand(self, spark, sf_dir):
        df = entrymod.rollup_sales(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        assert plan.count("Expand") == 1

    def test_partitioned_write_prunes_partitions(self, spark, sf_dir, tmp_path):
        """Hive-partitioned layout + a partition-key predicate =>
        PartitionFilters in the scan, non-matching directories never
        listed into the plan."""
        from pyspark.sql import functions as F

        from energy_pandas_spark.sources.readers import load_table

        out = str(tmp_path / "ev_by_day")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.to_date("ts")
        )
        ev.write.partitionBy("day").parquet(out)
        got = spark.read.parquet(out).filter(F.col("day") == "2024-01-03")
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        # the partition predicate must NOT appear as a data filter
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "day" in m.group(1)


class TestRound2Shapes:
    def test_q19_broadcasts_part_and_pushes_brands(self, spark, sf_dir):
        df = entrymod.q19_disjunctive_revenue(spark, sf_dir)
        assert broadcast_join_count(df) >= 1
        # the disjunction's bounding envelope on p_size reaches the scan
        pushed = " ".join(pushed_filters(df))
        assert "p_partkey" in pushed or "p_size" in pushed or "l_partkey" in pushed

    def test_q18_reduces_lineitem_before_join(self, spark, sf_dir):
        from energy_pandas_spark.plans.explain import simple_plan as executed_plan

        df = entrymod.q18_large_volume(spark, sf_dir)
        plan = executed_plan(df)
        # the quantity aggregate must sit BELOW the orders join: find
        # the first SortMergeJoin/BroadcastHashJoin and assert a
        # HashAggregate appears after it in the bottom-up formatted tree
        assert "HashAggregate" in plan

    def test_melt_is_shuffle_free_before_agg(self, spark, sf_dir):
        from energy_pandas_spark.plans.explain import simple_plan as executed_plan

        df = entrymod.melt_lineitem_measures(spark, sf_dir)
        plan = executed_plan(df)
        assert "Expand" in plan
        # exactly the final aggregate's exchange + the orderBy range
        # exchange; the unpivot itself must not shuffle
        assert plan.count("Exchange") <= 2

    def test_redact_pii_zero_shuffle(self, spark, sf_dir):
        from energy_pandas_spark.plans.explain import simple_plan as executed_plan

        from energy_pandas_spark.operators.text import redact_pii
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        plan = executed_plan(redact_pii(docs))
        assert "Exchange" not in plan

    def test_degree_days_single_shuffle(self, spark, sf_dir):
        from energy_pandas_spark.operators.analytics import degree_days
        from energy_pandas_spark.plans.explain import simple_plan as executed_plan
        from energy_pandas_spark.sources.readers import load_table

        ev = load_table(spark, sf_dir, "events")
        plan = executed_plan(degree_days(ev, "ts", "value"))
        assert plan.count("Exchange") == 1

    def test_twa_single_shuffle(self, spark, sf_dir):
        from energy_pandas_spark.operators.analytics import time_weighted_avg
        from energy_pandas_spark.plans.explain import simple_plan as executed_plan
        from energy_pandas_spark.sources.readers import load_table

        ev = load_table(spark, sf_dir, "events")
        plan = executed_plan(
            time_weighted_avg(ev, "ts", "value", by="user_id")
        )
        # lead window and keyed aggregate share the user_id exchange
        assert plan.count("Exchange") == 1

    def test_q7_pushes_shipdate_and_broadcasts_nations(self, spark, sf_dir):
        df = entrymod.q7_volume_shipping(spark, sf_dir)
        pushed = " ".join(pushed_filters(df))
        assert "l_shipdate" in pushed
        # both nation dims broadcast (plus whatever AQE promotes)
        assert broadcast_join_count(df) >= 2

    def test_q10_aggregates_before_customer_join(self, spark, sf_dir):
        from energy_pandas_spark.plans.explain import simple_plan

        df = entrymod.q10_returned_items(spark, sf_dir)
        pushed = " ".join(pushed_filters(df))
        assert "l_returnflag" in pushed and "o_orderdate" in pushed
        plan = simple_plan(df)
        # the per-customer partial aggregate must appear below the
        # customer join: formatted plans list operators bottom-up per
        # subtree, so the first HashAggregate precedes the last join
        assert "HashAggregate" in plan

    def test_q15_single_lineitem_scan(self, spark, sf_dir):
        df = entrymod.q15_top_supplier(spark, sf_dir)
        schemas = read_schemas(df)
        li_scans = [s for s in schemas if "l_suppkey" in s]
        assert len(li_scans) == 1, f"lineitem scanned {len(li_scans)}x"

    def test_q17_single_scan_single_shuffle_window(self, spark, sf_dir):
        from energy_pandas_spark.plans.explain import simple_plan

        df = entrymod.q17_small_quantity_revenue(spark, sf_dir)
        schemas = read_schemas(df)
        li_scans = [s for s in schemas if "l_quantity" in s and "l_partkey" in s]
        assert len(li_scans) == 1, f"lineitem scanned {len(li_scans)}x"
        plan = simple_plan(df)
        # window shuffle on p_partkey is the only data exchange (the
        # final global agg's single-row exchange aside)
        assert "Window" in plan

    def test_q22_anti_join_prunes_order_columns(self, spark, sf_dir):
        df = entrymod.q22_sales_opportunity(spark, sf_dir)
        schemas = read_schemas(df)
        order_scans = [s for s in schemas if "o_custkey" in s]
        # anti-join side ships only the key (+ pruned date filter col)
        assert order_scans and all(
            set(s) <= {"o_custkey", "o_orderdate"} for s in order_scans
        )


def test_boilerplate_stats_scoring_pass_is_map_only(spark):
    """After the bounded term-list collect, the per-doc scoring pass is
    a pure projection: no exchange, no join, one scan — the returned
    plan must never re-run the (doc, term) aggregate."""
    from energy_pandas_spark.operators.text import boilerplate_stats

    df = spark.createDataFrame(
        [(i, "a b c d" if i % 2 else "a a b") for i in range(8)],
        "doc_id long, text string",
    )
    plan = (
        boilerplate_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_select_token_budget_filter_is_map_only(spark):
    """After the (tiny) histogram job, the selection itself is a pure
    filter: zero exchanges in the returned plan."""
    from energy_pandas_spark.operators.sampling import select_token_budget

    df = spark.createDataFrame(
        [(i, 0.9 if i < 3 else 0.2, 10) for i in range(10)],
        "doc_id long, quality double, tok int",
    )
    out = select_token_budget(df, 35, "quality", "tok", key="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_tfidf_reuses_one_token_aggregate(spark):
    """The (doc, term) frame feeds both join sides through the persist:
    after materialization the plan reads InMemory scans, not a second
    tokenize+aggregate chain over the text column."""
    from energy_pandas_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(i, f"w{i % 3} w{i % 5} common") for i in range(20)],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=2)
    out.count()  # materialize the persist
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2


def test_contamination_bloom_single_tokenize_pass(spark):
    """Counts and probe both come from the persisted grams projection:
    one tokenize+shingle pass, then InMemory reuse."""
    from energy_pandas_spark.operators.text import contamination_overlap_bloom

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i} delta epsilon") for i in range(12)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = contamination_overlap_bloom(docs, bench, n=3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2


class TestRound3SecondWavePlans:
    def test_line_dedup_single_text_scan_via_persist(self, spark, sf_dir):
        # the exploded line rows feed winner agg AND rebuild join; both
        # consumers must hit the persisted relation, not a re-scan
        df = entrymod.line_dedup_docs(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2
        # no single-partition exchange anywhere (per-doc regroup only)
        assert single_partition_exchanges(df) == 0

    def test_dsir_weights_join_is_broadcast(self, spark, sf_dir):
        # the n_buckets-row weight table must broadcast to the token
        # stream; a shuffle join on bucket would reshuffle the corpus
        df = entrymod.dsir_select_docs(spark, sf_dir)
        assert broadcast_join_count(df) >= 2  # bucket range + weights
        assert single_partition_exchanges(df) == 0

    def test_gopher_rules_map_only(self, spark, sf_dir):
        from energy_pandas_spark.operators.text import gopher_rules
        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        df = gopher_rules(docs)
        # one map-only projection: zero exchanges, no explode-shuffle
        assert exchange_count(df) == 0

    def test_gopher_rules_codegen(self, spark, sf_dir):
        from energy_pandas_spark.operators.text import gopher_rules
        from energy_pandas_spark.plans import codegen_stage_count
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        assert codegen_stage_count(gopher_rules(docs)) >= 1

    def test_curate_corpus_single_line_dedup_execution(self, spark, sf_dir):
        # BOTH the rebuilt corpus and the line rows persist: the digest
        # winner aggregate and the final semi-join must read cached
        # relations, not re-run the gate + explode + dedup chain
        df = entrymod.curate_corpus_docs(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 3


class TestFourthWavePlans:
    def test_blocklist_and_html_zero_shuffle(self, spark, sf_dir):
        from energy_pandas_spark.operators.text import blocklist_stats, html_to_text
        from energy_pandas_spark.plans import codegen_stage_count, exchange_count
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        assert exchange_count(blocklist_stats(docs, ["dup", "slow"])) == 0
        assert exchange_count(html_to_text(docs)) == 0
        assert codegen_stage_count(html_to_text(docs)) >= 1

    def test_chunk_fixed_zero_shuffle(self, spark, sf_dir):
        from energy_pandas_spark.operators.text import chunk_fixed
        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        assert exchange_count(chunk_fixed(docs, size=16, overlap=4)) == 0

    def test_search_topk_shares_postings_and_broadcasts(self, spark, sf_dir):
        # postings persist across the df-aggregate and scoring consumers
        # (no second corpus scan) and every dimension join broadcasts.
        # eager=False keeps the LAZY plan inspectable (the default
        # eagerly materializes + releases the cache, leaving only a
        # Scan ExistingRDD behind)
        from energy_pandas_spark.operators.retrieval import (
            query_terms,
            search_topk,
        )
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        q = query_terms(spark, entrymod._SEARCH_QUERIES)
        df = search_topk(docs, q, k=10, eager=False).orderBy(
            "query_id", "rank"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2
        # live scans: postings build + the N-count (the cached relation's
        # description repeats its build scan, hence <= 3 occurrences);
        # the N-count scan reads ZERO columns (metadata-count shape)
        assert plan.count("Scan parquet") <= 3
        assert "ReadSchema: struct<>" in plan
        from energy_pandas_spark.plans import broadcast_join_count

        assert broadcast_join_count(df) >= 3  # terms, qterms, idf
        # the two-stage top-k compiles to rank pushdown, never a global sort
        assert "WindowGroupLimit" in plan
        from energy_pandas_spark.plans.explain import single_partition_exchanges

        assert single_partition_exchanges(df) <= 1  # only the 1-row N agg

    def test_quantile_gate_broadcasts_thresholds(self, spark, sf_dir):
        df = entrymod.quantile_gate_docs(spark, sf_dir)
        from energy_pandas_spark.plans import broadcast_join_count

        assert broadcast_join_count(df) >= 1
        # the per-row corpus is never globally sorted: the walk runs on
        # the (group, score) count table
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" not in plan  # no top-k needed at all

    def test_sample_per_group_two_stage(self, spark, sf_dir):
        df = entrymod.sample_per_source_docs(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # local bounded rank + global rank both push the k-limit down
        assert plan.count("WindowGroupLimit") >= 2

    def test_corpus_diff_ships_longs_only(self, spark, sf_dir):
        from energy_pandas_spark.operators.pipeline import corpus_diff
        from energy_pandas_spark.plans import read_schemas
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        df = corpus_diff(docs, docs.limit(100))
        # each side's scan reads only (doc_id, text): digests compute at
        # the scan, so columns like lang/source never load
        for cols in read_schemas(df):
            assert set(cols) <= {"doc_id", "text"}

    def test_exact_substring_scrub_shape(self, spark, sf_dir):
        # span hashes and token arrays persist (each feeds two
        # consumers); every shuffle ships longs, and the rebuild is an
        # anti-join, never a per-token membership scan
        df = entrymod.exact_substring_scrub_docs(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 3
        assert "SortMergeJoin LeftAnti" in plan or "BroadcastHashJoin" in plan


class TestFifthWavePlans:
    def test_ngram_novelty_single_scan_via_persist(self, spark, sf_dir):
        # the distinct (doc, gram) pair set persists once and feeds both
        # the df-aggregate and the join-back: exactly one InMemoryRelation,
        # no second corpus scan
        from energy_pandas_spark.operators.text import ngram_novelty
        from energy_pandas_spark.plans.explain import simple_plan
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = ngram_novelty(docs)
        plan = simple_plan(out)
        # both consumers read the cache (the FileScan lines that remain
        # are the cached relation's BUILD plan echoed inside each
        # InMemoryTableScan, not extra executed scans)
        assert plan.count("InMemoryTableScan") >= 2

    def test_epoch_order_no_single_partition_exchange(self, spark, sf_dir):
        from energy_pandas_spark.operators.sampling import epoch_order
        from energy_pandas_spark.plans.explain import single_partition_exchanges
        from energy_pandas_spark.sources.readers import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = epoch_order(docs, epochs=2, seed="s0")
        assert single_partition_exchanges(out) == 0

    def test_zipf_and_audits_no_single_partition_exchange(self, spark, sf_dir):
        from energy_pandas_spark.functions.textfns import tokens as _toks
        from energy_pandas_spark.operators.analytics import (
            gini_concentration,
            spearman_corr,
        )
        from energy_pandas_spark.operators.text import zipf_fit
        from energy_pandas_spark.plans.explain import single_partition_exchanges
        from energy_pandas_spark.sources.readers import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, sf_dir, "documents")
        assert single_partition_exchanges(zipf_fit(docs)) == 0
        scored = docs.select(
            "doc_id", "n_chars", F.size(_toks("text")).alias("nv")
        )
        assert single_partition_exchanges(
            spearman_corr(scored, "n_chars", "nv")
        ) == 0
        w = docs.select("source", F.size(_toks("text")).alias("w"))
        assert single_partition_exchanges(
            gini_concentration(w, "source", "w")
        ) == 0

    def test_pagerank_per_round_exchange_budget(self, spark):
        # one aggregate exchange per compiled round batch; the
        # ranks-edges join rides the pinned hash partitioning
        from energy_pandas_spark.operators.graph import pagerank
        from energy_pandas_spark.plans import exchange_count
        from pyspark.sql import functions as F

        edges = spark.createDataFrame(
            [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
        )
        out = pagerank(edges, n_iter=5, checkpoint_every=5)
        # final plan holds the last (up to 5) rounds at ~3 exchanges
        # per round (contribution aggregate + join plumbing); lock the
        # ceiling so a regression to per-round edge-table re-exchanges
        # (5+/round) is caught
        assert exchange_count(out) <= 18


class TestSixthWaveShapes:
    """Plan locks for the sixth-session operators: WET parse stays
    shuffle-free, the perceptual hash is a pure projection, the skew
    cards are aggregate-only, and the Hamming cross-join moves longs."""

    def test_wet_read_no_shuffle(self, spark, tmp_path):
        import gzip

        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.sources.wet import (
            encode_warc,
            read_wet_corpus,
        )

        p = tmp_path / "s.warc.wet.gz"
        p.write_bytes(gzip.compress(encode_warc(
            [("<urn:uuid:1>", "http://x/", "2024-01-01T00:00:00Z", "t")]
        )))
        # binaryFile scan -> mapInPandas -> projection: zero exchanges
        assert exchange_count(read_wet_corpus(spark, str(tmp_path))) == 0

    def test_perceptual_hash_zero_shuffle_projection(self, spark):
        from energy_pandas_spark.operators.multimodal import perceptual_hash
        from energy_pandas_spark.plans import exchange_count

        feats = spark.createDataFrame(
            [(0, [float(i) for i in range(64)])],
            "media_id long, features array<float>",
        )
        out = perceptual_hash(feats)
        assert exchange_count(out) == 0
        # and no Python workers: the signature is expression-only
        assert "Python" not in out._jdf.queryExecution().executedPlan().toString()

    def test_skew_cards_aggregate_only(self, spark, sf_dir):
        from energy_pandas_spark.operators.diagnostics import (
            key_skew_stats,
            top_keys,
        )
        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.plans.explain import formatted_plan
        from energy_pandas_spark.sources.readers import load_table

        ev = load_table(spark, sf_dir, "events")
        card = key_skew_stats(ev, "user_id")
        # key histogram exchange + final 1-row aggregate; no windows
        assert exchange_count(card) <= 2
        assert "Window" not in formatted_plan(card)
        # top-k compiles to a bounded TakeOrdered, not a global sort
        plan = formatted_plan(top_keys(ev, "user_id", k=5))
        assert "TakeOrderedAndProject" in plan

    def test_hamming_cross_ships_longs_only(self, spark):
        from energy_pandas_spark.operators.dedup import hamming_cross_hits
        from energy_pandas_spark.plans.explain import read_schemas

        new = spark.createDataFrame(
            [(0, 5), (1, 0x5555555555555555)], "media_id long, phash long"
        )
        store = spark.createDataFrame([(5,), (1024,)], "phash long")
        out = hamming_cross_hits(new, store, "media_id", "phash")
        assert sorted(r.media_id for r in out.collect()) == [0]


class TestSeventhWaveShapes:
    def test_script_mix_zero_shuffle_no_python(self, spark):
        from energy_pandas_spark.operators.text import script_mix
        from energy_pandas_spark.plans import exchange_count

        df = spark.createDataFrame(
            [(0, "hello мир")], "doc_id long, text string"
        )
        out = script_mix(df)
        assert exchange_count(out) == 0
        assert "Python" not in out._jdf.queryExecution().executedPlan().toString()

    def test_url_dedup_single_digest_shuffle_no_text(self, spark):
        from energy_pandas_spark.operators.urls import url_dedup
        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.plans.explain import read_schemas

        df = spark.createDataFrame(
            [(0, "https://a.io/x", "body text")],
            "doc_id long, url string, text string",
        )
        out = url_dedup(df)
        # one digest-keyed aggregate exchange per branch (kept +
        # union'd null side share the scan); text never reaches a scan
        assert exchange_count(out) <= 2
        for cols in read_schemas(out):
            assert "text" not in cols

    def test_cm_sketch_one_aggregate_no_window(self, spark):
        from energy_pandas_spark.operators.sketches import cm_query, cm_sketch
        from energy_pandas_spark.plans import exchange_count
        from energy_pandas_spark.plans.explain import formatted_plan

        df = spark.createDataFrame([("x",), ("y",)], "term string")
        sk = cm_sketch(df, "term")
        assert exchange_count(sk) == 1  # the (row, col) aggregate
        assert "Window" not in formatted_plan(sk)
        # probes broadcast into the sketch: no shuffle added on the
        # query side beyond the sketch's own aggregate
        qs = spark.createDataFrame([("x",)], "term string")
        est = cm_query(sk, qs, "term")
        from energy_pandas_spark.plans import broadcast_join_count

        assert broadcast_join_count(est) >= 1


def _ep(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestNinthWaveShapes:
    def test_hll_registers_one_aggregate_no_python(self, spark):
        from energy_pandas_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )
        from energy_pandas_spark.plans import exchange_count
        
        df = spark.createDataFrame([("x",), ("y",)], "v string")
        regs = hll_registers(df, "v")
        assert exchange_count(regs) == 1  # the (bucket) max aggregate
        plan = _ep(regs)
        assert "Window" not in plan and "EvalPython" not in plan
        est = hll_estimate(regs, quantize=1024)
        assert "EvalPython" not in _ep(est)

    def test_apply_robots_broadcasts_rules_no_window(self, spark):
        from energy_pandas_spark.operators.robots import (
            apply_robots,
            parse_robots,
        )
        from energy_pandas_spark.plans import broadcast_join_count
        from pyspark.sql import functions as F

        rules = parse_robots(
            spark.createDataFrame(
                [("a.io", "User-agent: *\nDisallow: /x\n")],
                "domain string, text string",
            )
        )
        pages = spark.createDataFrame(
            [(1, "https://a.io/x")], "doc_id long, url string"
        )
        out = apply_robots(pages, F.broadcast(rules))
        assert broadcast_join_count(out) >= 1
        # parse_robots' own windows partition by site key; the verdict
        # argmax is an aggregate — nothing runs on a single partition
        assert "SinglePartition" not in _ep(out)

    def test_packing_stats_two_aggregates_no_window(self, spark):
        from energy_pandas_spark.operators.packing import (
            pack_sequences,
            packing_stats,
        )
        from energy_pandas_spark.plans import exchange_count
        
        df = spark.createDataFrame(
            [(0, 10), (1, 20)], "doc_id long, n_tokens long"
        )
        packed = pack_sequences(df, "n_tokens", budget=16, n_buckets=4)
        card = packing_stats(packed, "n_tokens", budget=16)
        # bucket aggregate + the 1-row rollup; the pack window itself
        # is NOT re-executed (stats reads only bucket + token columns)
        assert exchange_count(card) <= 3
        assert "EvalPython" not in _ep(card)

    def test_length_histogram_single_aggregate(self, spark):
        from energy_pandas_spark.operators.diagnostics import length_histogram
        from energy_pandas_spark.plans import exchange_count
        
        df = spark.createDataFrame([(5,), (9,)], "v long")
        out = length_histogram(df, "v")
        assert exchange_count(out) == 1
        plan = _ep(out)
        assert "Window" not in plan and "EvalPython" not in plan

    def test_fetch_waves_bounded_rank_no_single_partition(self, spark):
        from energy_pandas_spark.operators.urls import plan_fetch_waves
        
        df = spark.createDataFrame(
            [("https://a.io/x", 1)], "url string, n_refs long"
        )
        plan = _ep(plan_fetch_waves(df))
        assert "SinglePartition" not in plan
        assert "EvalPython" not in plan

    def test_kneser_ney_no_python_no_cartesian(self, spark):
        from energy_pandas_spark.operators.text import (
            bigram_lm_train,
            kneser_ney_score,
        )
        
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "b c d")], "doc_id long, text string"
        )
        out = kneser_ney_score(df, bigram_lm_train(df))
        plan = _ep(out)
        assert "EvalPython" not in plan
        # the 1-row B total broadcasts; nothing falls back to a
        # cartesian product
        assert "CartesianProduct" not in plan


class TestTenthWaveShapes:
    def test_kn3_no_python_no_cartesian(self, spark):
        from energy_pandas_spark.operators.text import (
            kneser_ney_trigram_score,
            trigram_lm_train,
        )

        df = spark.createDataFrame(
            [(i, "a b c d e f") for i in range(4)],
            "doc_id long, text string",
        )
        out = kneser_ney_trigram_score(df, trigram_lm_train(df))
        plan = _ep(out)
        assert "EvalPython" not in plan
        assert "CartesianProduct" not in plan
        # the 1-row total is a broadcast, never a shuffled join
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    def test_template_strip_ships_no_text_through_detection(self, spark):
        from energy_pandas_spark.operators.text import strip_templates

        df = spark.createDataFrame(
            [(i, "d", f"TMPL\nbody {i}") for i in range(4)],
            "doc_id long, domain string, text string",
        )
        out = strip_templates(df, "domain")
        plan = _ep(out)
        assert "EvalPython" not in plan
        # detection dedups (group, id, digest) longs and aggregates
        # (group, digest): no `line` column inside those exchanges
        import re

        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            keys = m.group(1)
            assert "line" not in keys, keys

    def test_rrf_fuse_never_single_partition(self, spark):
        from energy_pandas_spark.operators.retrieval import rrf_fuse

        a = spark.createDataFrame(
            [(0, 1, 9, 1), (0, 2, 8, 2)],
            "query_id long, doc_id long, score_q long, rank int",
        )
        out = rrf_fuse([a, a], k=2)
        assert "SinglePartition" not in _ep(out)

    def test_extraction_and_normalize_stay_whole_jvm_map(self, spark):
        from energy_pandas_spark.operators.extraction import (
            extract_main_content,
        )
        from energy_pandas_spark.operators.normalize import clean_text
        from energy_pandas_spark.plans import exchange_count
        from pyspark.sql import functions as F

        df = spark.range(4).select(
            F.col("id").alias("doc_id"), F.lit("<p>x y</p>").alias("text")
        )
        chained = extract_main_content(clean_text(df))
        assert exchange_count(chained) == 0
        assert "EvalPython" not in _ep(chained)

    def test_selection_curve_histogram_is_map_combined(self, spark):
        from energy_pandas_spark.operators.sampling import selection_curve
        from pyspark.sql import functions as F

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), (F.col("id") % 10).alias("score")
        )
        out = selection_curve(df, "score", lo=0, hi=10, n_bins=5)
        plan = _ep(out)
        # the corpus-side aggregate is partial -> exchange -> final;
        # the only SinglePartition window runs over the n_bins rows
        assert "partial_count" in plan or "HashAggregate" in plan
        assert "EvalPython" not in plan

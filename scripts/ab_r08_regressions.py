"""Round-8 adjudication of the three r7 driver-flagged regressions
(rrf_fuse_docs 0.732, ngram_jaccard 0.765, neardup_eval_docs 0.895):
interleaved old-shape vs new-shape timing on the DECLARED queries, the
bench's exact methodology (noop sink, per-iteration cache drain,
best-of-N), at a caller-chosen core count.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/ab_r08_regressions.py \
        [--queries rrf,ngram,neardup] [--iters 5] [--rounds 2]

Variants per query (each round interleaves every variant per
iteration, so both shapes see the same steal band):

- rrf:      r6  = persist postings (no up-front count), EAGER scorers
            r7  = count postings up front, LAZY scorers sharing one
                  matched-postings InMemoryRelation (current code)
            mix = count postings up front, EAGER scorers
- ngram:    r6  = explode + 64-column min hash-aggregate _minhash_agg
            r7  = mapInPandas np.minimum.reduceat kernel (current)
- neardup:  r6  = per-doc array persist + TWO per-side sizes joins
            r7  = hybrid: sizes ride the explode (current)

Each query's variants are proven output-identical (sorted collect)
once before timing. Old shapes are reconstructed from the pre-r7 git
code against the CURRENT module helpers (same _shingle_sets, same
tokenizer), so the only difference is the shape under test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np  # noqa: F401  (parity with the module under test)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F


# ---------------------------------------------------------------- old shapes
def _old_minhash_agg(df, text_col, id_col, num_hashes, shingle_size, seed,
                     kind="word"):
    """r6 _minhash_agg: explode hashed-long shingles + 64 min aggs."""
    import energy_pandas_spark.operators.dedup as dedup

    p = (1 << 31) - 1
    coeffs = dedup._minhash_coeffs(num_hashes, seed)
    pl = F.lit(p).cast("long")
    exploded = dedup._shingle_sets(
        df, text_col, id_col, shingle_size, kind
    ).select(
        id_col,
        F.explode(
            F.transform("__sh", lambda s: F.pmod(F.xxhash64(s), pl))
        ).alias("__h"),
    )
    aggs = [
        F.min(
            F.pmod(F.col("__h") * F.lit(a).cast("long") + F.lit(b).cast("long"), pl)
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def _old_neardup_eval(df, pairs, text_col="text", id_col="doc_id",
                      truth_threshold=(1, 2), shingle_size=3,
                      sample_permille=150, denominator=10_000, eager=True):
    """r6 neardup_eval: array persist + two per-side sizes joins."""
    import energy_pandas_spark.operators.dedup as dedup
    from energy_pandas_spark.operators.sampling import hash_bucket

    tn, td = truth_threshold
    cut = (sample_permille * denominator) // 1000
    sample = df.filter(hash_bucket(id_col, denominator) < cut)
    sh = (
        dedup._shingle_sets(dedup._spread(sample), text_col, id_col, shingle_size)
        .withColumn("__n", F.size("__sh").cast("long"))
        .persist()
    )
    ex = sh.select(F.col(id_col).alias("__id"), F.explode("__sh").alias("__s"))
    co = (
        ex.select(F.col("__id").alias("id_a"), "__s")
        .join(ex.select(F.col("__id").alias("id_b"), "__s"), "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    sizes_a = sh.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    sizes_b = sh.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    uni = F.col("__na") + F.col("__nb") - F.col("__i")
    true_pairs = (
        co.join(sizes_a, "id_a")
        .join(sizes_b, "id_b")
        .filter(F.lit(td) * F.col("__i") >= F.lit(tn) * uni)
        .select("id_a", "id_b")
    )
    ids = sample.select(F.col(id_col))
    pred = (
        pairs.select("id_a", "id_b")
        .join(ids.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi")
        .join(ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi")
    )
    m = pred.withColumn("__p", F.lit(1)).join(
        true_pairs.withColumn("__t", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    counts = m.agg(
        F.coalesce(F.sum("__p"), F.lit(0)).cast("long").alias("n_pred_pairs"),
        F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_true_pairs"),
        F.coalesce(
            F.sum((F.col("__p").isNotNull() & F.col("__t").isNotNull()).cast("int")),
            F.lit(0),
        )
        .cast("long")
        .alias("tp"),
    )
    n_sample = sample.agg(F.count(F.lit(1)).alias("n_sample"))
    card = (
        counts.join(F.broadcast(n_sample))
        .withColumns(
            {
                "fp": (F.col("n_pred_pairs") - F.col("tp")).cast("long"),
                "fn": (F.col("n_true_pairs") - F.col("tp")).cast("long"),
                "precision_permille": F.when(
                    F.col("n_pred_pairs") == 0, F.lit(1000).cast("long")
                ).otherwise(F.expr("(1000 * tp) div n_pred_pairs")),
                "recall_permille": F.when(
                    F.col("n_true_pairs") == 0, F.lit(1000).cast("long")
                ).otherwise(F.expr("(1000 * tp) div n_true_pairs")),
            }
        )
        .select(
            "n_sample", "n_true_pairs", "n_pred_pairs", "tp", "fp", "fn",
            "precision_permille", "recall_permille",
        )
    )
    return dedup._release_caches(card, sh) if eager else dedup._attach_caches(card, sh)


def _rrf_variant(eager_scorers: bool, precount: bool):
    def run(spark, sf_dir):
        entrymod._prep(spark)
        from energy_pandas_spark.operators.retrieval import (
            bm25_topk, build_postings, query_terms, rrf_fuse, search_topk,
        )
        from energy_pandas_spark.util import release_caches

        docs = entrymod._t(spark, sf_dir, "documents")
        q = query_terms(spark, entrymod._SEARCH_QUERIES)
        postings = build_postings(docs).persist()
        if precount:
            postings.count()
        tf_ranked = search_topk(docs, q, k=10, postings=postings,
                                eager=eager_scorers)
        bm_ranked = bm25_topk(docs, q, k=10, postings=postings,
                              eager=eager_scorers)
        fused = rrf_fuse([tf_ranked, bm_ranked], k=5)
        out = fused.orderBy("query_id", "rank").localCheckpoint(eager=True)
        if not eager_scorers:
            release_caches(tf_ranked)
            release_caches(bm_ranked)
        postings.unpersist()
        return out

    return run


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="rrf,ngram,neardup")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--skip-equality", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches
    import energy_pandas_spark.operators.dedup as dedup

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="ab-r08-regressions",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    from energy_pandas_spark.sources.readers import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    queries = entrymod.queries()

    def patched(attr, repl, fn):
        orig = getattr(dedup, attr)

        def run(spark, sf_dir):
            setattr(dedup, attr, repl)
            try:
                return fn(spark, sf_dir)
            finally:
                setattr(dedup, attr, orig)

        return run

    plans: dict[str, list[tuple[str, object]]] = {}
    if "rrf" in args.queries:
        plans["rrf_fuse_docs"] = [
            ("r6_eager_nocount", _rrf_variant(True, False)),
            ("r7_lazy_count", queries["rrf_fuse_docs"]),
            ("mix_eager_count", _rrf_variant(True, True)),
        ]
    if "ngram" in args.queries:
        plans["ngram_jaccard"] = [
            ("r6_explode_agg", patched("_minhash_agg", _old_minhash_agg,
                                       queries["ngram_jaccard"])),
            ("r7_arrow_kernel", queries["ngram_jaccard"]),
        ]
    if "neardup" in args.queries:
        plans["neardup_eval_docs"] = [
            ("r6_sizes_joins", patched("neardup_eval", _old_neardup_eval,
                                       queries["neardup_eval_docs"])),
            ("r7_sizes_on_explode", queries["neardup_eval_docs"]),
        ]

    # one-time equality proof per query across variants
    if not args.skip_equality:
        for qname, variants in plans.items():
            ref = None
            for label, fn in variants:
                rows = sorted(
                    tuple(r) for r in fn(spark, sf_dir).collect()
                )
                drain_tracked_caches()
                spark.catalog.clearCache()
                if ref is None:
                    ref = rows
                elif rows != ref:
                    print(f"EQUALITY FAIL {qname} variant {label}",
                          file=sys.stderr)
                    sys.exit(2)
            print(f"# equality ok {qname} ({len(ref)} rows, "
                  f"{len(variants)} variants)", file=sys.stderr, flush=True)

    results: dict[str, dict[str, list[float]]] = {
        q: {label: [] for label, _ in vs} for q, vs in plans.items()
    }
    for rnd in range(args.rounds):
        for qname, variants in plans.items():
            for it in range(args.iters):
                for label, fn in variants:
                    t0 = time.perf_counter()
                    df = fn(spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    el = time.perf_counter() - t0
                    drain_tracked_caches()
                    spark.catalog.clearCache()
                    results[qname][label].append(round(el, 3))
            line = {q: {l: min(ts) for l, ts in d.items() if ts}
                    for q, d in results.items()}
            print(f"# round {rnd} {qname}: {json.dumps(line[qname])}",
                  file=sys.stderr, flush=True)

    summary = {
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "iters": args.iters,
        "rounds": args.rounds,
        "raw": results,
        "best": {q: {l: min(ts) for l, ts in d.items()}
                 for q, d in results.items()},
    }
    spark.stop()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

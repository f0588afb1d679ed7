"""Deduplication operators for training-data pipelines, designed for
100 TB corpora:

- ``dedup_exact``: hash-groupBy on a normalized-content digest. One
  shuffle on the digest; map-side partial aggregation; no text moves
  after the hash is computed at the scan.
- ``minhash_lsh``: shingle -> 64-permutation MinHash signature -> banded
  LSH bucketing -> candidate pairs verified with true Jaccard. Each
  shingle is hashed once (xxhash64, JVM, inside the array); the
  permutation minima are a vectorized map-side Arrow kernel (the
  ``simhash64`` shape), so the signature shuffle carries 64 longs per
  document. Candidates come
  from the banded (band, bucket) self-join. Bucket skew is bounded by
  ``max_bucket`` (oversized buckets are dropped, the usual guard
  against degenerate shingles).
- ``simhash64``: 64-bit SimHash per document — tokens hash JVM-side
  (xxhash64 in one codegen'd projection), then a map-side Arrow
  kernel (``mapInPandas``) takes the per-document bit-vote majorities
  with vectorized ``unpackbits``/``reduceat`` — ZERO shuffle; near-dup
  candidates from 4x16-bit band buckets verified by Hamming distance
  (``bit_count`` of xor).
- ``ngram_jaccard_pairs``: all-pairs n-gram Jaccard within LSH buckets
  (never a full cross join).
- ``embedding_neardup``: random-hyperplane (sign) LSH over an embedding
  column, verified by exact cosine — both as expressions.
"""

from __future__ import annotations
from energy_pandas_spark.util import track_cache

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from energy_pandas_spark.functions.textfns import (
    jaccard,
    normalized_text,
    tokens,
    word_shingles_of_tokens,
)
from energy_pandas_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "dedup_exact",
    "dedup_keep_best",
    "dedup_incremental",
    "minhash_signature",
    "minhash_lsh_candidates",
    "minhash_lsh_pairs",
    "lsh_plan",
    "minhash_dedup",
    "minhash_cluster_stats",
    "minhash_dedup_keep_best",
    "containment_pairs",
    "containment_dedup",
    "edit_distance_pairs",
    "simhash64",
    "simhash_neardup_pairs",
    "hamming_neardup_pairs",
    "hamming_cross_hits",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "assign_semantic_clusters",
    "semantic_dedup_pairs",
    "semantic_dedup",
    "crosscorpus_neardup_pairs",
    "build_band_store",
    "load_band_store",
    "neardup_eval",
]


from energy_pandas_spark.util import spread_partitions as _spread


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on the normalized-text digest. Returns one surviving
    id per content group plus the duplicate count — the scan computes
    md5 inline, the single shuffle is on the digest."""
    digest = F.md5(normalized_text(text_col)).alias("digest")
    keep_fn = F.min if keep == "min" else F.max
    return (
        df.select(digest, F.col(id_col))
        .groupBy("digest")
        .agg(
            keep_fn(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_keep_best(
    df: DataFrame,
    quality_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup that keeps the BEST copy per content group instead
    of the first: survivor = argmax by (quality, -id) — quality-aware
    canonicalization (mirrors of the same page differ in boilerplate
    stripping; keep the cleanest). Single digest shuffle via
    ``max_by`` on a struct ordering (quality desc, id asc), no window,
    no second pass. Ties on quality break to the LOWEST id so the
    result is total-order deterministic."""
    digest = F.md5(normalized_text(text_col)).alias("digest")
    # struct ordering: max quality first; among equals, max(-id) = min id
    best = F.max_by(
        F.col(id_col),
        F.struct(F.col(quality_col).alias("q"), (-F.col(id_col)).alias("nid")),
    )
    return (
        df.select(digest, F.col(id_col), F.col(quality_col))
        .groupBy("digest")
        .agg(
            best.alias(id_col),
            F.max(quality_col).alias(quality_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_incremental(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    store_digest_col: str = "digest",
    store_bloom: "np.ndarray | None" = None,
    bloom_k: int = 4,
) -> DataFrame:
    """Incremental exact dedup: keep the new documents whose normalized
    content digest appears neither in the historical ``store`` (a frame
    with a digest column, e.g. the running fingerprint table of an
    ingest pipeline) nor earlier within this batch (smallest id wins).

    Scale shape: one left_anti join against the store (shuffle or
    broadcast by store size — Catalyst/AQE decides) plus the same
    single-digest-shuffle keep-first as :func:`dedup_exact`. The store
    side only ships its digest column; document text never moves.

    ``store_bloom`` (a bit table from
    ``functions.bloom.build_bloom_distributed`` over the store's
    xxhash64'd digests) adds a map-side fast path: definite
    non-members skip the anti-join entirely, so the join probe shrinks
    to true dups + the bloom's false positives. No false negatives ->
    result-identical (tested)."""
    digested = new_docs.withColumn("__digest", F.md5(normalized_text(text_col)))
    store_digests = store.select(
        F.col(store_digest_col).alias("__digest")
    ).distinct()
    if store_bloom is not None:
        from energy_pandas_spark.functions.bloom import bloom_flag

        flagged = bloom_flag(
            digested.withColumn("__bh", F.xxhash64("__digest")),
            "__bh",
            store_bloom,
            bloom_k,
        )
        definite_new = flagged.filter(~F.col("__maybe")).drop("__bh", "__maybe")
        verified_new = (
            flagged.filter(F.col("__maybe"))
            .drop("__bh", "__maybe")
            .join(store_digests, "__digest", "left_anti")
        )
        fresh = definite_new.unionByName(verified_new)
    else:
        fresh = digested.join(store_digests, "__digest", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("__digest").orderBy(F.asc(id_col))
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__digest", store_digest_col)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    p = (1 << 31) - 1  # Mersenne prime; keeps a*h+b within long under ANSI
    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, p)), int(rng.integers(0, p))) for _ in range(num_hashes)
    ]


def _shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int,
    kind: str = "word",
) -> DataFrame:
    """(id, __sh distinct-shingle array). The token/normalized-text
    projection materializes BEFORE the shingle transform so the
    tokenizing split / normalization regex runs once per document, not
    once per shingle position (O(len²) otherwise)."""
    if kind == "char":
        from energy_pandas_spark.functions.textfns import char_shingles_of_text

        norm = df.select(F.col(id_col), normalized_text(text_col).alias("__norm"))
        sh = char_shingles_of_text("__norm", shingle_size)
    else:
        norm = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        sh = word_shingles_of_tokens("__toks", shingle_size)
    return norm.select(F.col(id_col), F.array_distinct(sh).alias("__sh"))


def _minhash_agg(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_size: int,
    seed: int,
    kind: str = "word",
) -> DataFrame:
    """(id, m0..m{N-1}) permutation minima: JVM in-array hashing + a
    map-side Arrow kernel, the ``simhash64`` shape.

    Each shingle is hashed ONCE (``xxhash64`` + ``pmod``, JVM, inside
    the array — exploding the shingle STRINGS materialized a
    corpus-of-text-sized row stream that measured 10x the long
    arithmetic, the r6 fix). The N per-document permutation minima
    ``min(a_i*h + b_i mod p)`` are then taken by a vectorized
    ``mapInPandas`` kernel (``np.minimum.reduceat`` over the batch's
    flattened hash stream): a document's shingles all live in its own
    row, so the minima are a per-row computation and the kernel runs
    entirely in the scan stage. This replaced an explode + 64-column
    min hash-aggregate: that shape paid 64 codegen'd affine updates
    plus a hash-map probe PER SHINGLE (measured best-of-5 at sf0.1:
    1.81-1.88s -> 1.07-1.32s for the signature aggregate, outputs
    row-for-row identical; int64 affine arithmetic is exact in numpy —
    a,h < 2^31 so a*h+b < 2^63). The trailing ``groupBy(id)`` keeps the
    old aggregate's duplicate-id merge semantics and costs one
    docs-sized exchange of N longs — exactly the shuffle the old
    aggregate's final merge already paid, so the shape still scales
    with the scan at 100 TB."""
    p = (1 << 31) - 1
    coeffs = _minhash_coeffs(num_hashes, seed)
    pl = F.lit(p).cast("long")
    hashed = _shingle_sets(df, text_col, id_col, shingle_size, kind).select(
        id_col,
        F.transform("__sh", lambda s: F.pmod(F.xxhash64(s), pl)).alias("__hs"),
    )
    a_arr = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_arr = np.array([b for _, b in coeffs], dtype=np.int64)
    cols = [f"m{i}" for i in range(num_hashes)]

    def mins(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = (
                pdf["__hs"]
                .map(lambda h: 0 if h is None else len(h))
                .to_numpy(dtype=np.int64)
            )
            nz = lens > 0
            n = int(nz.sum())
            if n == 0:
                # empty/NULL shingle sets produce no signature row —
                # the explode path's semantics (no rows to aggregate)
                yield pd.DataFrame(
                    {id_col: pdf[id_col][:0], **{c: [] for c in cols}}
                )
                continue
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in pdf["__hs"][nz]]
            )
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            out = np.empty((n, num_hashes), dtype=np.int64)
            for i in range(num_hashes):
                out[:, i] = np.minimum.reduceat(
                    (flat * a_arr[i] + b_arr[i]) % p, offsets
                )
            data = {id_col: pdf[id_col].to_numpy()[nz]}
            for i, c in enumerate(cols):
                data[c] = out[:, i]
            yield pd.DataFrame(data)

    id_type = dict(hashed.dtypes)[id_col]
    schema = ", ".join([f"{id_col} {id_type}"] + [f"{c} long" for c in cols])
    return hashed.mapInPandas(mins, schema=schema).groupBy(id_col).agg(
        *[F.min(c).alias(c) for c in cols]
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 3,
    out_col: str = "sig",
    id_col: str = "doc_id",
    seed: int = 13,
) -> DataFrame:
    """N-permutation MinHash signature as ``array<bigint>`` joined back
    onto the input by ``id_col`` (documents with no shingles get an
    empty array)."""
    mins = _minhash_agg(df, text_col, id_col, num_hashes, shingle_size, seed)
    sig = mins.select(
        id_col, F.array(*[f"m{i}" for i in range(num_hashes)]).alias(out_col)
    )
    return df.join(sig, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<bigint>"))
    )


def _banded_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_size: int,
    seed: int,
    kind: str = "word",
) -> DataFrame:
    """(id, band, bucket) stream: signature aggregate -> band explode.
    The bucket is an xxhash64 of the band's signature rows, so the
    banding shuffle carries (id, int, long) only."""
    rows_per_band = num_hashes // bands
    mins = _minhash_agg(
        _spread(df), text_col, id_col, num_hashes, shingle_size, seed, kind
    )
    return mins.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_plan(
    threshold: float,
    max_miss: float = 1e-4,
    max_hashes: int = 512,
    min_rows: int = 2,
    fp_at: float | None = None,
    max_fp: float | None = None,
) -> dict:
    """Principled MinHash-LSH banding: the cheapest ``(bands, rows)``
    whose miss probability ``(1 - threshold**rows)**bands`` at the
    target Jaccard ``threshold`` is at most ``max_miss`` — fewest
    total hashes first, then fewest bands (the banded explode ships
    ``bands`` rows per doc, so bands ARE the shuffle volume).

    This knob has burned real configurations: 16 bands x 4 rows is
    sound at j≈0.9 (miss 4e-8) but misses 36% of true pairs at
    j = 0.5 — the exact mistake a round-2 advisory found in
    crosscorpus_neardup. Plan the banding from the threshold instead
    of copying another query's.

    ``min_rows`` (default 2) bars the degenerate rows=1 family —
    bucketing RAW minhashes makes almost every mildly-similar pair a
    candidate, which is "cheap" in hashes and ruinous in candidate
    verification. Pass ``fp_at``/``max_fp`` to additionally cap the
    candidate probability at a lower similarity (the precision side of
    the S-curve); sharp curves at low thresholds are exponentially
    expensive, so the planner raising ValueError IS the honest answer
    there — relax one constraint deliberately rather than silently.

    Returns ``{"bands", "rows", "num_hashes", "miss_at_threshold",
    "candidate_rate_at"}`` where ``candidate_rate_at`` maps a few
    lower similarities to their candidate probability — the
    shuffle-volume tax of the chosen plan. Driver-side scalar
    arithmetic; raises when no plan within ``max_hashes`` satisfies
    the constraints."""
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if not 0 < max_miss < 1:
        raise ValueError(f"max_miss must be in (0, 1), got {max_miss}")
    if max_hashes < 1 or min_rows < 1:
        raise ValueError("max_hashes and min_rows must be >= 1")
    if (fp_at is None) != (max_fp is None):
        raise ValueError("fp_at and max_fp must be given together")
    if fp_at is not None and not 0 < fp_at < threshold:
        raise ValueError("fp_at must be in (0, threshold)")
    for total in range(min_rows, max_hashes + 1):
        found = None
        for rows in range(min_rows, total + 1):
            if total % rows:
                continue
            bands = total // rows
            if (1.0 - threshold**rows) ** bands > max_miss:
                continue
            if (
                max_fp is not None
                and 1.0 - (1.0 - fp_at**rows) ** bands > max_fp
            ):
                continue
            if found is None or bands < found[0]:
                found = (bands, rows)
        if found is not None:
            bands, rows = found
            probe = {
                round(s, 3): round(1.0 - (1.0 - s**rows) ** bands, 6)
                for s in (threshold / 2, threshold * 0.8, threshold)
            }
            return {
                "bands": bands,
                "rows": rows,
                "num_hashes": total,
                "miss_at_threshold": (1.0 - threshold**rows) ** bands,
                "candidate_rate_at": probe,
            }
    raise ValueError(
        f"no (bands, rows) within {max_hashes} hashes satisfies "
        f"miss <= {max_miss} at threshold {threshold}"
        + (f" with fp <= {max_fp} at {fp_at}" if max_fp is not None else "")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket: int = 1000,
    kind: str = "word",
    seed: int = 13,
) -> DataFrame:
    """PERSISTED candidate pair set (id_a < id_b) from banded MinHash
    LSH — the shared candidate generator behind Jaccard near-dup,
    n-gram Jaccard, and edit-distance fuzzy matching (each applies its
    own verify predicate).

    Plan shape: scan -> signature expressions -> explode bands (xB) ->
    ONE shuffle on (band, bucket-hash) with bucket-grouped double
    explode (no self-join) -> pair distinct. Persisted because callers
    reference it multiple times (id extraction + per-side verify
    joins); candidates are tiny relative to the corpus.

    Cache ownership: the returned frame is persisted and the CALLER
    owns release (``.unpersist()`` after the verify materializes).
    The in-module verify pipelines (``minhash_lsh_pairs`` etc.)
    release it on their default ``eager=True`` path."""
    banded = _banded_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_size, seed, kind
    )

    # bucket-grouped pair expansion: ONE shuffle on (band, bucket),
    # pairs generated by a double explode inside each bucket — no
    # self-join, and the size filter doubles as the degenerate-bucket
    # guard (all-identical boilerplate)
    bucketed = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cand = (
        bucketed.select(F.posexplode("ids").alias("__pos", "__a"), F.col("ids"))
        .select(
            F.col("__a"),
            F.explode(
                F.slice("ids", F.col("__pos") + F.lit(2), F.size("ids"))
            ).alias("__b"),
        )
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
        )
        .distinct()
    )
    # persisted so the whole scan->signature->band pipeline above runs
    # ONCE however many times callers reference the candidates.
    # Candidates are tiny relative to the corpus (bounded by
    # max_bucket), so the default MEMORY_AND_DISK level is safe at any
    # scale, and lineage stays intact for fault recovery.
    return track_cache(cand.persist())


def _restricted_to_candidates(
    df: DataFrame, cand: DataFrame, id_col: str
) -> DataFrame:
    """Semi-join the corpus down to documents that appear in a
    candidate pair — so per-document verify projections (shingling,
    normalization) run only for the tiny candidate set, never the full
    corpus."""
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    return df.join(cand_ids, id_col, "left_semi")


def _release_caches(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """retrieval._finish's cache-hygiene pattern for the dedup verify
    pipelines: materialize the pairs-sized result eagerly
    (localCheckpoint truncates the lineage off the persisted inputs)
    and RELEASE the caches — a leaked persist pins executor memory for
    the session AND substitutes into any later query whose logical
    plan matches (Spark swaps in the InMemoryRelation), which made
    full-registry plan audits registry-order-dependent (ADVICE r5).

    Fault-tolerance caveat (ADVICE r6): ``localCheckpoint`` stores the
    blocks on executors and TRUNCATES lineage, so on a real cluster
    with dynamic allocation / executor loss the checkpointed result is
    unrecoverable — the job fails instead of recomputing. That is a
    deliberate trade here: the checkpointed frame is the PAIRS-sized
    verify output (bounded by ``max_bucket``, orders of magnitude
    smaller than the corpus), executed at call time, so the exposure
    window is the caller's immediate consumption, not a long-lived
    plan. Pipelines that need full lineage-based recovery (or lazy
    composition) should pass ``eager=False`` and release the internal
    persists themselves via :func:`release_caches`."""
    out = out.localCheckpoint(eager=True)
    for c in caches:
        c.unpersist()
    return out


# ``eager=False`` twin of _release_caches + the caller-side release
# handle (ADVICE r6) — canonical implementations live in util so
# retrieval/text share them without import cycles; re-exported here
# because the dedup pipelines are the primary eager= surface.
from energy_pandas_spark.util import (  # noqa: E402
    attach_caches as _attach_caches,
    release_caches,
)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    eager: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with true
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b
    and jaccard >= threshold. The verify re-joins shingle arrays by id
    for candidate documents only (see ``_restricted_to_candidates``)
    instead of carrying shingles through the band explosion.

    ``eager=True`` (default) materializes the verified pairs and
    releases the internal shingle/candidate caches before returning;
    ``eager=False`` returns the lazy plan — the caller then owns
    unpersisting (plan-inspection/tests use this)."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_size, max_bucket
    )
    sh = _shingle_sets(
        _restricted_to_candidates(df, cand, id_col),
        text_col, id_col, shingle_size,
    )
    # exact integer verify: shingle arrays are distinct sets, so
    # intersection/union sizes are exact longs. The threshold test and
    # the emitted similarity both run in pure integer arithmetic —
    # `round(i/u, 6) >= t` is NOT engine-portable when i/u lands on an
    # exact decimal half (round-at-tie, the r5 sf1 class), and a tie at
    # the threshold would flip pair MEMBERSHIP, not just a value.
    t_micro = int(round(threshold * 1_000_000))
    # the candidate shingle table feeds BOTH verify sides — persist and
    # materialize EAGERLY. Besides running the semi-join + shingling
    # once instead of twice, the materialized cache gives Catalyst the
    # TRUE size of this array-payload side: its static estimate through
    # the lazy semi-join is low enough that at 100x bench scale it
    # compiled both verify joins as driver-side BROADCASTS of multi-KB
    # array rows (the sf10 probe's broadcast OOM in
    # minhash_keep_best_drop). With accurate stats the planner
    # broadcasts only when the candidate set genuinely fits and
    # shuffle-joins at scale.
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    sh.count()
    verified = (
        cand.join(
            sh.withColumnsRenamed({id_col: "id_a", "__sh": "sh_a"}),
            "id_a",
        )
        .join(
            sh.withColumnsRenamed({id_col: "id_b", "__sh": "sh_b"}),
            "id_b",
        )
        .withColumn(
            "__i", F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        )
        .withColumn("__u", F.size(F.array_union("sh_a", "sh_b")).cast("long"))
        .filter(
            F.when(
                F.col("__u") == 0, F.lit(0) >= F.lit(t_micro)
            ).otherwise(
                F.col("__i") * F.lit(1_000_000)
                >= F.lit(t_micro) * F.col("__u")
            )
        )
        .withColumn(
            "jaccard",
            F.when(F.col("__u") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("__i") / F.col("__u"), 6)
            ),
        )
        .withColumn(
            "jaccard_micro",
            F.when(F.col("__u") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("(__i * 1000000L) div __u")
            ),
        )
        .select("id_a", "id_b", "jaccard", "jaccard_micro")
    )
    return (
        _release_caches(verified, sh, cand)
        if eager
        else _attach_caches(verified, sh, cand)
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 10,
    prefix_len: int | None = None,
    method: str = "lsh",
    shingle_size: int = 3,
    eager: bool = True,
    **lsh_kwargs,
) -> DataFrame:
    """Fuzzy string matching: pairs whose normalized texts are within
    ``max_distance`` Levenshtein edits (optionally comparing only the
    first ``prefix_len`` chars — the title/entity-resolution setup).

    method='lsh' (the scale path) draws candidates from char-shingle
    MinHash LSH and verifies with ``levenshtein`` — recall follows the
    LSH guarantee on shingle Jaccard, which small-edit pairs satisfy.
    method='exact' brute-forces all id_a < id_b pairs (quadratic;
    bounded subsets only) — the oracle-checkable reference semantics."""
    key = normalized_text(text_col)
    if prefix_len is not None:
        key = F.substring(key, 1, prefix_len)
    keyed = df.select(F.col(id_col), key.alias("__k"))
    cand = None
    if method == "exact":
        a = keyed.select(F.col(id_col).alias("id_a"), F.col("__k").alias("k_a"))
        b = keyed.select(F.col(id_col).alias("id_b"), F.col("__k").alias("k_b"))
        paired = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        cand = minhash_lsh_candidates(
            keyed, "__k", id_col, shingle_size=shingle_size, kind="char",
            **lsh_kwargs,
        )
        kk = _restricted_to_candidates(keyed, cand, id_col)
        paired = cand.join(
            kk.select(F.col(id_col).alias("id_a"), F.col("__k").alias("k_a")),
            "id_a",
        ).join(
            kk.select(F.col(id_col).alias("id_b"), F.col("__k").alias("k_b")),
            "id_b",
        )
    # banded Levenshtein: the threshold arg short-circuits the DP once
    # the running distance exceeds max_distance — O(threshold * len)
    # per pair instead of O(len^2), returning -1 for pairs past the
    # band. Output-identical to the unbounded form for every kept pair
    # (distances <= threshold are exact), and the dominant cost of the
    # exact method's all-pairs verify at scale (r7 sf10: a 1.25e9-pair
    # comparison spent most of its runtime in full 50x50 DP tables
    # whose distances were then filtered away).
    dist = F.levenshtein("k_a", "k_b", int(max_distance))
    out = (
        paired.withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select("id_a", "id_b", "distance")
    )
    if cand is not None:
        out = (
            _release_caches(out, cand)
            if eager
            else _attach_caches(out, cand)
        )
    return out


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Documents to DROP: connected components over the verified
    near-dup pairs (operators.graph), keeping the smallest id per
    cluster — correct on transitive chains where greedy pair-dropping
    over-keeps."""
    from energy_pandas_spark.operators.graph import dedup_clusters

    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    clusters = dedup_clusters(pairs)
    return clusters.filter(~F.col("is_survivor")).select(
        F.col("doc_id").alias(id_col)
    )


def minhash_cluster_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Near-dup cluster-size histogram: (cluster_size, n_clusters,
    n_docs) for every size, singletons included — the dedup
    observability view ("is my corpus 2% pairwise dups or one
    million-doc boilerplate blob?") that decides whether plain CC
    label propagation or the large-star variant is the right dedup
    path, and what dedup will actually delete.

    Cost is the same LSH pairs + connected components as
    :func:`minhash_dedup`; the histogram adds two vocab-sized
    aggregates and a 1-row singleton count (total docs minus clustered
    docs) — no extra corpus scan beyond the count."""
    from energy_pandas_spark.operators.graph import dedup_clusters

    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    clusters = dedup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
    singletons = (
        df.agg(F.count(F.lit(1)).alias("__t"))
        .crossJoin(F.broadcast(clusters.agg(F.count(F.lit(1)).alias("__c"))))
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("__t") - F.col("__c")).alias("n_clusters"),
        )
        .filter(F.col("n_clusters") > 0)
    )
    return (
        hist.unionByName(singletons)
        .withColumn("n_docs", F.col("cluster_size") * F.col("n_clusters"))
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
    hasher: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens — zero shuffle.

    A document's tokens all live in its own row, so the signature is a
    per-row computation: ``xxhash64`` hashes each token JVM-side (one
    codegen'd projection), then an Arrow-batched kernel unpacks the
    hash bits (``np.unpackbits``) and takes the per-document bit-vote
    majorities with one ``add.reduceat`` — vectorized C over the whole
    batch, no per-document Python loop. Bit i of the signature is set
    iff ``2 * ones_i > n_tokens``.

    This replaced a 64-column vote hash-aggregate (explode + groupBy):
    that shape shuffled 65 longs/doc and cost ~10x the tokenize+hash
    time in the 64 per-row sum updates; the map-side kernel removes
    the exchange entirely, so the operator scales with the scan.

    ``hasher="md5"`` swaps the token hash for the engine-portable
    60-bit md5-hex-prefix (the hash-gate idiom shared with the
    HLL/Count-Min sketches): token hashes then occupy bits 0..59, the
    top 4 signature bits stay 0 (no token ever votes them), and an
    external SQL engine can replay the signature — and the near-dup
    pairs built on it — bit-for-bit."""
    if hasher == "xxhash64":
        hfn = lambda t: F.xxhash64(t)  # noqa: E731 - transform() rejects
        # xxhash64's *cols signature (VAR_POSITIONAL), a lambda is fine
    elif hasher == "md5":
        hfn = lambda t: F.conv(  # noqa: E731 - mirrors sketches.py
            F.substring(F.md5(t), 1, 15), 16, 10
        ).cast("long")
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    # NULL text -> NULL token array (split/filter/transform all propagate
    # NULL); coalesce to an empty array so token-less docs get signature 0
    # instead of aborting the Arrow kernel.
    hashed = _spread(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.coalesce(
            F.transform(toks, hfn),
            F.array().cast("array<bigint>"),
        ).alias("__hs"),
    )

    def sign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(
            np.uint64
        )
        for pdf in it:
            m = len(pdf)
            if m == 0:
                yield pd.DataFrame({id_col: [], out_col: []})
                continue
            lens = (
                pdf["__hs"]
                .map(lambda h: 0 if h is None else len(h))
                .to_numpy(dtype=np.int64)
            )
            sigs = np.zeros(m, dtype=np.uint64)
            nz = lens > 0
            if nz.any():
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in pdf["__hs"][nz]]
                )
                # little-endian bit matrix: column i is bit i of each hash
                bits = np.unpackbits(
                    flat.view(np.uint8).reshape(-1, 8),
                    axis=1,
                    bitorder="little",
                )
                offsets = np.zeros(int(nz.sum()), dtype=np.int64)
                np.cumsum(lens[nz][:-1], out=offsets[1:])
                ones = np.add.reduceat(bits, offsets, axis=0)
                maj = (2 * ones) > lens[nz][:, None]
                sigs[nz] = (maj.astype(np.uint64) * weights).sum(
                    axis=1, dtype=np.uint64
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: sigs.astype(np.int64)}
            )

    id_type = dict(df.dtypes)[id_col]
    return hashed.mapInPandas(sign, schema=f"{id_col} {id_type}, {out_col} long")


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: the 64-bit signature splits into
    ``max_hamming + 1`` near-equal-width bands (pigeonhole: a pair
    within Hamming distance d differs in at most d bands, so it must
    agree exactly on at least one of d+1 bands — guaranteed candidate
    recall for any ``max_hamming`` <= 31), then candidates are verified
    with ``bit_count(a XOR b) <= max_hamming``. Candidates come from
    the same bucket-grouped double-explode as MinHash (one shuffle, no
    self-join); verification runs inside the bucket before the pair
    distinct, so only true near-dups reach the final shuffle.

    Capacity (measured, r5 sf10 probe — a 500k-doc corpus built by
    100-copy replication, the adversarial low-diversity case): the
    uncapped run reproduced brute force EXACTLY (920,542 pairs);
    ``max_bucket=1000`` returned 762,831 (83% recall) because the
    replicated near-identical signatures concentrate in a few huge
    buckets. On natural corpora buckets stay small and the cap is
    inert; raise it (or pre-dedup exact copies first) when the corpus
    is known to be heavily replicated.

    Scale ceiling (r7 note): unlike sign-LSH (where ``auto_bits`` can
    widen keys), the band width here is FIXED by the pigeonhole
    construction — 64 bits / (max_hamming+1) bands ≈ 16-bit keys — so
    expected occupancy is n / 65536 and the cap starts dropping
    average-density buckets past ~65M docs per partition-disjoint
    corpus slice. The 100 TB recipe is exact-dedup first (collapse
    identical signatures), then band on the unique signatures; the
    pigeonhole guarantee is unaffected because identical signatures
    are hamming-0 members of their representative."""
    sh = simhash64(df, text_col, id_col, hasher=hasher)
    return hamming_neardup_pairs(
        sh, id_col=id_col, sig_col="simhash", max_hamming=max_hamming,
        max_bucket=max_bucket,
    )


def _hamming_band_expr(max_hamming: int):
    """The pigeonhole band decomposition of a 64-bit ``simhash``
    column into ``max_hamming + 1`` near-equal-width (band, bucket)
    structs — shared by the self-pair and cross-store Hamming paths
    (both sides of a cross join MUST band identically)."""
    n_bands = max_hamming + 1
    base, extra = divmod(64, n_bands)
    widths = [base + 1 if b < extra else base for b in range(n_bands)]
    offsets = [sum(widths[:b]) for b in range(n_bands)]
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), offsets[b])
                    .bitwiseAND(F.lit((1 << widths[b]) - 1).cast("long"))
                    .alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
    ).alias("bb")


def hamming_cross_hits(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Ids from ``new_sigs`` whose 64-bit signature lies within
    ``max_hamming`` of ANY signature in ``store_sigs`` — the
    incremental-ingest form of :func:`hamming_neardup_pairs` (new
    batch vs accepted history, no within-side work). Both sides band
    identically (pigeonhole recall guarantee); the store groups per
    (band, bucket) with ``max_bucket`` degenerate buckets dropped, the
    new side equi-joins on the bucket key, and an ``exists`` over the
    bucket's signature array verifies exact ``bit_count``. Only
    (band, bucket, sig) longs shuffle. Returns distinct (id_col)."""
    if not 0 <= max_hamming <= 31:
        raise ValueError("hamming_cross_hits: max_hamming must be in [0, 31]")
    bandexpr = _hamming_band_expr(max_hamming)
    a = (
        new_sigs.select(F.col(id_col), F.col(sig_col).alias("simhash"))
        .select(id_col, "simhash", bandexpr)
        .select(id_col, "simhash", "bb.band", "bb.bucket")
    )
    b = (
        store_sigs.select(F.col(sig_col).alias("simhash"))
        .select("simhash", bandexpr)
        .select(F.col("simhash").alias("__s"), "bb.band", "bb.bucket")
        .groupBy("band", "bucket")
        .agg(F.collect_set("__s").alias("__ss"))
        .filter(F.size("__ss") <= max_bucket)
    )
    hits = (
        a.join(b, ["band", "bucket"])
        .filter(
            F.exists(
                "__ss",
                lambda s: F.bit_count(
                    F.col("simhash").bitwiseXOR(s)
                ) <= F.lit(max_hamming),
            )
        )
        .select(id_col)
        .distinct()
    )
    return hits


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit signature column by banded
    Hamming LSH — the engine shared by :func:`simhash_neardup_pairs`
    (text) and :func:`~energy_pandas_spark.operators.multimodal.
    image_neardup_pairs` (perceptual image hashes). Pigeonhole
    banding into ``max_hamming + 1`` near-equal-width bands gives
    guaranteed candidate recall; verification is exact
    ``bit_count(xor)`` inside the bucket; ``max_bucket`` drops
    degenerate buckets. Returns (id_a, id_b, hamming)."""
    if not 0 <= max_hamming <= 31:
        raise ValueError(
            "hamming_neardup_pairs: max_hamming must be in [0, 31] so "
            "each of the max_hamming+1 bands spans >= 2 bits"
        )
    sh = df.select(F.col(id_col), F.col(sig_col).alias("simhash"))
    bandexpr = _hamming_band_expr(max_hamming)
    banded = sh.select(id_col, "simhash", bandexpr).select(
        id_col, "simhash", "bb.band", "bb.bucket"
    )
    bucketed = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(F.struct(F.col(id_col).alias("id"), "simhash")).alias("xs"))
        .filter((F.size("xs") >= 2) & (F.size("xs") <= max_bucket))
    )
    return (
        bucketed.select(F.posexplode("xs").alias("__pos", "a"), F.col("xs"))
        .select(
            F.col("a"),
            F.explode(F.slice("xs", F.col("__pos") + F.lit(2), F.size("xs"))).alias("b"),
        )
        .withColumn(
            "hamming", F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
            "hamming",
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard & embedding near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    **lsh_kwargs,
) -> DataFrame:
    """n-gram Jaccard similarity for near-dup pairs; candidate generation
    via MinHash LSH (never quadratic in the corpus)."""
    return minhash_lsh_pairs(
        df, text_col, id_col, shingle_size=n, threshold=threshold, **lsh_kwargs
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 64,
    bands: int = 8,
    seed: int = 42,
    dim: int | None = None,
    max_bucket: int = 1000,
    collapse_exact: bool = False,
    auto_bits: bool = False,
) -> DataFrame:
    """Near-duplicate vectors by cosine: random-hyperplane sign-LSH
    buckets (planes generated driver-side with a fixed seed, embedded as
    array literals), candidates verified with exact cosine — the dot
    products are ``zip_with``/``aggregate`` expressions, JVM-evaluated.

    ``max_bucket`` drops degenerate buckets (the same guard every other
    LSH path here uses): a corpus with thousands of boilerplate-identical
    embeddings would otherwise expand one bucket into a quadratic pair
    list on a single task. Recall for such groups still comes from the
    other ``bands - 1`` buckets unless ALL of them degenerate, which at
    that point is an exact-dup group better handled by ``dedup_exact``
    on a vector digest.

    ``collapse_exact=True`` applies that advice INSIDE the operator —
    the standard near-dup pipeline shape (exact-dedup first, then
    near-dup over uniques): identical vectors collapse to their min-id
    representative (an exact group-by on the vector itself, no digest
    collisions) and LSH+verify run over representatives only, so pairs
    are (rep_a, rep_b). Found by the r7 sf10 ledger: a 100×-replicated
    corpus turns EVERY bucket degenerate (each unique vector has ~100
    exact copies, so every bucket exceeds ``max_bucket`` in every
    band) and the uncollapsed query silently returns zero rows — the
    collapse restores bucket occupancy proportional to UNIQUE content,
    which is the quantity LSH parameters are sized against.

    ``auto_bits=True`` closes the remaining capacity hole: fixed
    ``n_planes // bands`` bits per band degenerate every bucket once
    uniques outgrow ``2^bits * max_bucket`` — at 100 TB no fixed
    parameter survives. The band-key width grows with measured corpus
    cardinality (one count action) so expected occupancy stays ~
    ``max_bucket/8``; exact-dup groups (identical sign patterns) are
    found at any width, while distant-pair per-band recall decays as
    ``p^bits`` — widen ``bands`` to compensate if low-threshold recall
    matters more than cost."""
    collapsed_cache = None
    if collapse_exact:
        # exact group-by on the vector column itself (Spark groups by
        # array keys natively) — one corpus shuffle, zero collision
        # risk, and every downstream stage sees unique vectors only.
        # PERSIST + materialize the collapsed frame (r7, guide §5): it
        # feeds the auto_bits count, the banding scan AND both verify
        # joins — each a separate job, so without the cache the
        # collapse shuffle (and, in pipelines like
        # text_semantic_neardup, the whole upstream embedding build)
        # re-ran up to four times. The materialized stats also give
        # Catalyst the TRUE size of the array-payload verify side (the
        # r5 broadcast-OOM class). Released via the repo-standard
        # handle: attach_caches on the returned frame + the tracked
        # registry the bench drains per iteration.
        from pyspark import StorageLevel

        df = track_cache(
            df.groupBy(vec_col)
            .agg(F.min(id_col).alias(id_col))
            .persist(StorageLevel.MEMORY_AND_DISK_DESER)
        )
        collapsed_cache = df
    if dim is None:
        first = df.select(F.size(vec_col)).limit(1).collect()
        dim = first[0][0] if first else 0
    per_band = n_planes // bands
    if collapse_exact:
        # one count materializes the cache for every consumer below
        # (and serves auto_bits when enabled)
        n = df.count()
    elif auto_bits:
        n = df.count()
    if auto_bits:
        # size the band-key space to corpus CARDINALITY (the r7 scale
        # lesson): expected bucket occupancy is n / 2^bits, so fixed
        # bits silently degenerate every bucket past a corpus size —
        # grow bits until expected occupancy ~ max_bucket/8 (the /8
        # headroom absorbs bucket skew). The count is one cheap scan
        # action; exact-dup (cosine-1.0) groups share every bucket at
        # ANY bit width, so planted-dup recovery is bits-independent,
        # while distant-pair per-band recall decays as p^bits — the
        # standard LSH capacity/recall trade, now explicit.
        need = max(1, n // max(max_bucket // 8, 1))
        per_band = min(max(per_band, (need - 1).bit_length()), 62)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bands * per_band, dim))

    # plane projections via one Arrow-batched matmul per batch: Spark's
    # higher-order functions are interpreted (not codegen'd), so 64
    # aggregate-lambdas per row lose badly to X @ P.T in BLAS.
    def project(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(X) == 0:
                yield pd.DataFrame({id_col: [], "band": [], "bucket": []})
                continue
            bits = (X @ planes.T) > 0  # (n, n_planes)
            out_id, out_band, out_bucket = [], [], []
            weights = 1 << np.arange(per_band, dtype=np.int64)
            for b in range(bands):
                chunk = bits[:, b * per_band : (b + 1) * per_band]
                keys = chunk @ weights
                out_id.extend(pdf[id_col])
                out_band.extend([b] * len(pdf))
                out_bucket.extend(int(k) for k in keys)
            yield pd.DataFrame(
                {id_col: out_id, "band": out_band, "bucket": out_bucket}
            )

    banded = _spread(df.select(id_col, vec_col)).mapInPandas(
        project, schema=f"{id_col} long, band int, bucket long"
    )
    # bucket-grouped pair expansion (one shuffle, no self-join); dedupe
    # candidate pairs on IDs ONLY (cheap shuffle keys), then re-join the
    # vectors once per surviving pair for the exact verify
    bucketed = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cand = (
        bucketed.select(F.posexplode("ids").alias("__pos", "__a"), F.col("ids"))
        .select(
            F.col("__a"),
            F.explode(
                F.slice("ids", F.col("__pos") + F.lit(2), F.size("ids"))
            ).alias("__b"),
        )
        .select(
            F.least("__a", "__b").alias("id_a"),
            F.greatest("__a", "__b").alias("id_b"),
        )
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    paired = cand.join(
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")), "id_a"
    ).join(
        vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")), "id_b"
    )

    # vectorized exact-cosine verify (batch einsum, not per-row lambdas)
    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
                continue
            A = np.array(list(pdf["v_a"]), dtype=np.float64)
            B = np.array(list(pdf["v_b"]), dtype=np.float64)
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            cos = np.round(np.where(den > 0, num / np.maximum(den, 1e-300), 0.0), 6)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    out = paired.mapInPandas(verify, schema="id_a long, id_b long, cosine double")
    if collapsed_cache is not None:
        out = _attach_caches(out, collapsed_cache)
    return out


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style: cluster, then dedup within clusters)
# ---------------------------------------------------------------------------


def assign_semantic_clusters(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Attach a ``cluster`` column: index of the nearest centroid by
    cosine (ties -> lowest centroid index).

    Centroids default to the ``n_centroids`` lowest-``id_col`` vectors —
    a deterministic seed choice that makes the assignment reproducible
    across engines (the production path feeds in k-means centroids from
    ``similarity.train_centroids`` or, scale-honest over the full
    corpus, ``similarity.train_centroids_distributed``; the plan below
    is identical either way). Assignment is a map-side expression against
    centroid literals — no shuffle, no Python workers; the cosine is the
    same sequential-fold ``aggregate`` used by ``cosine_topk``, so a
    DuckDB ``list_cosine_similarity`` oracle reproduces it bit-for-bit.
    """
    if centroids is None:
        rows = (
            df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
        centroids = [list(r[1]) for r in rows]

    # Arrow-batched matmul assignment with an exactness escape hatch.
    # Interpreted zip_with/aggregate folds cost ~1000 lambda evals per
    # row here, and unrolling them into element_at chains overflows
    # whole-stage codegen back into the interpreter — so the fast path
    # is one U @ C.T per batch. Exactness: the reference semantics is
    # the sequential-fold cosine (== DuckDB list_cosine_similarity);
    # matmul rounding can only flip the ARGMAX when the top two
    # similarities sit within the matmul error bound, so any row whose
    # top-2 gap is < 1e-9 is re-decided with a pure-Python sequential
    # fold (bit-identical to the JVM/DuckDB fold). Ties -> lowest
    # centroid index, zero vectors -> cosine 0 everywhere -> cluster 0.
    C = np.array([[float(x) for x in c] for c in centroids], dtype=np.float64)
    cnorms_seq = []
    for c in centroids:  # sequential fold, same order as l2_norm
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        cnorms_seq.append(float(np.sqrt(acc)))
    cn = np.asarray(cnorms_seq)
    safe_cn = np.where(cn == 0.0, 1.0, cn)
    UC = (C / safe_cn[:, None]) * (cn != 0.0)[:, None]

    def _exact_cos(v: np.ndarray, ci: int) -> float:
        acc = 0.0
        for a, b in zip(v, C[ci]):
            acc += float(a) * float(b)
        nv = 0.0
        for a in v:
            nv += float(a) * float(a)
        nv = float(np.sqrt(nv))
        if nv == 0.0 or cnorms_seq[ci] == 0.0:
            return 0.0
        return acc / (nv * cnorms_seq[ci])

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pdf.assign(cluster=pd.Series([], dtype="int32"))
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(V, axis=1)
            safe = np.where(norms == 0.0, 1.0, norms)
            U = (V / safe[:, None]) * (norms != 0.0)[:, None]
            S = U @ UC.T
            best = np.argmax(S, axis=1)  # ties -> lowest index
            if S.shape[1] >= 2:
                top2 = np.partition(S, S.shape[1] - 2, axis=1)[:, -2:]
                gap = top2[:, 1] - top2[:, 0]
                for r in np.nonzero(gap < 1e-9)[0]:
                    exact = [
                        _exact_cos(V[r], ci) for ci in range(len(centroids))
                    ]
                    best[r] = int(np.argmax(exact))
            yield pdf.assign(cluster=best.astype(np.int32))

    return df.mapInPandas(assign, schema=f"{out_fields}, cluster int")


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    threshold: float = 0.3,
    centroids: list[list[float]] | None = None,
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023)-style semantic near-dup pairs:
    cluster the embedding space, then compare pairs ONLY within a
    cluster — O(sum of cluster^2) instead of O(n^2), with cluster size
    the explicit skew/parallelism knob.

    Plan: map-side centroid assignment (no shuffle) -> ONE shuffle on
    ``cluster`` with bucket-grouped double-explode of ids (no
    self-join) -> re-join vectors once per candidate pair -> exact
    sequential-fold cosine filter. Returns (id_a, id_b, cluster,
    cosine) with cosine rounded to 6 for cross-engine stability.
    ``max_cluster`` guards against degenerate assignments making one
    task quadratic (the same guard LSH buckets use).
    """
    assigned = assign_semantic_clusters(
        df, vec_col, id_col, n_centroids, centroids
    ).select(F.col(id_col), F.col(vec_col), "cluster")
    blocks = (
        assigned.groupBy("cluster")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v")))
            ).alias("xs")
        )
        .filter((F.size("xs") >= 2) & (F.size("xs") <= max_cluster))
    )

    # per-cluster BLAS block prefilter: one X @ X.T per cluster instead
    # of an interpreted 64-element fold per pair (the pair set is
    # quadratic in the cluster BY DESIGN — SemDeDup bounds it via the
    # centroid count, max_cluster is the skew guard). The margin makes
    # the prefilter a strict SUPERSET of the exact predicate (einsum
    # float64 error is ~1e-15 relative); survivors — a tiny fraction —
    # are re-verified below with the sequential-fold cosine, so the
    # final pair set and reported cosines stay oracle-exact.
    margin = 1e-9

    def prefilter(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_a, out_b, out_c = [], [], []
            for cluster, xs in zip(pdf["cluster"], pdf["xs"]):
                ids = np.array([x["id"] for x in xs], dtype=np.int64)
                V = np.array([x["v"] for x in xs], dtype=np.float64)
                norms = np.linalg.norm(V, axis=1)
                safe = np.where(norms == 0.0, 1.0, norms)
                U = V / safe[:, None]
                U[norms == 0.0] = 0.0
                C = U @ U.T
                ia, ib = np.triu_indices(len(ids), k=1)
                keep = C[ia, ib] >= threshold - margin
                out_a.extend(ids[ia[keep]])
                out_b.extend(ids[ib[keep]])
                out_c.extend([cluster] * int(keep.sum()))
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "cluster": out_c}
            )

    cand = blocks.mapInPandas(
        prefilter, schema="id_a long, id_b long, cluster int"
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    paired = cand.join(
        vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")),
        "id_a",
    ).join(
        vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")),
        "id_b",
    )
    cos = cosine_similarity(F.col("v_a"), F.col("v_b"))
    return paired.filter(cos >= threshold).select(
        "id_a", "id_b", "cluster", F.round(cos, 6).alias("cosine")
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    threshold: float = 0.3,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Rows that survive semantic dedup: any row with a semantic
    near-dup of lower id (within its cluster) is dropped — the standard
    keep-lowest-id policy, as a left_anti on the pair set (ships only
    the id column through the anti-join)."""
    pairs = semantic_dedup_pairs(
        df, vec_col, id_col, n_centroids, threshold, centroids
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")


def crosscorpus_neardup_pairs(
    new: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    seed: int = 13,
    store_bands: DataFrame | None = None,
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora — "dedup the new crawl
    against the historical store at near-dup level" (exact-digest
    cross-dedup is ``dedup_incremental``). Returns
    (id_new, id_store, jaccard) with jaccard >= threshold.

    Both sides band with the SAME seed/permutations, then per-(band,
    bucket) id lists equi-join — the join produces ONLY cross pairs,
    no within-side work, and ``max_bucket`` caps each side of the
    per-bucket cartesian. The verify re-joins shingle sets for the
    candidate ids only. At scale, build the store's banded buckets
    ONCE per epoch with :func:`build_band_store` and pass them via
    ``store_bands`` — the per-batch cost is then banding the new slice
    plus the bucket join; the store text is only touched to verify
    the (tiny) candidate set.
    """
    if store_bands is None:
        # ONE banding pass over the tagged union (guide §2.4): both
        # sides share the signature aggregate's exchange and the
        # (band, bucket) aggregate, and the bucket lists split by side
        # INSIDE that aggregate — vs the per-side plan's two signature
        # exchanges, two bucket aggregates and a join of the two
        # shuffled bucket tables. Signatures key on (side, id), so a
        # cross-corpus id collision cannot merge documents, and
        # per-side semantics (duplicate ids within one side share a
        # signature) are unchanged.
        tagged = new.select(
            F.struct(
                F.lit(1).alias("side"), F.col(id_col).alias("id")
            ).alias("__uid"),
            F.col(text_col),
        ).unionByName(
            store.select(
                F.struct(
                    F.lit(0).alias("side"), F.col(id_col).alias("id")
                ).alias("__uid"),
                F.col(text_col),
            )
        )
        banded = _banded_buckets(
            tagged, text_col, "__uid", num_hashes, bands, shingle_size, seed
        )
        # collect_list drops the other side's NULLs, so each list holds
        # exactly that side's bucket members; a bucket joins iff both
        # lists are nonempty — the equi-join's semantics, filter-only.
        joined = (
            banded.groupBy("band", "bucket")
            .agg(
                F.collect_list(
                    F.when(F.col("__uid.side") == 1, F.col("__uid.id"))
                ).alias("__new_ids"),
                F.collect_list(
                    F.when(F.col("__uid.side") == 0, F.col("__uid.id"))
                ).alias("__store_ids"),
            )
            .filter(
                (F.size("__new_ids") >= 1)
                & (F.size("__new_ids") <= max_bucket)
                & (F.size("__store_ids") >= 1)
                & (F.size("__store_ids") <= max_bucket)
            )
        )
    else:
        bn = (
            _banded_buckets(
                new, text_col, id_col, num_hashes, bands, shingle_size, seed
            )
            .groupBy("band", "bucket")
            .agg(F.collect_list(id_col).alias("__new_ids"))
            .filter(F.size("__new_ids") <= max_bucket)
        )
        bs = (
            store_bands.groupBy("band", "bucket")
            .agg(F.collect_list(id_col).alias("__store_ids"))
            .filter(F.size("__store_ids") <= max_bucket)
        )
        joined = bn.join(bs, ["band", "bucket"])
    cand = (
        joined.select(
            F.explode("__new_ids").alias("id_new"), F.col("__store_ids")
        )
        .select("id_new", F.explode("__store_ids").alias("id_store"))
        .distinct()
        .persist()
    )
    shn = _shingle_sets(
        new.join(
            cand.select(F.col("id_new").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ),
        text_col,
        id_col,
        shingle_size,
    )
    shs = _shingle_sets(
        store.join(
            cand.select(F.col("id_store").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ),
        text_col,
        id_col,
        shingle_size,
    )
    # eager-materialize both array-payload sides so the planner sees
    # TRUE sizes (see minhash_lsh_pairs' verify join): broadcasts only
    # when a side genuinely fits, shuffle-joins at scale
    from pyspark import StorageLevel

    shn = shn.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    shn.count()
    shs = shs.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    shs.count()
    verified = (
        cand.join(
            shn.withColumnsRenamed({id_col: "id_new", "__sh": "sh_n"}),
            "id_new",
        )
        .join(
            shs.withColumnsRenamed({id_col: "id_store", "__sh": "sh_s"}),
            "id_store",
        )
        .withColumn(
            "__i", F.size(F.array_intersect("sh_n", "sh_s")).cast("long")
        )
        .withColumn("__u", F.size(F.array_union("sh_n", "sh_s")).cast("long"))
        # integer-exact threshold + micro similarity (round-at-tie
        # class; see minhash_lsh_pairs)
        .filter(
            F.when(
                F.col("__u") == 0,
                F.lit(0) >= F.lit(int(round(threshold * 1_000_000))),
            ).otherwise(
                F.col("__i") * F.lit(1_000_000)
                >= F.lit(int(round(threshold * 1_000_000))) * F.col("__u")
            )
        )
        .withColumn(
            "jaccard",
            F.when(F.col("__u") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("__i") / F.col("__u"), 6)
            ),
        )
        .withColumn(
            "jaccard_micro",
            F.when(F.col("__u") == 0, F.lit(0).cast("long")).otherwise(
                F.expr("(__i * 1000000L) div __u")
            ),
        )
        .select("id_new", "id_store", "jaccard", "jaccard_micro")
    )
    return (
        _release_caches(verified, cand, shn, shs)
        if eager
        else _attach_caches(verified, cand, shn, shs)
    )


def build_band_store(
    store: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    seed: int = 13,
) -> None:
    """Persist the historical corpus's banded MinHash buckets —
    (id, band, bucket) longs, a tiny fraction of the text — partitioned
    by band so each incoming batch's bucket join prunes per band.
    Rebuild once per epoch (or maintain by appending each ingested
    batch's own bands); parameters must match the querying side."""
    banded = _banded_buckets(
        store, text_col, id_col, num_hashes, bands, shingle_size, seed
    )
    banded.write.mode("overwrite").partitionBy("band").parquet(path)


def load_band_store(spark, path: str) -> DataFrame:
    """Read a persisted band store for ``store_bands=``."""
    return spark.read.parquet(path)


def minhash_dedup_keep_best(
    df: DataFrame,
    quality_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Documents to DROP under QUALITY-AWARE near-dup canonicalization:
    connected components over the verified MinHash pairs, keeping the
    highest-``quality_col`` document per cluster (ties broken by the
    smallest id) — the near-dup analogue of :func:`dedup_keep_best`,
    for pipelines that canonicalize to the best-written copy rather
    than the earliest id.

    Scale shape: the pair/CC cost is identical to :func:`minhash_dedup`
    (banded LSH + capped buckets + the per-round CC loop); survivor
    selection adds ONE ``max_by`` hash aggregate over cluster members —
    members ship (cluster, id, quality) only, never text."""
    from energy_pandas_spark.operators.graph import dedup_clusters

    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    clusters = dedup_clusters(pairs)  # only docs IN some cluster appear
    members = clusters.select(
        F.col("doc_id").alias(id_col), "cluster_id"
    ).join(df.select(id_col, quality_col), id_col, "inner")
    best = members.groupBy("cluster_id").agg(
        F.max_by(
            F.col(id_col),
            F.struct(
                F.col(quality_col).alias("q"),
                (-F.col(id_col)).alias("tie"),
            ),
        ).alias("__keep")
    )
    return (
        members.join(best, "cluster_id")
        .filter(F.col(id_col) != F.col("__keep"))
        .select(id_col)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_size: int = 3,
    max_df: int = 1000,
    eager: bool = True,
) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup pairs: emit (a, b) when
    ``|A∩B| / min(|A|, |B|) >= threshold`` over distinct word
    shingles — the subset-duplicate detector (a quoted article inside
    a wrapper page has low Jaccard but high containment, so the
    MinHash paths structurally miss it).

    Candidates come from PPJoin-style PREFIX FILTERING (Xiao et al.
    2008, public), not probabilistic LSH: if the smaller side A has
    containment >= t, then ANY ``floor((1-t)*|A|) + 1`` of A's
    shingles must hit B, so joining each document's that-many RAREST
    shingles (global document-frequency order, ties by shingle hash) against
    the full shingle postings finds every qualifying pair — an
    EXACTNESS guarantee, not a recall probability. Rarest-first keeps
    the posting lists short; ``max_df`` drops degenerate postings
    (shingles in 1000+ docs) from candidate generation, the same
    documented skew guard as every LSH bucket cap — a miss then
    requires even the rarest witness shingle to be corpus-boilerplate.

    Capacity (measured, r5 sf10 probe — 500k docs via 100-copy
    replication, so EVERY rare shingle lands in ~100 docs): raw
    candidates were 1.59B at ``max_df=1000``, 55.8M at 300, 5.96M at
    100 — candidate volume is Σ df² over surviving shingles, so a
    low-diversity corpus needs a lower ``max_df`` (at sf0.1, natural
    diversity, the same default produced just 723,825 candidates).

    Plan: one DF aggregate over exploded shingles, a per-document
    rank window (doc-sized partitions, never global), the prefix ×
    postings equi-join on the shingle hash, then one verify join
    computing exact intersections on the distinct-shingle arrays.
    Emits ``containment`` (of the smaller side), both sizes, and the
    intersection."""
    from pyspark import StorageLevel

    # the shingle arrays feed SIX consumers (DF agg, rank join,
    # postings, both verify sides) — persist spill-safe or the text
    # scan + shingle explode re-runs per consumer (exchange-reuse rule)
    # _spread first: a single-file corpus otherwise tokenizes and
    # shingles on ONE scan partition (measured 3.7s single-threaded vs
    # 0.6s spread at sf0.1 — the whole build was serialized)
    grams = (
        _spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__tk"))
        .select(
            F.col(id_col),
            F.array_distinct(word_shingles_of_tokens("__tk", shingle_size)).alias(
                "grams"
            ),
        )
        .filter(F.size("grams") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    # EAGER materialization happens one step later (rows_df.count()):
    # computing rows_df scans THROUGH this cache and populates it in
    # the same job, so the separate grams.count() stats job the r5
    # probe introduced is fused away (VERDICT r6 item 5 — one
    # materialization pass, not two). The stats property it bought is
    # preserved: by the time the verify joins compile (the eager
    # localCheckpoint at return), the InMemoryRelation already reports
    # its TRUE array-payload size, so Catalyst broadcasts a verify
    # side only when the corpus genuinely fits and shuffle-joins at
    # 100x scale (the sf10 "not enough memory to build and broadcast"
    # OOM class stays closed).
    # hash INSIDE the array, explode LONGS: the shingle-string explode
    # was the scan stage's dominant cost (the minhash path measured
    # 10x at sf0.1), and nothing downstream needs the string — the
    # rank window tie-breaks on the hash (the prefix-exactness
    # argument holds for ANY R-subset of a document's shingles, so the
    # tiebreak is free to choose) and the verify join computes exact
    # intersections on the original gram ARRAYS.
    # the per-doc shingle count rides THROUGH the explode (one extra
    # int per row in the df-join shuffle) instead of re-joining the
    # gram table by id afterwards — that join exchanged the whole
    # corpus row stream a second time just to attach a number the
    # explode already knew (r7; column pruning drops sz from the
    # dfreq branch, so the aggregate shuffle stays (h)-only)
    rows = grams.select(
        F.col(id_col),
        F.size("grams").alias("sz"),
        F.explode(
            F.transform(
                "grams", lambda g: F.xxhash64(F.lit("cont-v1"), g)
            )
        ).alias("h"),
    )
    dfreq = rows.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    # (row ⋈ df) feeds both the rank input and the postings — share it
    # instead of joining the corpus-sized row stream against the gram
    # table twice; eager for the same stats-accuracy reason as `grams`
    rows_df = rows.join(dfreq, "h").persist(StorageLevel.MEMORY_AND_DISK_DESER)
    rows_df.count()
    sized = rows_df
    w = Window.partitionBy(id_col).orderBy(F.asc("df"), F.asc("h"))
    # prefix size derives from the SAME t*size expression the verify
    # filter uses (R = sz - ceil(t*sz) + 1): a pair passing verify has
    # n_inter >= ceil(t*sz), so B misses at most sz - ceil(t*sz) of
    # A's shingles and the R rarest must contain a witness — computing
    # R from an independent (1-t)*sz rounding could lose 1 at float
    # boundaries and break the exactness argument
    prefix = (
        sized.withColumn("__rn", F.row_number().over(w))
        .filter(
            F.col("__rn")
            <= F.col("sz")
            - F.ceil(F.lit(threshold) * F.col("sz")).cast("int")
            + 1
        )
        .filter(F.col("df") <= F.lit(max_df))
        .select(F.col(id_col).alias("id_a"), "h")
    )
    postings = rows_df.filter(F.col("df") <= F.lit(max_df)).select(
        F.col(id_col).alias("id_b"), "h"
    )
    cands = (
        prefix.join(postings, "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    # grams is persisted AND eagerly materialized above, so the planner
    # sees the true (array-payload) size of both verify sides —
    # broadcast only when the corpus genuinely fits, shuffle at scale
    # (the sf10 probe's driver-OOM class; see minhash_lsh_pairs)
    ga = grams.select(
        F.col(id_col).alias("id_a"), F.col("grams").alias("__ga")
    )
    gb = grams.select(
        F.col(id_col).alias("id_b"), F.col("grams").alias("__gb")
    )
    inter = F.size(F.array_intersect("__ga", "__gb"))
    verified = (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("n_inter", inter.cast("long"))
        .withColumn("size_a", F.size("__ga").cast("long"))
        .withColumn("size_b", F.size("__gb").cast("long"))
        .withColumn(
            "containment",
            F.round(
                F.col("n_inter")
                / F.least("size_a", "size_b").cast("double"),
                6,
            ),
        )
        # integer-exact threshold and micro similarity: the float
        # product `threshold * least` is off the true rational by an
        # ulp (0.6 * 5 = 3.0000000000000004 excludes an exact-boundary
        # pair), and round(ratio, 6) is tie-ambiguous cross-engine
        .withColumn(
            "containment_micro",
            F.expr("(n_inter * 1000000L) div least(size_a, size_b)"),
        )
        .filter(
            F.col("n_inter") * F.lit(1_000_000)
            >= F.lit(int(round(threshold * 1_000_000)))
            * F.least("size_a", "size_b")
        )
        .select(
            "id_a", "id_b", "size_a", "size_b", "n_inter",
            "containment", "containment_micro",
        )
    )
    return (
        _release_caches(verified, grams, rows_df)
        if eager
        else _attach_caches(verified, grams, rows_df)
    )


def containment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_size: int = 3,
    max_df: int = 1000,
) -> DataFrame:
    """Documents to DROP under containment dedup: for every qualifying
    pair the SMALLER-shingle-set side drops (ties by the larger id),
    keeping the superset document. Chains need no connected
    components — "contained in anything" is already transitive-safe
    for a drop set: in A ⊂ B ⊂ C the (A,B) and (B,C) pairs drop A and
    B, and C (contained in nothing) survives."""
    pairs = containment_pairs(
        df, text_col, id_col, threshold, shingle_size, max_df
    )
    dropped = pairs.select(
        F.when(
            (F.col("size_a") < F.col("size_b"))
            | ((F.col("size_a") == F.col("size_b")) & (F.col("id_a") > F.col("id_b"))),
            F.col("id_a"),
        )
        .otherwise(F.col("id_b"))
        .alias(id_col)
    )
    return dropped.distinct()


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------

_WPOS = 1 << 20  # position capacity per doc (grams); 40-bit hash + 20-bit pos


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram,
    slide a window of ``w`` consecutive hashes, and keep each window's
    minimum (rightmost on ties — the paper's robust-winnowing rule).
    The selected (hash, position) set is a ~1/w-density sketch with
    the guarantee that any two documents sharing a run of at least
    ``w + k - 1`` tokens share at least one fingerprint — positional,
    sub-document dup detection that survives reordering of the
    surrounding text (complementary to minhash, which sketches GLOBAL
    similarity).

    Zero shuffle: every step is a per-row array computation in
    codegen'd JVM expressions. The tie rule costs nothing — each hash
    packs into ``hash * 2^20 + (2^20 - 1 - pos)`` so a plain
    ``array_min`` picks the smallest hash with the LARGEST position,
    and the key unpacks after selection. Hashes are 40-bit md5 prefixes
    (cross-engine: the oracle replays them in SQL); positions must fit
    2^20 grams per document (raise at ingest if you chunk bigger).

    Returns (id, fp_hash, pos), distinct per document.
    """
    from energy_pandas_spark.util import spread_partitions

    src = spread_partitions(df.select(id_col, F.col(text_col)))
    toked = src.select(id_col, tokens(text_col).alias("__toks"))
    grams = toked.select(
        id_col, word_shingles_of_tokens("__toks", k).alias("__g")
    )
    # fail loudly instead of silently wrapping positions on a document
    # bigger than the key packing allows (chunk such docs at ingest).
    # The guard wraps the gram array itself — a side-channel assert
    # column would be pruned away by Catalyst as unused.
    grams = grams.select(
        id_col,
        F.when(F.size("__g") <= F.lit(_WPOS), F.col("__g"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "winnow_fingerprints: document exceeds 2^20 grams: id="
                    ),
                    F.col(id_col).cast("string"),
                )
            )
        )
        .alias("__g"),
    )
    keys = grams.select(
        id_col,
        F.transform(
            "__g",
            lambda g, j: F.conv(F.substring(F.md5(g), 1, 10), 16, 10).cast(
                "long"
            )
            * F.lit(_WPOS)
            + (F.lit(_WPOS - 1) - j),
        ).alias("__keys"),
    )
    m = F.size("__keys")
    nwin = F.greatest(m - F.lit(w - 1), F.lit(1))
    wsize = F.least(F.lit(w), m)
    sel = keys.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), nwin - 1),
                    lambda i: F.array_min(F.slice("__keys", i + 1, wsize)),
                )
            )
        ).alias("__key"),
    )
    return sel.select(
        id_col,
        F.expr(f"__key div {_WPOS}").alias("fp_hash"),
        (F.lit(_WPOS - 1) - F.col("__key") % F.lit(_WPOS)).alias("pos"),
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints
    — the local/plagiarism dup detector over :func:`winnow_
    fingerprints`. Same bucket-grouped pair expansion as every LSH
    path here: fingerprints group by hash, degenerate buckets are
    capped at ``max_bucket`` (a boilerplate gram shared by a million
    docs must not go quadratic), ordered pairs count shared hashes.
    Returns (id_a, id_b, shared) with id_a < id_b. Pass ``fps`` (a
    precomputed :func:`winnow_fingerprints` result) to skip the
    fingerprinting pass — the streaming ingest computes prints once
    per batch and reuses them here."""
    if fps is None:
        fps = winnow_fingerprints(df, text_col, id_col, k, w)
    fps = fps.select(F.col(id_col).alias("__id"), "fp_hash").distinct()
    buckets = (
        fps.groupBy("fp_hash")
        .agg(F.sort_array(F.collect_list("__id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda a: F.transform(
                            "ids",
                            lambda b: F.struct(
                                a.alias("id_a"), b.alias("id_b")
                            ),
                        ),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("__p")
    ).select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# near-dup evaluation (precision/recall vs exact ground truth on a sample)
# ---------------------------------------------------------------------------


def neardup_eval(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    truth_threshold: tuple[int, int] = (1, 2),
    shingle_size: int = 3,
    sample_permille: int = 150,
    denominator: int = 10_000,
    eager: bool = True,
) -> DataFrame:
    """One-row precision/recall card for a candidate near-dup pair set
    (any of the ``*_pairs`` operators) against EXACT shingle-Jaccard
    ground truth — the "measure, don't guess" loop for LSH knobs
    (bands/rows/threshold): ``(n_sample, n_true_pairs, n_pred_pairs,
    tp, fp, fn, precision_permille, recall_permille)``.

    Ground truth is EXACT Jaccard over a DETERMINISTIC md5 hash-sample
    of the corpus, computed through the inverted index (co-occurrence
    counts over exploded distinct shingles — pairs sharing no shingle
    can never pass a positive threshold, so they never materialize).
    Still worst-case quadratic in the sample (freq² pairs per hot
    shingle, uncappable without losing exactness); ``sample_permille``
    is the cost bound — keep the sample in the thousands. The
    prediction set restricts to pairs with BOTH ids sampled, so the
    two sets are comparable. The truth threshold is the exact rational
    ``truth_threshold[0]/truth_threshold[1]`` compared as ``den *
    |A∩B| >= num * |A∪B|`` — no float boundary; empty-vs-empty pairs
    (undefined Jaccard) are excluded. Zero-denominator conventions:
    no predictions -> precision 1000, no true pairs -> recall 1000.

    Pairs contract: ``(id_a, id_b)`` with ``id_a < id_b`` (every pair
    operator in this module emits that orientation)."""
    from energy_pandas_spark.operators.sampling import hash_bucket

    tn, td = truth_threshold
    if not (0 < tn <= td):
        raise ValueError(
            f"truth_threshold must satisfy 0 < num <= den, got {truth_threshold}"
        )
    cut = (sample_permille * denominator) // 1000
    sample = df.filter(hash_bucket(id_col, denominator) < cut)
    # EXACT truth via the inverted index, not a cartesian: a pair's
    # intersection size is its co-occurrence count over the exploded
    # distinct-shingle postings, and with tn > 0 a pair sharing ZERO
    # shingles can never reach the threshold — so pairs that never
    # co-occur rightly never materialize. Replaces the all-pairs
    # array_intersect (measured 6x on the sf0.1 fixture); still
    # quadratic per hot shingle (freq² pairs — the exactness cost, no
    # bucket cap allowed here), so the sample bound stays the contract.
    sh = (
        # _spread: the hash-sampled slice of a single-file corpus
        # otherwise shingles on one scan partition (see containment).
        # Per-doc ARRAY persist + sizes riding the explode (the
        # measured best of three shapes, interleaved best-of-4 ×2 at
        # sf0.1 on the declared query: array+sizes-joins 6.37/6.92s,
        # FLAT (id, n, shingle) persist 11.21/11.66s, this hybrid
        # 5.81/6.12s — the flat string-per-row cache the r7 mid-build
        # commit introduced stored every shingle as its own cached row
        # and was a 2x regression once a calm window existed; reverted
        # here while KEEPING its good half). Carrying the distinct-set
        # size through the explode (two ints per row) lets the pair
        # aggregate read both union sizes off its own matched rows via
        # first(), so the two per-side sizes joins stay gone (guide
        # §2.3/§2.4). The persist hands Catalyst the TRUE size of the
        # self-join's sides — a postings side broadcasts only when it
        # genuinely fits (the sf10 broadcast-OOM class).
        _shingle_sets(_spread(sample), text_col, id_col, shingle_size)
        .withColumn("__n", F.size("__sh").cast("long"))
        .persist()  # two consumers: both postings sides of the co-join
    )
    ex = sh.select(
        F.col(id_col).alias("__id"),
        F.col("__n"),
        F.explode("__sh").alias("__s"),
    )
    co = (
        ex.select(
            F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__s"
        )
        .join(
            ex.select(
                F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__s"
            ),
            "__s",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__i"),
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
        )
    )
    uni = F.col("__na") + F.col("__nb") - F.col("__i")
    true_pairs = co.filter(
        F.lit(td) * F.col("__i") >= F.lit(tn) * uni
    ).select("id_a", "id_b")
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
            "n_sample",
            "n_true_pairs",
            "n_pred_pairs",
            "tp",
            "fp",
            "fn",
            "precision_permille",
            "recall_permille",
        )
    )
    return _release_caches(card, sh) if eager else _attach_caches(card, sh)

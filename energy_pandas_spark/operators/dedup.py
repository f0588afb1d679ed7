"""Deduplication operators for training-data pipelines, designed for
100 TB corpora:

- ``dedup_exact``: hash-groupBy on a normalized-content digest. One
  shuffle on the digest; map-side partial aggregation; no text moves
  after the hash is computed at the scan.
- ``minhash_lsh``: shingle -> 64-permutation MinHash signature -> banded
  LSH bucketing -> candidate pairs verified with true Jaccard. The
  signature + band keys are pure column expressions (xxhash64 with
  per-permutation seeds); the only shuffle is the explode-on-bands
  self-join, keyed by (band, bucket) — the standard distributed MinHash
  join. Bucket skew is bounded by ``max_bucket`` (oversized buckets are
  dropped and logged, the usual guard against degenerate shingles).
- ``simhash64``: 64-bit SimHash per document via one Arrow-vectorized
  pandas iterator (numpy bit matrix), then near-dup candidates from
  4x16-bit band buckets verified by Hamming distance (``bit_count`` of
  xor) — Python touches each doc once; banding/verification is JVM.
- ``ngram_jaccard_pairs``: all-pairs n-gram Jaccard within LSH buckets
  (never a full cross join).
- ``embedding_neardup``: random-hyperplane (sign) LSH over an embedding
  column, verified by exact cosine — both as expressions.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from energy_pandas_spark.functions.textfns import jaccard, normalized_text, word_shingles
from energy_pandas_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "dedup_exact",
    "minhash_signature",
    "minhash_lsh_pairs",
    "minhash_dedup",
    "simhash64",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
]


def _spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-bound per-row work is spread across all cores: a small
    single-file parquet scan arrives as ONE partition, serializing the
    expensive expression work. At real scale the scan has plenty of
    splits and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_size: int = 3,
    out_col: str = "sig",
    seed: int = 13,
) -> DataFrame:
    """N-permutation MinHash signature as ``array<bigint>``.

    One expensive pass hashes each shingle ONCE (``xxhash64``); the N
    permutations are then cheap affine maps ``a_i * h + b_i`` over the
    long array (odd multiplier => a bijection mod 2^64; Java long
    arithmetic wraps, which is exactly the mod), i.e. the classic
    one-hash MinHash trick. Everything stays JVM-side; the per-document
    cost is O(shingles) string hashing + O(N * shingles) long ops
    instead of O(N * shingles) string hashing."""
    p = (1 << 31) - 1  # Mersenne prime; keeps a*h+b within long under ANSI
    rng = np.random.default_rng(seed)
    coeffs = [
        (int(rng.integers(1, p)), int(rng.integers(0, p)))
        for _ in range(num_hashes)
    ]
    sh = F.array_distinct(word_shingles(text_col, shingle_size))
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(p).cast("long")))

    def perm(a: int, b: int):
        # closure factory: PySpark derives lambda arity from the python
        # signature, so default-arg captures would break it
        return lambda h: F.pmod(
            h * F.lit(a).cast("long") + F.lit(b).cast("long"), F.lit(p).cast("long")
        )

    sig = F.array(
        *[F.array_min(F.transform(F.col("__base"), perm(a, b))) for a, b in coeffs]
    )
    return (
        df.withColumn("__shingles", sh)
        .withColumn("__base", base)
        .withColumn(out_col, sig)
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
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH, verified with true
    shingle-set Jaccard. Returns (id_a, id_b, jaccard) with id_a < id_b
    and jaccard >= threshold.

    Plan shape: scan -> signature expressions -> explode bands (xB) ->
    shuffle on (band, bucket-hash) self-join -> pair dedup -> Jaccard
    verify. The verify re-joins the shingle arrays by id (shuffle keyed
    on id) instead of carrying shingles through the band explosion —
    candidates are tiny relative to the corpus."""
    rows_per_band = num_hashes // bands
    sigd = minhash_signature(_spread(df), text_col, num_hashes, shingle_size)
    sigd = sigd.select(id_col, "__shingles", "sig").cache()

    banded = sigd.select(
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
                                    F.col("sig")[b * rows_per_band + r]
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

    # guard against degenerate buckets (all-identical boilerplate)
    sized = banded.withColumn(
        "__bsize", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("__bsize") <= max_bucket)

    a = sized.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = sized.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    sh = sigd.select(F.col(id_col), F.col("__shingles"))
    verified = (
        cand.join(sh.withColumnsRenamed({id_col: "id_a", "__shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "__shingles": "sh_b"}), "id_b")
        .withColumn("jaccard", F.round(jaccard("sh_a", "sh_b"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Documents to DROP: for every verified near-dup pair keep the
    smaller id, drop the larger (greedy transitive approximation —
    connected-component clustering is a later pass)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    return pairs.select(F.col("id_b").alias(id_col)).distinct()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    The per-document bit-vote needs 64 weighted popcounts over token
    hashes — awkward as expressions, natural as a vectorized numpy
    kernel, so this is the one text op using ``mapInPandas`` (Arrow
    batches; each document visits Python exactly once)."""
    src = _spread(df.select(id_col, F.col(text_col)))
    import zlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_cols = 1 << np.arange(64, dtype=np.uint64)
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: [], out_col: []})
                continue
            # flatten the whole batch: hash each DISTINCT token once,
            # then one vectorized bit-unpack + segmented reduction for
            # every document at once (no per-document numpy dispatch)
            cache: dict[str, int] = {}
            flat: list[int] = []
            lens = np.empty(len(pdf), dtype=np.int64)
            for row_i, txt in enumerate(pdf[text_col]):
                toks = str(txt).lower().split()
                lens[row_i] = len(toks)
                for t in toks:
                    h = cache.get(t)
                    if h is None:
                        h = zlib.crc32(t.encode()) + (
                            zlib.crc32(t[::-1].encode()) << 32
                        )
                        cache[t] = h
                    flat.append(h)
            hs = np.array(flat, dtype=np.uint64)
            bits = ((hs[:, None] & bit_cols[None, :]) != 0).astype(np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            nonempty = lens > 0
            # reduceat needs strictly valid segment starts; guard empties
            seg_starts = starts[nonempty]
            counts = (
                np.add.reduceat(bits, seg_starts, axis=0)
                if len(seg_starts)
                else np.zeros((0, 64), dtype=np.int64)
            )
            votes = counts * 2 - lens[nonempty][:, None]
            sims_ne = ((votes > 0) * bit_cols[None, :]).sum(axis=1, dtype=np.uint64)
            sims = np.zeros(len(pdf), dtype=np.uint64)
            sims[nonempty] = sims_ne
            signed = sims.astype(np.int64)  # two's-complement view
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: signed})

    schema = f"{id_col} long, {out_col} long"
    return src.mapInPandas(batches, schema=schema)


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit band buckets (a pair within
    Hamming distance 3 must agree on at least one band), verified with
    ``bit_count(a XOR b) <= max_hamming`` — banding and verification
    are pure expressions."""
    sh = simhash64(df, text_col, id_col)
    bandexpr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bucket"),
                )
                for b in range(4)
            ]
        )
    ).alias("bb")
    banded = sh.select(id_col, "simhash", bandexpr).select(
        id_col, "simhash", "bb.band", "bb.bucket"
    )
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
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
) -> DataFrame:
    """Near-duplicate vectors by cosine: random-hyperplane sign-LSH
    buckets (planes generated driver-side with a fixed seed, embedded as
    array literals), candidates verified with exact cosine — the dot
    products are ``zip_with``/``aggregate`` expressions, JVM-evaluated."""
    if dim is None:
        first = df.select(F.size(vec_col)).limit(1).collect()
        dim = first[0][0] if first else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    per_band = n_planes // bands

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
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    # dedupe candidate pairs on IDs ONLY (cheap shuffle keys), then
    # re-join the vectors once per surviving pair for the exact verify
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
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

    return paired.mapInPandas(verify, schema="id_a long, id_b long, cosine double")

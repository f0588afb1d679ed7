"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct —
Spark's native pattern for multimodal training data. The distributed
plumbing (schemas, Arrow batch shapes, partition sizing, UDF
signatures) is real and tested. Real codecs exist too: call
``operators.codecs.register_default_decoders()`` to install stdlib
PNG/BMP/PPM/WAV decode + feature kernels (PIL preferred for images
when importable); ``set_decoder`` swaps in av/soundfile/turbo codecs
for formats beyond them, nothing else changes. The deterministic
``_fake_decode`` remains only as the unregistered-mime fallback
(``strict=True`` raises instead).

Scale notes: media rows are large, so the operators (a) never shuffle
the binary payload except where the caller asks for it, (b) cap Arrow
batch sizes via ``spark.sql.execution.arrow.maxRecordsPerBatch``
(callers should size it so batch_bytes ~ 64-256 MB), and (c) emit
features as fixed-length ``array<float>`` ready for the similarity
operators.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "set_decoder",
    "decode_features",
    "frame_sample_plan",
    "perceptual_hash",
    "image_neardup_pairs",
    "image_dedup",
]

#: canonical multimodal row schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

# decoder registry: mime-prefix -> fn(bytes, meta_row) -> np.ndarray[float32]
_DECODERS: dict[str, Callable[[bytes, dict], np.ndarray]] = {}


def set_decoder(mime_prefix: str, fn: Callable[[bytes, dict], np.ndarray]) -> None:
    """Register a real codec (e.g. PIL-based) for a mime prefix."""
    _DECODERS[mime_prefix] = fn


def _fake_decode(content: bytes, meta: dict, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: a seeded feature vector from
    the content digest. Keeps the full distributed pipeline testable
    without media libraries; REPLACE via set_decoder for real features."""
    seed = int.from_bytes(hashlib.sha256(content or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def media_table(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Validate/coerce an arbitrary DataFrame into the canonical media
    schema (id, binary content, typed meta struct)."""
    if "media_id" not in df.columns:
        df = df.withColumn("media_id", F.monotonically_increasing_id())
    if "meta" not in df.columns:
        df = df.withColumn(
            "meta",
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )
    return df.select("media_id", F.col(content_col).alias("content"), "meta")


def decode_features(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
    strict: bool = False,
) -> DataFrame:
    """content -> feature vector, via ``mapInPandas`` (Arrow batches).

    Dispatches on ``meta.mime`` through the decoder registry (see
    ``operators.codecs.register_default_decoders`` for the real stdlib
    PNG/BMP/PPM/WAV kernels); without a registered decoder,
    ``strict=True`` raises NotImplementedError (the honest stub) while
    the default uses the deterministic fake so the downstream pipeline
    (dedup/similarity over features) stays exercisable end-to-end.

    A registered decoder that RAISES on its input (corrupt/truncated
    bytes) fails the job under ``strict=True``; with the default
    ``strict=False`` the row emits NULL features — the honest
    "undecodable" marker (a fake vector here would fabricate a
    signature for garbage bytes and could near-dup-match real media).

    Decoder vectors are truncated / zero-padded to ``dim`` so mixed
    modalities land in one fixed-length ``array<float>`` column."""
    # snapshot at plan time: the closure must carry the registry state
    # the driver sees, not whatever the executor module reimports
    decoders = tuple(_DECODERS.items())

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content, meta in zip(pdf[content_col], pdf[meta_col]):
                mime = (meta or {}).get("mime") or ""
                decoder = next(
                    (f for p, f in decoders if mime.startswith(p)), None
                )
                if decoder is not None:
                    try:
                        vec = np.asarray(
                            decoder(content, meta), dtype=np.float64
                        )
                    except Exception:
                        if strict:
                            raise
                        feats.append(None)  # undecodable bytes -> NULL
                        continue
                elif strict:
                    raise NotImplementedError(
                        f"no decoder registered for mime {mime!r}; "
                        "install a media library and call set_decoder()"
                    )
                else:
                    vec = _fake_decode(content, meta or {}, dim)
                if len(vec) < dim:
                    vec = np.pad(vec, (0, dim - len(vec)))
                feats.append([float(x) for x in vec[:dim]])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )
    return df.select(id_col, content_col, meta_col).mapInPandas(fn, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    meta_col: str = "meta",
) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media, frame_ts).

    The timestamp lattice comes from ``meta.duration_ms`` via
    ``sequence``+``explode`` (pure expressions); actual frame extraction
    is the registered decoder's job. This is the real distributed
    skeleton — the explode happens before decode so frame decoding
    parallelizes across the cluster rather than per-video."""
    return (
        df.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col(f"{meta_col}.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def perceptual_hash(
    features: DataFrame,
    feat_col: str = "features",
    id_col: str = "media_id",
    out_col: str = "phash",
) -> DataFrame:
    """64-bit perceptual signature from a decoded feature vector —
    the aHash construction (bit i = component i above the vector's own
    mean) over the codecs' luma block-mean thumbnail, so two images
    hash close iff their coarse luminance STRUCTURE matches. Mean-
    relative thresholding makes the signature invariant to uniform
    brightness/contrast scaling (the most common benign re-encode
    drift); only the first 64 components contribute (the thumbnail's
    native size).

    Pure expression work — one ``aggregate`` for the mean and one
    ``zip_with``+``aggregate`` fold packing the bits into a BIGINT;
    zero shuffles, zero Python. NULL / empty feature vectors hash to
    NULL (no decode = no opinion, never a false bucket of zeros).
    """
    base = features.select(
        id_col, F.slice(F.col(feat_col), 1, 64).alias("__f")
    ).withColumn(
        "__mean",
        # greatest(size, 1): the empty-array row would otherwise hit
        # ANSI DIVIDE_BY_ZERO eagerly — this projection has two
        # consumers (sig + flat fallback) so Catalyst keeps it
        # materialized instead of inlining it under their whens
        F.expr(
            "aggregate(__f, cast(0.0 as double),"
            " (a, x) -> a + cast(x as double))"
            " / cast(greatest(size(__f), 1) as double)"
        ),
    )
    # shiftleft (not pow-of-two doubles, whose long cast clamps at bit
    # 63) packs the bits; bit 63 lands on the sign bit by design
    sig = F.expr(
        "aggregate("
        "  zip_with(__f, sequence(0, size(__f) - 1),"
        "    (v, i) -> IF(cast(v as double) > __mean,"
        "                 shiftleft(cast(1 as bigint), i),"
        "                 cast(0 as bigint))),"
        "  cast(0 as bigint), (a, x) -> a | x)"
    )
    # sig = 0 iff NO component exceeds the mean, which (for non-empty
    # vectors) happens exactly when the vector is CONSTANT — a flat
    # image. Without a fallback every flat image (pure black, pure
    # white, any solid color) would hash to 0 and verify as a
    # hamming-0 dup of every other flat image. Flat images instead
    # hash their brightness bucket through xxhash64, so equal solids
    # still dedup while different solids land far apart in Hamming
    # space.
    flat = F.xxhash64(
        F.round(F.col("__mean") * F.lit(1024.0)).cast("long")
    )
    return base.select(
        id_col,
        F.when(
            F.size("__f") > 0,
            F.when(sig == 0, flat).otherwise(sig),
        ).alias(out_col),
    )


def image_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 4,
    max_bucket: int = 1000,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
    strict: bool = False,
) -> DataFrame:
    """Image near-duplicate pairs: decode (registered codec) →
    perceptual hash → banded Hamming LSH — the pixel-level twin of
    text SimHash dedup, catching re-encoded/brightness-shifted copies
    that byte-exact dedup misses. Composition of three existing
    engines: :func:`decode_features` (Arrow batch decode),
    :func:`perceptual_hash` (zero-shuffle signature), and
    :func:`~energy_pandas_spark.operators.dedup.
    hamming_neardup_pairs` (pigeonhole banding, exact bit_count
    verify, ``max_bucket``-capped buckets). One shuffle total on the
    banded signature longs — the image bytes never shuffle.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    from energy_pandas_spark.operators.dedup import hamming_neardup_pairs

    feats = decode_features(
        df, dim=64, id_col=id_col, content_col=content_col,
        meta_col=meta_col, strict=strict,
    )
    sigs = perceptual_hash(feats, "features", id_col).filter(
        F.col("phash").isNotNull()
    )
    return hamming_neardup_pairs(
        sigs, id_col=id_col, sig_col="phash",
        max_hamming=max_hamming, max_bucket=max_bucket,
    )


def image_dedup(
    df: DataFrame,
    max_hamming: int = 4,
    max_bucket: int = 1000,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
    strict: bool = False,
) -> DataFrame:
    """Images to DROP: connected components over the verified
    perceptual-hash pairs, keeping the smallest id per cluster — the
    :func:`~energy_pandas_spark.operators.dedup.minhash_dedup`
    contract for the image modality (correct on transitive chains of
    re-encodes where greedy pair-dropping over-keeps). Anti-join the
    result against the media table to materialize the kept set."""
    from energy_pandas_spark.operators.graph import dedup_clusters

    pairs = image_neardup_pairs(
        df, max_hamming=max_hamming, max_bucket=max_bucket,
        id_col=id_col, content_col=content_col, meta_col=meta_col,
        strict=strict,
    )
    return (
        dedup_clusters(pairs)
        .filter(~F.col("is_survivor"))
        .select(F.col("doc_id").alias(id_col))
    )

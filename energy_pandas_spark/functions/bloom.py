"""Broadcastable Bloom filters: built driver-side from JVM-computed
hashes, probed in vectorized Arrow batches.

Spark's own ``bloom_filter_agg`` / ``might_contain`` expressions exist
in the JVM but are not registered as SQL-callable functions in stock
builds, and ``DataFrame.stat.bloomFilter`` returns a driver object with
no column-level probe. This module keeps the useful decomposition:

- hashing stays JVM-side (``xxhash64`` in a codegen'd projection — the
  expensive per-row work never touches Python),
- the filter is a plain numpy uint64 bit array (``n_bits/8`` bytes)
  that rides in the task closure like any broadcast,
- the probe is a ``mapInPandas`` kernel doing k double-hashed bit
  lookups per row with pure numpy gathers — no per-row Python.

A Bloom prefilter has NO false negatives, so putting one in front of an
exact join never changes the result; it only stops the (huge) probe
side from shuffling rows that cannot match. The classic use here is
benchmark decontamination: the benchmark gram set is small, the corpus
gram stream is enormous, and ~99% of corpus grams can be dropped
map-side for ``n_bits/8`` bytes of closure.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "build_bloom",
    "bloom_hits",
    "bloom_prefilter",
    "bloom_flag",
    "build_bloom_distributed",
]


def _indices(h: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit indices by Kirsch-Mitzenmacher double hashing:
    idx_i = h1 + i*h2 (mod n_bits), h2 forced odd so strides cover the
    table."""
    hu = h.astype(np.uint64)
    h1 = hu
    h2 = (hu >> np.uint64(33)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits))


def build_bloom(hashes: np.ndarray, n_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Build the bit table (uint64 words) from 64-bit member hashes.

    Sizing rule of thumb: ``n_bits ~ 10 * n_members`` gives ~1% false
    positives at k=4. The member set is the SMALL side (an eval
    benchmark, a blocklist) — collected once, bounded."""
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    bits = np.zeros(n_bits // 64, dtype=np.uint64)
    if len(hashes) == 0:
        return bits
    idx = _indices(np.asarray(hashes, dtype=np.int64), n_bits, k).ravel()
    np.bitwise_or.at(bits, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))
    return bits


def bloom_hits(bits: np.ndarray, hashes: np.ndarray, k: int = 4) -> np.ndarray:
    """Vectorized membership probe: bool array, True = maybe-member
    (no false negatives)."""
    n_bits = len(bits) * 64
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    idx = _indices(np.asarray(hashes, dtype=np.int64), n_bits, k)
    words = bits[(idx >> np.uint64(6)).ravel()].reshape(idx.shape)
    hit = (words >> (idx & np.uint64(63))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_prefilter(
    df: DataFrame, hash_col: str, bits: np.ndarray, k: int = 4
) -> DataFrame:
    """Keep only rows whose ``hash_col`` (a 64-bit hash computed
    JVM-side, e.g. ``F.xxhash64(...)``) might be in the filter. Map-only;
    the bit table rides in the closure once per task."""
    schema = df.schema

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            keep = bloom_hits(bits, pdf[hash_col].to_numpy(), k)
            out = pdf[keep]
            if len(out):
                yield out

    return df.mapInPandas(fn, schema=schema)


def bloom_flag(
    df: DataFrame, hash_col: str, bits: np.ndarray, k: int = 4, out_col: str = "__maybe"
) -> DataFrame:
    """Annotate each row with a maybe-member boolean instead of
    filtering — for callers that need BOTH sides (e.g. an incremental
    dedup that fast-paths definite non-members around the verify
    join). Map-only."""
    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField(out_col, BooleanType())])

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = (
                bloom_hits(bits, pdf[hash_col].to_numpy(), k)
                if len(pdf)
                else np.zeros(0, dtype=bool)
            )
            yield pdf

    return df.mapInPandas(fn, schema=schema)


def build_bloom_distributed(
    df: DataFrame, hash_col: str, n_bits: int = 1 << 24, k: int = 4
) -> np.ndarray:
    """Build the bit table from a DISTRIBUTED member set: each
    partition folds its hashes into a local table, tables OR-combine
    up a tree — the driver never sees the hashes, only ``n_bits/8``
    bytes per combine. This is how a bloom over a corpus-sized store
    (e.g. an incremental-dedup digest table) is built; the driver-side
    :func:`build_bloom` stays for small member sets.

    Honest sizing bound: the RESULT still broadcasts to every task, so
    the technique caps out where ``~10 bits x n_members`` stops being
    broadcast material (~10^9 members at ~1 GB). Beyond that, skip the
    bloom — the anti-join is the scale path."""
    if n_bits % 64:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")

    rdd = df.select(hash_col).rdd.map(lambda r: r[0]).glom().map(
        lambda xs: build_bloom(np.asarray(xs, dtype=np.int64), n_bits, k)
    )
    zero = np.zeros(n_bits // 64, dtype=np.uint64)
    return rdd.treeReduce(np.bitwise_or) if not rdd.isEmpty() else zero

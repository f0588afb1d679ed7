"""Streaming benchmark decontamination: score and flag documents in a
STREAM by n-gram overlap with a fixed benchmark/eval set.

The batch operators (``contamination_overlap``/``_bloom``) join the
corpus gram stream against the benchmark gram table. A streaming
pipeline wants the same signal STATELESS — no streaming aggregation,
no watermark, no stream-static shuffle join per micro-batch — so this
operator inverts the data movement: the benchmark's gram HASHES
(xxhash64, computed once at plan-build time; eval sets are small by
definition) ride in the task closure as one sorted int64 array, and
every micro-batch row scores itself with a vectorized searchsorted
membership probe inside an Arrow batch. Per-doc output is a pure
projection, so the stream stays append-mode with no state store at
all.

Membership is by 64-bit gram hash, not gram string — two DISTINCT
grams collide with probability ~n^2/2^64 (vanishing for any real eval
set), the usual trade every hash-based operator here makes.

Scale shape: gram assembly and hashing are JVM expressions; the Python
kernel only gathers precomputed int64s (one concatenate + one
searchsorted per batch). Closure cost is 8 bytes per distinct
benchmark gram.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from energy_pandas_spark.functions.textfns import tokens, word_shingles_of_tokens

__all__ = ["decontaminate_stream"]


def decontaminate_stream(
    stream: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Attach ``(n_grams, n_hits, overlap, contaminated)`` to every
    stream row; callers typically ``.filter(~col('contaminated'))``
    before landing the batch. Works identically on a batch DataFrame
    (the kernel does not care), which is how the equivalence tests pin
    it against the batch operator."""
    bench_grams = (
        benchmark.select(tokens(text_col).alias("__toks"))
        .select(
            F.explode(
                F.array_distinct(word_shingles_of_tokens("__toks", n))
            ).alias("gram")
        )
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
        .collect()
    )
    bench = np.sort(np.array([r.h for r in bench_grams], dtype=np.int64))

    # materialize the token array BEFORE the shingle lambdas touch it
    # (the word_shingles_of_tokens hot-path contract): inlining the
    # tokens() expression would re-run the split once per shingle
    # position — O(len^2) per streamed document
    with_hashes = (
        stream.withColumn(
            "__toks",
            F.coalesce(tokens(text_col), F.array().cast("array<string>")),
        )
        .withColumn(
            "__gh",
            F.transform(
                F.array_distinct(word_shingles_of_tokens("__toks", n)),
                lambda g: F.xxhash64(g),
            ),
        )
        .drop("__toks")
    )
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in stream.schema.fields
    )
    schema = (
        f"{out_fields}, n_grams bigint, n_hits bigint, "
        "overlap double, contaminated boolean"
    )
    cols = [f.name for f in stream.schema.fields]

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            lens = pdf["__gh"].map(len).to_numpy()
            if lens.sum():
                flat = np.concatenate(
                    [np.asarray(a, dtype=np.int64) for a in pdf["__gh"]]
                )
                idx = np.searchsorted(bench, flat)
                # out-of-range probe (gram > bench[-1]): clamp to 0 —
                # safe, bench[0] can never equal such a gram
                idx[idx == len(bench)] = 0
                hit = (
                    bench[idx] == flat
                    if len(bench)
                    else np.zeros(len(flat), dtype=bool)
                )
                bounds = np.cumsum(lens)[:-1]
                hits = np.array(
                    [seg.sum() for seg in np.split(hit, bounds)],
                    dtype=np.int64,
                )
            else:
                hits = np.zeros(len(pdf), dtype=np.int64)
            out = pdf[cols].copy()
            out["n_grams"] = lens.astype(np.int64)
            out["n_hits"] = hits
            out["overlap"] = np.round(
                hits / np.maximum(lens, 1), 6
            )
            out["contaminated"] = out["overlap"] >= threshold
            yield out

    return with_hashes.mapInPandas(fn, schema=schema)

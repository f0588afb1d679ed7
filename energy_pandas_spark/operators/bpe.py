"""Distributed BPE (byte-pair-encoding) tokenizer training and
encoding (Sennrich et al. 2016, public).

Scale shape: the CORPUS is touched exactly once — a map-combined
``groupBy(word).count()`` whose shuffle carries (word, partial count).
Every merge iteration then runs on the VOCAB-sized word table (bounded
— ~100M distinct words at 100 TB is still executor-trivial), so the
training loop's cost is independent of corpus size:

- pair counts: one explode + hash aggregate over the word table,
  weighted by word count (overlapping adjacent pairs, the reference
  BPE statistic);
- best pair: count-desc with (left, right) lexicographic tiebreak —
  rerun-stable; a 1-row collect per iteration (the scalar-per-round
  pattern the connected-components loop also uses);
- merge application: a codegen'd ``aggregate`` fold over each word's
  symbol array (left-to-right, non-overlapping), followed by
  ``localCheckpoint`` to truncate lineage so expression depth stays
  constant across iterations.

Encoding (``bpe_encode``) is an Arrow ``mapInPandas`` kernel applying
the ranked merge list per word with a per-batch memo cache — the
GPT-2-reference algorithm; merges broadcast via the closure.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from energy_pandas_spark.functions.textfns import tokens

__all__ = [
    "word_counts",
    "train_bpe",
    "bpe_encode",
    "bpe_vocabulary",
    "END_OF_WORD",
]

END_OF_WORD = "</w>"


def _encode_word(word: str, ranked: dict, cache: dict) -> list[str]:
    """Apply the ranked merge list to one word (GPT-2 reference
    algorithm): repeatedly merge the best-ranked adjacent pair."""
    got = cache.get(word)
    if got is not None:
        return got
    syms = list(word) + [END_OF_WORD]
    while len(syms) >= 2:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        best = min(
            (p for p in pairs if p in ranked),
            key=lambda p: ranked[p],
            default=None,
        )
        if best is None:
            break
        l, r = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = syms
    return syms


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the whitespace-tokenized lowercased corpus —
    the single corpus-scale pass of BPE training. ``spread_partitions``
    first: a single-file corpus otherwise tokenizes on ONE scan
    partition (no-op at real scale, where the scan has splits)."""
    from energy_pandas_spark.util import spread_partitions

    return (
        spread_partitions(df.select(F.col(text_col)))
        .select(
            F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _symbolize(word) -> F.Column:
    """chars of the word plus the end-of-word marker symbol."""
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def _pair_structs(syms) -> F.Column:
    """Adjacent (l, r) symbol pairs (overlapping, reference BPE)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )


def _apply_merge(syms, left: str, right: str, merged: str | None = None) -> F.Column:
    """Left-to-right non-overlapping replacement of adjacent
    (left, right) with the merged symbol (default: their
    concatenation; WordPiece passes its ``##``-stripped fusion) —
    a codegen'd fold."""
    if merged is None:
        merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_bpe_local(
    wc: list[tuple[str, int]], num_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, str, int]]:
    """Driver-side trainer twin: identical algorithm and tiebreak to
    the distributed loop (asserted equal in tests), used when the word
    table is small enough to collect."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc:
        k = tuple(w) + (END_OF_WORD,)
        vocab[k] = vocab.get(k, 0) + c
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, l, r, l + r, c))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + cnt
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_vocab_threshold: int = 200_000,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ranked merge table ``(rank, left, right, merged, pair_count)``.
    Training stops early when no pair reaches ``min_pair_count``.

    Determinism: the best pair is (count desc, left asc, right asc) —
    a total order, so the learned table is independent of partitioning
    and rerun-stable.

    The corpus-scale pass (word counting) is always distributed. If
    the resulting word table has at most ``driver_vocab_threshold``
    rows it is collected and the merge loop runs driver-side — the
    same bounded-twin pattern as the classifier trainer: the word
    table IS the training state, iterations are pure dictionary work,
    and 2 Spark jobs per merge would be pure scheduling overhead.
    Larger vocabularies take the distributed loop (``0`` forces it).
    Both paths produce bit-identical merge tables (tested)."""
    spark = df.sparkSession
    wc = word_counts(df, text_col)
    if driver_vocab_threshold > 0:
        sample = wc.limit(driver_vocab_threshold + 1).collect()
        if len(sample) <= driver_vocab_threshold:
            merges = _train_bpe_local(
                [(r.word, int(r["count"])) for r in sample],
                num_merges,
                min_pair_count,
            )
            return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)
    words = (
        wc.select(_symbolize(F.col("word")).alias("syms"), "count")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            words.select(F.explode(_pair_structs(F.col("syms"))).alias("p"), "count")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0].c < min_pair_count:
            break
        l, r, c = best[0].l, best[0].r, int(best[0].c)
        merges.append((rank, l, r, l + r, c))
        prev = words
        words = words.select(
            _apply_merge(F.col("syms"), l, r).alias("syms"), "count"
        ).localCheckpoint(eager=True)
        prev.unpersist()
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)


_MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ]
)


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each document as BPE subword symbols using a learned
    merge table: per word, repeatedly merge the best-ranked adjacent
    pair (the GPT-2 reference algorithm), with a per-batch word memo
    so repeated words tokenize once per Arrow batch.

    The merge table is driver-collected (it is ``num_merges`` rows by
    construction) and ships in the closure; the corpus streams through
    ``mapInPandas`` in Arrow batches — one pass, no shuffle."""
    ranked = {
        (r.left, r.right): r.rank
        for r in merges.select("left", "right", "rank").collect()
    }
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )

    # ASCII \s split mirrors the Java `\s+` the JVM-side tokens()
    # uses — Python str.split() would also break on unicode spaces,
    # silently diverging from the word counts the merges trained on
    _ws = re.compile(r"\s+", re.ASCII)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks_col = []
            for text in pdf["__text"]:
                words = [w for w in _ws.split((text or "").lower()) if w]
                enc: list[str] = []
                for w in words:
                    enc.extend(_encode_word(w, ranked, cache))
                toks_col.append(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_col,
                    "n_bpe_tokens": [len(e) for e in toks_col],
                }
            )

    src = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__text")
    )
    encoded = src.mapInPandas(run, schema=out_schema)
    return df.join(encoded, id_col, "left")


def bpe_vocabulary(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The vocabulary the learned merges induce over the corpus:
    ``(symbol, count)`` — base characters, the end-of-word marker, and
    every merged symbol, weighted by corpus occurrences.

    One corpus pass (the word-count aggregate), then the encode kernel
    runs over the VOCAB-sized word table in Arrow batches; symbols
    explode weighted by word count into a final map-combined aggregate.
    The symbol table is what a trainer exports next to the merges."""
    ranked = {
        (r.left, r.right): r.rank
        for r in merges.select("left", "right", "rank").collect()
    }
    wc = word_counts(df, text_col)
    sym_schema = StructType(
        [
            StructField("symbol", StringType()),
            StructField("count", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            syms: list[str] = []
            counts: list[int] = []
            for word, c in zip(pdf["word"], pdf["count"]):
                for sym in _encode_word(word, ranked, cache):
                    syms.append(sym)
                    counts.append(int(c))
            yield pd.DataFrame({"symbol": syms, "count": counts})

    return (
        wc.mapInPandas(run, schema=sym_schema)
        .groupBy("symbol")
        .agg(F.sum("count").alias("count"))
    )

"""Distributed WordPiece tokenizer training and encoding (Schuster &
Nakajima 2012; the BERT tokenizer — public algorithm, HuggingFace
`tokenizers` is the reference implementation).

WordPiece is BPE with a likelihood objective: instead of merging the
most FREQUENT adjacent pair, each iteration merges the pair maximizing

    score(l, r) = count(l, r) / (count(l) * count(r))

— the unigram-LM likelihood gain of fusing the two symbols. Word-
internal continuation symbols carry the ``##`` prefix (``"word"`` →
``["w", "##o", "##r", "##d"]``); merging drops the right side's
prefix, so merged symbols stay well-formed (``"##o" + "##r" →
"##or"``).

Scale shape mirrors :mod:`energy_pandas_spark.operators.bpe` — the
CORPUS is touched exactly once (the map-combined word-count
aggregate); every merge iteration runs on the VOCAB-sized word table:

- per iteration, one symbol-count aggregate and one pair-count
  aggregate over the word table, two vocab-sized equi-joins to attach
  the unigram counts, and a 1-row argmax collect;
- the score is evaluated as ``double(pair) / (double(l) * double(r))``
  — one IEEE expression tree both the distributed plan and the
  driver-side twin compute, so the argmax (score desc, pair asc) is
  bit-identical across paths (the float-parity rule SURVEY §10
  documents: +,-,*,/ are correctly rounded, engine-identical given
  the same expression tree);
- merge application is the codegen'd non-overlapping fold shared with
  BPE, followed by ``localCheckpoint`` to truncate lineage.

Like the BPE trainer, a bounded driver-side twin takes over when the
word table collects under a threshold (iterations are pure dictionary
work; two Spark jobs per merge at small vocab is pure scheduling
overhead). Both paths are asserted bit-equal in tests.

Encoding (:func:`wordpiece_encode`) is the greedy longest-match-first
algorithm BERT uses: per word, emit the longest vocabulary prefix,
continue on the ``##``-prefixed remainder, fall back to the unknown
token when no prefix matches. Arrow ``mapInPandas`` with a per-batch
word memo; the vocabulary broadcasts in the closure.

Caveat (shared with every WordPiece implementation): a literal ``#``
inside a word is indistinguishable from the continuation prefix in
the SYMBOL strings; the trainer and encoder stay consistent with each
other because both derive symbols the same way.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from energy_pandas_spark.operators.bpe import (
    _apply_merge,
    _pair_structs,
    word_counts,
)

__all__ = [
    "train_wordpiece",
    "wordpiece_vocabulary",
    "wordpiece_encode",
    "CONT",
    "UNK",
]

CONT = "##"
UNK = "[UNK]"

_MERGE_SCHEMA = StructType(
    [
        StructField("rank", LongType()),
        StructField("left", StringType()),
        StructField("right", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _merge_symbol(left: str, right: str) -> str:
    """``"w" + "##o" → "wo"``, ``"##o" + "##r" → "##or"``."""
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _symbolize(word) -> F.Column:
    """First char bare, every later char ``##``-prefixed."""
    chars = F.split(word, "")
    return F.when(F.length(word) <= 1, F.array(word)).otherwise(
        F.concat(
            F.array(F.substring(word, 1, 1)),
            F.transform(
                F.slice(chars, 2, F.length(word) - 1),
                lambda c: F.concat(F.lit(CONT), c),
            ),
        )
    )


def _train_wordpiece_local(
    wc: list[tuple[str, int]], num_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, str, int, float]]:
    """Driver-side trainer twin: identical statistic, float expression
    and tiebreak to the distributed loop (asserted bit-equal in
    tests)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc:
        k = (w[0],) + tuple(CONT + ch for ch in w[1:])
        vocab[k] = vocab.get(k, 0) + c
    merges: list[tuple[int, str, str, str, int, float]] = []
    for rank in range(num_merges):
        sym_counts: dict[str, int] = {}
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        # the frequency floor EXCLUDES rare pairs from candidacy (it
        # must not halt training: a one-off typo pair scores a perfect
        # 1/(1*1) and would otherwise win the argmax and break the loop)
        eligible = {
            p: c for p, c in pair_counts.items() if c >= min_pair_count
        }
        if not eligible:
            break
        # score = double(pair) / (double(l) * double(r)) — the literal
        # IEEE expression the distributed plan evaluates
        (l, r), pc = min(
            eligible.items(),
            key=lambda kv: (
                -(
                    float(kv[1])
                    / (
                        float(sym_counts[kv[0][0]])
                        * float(sym_counts[kv[0][1]])
                    )
                ),
                kv[0][0],
                kv[0][1],
            ),
        )
        score = float(pc) / (float(sym_counts[l]) * float(sym_counts[r]))
        merged = _merge_symbol(l, r)
        merges.append((rank, l, r, merged, pc, score))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + cnt
        vocab = new_vocab
    return merges


def train_wordpiece(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_vocab_threshold: int = 200_000,
) -> DataFrame:
    """Learn ``num_merges`` WordPiece merges; returns the ranked merge
    table ``(rank, left, right, merged, pair_count, score)``.

    Determinism: the best pair is (score desc, left asc, right asc) —
    a total order over one shared IEEE expression, so the learned
    table is independent of partitioning and identical between the
    distributed loop and the collected twin (tested). Pairs below
    ``min_pair_count`` occurrences are EXCLUDED from candidacy (not a
    stop condition: a one-off typo pair scores a perfect 1/(1*1) and
    would otherwise win the argmax and halt training); training stops
    when no eligible pair remains."""
    spark = df.sparkSession
    wc = word_counts(df, text_col)  # tokens() never emits ""
    if driver_vocab_threshold > 0:
        sample = wc.limit(driver_vocab_threshold + 1).collect()
        if len(sample) <= driver_vocab_threshold:
            merges = _train_wordpiece_local(
                [(r.word, int(r["count"])) for r in sample],
                num_merges,
                min_pair_count,
            )
            return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)
    words = wc.select(
        _symbolize(F.col("word")).alias("syms"), "count"
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int, float]] = []
    for rank in range(num_merges):
        sym_counts = (
            words.select(F.explode("syms").alias("s"), "count")
            .groupBy("s")
            .agg(F.sum("count").alias("sc"))
        )
        best = (
            words.select(
                F.explode(_pair_structs(F.col("syms"))).alias("p"), "count"
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("count").alias("c"))
            .join(
                sym_counts.select(
                    F.col("s").alias("l"), F.col("sc").alias("lc")
                ),
                "l",
            )
            .join(
                sym_counts.select(
                    F.col("s").alias("r"), F.col("sc").alias("rc")
                ),
                "r",
            )
            .filter(F.col("c") >= min_pair_count)
            .withColumn(
                "score",
                F.col("c").cast("double")
                / (F.col("lc").cast("double") * F.col("rc").cast("double")),
            )
            .orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, pc, score = best[0].l, best[0].r, int(best[0].c), float(
            best[0].score
        )
        merged = _merge_symbol(l, r)
        merges.append((rank, l, r, merged, pc, score))
        prev = words
        words = words.select(
            _apply_merge(F.col("syms"), l, r, merged).alias("syms"), "count"
        ).localCheckpoint(eager=True)
        prev.unpersist()
    return spark.createDataFrame(merges, schema=_MERGE_SCHEMA)


def wordpiece_vocabulary(
    df: DataFrame, merges: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The token inventory the learned merges induce: every base
    symbol the corpus produces (first chars bare, continuations
    ``##``-prefixed) plus every merged symbol — the list a trainer
    exports as ``vocab.txt``. One corpus pass (the word-count
    aggregate) + a vocab-sized distinct; ``(token)`` sorted."""
    wc = word_counts(df, text_col)  # tokens() never emits ""
    base = wc.select(
        F.explode(_symbolize(F.col("word"))).alias("token")
    ).distinct()
    return (
        base.union(merges.select(F.col("merged").alias("token")))
        .distinct()
        .orderBy("token")
    )


def _encode_word_greedy(
    word: str, vocab: set, cache: dict, max_chars: int
) -> list[str]:
    """BERT's greedy longest-match-first WordPiece segmentation."""
    got = cache.get(word)
    if got is not None:
        return got
    if len(word) > max_chars:
        out = [UNK]
        cache[word] = out
        return out
    out = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = CONT + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            out = [UNK]
            break
        out.append(cur)
        start = end
    cache[word] = out
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_chars: int = 100,
) -> DataFrame:
    """Encode each document with a WordPiece vocabulary (greedy
    longest-match-first; a word with any un-coverable span becomes one
    ``[UNK]``). Adds ``wp_tokens``, ``n_wp_tokens``, ``n_unk``.

    The vocabulary is driver-collected (vocab-sized by construction)
    and ships in the closure; the corpus streams through
    ``mapInPandas`` in Arrow batches with a per-batch word memo — one
    pass, no shuffle."""
    vset = {r.token for r in vocab.select("token").collect()}
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("wp_tokens", ArrayType(StringType())),
            StructField("n_wp_tokens", LongType()),
            StructField("n_unk", LongType()),
        ]
    )
    # ASCII \s mirrors the JVM tokens() the trainer counted words with
    _ws = re.compile(r"\s+", re.ASCII)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks_col, unk_col = [], []
            for text in pdf["__text"]:
                words = [w for w in _ws.split((text or "").lower()) if w]
                enc: list[str] = []
                for w in words:
                    enc.extend(
                        _encode_word_greedy(w, vset, cache, max_word_chars)
                    )
                toks_col.append(enc)
                unk_col.append(sum(1 for t in enc if t == UNK))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "wp_tokens": toks_col,
                    "n_wp_tokens": [len(e) for e in toks_col],
                    "n_unk": unk_col,
                }
            )

    src = df.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__text")
    )
    encoded = src.mapInPandas(run, schema=out_schema)
    return df.join(encoded, id_col, "left")

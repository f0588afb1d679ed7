"""Distributed unigram-LM tokenizer training and encoding — the
SentencePiece-unigram family (Kudo 2018, public), complementing
``operators/bpe.py`` with the other major subword algorithm.

Algorithm (the deterministic hard-EM variant): seed a large candidate
vocabulary from frequent substrings, then alternate

- **E-step**: Viterbi-segment every distinct word under the current
  piece scores (max-sum over integer-quantized log-probs) and count
  the pieces used, weighted by word frequency;
- **M-step**: re-score pieces from the counts
  (``round(quant * ln(c / total))`` — one correctly-rounded log per
  piece);
- **prune**: shrink toward ``vocab_size`` keeping the highest-count
  pieces (piece-asc tiebreak), single characters always retained so
  every training word stays representable.

Viterbi with INTEGER scores and a fixed tie policy (higher score,
then fewer pieces, then first candidate in the fixed scan order)
makes every step a deterministic function of integer state — the
distributed and local paths share the literal segmentation function,
so they are bit-identical by construction (asserted in tests).

Scale shape (the ``bpe.py`` contract): the corpus is touched exactly
once (the map-combined word count); every EM iteration runs on the
VOCAB-sized word table — the E-step is an Arrow ``mapInPandas``
kernel over distinct words with the score dict broadcast in the
closure, followed by one piece-count aggregate whose result (the
candidate vocabulary, ``seed_size``-bounded and shrinking every
round) is collected to the driver for re-scoring. Nothing
corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import math
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

from energy_pandas_spark.operators.bpe import word_counts

__all__ = ["train_unigram", "unigram_encode", "UNIGRAM_QUANT"]

#: log-prob quantization: integer 1/(1<<20)-nat units
UNIGRAM_QUANT = 1 << 20

_VOCAB_SCHEMA = StructType(
    [
        StructField("piece", StringType()),
        StructField("count", LongType()),
        StructField("logprob_q", LongType()),
    ]
)


def _viterbi(word: str, scores: dict[str, int], max_piece_len: int):
    """Best segmentation of ``word`` under integer piece scores:
    maximize (sum of scores, -n_pieces); ties keep the first
    candidate in the fixed (end ascending, length ascending) scan.
    Characters absent from ``scores`` fall back to a one-char piece
    with a score below every real piece (OOV survives, never wins a
    tie). Returns the piece list. THE shared kernel — both trainer
    paths and the encoder call this exact function."""
    n = len(word)
    oov = min(scores.values(), default=0) - UNIGRAM_QUANT
    # dp[i] = (score, -pieces, backpointer j, piece)
    NEG = float("-inf")
    dp: list[tuple] = [(NEG, 0, -1, "")] * (n + 1)
    dp[0] = (0, 0, -1, "")
    for end in range(1, n + 1):
        best = (NEG, 0, -1, "")
        for ln in range(1, min(max_piece_len, end) + 1):
            start = end - ln
            if dp[start][0] == NEG:
                continue
            piece = word[start:end]
            s = scores.get(piece)
            if s is None:
                if ln > 1:
                    continue
                s = oov
            cand = (dp[start][0] + s, dp[start][1] - 1, start, piece)
            if cand[:2] > best[:2]:
                best = cand
        dp[end] = best
    out: list[str] = []
    i = n
    while i > 0:
        out.append(dp[i][3])
        i = dp[i][2]
    out.reverse()
    return out


def _rescore(counts: dict[str, int]) -> dict[str, int]:
    """M-step: integer log-probs from counts (zero counts smoothed to
    1 so retained-for-coverage chars keep a finite score)."""
    sm = {p: max(c, 1) for p, c in counts.items()}
    total = float(sum(sm.values()))
    return {
        p: int(round(UNIGRAM_QUANT * math.log(c / total)))
        for p, c in sm.items()
    }


def _prune(counts: dict[str, int], target: int) -> dict[str, int]:
    """Keep the ``target`` highest-count pieces (count desc, piece asc
    tiebreak); single characters always survive (coverage)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    keep = dict(chars)
    for p, c in multi[: max(0, target - len(chars))]:
        keep[p] = c
    return keep


def _seed(wc: DataFrame, max_piece_len: int, seed_size: int) -> dict[str, int]:
    """Candidate vocabulary: every substring of length <= max_piece_len
    at every position of every word, weighted by word count — built
    JVM-side (nested transform + explode + one aggregate), collected
    at the pruned ``seed_size`` bound."""
    subs = wc.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)),"
                f" i -> transform(sequence(1, least({max_piece_len},"
                " length(word) - i + 1)), l -> substr(word, i, l))))"
            )
        ).alias("piece"),
        "count",
    )
    agg = (
        subs.groupBy("piece")
        .agg(F.sum("count").alias("c"))
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(seed_size * 2)
        .collect()
    )
    return _prune({r["piece"]: int(r["c"]) for r in agg}, seed_size)


def train_unigram(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    n_iter: int = 3,
    max_piece_len: int = 8,
    seed_size: int = 20_000,
    shrink: float = 0.75,
    driver_vocab_threshold: int = 200_000,
) -> DataFrame:
    """Learn a ``vocab_size``-piece unigram tokenizer vocabulary;
    returns ``(piece, count, logprob_q)`` with ``logprob_q`` in
    integer 1/2^20-nat units, ordered (count desc, piece asc).

    ``driver_vocab_threshold`` is the bounded-twin switch shared with
    :func:`~energy_pandas_spark.operators.bpe.train_bpe`: at or below
    it the word table collects and EM runs driver-side; above it the
    E-step distributes (same `_viterbi`, same integer aggregation —
    bit-identical either way, tested)."""
    spark = df.sparkSession
    wc = word_counts(df, text_col)
    counts = _seed(wc, max_piece_len, seed_size)

    local = None
    if driver_vocab_threshold > 0:
        sample = wc.limit(driver_vocab_threshold + 1).collect()
        if len(sample) <= driver_vocab_threshold:
            local = [(r["word"], int(r["count"])) for r in sample]

    words = None if local is not None else wc.localCheckpoint(eager=True)
    size = len(counts)
    for it in range(n_iter):
        scores = _rescore(counts)
        if local is not None:
            new: dict[str, int] = {}
            for w, c in local:
                for p in _viterbi(w, scores, max_piece_len):
                    new[p] = new.get(p, 0) + c
        else:
            new = _e_step_distributed(words, scores, max_piece_len)
        # coverage: chars stay even when unused this round
        for p in list(counts):
            if len(p) == 1:
                new.setdefault(p, 0)
        size = max(vocab_size, int(size * shrink))
        counts = _prune(new, size)
    counts = _prune(counts, vocab_size)
    scores = _rescore(counts)
    rows = sorted(
        ((p, c, scores[p]) for p, c in counts.items()),
        key=lambda r: (-r[1], r[0]),
    )
    return spark.createDataFrame(rows, schema=_VOCAB_SCHEMA)


def _e_step_distributed(
    words: DataFrame, scores: dict[str, int], max_piece_len: int
) -> dict[str, int]:
    """One distributed E-step: segment every distinct word under the
    broadcast scores, aggregate integer piece counts (order-free),
    collect the vocab-sized result."""

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_p: list[str] = []
            out_c: list[int] = []
            for w, c in zip(pdf["word"], pdf["count"]):
                for p in _viterbi(w, scores, max_piece_len):
                    out_p.append(p)
                    out_c.append(int(c))
            yield pd.DataFrame({"piece": out_p, "c": out_c})

    agg = (
        words.mapInPandas(seg, "piece string, c long")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
        .collect()
    )
    return {r["piece"]: int(r["c"]) for r in agg}


def unigram_encode(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with a trained vocabulary: per word the
    same `_viterbi` the trainer ran (per-batch memo cache, scores
    broadcast via the closure — the ``bpe_encode`` shape). Returns
    ``(id_col, pieces array<string>, n_pieces)``; characters outside
    the vocabulary survive as single-char OOV pieces."""
    rows = vocab.select("piece", "logprob_q").collect()
    scores = {r["piece"]: int(r["logprob_q"]) for r in rows}
    max_len = max((len(p) for p in scores), default=1)

    from energy_pandas_spark.functions.textfns import tokens

    base = df.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__w"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, pieces, ns = [], [], []
            for i, ws in zip(pdf[id_col], pdf["__w"]):
                out: list[str] = []
                for w in ws:
                    got = cache.get(w)
                    if got is None:
                        got = _viterbi(w, scores, max_len)
                        cache[w] = got
                    out.extend(got)
                ids.append(i)
                pieces.append(out)
                ns.append(len(out))
            yield pd.DataFrame(
                {id_col: ids, "pieces": pieces, "n_pieces": ns}
            )

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("pieces", ArrayType(StringType())),
            StructField("n_pieces", LongType()),
        ]
    )
    return base.mapInPandas(run, schema)

"""Sequence packing: concatenate documents into fixed token-budget
training sequences (the GPT-pretraining concatenate-and-chunk layout).

The packing itself is pure arithmetic over a deterministic document
order — no Python workers, no RNG. Documents are first routed to a
pack bucket (hashed, or a caller-supplied key such as language or
source); within a bucket they are laid out in a stable order and cut
into ``budget``-token sequences. A document may span a sequence
boundary — that is the standard layout; the (seq_id, offset) pair is
exactly where its tokens land.

Scale shape: ONE shuffle, keyed on the pack bucket (the window's
partition key). Bucket count is the parallelism knob: at corpus scale
set ``n_buckets`` so a bucket's documents fit an executor's sort
spill comfortably (the window only needs a sort, not materialization).
Rerun-stable: same corpus -> same md5 buckets -> same sequences,
bit-for-bit, on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from energy_pandas_spark.operators.sampling import hash_bucket

__all__ = ["pack_sequences", "packing_stats"]


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    by: str | Column | None = None,
    n_buckets: int = 64,
    bucket_col: str = "pack_bucket",
) -> DataFrame:
    """Assign every document a (bucket, sequence, offset) slot in a
    corpus packed into ``budget``-token sequences.

    ``token_col`` is the document's token count (precomputed — e.g.
    ``token_count()`` / ``bpe_ish_token_count()``). ``by`` keys the
    packing (documents never cross ``by`` groups); default is a stable
    md5 bucket of ``id_col`` into ``n_buckets`` groups.

    Output adds: ``pack_bucket``, ``seq_id`` (0-based within bucket),
    ``seq_offset`` (token offset inside that sequence where the doc
    starts), and ``n_seqs`` (sequences this doc touches — 1 unless it
    spans a boundary).
    """
    if by is None:
        bucket = hash_bucket(id_col, n_buckets)
    else:
        bucket = F.col(by) if isinstance(by, str) else by
    out = df.withColumn(bucket_col, bucket)
    w = Window.partitionBy(bucket_col).orderBy(id_col)
    cum_excl = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    end_incl = cum_excl + F.greatest(F.col(token_col).cast("long"), F.lit(1)) - 1
    seq_id = F.floor(cum_excl / budget).cast("long")
    return out.withColumns(
        {
            "seq_id": seq_id,
            "seq_offset": (cum_excl % budget).cast("long"),
            "n_seqs": (F.floor(end_incl / budget).cast("long") - seq_id + 1),
        }
    )


def packing_stats(
    packed: DataFrame,
    token_col: str,
    budget: int,
    bucket_col: str = "pack_bucket",
) -> DataFrame:
    """One-row packing-efficiency report over a :func:`pack_sequences`
    output (or any frame carrying the bucket and token-count columns):
    ``(n_buckets_used, n_docs, total_tokens, n_seqs, capacity,
    waste_tokens, utilization_permille)``.

    In the concatenate-and-chunk layout every mid-stream sequence is
    full by construction, so ALL waste is per-bucket tail padding:
    a bucket with T tokens yields ``ceil(T / budget)`` sequences and
    wastes ``seqs * budget - T``. More buckets = more parallelism but
    more tails — this card is the knob's feedback. Integer arithmetic
    throughout; two aggregates (bucket-sized, then one row); the
    corpus frame is scanned once and only (bucket, token) longs enter
    the aggregate."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    per = (
        packed.groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("__docs"),
            F.sum(F.col(token_col).cast("long")).alias("__toks"),
        )
        .withColumn("__seqs", F.expr(f"(__toks + {budget - 1}) div {budget}"))
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum("__docs").cast("long").alias("n_docs"),
        F.sum("__toks").cast("long").alias("total_tokens"),
        F.sum("__seqs").cast("long").alias("n_seqs"),
        (F.sum("__seqs") * budget).cast("long").alias("capacity"),
        (F.sum("__seqs") * budget - F.sum("__toks"))
        .cast("long")
        .alias("waste_tokens"),
        F.expr(f"(1000 * sum(__toks)) div (sum(__seqs) * {budget})")
        .cast("long")
        .alias("utilization_permille"),
    )

"""End-to-end corpus-cleaning composition — the canonical
training-data preprocessing pipeline, assembled from the individual
operators so the whole chain stays one Catalyst plan:

    language filter  ->  quality filter  ->  exact-dedup keep-first

Everything before the dedup window is a pure projection/filter (no
shuffle); the dedup costs exactly one hash shuffle on the content
fingerprint. At 100 TB that is the minimum possible: you cannot dedup
without co-locating equal fingerprints once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from energy_pandas_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
)

__all__ = ["clean_corpus"]


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    min_alpha_ratio: float = 0.6,
    max_repetition_ratio: float = 0.4,
) -> DataFrame:
    """Filter to the wanted languages, drop low-quality docs, and keep
    one document per exact-content fingerprint (the smallest id wins —
    deterministic, engine-independent).

    All thresholds compare integer-ratio doubles (single IEEE divides),
    so the kept set is bit-identical on any engine — the pipeline has a
    full DuckDB oracle."""
    scored = quality_features(language_id(df, text_col), text_col)
    kept = scored.filter(
        F.col("lang_pred").isin(*keep_langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("repetition_ratio") <= max_repetition_ratio)
    )
    fp = fingerprint(kept, text_col)
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

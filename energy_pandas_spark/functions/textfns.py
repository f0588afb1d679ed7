"""Text primitives as column expressions (tokenize, normalize, shingle,
Jaccard) — all built-in functions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["normalized_text", "tokens", "word_shingles", "char_shingles", "jaccard"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used for
    exact-dup hashing."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (empty strings removed)."""
    return F.filter(
        F.split(F.lower(_c(col)), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings.

    Built from ``sequence`` + ``transform`` + ``slice`` over the token
    array: JVM-side, linear in document length. Documents shorter than
    ``n`` tokens contribute their full token join as a single shingle.
    """
    toks = tokens(col)
    m = F.size(toks)
    full = F.array(F.array_join(toks, " "))
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(m < n, full).otherwise(grams)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles of the normalized text."""
    s = normalized_text(col)
    m = F.length(s)
    full = F.array(s)
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.substring(s, i, F.lit(n)),
    )
    return F.when(m < n, full).otherwise(grams)


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of two array columns treated as sets."""
    a, b = F.array_distinct(_c(a)), F.array_distinct(_c(b))
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )

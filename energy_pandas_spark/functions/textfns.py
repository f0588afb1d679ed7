"""Text primitives as column expressions (tokenize, normalize, shingle,
Jaccard) — all built-in functions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "normalized_text",
    "tokens",
    "word_shingles",
    "word_shingles_of_tokens",
    "char_shingles",
    "char_shingles_of_text",
    "jaccard",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — the canonical form used for
    exact-dup hashing."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def sep_pattern(sep: str) -> str:
    """Regex-escape a LITERAL line separator for ``F.split`` (a Java
    regex): the line operators rejoin with the same ``sep`` as a
    literal, so a metacharacter sep ('|', '.') must split literally
    or the text cannot round-trip."""
    import re as _re

    return _re.escape(sep)


def normalized_distinct_lines(col: Column | str, sep: str = "\n") -> Column:
    """Per-document DISTINCT normalized non-blank lines, materialized
    in-array (map-side — no distinct shuffle): the shared line-identity
    used by template detection in both its batch
    (operators/text.py:template_lines) and streaming
    (streaming/templates.py) forms. One definition so the store's
    counts can never drift from the batch detector's.  ``sep`` is a
    literal (regex-escaped before the split)."""
    return F.array_distinct(
        F.filter(
            F.transform(
                F.split(F.coalesce(_c(col), F.lit("")), sep_pattern(sep)),
                lambda l: F.trim(F.regexp_replace(F.lower(l), r"\s+", " ")),
            ),
            lambda x: x != F.lit(""),
        )
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased text (empty strings removed)."""
    return F.filter(
        F.split(F.lower(_c(col)), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles_of_tokens(toks: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token-array
    column. Hot paths must project ``tokens(text)`` into a real column
    first and pass that attribute here: passing a raw expression inlines
    it into the ``transform`` lambda, so the tokenizing split re-runs
    for every shingle position — O(len²) per document instead of O(len).
    """
    t = _c(toks)
    m = F.size(t)
    full = F.array(F.array_join(t, " "))
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.when(m < n, full).otherwise(grams)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings.

    Built from ``sequence`` + ``transform`` + ``slice`` over the token
    array: JVM-side. Convenience form — tokenization is inlined per
    shingle, so for large corpora project ``tokens()`` first and use
    :func:`word_shingles_of_tokens`.
    """
    return word_shingles_of_tokens(tokens(col), n)


def char_shingles_of_text(s: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles from an ALREADY-MATERIALIZED normalized
    string column (see :func:`word_shingles_of_tokens` for why the
    materialization matters)."""
    s = _c(s)
    m = F.length(s)
    full = F.array(s)
    grams = F.transform(
        F.sequence(F.lit(1), m - F.lit(n - 1)),
        lambda i: F.substring(s, i, F.lit(n)),
    )
    return F.when(m < n, full).otherwise(grams)


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Character n-gram shingles of the normalized text (convenience
    form; hot paths should materialize ``normalized_text`` first)."""
    return char_shingles_of_text(normalized_text(col), n)


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Jaccard similarity of two array columns treated as sets."""
    a, b = F.array_distinct(_c(a)), F.array_distinct(_c(b))
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )

"""Block-level main-content extraction (the jusText family).

:func:`~energy_pandas_spark.operators.text.html_to_text` flattens a
page to text but keeps navigation menus, footers, and link farms —
the boilerplate that dominates crawl HTML by volume. The standard fix
(Pomikálek 2011, jusText; Kohlschütter 2010, Boilerpipe) is
BLOCK-level classification: split the page at block-level tags, score
every block on link density, stopword density, and length, keep the
blocks that look like prose.

This module implements the context-free jusText core with integer
per-mille thresholds:

- ``link_permille`` = 1000 * anchor-text chars div block chars —
  menus and link farms score near 1000, prose near 0;
- ``stop_permille`` = 1000 * stopword tokens div tokens — real
  sentences in the target language carry function words; navigation
  labels and generated noise do not;
- labels: ``short`` (under ``min_words``), ``boilerplate`` (link
  density above ``max_link_permille``), ``good`` (stopword density at
  least ``min_stop_permille``), ``low_text`` (long and link-light but
  stopword-poor — lists, code, tables).

Spark-first shape: everything is ONE map-only codegen projection. The
page splits into a block array, per-block stats run as
``transform``/``filter``/``aggregate`` higher-order functions over it,
and :func:`extract_main_content` re-joins the good blocks WITHOUT ever
exploding — zero shuffle, no Python workers, the 100 TB cost is one
scan. :func:`content_blocks` posexplodes the same structs for the
audit/threshold-tuning view. Per-milles use pure long arithmetic
(``(a - a % b) / b`` on non-negative longs — exact on every engine),
and every pattern lives in the Java∩RE2 shared regex subset so the
DuckDB driver oracles replay the literal same chain (the html_to_text
precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "BLOCK_SPLIT_RE",
    "ANCHOR_INNER_RE",
    "DEFAULT_STOPWORDS",
    "content_blocks",
    "extract_main_content",
]

#: block boundaries: html_to_text's block-level tag list plus the
#: layout containers boilerplate hides in (nav, aside, main, form).
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote"
    r"|section|article|header|footer|nav|aside|main|form)\b[^>]*>"
)

#: inner markup of one anchor element (group 1) — the link-text mass.
ANCHOR_INNER_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"

#: jusText-style function words: the shared en stopword list plus
#: Gopher's required set.
DEFAULT_STOPWORDS: tuple[str, ...] = (
    "a", "and", "be", "for", "have", "in", "is", "it",
    "of", "that", "the", "to", "with",
)


def _clean(c: Column) -> Column:
    """Tag strip + entity decode + whitespace collapse for one block
    (html_to_text's steps 3-5 scoped to a block string)."""
    t = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division of non-negative longs as pure long
    arithmetic — ``(a - a % b) / b`` divides exactly, so the double
    quotient is an integer below 2^53 and the cast never rounds."""
    return ((a - (a % b)) / b).cast("long")


def _validate(
    stopwords: tuple[str, ...],
    min_words: int,
    max_link_permille: int,
    min_stop_permille: int,
) -> None:
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    if not 0 <= max_link_permille <= 1000:
        raise ValueError("max_link_permille must be in [0, 1000]")
    if not 0 <= min_stop_permille <= 1000:
        raise ValueError("min_stop_permille must be in [0, 1000]")
    if not stopwords:
        raise ValueError("stopwords must be non-empty")


def _scored_blocks(
    text_col: str,
    stopwords: tuple[str, ...],
    min_words: int,
    max_link_permille: int,
    min_stop_permille: int,
) -> Column:
    """array<struct> of scored, labeled blocks for one page — the pure
    column expression both public operators share. Empty blocks (pure
    markup gaps) are filtered out; indexes refer to surviving blocks
    in document order."""
    _validate(stopwords, min_words, max_link_permille, min_stop_permille)
    stoplist = F.array(*[F.lit(w) for w in stopwords])

    h = F.coalesce(F.col(text_col), F.lit(""))
    # script/style/comment payloads must vanish BEFORE block splitting
    # or they would score as (garbage) text blocks
    h = F.regexp_replace(h, r"(?is)<script\b.*?</script\s*>", " ")
    h = F.regexp_replace(h, r"(?is)<style\b.*?</style\s*>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    blocks = F.split(h, BLOCK_SPLIT_RE)

    # STAGED transforms — the materialize-once rule. Catalyst does no
    # common-subexpression elimination inside lambda functions, so a
    # single struct-building lambda would re-inline the clean-text
    # regex chain into every field that mentions it (observed: ~20
    # copies per block in the executed plan). Each stage below reads
    # only MATERIALIZED fields of the previous stage's array, so the
    # expensive work (tag strip, tokenize, anchor extraction) runs
    # exactly once per block.
    cleaned = F.transform(
        blocks,
        lambda b: F.struct(
            _clean(b).alias("text"),
            F.aggregate(
                F.transform(
                    F.regexp_extract_all(b, F.lit(ANCHOR_INNER_RE), F.lit(1)),
                    lambda a: F.length(_clean(a)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("n_link_chars"),
        ),
    )
    tokked = F.transform(
        cleaned,
        lambda s: F.struct(
            s["text"].alias("text"),
            F.length(s["text"]).cast("long").alias("n_chars"),
            s["n_link_chars"].alias("n_link_chars"),
            F.filter(
                F.split(F.lower(s["text"]), " "), lambda t: t != F.lit("")
            ).alias("toks"),
        ),
    )
    counted = F.transform(
        tokked,
        lambda s: F.struct(
            s["text"].alias("text"),
            s["n_chars"].alias("n_chars"),
            F.size(s["toks"]).cast("long").alias("n_words"),
            s["n_link_chars"].alias("n_link_chars"),
            F.size(
                F.filter(s["toks"], lambda t: F.array_contains(stoplist, t))
            ).cast("long").alias("n_stop"),
        ),
    )
    scored = F.transform(
        counted,
        lambda s: F.struct(
            s["text"].alias("text"),
            s["n_chars"].alias("n_chars"),
            s["n_words"].alias("n_words"),
            s["n_link_chars"].alias("n_link_chars"),
            _idiv(
                s["n_link_chars"] * 1000, F.greatest(s["n_chars"], F.lit(1))
            ).alias("link_permille"),
            _idiv(
                s["n_stop"] * 1000, F.greatest(s["n_words"], F.lit(1))
            ).alias("stop_permille"),
        ),
    )

    # link density FIRST (jusText): a link-heavy block is boilerplate
    # no matter how short or long it is
    labeled = F.transform(
        scored,
        lambda s: F.struct(
            s["text"].alias("text"),
            s["n_chars"].alias("n_chars"),
            s["n_words"].alias("n_words"),
            s["n_link_chars"].alias("n_link_chars"),
            s["link_permille"].alias("link_permille"),
            s["stop_permille"].alias("stop_permille"),
            F.when(
                s["link_permille"] > max_link_permille, F.lit("boilerplate")
            )
            .when(s["n_words"] < min_words, F.lit("short"))
            .when(s["stop_permille"] >= min_stop_permille, F.lit("good"))
            .otherwise(F.lit("low_text"))
            .alias("label"),
        ),
    )
    return F.filter(labeled, lambda s: s["text"] != F.lit(""))


def content_blocks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_words: int = 5,
    max_link_permille: int = 330,
    min_stop_permille: int = 150,
) -> DataFrame:
    """One row per page block with its stats and label — the audit /
    threshold-tuning view of the extractor: (id, block_idx, text,
    n_chars, n_words, n_link_chars, link_permille, stop_permille,
    label). Map-only split + HOF scoring + posexplode; block_idx
    numbers surviving (non-empty) blocks in document order."""
    scored = _scored_blocks(
        text_col, stopwords, min_words, max_link_permille, min_stop_permille
    )
    return df.select(
        F.col(id_col), F.posexplode(scored).alias("block_idx", "__b")
    ).select(
        id_col,
        F.col("block_idx").cast("int").alias("block_idx"),
        F.col("__b.text").alias("block_text"),
        "__b.n_chars",
        "__b.n_words",
        "__b.n_link_chars",
        "__b.link_permille",
        "__b.stop_permille",
        "__b.label",
    )


def extract_main_content(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "main_content",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_words: int = 5,
    max_link_permille: int = 330,
    min_stop_permille: int = 150,
) -> DataFrame:
    """The page's prose: ``good`` blocks joined with newlines, document
    order preserved. A ZERO-shuffle projection — the scored array is
    filtered and re-joined in place, blocks never explode, so the page
    stays one row end to end (no per-document regroup at any scale)."""
    scored = _scored_blocks(
        text_col, stopwords, min_words, max_link_permille, min_stop_permille
    )
    good = F.filter(scored, lambda s: s["label"] == F.lit("good"))
    return df.withColumn(
        out_col,
        F.array_join(F.transform(good, lambda s: s["text"]), "\n"),
    )

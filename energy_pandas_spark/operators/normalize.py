"""Unicode hygiene for crawl corpora: control/zero-width stripping,
whitespace normalization, mojibake detection + repair, and NFC
normalization.

Crawl text arrives with NBSPs, zero-width joiners, stray C0/C1
controls, UTF-8-decoded-as-cp1252 mojibake ("Ã©", "â€™"), and
un-composed combining sequences — all of which poison exact dedup
(same visible text, different bytes), tokenizers, and n-gram stats.
This module is the hygiene pass that runs before fingerprinting.

Spark-first design:

- Every detection/cleanup pattern is a module constant spelled in the
  Java∩RE2 shared regex subset (``\\x{...}`` codepoint classes, no
  lookaround), so the DuckDB driver oracles replay the LITERAL same
  patterns — the html_to_text precedent.
- :func:`clean_text` / :func:`clean_text_stats` /
  :func:`mojibake_stats` are map-only codegen projections: zero
  shuffle, no Python workers; the 100 TB cost is one scan.
- The repairs (:func:`fix_mojibake`, :func:`nfc_text`) are
  Arrow-batched Python kernels. ``fix_mojibake`` computes its marker
  count JVM-side and the kernel skips unflagged rows, so the Python
  cost is Arrow transfer plus per-char work ONLY on the (rare)
  flagged slice; repair applies only when the whole text round-trips
  cp1252→UTF-8, which makes it exactly invertible and conservative
  (a single legit "Ã" in otherwise-clean text never triggers).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "CONTROL_CLASS",
    "ZERO_WIDTH_CLASS",
    "ALT_SPACE_CLASS",
    "CRLF_PATTERN",
    "SPACE_RUN",
    "EDGE_SPACE",
    "MOJIBAKE_MARKER",
    "cleaned_text",
    "clean_text",
    "clean_text_stats",
    "mojibake_stats",
    "fix_mojibake",
    "nfc_text",
]

# --- shared Java/RE2 patterns (oracles interpolate these verbatim) ----

#: CR or CRLF -> LF (run FIRST so \r never reaches the control strip).
CRLF_PATTERN = r"\x{000D}\x{000A}?"

#: C0 controls except \t \n \r, plus DEL and the C1 block. C1 chars are
#: also mojibake artifacts — run fix_mojibake BEFORE clean_text, or the
#: evidence is stripped.
CONTROL_CLASS = (
    r"[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}"
    r"\x{007F}-\x{009F}]"
)

#: Zero-width space/joiner/non-joiner, word joiner, BOM, soft hyphen.
ZERO_WIDTH_CLASS = r"[\x{200B}-\x{200D}\x{2060}\x{FEFF}\x{00AD}]"

#: Unicode spaces that should become ASCII space (NBSP, ogham mark,
#: en/em/figure/thin/hair spaces, narrow NBSP, MMSP, ideographic).
ALT_SPACE_CLASS = (
    r"[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]"
)

#: Runs of spaces/tabs collapse to one space (newlines survive).
SPACE_RUN = r"[ \x{0009}]+"

#: Spaces hugging a newline are trimmed (per-line trim in one pass).
EDGE_SPACE = r"[ ]*\x{000A}[ ]*"

# cp1252 continuation artifacts: bytes 0x80-0xBF decoded as cp1252 land
# either in U+00A0-U+00BF / C1 (latin-1 fallback for the 5 cp1252
# holes) or in the cp1252 "fancy" block below.
_MOJIBAKE_CONT = (
    r"[\x{0080}-\x{00BF}"
    r"\x{20AC}\x{201A}\x{0192}\x{201E}\x{2026}\x{2020}\x{2021}\x{02C6}"
    r"\x{2030}\x{0160}\x{2039}\x{0152}\x{017D}\x{2018}\x{2019}\x{201C}"
    r"\x{201D}\x{2022}\x{2013}\x{2014}\x{02DC}\x{2122}\x{0161}\x{203A}"
    r"\x{0153}\x{017E}\x{0178}]"
)

#: One UTF-8-as-cp1252 artifact: a 2-byte lead (Â/Ã cover the Latin-1
#: originals U+0080-U+00FF, the overwhelmingly common case) followed by
#: one continuation artifact, or the 3-byte punctuation lead â followed
#: by two ("â€™", "â€œ", "â€“", "â„¢", ...).
MOJIBAKE_MARKER = (
    r"[\x{00C2}\x{00C3}]" + _MOJIBAKE_CONT
    + r"|\x{00E2}" + _MOJIBAKE_CONT + _MOJIBAKE_CONT
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cleaned_text(col: Column | str) -> Column:
    """The cleanup chain as a single column expression: CRLF->LF,
    control/zero-width strip, Unicode-space fold, space-run collapse,
    per-line + outer trim. NULL folds to ''."""
    t = F.coalesce(_col(col), F.lit(""))
    t = F.regexp_replace(t, CRLF_PATTERN, "\n")
    t = F.regexp_replace(t, CONTROL_CLASS, "")
    t = F.regexp_replace(t, ZERO_WIDTH_CLASS, "")
    t = F.regexp_replace(t, ALT_SPACE_CLASS, " ")
    t = F.regexp_replace(t, SPACE_RUN, " ")
    t = F.regexp_replace(t, EDGE_SPACE, "\n")
    return F.trim(t)


def clean_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Normalized-whitespace corpus: the :func:`cleaned_text` chain
    applied in place (or into ``out_col``). Map-only codegen
    projection — zero shuffle, no Python."""
    return df.withColumn(out_col or text_col, cleaned_text(text_col))


def clean_text_stats(
    df: DataFrame, text_col: str = "text", out_col: str = "text_clean"
) -> DataFrame:
    """Cleanup plus the audit counts: how many control / zero-width /
    alternate-space characters each document carried, and whether the
    text changed at all — the "how dirty is this crawl batch" card
    input. Counts are over the RAW text; still one map-only scan."""
    raw = F.coalesce(_col(text_col), F.lit(""))
    # `changed` is computed in the SAME withColumns so it resolves
    # against the RAW text even when out_col == text_col (a trailing
    # withColumn would compare the cleaned text to itself); codegen's
    # subexpression elimination shares the duplicated clean chain
    return df.withColumns(
        {
            "n_ctrl": F.regexp_count(raw, F.lit(CONTROL_CLASS)).cast("long"),
            "n_zero_width": F.regexp_count(
                raw, F.lit(ZERO_WIDTH_CLASS)
            ).cast("long"),
            "n_alt_space": F.regexp_count(
                raw, F.lit(ALT_SPACE_CLASS)
            ).cast("long"),
            "changed": cleaned_text(text_col) != raw,
            out_col: cleaned_text(text_col),
        }
    )


def mojibake_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document mojibake evidence: ``n_mojibake`` occurrences of
    the cp1252 artifact pattern, total char count, and a flag. Pure
    codegen regex count — the cheap JVM-side gate that decides which
    documents the Python repair kernel actually touches."""
    raw = F.coalesce(_col(text_col), F.lit(""))
    return df.withColumns(
        {
            "n_mojibake": F.regexp_count(
                raw, F.lit(MOJIBAKE_MARKER)
            ).cast("long"),
            "n_chars": F.length(raw).cast("long"),
        }
    ).withColumn("mojibake_flag", F.col("n_mojibake") > 0)


# --- repair kernels ---------------------------------------------------

# byte <-> char table for "sloppy cp1252": real cp1252 where defined,
# latin-1 passthrough for the five holes (0x81 0x8D 0x8F 0x90 0x9D) —
# the ftfy convention, and the exact inverse of how broken pipelines
# decode. Built once; shipped inside the kernel closure.
def _sloppy_cp1252_tables() -> tuple[dict[int, int], dict[int, int]]:
    byte_to_cp: dict[int, int] = {}
    for b in range(256):
        try:
            ch = bytes([b]).decode("cp1252")
        except UnicodeDecodeError:
            ch = chr(b)
        byte_to_cp[b] = ord(ch)
    cp_to_byte = {cp: b for b, cp in byte_to_cp.items()}
    return byte_to_cp, cp_to_byte


_BYTE_TO_CP, _CP_TO_BYTE = _sloppy_cp1252_tables()


def _sloppy_encode(s: str) -> bytes | None:
    """Inverse of a sloppy-cp1252 decode; None if any char has no
    byte (then the text was never cp1252-decoded and must not be
    touched)."""
    out = bytearray()
    for ch in s:
        b = _CP_TO_BYTE.get(ord(ch))
        if b is None:
            return None
        out.append(b)
    return bytes(out)


def _fix_text(s: str | None, max_rounds: int) -> str | None:
    """Undo up to ``max_rounds`` of UTF-8-bytes-decoded-as-cp1252.
    Only applies when the WHOLE text encodes back to cp1252 bytes that
    strictly decode as UTF-8 — exactly invertible, conservative on
    mixed/legit text."""
    if s is None:
        return None
    cur = s
    for _ in range(max_rounds):
        b = _sloppy_encode(cur)
        if b is None:
            break
        try:
            nxt = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if nxt == cur:
            break
        cur = nxt
    return cur


def fix_mojibake(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    max_rounds: int = 3,
    min_markers: int = 1,
) -> DataFrame:
    """Repair UTF-8-as-cp1252 mojibake. The marker count
    (:data:`MOJIBAKE_MARKER`) is computed JVM-side; the Arrow kernel
    does per-char work only on rows with >= ``min_markers`` hits, so
    at corpus scale the Python cost is Arrow transfer plus the flagged
    slice. Repair rounds handle double-encoded text; each round
    requires the whole string to round-trip cp1252→UTF-8."""
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    rounds = int(max_rounds)

    @F.pandas_udf("string")
    def _kernel(text: pd.Series, flagged: pd.Series) -> pd.Series:
        out = text.copy()
        mask = flagged.fillna(False).astype(bool) & text.notna()
        if mask.any():
            out[mask] = text[mask].map(lambda s: _fix_text(s, rounds))
        return out

    raw = F.coalesce(_col(text_col), F.lit(""))
    flag = F.regexp_count(raw, F.lit(MOJIBAKE_MARKER)) >= F.lit(
        int(min_markers)
    )
    return df.withColumn(out_col or text_col, _kernel(_col(text_col), flag))


def nfc_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    changed_col: str | None = None,
) -> DataFrame:
    """Unicode normalization (NFC by default; NFKC/NFD/NFKD accepted)
    via an Arrow-batched ``unicodedata.normalize`` kernel — byte-stable
    text for exact dedup and fingerprinting. ``changed_col`` adds a
    flag (computed JVM-side on the kernel output). Determinism note:
    normalization of ASSIGNED codepoints is stabilized by Unicode's
    normalization policy, so Python's unicodedata and DuckDB/utf8proc
    agree on them (the driver oracle uses ``nfc_normalize``)."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")

    @F.pandas_udf("string")
    def _kernel(text: pd.Series) -> pd.Series:
        import unicodedata

        return text.map(
            lambda s: None if s is None else unicodedata.normalize(form, s)
        )

    target = out_col or text_col
    if changed_col is not None and target == text_col:
        raise ValueError(
            "changed_col needs out_col != text_col (the original text "
            "must survive to compare against)"
        )
    out = df.withColumn(target, _kernel(_col(text_col)))
    if changed_col is not None:
        out = out.withColumn(
            changed_col, ~F.col(target).eqNullSafe(_col(text_col))
        )
    return out

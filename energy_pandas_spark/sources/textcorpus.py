"""Raw-text corpus ingestion: turn directories of text files into the
``documents``-shaped table the pipeline operators consume.

Two layouts, both scan-parallel (Spark's text source splits large
files on line boundaries and parallelizes across files):

- ``read_text_corpus(..., doc_per='line')``: one document per line
  (the JSONL-adjacent layout of most web-scale corpora).
- ``doc_per='file'``: one document per file (``wholetext``) — book/
  article corpora. File count is the parallelism bound here.

Document ids are content-addressed (xxhash64 of source + position +
text), so re-ingesting the same corpus yields identical ids —
downstream md5-bucket sampling, packing, and incremental dedup are
rerun-stable with no RNG and no monotonically_increasing_id (which is
partition-layout-dependent and NOT stable across reruns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_text_corpus", "read_jsonl_corpus", "read_csv_corpus"]


def read_text_corpus(
    spark: SparkSession,
    path: str,
    doc_per: str = "line",
    min_chars: int = 1,
) -> DataFrame:
    """Read a text corpus into (doc_id, text, source, n_chars).

    ``doc_id`` is a stable content hash (xxhash64 over source file,
    in-file position, and text) — collision odds are the birthday bound
    on 64 bits (~1e-8 at 1e5 docs; at true 100 TB scale switch the id
    to the md5 hex digest, same construction). ``source`` is the
    originating file. Empty / sub-``min_chars`` documents are dropped.
    """
    if doc_per == "file":
        raw = spark.read.text(path, wholetext=True)
        pos = F.lit(0).cast("long")
    elif doc_per == "line":
        raw = spark.read.text(path)
        pos = F.monotonically_increasing_id()  # salted into the hash only
    else:
        raise ValueError(f"doc_per must be 'line' or 'file', got {doc_per!r}")
    docs = raw.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
        pos.alias("__pos"),
    ).filter(F.length("text") >= min_chars)
    # NOTE on stability: for doc_per='line' the in-file position feeds
    # the hash only to disambiguate REPEATED identical lines in the
    # same file; identical (source, text) pairs at different positions
    # get distinct ids, and the common rerun case (same files, same
    # split planning) reproduces ids exactly. Exact duplicate lines are
    # exactly what dedup_exact downstream removes anyway.
    return docs.select(
        F.xxhash64("source", "__pos", "text").alias("doc_id"),
        "text",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )


def _shape_corpus(
    parsed: DataFrame,
    corrupt,
    text_field: str,
    on_corrupt: str,
    min_chars: int,
) -> DataFrame:
    """Common documents-shaping tail for the structured readers:
    content-addressed ids, n_chars, corrupt-mode filtering — one
    contract for JSONL and CSV."""
    docs = parsed.select(
        "*",
        F.input_file_name().alias("source"),
        F.monotonically_increasing_id().alias("__pos"),  # hash salt only
        corrupt.alias("is_corrupt"),
    ).drop("_corrupt_record")
    if on_corrupt == "drop":
        docs = docs.filter(~F.col("is_corrupt")).drop("is_corrupt")
    elif on_corrupt == "fail":
        # FAILFAST already guarantees no corrupt rows; keep the output
        # schema identical to drop-mode
        docs = docs.drop("is_corrupt")
    keep_cols = [c for c in docs.columns if c not in (text_field, "__pos")]
    out = docs.select(
        F.xxhash64("source", "__pos", F.col(text_field)).alias("doc_id"),
        F.col(text_field).alias("text"),
        F.coalesce(F.length(text_field), F.lit(0)).alias("n_chars"),
        *[c for c in keep_cols if c != "source"],
        "source",
    )
    if min_chars > 0 and on_corrupt != "keep":
        out = out.filter(F.col("n_chars") >= min_chars)
    elif min_chars > 0:
        out = out.filter(F.col("is_corrupt") | (F.col("n_chars") >= min_chars))
    return out


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    schema: str | None = None,
    on_corrupt: str = "drop",
    min_chars: int = 1,
) -> DataFrame:
    """Read a JSONL corpus (one JSON object per line — the dominant
    web-scale interchange layout) into the ``documents`` shape:
    ``(doc_id, text, source, n_chars, *extra-schema-fields)``.

    ``schema`` is a DDL string for the EXTRA fields beyond
    ``text_field`` (e.g. ``"lang STRING, url STRING"``); passing it
    skips Spark's schema-inference pre-scan — at 100 TB the inference
    pass IS a full corpus read, so production always passes a schema.
    Malformed lines are captured permissively into a corrupt-record
    column: ``on_corrupt='drop'`` (default) discards them,
    ``'keep'`` retains them with NULL text and ``is_corrupt=true``
    (for quarantine/audit sinks), ``'fail'`` aborts the read on the
    first bad line (FAILFAST).

    ``doc_id`` is the same content-addressed xxhash64 the text reader
    uses — rerun-stable, no partition-layout dependence."""
    if on_corrupt not in ("drop", "keep", "fail"):
        raise ValueError(f"on_corrupt must be drop/keep/fail, got {on_corrupt!r}")
    ddl = f"{text_field} STRING"
    if schema:
        ddl += f", {schema}"
    reader = spark.read
    if on_corrupt == "fail":
        parsed = reader.schema(ddl).option("mode", "FAILFAST").json(path)
        corrupt = F.lit(False)
    else:
        parsed = (
            reader.schema(ddl + ", _corrupt_record STRING")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
        corrupt = F.col("_corrupt_record").isNotNull()
    return _shape_corpus(parsed, corrupt, text_field, on_corrupt, min_chars)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
    on_corrupt: str = "drop",
    min_chars: int = 1,
) -> DataFrame:
    """Read a CSV/TSV corpus into the ``documents`` shape — the CSV
    twin of :func:`read_jsonl_corpus`, same corrupt-record contract
    (``drop`` / ``keep`` / ``fail``), same content-addressed ids,
    same explicit-schema rule (inference is a full corpus pre-scan).

    ``schema`` is the DDL for the EXTRA columns beyond ``text_field``,
    in file column order when ``header=False``."""
    if on_corrupt not in ("drop", "keep", "fail"):
        raise ValueError(f"on_corrupt must be drop/keep/fail, got {on_corrupt!r}")
    ddl = f"{text_field} STRING"
    if schema:
        ddl += f", {schema}"
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("multiLine", "false")
    )
    if on_corrupt == "fail":
        parsed = reader.schema(ddl).option("mode", "FAILFAST").csv(path)
        corrupt = F.lit(False)
    else:
        parsed = (
            reader.schema(ddl + ", _corrupt_record STRING")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .csv(path)
        )
        corrupt = F.col("_corrupt_record").isNotNull()
    return _shape_corpus(parsed, corrupt, text_field, on_corrupt, min_chars)

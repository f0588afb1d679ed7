"""Raw-text corpus ingestion: turn directories of text files into the
``documents``-shaped table the pipeline operators consume.

Two layouts, both scan-parallel (Spark's text source splits large
files on line boundaries and parallelizes across files):

- ``read_text_corpus(..., doc_per='line')``: one document per line
  (the JSONL-adjacent layout of most web-scale corpora).
- ``doc_per='file'``: one document per file (``wholetext``) — book/
  article corpora. File count is the parallelism bound here.

Document-id stability contract (three tiers, strongest first):

- ``id_field=...`` (JSONL/CSV): the corpus carries its own stable key
  (WARC record id, url, upstream uuid) — ``doc_id`` hashes it. Zero
  extra cost, fully layout-independent. Production corpora should
  always ship a key; this is the 100 TB posture.
- ``stable_ids=True``: ``doc_id = xxhash64(source, text, occ)`` where
  ``occ`` ranks repeated identical ``(source, text)`` lines. The id
  SET is provably independent of Spark's file-split plan: singletons
  (the overwhelming majority) get ``occ=1`` unconditionally, and a
  split-plan change can only permute ``occ`` among lines whose
  ``(source, text)`` is identical — which map to the same id set and
  the same id→content mapping either way. Costs one corpus shuffle at
  ingest (a window keyed on ``(source, text-hash)``).
- default (neither): ``doc_id = xxhash64(source, split-local position,
  text)`` — scan-pure (no shuffle), unique, and stable ONLY while the
  file-split plan is identical (same files, same
  ``spark.sql.files.*`` settings, same parallelism). Fine for
  single-run pipelines; for incremental / cross-run workflows use one
  of the stable tiers, otherwise re-ingesting on a different cluster
  size re-keys the corpus and every id-keyed store (dedup digests,
  band tables, split assignments) silently misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_text_corpus", "read_jsonl_corpus", "read_csv_corpus"]


def _stable_doc_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``__pos`` with a split-plan-independent id:
    ``xxhash64(source, text, occ)`` where ``occ`` = rank of this row
    among identical ``(source, text)`` rows (ordered by the scan
    position). Why the id SET is layout-invariant: a different split
    plan can only reorder rows, so it can only permute ``occ`` among
    rows whose ``(source, text)`` already match — those produce the
    same set of ids bound to the same content either way, and the
    common case (no in-file exact-repeat lines) is ``occ=1``
    everywhere, bit-identical ids.

    Cost/skew: one corpus shuffle keyed on ``(source,
    xxhash64(text))``. A pathological file with a billion identical
    lines lands that key in one window partition — if your corpus
    looks like that, dedup it at the source or use ``id_field``."""
    from pyspark.sql import Window

    # the hash spreads the shuffle; the text column itself is ALSO a
    # partition key so a 64-bit hash collision between two different
    # texts cannot merge their occ rankings (at 1e12 lines, birthday
    # collisions are expected, and a merged ranking would let a
    # split-plan change swap occ between the two texts — breaking the
    # invariance this tier exists to provide)
    occ = F.row_number().over(
        Window.partitionBy(
            "source", F.xxhash64(text_col), F.col(text_col)
        ).orderBy("__pos")
    )
    return docs.withColumn(
        "__id", F.xxhash64("source", text_col, occ.cast("long"))
    ).drop("__pos")


def read_text_corpus(
    spark: SparkSession,
    path: str,
    doc_per: str = "line",
    min_chars: int = 1,
    stable_ids: bool = False,
) -> DataFrame:
    """Read a text corpus into (doc_id, text, source, n_chars).

    ``doc_id`` is a content hash (xxhash64 over source file, position,
    and text) — collision odds are the birthday bound on 64 bits
    (~1e-8 at 1e5 docs; at true 100 TB scale switch the id to the md5
    hex digest, same construction). ``source`` is the originating
    file. Empty / sub-``min_chars`` documents are dropped.

    ``stable_ids=True`` makes the id set independent of the file-split
    plan (one ingest shuffle — see :func:`_stable_doc_id`); the
    default position-salted path is scan-pure but only reproduces ids
    under an identical split plan (see the module docstring)."""
    if doc_per == "file":
        raw = spark.read.text(path, wholetext=True)
        pos = F.lit(0).cast("long")
    elif doc_per == "line":
        raw = spark.read.text(path)
        pos = F.monotonically_increasing_id()  # split-local; hash salt only
    else:
        raise ValueError(f"doc_per must be 'line' or 'file', got {doc_per!r}")
    docs = raw.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
        pos.alias("__pos"),
    ).filter(F.length("text") >= min_chars)
    if stable_ids and doc_per == "line":
        docs = _stable_doc_id(docs).withColumnRenamed("__id", "doc_id")
    else:
        docs = docs.select(
            F.xxhash64("source", "__pos", "text").alias("doc_id"), "text", "source"
        )
    return docs.select(
        "doc_id",
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
    id_field: str | None = None,
    stable_ids: bool = False,
) -> DataFrame:
    """Common documents-shaping tail for the structured readers:
    content-addressed ids, n_chars, corrupt-mode filtering — one
    contract for JSONL and CSV. Id tier (module docstring):
    ``id_field`` > ``stable_ids`` > split-local position salt."""
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
    if id_field is not None:
        # the corpus ships its own stable key — hash it (keeps the
        # BIGINT doc_id contract; xxhash64 of the raw key is as stable
        # as the key itself, and key collisions are the upstream
        # corpus's bug, not a layout artifact)
        doc_id = F.xxhash64(F.col(id_field).cast("string")).alias("doc_id")
        docs = docs.withColumn("__id", doc_id).drop("__pos")
    elif stable_ids:
        docs = _stable_doc_id(docs, text_field)
    else:
        docs = docs.withColumn(
            "__id", F.xxhash64("source", "__pos", F.col(text_field))
        ).drop("__pos")
    keep_cols = [c for c in docs.columns if c not in (text_field, "__id")]
    out = docs.select(
        F.col("__id").alias("doc_id"),
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
    id_field: str | None = None,
    stable_ids: bool = False,
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

    ``doc_id`` follows the module's three-tier stability contract:
    pass ``id_field`` when the corpus carries a stable key (the
    production posture — ``schema`` must declare it), ``stable_ids``
    for a split-plan-independent content id (one ingest shuffle), or
    neither for the scan-pure position-salted id that is only stable
    under an identical split plan."""
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
    return _shape_corpus(
        parsed, corrupt, text_field, on_corrupt, min_chars, id_field, stable_ids
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
    on_corrupt: str = "drop",
    min_chars: int = 1,
    id_field: str | None = None,
    stable_ids: bool = False,
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
    return _shape_corpus(
        parsed, corrupt, text_field, on_corrupt, min_chars, id_field, stable_ids
    )

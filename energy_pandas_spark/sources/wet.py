"""WARC / Common Crawl WET corpus source.

The WARC format (ISO 28500, the public WARC 1.0/1.1 spec — the layout
Common Crawl publishes its ~100 TB-per-snapshot archives in) is a
sequence of records::

    WARC/1.0\r\n
    Header-Name: value\r\n        (repeated)
    \r\n
    <exactly Content-Length payload bytes>
    \r\n\r\n

A ``.warc.wet`` file ("WET" = the text conversion sidecar) starts with
one ``warcinfo`` record and then carries one ``conversion`` record per
page whose payload is the page's extracted UTF-8 text; a raw
``.warc`` file carries ``response`` records whose payload is the full
HTTP response (status line + headers + body). Shards are gzip —
usually one gzip MEMBER per record, concatenated; Python's ``gzip``
decompresses concatenated members as one stream, so both per-record
and whole-file compression parse identically.

Spark-first shape: ``binaryFile`` source (one task per shard — gzip is
unsplittable, and Common Crawl shards are sized ~1 GB for exactly this
one-task-per-shard layout), record parsing + charset decode in an
Arrow ``mapInPandas`` generator that never materializes more than one
shard per task, then the module shapes rows into the standard
``documents`` contract (doc_id, text, n_chars, ...) shared with the
JSONL/CSV readers. ``doc_id`` hashes ``WARC-Record-ID`` (a per-record
UUID the spec requires, so ids are stable across re-ingests and split
plans — the ``id_field`` tier of the reader id contract) and falls
back to a content hash for records without one.

Reference parity note: the reference engine (energy-pandas) has no
crawl source; this extends the engine's source surface for the
training-data pipeline the way readers like webdataset.py do.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "iter_warc_records",
    "encode_warc",
    "read_wet_corpus",
    "stream_wet_corpus",
]

_CRLF = b"\r\n"

#: schema of the raw per-record rows the parser kernel emits
_RECORD_SCHEMA = StructType(
    [
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("warc_type", StringType()),
        StructField("text", StringType()),
        StructField("n_payload_bytes", LongType()),
        StructField("source", StringType()),
    ]
)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` for every record in a decompressed
    WARC/WET byte stream. ``headers`` maps lower-cased header names to
    string values. Pure function of the bytes — no Spark.

    Robustness contract: payload boundaries come ONLY from
    ``Content-Length`` (a payload containing the literal text
    ``WARC/1.0`` cannot desynchronize the parser); a truncated final
    record (shard cut mid-payload) yields nothing for that record and
    stops — the standard treatment for a torn tail.
    """
    n = len(data)
    i = 0
    while i < n:
        # skip inter-record CRLFs (the spec's two-CRLF record gap)
        while data.startswith(_CRLF, i):
            i += 2
        if i >= n:
            return
        eol = data.find(_CRLF, i)
        if eol < 0:
            return  # torn version line
        version = data[i:eol]
        if not version.startswith(b"WARC/"):
            # not at a record boundary (garbage / torn gap): resync to
            # the next version marker or stop
            nxt = data.find(b"\r\nWARC/", i)
            if nxt < 0:
                return
            i = nxt + 2
            continue
        i = eol + 2
        headers: dict[str, str] = {}
        torn = False
        while True:
            eol = data.find(_CRLF, i)
            if eol < 0:
                torn = True
                break
            line = data[i:eol]
            i = eol + 2
            if not line:
                break
            key, _, val = line.partition(b":")
            headers[key.strip().lower().decode("ascii", "replace")] = (
                val.strip().decode("utf-8", "replace")
            )
        if torn:
            return
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        if length < 0:
            return  # malformed length: moving the cursor backward
            # would re-yield earlier records forever — treat as torn
        if i + length > n:
            return  # torn payload
        yield headers, data[i : i + length]
        i += length


def _decompress(content: bytes) -> bytes:
    """gzip-sniff (magic ``1f 8b``) and decompress; multi-member
    streams (Common Crawl's record-per-member layout) decode as one
    stream. Plain bytes pass through."""
    if content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)
    return content


def encode_warc(records: list[tuple[str, str, str, str]]) -> bytes:
    """Encode ``(record_id, url, date, text)`` tuples as an
    uncompressed WET byte stream (``conversion`` records) — the exact
    inverse of :func:`iter_warc_records` for those fields, used by the
    round-trip tests and the driver's oracle query. Deterministic:
    header order is fixed, lengths are exact UTF-8 byte counts."""
    out = bytearray()
    for record_id, url, date, text in records:
        payload = text.encode("utf-8")
        out += b"WARC/1.0\r\n"
        out += b"WARC-Type: conversion\r\n"
        # UTF-8, not ascii: IRIs with non-ASCII characters are routine
        # in crawl data, and the parser decodes headers as UTF-8
        out += f"WARC-Record-ID: {record_id}\r\n".encode("utf-8")
        out += f"WARC-Target-URI: {url}\r\n".encode("utf-8")
        out += f"WARC-Date: {date}\r\n".encode("utf-8")
        out += f"Content-Length: {len(payload)}\r\n".encode("ascii")
        out += b"\r\n"
        out += payload
        out += b"\r\n\r\n"
    return bytes(out)


def _strip_http(payload: bytes) -> bytes:
    """For ``response`` records the payload is the raw HTTP response;
    the body starts after the first blank line. Headerless payloads
    pass through unchanged."""
    if payload[:5] in (b"HTTP/", b"http/"):
        cut = payload.find(b"\r\n\r\n")
        if cut >= 0:
            return payload[cut + 4 :]
    return payload


def read_wet_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    min_chars: int = 1,
) -> DataFrame:
    """Read WARC/WET shards into the ``documents`` contract:
    ``(doc_id, text, n_chars, url, warc_date, record_id, source)``.

    ``record_types`` selects which WARC record types become documents:
    ``("conversion",)`` for WET text sidecars (default),
    ``("response",)`` for raw WARC crawls — response payloads are
    cut at the HTTP header/body boundary, and the body typically then
    feeds :func:`~energy_pandas_spark.operators.text.html_to_text`.
    ``warcinfo``/``request``/``metadata`` records never become
    documents.

    Scale shape: one task per shard (``binaryFile``; gzip shards are
    unsplittable by design and Common Crawl sizes them for it — at
    1000 executors, 64k shards per snapshot keeps every core fed);
    records stream out of the parser generator, so a task holds one
    decompressed shard plus one Arrow batch, not the whole snapshot.
    ``doc_id`` hashes ``WARC-Record-ID`` (spec-mandated UUID —
    re-ingest-stable, the ``id_field`` reader tier) with a
    content-hash fallback for nonconforming records.
    """
    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return _parse_and_shape(raw, record_types, min_chars)


def stream_wet_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    min_chars: int = 1,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_wet_corpus`: WET shards landing
    in ``path`` become a STREAMING documents frame — the front end of
    a continuously-growing deduplicated corpus when composed with the
    ingest sinks (``streaming/ingest.py:neardup_ingest``,
    ``streaming/line_ingest.py``, ``streaming/winnow_ingest.py``),
    which handle replay-idempotent landing per micro-batch.

    ``max_files_per_trigger`` rate-limits each micro-batch (shards are
    whole-file work units, so this IS the batch size knob); the file
    source tracks processed shards in the checkpoint, so a crawl
    delivering shards continuously is ingested exactly once.
    """
    reader = (
        spark.readStream.format("binaryFile")
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        .schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length LONG, content BINARY"
        )
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path).select("path", "content")
    return _parse_and_shape(raw, record_types, min_chars)


def _parse_and_shape(
    raw: DataFrame,
    record_types: tuple[str, ...],
    min_chars: int,
) -> DataFrame:
    """Shared parse kernel + documents-shaping tail for the batch and
    streaming readers (``raw`` = (path, content) rows, one per shard;
    works identically on a static or streaming frame since the kernel
    is stateless per shard)."""
    wanted = tuple(t.lower() for t in record_types)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for raw_path, content in zip(pdf["path"], pdf["content"]):
                rows: list[tuple] = []
                data = _decompress(bytes(content))
                for headers, payload in iter_warc_records(data):
                    rtype = headers.get("warc-type", "").lower()
                    if rtype not in wanted:
                        continue
                    if rtype == "response":
                        payload = _strip_http(payload)
                    rows.append(
                        (
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            rtype,
                            payload.decode("utf-8", "replace"),
                            len(payload),
                            raw_path,
                        )
                    )
                    if len(rows) >= 2048:
                        yield pd.DataFrame(
                            rows, columns=_RECORD_SCHEMA.fieldNames()
                        )
                        rows = []
                if rows:
                    yield pd.DataFrame(
                        rows, columns=_RECORD_SCHEMA.fieldNames()
                    )

    parsed = raw.mapInPandas(parse, _RECORD_SCHEMA)
    # NOT coalesce(xxhash64(record_id), ...): Spark's xxhash64 maps
    # NULL to the seed (42), never to NULL, so a coalesce would give
    # every id-less record the same doc_id
    out = parsed.select(
        F.when(
            F.col("record_id").isNotNull(), F.xxhash64("record_id")
        )
        .otherwise(F.xxhash64("source", "url", "text"))
        .alias("doc_id"),
        "text",
        F.length("text").cast("long").alias("n_chars"),
        "url",
        "warc_date",
        "record_id",
        "source",
    )
    if min_chars > 0:
        out = out.filter(F.col("n_chars") >= min_chars)
    return out

"""WARC/WET source tests: pure-bytes parser contract, gzip member
layouts, HTTP stripping for raw WARC, and the distributed reader's
documents shape + id stability."""

from __future__ import annotations

import gzip
import os

import pytest

from energy_pandas_spark.sources.wet import (
    encode_warc,
    iter_warc_records,
    read_wet_corpus,
    stream_wet_corpus,
)

REC = [
    ("<urn:uuid:0001>", "http://a.example/x", "2024-01-01T00:00:00Z", "hello world"),
    ("<urn:uuid:0002>", "http://b.example/y", "2024-01-02T00:00:00Z", "ünïcode tëxt"),
    # payload that CONTAINS a record marker — must not desync
    ("<urn:uuid:0003>", "http://c.example/z", "2024-01-03T00:00:00Z",
     "sneaky\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\nnot a record"),
]


class TestParser:
    def test_roundtrip(self):
        recs = list(iter_warc_records(encode_warc(REC)))
        assert len(recs) == 3
        for (rid, url, date, text), (h, payload) in zip(REC, recs):
            assert h["warc-record-id"] == rid
            assert h["warc-target-uri"] == url
            assert h["warc-date"] == date
            assert h["warc-type"] == "conversion"
            assert payload.decode("utf-8") == text
            assert int(h["content-length"]) == len(text.encode("utf-8"))

    def test_torn_tail_dropped(self):
        data = encode_warc(REC)
        # cut mid-payload of the last record: first two still parse
        torn = data[: data.rfind(b"sneaky") + 3]
        recs = list(iter_warc_records(torn))
        assert [h["warc-record-id"] for h, _ in recs] == [
            "<urn:uuid:0001>", "<urn:uuid:0002>"]

    def test_garbage_gap_resync(self):
        a = encode_warc(REC[:1])
        b = encode_warc(REC[1:2])
        recs = list(iter_warc_records(a + b"\r\njunk bytes\r\n" + b))
        assert [h["warc-record-id"] for h, _ in recs] == [
            "<urn:uuid:0001>", "<urn:uuid:0002>"]

    def test_empty_and_blank(self):
        assert list(iter_warc_records(b"")) == []
        assert list(iter_warc_records(b"\r\n\r\n")) == []

    def test_negative_content_length_terminates(self):
        # a malformed negative length must not move the cursor
        # backward (infinite re-yield of earlier records)
        bad = (
            encode_warc(REC[:1])
            + b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Record-ID: <urn:uuid:bad>\r\n"
            b"Content-Length: -1000000\r\n\r\n"
            + encode_warc(REC[1:2])
        )
        recs = list(iter_warc_records(bad))
        assert [h["warc-record-id"] for h, _ in recs] == ["<urn:uuid:0001>"]

    def test_non_ascii_uri_roundtrip(self):
        rec = [("<urn:uuid:0009>", "http://exämple.com/π", "2024-01-01T00:00:00Z", "body")]
        (h, p), = iter_warc_records(encode_warc(rec))
        assert h["warc-target-uri"] == "http://exämple.com/π"
        assert p == b"body"


def _write(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


@pytest.fixture(scope="module")
def wet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wet")
    plain = encode_warc(REC[:2])
    # shard 1: whole-stream gzip
    _write(os.path.join(d, "s1.warc.wet.gz"), gzip.compress(plain))
    # shard 2: one gzip MEMBER per record (the Common Crawl layout)
    members = b"".join(
        gzip.compress(encode_warc([r])) for r in REC[2:]
    )
    _write(os.path.join(d, "s2.warc.wet.gz"), members)
    # shard 3: uncompressed, with a warcinfo record that must be skipped
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    )
    _write(os.path.join(d, "s3.warc.wet"), info + encode_warc(REC[:1]))
    return str(d)


class TestReader:
    def test_documents_shape(self, spark, wet_dir):
        df = read_wet_corpus(spark, wet_dir)
        rows = {r["record_id"]: r for r in df.collect()}
        # uuid 0001 appears in s1 AND s3 -> 4 total rows
        assert df.count() == 4
        assert df.columns == [
            "doc_id", "text", "n_chars", "url", "warc_date", "record_id",
            "source"]
        r2 = rows["<urn:uuid:0002>"]
        assert r2["text"] == "ünïcode tëxt"
        assert r2["n_chars"] == len("ünïcode tëxt")
        assert r2["url"] == "http://b.example/y"

    def test_ids_stable_across_reread(self, spark, wet_dir):
        a = sorted(r["doc_id"] for r in read_wet_corpus(spark, wet_dir).collect())
        b = sorted(r["doc_id"] for r in read_wet_corpus(spark, wet_dir).collect())
        assert a == b
        # record-id-addressed: the same record in two shards hashes equal
        df = read_wet_corpus(spark, wet_dir)
        ids = [r["doc_id"] for r in df.filter(
            df.record_id == "<urn:uuid:0001>").collect()]
        assert len(ids) == 2 and ids[0] == ids[1]

    def test_min_chars(self, spark, wet_dir):
        assert read_wet_corpus(spark, wet_dir, min_chars=13).count() == 1

    def test_stream_equals_batch(self, spark, wet_dir, tmp_path):
        batches = []
        q = (
            stream_wet_corpus(
                spark, wet_dir + "/*.wet*", max_files_per_trigger=1
            )
            .writeStream.foreachBatch(
                lambda b, bid: batches.append((bid, b.collect()))
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # one shard per micro-batch (the rate-limit knob)
        assert len([b for _, b in batches if b]) == 3
        streamed = sorted(
            (r["doc_id"], r["text"]) for _, b in batches for r in b
        )
        batch = sorted(
            (r["doc_id"], r["text"])
            for r in read_wet_corpus(spark, wet_dir).collect()
        )
        assert streamed == batch

    def test_idless_records_get_distinct_content_ids(self, spark, tmp_path):
        # records WITHOUT WARC-Record-ID must hash their content, not
        # all collapse to xxhash64(NULL) = 42
        recs = b"".join(
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            + f"WARC-Target-URI: http://x/{i}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body + b"\r\n\r\n"
            for i, body in enumerate([b"first body", b"second body"])
        )
        _write(os.path.join(tmp_path, "noid.warc.wet"), recs)
        df = read_wet_corpus(spark, str(tmp_path))
        ids = [r["doc_id"] for r in df.collect()]
        assert len(ids) == 2 and ids[0] != ids[1]
        assert 42 not in ids

    def test_response_http_strip(self, spark, tmp_path):
        body = "<html><body>hi</body></html>"
        http = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        ).encode()
        rec = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:9999>\r\n"
            b"WARC-Target-URI: http://d.example/\r\n"
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
            + http + b"\r\n\r\n"
        )
        _write(os.path.join(tmp_path, "r.warc.gz"), gzip.compress(rec))
        wet = read_wet_corpus(spark, str(tmp_path))
        assert wet.count() == 0  # conversion-only by default
        warc = read_wet_corpus(
            spark, str(tmp_path), record_types=("response",))
        row = warc.collect()[0]
        assert row["text"] == body
        assert row["n_chars"] == len(body)

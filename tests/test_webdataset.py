"""WebDataset tar shard sink: grouping, determinism, round-trip."""

from __future__ import annotations

import json
import tarfile

from pyspark.sql import Row

from energy_pandas_spark.sources.webdataset import (
    read_webdataset_manifest,
    write_webdataset,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=f"document number {i}",
                meta={"lang": "en", "i": str(i)},
                payload=bytes([i % 256, 255 - i % 256]),
            )
            for i in range(40)
        ]
    )


def test_webdataset_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        _df(spark), out, "doc_id",
        {"text": "txt", "meta": "json", "payload": "bin"}, n_shards=4,
    )
    rows = manifest.orderBy("shard").collect()
    assert sum(r.n_samples for r in rows) == 40
    assert len(rows) == 4
    seen = {}
    for r in rows:
        with tarfile.open(str(tmp_path / "wds" / r.file)) as tar:
            names = tar.getnames()
            # members for one key are consecutive: txt, json, bin triplets
            assert len(names) == r.n_samples * 3
            for k in range(0, len(names), 3):
                base = names[k].rsplit(".", 1)[0]
                assert {n.rsplit(".", 1)[1] for n in names[k:k+3]} == {
                    "txt", "json", "bin"
                }
                assert all(n.rsplit(".", 1)[0] == base for n in names[k:k+3])
                txt = tar.extractfile(base + ".txt").read().decode()
                meta = json.loads(tar.extractfile(base + ".json").read())
                payload = tar.extractfile(base + ".bin").read()
                i = int(base)
                assert txt == f"document number {i}"
                assert meta["i"] == str(i)
                assert payload == bytes([i % 256, 255 - i % 256])
                seen[i] = True
    assert len(seen) == 40


def test_webdataset_bit_identical_reruns(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_webdataset(_df(spark), a, "doc_id", {"text": "txt"}, n_shards=3)
    m2 = write_webdataset(
        _df(spark).repartition(11), b, "doc_id", {"text": "txt"}, n_shards=3
    )
    h1 = {r.shard: r.sha256 for r in m1.collect()}
    h2 = {r.shard: r.sha256 for r in m2.collect()}
    assert h1 == h2
    for shard, file in ((r.shard, r.file) for r in m1.collect()):
        assert (tmp_path / "a" / file).read_bytes() == (
            tmp_path / "b" / file
        ).read_bytes()


def test_webdataset_manifest_persisted(spark, tmp_path):
    out = str(tmp_path / "wds")
    written = write_webdataset(_df(spark), out, "doc_id", {"text": "txt"}, n_shards=2)
    loaded = read_webdataset_manifest(spark, out)
    assert sorted(map(tuple, written.collect())) == sorted(
        map(tuple, loaded.collect())
    )


def test_webdataset_read_roundtrip(spark, tmp_path):
    from energy_pandas_spark.sources.webdataset import read_webdataset

    out = str(tmp_path / "wds_rt")
    df = _df(spark)
    write_webdataset(
        df, out, "doc_id",
        {"text": "txt", "meta": "json", "payload": "bin"}, n_shards=3,
    )
    back = read_webdataset(
        spark, out, {"text": "txt", "meta": "json", "payload": "bin"}
    )
    rows = {r.key: r for r in back.collect()}
    assert len(rows) == 40
    for r in df.collect():
        got = rows[r.doc_id]
        assert got.text == r.text
        assert json.loads(got.meta) == dict(r.meta)
        assert bytes(got.payload) == bytes(r.payload)

"""Megatron-style indexed-binary dataset sink (sources/indexed_dataset.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from energy_pandas_spark.sources.indexed_dataset import (
    DTYPE_CODES,
    read_indexed_dataset,
    write_indexed_dataset,
)


def _df(spark, n=40, dtype_max=30_000):
    rows = [
        (i, [((i * 37 + j * 13) % dtype_max) for j in range(3 + i % 9)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>"), dict(rows)


def test_round_trip_and_determinism(spark, tmp_path):
    df, want = _df(spark)
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    m1 = write_indexed_dataset(df, p1, "doc_id", n_shards=4).collect()
    m2 = write_indexed_dataset(df.repartition(7), p2, "doc_id", n_shards=4).collect()
    # bit-identical shards across reruns and input partitionings
    assert sorted((r.shard, r.bin_sha256, r.idx_sha256) for r in m1) == sorted(
        (r.shard, r.bin_sha256, r.idx_sha256) for r in m2
    )
    assert sum(r.n_seqs for r in m1) == len(want)
    assert sum(r.n_tokens for r in m1) == sum(len(v) for v in want.values())

    back = read_indexed_dataset(spark, p1).collect()
    got = sorted(tuple(r.token_ids) for r in back)
    assert got == sorted(tuple(v) for v in want.values())


def test_idx_header_matches_public_format(spark, tmp_path):
    df, want = _df(spark, n=10)
    p = str(tmp_path / "d")
    write_indexed_dataset(df, p, "doc_id", n_shards=1, dtype="int32").collect()
    raw = open(str(tmp_path / "d" / "shard-00000.idx"), "rb").read()
    assert raw[:9] == b"MMIDIDX\x00\x00"
    version, = struct.unpack_from("<Q", raw, 9)
    code, = struct.unpack_from("<B", raw, 17)
    n, = struct.unpack_from("<Q", raw, 18)
    ndoc, = struct.unpack_from("<Q", raw, 26)
    assert (version, code, n, ndoc) == (1, DTYPE_CODES["int32"], 10, 11)
    sizes = np.frombuffer(raw, dtype="<i4", count=n, offset=34)
    pointers = np.frombuffer(raw, dtype="<i8", count=n, offset=34 + 4 * n)
    doc_idx = np.frombuffer(raw, dtype="<i8", count=n + 1,
                            offset=34 + 4 * n + 8 * n)
    assert sorted(sizes.tolist()) == sorted(len(v) for v in want.values())
    # pointers are the exact cumulative byte offsets
    assert pointers.tolist() == np.concatenate(
        [[0], np.cumsum(sizes[:-1]) * 4]
    ).tolist()
    assert doc_idx.tolist() == list(range(n + 1))
    # bin length = total tokens * itemsize
    binlen = len(open(str(tmp_path / "d" / "shard-00000.bin"), "rb").read())
    assert binlen == int(sizes.sum()) * 4


def test_dtype_range_check_and_validation(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [70000])], "doc_id long, token_ids array<int>"
    )
    with pytest.raises(Exception, match="out of range"):
        write_indexed_dataset(
            df, str(tmp_path / "x"), "doc_id", dtype="uint16", n_shards=1
        ).collect()
    with pytest.raises(ValueError):
        write_indexed_dataset(df, str(tmp_path / "y"), "doc_id", dtype="int13")
    with pytest.raises(ValueError):
        write_indexed_dataset(df, str(tmp_path / "z"), "doc_id", n_shards=0)


def test_uint16_and_empty_sequences(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [0, 65535]), (2, []), (3, None)],
        "doc_id long, token_ids array<int>",
    )
    p = str(tmp_path / "u16")
    m = write_indexed_dataset(df, p, "doc_id", dtype="uint16", n_shards=1).collect()
    assert m[0].n_seqs == 3 and m[0].n_tokens == 2
    back = sorted(tuple(r.token_ids) for r in read_indexed_dataset(spark, p).collect())
    assert back == [(), (), (0, 65535)]

"""Indexed-binary token-dataset sink (the public Megatron-LM /
fairseq ``MMapIndexedDataset`` layout: a ``.bin`` of concatenated
token arrays plus a ``.idx`` with sizes/pointers/doc boundaries —
the format GPU training loaders memory-map directly).

Layout per shard, from the public format description
(NVIDIA/Megatron-LM ``megatron/core/datasets/indexed_dataset.py``):

``{name}.bin``  — every sequence's tokens back to back, fixed dtype,
                  little-endian.
``{name}.idx``  — magic ``MMIDIDX\\x00\\x00`` (9 bytes), version
                  ``<Q`` = 1, dtype code ``<B``, sequence count
                  ``<Q``, doc-index length ``<Q``, then sizes
                  (``<i4`` per sequence), pointers (``<i8`` byte
                  offsets into ``.bin``), and the doc index
                  (``<i8``, here ``0..n`` — one document per
                  sequence).

Scale shape and determinism match the WebDataset sink: a pure
``md5(key) % n_shards`` assignment (reruns and cluster resizes never
move a sample), md5-of-key order inside a shard, one ``applyInPandas``
kernel per shard writing through plain ``open()`` (the single marked
IO site — swap an fsspec open for object stores). Shard bytes are
BIT-IDENTICAL across reruns; the manifest carries sha256 of both
files per shard.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_indexed_dataset", "read_indexed_dataset", "DTYPE_CODES"]

_MAGIC = b"MMIDIDX\x00\x00"
# the public format's dtype code table
DTYPE_CODES = {
    "uint8": 1,
    "int8": 2,
    "int16": 3,
    "int32": 4,
    "int64": 5,
    "float32": 6,
    "float64": 7,
    "uint16": 8,
}
_CODE_DTYPES = {v: k for k, v in DTYPE_CODES.items()}

_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("n_seqs", LongType()),
        StructField("n_tokens", LongType()),
        StructField("bin_bytes", LongType()),
        StructField("bin_sha256", StringType()),
        StructField("idx_sha256", StringType()),
        StructField("file", StringType()),
    ]
)


def write_indexed_dataset(
    df: DataFrame,
    path: str,
    key_col: str,
    tokens_col: str = "token_ids",
    n_shards: int = 8,
    dtype: str = "int32",
    name_pattern: str = "shard-{shard:05d}",
) -> DataFrame:
    """Write ``tokens_col`` (``array<int>``/``array<long>``) as
    Megatron-style ``.bin``/``.idx`` shard pairs under ``path`` and
    return the shard manifest DataFrame. Keys must be unique; token
    values must fit ``dtype`` (checked in the kernel — a vocab id
    overflowing the dtype corrupts training data silently otherwise).
    """
    if dtype not in DTYPE_CODES:
        raise ValueError(f"dtype must be one of {sorted(DTYPE_CODES)}, got {dtype}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    os.makedirs(path, exist_ok=True)
    np_dtype = np.dtype(dtype).newbyteorder("<")
    code = DTYPE_CODES[dtype]
    src = (
        df.select(
            F.col(key_col).cast("string").alias("__key"),
            F.col(tokens_col).alias("__toks"),
        )
        .withColumn(
            "__h",
            F.conv(F.substring(F.md5(F.col("__key")), 1, 15), 16, 10).cast(
                "long"
            ),
        )
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["__h", "__key"], kind="mergesort")
        name = name_pattern.format(shard=shard)
        bin_path = os.path.join(path, name + ".bin")
        idx_path = os.path.join(path, name + ".idx")
        sizes, pointers, n_tokens = [], [], 0
        info = np.iinfo(np_dtype) if np_dtype.kind in "iu" else None
        # single marked IO site: swap for an fsspec open() on object stores
        with open(bin_path, "wb") as binf:
            offset = 0
            for toks in pdf["__toks"]:
                arr = np.asarray(
                    [] if toks is None else list(toks), dtype="int64"
                )
                if info is not None and arr.size and (
                    arr.min() < info.min or arr.max() > info.max
                ):
                    raise ValueError(
                        f"token id out of range for dtype {dtype}: "
                        f"[{arr.min()}, {arr.max()}]"
                    )
                out = arr.astype(np_dtype)
                binf.write(out.tobytes())
                pointers.append(offset)
                sizes.append(arr.size)
                offset += out.nbytes
                n_tokens += int(arr.size)
        n = len(sizes)
        with open(idx_path, "wb") as idxf:
            idxf.write(_MAGIC)
            idxf.write(struct.pack("<Q", 1))
            idxf.write(struct.pack("<B", code))
            idxf.write(struct.pack("<Q", n))
            idxf.write(struct.pack("<Q", n + 1))
            idxf.write(np.asarray(sizes, dtype="<i4").tobytes())
            idxf.write(np.asarray(pointers, dtype="<i8").tobytes())
            idxf.write(np.arange(n + 1, dtype="<i8").tobytes())

        def sha(p):
            d = hashlib.sha256()
            with open(p, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    d.update(chunk)
            return d.hexdigest()

        return pd.DataFrame(
            {
                "shard": [shard],
                "n_seqs": [n],
                "n_tokens": [n_tokens],
                "bin_bytes": [os.path.getsize(bin_path)],
                "bin_sha256": [sha(bin_path)],
                "idx_sha256": [sha(idx_path)],
                "file": [name],
            }
        )

    return src.groupBy("shard").applyInPandas(write_shard, _MANIFEST_SCHEMA)


_READ_SCHEMA = StructType(
    [
        StructField("shard_file", StringType()),
        StructField("seq_idx", LongType()),
        StructField("token_ids", ArrayType(LongType())),
    ]
)


def read_indexed_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.idx``/``.bin`` shard pairs back as ``(shard_file,
    seq_idx, token_ids)`` — one task per shard (shard count = read
    parallelism, the loader convention; same contract as the
    WebDataset reader). Token ids widen to long regardless of the
    stored dtype."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.idx")
        .load(path)
    )

    def parse(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                raw = row["content"]
                fpath = row["path"]
                local = fpath[len("file:"):] if fpath.startswith("file:") else fpath
                if raw[: len(_MAGIC)] != _MAGIC:
                    raise ValueError(f"not an indexed-dataset idx file: {fpath}")
                off = len(_MAGIC)
                (version,) = struct.unpack_from("<Q", raw, off); off += 8
                if version != 1:
                    raise ValueError(f"unsupported idx version {version} in {fpath}")
                (code,) = struct.unpack_from("<B", raw, off); off += 1
                (n,) = struct.unpack_from("<Q", raw, off); off += 8
                (_ndoc,) = struct.unpack_from("<Q", raw, off); off += 8
                sizes = np.frombuffer(raw, dtype="<i4", count=n, offset=off)
                off += 4 * n
                pointers = np.frombuffer(raw, dtype="<i8", count=n, offset=off)
                dt = np.dtype(_CODE_DTYPES[code]).newbyteorder("<")
                bin_path = local[: -len(".idx")] + ".bin"
                with open(bin_path, "rb") as f:
                    data = f.read()
                name = os.path.basename(local)[: -len(".idx")]
                out = []
                for i in range(n):
                    start = int(pointers[i])
                    cnt = int(sizes[i])
                    arr = np.frombuffer(
                        data, dtype=dt, count=cnt, offset=start
                    ).astype("int64")
                    out.append((name, i, arr.tolist()))
                yield pd.DataFrame(
                    out, columns=["shard_file", "seq_idx", "token_ids"]
                )

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)

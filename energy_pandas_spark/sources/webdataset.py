"""WebDataset-style tar shard sink (public format: tar archives whose
members group by basename — ``{key}.txt``, ``{key}.json``,
``{key}.bin`` — consumed sequentially by training data loaders).

Scale shape: one hash shuffle assigns every sample to its shard
(``md5(key) % n_shards`` — a pure function, so re-runs and cluster
resizes never move a sample), then each shard group streams through an
``applyInPandas`` kernel that writes ONE tar per shard. Member order
inside a tar is the md5-of-key order (rerun-stable global shuffle, the
write_training_shards convention) and all tar metadata (mtime, uid,
mode) is pinned, so shard files are BIT-IDENTICAL across reruns —
verifiable by checksum, cacheable by content hash.

The kernel writes via plain ``open()`` under ``path``: local
filesystem or any mounted shared store (NFS/FUSE). Production object-
store writers swap in an fsspec-style open at the single marked call
site; the planning, assignment, and determinism contract is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import io
import tarfile
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["write_webdataset", "read_webdataset", "read_webdataset_manifest"]

_MANIFEST_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("file", StringType()),
    ]
)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    columns: dict[str, str],
    n_shards: int = 8,
    name_pattern: str = "shard-{shard:05d}.tar",
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path`` and return
    the (small) shard manifest as a DataFrame.

    ``columns`` maps DataFrame column -> member extension, e.g.
    ``{"text": "txt", "meta": "json", "payload": "bin"}``. Binary
    columns are written as-is; strings as UTF-8; anything else is
    JSON-encoded. Member names are ``{key}.{ext}`` with the key
    rendered as a string — keys must be unique per row.

    Determinism contract: identical input -> bit-identical tar bytes
    (pinned mtime/uid/gid/mode, md5-of-key member order, pure-function
    shard assignment)."""
    os.makedirs(path, exist_ok=True)
    col_exts = dict(columns)
    if len(set(col_exts.values())) != len(col_exts):
        raise ValueError(
            f"duplicate member extensions in {col_exts!r}: WebDataset "
            "members are addressed {key}.{ext}, so each column needs a "
            "distinct extension"
        )
    src = (
        df.select(F.col(key_col).cast("string").alias("__key"), *col_exts)
        .withColumn(
            "__h",
            F.conv(F.substring(F.md5(F.col("__key")), 1, 15), 16, 10).cast("long"),
        )
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["__h", "__key"], kind="mergesort")
        fname = name_pattern.format(shard=shard)
        full = os.path.join(path, fname)
        # single marked IO site: swap for an fsspec open() on object stores
        with open(full, "wb") as raw:
            with tarfile.open(fileobj=raw, mode="w") as tar:
                for _, row in pdf.iterrows():
                    for col, ext in col_exts.items():
                        val = row[col]
                        if isinstance(val, (bytes, bytearray)):
                            data = bytes(val)
                        elif isinstance(val, str):
                            data = val.encode("utf-8")
                        else:
                            data = json.dumps(
                                val, sort_keys=True, default=str
                            ).encode("utf-8")
                        info = tarfile.TarInfo(name=f"{row['__key']}.{ext}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.mode = 0o644
                        tar.addfile(info, io.BytesIO(data))
        digest = hashlib.sha256()
        with open(full, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                digest.update(chunk)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [os.path.getsize(full)],
                "sha256": [digest.hexdigest()],
                "file": [fname],
            }
        )

    manifest = (
        src.repartition(n_shards, F.col("shard"))
        .groupBy("shard")
        .applyInPandas(write_shard, schema=_MANIFEST_SCHEMA)
    )
    # materialize (the write is the side effect) and pin the manifest
    rows = manifest.collect()
    spark = df.sparkSession
    out = spark.createDataFrame(rows, schema=_MANIFEST_SCHEMA)
    out.toPandas().to_json(
        os.path.join(path, "manifest.json"), orient="records"
    )
    return out


def read_webdataset_manifest(spark, path: str) -> DataFrame:
    """Load the manifest written next to the shards."""
    pdf = pd.read_json(os.path.join(path, "manifest.json"), orient="records")
    if pdf.empty:
        return spark.createDataFrame([], schema=_MANIFEST_SCHEMA)
    return spark.createDataFrame(pdf, schema=_MANIFEST_SCHEMA)


def read_webdataset(
    spark,
    path: str,
    columns: dict[str, str],
    key_type: str = "long",
) -> DataFrame:
    """Read WebDataset tar shards back into a DataFrame — the loader
    side of :func:`write_webdataset`. ``columns`` maps output column ->
    member extension (the writer's mapping); ``.txt`` members decode as
    UTF-8 strings, ``.json`` as parsed objects (returned as JSON
    strings for schema stability), anything else stays binary.

    Plan shape: Spark's ``binaryFile`` source lists the shard files
    (one task per tar — shard count IS the parallelism, exactly how
    WebDataset loaders consume shards), and an Arrow kernel streams
    each tar's members grouped by basename. No shuffle; column pruning
    applies downstream."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    col_exts = dict(columns)
    fields = [
        StructField(
            "key",
            LongType() if key_type == "long" else StringType(),
        )
    ]
    for col, ext in col_exts.items():
        # type by the FINAL suffix so multi-part extensions
        # ("score.txt", "seg.json") decode as text too
        suffix = ext.rsplit(".", 1)[-1]
        fields.append(
            StructField(
                col, StringType() if suffix in ("txt", "json") else BinaryType()
            )
        )
    schema = StructType(fields)

    def parse(it):
        for pdf in it:
            out: dict[str, list] = {f.name: [] for f in fields}
            for blob in pdf["content"]:
                samples: dict[str, dict] = {}
                order: list[str] = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for member in tar:
                        if not member.isfile() or "." not in member.name:
                            continue
                        # WebDataset convention: the key is everything
                        # up to the FIRST period, the extension the rest
                        # (multi-part extensions like "seg.json" work)
                        base, ext = member.name.split(".", 1)
                        if base not in samples:
                            samples[base] = {}
                            order.append(base)
                        samples[base][ext] = tar.extractfile(member).read()
                for base in order:
                    got = samples[base]
                    out["key"].append(
                        int(base) if key_type == "long" else base
                    )
                    for col, ext in col_exts.items():
                        raw = got.get(ext)
                        if raw is None:
                            out[col].append(None)
                        elif ext.rsplit(".", 1)[-1] in ("txt", "json"):
                            out[col].append(raw.decode("utf-8"))
                        else:
                            out[col].append(raw)
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    )
    return files.select("content").mapInPandas(parse, schema=schema)

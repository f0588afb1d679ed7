"""Streaming image near-dup ingest (streaming/image_ingest.py):
pixel-level near-copies are rejected within and across batches,
replays are idempotent, and the phash store tracks the accepted
corpus."""

from __future__ import annotations

import numpy as np
import pytest

from energy_pandas_spark.operators.codecs import (
    encode_png,
    register_default_decoders,
)
from energy_pandas_spark.streaming.image_ingest import (
    make_image_ingest_writer,
    read_phash_store,
)

_RNG = np.random.default_rng(21)
IMG_A = _RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
IMG_A_NEAR = IMG_A.copy()
IMG_A_NEAR[2, 2] = 255 - IMG_A_NEAR[2, 2]  # one pixel flipped
IMG_B = _RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
IMG_C = _RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)


def _media(spark, rows):
    return spark.createDataFrame(
        [
            (i, bytearray(encode_png(img)), ("image/png", 16, 16, None))
            for i, img in rows
        ],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )


@pytest.fixture()
def writer_and_paths(tmp_path):
    register_default_decoders()
    media = str(tmp_path / "media")
    phash = str(tmp_path / "phash")
    w = make_image_ingest_writer(media, phash, max_hamming=4)
    return w, media, phash


def test_neardup_rejected_within_and_across_batches(spark, writer_and_paths):
    w, media_path, phash_path = writer_and_paths

    w(_media(spark, [(0, IMG_A), (1, IMG_A_NEAR), (2, IMG_B)]), 0)
    got0 = {
        r.media_id for r in spark.read.parquet(media_path).collect()
    }
    assert got0 == {0, 2}  # in-batch near-copy dropped, smallest id kept

    # batch 1: another near-copy of the ACCEPTED image + a novel one
    w(_media(spark, [(10, IMG_A_NEAR), (11, IMG_C)]), 1)
    got1 = {
        r.media_id for r in spark.read.parquet(media_path).collect()
    }
    assert got1 == {0, 2, 11}

    # phash store covers exactly the accepted corpus
    store = read_phash_store(spark, phash_path)
    assert {r.media_id for r in store.collect()} == got1


def test_replay_is_idempotent(spark, writer_and_paths):
    w, media_path, phash_path = writer_and_paths
    w(_media(spark, [(0, IMG_A), (1, IMG_B)]), 0)
    w(_media(spark, [(10, IMG_C)]), 1)
    before = sorted(
        (r.media_id, r.phash)
        for r in read_phash_store(spark, phash_path).collect()
    )
    # replay batch 1 (same content, same id): no double-ingest, no
    # self-rejection against the half-written copy
    w(_media(spark, [(10, IMG_C)]), 1)
    after = sorted(
        (r.media_id, r.phash)
        for r in read_phash_store(spark, phash_path).collect()
    )
    assert after == before
    assert {
        r.media_id for r in spark.read.parquet(media_path).collect()
    } == {0, 1, 10}


def test_undecodable_image_is_kept_not_silently_dropped(spark, writer_and_paths):
    """strict=False decode failures (phash NULL) must land in the
    media corpus — an undecodable input is not evidence of duplication
    (the url_ingest posture for NULL-canonical rows) — while
    contributing no signature to the store."""
    w, media_path, phash_path = writer_and_paths

    broken = spark.createDataFrame(
        [(7, bytearray(b"not a png at all"),
          ("image/png", 16, 16, None))],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    w(_media(spark, [(0, IMG_A)]).unionByName(broken), 0)

    media_ids = {r.media_id for r in spark.read.parquet(media_path).collect()}
    assert media_ids == {0, 7}  # broken image kept in the corpus
    store_ids = {
        r.media_id for r in read_phash_store(spark, phash_path).collect()
    }
    assert store_ids == {0}  # ...but contributes no signature

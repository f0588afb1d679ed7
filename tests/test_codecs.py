"""Real media codecs (operators/codecs.py): spec round-trips for the
stdlib PNG/BMP/PPM/WAV kernels, feature-extractor properties, and the
registered-decoder path through the distributed ``decode_features``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from energy_pandas_spark.operators import multimodal
from energy_pandas_spark.operators.codecs import (
    audio_features,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_wav,
    image_features,
    register_default_decoders,
    sniff_mime,
)


def _rand_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


class TestPng:
    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    def test_roundtrip(self, c):
        img = _rand_img(13, 7, c, seed=c)
        got = decode_png(encode_png(img))
        want = img[:, :, None] if img.ndim == 2 else img
        assert got.shape == want.shape
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
    def test_all_scanline_filters(self, filt):
        """Hand-filter scanlines per the PNG spec and check the decoder
        inverts each filter type exactly."""
        img = _rand_img(9, 11, 3, seed=42)
        h, w, c = img.shape
        stride, bpp = w * c, c
        flat = img.reshape(h, stride).astype(np.int32)
        lines = []
        prev = np.zeros(stride, np.int32)
        for y in range(h):
            cur = flat[y]
            if filt == 0:
                enc = cur
            elif filt == 1:
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                enc = (cur - left) % 256
            elif filt == 2:
                enc = (cur - prev) % 256
            elif filt == 3:
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                enc = (cur - ((left + prev) >> 1)) % 256
            else:  # Paeth
                left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
                upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
                p = left + prev - upleft
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
                )
                enc = (cur - pred) % 256
            lines.append(bytes([filt]) + enc.astype(np.uint8).tobytes())
            prev = cur

        def chunk(typ, payload):
            return (
                struct.pack(">I", len(payload))
                + typ
                + payload
                + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(png), img)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            decode_png(b"definitely not a png")


class TestOtherImageFormats:
    def test_bmp_24bit(self):
        img = _rand_img(5, 6, 3, seed=7)
        h, w, _ = img.shape
        row = (w * 3 + 3) & ~3
        px = np.zeros((h, row), np.uint8)
        px[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        off = 54
        header = (
            b"BM"
            + struct.pack("<IHHI", off + px.size, 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, px.size, 0, 0, 0, 0)
        )
        assert np.array_equal(decode_bmp(header + px.tobytes()), img)

    def test_ppm_and_pgm(self):
        img = _rand_img(4, 5, 3, seed=3)
        data = b"P6\n# comment\n5 4\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(data), img)
        gray = _rand_img(4, 5, 1, seed=4)
        data = b"P5 5 4 255\n" + gray.tobytes()
        assert np.array_equal(decode_ppm(data)[:, :, 0], gray)

    def test_sniff_and_dispatch(self):
        img = _rand_img(3, 3, 3, seed=1)
        png = encode_png(img)
        assert sniff_mime(png) == "image/png"
        assert sniff_mime(b"RIFF1234WAVEfmt ") == "audio/wav"
        assert sniff_mime(b"\x00\x01") is None
        assert np.array_equal(decode_image(png), img)
        with pytest.raises(ValueError):
            decode_image(b"\x00\x01\x02")


class TestWav:
    def test_roundtrip_mono_and_stereo(self):
        t = np.arange(8000) / 8000.0
        mono = 0.5 * np.sin(2 * np.pi * 440 * t)
        got, rate = decode_wav(encode_wav(mono, 8000))
        assert rate == 8000 and got.shape == (8000, 1)
        assert np.abs(got[:, 0] - mono).max() < 1e-3  # 16-bit quantization
        stereo = np.stack([mono, -mono], axis=1)
        got2, _ = decode_wav(encode_wav(stereo, 8000))
        assert got2.shape == (8000, 2)
        assert np.abs(got2 - stereo).max() < 1e-3


class TestFeatures:
    def test_image_features_perceptual(self):
        img = _rand_img(32, 32, 3, seed=9)
        f = image_features(img)
        assert f.shape == (64,) and f.dtype == np.float32
        assert np.array_equal(f, image_features(img.copy()))  # deterministic
        noisy = np.clip(
            img.astype(np.int32)
            + np.random.default_rng(1).integers(-2, 3, img.shape),
            0,
            255,
        ).astype(np.uint8)

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        assert cos(f, image_features(noisy)) > 0.999  # near-dup stays close
        # structurally different content separates (uniform noise does
        # not: its block means are all ~127.5, correctly near-parallel)
        ramp = np.tile(np.linspace(0, 255, 32, dtype=np.uint8), (32, 1))
        horiz = np.stack([ramp] * 3, axis=2)
        vert = np.stack([ramp.T] * 3, axis=2)
        assert cos(image_features(horiz), image_features(vert)) < cos(
            f, image_features(noisy)
        )
        dark = image_features(np.full((32, 32, 3), 10, np.uint8))
        bright = image_features(np.full((32, 32, 3), 250, np.uint8))
        assert bright.mean() > 0.9 > 0.1 > dark.mean()  # luma is real

    def test_audio_features_profile(self):
        rate = 8000
        quiet = np.zeros(rate)
        loud = 0.9 * np.sin(2 * np.pi * 440 * np.arange(rate) / rate)
        f = audio_features(np.concatenate([quiet, loud]), rate)
        assert f.shape == (64,)
        assert f[:32].max() < 1e-6 and f[32:].min() > 0.1  # silence vs tone
        assert audio_features(np.zeros(0), rate).shape == (64,)


class TestRegisteredDecodeFeatures:
    def test_end_to_end_real_decode(self, spark):
        register_default_decoders()
        base = _rand_img(16, 16, 3, seed=5)
        near = base.copy()
        near[0, 0, 0] ^= 1  # 1-bit perturbation
        t = np.arange(4000) / 8000.0
        rows = [
            (0, bytearray(encode_png(base)), ("image/png", 16, 16, None)),
            (1, bytearray(encode_png(near)), ("image/png", 16, 16, None)),
            (
                2,
                bytearray(encode_wav(0.5 * np.sin(2 * np.pi * 220 * t), 8000)),
                ("audio/wav", None, None, 500),
            ),
        ]
        df = spark.createDataFrame(
            rows,
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
        )
        feats = {
            r["media_id"]: np.array(r["features"])
            for r in multimodal.decode_features(df, dim=64).collect()
        }
        # image features are real luma block means in [0, 1]
        assert 0.0 <= feats[0].min() and feats[0].max() <= 1.0
        assert np.allclose(feats[0], image_features(base))
        cos = float(
            feats[0]
            @ feats[1]
            / (np.linalg.norm(feats[0]) * np.linalg.norm(feats[1]))
        )
        assert cos > 0.999  # near-dup image survives decode pipeline
        assert feats[2].shape == (64,)  # audio landed in the same space
        assert not np.allclose(feats[2], feats[0])

    def test_unregistered_mime_still_falls_back(self, spark):
        register_default_decoders()
        df = spark.createDataFrame(
            [(0, bytearray(b"plain bytes"), ("application/octet-stream", None, None, None))],
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
        )
        out = multimodal.decode_features(df, dim=8).collect()
        assert len(out) == 1 and len(out[0]["features"]) == 8
        with pytest.raises(Exception, match="no decoder registered"):
            multimodal.decode_features(df, dim=8, strict=True).collect()


class TestGif:
    def test_gif_roundtrip_animated(self):
        import numpy as np

        from energy_pandas_spark.operators.codecs import encode_gif, gif_frames

        rng = np.random.RandomState(7)
        palette = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        idx = rng.randint(0, 4, size=(3, 11, 17))
        frames = palette[idx]
        data = encode_gif(frames)
        assert data[:6] == b"GIF89a" and data[-1] == 0x3B
        decoded = gif_frames(data)
        assert decoded.shape == (3, 11, 17, 3)
        assert (decoded == frames).all()

    def test_gif_interlaced_frame(self):
        """Interlace coverage for the fancy-index deinterlace scatter:
        encode_gif never emits interlaced streams, so build one by
        encoding the frame with its rows pre-permuted into GIF pass
        order (pass starts/steps 0/8, 4/8, 2/4, 1/2) and flipping the
        image-descriptor interlace bit — decoding must undo the
        permutation exactly. h=13 exercises all four passes with
        uneven pass lengths."""
        import numpy as np

        from energy_pandas_spark.operators.codecs import (
            _GIF_INTERLACE_PASSES,
            encode_gif,
            gif_frames,
        )

        rng = np.random.RandomState(13)
        palette = np.array(
            [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
        )
        h, w = 13, 5
        img = palette[rng.randint(0, 4, size=(h, w))]
        order = [
            r
            for start, step in _GIF_INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        assert sorted(order) == list(range(h))
        data = bytearray(encode_gif(img[np.array(order)]))
        # encode_gif writes the GCE (8 bytes) then the 0x2C image
        # descriptor at a fixed offset:
        # 6 (header) + 7 (LSD) + 3*table_n (palette) + 8 (GCE)
        table_n = 2 ** (((data[10] & 0x07) + 1))
        sep = 6 + 7 + 3 * table_n + 8
        assert data[sep] == 0x2C
        packed_at = sep + 9
        assert data[packed_at] == 0
        data[packed_at] |= 0x40  # set the interlace flag
        decoded = gif_frames(bytes(data))
        assert decoded.shape == (1, h, w, 3)
        assert (decoded[0] == img).all()

    def test_gif_single_frame_and_many_colors(self):
        import numpy as np

        from energy_pandas_spark.operators.codecs import encode_gif, gif_frames

        # 16x16 grayscale ramp: 256 distinct colors exercises 8-bit codes
        ramp = np.arange(256, dtype=np.uint8).reshape(16, 16)
        img = np.stack([ramp, ramp, ramp], axis=-1)
        decoded = gif_frames(encode_gif(img))
        assert decoded.shape == (1, 16, 16, 3)
        assert (decoded[0] == img).all()

    def test_gif_lzw_clear_spam_boundary(self):
        import numpy as np

        from energy_pandas_spark.operators.codecs import encode_gif, gif_frames

        # tiny 2-color palette forces minimum code size + frequent CLEARs
        img = np.zeros((9, 13, 3), np.uint8)
        img[::2, ::3] = [255, 255, 255]
        decoded = gif_frames(encode_gif(img))
        assert (decoded[0] == img).all()

    def test_video_features_deterministic(self):
        import numpy as np

        from energy_pandas_spark.operators.codecs import video_features

        frames = np.zeros((6, 8, 8, 3), np.uint8)
        frames[3:] = 255  # second half white
        f = video_features(frames, n_sample=4, block=2)
        assert f.shape == (16,)
        assert (f[:4] == 0).all() and (f[-4:] == 1).all()
        assert (f == video_features(frames, n_sample=4, block=2)).all()

    def test_video_decoder_registered(self):
        import numpy as np

        from energy_pandas_spark.operators.codecs import (
            encode_gif,
            register_default_decoders,
        )
        from energy_pandas_spark.operators.multimodal import _DECODERS

        register_default_decoders()
        assert any(k.startswith("video/") for k in _DECODERS)
        fn = next(v for k, v in _DECODERS.items() if k.startswith("video/"))
        img = np.zeros((2, 8, 8, 3), np.uint8)
        out = fn(encode_gif(img), {})
        assert out.shape == (64,) and (out == 0).all()


class TestImageNearDup:
    """Perceptual-hash image dedup: decode -> aHash signature ->
    banded Hamming pairs (operators/multimodal.py:perceptual_hash /
    image_neardup_pairs)."""

    def _media_df(self, spark, imgs):
        rows = [
            (i, bytearray(encode_png(img)), ("image/png", 16, 16, None))
            for i, img in enumerate(imgs)
        ]
        return spark.createDataFrame(
            rows,
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
        )

    def test_phash_brightness_invariant_and_bit63(self, spark):
        register_default_decoders()
        rng = np.random.default_rng(11)
        f = [float(x) for x in rng.random(64)]
        feats = spark.createDataFrame(
            # mean-relative bits are invariant to an exact uniform
            # scale of the features (pixel-level uint8 halving is NOT
            # exact — floor effects flip boundary blocks, so the
            # invariance contract is stated at the feature level)
            [(0, f), (1, [0.5 * x for x in f])],
            "media_id long, features array<float>",
        )
        sigs = {
            r["media_id"]: r["phash"]
            for r in multimodal.perceptual_hash(feats).collect()
        }
        assert sigs[0] == sigs[1]
        # a gradient image lights the LAST thumbnail block brightest,
        # exercising the sign-bit (bit 63) packing path
        grad = np.tile(
            np.linspace(0, 255, 16, dtype=np.uint8), (16, 1)
        )[..., None].repeat(3, axis=2)
        df = self._media_df(spark, [grad])
        gsig = multimodal.perceptual_hash(
            multimodal.decode_features(df, dim=64)
        ).collect()[0]["phash"]
        assert gsig < 0  # bit 63 set -> negative BIGINT, no clamp

    def test_neardup_pairs(self, spark):
        register_default_decoders()
        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        near = base.copy()
        near[3, 3] = 255 - near[3, 3]  # one pixel flipped
        exact = base.copy()
        other = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        df = self._media_df(spark, [base, near, exact, other])
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in multimodal.image_neardup_pairs(df, max_hamming=4).collect()
        }
        assert pairs[(0, 2)] == 0  # exact copy
        assert (0, 1) in pairs and pairs[(0, 1)] <= 4
        assert not any(3 in p for p in pairs)  # unrelated image clean

    def test_flat_images_hash_by_brightness(self, spark):
        register_default_decoders()
        black = np.zeros((16, 16, 3), dtype=np.uint8)
        white = np.full((16, 16, 3), 255, dtype=np.uint8)
        black2 = np.zeros((16, 16, 3), dtype=np.uint8)
        df = self._media_df(spark, [black, white, black2])
        sigs = {
            r["media_id"]: r["phash"]
            for r in multimodal.perceptual_hash(
                multimodal.decode_features(df, dim=64)
            ).collect()
        }
        # equal solids still dedup; different solids must NOT collide
        assert sigs[0] == sigs[2]
        assert sigs[0] != sigs[1]
        pairs = multimodal.image_neardup_pairs(df, max_hamming=4).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 2)}

    def test_null_and_empty_features_drop(self, spark):
        feats = spark.createDataFrame(
            [(0, None), (1, []), (2, [float(i) for i in range(64)])],
            "media_id long, features array<float>",
        )
        sigs = {
            r["media_id"]: r["phash"]
            for r in multimodal.perceptual_hash(feats).collect()
        }
        assert sigs[0] is None and sigs[1] is None
        assert sigs[2] is not None


def test_image_dedup_transitive_chain(spark):
    """A re-encode chain (A ~ B ~ C where A and C may differ by more
    than max_hamming) collapses to ONE survivor — the CC contract."""
    register_default_decoders()
    rng = np.random.default_rng(31)
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    b = a.copy(); b[0, 0] = 255 - b[0, 0]
    c = b.copy(); c[8, 8] = 255 - c[8, 8]
    other = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (i, bytearray(encode_png(im)), ("image/png", 16, 16, None))
        for i, im in enumerate([a, b, c, other])
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    )
    drops = {r.media_id for r in multimodal.image_dedup(df, max_hamming=4).collect()}
    # smallest id (0) survives its cluster; 3 is unrelated and kept
    assert 0 not in drops and 3 not in drops
    assert drops <= {1, 2} and len(drops) >= 1


def test_png_mixed_filters_per_row():
    """Rows cycling through all five filters in one image: exercises
    prev-row interactions between the vectorized (0/1/2) and
    Python-loop (3/4) unfilter paths."""
    import struct
    import zlib

    import numpy as np

    from energy_pandas_spark.operators.codecs import decode_png

    img = _rand_img(25, 17, 3, seed=99)
    h, w, c = img.shape
    stride, bpp = w * c, c
    flat = img.reshape(h, stride).astype(np.int32)
    lines, prev = [], np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y]
        filt = y % 5
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filt == 0:
            enc = cur
        elif filt == 1:
            enc = (cur - left) % 256
        elif filt == 2:
            enc = (cur - prev) % 256
        elif filt == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        else:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        lines.append(bytes([filt]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def _filtered_png(img, filts):
    """Hand-filter an image per the PNG spec with a per-row filter list."""
    import struct
    import zlib

    import numpy as np

    h, w, c = img.shape
    stride, bpp = w * c, c
    flat = img.reshape(h, stride).astype(np.int32)
    lines, prev = [], np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y]
        filt = int(filts[y])
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filt == 0:
            enc = cur
        elif filt == 1:
            enc = (cur - left) % 256
        elif filt == 2:
            enc = (cur - prev) % 256
        elif filt == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        else:
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) % 256
        lines.append(bytes([filt]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_wavefront_paths_bit_identical():
    """Large Average/Paeth runs take the anti-diagonal WAVEFRONT
    unfilter (the numpy fast path for real-world Paeth-heavy PNGs);
    small runs take the scalar loop. Both must reconstruct exactly —
    pinned through the public decoder on images big enough to cross
    the dispatch thresholds, including a mixed 3/4 run and run
    boundaries against vectorized 0/1/2 rows."""
    import numpy as np

    from energy_pandas_spark.operators.codecs import decode_png

    rng = np.random.default_rng(123)
    h, w = 130, 120
    for c, mode in [(3, "paeth"), (3, "avg"), (3, "mix"), (1, "paeth")]:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        if mode == "paeth":
            filts = np.full(h, 4)
        elif mode == "avg":
            filts = np.full(h, 3)
        else:
            filts = rng.integers(3, 5, h)
        # break the run with vectorized-path rows at both ends
        filts[0], filts[h // 2], filts[-1] = 2, 1, 0
        got = decode_png(_filtered_png(img, filts))
        assert np.array_equal(got, img), (c, mode)


class TestCodecProperties:
    """Hypothesis round-trips: pure-Python codecs, no Spark — generous
    example counts are cheap here."""

    def test_gif_roundtrip_random_frames(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import numpy as np

        from energy_pandas_spark.operators.codecs import (
            encode_gif,
            gif_frames,
        )

        @given(
            n=st.integers(1, 4),
            h=st.integers(1, 17),
            w=st.integers(1, 19),
            ncol=st.sampled_from([2, 4, 8]),
            seed=st.integers(0, 2**31 - 1),
        )
        @settings(max_examples=40, deadline=None)
        def prop(n, h, w, ncol, seed):
            rng = np.random.default_rng(seed)
            palette = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
            # distinct palette entries: encode maps pixels via a
            # color->index lut, so duplicate colors alias indices
            palette[:, 0] = np.arange(ncol) * (256 // ncol)
            idx = rng.integers(0, ncol, (n, h, w))
            frames = palette[idx]
            assert np.array_equal(
                gif_frames(encode_gif(frames, palette=palette)), frames
            )

        prop()

    def test_png_roundtrip_random(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import numpy as np

        from energy_pandas_spark.operators.codecs import (
            decode_png,
            encode_png,
        )

        @given(
            h=st.integers(1, 23),
            w=st.integers(1, 23),
            c=st.sampled_from([1, 2, 3, 4]),
            seed=st.integers(0, 2**31 - 1),
        )
        @settings(max_examples=40, deadline=None)
        def prop(h, w, c, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(img)), img)

        prop()

    def test_wav_roundtrip_random(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import numpy as np

        from energy_pandas_spark.operators.codecs import (
            decode_wav,
            encode_wav,
        )

        @given(
            n=st.integers(1, 2000),
            rate=st.sampled_from([8000, 16000, 44100]),
            seed=st.integers(0, 2**31 - 1),
        )
        @settings(max_examples=40, deadline=None)
        def prop(n, rate, seed):
            rng = np.random.default_rng(seed)
            # the contract is float [-1, 1] -> 16-bit PCM -> float:
            # round-trip must agree within one quantization step
            samples = rng.uniform(-1.0, 1.0, n)
            got, got_rate = decode_wav(encode_wav(samples, rate))
            assert got_rate == rate
            assert got.shape == (n, 1)
            # decoded = round(x*32767)/32768: |err| <= (|x| + 0.5)/32768
            err = np.abs(got.ravel() - samples)
            assert err.max() <= 1.5 / 32768 + 1e-9

        prop()

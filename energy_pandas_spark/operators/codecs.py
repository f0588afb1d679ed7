"""Real media codecs for the multimodal pipeline — stdlib only.

The multimodal operators treat media as opaque ``binary`` + typed meta
(operators/multimodal.py); this module supplies actual decode kernels
for formats whose specs are decodable with the standard library:

- **PNG** (8-bit gray/RGB/RGBA, non-interlaced): zlib inflate + the
  five standard scanline filters (spec: https://www.w3.org/TR/png-3/).
- **BMP** (24-bit uncompressed BITMAPINFOHEADER).
- **PPM/PGM** (binary P5/P6 Netpbm).
- **WAV** (PCM 8/16/32-bit via the stdlib ``wave`` module).

plus deterministic feature extractors (block-mean image thumbnail,
log-RMS audio energy profile) so ``decode_features`` produces REAL
content-derived vectors in this container. If Pillow is importable it
is preferred for images (it covers JPEG etc.); these kernels are the
no-dependency floor, not a replacement for turbo codecs at 100 TB —
register faster ones with ``set_decoder`` and nothing else changes.

All functions here are module-level so Spark pickles them by reference
into Arrow worker processes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

try:  # optional fast path; absent in this container
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - environment-dependent
    _PILImage = None

__all__ = [
    "decode_png",
    "encode_png",
    "decode_bmp",
    "decode_ppm",
    "decode_wav",
    "encode_wav",
    "decode_image",
    "sniff_mime",
    "image_features",
    "audio_features",
    "register_default_decoders",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# image decode
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a ``(h, w, c)`` uint8 array.

    Pure spec implementation: chunk walk -> IDAT inflate -> per-scanline
    unfilter (None/Sub/Up/Average/Paeth). Filters 1/3/4 carry a data
    dependency along the row, so those rows unfilter in a Python loop —
    fine for the Arrow-batched feature path; register a PIL/turbo codec
    for decode-bound workloads."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG pixel data")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    bpp = channels
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.uint16)
        if f == 0:
            cur = line
        elif f == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) for tests/synthesis."""
    img = np.ascontiguousarray(np.asarray(img, np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP to (h, w, 3)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    off = struct.unpack("<I", data[10:14])[0]
    hdr = struct.unpack("<I", data[14:18])[0]
    if hdr < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(data, np.uint8, row * h, off).reshape(h, row)
    img = px[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img  # bottom-up storage


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary Netpbm (P5 gray / P6 RGB, maxval <= 255)."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM stream")
    channels = 1 if data[:2] == b"P5" else 3
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit Netpbm not supported")
    return np.frombuffer(data, np.uint8, w * h * channels, pos).reshape(
        h, w, channels
    )


def sniff_mime(data: bytes) -> str | None:
    """Magic-byte MIME detection for the formats decodable here."""
    if data[:8] == _PNG_MAGIC:
        return "image/png"
    if data[:2] == b"BM":
        return "image/bmp"
    if data[:2] in (b"P5", b"P6"):
        return "image/x-portable-pixmap"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "audio/wav"
    if data[:3] == b"\xff\xd8\xff":
        return "image/jpeg"  # decodable only via the optional PIL path
    return None


def decode_image(data: bytes) -> np.ndarray:
    """Bytes -> (h, w, c) uint8, preferring Pillow when installed."""
    if _PILImage is not None:
        try:
            with _PILImage.open(io.BytesIO(data)) as im:  # pragma: no cover
                return np.asarray(im.convert("RGB"))
        except Exception:
            pass  # fall through to the spec decoders
    mime = sniff_mime(data)
    if mime == "image/png":
        return decode_png(data)
    if mime == "image/bmp":
        return decode_bmp(data)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(data)
    raise ValueError("undecodable image bytes (register a codec for this format)")


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float32 samples in [-1, 1] shaped (n, ch), rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        ch, width, rate = wf.getnchannels(), wf.getsampwidth(), wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) -> 16-bit PCM WAV bytes."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature extraction (canonical 64-dim, content-derived, deterministic)
# ---------------------------------------------------------------------------

FEATURE_DIM = 64


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Luma block-mean thumbnail features in [0, 1] (a real perceptual
    embedding floor: near-identical images land near each other in
    cosine space, so the similarity/dedup operators compose with it)."""
    a = np.asarray(img, np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            gray = a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
        else:
            gray = a[..., 0]
    else:
        gray = a
    k = int(np.ceil(np.sqrt(dim)))
    h, w = gray.shape
    yi = np.arange(h) * k // max(h, 1)
    xi = np.arange(w) * k // max(w, 1)
    idx = (yi[:, None] * k + xi[None, :]).ravel()
    sums = np.bincount(idx, weights=gray.ravel(), minlength=k * k)
    cnts = np.bincount(idx, minlength=k * k)
    cells = sums / np.maximum(cnts, 1)
    return (cells[:dim] / 255.0).astype(np.float32)


def audio_features(
    samples: np.ndarray, rate: int, dim: int = FEATURE_DIM
) -> np.ndarray:
    """Log-RMS energy profile over ``dim`` equal time windows (mono mix)."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        return np.zeros(dim, np.float32)
    edges = np.arange(dim + 1) * n // dim
    if n >= dim:
        # edges are strictly increasing here, so one reduceat replaces
        # the per-window Python loop (the loop was ~95% of decode time)
        sums = np.add.reduceat(x * x, edges[:-1])
        counts = np.diff(edges)
        out = np.sqrt(sums / counts)
    else:
        # short clips: windows can repeat/empty — keep the explicit form
        out = np.empty(dim)
        for i in range(dim):
            seg = x[edges[i] : max(edges[i + 1], edges[i] + 1)]
            out[i] = np.sqrt(np.mean(seg * seg)) if len(seg) else 0.0
    return np.log1p(out).astype(np.float32)


# ---------------------------------------------------------------------------
# registry glue
# ---------------------------------------------------------------------------


def _image_decoder(content: bytes, meta: dict) -> np.ndarray:
    return image_features(decode_image(content))


def _audio_decoder(content: bytes, meta: dict) -> np.ndarray:
    return audio_features(*decode_wav(content))


def register_default_decoders() -> None:
    """Install the real stdlib codecs for ``image/*`` and ``audio/*``
    (PIL preferred for images when importable). Idempotent."""
    from energy_pandas_spark.operators.multimodal import set_decoder

    set_decoder("image/", _image_decoder)
    set_decoder("audio/", _audio_decoder)

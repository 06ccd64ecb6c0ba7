"""Deterministic image payload codec + perceptual hash (numpy, no PIL).

BASELINE.json ``input_hint`` mandates an image+caption payload table
``(image_id, bytes:binary, w, h, fmt, caption, phash:int64)`` with a per-row
invariant: decoded-pixel allclose (PSNR >= 40 dB for lossy formats) + exact
caption equality. The container has no PIL/libjpeg, so real JPEG/PNG decode
is stubbed by a self-contained deterministic codec with the same *signal
properties*:

- ``png``  → lossless: zlib-compressed raw RGB (exact reconstruction)
- ``jpeg`` → lossy: 2-bit quantization + zlib (PSNR ≈ 45 dB, deterministic)

When Pillow IS importable (``HAVE_PIL``), ``encode_image`` emits real
PNG/JPEG and ``decode_image`` accepts real PNG/JPEG alongside the
synthetic containers — the operator family runs on real bytes in any
environment that has PIL, with this sandbox (no PIL) staying on the
synthetic codec. Every Spark-side contract (binary column, Arrow batch
shape, vectorized UDF signature, phash math) is identical on both paths.

The reference treats the body as an opaque binary Buffer handed to handlers
(/root/reference/lib/Crawler.js:335-339, encoding:null at :390) — the bytes
column here plays exactly that role.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:  # real-codec path: used automatically when Pillow is installed
    from PIL import Image as _PILImage
    HAVE_PIL = True
except ImportError:  # sandbox: no PIL — deterministic synthetic codec only
    _PILImage = None
    HAVE_PIL = False

MAGIC_PNG = b"SPNG"
MAGIC_JPG = b"SJPG"
_REAL_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_REAL_JPG_MAGIC = b"\xff\xd8\xff"
_HEADER = struct.Struct("<4sHH")  # magic, w, h


class ImageCodecError(ValueError):
    pass


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic RGB image for a given id (seeded gradient +
    noise so lossy PSNR is meaningful). Returns uint8 array (h, w, 3)."""
    seed = zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 / max(w - 1, 1)) + (yy * 255 / max(h - 1, 1))) / 2
    img = np.stack(
        [
            base,
            255 - base,
            (base + rng.integers(0, 64)) % 256,
        ],
        axis=-1,
    )
    noise = rng.integers(-16, 17, size=(h, w, 3))
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str,
                 use_pil: bool | None = None) -> bytes:
    """Encode RGB uint8 pixels. Real PNG/JPEG via Pillow when installed
    (``use_pil`` defaults to ``HAVE_PIL``; JPEG quality 95 keeps the
    PSNR >= 40 dB per-row invariant); the deterministic synthetic codec
    otherwise."""
    if use_pil is None:
        use_pil = HAVE_PIL
    h, w = pixels.shape[0], pixels.shape[1]
    if use_pil:
        if not HAVE_PIL:
            raise ImageCodecError("Pillow not installed")
        if fmt not in ("png", "jpeg"):
            raise ImageCodecError(f"unknown format: {fmt}")
        buf = io.BytesIO()
        img = _PILImage.fromarray(pixels, mode="RGB")
        if fmt == "jpeg":
            img.save(buf, format="JPEG", quality=95, subsampling=0)
        else:
            img.save(buf, format="PNG")
        return buf.getvalue()
    if fmt == "png":
        return _HEADER.pack(MAGIC_PNG, w, h) + zlib.compress(pixels.tobytes(), 6)
    if fmt == "jpeg":
        q = (pixels.astype(np.int16) & ~3) + 2  # 2-bit quantize, centered
        q = np.clip(q, 0, 255).astype(np.uint8)
        return _HEADER.pack(MAGIC_JPG, w, h) + zlib.compress(q.tobytes(), 6)
    raise ImageCodecError(f"unknown format: {fmt}")


def decode_image(data: bytes) -> tuple[np.ndarray, int, int, str]:
    """Returns (pixels uint8 (h,w,3), w, h, fmt). Raises ImageCodecError on
    corrupt input. Accepts BOTH payload families in one corpus: the
    synthetic SPNG/SJPG containers always decode; real PNG/JPEG bytes
    decode through Pillow when it is installed."""
    if data is None or len(data) < _HEADER.size:
        raise ImageCodecError("truncated image payload")
    magic, w, h = _HEADER.unpack_from(data)
    if magic in (MAGIC_PNG, MAGIC_JPG):
        fmt = "png" if magic == MAGIC_PNG else "jpeg"
        try:
            raw = zlib.decompress(data[_HEADER.size:])
        except zlib.error as exc:
            raise ImageCodecError(f"corrupt payload: {exc}") from exc
        px = np.frombuffer(raw, dtype=np.uint8)
        if px.size != w * h * 3:
            raise ImageCodecError("pixel payload size mismatch")
        return px.reshape(h, w, 3), w, h, fmt
    if bytes(data[:8]) == _REAL_PNG_MAGIC or bytes(data[:3]) == _REAL_JPG_MAGIC:
        if not HAVE_PIL:
            raise ImageCodecError(
                "real PNG/JPEG payload but Pillow is not installed")
        try:
            img = _PILImage.open(io.BytesIO(bytes(data)))
            fmt = (img.format or "").lower()
            px = np.asarray(img.convert("RGB"), dtype=np.uint8)
        except Exception as exc:  # noqa: BLE001 — any PIL failure = corrupt row
            raise ImageCodecError(f"PIL decode failed: {exc}") from exc
        return px, px.shape[1], px.shape[0], fmt
    raise ImageCodecError(f"bad magic: {magic!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# --- perceptual hash ------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    mat = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    mat[0] *= 1 / np.sqrt(2)
    return mat * np.sqrt(2 / n)


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash (classic pHash construction): grayscale →
    32x32 block-mean resize → 2D DCT-II → top-left 8x8 (minus DC) → sign
    vs median → 64 bits packed MSB-first. Deterministic, pure numpy."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # block-mean resize to 32x32 via index binning (handles non-multiples)
    yi = (np.arange(h) * 32 // h).clip(0, 31)
    xi = (np.arange(w) * 32 // w).clip(0, 31)
    small = np.zeros((32, 32))
    counts = np.zeros((32, 32))
    np.add.at(small, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), gray)
    np.add.at(counts, (yi[:, None].repeat(w, 1), xi[None, :].repeat(h, 0)), 1.0)
    small = small / np.maximum(counts, 1.0)
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = dct[0, 0] > 0
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    # fold into signed int64 domain for a Spark LongType column
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))

"""Image payload codec + phash invariants (BASELINE.json input_hint)."""

import numpy as np
import pytest

from supercrawler_spark import imaging


def test_png_roundtrip_lossless():
    px = imaging.synth_pixels("img-0001", 48, 32)
    data = imaging.encode_image(px, "png")
    out, w, h, fmt = imaging.decode_image(data)
    assert (w, h, fmt) == (48, 32, "png")
    assert np.array_equal(out, px)
    assert imaging.psnr(px, out) == float("inf")


def test_jpeg_roundtrip_lossy_psnr_over_40db():
    px = imaging.synth_pixels("img-0002", 64, 48)
    data = imaging.encode_image(px, "jpeg")
    out, w, h, fmt = imaging.decode_image(data)
    assert (w, h, fmt) == (64, 48, "jpeg")
    assert not np.array_equal(out, px)  # genuinely lossy
    p = imaging.psnr(px, out)
    assert p >= 40.0, f"PSNR {p} below the 40 dB invariant"
    assert np.allclose(px.astype(float), out.astype(float), atol=4)


def test_decode_rejects_garbage():
    with pytest.raises(imaging.ImageCodecError):
        imaging.decode_image(b"NOPE" + b"\x00" * 16)
    with pytest.raises(imaging.ImageCodecError):
        imaging.decode_image(b"")


def test_synth_pixels_deterministic():
    a = imaging.synth_pixels("img-0003", 32, 32)
    b = imaging.synth_pixels("img-0003", 32, 32)
    c = imaging.synth_pixels("img-0004", 32, 32)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_phash_properties():
    px = imaging.synth_pixels("img-0005", 40, 40)
    h1 = imaging.phash64(px)
    assert isinstance(h1, int)
    assert -(1 << 63) <= h1 < (1 << 63)  # fits LongType
    # phash is robust to the lossy codec (near-duplicate detection)
    lossy, *_ = imaging.decode_image(imaging.encode_image(px, "jpeg"))
    assert imaging.hamming64(h1, imaging.phash64(lossy)) <= 4
    # and far for a different image
    other = imaging.phash64(imaging.synth_pixels("img-9999", 40, 40))
    assert imaging.hamming64(h1, other) > 10

"""Pure-numpy baseline JPEG codec (operators/jpeg.py) and its
integration into the multimodal decode path (decoder='jpeg')."""

from __future__ import annotations

import numpy as np
import pytest

from bgpexplorer_spark.operators import multimodal
from bgpexplorer_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("q", [100, 85, 50])
def test_roundtrip_color(sub, q):
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    assert out is not None and out.shape == (40, 56, 3)
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # q100 is near-lossless; lower quality bounded for smooth content
    assert err < (0.5 if q == 100 and sub == "444" else 8.0)


def test_q100_near_lossless_on_noise():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 3


def test_odd_dimensions_crop():
    # 13x17 (not multiple of 8; odd for 4:2:0 subsampling)
    img = _gradient(13, 17)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == (13, 17, 3)


def test_restart_intervals():
    img = _gradient(32, 48)
    b = encode_jpeg(img, quality=85, restart_interval=2)
    assert b"\xff\xd0" in b  # RST0 emitted
    out = decode_jpeg(b)
    assert out is not None
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    # restart must not change the result vs the same stream without it
    base = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.array_equal(out, base)
    assert err < 8.0


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:24, 0:40]
    g = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (24, 40, 1)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0


def test_rejects_non_baseline():
    assert decode_jpeg(b"\x89PNG\r\n") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0 garbage") is None
    # flip SOF0 → SOF2 (progressive): decoder must decline, not crash
    b = bytearray(encode_jpeg(_gradient(16, 16)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert decode_jpeg(bytes(b)) is None


def test_decode_media_jpeg_branch(spark):
    img = _gradient(24, 32)
    jpg = encode_jpeg(img, quality=95)
    prog = bytearray(jpg)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2  # progressive → honest fake
    rows = [
        (1, "image", bytes(jpg), ("s", None, None, None, None)),
        (2, "image", bytes(prog), ("s", None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    assert dec[1].decoder == "jpeg"
    assert (dec[1].width, dec[1].height, dec[1].channels) == (32, 24, 3)
    assert abs(dec[1].mean_byte - img.mean()) < 2.0
    assert dec[2].decoder == "fake"

    # real resize over the compressed payload
    from bgpexplorer_spark.operators.multimodal import decode_pnm

    rs = {r.media_id: r for r in multimodal.resize_images(df, 8, 8).collect()}
    arr = decode_pnm(bytes(rs[1].resized_ppm))
    assert arr.shape == (8, 8, 3)
    assert rs[2].resized_ppm is None


# --- progressive (SOF2) -----------------------------------------------------


def test_progressive_equals_baseline_exactly():
    """The cross-validation oracle: progressive and baseline encodings
    share the quantizer, so decoding them must give IDENTICAL pixels —
    a bug on either side of the progressive path cannot hide behind
    round-trip symmetry."""
    from bgpexplorer_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    for trial in range(4):
        h, w = int(rng.integers(8, 44)), int(rng.integers(8, 44))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            for q in (95, 60):
                base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=q, subsampling=sub)
                )
                assert prog is not None, (trial, sub, q)
                assert np.array_equal(base, prog), (trial, sub, q)


def test_progressive_grayscale_and_custom_script():
    from bgpexplorer_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (19, 26), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=85))
    assert np.array_equal(base, decode_jpeg(encode_jpeg_progressive(g, quality=85)))
    # spectral-selection-only script (no successive approximation)
    script = [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0)]
    assert np.array_equal(
        base, decode_jpeg(encode_jpeg_progressive(g, quality=85, script=script))
    )
    # deep successive approximation on a color image
    img = rng.integers(0, 256, (17, 15, 3), dtype=np.uint8)
    script = [
        ([0, 1, 2], 0, 0, 0, 3),
        ([0], 1, 63, 0, 3), ([1], 1, 63, 0, 2), ([2], 1, 63, 0, 2),
        ([0, 1, 2], 0, 0, 3, 2), ([0, 1, 2], 0, 0, 2, 1), ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
        ([1], 1, 63, 2, 1), ([1], 1, 63, 1, 0),
        ([2], 1, 63, 2, 1), ([2], 1, 63, 1, 0),
    ]
    baseC = decode_jpeg(encode_jpeg(img, quality=70))
    progC = decode_jpeg(encode_jpeg_progressive(img, quality=70, script=script))
    assert np.array_equal(baseC, progC)


def test_progressive_decode_media_branch(spark):
    from bgpexplorer_spark.operators import multimodal
    from bgpexplorer_spark.operators.jpeg import encode_jpeg_progressive

    img = _gradient(16, 24)
    rows = [(1, "image", encode_jpeg_progressive(img, quality=95),
             ("s", None, None, None, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = multimodal.decode_media(df).collect()[0]
    assert dec.decoder == "jpeg"
    assert (dec.width, dec.height) == (24, 16)

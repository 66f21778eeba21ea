"""Uncompressed baseline TIFF codec (operators/tiff.py): IFD walk in
both byte orders, multi-strip assembly, rejection, Spark branch."""

from __future__ import annotations

import numpy as np

from bgpexplorer_spark.operators import multimodal
from bgpexplorer_spark.operators.tiff import decode_tiff, encode_tiff


def _pattern(h, w, ch, seed=0):
    k = np.arange(h * w * ch)
    return ((seed * 13 + k * 5) % 256).astype(np.uint8).reshape(h, w, ch)


def test_roundtrip_endianness_strips():
    for ch in (1, 3, 4):
        for be in (False, True):
            for rps in (None, 2, 5):
                img = _pattern(11, 7, ch, seed=ch + (7 if be else 0))
                out = decode_tiff(encode_tiff(img, big_endian=be,
                                              rows_per_strip=rps))
                assert out is not None and np.array_equal(out, img), (ch, be, rps)


def test_rejects_out_of_scope():
    import struct

    assert decode_tiff(b"garbage") is None
    assert decode_tiff(b"II*\x00\x08\x00\x00\x00") is None  # truncated IFD
    good = bytearray(encode_tiff(_pattern(4, 4, 3)))
    # flip Compression (tag 259) value to 5 (LZW): must decline
    i = good.find(struct.pack("<HH", 259, 3))
    good[i + 8] = 5
    assert decode_tiff(bytes(good)) is None


def test_fuzz_never_raises():
    rng = np.random.default_rng(1)
    base = encode_tiff(_pattern(6, 6, 3))
    for _ in range(200):
        b = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            b[rng.integers(0, len(b))] ^= 1 << rng.integers(0, 8)
        r = decode_tiff(bytes(b))
        assert r is None or isinstance(r, np.ndarray)


def test_decode_media_tiff_branch(spark):
    img = _pattern(9, 12, 3, seed=2)
    rows = [
        (1, "image", encode_tiff(img, big_endian=True), ("s", None, None, None, None)),
        (2, "image", encode_tiff(img[:, :, 0], rows_per_strip=3),
         ("s", None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = {r.media_id: r for r in multimodal.decode_media(df).collect()}
    assert dec[1].decoder == "tiff"
    assert (dec[1].width, dec[1].height, dec[1].channels) == (12, 9, 3)
    assert dec[1].mean_byte == round(float(img.mean()), 4)  # lossless
    assert dec[2].decoder == "tiff" and dec[2].channels == 1

    from bgpexplorer_spark.operators.multimodal import decode_pnm

    rs = {r.media_id: r for r in multimodal.resize_images(df, 4, 4).collect()}
    assert decode_pnm(bytes(rs[1].resized_ppm)).shape == (4, 4, 3)


def test_tiff_packbits_lzw_predictor_roundtrip():
    """TIFF 6.0 §9 PackBits + §13 LZW (+§14 horizontal predictor) are
    lossless: exact round-trips across strip layouts and byte orders."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    for comp in ("packbits", "lzw"):
        for pred in (False, True):
            for be in (False, True):
                b = encode_tiff(img, big_endian=be, rows_per_strip=4,
                                compression=comp, predictor=pred)
                assert np.array_equal(decode_tiff(b), img), (comp, pred, be)


def test_tiff_lzw_width_growth_and_reset():
    """An image large enough to grow LZW codes past 9 bits (and force a
    table reset) still round-trips exactly."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    b = encode_tiff(img, compression="lzw")
    assert np.array_equal(decode_tiff(b), img)


def test_tiff_smooth_gradient_compresses_with_predictor():
    """The predictor exists to make smooth content compressible: a
    gradient under LZW+predictor must beat plain LZW."""
    grad = np.tile(np.arange(256, dtype=np.uint8), (32, 1))[:, :, None]
    plain = encode_tiff(grad, compression="lzw")
    pred = encode_tiff(grad, compression="lzw", predictor=True)
    assert len(pred) < len(plain)
    assert np.array_equal(decode_tiff(pred), grad[:, :, :1])

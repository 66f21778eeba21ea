"""Property-based invariants for the pure-Python media codecs
(operators/png, jpeg, gif): lossless round-trips hold for arbitrary
content, lossy round-trips stay bounded, and no decoder ever raises on
arbitrary or corrupted bytes — a decoder that crashes on one malformed
payload would abort a whole Arrow batch in the multimodal path."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from bgpexplorer_spark.operators.gif import decode_gif, encode_gif, parse_gif
from bgpexplorer_spark.operators.jpeg import decode_jpeg, encode_jpeg
from bgpexplorer_spark.operators.png import decode_png, encode_png
from bgpexplorer_spark.operators.tiff import decode_tiff, encode_tiff

_dims = st.tuples(
    st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24)
)


def _arr(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


@settings(max_examples=30, deadline=None)
@given(dims=_dims, ch=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**32 - 1),
       interlace=st.booleans())
def test_png_roundtrip_exact_any_content(dims, ch, seed, interlace):
    h, w = dims
    img = _arr(h, w, ch, seed)
    out = decode_png(encode_png(img, interlace=interlace))
    assert out is not None and np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_q100_bounded_any_content(dims, seed, sub):
    h, w = dims
    img = _arr(h, w, 3, seed)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsampling=sub))
    assert out is not None and out.shape == img.shape
    if sub == "444":  # 4:2:0 chroma averaging is inherently lossy
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=20, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1),
       ncolors=st.integers(min_value=2, max_value=256),
       nframes=st.integers(min_value=1, max_value=4),
       interlace=st.booleans())
def test_gif_roundtrip_exact_any_content(dims, seed, ncolors, nframes, interlace):
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    frames = [
        rng.integers(0, ncolors, (h, w), dtype=np.uint8) for _ in range(nframes)
    ]
    g = parse_gif(encode_gif(frames, pal, interlace=interlace))
    assert g is not None and len(g["frames"]) == nframes
    for fr, idx in zip(g["frames"], frames):
        assert np.array_equal(fr["rgb"], pal[idx])


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=400))
def test_decoders_never_raise_on_garbage(data):
    for dec in (decode_png, decode_jpeg, decode_gif, decode_tiff):
        r = dec(data)
        assert r is None or isinstance(r, np.ndarray)
    # with plausible magic prefixes too
    for prefix in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a",
                   b"II*\x00", b"MM\x00*"):
        for dec in (decode_png, decode_jpeg, decode_gif, decode_tiff):
            r = dec(prefix + data)
            assert r is None or isinstance(r, np.ndarray)


def _fuzz_corrupted_valid_files(seed, flips):
    img = _arr(9, 11, 3, seed)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    idx = (img[:, :, 0] % 16).astype(np.uint8)
    from bgpexplorer_spark.operators.jpeg import encode_jpeg_progressive

    for enc, dec in (
        (lambda: encode_png(img), decode_png),
        (lambda: encode_png(img[:, :, 0] % 16, depth=4,
                            palette=np.arange(48, dtype=np.uint8).reshape(16, 3)),
         decode_png),
        (lambda: encode_jpeg(img, quality=80), decode_jpeg),
        (lambda: encode_jpeg_progressive(img, quality=80), decode_jpeg),
        (lambda: encode_gif([idx], pal), decode_gif),
        (lambda: encode_tiff(img), decode_tiff),
        (lambda: encode_tiff(img, big_endian=True, rows_per_strip=2),
         decode_tiff),
        (lambda: encode_tiff(img, compression="packbits"), decode_tiff),
        (lambda: encode_tiff(img, compression="lzw", predictor=True),
         decode_tiff),
    ):
        b = bytearray(enc())
        for f in flips:
            b[f % len(b)] ^= 1 << (f % 8)
        r = dec(bytes(b))
        assert r is None or isinstance(r, np.ndarray)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       flips=st.lists(st.integers(0, 10**9), min_size=1, max_size=8))
def test_decoders_never_raise_on_corrupted_valid_files(seed, flips):
    _fuzz_corrupted_valid_files(seed, flips)


@pytest.mark.skipif(
    not __import__("os").environ.get("SLOW_FUZZ"),
    reason="deep fuzz: set SLOW_FUZZ=1 (weekly/slow lane)",
)
@settings(max_examples=600, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       flips=st.lists(st.integers(0, 10**9), min_size=1, max_size=16))
def test_decoders_never_raise_on_corrupted_valid_files_deep(seed, flips):
    """Deep variant of the corrupted-file fuzz (this exact class caught a
    real progressive-JPEG OverflowError): 15x the examples, deeper flip
    lists. Opt-in via SLOW_FUZZ=1 so the default suite stays bounded."""
    _fuzz_corrupted_valid_files(seed, flips)


def _wav(samples, rate=8000, nch=1, sw=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(sw)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, np.int16).tobytes())
    return buf.getvalue()


def test_wav_truncated_odd_payload_no_raise():
    """A capture whose data chunk declares more frames than the payload
    holds (and ends on an odd byte) must degrade, not raise — one crash
    aborts the whole Arrow batch."""
    import struct

    from bgpexplorer_spark.operators.multimodal import decode_wav

    raw = bytearray(_wav([1, 2, 3]))
    i = raw.find(b"data")
    struct.pack_into("<I", raw, i + 4, 100)  # over-declared
    out = decode_wav(bytes(raw[:-1]))        # odd payload
    assert out is not None and out["sample_rate"] == 8000


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_flips=st.integers(min_value=0, max_value=12),
    cut=st.integers(min_value=0, max_value=40),
)
def test_wav_byteflip_sweep_never_raises(seed, n_flips, cut):
    """decode_wav over randomly corrupted/truncated WAV bytes: any
    outcome but an unhandled raise."""
    from bgpexplorer_spark.operators.multimodal import decode_wav

    rng = np.random.default_rng(seed)
    raw = bytearray(_wav(rng.integers(-500, 500, 64)))
    for _ in range(n_flips):
        raw[rng.integers(0, len(raw))] ^= 1 << rng.integers(0, 8)
    out = decode_wav(bytes(raw[: len(raw) - cut]))
    assert out is None or isinstance(out, dict)


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_flips=st.integers(min_value=0, max_value=12),
    cut=st.integers(min_value=0, max_value=40),
)
def test_image_pixels_byteflip_sweep_never_raises(seed, n_flips, cut):
    """decode_image_pixels (the aHash/resize dispatch) over corrupted
    PGM payloads: decode or None, never an exception."""
    from bgpexplorer_spark.operators.multimodal import decode_image_pixels

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, 256, dtype=np.uint8)
    raw = bytearray(b"P5\n16 16\n255\n" + px.tobytes())
    for _ in range(n_flips):
        raw[rng.integers(0, len(raw))] ^= 1 << rng.integers(0, 8)
    img = decode_image_pixels(bytes(raw[: len(raw) - cut]))
    assert img is None or img.ndim == 3


@settings(max_examples=80, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n_flips=st.integers(min_value=0, max_value=16),
    cut=st.integers(min_value=0, max_value=60),
    big=st.booleans(),
)
def test_exif_byteflip_sweep_never_raises(seed, n_flips, cut, big):
    """parse_exif over corrupted/truncated APP1-bearing JPEGs: a dict,
    partial dict, or None — never an unhandled raise."""
    from bgpexplorer_spark.operators.exif import (
        build_exif_app1, parse_exif, splice_app1,
    )
    from bgpexplorer_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    base = encode_jpeg(rng.integers(0, 256, (4, 4), dtype=np.uint8))
    raw = bytearray(splice_app1(base, build_exif_app1(
        make="Fuzz", model="F1", orientation=1 + int(rng.integers(0, 8)),
        datetime="2024:01:01 00:00:00", big_endian=big)))
    for _ in range(n_flips):
        raw[rng.integers(0, len(raw))] ^= 1 << rng.integers(0, 8)
    out = parse_exif(bytes(raw[: len(raw) - cut]))
    assert out is None or isinstance(out, dict)

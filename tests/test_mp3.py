"""MPEG audio frame-header metadata walk (operators/mp3.py): exact
duration over CBR/VBR frame sequences, ID3v2 skip, Xing VBR-tag
cross-check, all three versions/layers, and never-raise on garbage."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bgpexplorer_spark.operators.mp3 import encode_mp3, parse_mp3_meta


def test_cbr_stereo_mpeg1():
    m = parse_mp3_meta(encode_mp3(n_frames=10, rate_idx=0, bitrate_idx=9))
    assert m == {
        "channels": 2, "sample_rate": 44100,
        "duration_ms": round(10 * 1152 / 44100 * 1000),
        "bitrate_kbps": 128, "n_frames": 10, "vbr": False,
    }


def test_vbr_exact_duration():
    """Per-frame bitrate varies; per-frame DURATION doesn't (Layer III
    MPEG1 is always 1152 samples) — the walk sums it exactly."""
    m = parse_mp3_meta(
        encode_mp3(n_frames=8, rate_idx=1, mono=True,
                   bitrate_seq=[1 + i % 14 for i in range(8)]))
    assert (m["vbr"], m["channels"], m["sample_rate"]) == (True, 1, 48000)
    assert m["duration_ms"] == round(8 * 1152 / 48000 * 1000)


def test_id3v2_skipped():
    m = parse_mp3_meta(encode_mp3(n_frames=3, rate_idx=2, id3=b"TALB\x00" * 40))
    assert (m["n_frames"], m["sample_rate"]) == (3, 32000)


@pytest.mark.parametrize(
    "kw, rate, samples",
    [
        (dict(mpeg1=False, rate_idx=0), 22050, 576),   # MPEG2 Layer III
        (dict(layer=1), 44100, 384),                   # Layer I
        (dict(layer=2), 44100, 1152),                  # Layer II
    ],
)
def test_versions_and_layers(kw, rate, samples):
    m = parse_mp3_meta(encode_mp3(n_frames=4, **kw))
    assert m["sample_rate"] == rate
    assert m["duration_ms"] == round(4 * samples / rate * 1000)


def test_xing_tag_covers_truncated_walk():
    """A Xing frame count larger than the physical walk (truncated file
    / metadata-only probe) scales the duration to the tag's count."""
    b = bytearray(encode_mp3(n_frames=2, rate_idx=0))
    # MPEG1 stereo: Xing lives at frame_start + 4 + 32
    b[36:48] = b"Xing" + struct.pack(">II", 1, 20)
    m = parse_mp3_meta(bytes(b))
    assert m["n_frames"] == 20
    assert m["duration_ms"] == round(20 * 1152 / 44100 * 1000)


def test_trailing_junk_ends_walk():
    b = encode_mp3(n_frames=5) + b"TAG" + bytes(125)  # ID3v1 trailer
    assert parse_mp3_meta(b)["n_frames"] == 5


def test_not_mp3():
    assert parse_mp3_meta(b"") is None
    assert parse_mp3_meta(b"RIFF....WAVE") is None
    assert parse_mp3_meta(b"\xff\xe0\x00\x00") is None  # reserved fields


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_never_raises_on_garbage(b):
    parse_mp3_meta(b)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, 2000),
    st.integers(0, 8191),
    st.sampled_from([0, 1, 2]),
)
def test_never_raises_on_bitflipped_valid(seed, flip, rate_idx):
    import random

    rnd = random.Random(seed)
    b = bytearray(encode_mp3(n_frames=6, rate_idx=rate_idx,
                             bitrate_idx=rnd.randint(1, 14)))
    b[flip % len(b)] ^= 1 << rnd.randint(0, 7)
    parse_mp3_meta(bytes(b))

"""Pure-Python GIF codec (operators/gif.py): LZW round-trips,
interlace, animation, and the Spark decoder='gif' / gif_frames paths."""

from __future__ import annotations

import numpy as np

from bgpexplorer_spark.operators import multimodal
from bgpexplorer_spark.operators.gif import (
    decode_gif,
    encode_gif,
    gif_frames,
    parse_gif,
)

PAL = np.array(
    [[0, 0, 0], [80, 90, 100], [160, 10, 20], [250, 240, 230]], np.uint8
)


def _idx(h, w, seed=0):
    return ((seed + np.arange(h * w)) % 4).astype(np.uint8).reshape(h, w)


def test_roundtrip_exact():
    for seed in range(4):
        idx = _idx(7, 9, seed)
        g = parse_gif(encode_gif([idx], PAL))
        assert g["width"] == 9 and g["height"] == 7
        assert np.array_equal(g["frames"][0]["rgb"], PAL[idx])


def test_interlaced():
    idx = _idx(16, 5, 2)
    g = parse_gif(encode_gif([idx], PAL, interlace=True))
    assert np.array_equal(g["frames"][0]["rgb"], PAL[idx])


def test_animated_frames_and_delays():
    frames = [_idx(4, 6, s) for s in range(3)]
    g = parse_gif(encode_gif(frames, PAL, delays_ms=[40, 80, 120]))
    assert [f["delay_ms"] for f in g["frames"]] == [40, 80, 120]
    for f, idx in zip(g["frames"], frames):
        assert np.array_equal(f["rgb"], PAL[idx])


def test_rejects_garbage():
    assert parse_gif(b"not a gif") is None
    assert parse_gif(b"GIF89a\x00") is None
    assert decode_gif(b"GIF89a truncated header only") is None


def test_decode_media_gif_branch(spark):
    idx = _idx(5, 8, 1)
    rows = [(1, "image", encode_gif([idx], PAL), ("s", None, None, None, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    dec = multimodal.decode_media(df).collect()[0]
    assert dec.decoder == "gif"
    assert (dec.width, dec.height, dec.channels) == (8, 5, 3)
    assert dec.mean_byte == round(float(PAL[idx].mean()), 4)


def test_gif_frames_sampling(spark):
    frames = [_idx(3, 4, s) for s in range(5)]
    rows = [
        (7, "video", encode_gif(frames, PAL, delays_ms=[10] * 5), None),
        (8, "video", b"not a gif at all", None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {(r.media_id, r.frame_idx): r for r in gif_frames(df).collect()}
    assert sorted(out) == [(7, i) for i in range(5)]  # non-GIF drops out
    assert out[(7, 2)].mean_byte == round(float(PAL[frames[2]].mean()), 4)
    sampled = sorted(r.frame_idx for r in gif_frames(df, every_n=2).collect())
    assert sampled == [0, 2, 4]

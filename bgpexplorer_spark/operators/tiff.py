"""Baseline TIFF decoder in pure stdlib ``struct`` + numpy — no codec
libraries.

Covers the uncompressed baseline profile (TIFF 6.0 §4): II/MM byte
orders, 8-bit grayscale / RGB / RGBA, chunky planar configuration,
single- or multi-strip images, Compression=1 only. PackBits/LZW/JPEG-in-
TIFF and 16-bit samples return None → the multimodal fake path. The
inverse ``encode_tiff`` builds deterministic fixtures; the format is
lossless so round-trips are exact.

Flows into ``operators.multimodal.decode_media`` as ``decoder='tiff'``.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def decode_tiff(b: bytes) -> np.ndarray | None:
    """TIFF bytes → (h, w, channels) uint8, or None if not a decodable
    uncompressed 8-bit baseline TIFF."""
    try:
        return _decode_strict(b)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _read_entries(b: bytes, e: str, ifd: int) -> dict | None:
    n = struct.unpack_from(e + "H", b, ifd)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, off)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            raw_off = off + 8
        else:
            raw_off = struct.unpack_from(e + "I", b, off + 8)[0]
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt is None:
            continue  # ASCII/RATIONAL tags are irrelevant here
        vals = list(struct.unpack_from(e + str(cnt) + fmt, b, raw_off))
        tags[tag] = vals
    return tags


def _decode_strict(b: bytes) -> np.ndarray | None:
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    ifd = struct.unpack_from(e + "I", b, 4)[0]
    tags = _read_entries(b, e, ifd)
    if not tags or _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
        return None
    w, h = tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SPP, [1])[0]
    bits = tags.get(_TAG_BITS, [8])
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    if comp != 1 or planar != 1 or spp not in (1, 3, 4):
        return None  # compressed / planar-separate — out of scope
    if any(x != 8 for x in bits):
        return None  # 16-bit / bilevel — out of scope
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    if not w or not h:
        return None
    data = b"".join(
        b[o : o + c] for o, c in zip(offsets, counts)
    )
    need = w * h * spp
    if len(data) < need:
        return None
    return np.frombuffer(data, np.uint8, count=need).reshape(h, w, spp)


def encode_tiff(arr: np.ndarray, big_endian: bool = False,
                rows_per_strip: int | None = None) -> bytes:
    """(h, w) / (h, w, 1|3|4) uint8 → uncompressed baseline TIFF bytes
    (optionally big-endian / multi-strip). Lossless."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = [arr[y : y + rps].tobytes() for y in range(0, h, rps)]
    photometric = 1 if spp == 1 else 2

    entries = []  # (tag, type, count, values)
    entries.append((_TAG_WIDTH, 4, 1, [w]))
    entries.append((_TAG_HEIGHT, 4, 1, [h]))
    entries.append((_TAG_BITS, 3, spp, [8] * spp))
    entries.append((_TAG_COMPRESSION, 3, 1, [1]))
    entries.append((_TAG_PHOTOMETRIC, 3, 1, [photometric]))
    entries.append((_TAG_STRIP_OFFSETS, 4, len(strips), None))  # patched
    entries.append((_TAG_SPP, 3, 1, [spp]))
    entries.append((_TAG_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((_TAG_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]))
    entries.append((_TAG_PLANAR, 3, 1, [1]))

    header = struct.pack(e + "2sHI", b"II" if not big_endian else b"MM", 42, 8)
    ifd_size = 2 + len(entries) * 12 + 4
    # layout: header(8) | IFD | overflow values | strip data
    overflow = bytearray()
    overflow_base = 8 + ifd_size

    def value_field(typ, cnt, vals):
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        raw = struct.pack(e + str(cnt) + fmt, *vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = overflow_base + len(overflow)
        overflow.extend(raw)
        return struct.pack(e + "I", off)

    # strip offsets need the final data position: compute after overflow
    # for the OTHER entries, so build in two passes
    pending = []
    for tag, typ, cnt, vals in entries:
        if tag == _TAG_STRIP_OFFSETS:
            pending.append(None)
        else:
            pending.append(value_field(typ, cnt, vals))
    # strip offsets go last in the overflow area (or inline if 1 strip)
    data_base = overflow_base + len(overflow)
    if len(strips) > 1:
        data_base += 4 * len(strips)
    offs = []
    acc = data_base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    idx = [i for i, (t, *_r) in enumerate(entries) if t == _TAG_STRIP_OFFSETS][0]
    if len(strips) == 1:
        pending[idx] = struct.pack(e + "I", offs[0])
    else:
        pending[idx] = struct.pack(e + "I", overflow_base + len(overflow))
        overflow.extend(struct.pack(e + str(len(strips)) + "I", *offs))

    out = bytearray(header)
    out += struct.pack(e + "H", len(entries))
    for (tag, typ, cnt, _v), field in zip(entries, pending):
        out += struct.pack(e + "HHI", tag, typ, cnt) + field
    out += struct.pack(e + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)

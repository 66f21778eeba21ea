"""Baseline + extension TIFF codec in pure stdlib ``struct`` + numpy —
no codec libraries.

Covers the baseline profile (TIFF 6.0 §4) plus the two baseline-adjacent
compressions: II/MM byte orders, 8-bit grayscale / RGB / RGBA, chunky
planar configuration, single- or multi-strip images, Compression=1
(none), Compression=32773 (PackBits, TIFF 6.0 §9) and Compression=5
(LZW, TIFF 6.0 §13 — MSB-first variable-width codes with the
early-change convention, optional horizontal-differencing Predictor=2,
§14). JPEG-in-TIFF and 16-bit samples return None → the multimodal fake
path. The inverse ``encode_tiff`` builds deterministic fixtures; all
covered profiles are lossless so round-trips are exact.

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
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_LZW_CLEAR, _LZW_EOI = 256, 257


def _packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits RLE: n in 0..127 copies n+1 literals,
    n in -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    p, end = 0, len(data)
    while p < end:
        n = data[p] - 256 if data[p] > 127 else data[p]
        p += 1
        if n >= 0:
            out += data[p : p + n + 1]
            p += n + 1
        elif n != -128:
            out += data[p : p + 1] * (1 - n)
            p += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits: runs of >= 3 as repeats, the rest as literal groups."""
    out = bytearray()
    p, end = 0, len(data)
    while p < end:
        run = 1
        while p + run < end and run < 128 and data[p + run] == data[p]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[p]])
            p += run
            continue
        lit = p
        while p < end and p - lit < 128:
            run = 1
            while p + run < end and run < 3 and data[p + run] == data[p]:
                run += 1
            if run >= 3:
                break
            p += 1
        out += bytes([p - lit - 1]) + data[lit:p]
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first codes, 9→12 bit widths with the TIFF
    early-change convention (width grows when the next free code would be
    the width's last), Clear=256 resets, EOI=257 ends."""
    out = bytearray()
    table: list[bytes] = []
    codesize = next_code = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, codesize, next_code, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        codesize, next_code, prev = 9, 258, None

    reset()
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= codesize:
            code = (bitbuf >> (nbits - codesize)) & ((1 << codesize) - 1)
            nbits -= codesize
            if code == _LZW_CLEAR:
                reset()
                continue
            if code == _LZW_EOI:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("LZW: first code not a literal")
                entry = table[code]
            else:
                if code < next_code:
                    entry = table[code]
                elif code == next_code:
                    entry = prev + prev[:1]  # the KwKwK case
                else:
                    raise ValueError("LZW: code beyond table")
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << codesize) - 1 and codesize < 12:
                    codesize += 1
            out += entry
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode` (same early-change timing; emits
    Clear when the table fills, per TIFF 6.0 §13)."""
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    codesize, next_code = 9, 258
    emit(_LZW_CLEAR, codesize)
    w = b""
    for c in data:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w], codesize)
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags ours by one entry (it creates entry n
        # while reading the code AFTER the one whose emission created n
        # here), so our width bump at 1<<codesize lands on the same code
        # index as its early-change bump at (1<<codesize)-1
        if next_code == (1 << codesize) and codesize < 12:
            codesize += 1
        if next_code == 4094:  # table nearly full: reset (spec §13)
            emit(_LZW_CLEAR, codesize)
            table = {bytes([i]): i for i in range(256)}
            codesize, next_code = 9, 258
        w = bytes([c])
    if w:
        emit(table[w], codesize)
    emit(_LZW_EOI, codesize)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


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
    predictor = tags.get(_TAG_PREDICTOR, [1])[0]
    if comp not in (1, 5, 32773) or planar != 1 or spp not in (1, 3, 4):
        return None  # other compressions / planar-separate — out of scope
    if any(x != 8 for x in bits):
        return None  # 16-bit / bilevel — out of scope
    if predictor not in (1, 2):
        return None  # floating-point predictor — out of scope
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    if not w or not h:
        return None
    strips = [b[o : o + c] for o, c in zip(offsets, counts)]
    if comp == 32773:
        strips = [_packbits_decode(s) for s in strips]
    elif comp == 5:
        strips = [_lzw_decode(s) for s in strips]
    data = b"".join(strips)
    need = w * h * spp
    if len(data) < need:
        return None
    arr = np.frombuffer(data, np.uint8, count=need).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing (§14): undo with a per-row/channel
        # cumulative sum mod 256
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    return arr


def encode_tiff(arr: np.ndarray, big_endian: bool = False,
                rows_per_strip: int | None = None,
                compression: str = "none",
                predictor: bool = False) -> bytes:
    """(h, w) / (h, w, 1|3|4) uint8 → baseline TIFF bytes (optionally
    big-endian / multi-strip / ``compression`` in none|packbits|lzw /
    horizontal-differencing ``predictor``). Lossless."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    comp_id, pack = {
        "none": (1, lambda s: s),
        "packbits": (32773, _packbits_encode),
        "lzw": (5, _lzw_encode),
    }[compression]
    stored = arr
    if predictor:
        stored = np.diff(
            arr.astype(np.int16), axis=1, prepend=np.zeros((h, 1, spp), np.int16)
        ).astype(np.uint8)
        # first column keeps the absolute value (prepend 0 diff == value)
    strips = [pack(stored[y : y + rps].tobytes()) for y in range(0, h, rps)]
    photometric = 1 if spp == 1 else 2

    entries = []  # (tag, type, count, values)
    entries.append((_TAG_WIDTH, 4, 1, [w]))
    entries.append((_TAG_HEIGHT, 4, 1, [h]))
    entries.append((_TAG_BITS, 3, spp, [8] * spp))
    entries.append((_TAG_COMPRESSION, 3, 1, [comp_id]))
    entries.append((_TAG_PHOTOMETRIC, 3, 1, [photometric]))
    entries.append((_TAG_STRIP_OFFSETS, 4, len(strips), None))  # patched
    entries.append((_TAG_SPP, 3, 1, [spp]))
    entries.append((_TAG_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((_TAG_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]))
    entries.append((_TAG_PLANAR, 3, 1, [1]))
    if predictor:
        entries.append((_TAG_PREDICTOR, 3, 1, [2]))

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

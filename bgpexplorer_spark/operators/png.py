"""PNG decoder in pure stdlib ``zlib`` + numpy — no codec libraries.

Covers the common still-image profile: 8-bit greyscale (color type 0),
truecolor RGB (2), palette (3), greyscale+alpha (4), and RGBA (6), with
all five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6),
multi-chunk IDAT streams, Adam7 interlacing (each of the seven passes
is an independently-filtered sub-image scattered back onto the
(y0 + i·dy, x0 + j·dx) grid), and 16-bit depth (downconverted to 8-bit
via the high byte — filters reference bpp bytes left, so the byte-wise
unfilter is depth-agnostic). Sub-8-bit depths return None → the
multimodal fake path. The inverse ``encode_png`` (filter 0,
optionally Adam7) builds deterministic real-PNG fixtures for tests; PNG
is lossless so round-trips are exact, and libpng's ``pngfix`` is used in
tests as an independent validator of the emitted streams.

Flows into ``operators.multimodal.decode_media`` as ``decoder='png'``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(b: bytes) -> np.ndarray | None:
    """PNG bytes → (h, w, channels) uint8 (palette expanded to RGB,
    alpha preserved as a 2nd/4th channel, 16-bit downconverted via the
    high byte), or None if not a decodable 8/16-bit PNG."""
    try:
        return _decode_strict(b)
    except (zlib.error, struct.error, IndexError, ValueError):
        return None


def _unfilter(raw: bytes, off: int, height: int, width: int, bpp: int):
    """Unfilter ``height`` scanlines of a (sub-)image starting at byte
    ``off`` of the inflated stream. ``bpp`` = bytes per pixel (filters
    reference the pixel ``bpp`` bytes to the left, RFC 2083 §6). Returns
    (filtered bytes (h, w*bpp) uint8, next offset) or None on a bad
    filter byte / short stream."""
    stride = width * bpp
    need = height * (stride + 1)
    if len(raw) < off + need:
        return None
    lines = np.frombuffer(raw, np.uint8, count=need, offset=off).reshape(
        height, stride + 1
    )
    filters = lines[:, 0]
    out = np.zeros((height, stride), np.uint16)
    zero = np.zeros(stride, np.uint16)
    for y in range(height):
        f = filters[y]
        cur = lines[y, 1:].astype(np.uint16)
        up = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — a per-byte-lane prefix sum mod 256
            out[y] = (
                cur.reshape(width, bpp).astype(np.int64).cumsum(axis=0) & 0xFF
            ).reshape(stride)
        elif f == 2:  # Up
            out[y] = (cur + up) & 0xFF
        elif f == 3:  # Average
            row = cur.copy()
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((int(left) + int(up[x])) >> 1)) & 0xFF
            out[y] = row
        elif f == 4:  # Paeth
            row = cur.copy()
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                ul = up[x - bpp] if x >= bpp else 0
                p = int(left) + int(up[x]) - int(ul)
                pa, pb, pc = abs(p - int(left)), abs(p - int(up[x])), abs(p - int(ul))
                pred = left if pa <= pb and pa <= pc else (up[x] if pb <= pc else ul)
                row[x] = (row[x] + int(pred)) & 0xFF
            out[y] = row
        else:
            return None
    return out.astype(np.uint8), off + need


def _decode_strict(b: bytes) -> np.ndarray | None:
    if len(b) < 8 + 25 or b[:8] != _SIG:
        return None
    pos, n = 8, len(b)
    width = height = None
    ctype = None
    interlace = 0
    palette: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= n:
        clen, tag = struct.unpack(">I4s", b[pos : pos + 8])
        data = b[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            return None
        pos += 12 + clen  # skip CRC; archives are checked elsewhere
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth not in (8, 16) or comp != 0 or filt != 0 or interlace > 1:
                return None  # sub-8-bit depths — out of scope
            if depth == 16 and ctype == 3:
                return None  # 16-bit palette is not a legal profile
            if ctype not in _CHANNELS or not width or not height:
                return None
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width is None or not idat:
        return None
    ch = _CHANNELS[ctype]
    nb = depth // 8  # bytes per sample; bpp = ch * nb
    raw = zlib.decompress(bytes(idat))

    def to8(flat: np.ndarray, ph: int, pw: int) -> np.ndarray:
        # 16-bit big-endian → high byte (the standard 8-bit downscale)
        px = flat.reshape(ph, pw, ch * nb)
        return px[:, :, ::nb] if nb == 2 else px

    if interlace:
        img8 = np.zeros((height, width, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty pass contributes no scanlines
            r = _unfilter(raw, off, ph, pw, ch * nb)
            if r is None:
                return None
            sub, off = r
            img8[y0::dy, x0::dx] = to8(sub, ph, pw)
    else:
        r = _unfilter(raw, 0, height, width, ch * nb)
        if r is None:
            return None
        img8 = np.ascontiguousarray(to8(r[0], height, width))
    if ctype == 3:
        if palette is None:
            return None
        img8 = palette[img8[:, :, 0]]
    return np.ascontiguousarray(img8)


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) / (h, w, 1|2|3|4) uint8 → PNG bytes (8-bit, filter 0,
    single IDAT; ``interlace=True`` emits Adam7 passes). Lossless, so
    decode_png(encode_png(x)) == x."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )

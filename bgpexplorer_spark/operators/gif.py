"""GIF decoder (87a/89a) in pure Python + numpy — no codec libraries.

Covers the common profile: global/local color tables, LZW image data,
interlaced images (deinterlace), multiple frames with Graphic Control
delays (animated GIFs). Each frame is decoded as its OWN rectangle
(left, top, w, h) with its palette applied; frame compositing/disposal
is presentation-side and intentionally out of scope — the pipeline
consumer gets every frame's pixels and geometry.

This makes the multimodal ``frame_sample`` story REAL for one actual
container format: ``gif_frames`` walks a GIF's frames distributed
(Arrow ``mapInPandas``), emitting per-frame geometry, delay, and pixel
statistics from the actual LZW-decoded rasters. ``decode_gif`` (first
frame, RGB) plugs into ``decode_media`` as ``decoder='gif'``.

``encode_gif`` builds deterministic fixtures: it emits a clear code
before every literal so the code width never grows — valid LZW any
decoder accepts, at zero compression (the classic "uncompressed GIF"
construction).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int] | None:
    """GIF-flavor LZW: variable code width starting at min+1, CLEAR
    resets the dictionary, EOI ends; dictionary grows to 12-bit codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader, LSB-first within and across bytes
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            width = min_code_size + 1
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None  # corrupt stream
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out if len(out) >= n_pixels else None


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace row order → sequential rows."""
    h = idx.shape[0]
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def parse_gif(b: bytes) -> dict | None:
    """GIF bytes → {'width', 'height', 'frames': [{'left','top','width',
    'height','delay_ms','rgb' (h,w,3) uint8}]} or None."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    try:
        return _parse_strict(b)
    except (IndexError, struct.error, ValueError):
        return None


def _parse_strict(b: bytes) -> dict | None:
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    frames = []
    delay_ms = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                delay_ms = struct.unpack("<H", b[pos + 2 : pos + 4])[0] * 10
            while True:  # skip sub-blocks
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block != 0x2C:  # unknown block — undecodable
            return None
        left, top, w, h, iflags = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            pal = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None or w == 0 or h == 0:
            return None
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while True:
            sz = b[pos]
            pos += 1
            if sz == 0:
                break
            data += b[pos : pos + sz]
            pos += sz
        px = _lzw_decode(min_code, bytes(data), w * h)
        if px is None:
            return None
        idx = np.array(px[: w * h], np.uint8).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        frames.append(
            {
                "left": left, "top": top, "width": w, "height": h,
                "delay_ms": delay_ms,
                "rgb": pal[np.minimum(idx, len(pal) - 1)],
            }
        )
        delay_ms = 0
    return {"width": sw, "height": sh, "frames": frames} if frames else None


def decode_gif(b: bytes) -> np.ndarray | None:
    """First frame as (h, w, 3) uint8 RGB — the decode_media form."""
    g = parse_gif(b)
    return g["frames"][0]["rgb"] if g else None


GIF_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, left int, top int, width int, height int, "
    "delay_ms int, mean_byte double"
)


def gif_frames(df, every_n: int = 1):
    """REAL frame extraction over GIF payloads: one output row per
    (sampled) frame with geometry, delay, and the decoded raster's mean —
    Arrow-batched ``mapInPandas``, per-document parallelism. Non-GIF
    payloads contribute no rows (use decode_media for format dispatch)."""
    import pandas as pd

    cols = [c.strip().split()[0] for c in GIF_FRAMES_SCHEMA.split(",")]

    def batches(it):
        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                g = parse_gif(bytes(content))
                if g is None:
                    continue
                for i, fr in enumerate(g["frames"]):
                    if i % every_n:
                        continue
                    out.append(
                        (
                            int(mid), i, fr["left"], fr["top"],
                            fr["width"], fr["height"], fr["delay_ms"],
                            round(float(fr["rgb"].mean()), 4),
                        )
                    )
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(batches, schema=GIF_FRAMES_SCHEMA)


# --- fixture encoder --------------------------------------------------------


def _lzw_encode_flat(min_code_size: int, pixels: np.ndarray) -> bytes:
    """Valid LZW with zero compression: CLEAR before every literal keeps
    the dictionary empty and the code width fixed at min+1."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nacc = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    for p in pixels.ravel():
        emit(int(p))
        emit(clear)
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray], palette: np.ndarray, delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Index-array frames (h, w) uint8 + palette (n, 3) → GIF89a bytes.
    All frames share the global color table and full-canvas geometry."""
    h, w = frames[0].shape
    bits = max(2, int(np.ceil(np.log2(len(palette)))))
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    for i, fr in enumerate(frames):
        if delays_ms is not None:
            out += b"\x21\xf9\x04\x00" + struct.pack(
                "<H", delays_ms[i] // 10
            ) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = fr
        if interlace:
            order = (
                list(range(0, h, 8)) + list(range(4, h, 8))
                + list(range(2, h, 4)) + list(range(1, h, 2))
            )
            idx = fr[order]
        out.append(bits)  # LZW min code size
        data = _lzw_encode_flat(bits, idx)
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)

"""EXIF metadata extraction — the "typed metadata from opaque binary"
stage of a multimodal pipeline, dependency-free: EXIF is a TIFF IFD tree
embedded in a JPEG APP1 segment (CIPA DC-008 / JEITA CP-3451, itself
TIFF 6.0 §2), so the walker here parses real wire bytes: JPEG marker
scan → "Exif\\0\\0" APP1 → TIFF header → IFD0 → Exif sub-IFD. Bare TIFF
files are accepted directly (their IFD0 carries the same tags).

Reference parity note: the reference engine has no media handling at
all; this module exists for the LLM-data-pipeline north star
(BASELINE.json), where "image column" means "billions of camera files
whose upload metadata lies" — orientation, timestamps, and dimensions
must come from the bytes.

Every reader is guarded: corrupted captures return partial dicts or
None, never raise (one exception aborts a whole Arrow batch).
"""

from __future__ import annotations

import struct

# IFD0 tags
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_ORIENTATION = 274
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
# Exif sub-IFD tags
_TAG_EXPOSURE = 33434
_TAG_FNUMBER = 33437
_TAG_ISO = 34855
_TAG_DT_ORIGINAL = 36867
_TAG_PIXEL_X = 40962
_TAG_PIXEL_Y = 40963

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(b: bytes, e: str, off: int) -> dict[int, object]:
    """One IFD → {tag: value} where value is int (SHORT/LONG, first
    element), str (ASCII, NUL-stripped), or (num, den) (RATIONAL, first
    element). Bounds-checked throughout; bad entries are skipped."""
    tags: dict[int, object] = {}
    if off < 0 or off + 2 > len(b):
        return tags
    (n,) = struct.unpack_from(e + "H", b, off)
    for i in range(n):
        ent = off + 2 + i * 12
        if ent + 12 > len(b):
            break
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, ent)
        size = _TYPE_SIZES.get(typ, 0) * cnt
        if size == 0:
            continue
        if size <= 4:
            voff = ent + 8
        else:
            (voff,) = struct.unpack_from(e + "I", b, ent + 8)
        if voff + size > len(b):
            continue
        if typ == 2:  # ASCII
            tags[tag] = b[voff : voff + cnt].split(b"\x00", 1)[0].decode(
                "ascii", "replace"
            )
        elif typ in (3, 4):  # SHORT / LONG: first element
            fmt = "H" if typ == 3 else "I"
            tags[tag] = struct.unpack_from(e + fmt, b, voff)[0]
        elif typ == 5:  # RATIONAL: first (num, den)
            num, den = struct.unpack_from(e + "II", b, voff)
            tags[tag] = (num, den)
    return tags


def _tiff_exif(b: bytes) -> dict | None:
    """TIFF blob (bare file or the APP1 payload) → EXIF dict."""
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    (ifd0,) = struct.unpack_from(e + "I", b, 4)
    t0 = _read_ifd(b, e, ifd0)
    sub = {}
    if isinstance(t0.get(_TAG_EXIF_IFD), int):
        sub = _read_ifd(b, e, t0[_TAG_EXIF_IFD])

    def rat(v):
        return v if isinstance(v, tuple) else (None, None)

    def i32(v):
        # hostile LONG-typed values can exceed the int32 serving columns;
        # wrap-or-abort is worse than NULL
        return v if isinstance(v, int) and 0 <= v < 2**31 else None

    exp = rat(sub.get(_TAG_EXPOSURE))
    fnum = rat(sub.get(_TAG_FNUMBER))
    ori = t0.get(_TAG_ORIENTATION)
    return {
        "make": t0.get(_TAG_MAKE) if isinstance(t0.get(_TAG_MAKE), str) else None,
        "model": t0.get(_TAG_MODEL) if isinstance(t0.get(_TAG_MODEL), str) else None,
        "orientation": ori
        if isinstance(ori, int) and 1 <= ori <= 8 else None,
        "datetime": t0.get(_TAG_DATETIME)
        if isinstance(t0.get(_TAG_DATETIME), str) else None,
        "datetime_original": sub.get(_TAG_DT_ORIGINAL)
        if isinstance(sub.get(_TAG_DT_ORIGINAL), str) else None,
        "exposure_num": exp[0],
        "exposure_den": exp[1],
        "fnumber_num": fnum[0],
        "fnumber_den": fnum[1],
        "iso": i32(sub.get(_TAG_ISO)),
        "pixel_x": sub.get(_TAG_PIXEL_X)
        if isinstance(sub.get(_TAG_PIXEL_X), int) else None,
        "pixel_y": sub.get(_TAG_PIXEL_Y)
        if isinstance(sub.get(_TAG_PIXEL_Y), int) else None,
    }


def parse_exif(b: bytes) -> dict | None:
    """JPEG (APP1 Exif) or bare TIFF bytes → EXIF dict, else None.
    Never raises on corrupt input."""
    try:
        if b[:4] in (b"II*\x00", b"MM\x00*"):
            return _tiff_exif(b)
        if b[:2] != b"\xff\xd8":
            return None
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xFF:  # spec-legal 0xFF fill byte between segments
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xDA:  # start of scan — no APP1 before it
                return None
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            if seglen < 2 or pos + 2 + seglen > len(b):
                return None
            if marker == 0xE1 and b[pos + 4 : pos + 10] == b"Exif\x00\x00":
                return _tiff_exif(b[pos + 10 : pos + 2 + seglen])
            pos += 2 + seglen
        return None
    except (struct.error, IndexError, ValueError):
        return None


def build_exif_app1(
    make: str = "", model: str = "", orientation: int = 1,
    datetime: str = "", exposure: tuple[int, int] = (1, 50),
    iso: int = 100, pixel_x: int = 0, pixel_y: int = 0,
    big_endian: bool = False,
) -> bytes:
    """A minimal valid APP1 Exif segment (for tests/fixtures): IFD0 with
    Make/Model/Orientation/DateTime + an Exif sub-IFD with
    ExposureTime/ISO/PixelX/PixelY. Splice after a JPEG SOI with
    :func:`splice_app1`."""
    e = ">" if big_endian else "<"

    def entry(tag, typ, cnt, value_field):
        return struct.pack(e + "HHI", tag, typ, cnt) + value_field

    # layout: header(8) | IFD0 | subIFD | overflow strings/rationals
    mk = make.encode() + b"\x00"
    md = model.encode() + b"\x00"
    dt = datetime.encode() + b"\x00"
    n0 = 5
    ifd0_off = 8
    ifd0_size = 2 + n0 * 12 + 4
    sub_off = ifd0_off + ifd0_size
    n1 = 4
    sub_size = 2 + n1 * 12 + 4
    data_off = sub_off + sub_size
    blobs = b""

    def val_or_off(raw: bytes) -> bytes:
        nonlocal blobs
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = data_off + len(blobs)
        blobs += raw
        return struct.pack(e + "I", off)

    ifd0 = struct.pack(e + "H", n0)
    ifd0 += entry(_TAG_MAKE, 2, len(mk), val_or_off(mk))
    ifd0 += entry(_TAG_MODEL, 2, len(md), val_or_off(md))
    ifd0 += entry(
        _TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation).ljust(4, b"\x00")
    )
    ifd0 += entry(_TAG_DATETIME, 2, len(dt), val_or_off(dt))
    ifd0 += entry(_TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", sub_off))
    ifd0 += struct.pack(e + "I", 0)

    sub = struct.pack(e + "H", n1)
    sub += entry(
        _TAG_EXPOSURE, 5, 1, val_or_off(struct.pack(e + "II", *exposure))
    )
    sub += entry(_TAG_ISO, 3, 1, struct.pack(e + "H", iso).ljust(4, b"\x00"))
    sub += entry(_TAG_PIXEL_X, 4, 1, struct.pack(e + "I", pixel_x))
    sub += entry(_TAG_PIXEL_Y, 4, 1, struct.pack(e + "I", pixel_y))
    sub += struct.pack(e + "I", 0)

    tiff = (b"II*\x00" if not big_endian else b"MM\x00*")
    tiff += struct.pack(e + "I", ifd0_off) + ifd0 + sub + blobs
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after a JPEG's SOI marker."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]

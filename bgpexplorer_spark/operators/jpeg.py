"""Baseline JPEG (ITU-T T.81 sequential DCT, JFIF) codec in pure
numpy + stdlib — no codec libraries.

Decoder: baseline Huffman-coded scans (SOF0) AND progressive (SOF2 —
spectral selection, successive approximation with DC/AC refinement
scans, EOB runs), 8-bit precision, 1 or 3 components, sampling factors
up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals, 0xFF00 byte
stuffing. Arithmetic coding and lossless/hierarchical modes return None
(→ the multimodal fake path). Flows into
``operators.multimodal.decode_media`` as the ``decoder='jpeg'`` branch
so compressed images decode FOR REAL here.

Encoder: the inverse for BOTH modes (quality-scaled Annex K
quantization tables, standard Annex K Huffman tables, 4:4:4 or 4:2:0,
optional restart interval, grayscale; ``encode_jpeg_progressive`` emits
a spectral-selection + successive-approximation scan script over the
SAME quantized coefficients) — used by tests to build deterministic
real-JPEG fixtures inside a container that ships no image library.
Sharing the quantizer between the modes makes progressive-vs-baseline
decode an EXACT-equality cross-validation oracle: a bug on either side
of the progressive path cannot hide behind round-trip symmetry.

All tables below are from the public T.81 spec (Annex K); the DCT is the
separable orthonormal 8x8 DCT-II matrix.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position k → natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K quantization tables (zigzag order after np.ravel()[ZIGZAG]^-1;
# stored here in natural row-major order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K Huffman tables: (bits[16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8x8 DCT-II matrix: FDCT F = C @ X @ C.T, IDCT X = C.T @ F @ C
_n = np.arange(8)
_C = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_C[0] *= np.sqrt(0.5)


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: (code_length, code) → symbol."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, code_length)."""
    enc, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            enc[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return enc


class _BadData(Exception):
    pass


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    stuffing; restart markers are consumed at byte-aligned boundaries."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise _BadData("truncated scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    # marker inside entropy data (EOI / next scan): per
                    # T.81 the decoder pads with 1-bits at segment end
                    self.pos -= 1
                    b = 0xFF
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        d, n = self.data, len(self.data)
        while self.pos + 1 < n:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise _BadData("missing restart marker")


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise _BadData("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_block(r, dc_tab, ac_tab, qtab_zz, pred: int):
    """One 8x8 block → (natural-order dequantized coefficients, new DC
    predictor). ``qtab_zz`` is the quantization table in zigzag order."""
    coeffs = np.zeros(64)
    s = _huff_decode(r, dc_tab)
    if s > 15:  # T.81 F.1.2.1.1: DC magnitude category <= 15
        raise _BadData("DC magnitude category out of range")
    pred += _extend(r.read_bits(s), s) if s else 0
    coeffs[0] = pred * qtab_zz[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise _BadData("coefficient index out of range")
        coeffs[ZIGZAG[k]] = _extend(r.read_bits(size), size) * qtab_zz[k]
        k += 1
    return coeffs.reshape(8, 8), pred


def decode_jpeg(b: bytes) -> np.ndarray | None:
    """Baseline JFIF bytes → (h, w, 3) RGB or (h, w, 1) grayscale uint8;
    None if not a decodable baseline JPEG (the caller falls back)."""
    try:
        return _decode_jpeg_strict(b)
    except (_BadData, IndexError, KeyError, OverflowError, struct.error,
            ValueError):
        # KeyError: a scan referencing a component id absent from SOF.
        # OverflowError: belt-and-braces — a corrupted stream decoding an
        # out-of-spec magnitude category could otherwise build a Python int
        # too large for the int64 coefficient store.
        return None


def _decode_jpeg_strict(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    width = height = 0
    restart_interval = 0
    progressive = False
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            return None
        seglen = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    tab = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    tab = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
                qt[tq] = tab  # zigzag order, as stored
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive SOF
            if seg[0] != 8:
                return None
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                h_i, v_i = hv >> 4, hv & 15
                if not (1 <= h_i <= 2 and 1 <= v_i <= 2):
                    return None  # sampling beyond 2x2 — out of scope
                comps.append((cid, h_i, v_i, tq))
            if nc not in (1, 3):
                return None
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDA:  # SOS
            if not comps or not width:
                return None
            if progressive:
                # the progressive driver owns the rest of the marker walk
                # (multiple scans with DHT/DRI interleaved)
                return _decode_progressive(
                    b, pos, width, height, comps, qt, huff, restart_interval
                )
            ns = seg[0]
            if ns != len(comps):
                return None
            scan_tabs = {}
            for si in range(ns):
                cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan_tabs[cid] = (tt >> 4, tt & 15)
            return _decode_scan(
                b, pos + 2 + seglen, width, height, comps, scan_tabs, qt,
                huff, restart_interval,
            )
        pos += 2 + seglen
    return None


def _decode_scan(b, pos, width, height, comps, scan_tabs, qt, huff, ri):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = [
        np.zeros((mcuy * v * 8, mcux * h * 8)) for (_, h, v, _) in comps
    ]
    dc_tabs, ac_tabs, qtabs = [], [], []
    for cid, _h, _v, tq in comps:
        td, ta = scan_tabs[cid]
        if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
            raise _BadData("missing table")
        dc_tabs.append(huff[(0, td)])
        ac_tabs.append(huff[(1, ta)])
        qtabs.append(qt[tq])
    r = _BitReader(b, pos)
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            r.sync_restart()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (_cid, h_i, v_i, _tq) in enumerate(comps):
            for by in range(v_i):
                for bx in range(h_i):
                    coeffs, preds[ci] = _decode_block(
                        r, dc_tabs[ci], ac_tabs[ci], qtabs[ci], preds[ci]
                    )
                    block = _C.T @ coeffs @ _C + 128
                    y0 = (my * v_i + by) * 8
                    x0 = (mx * h_i + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    return _assemble(planes, comps, width, height, hmax, vmax)


def _assemble(planes, comps, width, height, hmax, vmax):
    """Per-component MCU-grid sample planes → final uint8 image
    (upsample subsampled planes, crop, YCbCr→RGB) — shared by the
    baseline streaming path and the progressive reconstruction."""
    full = []
    for ci, (_cid, h_i, v_i, _tq) in enumerate(comps):
        p = planes[ci]
        if h_i != hmax or v_i != vmax:
            p = np.repeat(np.repeat(p, vmax // v_i, axis=0), hmax // h_i, axis=1)
        full.append(p[:height, :width])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# --- progressive (SOF2) decoding -------------------------------------------
#
# Coefficients accumulate across scans in per-component (BH, BW, 64)
# arrays in ZIGZAG order; DC scans may be interleaved (MCU layout), AC
# scans are single-component over the component's own block grid
# (T.81 §G.1.2). Successive approximation: first scans deliver values
# <<Al, refinement scans append one magnitude bit per plane.


def _decode_progressive(b, pos, width, height, comps, qt, huff, ri):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # per-component block grids: full MCU-padded (for interleaved DC) and
    # the component's own grid (for non-interleaved AC scans)
    coefs = []
    grids = []
    for _cid, h_i, v_i, _tq in comps:
        coefs.append(np.zeros((mcuy * v_i, mcux * h_i, 64), np.int64))
        comp_w = -(-(width * h_i) // hmax)
        comp_h = -(-(height * v_i) // vmax)
        grids.append((-(-comp_h // 8), -(-comp_w // 8)))
    n = len(b)
    saw_scan = False
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seglen = struct.unpack(">H", b[pos + 2 : pos + 4])[0]
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:  # DHT between scans
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                huff[(tc, th)] = _build_decode_table(
                    bits, list(seg[i + 17 : i + 17 + cnt])
                )
                i += 17 + cnt
        elif marker == 0xDD:
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    qt[tq] = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int64)
                    i += 128
                else:
                    qt[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int64)
                    i += 64
        elif marker == 0xDA:
            pos = _decode_prog_scan(
                b, pos + 2 + seglen, seg, comps, coefs, grids, huff, ri,
                mcux, mcuy,
            )
            saw_scan = True
            continue
        pos += 2 + seglen
    if not saw_scan:
        return None
    return _reconstruct(coefs, comps, qt, width, height, hmax, vmax)


def _decode_prog_scan(b, data_pos, seg, comps, coefs, grids, huff, ri,
                      mcux, mcuy):
    ns = seg[0]
    scan = []  # (comp index, dc table, ac table)
    cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
    for si in range(ns):
        cid, tt = seg[1 + 2 * si], seg[2 + 2 * si]
        scan.append((cid_to_idx[cid], tt >> 4, tt & 15))
    ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahl >> 4, ahl & 15
    if ss > se or se > 63 or (ss == 0) != (se == 0):
        raise _BadData("bad spectral band")
    if ss > 0 and ns != 1:
        raise _BadData("AC scans are single-component")
    r = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    eobrun = 0

    def dc_unit(ci, dc_tab, by, bx):
        coef = coefs[ci][by, bx]
        if ah == 0:
            if dc_tab is None:
                raise _BadData("missing DC table")
            s = _huff_decode(r, dc_tab)
            if s > 15:  # T.81 F.1.2.1.1: DC magnitude category <= 15
                raise _BadData("DC magnitude category out of range")
            preds[ci] += _extend(r.read_bits(s), s) if s else 0
            coef[0] = preds[ci] << al
        elif r.read_bit():
            coef[0] |= 1 << al

    if ss == 0:
        if ns == 1:
            # non-interleaved DC scan: the component's OWN block grid
            ci, td, _ta = scan[0]
            ch, cw = grids[ci]
            for m in range(ch * cw):
                if ri and m and m % ri == 0:
                    r.sync_restart()
                    preds = [0] * len(comps)
                by, bx = divmod(m, cw)
                dc_unit(ci, huff.get((0, td)), by, bx)
        else:
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    r.sync_restart()
                    preds = [0] * len(comps)
                my, mx = divmod(m, mcux)
                for ci, td, _ta in scan:
                    _cid, h_i, v_i, _tq = comps[ci]
                    for by in range(v_i):
                        for bx in range(h_i):
                            dc_unit(ci, huff.get((0, td)),
                                    my * v_i + by, mx * h_i + bx)
    else:
        ci, _td, ta = scan[0]
        ac_tab = huff.get((1, ta))
        if ac_tab is None:
            raise _BadData("missing AC table")
        ch, cw = grids[ci]
        for m in range(ch * cw):
            if ri and m and m % ri == 0:
                r.sync_restart()
                eobrun = 0
            by, bx = divmod(m, cw)
            coef = coefs[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(r, ac_tab, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(r, ac_tab, coef, ss, se, al, eobrun)
    # skip to the next marker (0xFF followed by a non-stuffing byte)
    p, n = r.pos, len(b)
    while p + 1 < n and not (b[p] == 0xFF and b[p + 1] != 0x00):
        p += 1
    return p


def _ac_first_block(r, ac_tab, coef, ss, se, al, eobrun):
    """T.81 §G.1.2.2 — first AC scan of a band at bit plane ``al``."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, ac_tab)
        run, s = rs >> 4, rs & 15
        if s == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            eobrun = 1 << run
            if run:
                eobrun += r.read_bits(run)
            return eobrun - 1
        k += run
        if k > se:
            raise _BadData("band overrun")
        coef[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(r, ac_tab, coef, ss, se, al, eobrun):
    """T.81 §G.1.2.3 — successive-approximation AC refinement (the
    libjpeg decode_mcu_AC_refine control flow): correction bits for
    already-nonzero coefficients, ±1<<al for newly-significant ones,
    EOB runs carry the remaining corrections of each covered block."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, ac_tab)
            run, s = rs >> 4, rs & 15
            if s == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                val = 0  # ZRL: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise _BadData("invalid refinement magnitude")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if coef[k]:
                    if r.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k]:
                if r.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(coefs, comps, qt, width, height, hmax, vmax):
    """Accumulated zigzag coefficients → sample planes → image."""
    planes = []
    for ci, (_cid, _h, _v, tq) in enumerate(comps):
        if tq not in qt:
            raise _BadData("missing quantization table")
        deq = coefs[ci] * qt[tq]  # both zigzag order
        nat = np.zeros_like(deq)
        nat[..., ZIGZAG] = deq
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8).astype(np.float64)
        spatial = np.einsum("ij,xyjk,kl->xyil", _C.T, blocks, _C) + 128
        planes.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _assemble(planes, comps, width, height, hmax, vmax)


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _quality_scale(tab: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tab * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_block(w: _BitWriter, block: np.ndarray, qtab_zz, dc_enc, ac_enc,
                  pred: int) -> int:
    coeffs = _C @ (block - 128.0) @ _C.T
    zz = np.round(coeffs.ravel()[ZIGZAG] / qtab_zz).astype(np.int64)
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = int(diff).bit_length() if diff else 0
    code, ln = dc_enc[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
    return pred


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_seg(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 → baseline JFIF
    bytes. ``subsampling``: '444' or '420' (3-channel only)."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    gray = arr.shape[2] == 1
    qy = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    qy_zz, qc_zz = qy[ZIGZAG], qc[ZIGZAG]

    if gray:
        y = arr[:, :, 0]
        planes = [y]
        samp = [(1, 1)]
        qzz = [qy_zz]
    else:
        r, g, bl = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128
        if subsampling == "420":
            # pad to even, then 2x2 box average
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        planes = [y, cb, cr]
        qzz = [qy_zz, qc_zz, qc_zz]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to its MCU-aligned size (edge replication)
    padded = []
    for p, (hi, vi) in zip(planes, samp):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    dc_y = _build_encode_table(*HUFF_DC_LUMA)
    ac_y = _build_encode_table(*HUFF_AC_LUMA)
    dc_c = _build_encode_table(*HUFF_DC_CHROMA)
    ac_c = _build_encode_table(*HUFF_AC_CHROMA)
    enc_tabs = [(dc_y, ac_y)] + [(dc_c, ac_c)] * (len(planes) - 1)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qy_zz.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc_zz.astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, HUFF_DC_LUMA) + _dht_seg(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += _dht_seg(0, 1, HUFF_DC_CHROMA) + _dht_seg(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            dc_enc, ac_enc = enc_tabs[ci]
            for by in range(vi):
                for bx in range(hi):
                    y0 = (my * vi + by) * 8
                    x0 = (mx * hi + bx) * 8
                    preds[ci] = _encode_block(
                        bw, padded[ci][y0 : y0 + 8, x0 : x0 + 8],
                        qzz[ci], dc_enc, ac_enc, preds[ci],
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive (SOF2) encoder --------------------------------------------


def _quantized_coefs(arr, quality, subsampling):
    """Shared front half of encoding: color transform, subsampling,
    MCU padding, FDCT, quantization → per-component (BH, BW, 64)
    zigzag-order coefficient arrays. The coefficients are IDENTICAL to
    what the baseline encoder transmits, which is what makes
    progressive-vs-baseline decode an exact-equality oracle."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    gray = arr.shape[2] == 1
    qy_zz = _quality_scale(QT_LUMA, quality)[ZIGZAG]
    qc_zz = _quality_scale(QT_CHROMA, quality)[ZIGZAG]
    if gray:
        planes, samp, qzz = [arr[:, :, 0]], [(1, 1)], [qy_zz]
    else:
        r, g, bl = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128
        if subsampling == "420":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2

            def pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

            cb = pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        planes = [y, cb, cr]
        qzz = [qy_zz, qc_zz, qc_zz]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []
    for p, (hi, vi), q in zip(planes, samp, qzz):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        bh, bw = th // 8, tw // 8
        out = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                co = _C @ (block - 128.0) @ _C.T
                out[by, bx] = np.round(co.ravel()[ZIGZAG] / q).astype(np.int64)
        coefs.append(out)
    return samp, qzz, coefs, h, w, gray, mcux, mcuy


def _emit_extend_bits(wtr, v, s):
    wtr.write(v if v > 0 else v + (1 << s) - 1, s)


def _emit_dc_first(wtr, coefs, scan_cis, samp, mcux, mcuy, al, dc_encs):
    preds = {ci: 0 for ci in scan_cis}

    def one(ci, by, bx):
        v = int(coefs[ci][by, bx, 0]) >> al
        diff = v - preds[ci]
        preds[ci] = v
        s = abs(diff).bit_length()
        code, ln = dc_encs[ci][s]
        wtr.write(code, ln)
        if s:
            _emit_extend_bits(wtr, diff, s)

    if len(scan_cis) == 1:
        bh, bw = coefs[scan_cis[0]].shape[:2]
        for m in range(bh * bw):
            by, bx = divmod(m, bw)
            one(scan_cis[0], by, bx)
        return
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in scan_cis:
            hi, vi = samp[ci]
            for by in range(vi):
                for bx in range(hi):
                    one(ci, my * vi + by, mx * hi + bx)


def _emit_dc_refine(wtr, coefs, scan_cis, samp, mcux, mcuy, al):
    if len(scan_cis) == 1:
        bh, bw = coefs[scan_cis[0]].shape[:2]
        for m in range(bh * bw):
            by, bx = divmod(m, bw)
            wtr.write((int(coefs[scan_cis[0]][by, bx, 0]) >> al) & 1, 1)
        return
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in scan_cis:
            hi, vi = samp[ci]
            for by in range(vi):
                for bx in range(hi):
                    wtr.write(
                        (int(coefs[ci][my * vi + by, mx * hi + bx, 0]) >> al) & 1,
                        1,
                    )


def _emit_ac_first(wtr, carr, grid, ss, se, al, ac_enc):
    ch, cw = grid
    for m in range(ch * cw):
        by, bx = divmod(m, cw)
        coef = carr[by, bx]
        run = 0
        for k in range(ss, se + 1):
            v = int(coef[k])
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_enc[0xF0]
                wtr.write(c, ln)
                run -= 16
            s = t.bit_length()
            c, ln = ac_enc[(run << 4) | s]
            wtr.write(c, ln)
            _emit_extend_bits(wtr, t if v > 0 else -t, s)
            run = 0
        if run:
            c, ln = ac_enc[0x00]  # EOB run of 1
            wtr.write(c, ln)


def _emit_ac_refine(wtr, carr, grid, ss, se, al, ac_enc):
    ch, cw = grid
    for m in range(ch * cw):
        by, bx = divmod(m, cw)
        coef = carr[by, bx]
        absv = [abs(int(coef[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # index (into the band) of the last NEWLY-significant coef
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        run = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            k = ss + i
            if t == 0:
                run += 1
                continue
            # ZRLs must be emitted when reaching ANY nonzero coefficient
            # (history included) so a zero run never extends past a
            # passed-over coefficient — the decoder reads that
            # coefficient's correction bit during a later symbol's walk
            while run > 15 and i <= eob:
                c, ln = ac_enc[0xF0]
                wtr.write(c, ln)
                for bit in br:
                    wtr.write(bit, 1)
                br = []
                run -= 16
            if t > 1:  # history coefficient: correction bit, run unchanged
                br.append(t & 1)
                continue
            c, ln = ac_enc[(run << 4) | 1]
            wtr.write(c, ln)
            wtr.write(1 if int(coef[k]) > 0 else 0, 1)
            for bit in br:
                wtr.write(bit, 1)
            br = []
            run = 0
        if run > 0 or br:
            c, ln = ac_enc[0x00]
            wtr.write(c, ln)
            for bit in br:
                wtr.write(bit, 1)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsampling: str = "444",
    script: list | None = None,
) -> bytes:
    """Baseline→progressive re-plan of the SAME quantized coefficients:
    SOF2 with a spectral-selection + successive-approximation scan
    script (default: the classic DC-first(Al=1) → AC bands at Al>0 →
    DC refine → AC refinements shape). Because quantization is shared
    with :func:`encode_jpeg`, decoding this stream must yield EXACTLY
    the pixels of the baseline stream — the cross-validation oracle the
    progressive decoder is tested against."""
    samp, qzz, coefs, h, w, gray, mcux, mcuy = _quantized_coefs(
        arr, quality, subsampling
    )
    ncomp = len(coefs)
    grids = []
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    for hi, vi in samp:
        comp_w = -(-(w * hi) // hmax)
        comp_h = -(-(h * vi) // vmax)
        grids.append((-(-comp_h // 8), -(-comp_w // 8)))
    if script is None:
        if gray:
            script = [
                ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 0, 0, 1, 0), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
            ]
        else:
            script = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0, 1, 2], 0, 0, 1, 0),
                ([0], 1, 63, 2, 1),
                ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
            ]

    dc_y = _build_encode_table(*HUFF_DC_LUMA)
    ac_y = _build_encode_table(*HUFF_AC_LUMA)
    dc_c = _build_encode_table(*HUFF_DC_CHROMA)
    ac_c = _build_encode_table(*HUFF_AC_CHROMA)
    dc_encs = [dc_y] + [dc_c] * (ncomp - 1)
    ac_encs = [ac_y] + [ac_c] * (ncomp - 1)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qzz[0].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qzz[1].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hi, vi) in enumerate(samp):
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    out += _dht_seg(0, 0, HUFF_DC_LUMA) + _dht_seg(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += _dht_seg(0, 1, HUFF_DC_CHROMA) + _dht_seg(1, 1, HUFF_AC_CHROMA)

    for scan_cis, ss, se, ah, al in script:
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            sos += bytes([ci + 1, ((0 if ci == 0 else 1) << 4) | (0 if ci == 0 else 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw_ = _BitWriter()
        if ss == 0:
            if ah == 0:
                _emit_dc_first(bw_, coefs, scan_cis, samp, mcux, mcuy, al, dc_encs)
            else:
                _emit_dc_refine(bw_, coefs, scan_cis, samp, mcux, mcuy, al)
        else:
            ci = scan_cis[0]
            if ah == 0:
                _emit_ac_first(bw_, coefs[ci], grids[ci], ss, se, al, ac_encs[ci])
            else:
                _emit_ac_refine(bw_, coefs[ci], grids[ci], ss, se, al, ac_encs[ci])
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)

"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (BASELINE.json north star). Media rows carry (media_id,
media_type, content BINARY, meta STRUCT); decode/feature/resize run as
``mapInPandas`` so each Arrow batch amortizes the Python crossing and
binary payloads never pass through a row-at-a-time UDF.

Decoders: formats that need NO external codec libraries are decoded FOR
REAL — BMP (24-bit uncompressed) and PPM/PGM binary via numpy, WAV via
the stdlib ``wave`` module, JPEG via the pure-numpy T.81 codec in
``operators.jpeg`` (baseline AND progressive/SOF2, 4:4:4/4:2:2/4:2:0,
restart intervals), PNG via stdlib zlib + numpy in ``operators.png``
(1/2/4/8/16-bit gray/RGB/RGBA/palette, all five filters, Adam7), GIF
via the pure-Python LZW walk in ``operators.gif`` (87a/89a, interlace,
animated frames — ``gif.gif_frames`` does REAL frame sampling), and
baseline TIFF via ``operators.tiff`` (II/MM, multi-strip,
gray/RGB/RGBA, uncompressed + PackBits + LZW with the horizontal
predictor). MPEG audio (MP3) gets a REAL frame-header metadata walk
via ``operators.mp3`` (``decoder='mp3-meta'``: exact sample rate /
channels / duration from the 4-byte headers; the waveform itself stays
undecoded). MP4/MOV video gets the same treatment via the ISO-BMFF box
walk in ``operators.mp4`` (``decoder='mp4-meta'``: duration, display
dimensions, frame count from the moov tree). Payloads none of the
walkers recognize fall back to a clearly-marked deterministic fake
(``decoder='fake'``, mode='auto') or raise NotImplementedError
(mode='real'). The Spark-side plumbing — schema, batching, partition
layout — is identical either way.
"""

from __future__ import annotations

import hashlib
import io
import re
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_w", T.IntegerType()),
                    T.StructField("declared_h", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, decoder string, width int, height int, "
    "channels int, sample_rate int, duration_ms int, n_bytes long, "
    "content_sha1 string, mean_byte double"
)

# --- real dependency-free decoders -----------------------------------------


def decode_bmp(b: bytes) -> np.ndarray | None:
    """24-bit uncompressed Windows BMP → (h, w, 3) uint8 RGB, or None if
    not such a BMP."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    off = struct.unpack("<I", b[10:14])[0]
    w, h = struct.unpack("<ii", b[18:26])
    bpp, comp = struct.unpack("<H", b[28:30])[0], struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    rowbytes = ((w * 3 + 3) // 4) * 4
    need = rowbytes * abs(h)
    if off + need > len(b):
        return None
    rows = np.frombuffer(b, np.uint8, count=need, offset=off).reshape(abs(h), rowbytes)
    arr = rows[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]  # BGR → RGB
    if h > 0:  # positive height = bottom-up storage
        arr = arr[::-1]
    return np.ascontiguousarray(arr)


_PNM_HEADER = re.compile(rb"^(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s")


def decode_pnm(b: bytes) -> np.ndarray | None:
    """Binary PPM (P6) / PGM (P5) → (h, w, 3|1) uint8, or None."""
    m = _PNM_HEADER.match(b)
    if not m or int(m.group(4)) > 255:
        return None
    w, h = int(m.group(2)), int(m.group(3))
    ch = 3 if m.group(1) == b"P6" else 1
    need = w * h * ch
    data = b[m.end() : m.end() + need]
    if len(data) < need:
        return None
    return np.frombuffer(data, np.uint8).reshape(h, w, ch)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM bytes (the re-encode side of the real
    resize path)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _read_pcm(b: bytes) -> tuple[bytes, int, int, int, int] | None:
    """Guarded RIFF/WAVE PCM read shared by :func:`decode_wav` and
    :func:`audio_features`: (frames, sample_width, rate, channels,
    declared_nframes), or None on anything malformed. The stdlib
    wave/chunk machinery raises RuntimeError (chunk.seek on a corrupt
    size), struct.error, ValueError and OSError on malformed captures
    besides its own wave.Error — a decoder must never raise, so every
    class is caught HERE, once, and 16-bit payloads are clipped to
    whole samples (a truncated capture with an over-declared data chunk
    can end on an odd byte)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(b)) as f:
            nch, sw, rate, nframes = (
                f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes(),
            )
            raw = f.readframes(nframes)
    except (wave.Error, EOFError, OSError, RuntimeError, ValueError,
            struct.error):
        return None
    if sw == 2:
        raw = raw[: len(raw) - len(raw) % 2]
    return raw, sw, rate, nch, nframes


def _pcm_samples(raw: bytes, sw: int) -> "np.ndarray | None":
    """PCM bytes → centered float64 samples — THE sample-typing policy,
    shared by every audio operator: 16-bit signed, 8-bit unsigned
    offset-128, anything else (24/32-bit, which the wave module exposes
    but can't type) → None so callers emit NULLs instead of byte-wise
    garbage."""
    if sw == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float64)
    if sw == 1:
        return np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    return None


def decode_wav(b: bytes) -> dict | None:
    """RIFF/WAVE → {channels, sample_rate, duration_ms, mean_byte} via the
    stdlib wave module (16-bit PCM mean = mean |sample| / 256 so the scale
    matches byte-space; other widths report the raw byte mean), or None."""
    pcm = _read_pcm(b)
    if pcm is None:
        return None
    raw, sw, rate, nch, nframes = pcm
    if sw == 2:
        samples = np.frombuffer(raw, np.int16)
        mean = float(np.abs(samples).mean() / 256) if samples.size else 0.0
    else:
        samples = np.frombuffer(raw, np.uint8)
        mean = float(samples.mean()) if samples.size else 0.0
    return {
        "channels": nch,
        "sample_rate": rate,
        "duration_ms": int(nframes * 1000 / rate) if rate else 0,
        "mean_byte": round(mean, 4),
    }


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample — pure numpy fancy-indexing."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(th) * (h / th)).astype(int), h - 1)
    xs = np.minimum((np.arange(tw) * (w / tw)).astype(int), w - 1)
    return np.ascontiguousarray(arr[ys][:, xs])


def _fake_decode(content: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for codec-requiring formats: dimensions
    derived from the content hash, mean byte computed for real. Keeps the
    distributed plumbing honest without the libraries."""
    h = hashlib.sha1(content).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_byte = (sum(content) / len(content)) if content else 0.0
    return width, height, channels, round(mean_byte, 4)


def _decode_one(raw: bytes, mtype: str, mode: str) -> dict:
    """One payload → decoded feature dict. mode: 'auto' (real where the
    format allows, fake otherwise), 'real' (raise on undecodable),
    'fake' (always fake — the round-1 behavior)."""
    base = {
        "width": None, "height": None, "channels": None,
        "sample_rate": None, "duration_ms": None,
    }
    if mode != "fake":
        img = decode_bmp(raw)
        kind = "bmp" if img is not None else None
        if img is None:
            img = decode_pnm(raw)
            kind = "ppm" if img is not None else None
        if img is None and raw[:2] == b"\xff\xd8":
            from bgpexplorer_spark.operators.jpeg import decode_jpeg

            img = decode_jpeg(raw)
            kind = "jpeg" if img is not None else None
        if img is None and raw[:8] == b"\x89PNG\r\n\x1a\n":
            from bgpexplorer_spark.operators.png import decode_png

            img = decode_png(raw)
            kind = "png" if img is not None else None
        if img is None and raw[:4] == b"GIF8":
            from bgpexplorer_spark.operators.gif import decode_gif

            img = decode_gif(raw)
            kind = "gif" if img is not None else None
        if img is None and raw[:4] in (b"II*\x00", b"MM\x00*"):
            from bgpexplorer_spark.operators.tiff import decode_tiff

            img = decode_tiff(raw)
            kind = "tiff" if img is not None else None
        if img is not None:
            base.update(
                height=img.shape[0], width=img.shape[1], channels=img.shape[2],
            )
            return {**base, "decoder": kind, "mean_byte": round(float(img.mean()), 4)}
        au = decode_wav(raw)
        if au is not None:
            base.update(
                channels=au["channels"], sample_rate=au["sample_rate"],
                duration_ms=au["duration_ms"],
            )
            return {**base, "decoder": "wav", "mean_byte": au["mean_byte"]}
        from bgpexplorer_spark.operators.mp3 import parse_mp3_meta

        mp3 = parse_mp3_meta(raw)
        if mp3 is not None:
            # frame-header metadata walk: real sample_rate/channels/
            # duration without a synthesis filterbank; mean byte over the
            # raw payload (the audio itself stays undecoded)
            base.update(
                channels=mp3["channels"], sample_rate=mp3["sample_rate"],
                duration_ms=mp3["duration_ms"],
            )
            mean = round(sum(raw) / len(raw), 4) if raw else 0.0
            return {**base, "decoder": "mp3-meta", "mean_byte": mean}
        from bgpexplorer_spark.operators.mp4 import parse_mp4_meta

        mp4 = parse_mp4_meta(raw)
        if mp4 is not None:
            # ISO-BMFF box walk: real duration/dimensions/frame count
            # without a video codec (the frames stay undecoded)
            base.update(
                width=mp4.get("width"), height=mp4.get("height"),
                duration_ms=mp4["duration_ms"],
            )
            mean = round(sum(raw) / len(raw), 4) if raw else 0.0
            return {**base, "decoder": "mp4-meta", "mean_byte": mean}
        if mode == "real":
            raise NotImplementedError(
                f"no dependency-free decoder for this {mtype} payload "
                "(full video decode needs codec libraries absent here)"
            )
    w, h, c, mean = _fake_decode(raw)
    base.update(width=w, height=h, channels=c)
    return {**base, "decoder": "fake", "mean_byte": mean}


def decode_media(df: DataFrame, use_real: bool = False, mode: str | None = None) -> DataFrame:
    """media table → decoded feature rows via Arrow-batched mapInPandas.
    ``mode='auto'`` decodes BMP/PPM/WAV for real and falls back to the
    deterministic fake elsewhere; legacy ``use_real=True`` maps to
    mode='real' (raise on undecodable)."""
    mode = mode or ("real" if use_real else "auto")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                raw = bytes(content)
                d = _decode_one(raw, str(mtype), mode)
                out.append(
                    (
                        int(mid), str(mtype), d["decoder"], d["width"], d["height"],
                        d["channels"], d["sample_rate"], d["duration_ms"],
                        len(raw), hashlib.sha1(raw).hexdigest(), d["mean_byte"],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "decoder", "width", "height",
                    "channels", "sample_rate", "duration_ms",
                    "n_bytes", "content_sha1", "mean_byte",
                ],
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, n_bytes long, resized_ppm binary"
)


def decode_image_pixels(raw: bytes) -> np.ndarray | None:
    """Pixel-level image decode dispatch across every in-package codec
    (BMP/PNM/JPEG/PNG/GIF/TIFF) → (h, w, c) uint8, or None. The shared
    entry for any operator that needs the actual pixels (resize, aHash)
    rather than :func:`_decode_one`'s summary stats."""
    img = decode_bmp(raw)
    if img is None:
        img = decode_pnm(raw)
    if img is None and raw[:2] == b"\xff\xd8":
        from bgpexplorer_spark.operators.jpeg import decode_jpeg

        img = decode_jpeg(raw)
    if img is None and raw[:8] == b"\x89PNG\r\n\x1a\n":
        from bgpexplorer_spark.operators.png import decode_png

        img = decode_png(raw)
    if img is None and raw[:4] == b"GIF8":
        from bgpexplorer_spark.operators.gif import decode_gif

        img = decode_gif(raw)
    if img is None and raw[:4] in (b"II*\x00", b"MM\x00*"):
        from bgpexplorer_spark.operators.tiff import decode_tiff

        img = decode_tiff(raw)
    return img


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize: decodable payloads (BMP/PPM) are REALLY resampled
    (nearest-neighbor numpy) and re-encoded as binary PPM; undecodable
    ones keep the deterministic stub (target dims, 3-byte-per-pixel
    budget, null payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                img = decode_image_pixels(raw)
                if img is not None:
                    if img.shape[2] == 2:  # gray+alpha → gray
                        img = img[:, :, :1]
                    elif img.shape[2] == 4:  # RGBA → RGB for PPM
                        img = img[:, :, :3]
                    if img.shape[2] == 1:  # grayscale → RGB for PPM
                        img = np.repeat(img, 3, axis=2)
                    rz = resize_nearest(img, target_w, target_h)
                    ppm = encode_ppm(rz)
                    out.append((int(mid), target_w, target_h, len(ppm), ppm))
                else:
                    out.append(
                        (int(mid), target_w, target_h, target_w * target_h * 3, None)
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "n_bytes", "resized_ppm"],
            )

    return df.filter(df.media_type == "image").mapInPandas(batches, schema=RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, use_container: bool = False
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp. ``use_container=True`` reads the REAL duration from the
    ISO-BMFF box tree (operators/mp4.parse_mp4_meta) inside Arrow
    batches instead of trusting declared metadata — the shape a real
    pipeline wants, since upload metadata lies."""
    from pyspark.sql import functions as F

    vids = df.filter(df.media_type == "video")
    if use_container:
        from bgpexplorer_spark.operators.mp4 import parse_mp4_meta

        def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                out = []
                for mid, content, meta in zip(
                    pdf["media_id"], pdf["content"], pdf["meta"]
                ):
                    m = parse_mp4_meta(bytes(content))
                    dur = (
                        m["duration_ms"] if m is not None
                        else (meta or {}).get("duration_ms") or 0
                    )
                    out.append((int(mid), int(dur)))
                yield pd.DataFrame(out, columns=["media_id", "duration_ms"])

        vids = vids.mapInPandas(probe, "media_id long, duration_ms int")
        dur_col = F.col("duration_ms")
    else:
        dur_col = F.col("meta.duration_ms")
    n_frames = F.greatest((dur_col / every_ms).cast("int"), F.lit(1))
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)


AHASH_SCHEMA = "media_id long, ahash string, band int, width int, height int"


def ahash_media(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) image fingerprint — the image
    analog of MinHash for the dedup pipeline: decode to pixels, collapse
    channels to grayscale (channel mean), block-average down to
    ``grid``×``grid`` cells, threshold each cell at the image's global
    mean, and emit the grid²-bit pattern MSB-first row-major as a bit
    string plus its first 16 bits as an integer ``band`` for LSH-style
    bucket joins. Invariant to uniform brightness shifts (pixel and
    threshold move together) — the exact near-dup class byte hashing
    misses. Kept as a string so the 64-bit pattern needs no
    signed-overflow care on either engine.

    Dims not divisible by ``grid`` are cropped to the largest multiple
    (deterministic); undecodable payloads emit NULL hash. One
    Arrow-batched mapInPandas, no shuffle — grouping/banding composes
    downstream on the returned columns.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                gray, cells, w, h = _gray_cells(bytes(content), grid)
                if cells is None:
                    out.append((int(mid), None, None, w, h))
                    continue
                # GLOBAL image mean, before any crop — the documented
                # threshold (a bright cropped-off edge must still shift
                # every bit the same way)
                gmean = gray.mean()
                bits = (cells > gmean).reshape(-1)
                s = "".join("1" if b else "0" for b in bits)
                out.append((int(mid), s, int(s[:16], 2), w, h))
            yield pd.DataFrame(
                out, columns=["media_id", "ahash", "band", "width", "height"]
            )

    return df.filter(df.media_type == "image").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


def _gray_cells(content: bytes, grid: int):
    """Shared perceptual-hash prologue (ahash/dct-phash): decode,
    channel-mean grayscale, crop to the largest ``grid`` multiple,
    block-average to a ``grid``×``grid`` cell matrix. Returns
    (gray_uncropped, cells, width, height); (None, None, None, None)
    for undecodables and (gray, None, w, h) for images smaller than one
    cell — callers emit their NULL-hash rows from that."""
    img = decode_image_pixels(content)
    if img is None:
        return None, None, None, None
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    th, tw = (h // grid) * grid, (w // grid) * grid
    if th == 0 or tw == 0:
        return g, None, int(w), int(h)
    cells = g[:th, :tw].reshape(grid, th // grid, grid, tw // grid).mean(
        axis=(1, 3)
    )
    return g, cells, int(w), int(h)


def dct_phash_media(
    df: DataFrame, dct_grid: int = 16, out: int = 8
) -> DataFrame:
    """DCT perceptual hash (classic pHash) — the robust cousin of
    :func:`ahash_media`: decode to pixels, grayscale, block-average down
    to a ``dct_grid``×``dct_grid`` working grid (crop to the largest
    multiple first), orthonormal 2-D DCT-II, keep the top-left
    ``out``×``out`` low-frequency block, and threshold each coefficient
    at the MEDIAN of the 63 AC coefficients (strict >; the DC slot —
    index 0, the brightness term — is emitted as a constant '1' so the
    64-bit string stays band-compatible with :func:`phash_neardup_pairs`
    and contributes 0 to every Hamming distance). Adding a constant to
    every pixel changes ONLY the DC coefficient, so the hash is exactly
    brightness-shift invariant — and unlike aHash it also survives
    smooth gradients and mild blur (energy moves within, not across, the
    low-frequency block).

    Coefficients are rounded to 6 decimals BEFORE the median/compare on
    both this side and the SQL oracle: the rounding kills the ~1e-13
    summation-order noise between BLAS and a sequential SQL fold, making
    the bit pattern engine-reproducible even when structured images put
    many coefficients at exactly the same value. Same Arrow-batched
    mapInPandas shape and output schema as aHash."""

    u = np.arange(dct_grid).reshape(-1, 1).astype(np.float64)
    x = np.arange(dct_grid).reshape(1, -1).astype(np.float64)
    basis = np.cos(np.pi * (2 * x + 1) * u / (2 * dct_grid))
    basis *= np.sqrt(2.0 / dct_grid)
    basis[0, :] = np.sqrt(1.0 / dct_grid)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _gray, cells, w, h = _gray_cells(bytes(content), dct_grid)
                if cells is None:
                    rows.append((int(mid), None, None, w, h))
                    continue
                coef = basis @ cells @ basis.T
                v = np.round(coef[:out, :out].reshape(-1), 6)
                med = np.median(v[1:])
                bits = "".join(
                    "1" if (i == 0 or v[i] > med) else "0"
                    for i in range(out * out)
                )
                rows.append((int(mid), bits, int(bits[:16], 2), w, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "ahash", "band", "width", "height"]
            )

    return df.filter(df.media_type == "image").mapInPandas(
        batches, schema=AHASH_SCHEMA
    )


def audio_energy_hash(df: DataFrame, frames: int = 64) -> DataFrame:
    """Perceptual AUDIO fingerprint — the clip analog of
    :func:`ahash_media` for the dedup pipeline: decode PCM, collapse to
    mono (per-sample channel mean), split into ``frames`` equal time
    frames (tail remainder dropped), compute each frame's mean-square
    energy, and threshold every frame at the MEDIAN frame energy
    (strict >). Scaling the volume multiplies every frame energy AND the
    median by the same factor, so the hash is exactly gain-invariant —
    the near-dup class (same recording, different loudness) byte hashing
    misses. Emits the same (media_id, ahash, band, …) shape as the image
    hashes, so banding/near-dup pairs reuse :func:`phash_neardup_pairs`
    unchanged. 16-bit sums of squares stay integer-exact in float64, so
    the bits are engine-reproducible with no rounding step. Clips
    shorter than ``frames`` samples (or undecodable / >16-bit payloads)
    emit NULL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                pcm = _read_pcm(bytes(content))
                row = (int(mid), None, None, None, None)
                if pcm is not None:
                    raw, sw, rate, nch, _n = pcm
                    s = _pcm_samples(raw, sw)
                    if s is not None and nch:
                        s = s[: (s.size // nch) * nch]
                        mono = s.reshape(-1, nch).mean(axis=1)
                        flen = mono.size // frames
                        if flen:
                            f = mono[: flen * frames].reshape(frames, flen)
                            ms = (f * f).mean(axis=1)
                            med = np.median(ms)
                            bits = "".join(
                                "1" if v > med else "0" for v in ms
                            )
                            row = (
                                int(mid), bits, int(bits[:16], 2),
                                int(rate), int(nch),
                            )
                rows.append(row)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "ahash", "band", "sample_rate", "channels"],
            )

    return df.filter(df.media_type == "audio").mapInPandas(
        batches,
        schema="media_id long, ahash string, band int, "
               "sample_rate int, channels int",
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_samples long, "
    "duration_ms int, rms double, peak int, zero_crossings long"
)


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip scalar audio features over REAL decoded PCM — the
    feature-extract stage of an audio training pipeline: sample count,
    duration, RMS amplitude (rounded 4), peak |sample|, and
    zero-crossing count (sign flips between consecutive samples, the
    cheap voicing/noisiness proxy). 16-bit samples are exact in float64
    for any clip shorter than 2^23 samples per Arrow row, so the RMS is
    bit-reproducible. ``n_samples`` counts the interleaved stream
    across channels (RMS/ZCR are measured over it — documented, matches
    the byte order on disk); ``duration_ms`` derives from DECODED frames
    (n_samples / channels), not the declared header. Only 8/16-bit PCM
    is interpreted; 24/32-bit clips emit NULLs rather than byte-wise
    garbage (the wave module exposes but can't type them).

    One Arrow-batched mapInPandas (PCM read shared with
    :func:`decode_wav` via ``_read_pcm``); undecodable payloads emit
    NULLs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                row = (int(mid), None, None, None, None, None, None, None)
                pcm = _read_pcm(bytes(content))
                if pcm is not None:
                    frames, sw, rate, nch, _ = pcm
                    s = _pcm_samples(frames, sw)
                    if s is not None and s.size and rate and nch:
                        n = s.size
                        rms = round(float(np.sqrt(np.mean(s * s))), 4)
                        zc = int(np.sum((s[:-1] >= 0) != (s[1:] >= 0)))
                        row = (
                            int(mid), int(rate), int(nch), int(n),
                            int((n // nch) * 1000 // rate), rms,
                            int(np.abs(s).max()), zc,
                        )
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "channels", "n_samples",
                    "duration_ms", "rms", "peak", "zero_crossings",
                ],
            )

    return df.filter(df.media_type == "audio").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 3, id_col: str = "media_id"
) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs from :func:`ahash_media`
    output — the image analog of SimHash dedup, with the same AND-OR
    banding as dedup._banded_hamming_pairs: 6 sub-bands over the 64-bit
    pattern, join on every C(6, 6 − max_hamming) fully-intact sub-band
    combination's concatenated key (≤ max_hamming flips damage ≤
    max_hamming sub-bands, so one keyed combination always survives —
    exact completeness, and the wide keys resist the correlated-bit
    bucket skew perceptual hashes share with SimHash), then the exact
    Hamming distance verifies INLINE in the join via four 16-bit
    ``bit_count(XOR)`` chunks (whole-stage codegen, no per-bit loop) —
    unverified candidates never materialize; distinct sees verified
    pairs only. Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤
    ``max_hamming`` — complete for the budget, same guarantee as
    dedup.simhash_candidate_pairs.
    """
    import itertools

    n_sub = 6
    r = n_sub - max_hamming
    if r < 1:
        raise ValueError(
            f"max_hamming={max_hamming} with {n_sub} sub-bands leaves no "
            "fully-intact sub-band combination to key on — the join "
            "would degrade to all-pairs"
        )
    widths = [11, 11, 11, 11, 10, 10]
    offsets = [1 + sum(widths[:i]) for i in range(n_sub)]
    # the banding + 4×16-bit XOR chunks below assume exactly 64 bits; a
    # hash from ahash_media(grid != 8) would silently read past the
    # string (conv('') → NULL hamming → every pair filtered out). Guard
    # IN-EXPRESSION (raise_error inside the same job) rather than with a
    # driver-side precheck, which would re-run the upstream media decode.
    checked = F.when(F.length("ahash") == 64, F.col("ahash")).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "phash_neardup_pairs requires 64-bit hashes "
                    "(ahash_media grid=8); got length "
                ),
                F.length("ahash").cast("string"),
            )
        )
    )
    h = hashes.filter(F.col("ahash").isNotNull()).select(
        F.col(id_col).alias("_id"), checked.alias("ahash")
    )
    keys = [
        F.concat_ws(
            "|", F.lit(str(ci)),
            *[F.substring("ahash", offsets[i], widths[i]) for i in combo],
        )
        for ci, combo in enumerate(itertools.combinations(range(n_sub), r))
    ]
    bands = h.select(
        "_id", "ahash", F.explode(F.array(*keys)).alias("_band")
    )
    a, b = bands.alias("a"), bands.alias("b")
    chunks = [
        F.bit_count(
            F.conv(F.substring("a.ahash", p * 16 + 1, 16), 2, 10).cast("long")
            .bitwiseXOR(
                F.conv(F.substring("b.ahash", p * 16 + 1, 16), 2, 10)
                .cast("long")
            )
        )
        for p in range(4)
    ]
    ham = chunks[0]
    for c in chunks[1:]:
        ham = ham + c
    return (
        a.join(b, "_band")
        .filter((F.col("a._id") < F.col("b._id")) & (ham <= max_hamming))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )


EXIF_SCHEMA = (
    "media_id long, make string, model string, orientation int, "
    "datetime string, exposure_num long, exposure_den long, iso int, "
    "pixel_x long, pixel_y long"
)


def exif_metadata(df: DataFrame) -> DataFrame:
    """Typed camera metadata from opaque image bytes — the REAL wire
    walk (JPEG marker scan → APP1 "Exif\\0\\0" → TIFF IFD tree, both
    endiannesses; bare TIFF accepted directly) via operators/exif.py.
    Upload metadata lies; orientation/timestamps/dimensions must come
    from the bytes before training-set filtering trusts them. Payloads
    without EXIF emit NULLs. One Arrow-batched mapInPandas, no shuffle.
    """
    from bgpexplorer_spark.operators.exif import parse_exif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "make", "model", "orientation", "datetime",
            "exposure_num", "exposure_den", "iso", "pixel_x", "pixel_y",
        ]
        for pdf in it:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                x = parse_exif(bytes(content))
                if x is None:
                    out.append((int(mid),) + (None,) * 9)
                else:
                    out.append((
                        int(mid), x["make"], x["model"], x["orientation"],
                        x["datetime"], x["exposure_num"], x["exposure_den"],
                        x["iso"], x["pixel_x"], x["pixel_y"],
                    ))
            yield pd.DataFrame(out, columns=cols)

    return df.filter(df.media_type == "image").mapInPandas(
        batches, schema=EXIF_SCHEMA
    )

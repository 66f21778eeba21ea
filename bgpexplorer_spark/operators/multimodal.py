"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (BASELINE.json north star). The Spark-side plumbing — schema,
partition-friendly layout, Arrow-batched Pandas UDF signatures, batch
shapes — is real and tested; the actual codec calls are stubbed behind an
import-try because the image/audio libraries are not in this container.

Pattern: media rows carry (media_id, media_type, content BINARY, meta
STRUCT). Decode/feature/resize run as ``mapInPandas`` so each Arrow batch
amortizes Python crossing, and binary payloads never pass through a
row-at-a-time UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
    "media_id long, media_type string, width int, height int, channels int, "
    "n_bytes long, content_sha1 string, mean_byte double"
)

def _real_decode(content: bytes, media_type: str):
    """Real codec path — requires PIL/soundfile/av, absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no codecs
        raise NotImplementedError(
            "image/audio codecs not available in this container; "
            "deterministic fake decode is used instead"
        ) from exc
    raise NotImplementedError("real decode wiring pending codec availability")

def _fake_decode(content: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for the decoder: dimensions derived from the
    content hash, mean byte computed for real. Keeps the distributed
    plumbing honest (schema, batching, determinism) without codecs."""
    h = hashlib.sha1(content).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_byte = (sum(content) / len(content)) if content else 0.0
    return width, height, channels, round(mean_byte, 4)

def decode_media(df: DataFrame, use_real: bool = False) -> DataFrame:
    """media table → decoded feature rows via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                raw = bytes(content)
                if use_real:
                    _real_decode(raw, mtype)  # raises NotImplementedError here
                w, h, c, mean = _fake_decode(raw)
                out.append(
                    (
                        int(mid), str(mtype), w, h, c, len(raw),
                        hashlib.sha1(raw).hexdigest(), mean,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "media_type", "width", "height", "channels",
                    "n_bytes", "content_sha1", "mean_byte",
                ],
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)

RESIZED_SCHEMA = "media_id long, width int, height int, n_bytes long"

def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: the real path would decode+resample per Arrow
    batch; the stub emits target dimensions with byte budget scaled
    deterministically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [target_w] * n,
                    "height": [target_h] * n,
                    "n_bytes": [target_w * target_h * 3] * n,
                }
            )

    return df.filter(df.media_type == "image").mapInPandas(batches, schema=RESIZED_SCHEMA)

def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (duration from meta; deterministic without codecs)."""
    from pyspark.sql import functions as F

    vids = df.filter(df.media_type == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)

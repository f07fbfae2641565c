"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derives metadata
from the bytes. Everything around the kernel — schema, batch iteration,
partition sizing, UDF signatures — is real and tested, so dropping in a real
decoder (PIL/libsndfile/pyav) is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, width int, height int, "
    "channels int, mean_luma double"
)


def attach_binary_column(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped DataFrame from any table (test harness: encode a
    text column as the opaque payload)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("synthetic")).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real implementation would be e.g. PIL.Image.open(BytesIO(...)).
    The deterministic fake derives pseudo-dimensions from the byte content so
    the distributed plumbing can be exercised and asserted."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "environment; pass fake=True for the deterministic test decoder")
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    luma = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return {"width": width, "height": height, "channels": 3, "mean_luma": luma}


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Partition-parallel; the pandas kernel sees ~10k rows per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "channels": [f["channels"] for f in feats],
                "mean_luma": [round(f["mean_luma"], 6) for f in feats],
            })
            yield out

    return media.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, duration_s double, "
    "sample_rate int, rms double"
)


def decode_audio(payload: bytes, fake: bool = False) -> dict:
    """STUB: real implementation would be soundfile/librosa. The
    deterministic fake derives pseudo duration/rate/energy from bytes."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "environment; pass fake=True for the deterministic test decoder")
    n = len(payload)
    rate = 16000
    duration = n / 2 / rate  # pretend 16-bit mono PCM
    rms = (sum(b * b for b in payload[:512]) / max(min(n, 512), 1)) ** 0.5 / 255.0
    return {"duration_s": duration, "sample_rate": rate, "rms": rms}


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas audio feature extraction (same Arrow-batched plumbing as
    the image path)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "duration_s": [round(f["duration_s"], 6) for f in feats],
                "sample_rate": [f["sample_rate"] for f in feats],
                "rms": [round(f["rms"], 6) for f in feats],
            })

    return media.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the pandas kernel and tags
    target dimensions in metadata (real kernel would re-encode bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                {**(m or {}), "resize": f"{width}x{height}"} for m in pdf["meta"]
            ]
            yield pdf

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame index.
    Uses built-in explode on a computed index array (no Python in the hot
    path); the per-frame decode would live in a follow-up mapInPandas."""
    n_frames = (F.length(F.col("payload")) / F.lit(100)).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return media.select(
        "media_id", "kind", "mime",
        F.explode(idx).alias("frame_index"),
        F.col("payload").alias("frame_payload"),
    )

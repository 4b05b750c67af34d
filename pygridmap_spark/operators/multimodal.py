"""Multimodal binary-column plumbing (images/audio/video as opaque bytes).

The Spark-side machinery — schema, typed metadata, Arrow batch shape,
partitioning — is real and tested; the actual codec work is stubbed behind
`NotImplementedError` (no image/audio libraries ship in this container) with
a deterministic fake decoder the tests exercise instead, as the build brief
prescribes. A real deployment plugs Pillow/torchaudio/ffmpeg into the same
mapInPandas signatures without touching the plan shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, byte_len long, content_hash string"
)


def with_media_metadata(df: DataFrame, media_col: str = "html", id_col: str = "media_id") -> DataFrame:
    """Typed metadata for an opaque binary column — pure JVM exprs."""
    return df.withColumns(
        {
            "byte_len": F.length(F.col(media_col)).cast("long"),
            "content_hash": F.sha2(F.col(media_col), 256),
        }
    )


def decode_image_real(data: bytes):
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; wire it into decode_and_featurize(fake=False)"
    )


def _fake_decode(data: bytes, feature_dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': derives a feature vector from the
    sha256 of the bytes. Stands in for decode->resize->embed so the
    distributed plumbing (batching, schema, shuffle) is fully testable."""
    digest = hashlib.sha256(data).digest()
    raw = np.frombuffer((digest * ((feature_dim * 4) // len(digest) + 1))[: feature_dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_and_featurize(
    df: DataFrame,
    media_col: str = "html",
    id_col: str = "media_id",
    feature_dim: int = 16,
    fake: bool = True,
) -> DataFrame:
    """binary -> feature vector via mapInPandas (Arrow batches of bytes in,
    array<float> out). ``fake=True`` uses the deterministic stand-in;
    ``fake=False`` raises until a codec is wired in."""

    schema = f"{id_col} long, features array<float>"

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            if not fake:
                decode_image_real(b"")
            feats = [
                _fake_decode(bytes(buf), feature_dim).tolist()
                for buf in batch[media_col]
            ]
            yield pd.DataFrame({id_col: batch[id_col].to_numpy(), "features": feats})

    return df.select(id_col, media_col).mapInPandas(_featurize, schema)


def frame_sample_plan(
    df: DataFrame,
    media_col: str = "html",
    id_col: str = "media_id",
    n_frames: int = 4,
) -> DataFrame:
    """Video-frame-sampling plan shape: each media row fans out to n_frames
    (frame_idx, byte_offset) rows — the explode happens JVM-side; the
    decode of each frame window is the (stubbed) Python stage."""
    return df.select(
        id_col,
        F.length(F.col(media_col)).cast("long").alias("byte_len"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).withColumn(
        "byte_offset",
        (F.col("frame_idx") * F.col("byte_len") / n_frames).cast("long"),
    )

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/feature kernels are STUBS (the image/audio libraries are
not in this container): each raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder exercises the
full Spark-side path — schema, partitioning, Arrow batch shape, UDF
signature — which IS real and tested.

Design (scale-first):
- media rows are ``(media_id: long, kind: string, payload: binary,
  meta: struct<width:int, height:int, sample_rate:int, n_frames:int>)``.
- kernels run via ``mapInPandas`` so one task streams Arrow batches and
  can drop/emit variable row counts (frame sampling explodes rows).
- payload bytes never pass through Python object pickling — Arrow binary
  columns end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame array<float>"


def synthesize_media(
    spark: SparkSession, n: int, kind: str = "image", seed: int = 42
) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(8)) + 1)
            .cast("int")
            .alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, size: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → float vector."""
    raw = np.frombuffer((payload * (size // max(len(payload), 1) + 1))[: size], dtype=np.uint8)
    return (raw.astype(np.float32) / 255.0)


def extract_features(
    media: DataFrame, feature_dim: int = 32, fake: bool = False
) -> DataFrame:
    """media → ``(media_id, feature: array<float>)`` via mapInPandas.

    Real decoders (PIL/ffmpeg/torchaudio) are unavailable in this
    container; pass ``fake=True`` for the deterministic stand-in."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; pass fake=True to exercise the pipeline"
                )
            feats = [
                _fake_decode(p, feature_dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, frame_dim: int = 16, fake: bool = False
) -> DataFrame:
    """video rows → one row per sampled frame (row-count-expanding kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg — pass fake=True"
                )
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                n = int(meta["n_frames"])
                for fi in range(n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        _fake_decode(payload + bytes([fi]), frame_dim).tolist()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two tiers:

1. REAL byte-level operators (no codecs required — what a 100 TB media
   pipeline runs BEFORE any decode): :func:`byte_features` (length, mean
   byte, Shannon entropy, distinct-byte count — corruption screening and
   quality filters), :func:`chunk_fingerprints` (chunk-level md5 for
   partial-duplicate detection), :func:`exact_media_duplicates` (payload
   md5 groups). All vectorized (numpy over Arrow batches, or pure JVM
   expressions).
2. Codec-dependent kernels (decode/resize/frame-extract) are STUBS — the
   image/audio libraries are not in this container: each raises
   NotImplementedError unless ``fake=True``, in which case a deterministic
   fake decoder exercises the full Spark-side path — schema, partitioning,
   Arrow batch shape, UDF signature — which IS real and tested.

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


BYTE_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, mean_byte double, byte_entropy double, "
    "n_distinct long"
)


def byte_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL byte-level payload statistics (no codec needed):
    ``(media_id, n_bytes, mean_byte, byte_entropy, n_distinct)``.

    Shannon entropy over the byte histogram + mean byte + distinct count —
    the standard pre-decode screens (truncation/corruption detection,
    format sanity, low-information filtering) for binary columns at scale.
    One numpy pass per Arrow batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, means, ents, nd = [], [], [], []
            for p in pdf[payload_col]:
                arr = np.frombuffer(p or b"", dtype=np.uint8)
                n = len(arr)
                n_bytes.append(n)
                if n == 0:
                    means.append(0.0)
                    ents.append(0.0)
                    nd.append(0)
                    continue
                counts = np.bincount(arr, minlength=256)
                nz = counts[counts > 0]
                probs = nz / n
                means.append(float(arr.sum()) / n)
                ents.append(float(-(probs * np.log2(probs)).sum()))
                nd.append(int(len(nz)))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "mean_byte": means,
                    "byte_entropy": ents,
                    "n_distinct": nd,
                }
            )

    return media.mapInPandas(kernel, schema=BYTE_FEATURE_SCHEMA)


def chunk_fingerprints(
    media: DataFrame,
    chunk_bytes: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """``(media_id, chunk_idx, chunk_hash)`` — md5 per fixed-size payload
    chunk, pure JVM expressions (binary substring + transform + explode).
    Chunk-level fingerprints catch partial duplicates (same video, new
    watermark; same image, re-encoded tail) that whole-payload hashing
    misses."""
    n_chunks = F.ceil(F.length(payload_col) / F.lit(chunk_bytes)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.md5(
                F.substring(
                    F.col(payload_col), i * chunk_bytes + 1, chunk_bytes
                )
            ).alias("chunk_hash"),
        ),
    )
    return media.select(
        F.col(id_col).alias("media_id"), F.explode(chunks).alias("c")
    ).select("media_id", "c.chunk_idx", "c.chunk_hash")


def exact_media_duplicates(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """``(media_id, group_hash, keep)`` exact payload duplicates via md5
    groupBy — one shuffle, JVM-side (binary twin of text exact dedup)."""
    keyed = media.select(
        F.col(id_col).alias("media_id"),
        F.md5(F.col(payload_col)).alias("group_hash"),
    )
    grp = keyed.groupBy("group_hash").agg(F.min("media_id").alias("_keeper"))
    return keyed.join(grp, "group_hash").select(
        "media_id",
        "group_hash",
        (F.col("media_id") == F.col("_keeper")).alias("keep"),
    )


def _fake_decode(payload: bytes, size: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: bytes → float vector."""
    raw = np.frombuffer((payload * (size // max(len(payload), 1) + 1))[: size], dtype=np.uint8)
    return (raw.astype(np.float32) / 255.0)


def pil_available() -> bool:
    """Probe for a real image codec (Pillow). False in this container; a
    future container that ships it flips :func:`extract_features`'s
    ``fake=False`` path from NotImplementedError to a real decode with no
    code change."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes, size: int) -> np.ndarray:
    """Real image feature: decode, grayscale, resize to ``size``×1 with the
    deterministic nearest-neighbor filter, pixels/255."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    small = img.resize((size, 1), resample=Image.NEAREST)
    return np.asarray(small, dtype=np.float32).reshape(-1) / 255.0


def extract_features(
    media: DataFrame, feature_dim: int = 32, fake: bool = False
) -> DataFrame:
    """media → ``(media_id, feature: array<float>)`` via mapInPandas.

    ``fake=True``: deterministic stand-in (cross-engine replayable — the
    oracle path). ``fake=False``: real decode through Pillow when the
    container ships it (``pil_available()``), NotImplementedError
    otherwise. The probe runs INSIDE the worker kernel — the driver and the
    workers may not share an environment."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode(p, feature_dim).tolist()
                    for p in pdf["payload"]
                ]
            elif pil_available():
                feats = [
                    _pil_decode(p, feature_dim).tolist()
                    for p in pdf["payload"]
                ]
            else:
                raise NotImplementedError(
                    "real media decode requires Pillow (pil_available() is "
                    "False in this container); pass fake=True to exercise "
                    "the pipeline"
                )
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

"""Multimodal (image/audio/video) column handling for training-data
pipelines (north-star surface).

Media are opaque ``binary`` payload columns with typed metadata; all
processing runs as Arrow-batched ``mapInPandas`` so payload bytes stream
through in bounded batches (never collected, never exploded into rows).
The codec layer is STUBBED: the container has no image/audio libraries, so
``decode='real'`` raises NotImplementedError at the point where PIL/ffmpeg
would be invoked, and ``decode='fake'`` derives a deterministic
pseudo-decode from the payload bytes (stable across runs/partitions) so the
Spark-side plumbing — schema, batch shape, partitioning, downstream joins —
is fully real and testable.

At 100 TB: payloads dominate storage; these operators preserve columnar
pruning (metadata-only queries never touch payload bytes because parquet
reads only requested columns) and all feature outputs are small fixed-width
arrays suitable for the similarity operators.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<format: string, width: int, height: int, duration_ms: int>"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic pseudo-decode: seed a PRNG from the payload digest."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width), dtype=np.uint8)


def decode_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_features: int = 16,
    decode: str = "fake",
) -> DataFrame:
    """(media_id, n_bytes, features array<double>) — decode + global feature
    extraction per media item."""
    if decode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {decode}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                if decode == "real":
                    raise NotImplementedError(
                        "real media decoding requires an image/audio codec "
                        "library (PIL/ffmpeg), not present in this "
                        "environment; use decode='fake'"
                    )
                px = _fake_pixels(payload, 32, 32)
                # bucketed intensity histogram as the feature vector
                hist, _ = np.histogram(px, bins=n_features, range=(0, 256))
                feat = (hist / px.size).astype(float)
                rows.append(
                    {
                        id_col: row[id_col],
                        "n_bytes": len(payload),
                        "features": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_bytes", "features"])

    return df.mapInPandas(gen, schema=f"{id_col} long, n_bytes long, features array<double>")


def resize(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width: int = 8,
    height: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """(media_id, width, height, pixels array<int>) — downsampled grid."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                if decode == "real":
                    raise NotImplementedError("real resize requires a codec library")
                px = _fake_pixels(payload, 32, 32)
                ys = np.linspace(0, px.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, px.shape[1] - 1, width).astype(int)
                small = px[np.ix_(ys, xs)]
                rows.append(
                    {
                        id_col: row[id_col],
                        "width": width,
                        "height": height,
                        "pixels": small.flatten().astype(int).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "pixels"])

    return df.mapInPandas(
        gen, schema=f"{id_col} long, width int, height int, pixels array<int>"
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    fps: float = 1.0,
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset,
    (media_id, frame_idx, offset_ms, frame_features). Frame count derives
    from meta.duration_ms; features are the stubbed decode of the frame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                meta = row[meta_col]
                duration = int(meta["duration_ms"]) if meta is not None else 0
                n_frames = max(1, int(duration / 1000.0 * fps))
                if decode == "real":
                    raise NotImplementedError("real frame decode requires ffmpeg")
                for i in range(n_frames):
                    off = int(i * 1000.0 / fps)
                    px = _fake_pixels(payload + off.to_bytes(4, "big"), 8, 8)
                    rows.append(
                        {
                            id_col: row[id_col],
                            "frame_idx": i,
                            "offset_ms": off,
                            "frame_features": (px.flatten() / 255.0).tolist(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "offset_ms", "frame_features"]
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, frame_idx int, offset_ms long, frame_features array<double>",
    )


def media_metadata_stats(df: DataFrame, kind_col: str = "kind", payload_col: str = "payload") -> DataFrame:
    """Payload-size profile per media kind — metadata-style scan. Uses
    length(payload) which still reads payload bytes; for true metadata-only
    scans keep sizes as a separate column at ingest."""
    return df.groupBy(kind_col).agg(
        F.count("*").alias("cnt"),
        F.avg(F.length(payload_col)).alias("avg_bytes"),
        F.max(F.length(payload_col)).alias("max_bytes"),
    )

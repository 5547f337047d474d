"""Multimodal columns for training-data pipelines: image/audio/video as
opaque BINARY columns with typed metadata, processed via Arrow-batched
mapInPandas.

Design (the 100 TB part is the plumbing, which is fully real here):
- media rows carry (media_id, kind, content BINARY, meta STRUCT) — the
  content bytes never pass through Python row-at-a-time; mapInPandas
  receives Arrow record batches whose binary columns are zero-copy
  pandas object arrays.
- partitioning: media tables are fan-out-heavy (one video → N frames), so
  pipelines repartition by OUTPUT volume before exploding, same rule as
  the text shingle pipelines.
- CODEC BOUNDARY: real JPEG/PNG/audio decoding requires PIL/ffmpeg which
  are NOT in this container. `decode_image(..., codec="raw")` implements
  a deterministic fake codec (content bytes are a row-major grayscale
  raster of meta.width × meta.height) so every downstream op (resize,
  features, frame sampling) is real, tested arithmetic. codec="jpeg"
  raises NotImplementedError behind an import-try of PIL — the clearly
  marked stub to swap on a cluster with the codec libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META),
    ]
)


def _require_raw(codec: str) -> None:
    if codec == "raw":
        return
    if codec in ("jpeg", "png"):
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - codec libs absent here
            raise NotImplementedError(
                "real image codecs need pillow, which is not installed in this "
                "environment; use codec='raw' (deterministic fake raster) or "
                "install pillow on the cluster"
            ) from e
        raise NotImplementedError("PIL decode path not wired yet")
    raise ValueError(f"unknown codec {codec}")


def decode_image(media: DataFrame, codec: str = "raw") -> DataFrame:
    """BINARY → per-image decoded stats (shape check + pixel mean/std).

    The decode itself runs inside mapInPandas over Arrow batches: the
    JVM→Python hop moves whole binary columns, not rows.
    """
    _require_raw(codec)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("pixel_mean", T.DoubleType()),
            T.StructField("pixel_std", T.DoubleType()),
            T.StructField("valid", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf.media_id, pdf.content, pdf.meta):
                w, h = int(meta["width"]), int(meta["height"])
                buf = np.frombuffer(content, dtype=np.uint8)
                ok = buf.size == w * h
                px = buf.astype(np.float64)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_pixels": int(buf.size),
                        "pixel_mean": float(px.mean()) if buf.size else None,
                        "pixel_std": float(px.std()) if buf.size else None,
                        "valid": bool(ok),
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(media.kind == "image").mapInPandas(run, out_schema)


def resize_images(media: DataFrame, out_w: int, out_h: int, codec: str = "raw") -> DataFrame:
    """Nearest-neighbor resize of the fake raster — real vectorized
    arithmetic, same signature a PIL-backed version would have."""
    _require_raw(codec)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf.media_id, pdf.content, pdf.meta):
                w, h = int(meta["width"]), int(meta["height"])
                img = np.frombuffer(content, dtype=np.uint8)
                if img.size != w * h:
                    continue
                img = img.reshape(h, w)
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                resized = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": mid,
                        "content": resized.tobytes(),
                        "width": out_w,
                        "height": out_h,
                    }
                )
            yield pd.DataFrame(rows)

    return media.where(media.kind == "image").mapInPandas(run, out_schema)


def byte_histogram_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Kind-agnostic content featurizer: normalized n-bin byte histogram
    as array<float> — a real, deterministic embedding usable by the
    similarity-search operators (ann_cosine_topk etc.)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(pdf.media_id, pdf.kind, pdf.content):
                buf = np.frombuffer(content, dtype=np.uint8)
                hist = np.bincount(buf >> int(np.log2(256 // n_bins)), minlength=n_bins)
                total = max(int(hist.sum()), 1)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "features": (hist / total).astype(np.float32).tolist(),
                        "n_bytes": int(buf.size),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, out_schema)


def sample_frames(media: DataFrame, every_n: int = 2, codec: str = "raw") -> DataFrame:
    """Video frame sampling: content = n_frames rasters back-to-back; emit
    every_n-th frame as its own image row (UDTF-shaped fan-out — the
    caller repartitions by expected OUTPUT volume first)."""
    _require_raw(codec)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf.media_id, pdf.content, pdf.meta):
                w, h, n = int(meta["width"]), int(meta["height"]), int(meta["n_frames"])
                frame_sz = w * h
                buf = np.frombuffer(content, dtype=np.uint8)
                if buf.size != frame_sz * n:
                    continue
                for fi in range(0, n, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_index": fi,
                            "content": buf[fi * frame_sz : (fi + 1) * frame_sz].tobytes(),
                            "width": w,
                            "height": h,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.where(media.kind == "video").mapInPandas(run, out_schema)

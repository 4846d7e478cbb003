"""Multimodal payload plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side engineering here is REAL and tested: schemas, mapInPandas
batch shapes, partition-size control for wide binary rows, deterministic
fake decoders for round-trip tests. The codec layer is a seam:
raw/zlib/png/jpeg images decode for real (numpy + stdlib codecs,
functions/png.py and functions/jpeg.py); mp3/mp4/webp raise
NotImplementedError until a decoder library is present (none ships in
this sandbox — see functions/image.py for the dispatch).

Operators:
- decode_and_featurize: binary -> fixed-width feature vector (mean/std per
  channel + 8x8 downsample), the shape of an embedding-extraction stage
- resize_images: raw RGB nearest-neighbor resize (numpy index sampling)
- sample_frames: "video" = concatenated raw frames; samples every k-th
  frame's features (deterministic; a stand-in for keyframe extraction)
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .image import decode_image

FEATURE_DIM = 3 * 2 + 64  # per-channel mean/std + 8x8 gray downsample

FEATURIZE_SCHEMA = "image_id STRING, feature ARRAY<FLOAT>, w INT, h INT"
RESIZE_SCHEMA = "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING"
FRAME_SCHEMA = "video_id STRING, frame_idx INT, feature ARRAY<FLOAT>"
PYRAMID_SCHEMA = (
    "image_id STRING, level INT, w INT, h INT, bytes BINARY, mean_px DOUBLE"
)


def _featurize(px: np.ndarray) -> np.ndarray:
    gray = px.astype(np.float32) @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    h, w = gray.shape
    yi = (np.arange(8) * h // 8).clip(0, h - 1)
    xi = (np.arange(8) * w // 8).clip(0, w - 1)
    down = gray[np.ix_(yi, xi)].flatten() / 255.0
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    stds = px.reshape(-1, 3).std(axis=0) / 255.0
    return np.concatenate([means, stds, down]).astype(np.float32)


def decode_and_featurize(images: DataFrame) -> DataFrame:
    """binary payload -> FEATURE_DIM float vector, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, ids, ws, hs = [], [], [], []
            # column zip, not iterrows(): per-row Series construction is
            # ~5-10x the loop overhead and the codec work is per-row anyway
            for iid, payload, fmt, w, h in zip(
                b["image_id"], b["bytes"], b["fmt"], b["w"], b["h"]
            ):
                px = decode_image(payload, fmt, int(w), int(h))
                feats.append(_featurize(px).tolist())
                ids.append(iid)
                ws.append(int(w))
                hs.append(int(h))
            yield pd.DataFrame({"image_id": ids, "feature": feats, "w": ws, "h": hs})

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, FEATURIZE_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw/zlib RGB payloads (numpy indexing);
    output is always fmt='raw' at (out_w, out_h)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for iid, payload, fmt, w, h in zip(
                b["image_id"], b["bytes"], b["fmt"], b["w"], b["h"]
            ):
                px = decode_image(payload, fmt, int(w), int(h))
                yi = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xi = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                small = px[np.ix_(yi, xi)]
                out["image_id"].append(iid)
                out["bytes"].append(small.tobytes())
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("raw")
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, RESIZE_SCHEMA
    )


def halve_box(px: np.ndarray) -> np.ndarray:
    """One anti-aliased pyramid step: 2x2 box mean over disjoint blocks
    (float64; crops a trailing odd row/col so blocks tile exactly —
    cropping keeps the level mean identical to the mean of the covered
    region, unlike replicate-padding which biases edges)."""
    h, w = px.shape[0] & ~1, px.shape[1] & ~1
    c = px[:h, :w].astype(np.float64)
    return (
        c.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        if c.ndim == 3
        else c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    )


def image_pyramid(images: DataFrame, levels: int = 3) -> DataFrame:
    """Thumbnail pyramid: per image emit `levels` extra rows, level L
    halved L times by 2x2 box mean (anti-aliased, unlike resize_images'
    nearest-neighbor) and re-quantized to raw uint8. Level 0 re-emits
    the decoded original.

    mapInPandas keeps this a single narrow pass: one Arrow batch in,
    (levels+1) rows per image out, no shuffle — at 10^12 images the
    pyramid cost is pure map-side CPU and the output partitioning is
    inherited. Stops early when a dimension reaches 1. mean_px is the
    stored (quantized) level's float mean — the pyramid invariant
    |mean_L - mean_0| <= ~0.5*L (quantization only) is assertion
    material for the driver query and pytest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"image_id": [], "level": [], "w": [], "h": [], "bytes": [], "mean_px": []}
            for iid, payload, fmt, w, h in zip(
                b["image_id"], b["bytes"], b["fmt"], b["w"], b["h"]
            ):
                px = decode_image(payload, fmt, int(w), int(h))
                cur = px
                for lvl in range(levels + 1):
                    q = np.clip(np.rint(cur), 0, 255).astype(np.uint8)
                    out["image_id"].append(iid)
                    out["level"].append(lvl)
                    out["w"].append(int(q.shape[1]))
                    out["h"].append(int(q.shape[0]))
                    out["bytes"].append(q.tobytes())
                    out["mean_px"].append(float(q.mean()))
                    if min(q.shape[0], q.shape[1]) < 2 or lvl == levels:
                        break
                    cur = halve_box(q)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        run, PYRAMID_SCHEMA
    )


def decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    """Audio seam: 'pcm16' decodes for real (int16 mono), everything else
    stubs until a codec library exists."""
    if fmt == "pcm16":
        return np.frombuffer(payload, dtype=np.int16)
    if fmt == "pcm16z":
        return np.frombuffer(zlib.decompress(payload), dtype=np.int16)
    raise NotImplementedError(
        f"audio codec {fmt!r} unavailable in-sandbox; plumbing supports it"
    )


def sample_frames(videos: DataFrame, every_k: int = 4) -> DataFrame:
    """'Video' = concatenated raw RGB frames (n_frames x w x h x 3). Sample
    every k-th frame and featurize — the batch shape of keyframe
    extraction. Real containers (mp4) stub at the decode seam."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, feats = [], [], []
            for vid, payload, fmt, w, h, nf in zip(
                b["video_id"], b["bytes"], b["fmt"], b["w"], b["h"], b["n_frames"]
            ):
                if fmt != "rawcat":
                    raise NotImplementedError(
                        f"video container {fmt!r} unavailable in-sandbox"
                    )
                w, h, nf = int(w), int(h), int(nf)
                arr = np.frombuffer(payload, dtype=np.uint8).reshape(nf, h, w, 3)
                for fi in range(0, nf, every_k):
                    ids.append(vid)
                    idxs.append(fi)
                    feats.append(_featurize(arr[fi]).tolist())
            yield pd.DataFrame({"video_id": ids, "frame_idx": idxs, "feature": feats})

    return videos.mapInPandas(run, FRAME_SCHEMA)

"""Deterministic synthetic image+caption table (FIXTURES.md schema).

Schema (BASELINE input_hint): image_id string, bytes binary, w int, h int,
fmt string, caption string, phash bigint, plus lon/lat double.

Generation is seeded PER ROW with numpy PCG64(seed + row_id) inside an
Arrow-vectorized mapInPandas, so the table is bit-identical across runs,
partitionings and parallelism levels — a requirement for the two-cluster-
size scaling evidence (same input at local[8] and local[32]).

Skew by construction: 80% of points cluster around 20 "city" centers so
dense tiles exercise the salting/AQE paths; 20% are uniform.

Images are raw RGB (fmt='raw'), zlib-compressed (fmt='zlib'), real PNG
(fmt='png', mixed scanline filters — functions/png.py) or real baseline
JPEG (fmt='jpeg', quality 98 4:4:4 — functions/jpeg.py); all codecs are
stdlib+numpy only (see functions/image.py). For the lossy jpeg rows the
stored phash is computed from the DECODED payload so phash recomputation
is exact; the decoded-vs-source PSNR >= 40 dB input_hint gate is checked
against pixels regenerated via _gen_pixels.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGES_SCHEMA = (
    "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, "
    "caption STRING, phash BIGINT, lon DOUBLE, lat DOUBLE"
)

# 20 deterministic city-like cluster centers (lon, lat)
CITY_CENTERS = [
    (-74.006, 40.713), (-0.128, 51.507), (139.692, 35.690), (2.352, 48.857),
    (116.407, 39.904), (77.209, 28.614), (-46.633, -23.551), (151.209, -33.868),
    (37.618, 55.756), (31.236, 30.044), (-99.133, 19.433), (103.820, 1.352),
    (-118.244, 34.052), (28.979, 41.008), (72.878, 19.076), (126.978, 37.567),
    (-58.382, -34.603), (18.424, -33.925), (-87.630, 41.878), (8.541, 47.377),
]

_ADJ = ["sunny", "blurred", "vivid", "grainy", "aerial", "cropped", "night", "wide"]
_NOUN = ["plaza", "rooftop", "harbor", "market", "bridge", "stadium", "park", "station"]

MERC_LAT_LIMIT = 85.05112877980659


JPEG_QUALITY = 98  # keeps decoded-vs-source PSNR >= ~43 dB on the noisy
#                    fixture (gate is 40); measured floor 43.35 dB over
#                    300 seeded rows


def _gen_pixels(rng: np.random.Generator, min_px: int, max_px: int) -> np.ndarray:
    """The per-row source pixels (gradient + noise), extracted so tests
    and the PSNR-vs-source gate can REGENERATE the original image for a
    lossy (jpeg) payload — the original is not stored anywhere. Must
    consume the RNG stream exactly as generation does."""
    w = int(rng.integers(min_px, max_px + 1))
    h = int(rng.integers(min_px, max_px + 1))
    gx = np.linspace(0, 255, w, dtype=np.float32)
    gy = np.linspace(0, 255, h, dtype=np.float32)
    base = (gy[:, None] + gx[None, :]) * 0.5
    noise = rng.integers(0, 64, (h, w, 3)).astype(np.float32)
    return np.clip(base[:, :, None] + noise, 0, 255).astype(np.uint8)


def _gen_rows(row_ids: np.ndarray, seed: int, min_px: int, max_px: int) -> pd.DataFrame:
    n = len(row_ids)
    out: dict[str, list] = {k: [None] * n for k in (
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "lon", "lat"
    )}
    for i, rid in enumerate(row_ids):
        rng = np.random.Generator(np.random.PCG64(seed + int(rid)))
        px = _gen_pixels(rng, min_px, max_px)
        h, w = px.shape[:2]
        raw = px.tobytes()
        fmt_draw = rng.random()  # one draw, same stream position as before
        px_stored = px
        if fmt_draw < 0.25:
            fmt, payload = "raw", raw
        elif fmt_draw < 0.5:
            fmt, payload = "zlib", zlib.compress(raw, level=1)
        elif fmt_draw < 0.75:
            from ..functions.png import encode_png

            fmt, payload = "png", encode_png(px, level=1, filter_strategy="mixed")
        else:
            from ..functions.jpeg import decode_jpeg, encode_jpeg

            fmt, payload = "jpeg", encode_jpeg(px, quality=JPEG_QUALITY)
            # LOSSY: the stored phash fingerprints what a consumer can
            # actually reconstruct (the decoded payload), so the
            # phash_match invariant stays EXACT for every format; the
            # 40 dB decoded-vs-source gate is checked separately against
            # _gen_pixels (tests + q_decode_psnr's psnr_vs_source)
            px_stored = decode_jpeg(payload)
        # position: 80% clustered, 20% uniform
        if rng.random() < 0.8:
            cx, cy = CITY_CENTERS[int(rng.integers(0, len(CITY_CENTERS)))]
            lon = float(np.clip(cx + rng.normal(0, 0.8), -179.999, 179.999))
            lat = float(np.clip(cy + rng.normal(0, 0.6), -MERC_LAT_LIMIT + 1e-6, MERC_LAT_LIMIT - 1e-6))
        else:
            lon = float(rng.uniform(-180.0, 180.0))
            lat = float(rng.uniform(-MERC_LAT_LIMIT, MERC_LAT_LIMIT))
        adj = _ADJ[int(rng.integers(0, len(_ADJ)))]
        noun = _NOUN[int(rng.integers(0, len(_NOUN)))]
        caption = f"a {adj} photo of {noun} near ({lat:.3f},{lon:.3f})"
        out["image_id"][i] = f"img-{int(rid):012d}"
        out["bytes"][i] = payload
        out["w"][i] = w
        out["h"][i] = h
        out["fmt"][i] = fmt
        out["caption"][i] = caption
        out["phash"][i] = int(phash64(px_stored))
        out["lon"][i] = lon
        out["lat"][i] = lat
    return pd.DataFrame(out)


def phash64(px: np.ndarray) -> np.int64:
    """64-bit perceptual hash: 2D-DCT of the 32x32 grayscale, top-left 8x8
    block (minus DC), median threshold. Pure numpy (no scipy/PIL)."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    # resize to 32x32 by block-mean via index sampling (deterministic)
    h, w = gray.shape
    yi = (np.arange(32) * h // 32).clip(0, h - 1)
    xi = (np.arange(32) * w // 32).clip(0, w - 1)
    g = gray[np.ix_(yi, xi)]
    d = _dct2(g)
    block = d[:8, :8].flatten()[1:]  # drop DC
    bits = (block > np.median(block)).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return val.astype(np.int64)


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def _dct2(g: np.ndarray) -> np.ndarray:
    return _DCT32 @ g @ _DCT32.T


def generate_images(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    min_px: int = 16,
    max_px: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_rows(b["id"].to_numpy(), seed, min_px, max_px)

    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(gen, IMAGES_SCHEMA)


PNG_IMAGES_SCHEMA = "image_id BIGINT, bytes BINARY, fmt STRING, w INT, h INT"


def synth_png_images(
    spark: SparkSession, n_images: int, filter_strategy: str = "mixed"
) -> DataFrame:
    """Deterministic REAL-PNG image table whose decoded pixels are
    CLOSED-FORM in the key — the image twin of synth_wav_clips, making
    codec outputs SQL-checkable: flat RGB byte j (row-major, j =
    (y*w + x)*3 + c) of image `id` is

        px[j] = (id*7 + j*13) % 256

    with w = 16 + (id%5)*4, h = 12 + (id%3)*4 (all dims divisible by 4,
    so two 2x2 pyramid halvings never crop). Payloads go through the
    real PNG writer (functions/png.encode_png) with the row-cycling
    filter strategy, so every unfilter path (None/Sub/Up/Average/Paeth)
    sits between the oracle's closed form and the decoded stats — any
    filter/CRC/interleave bug breaks the value hash. Integer arithmetic
    only; no RNG, partition-invariant."""
    from tile_grid_spark.functions.png import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"image_id": [], "bytes": [], "fmt": [], "w": [], "h": []}
            for iid in b["id"]:
                iid = int(iid)
                w = 16 + (iid % 5) * 4
                h = 12 + (iid % 3) * 4
                j = np.arange(w * h * 3, dtype=np.int64)
                px = ((iid * 7 + j * 13) % 256).astype(np.uint8).reshape(h, w, 3)
                rows["image_id"].append(iid)
                rows["bytes"].append(encode_png(px, filter_strategy=filter_strategy))
                rows["fmt"].append("png")
                rows["w"].append(w)
                rows["h"].append(h)
            yield pd.DataFrame(rows)

    return spark.range(0, n_images).mapInPandas(gen, PNG_IMAGES_SCHEMA)


WAV_CLIPS_SCHEMA = "clip_id BIGINT, bytes BINARY, fmt STRING"


def synth_wav_clips(spark: SparkSession, n_clips: int) -> DataFrame:
    """Deterministic REAL-WAV clip table (the audio face of the
    multimodal surface): integer sawtooth samples — closed form
    x[i] = ((i*freq + clip_id) mod 2*amp) - amp — encoded through the
    real RIFF writer (functions/audio.encode_wav). Integer arithmetic
    only, so a SQL oracle can re-derive every sample exactly (no libm
    sine whose last-ulp could flip an int16 quantization). Odd clip ids
    are stereo (channel 2 = -x) to exercise interleaving.

    Params per clip (all closed-form in clip_id):
      n = 2000 + (id%5)*500; freq = 3 + id%7; amp = 500 + 100*(id%4);
      channels = 1 + id%2; rate = 8000 + 1000*(id%3)
    """
    from tile_grid_spark.functions.audio import encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"clip_id": [], "bytes": [], "fmt": []}
            for cid in b["id"]:
                cid = int(cid)
                ns = 2000 + (cid % 5) * 500
                freq = 3 + cid % 7
                amp = 500 + 100 * (cid % 4)
                ch = 1 + cid % 2
                rate = 8000 + 1000 * (cid % 3)
                i = np.arange(ns, dtype=np.int64)
                x = (i * freq + cid) % (2 * amp) - amp
                s = x.astype(np.int16)
                if ch == 2:
                    s = np.stack([s, (-x).astype(np.int16)], axis=1)
                rows["clip_id"].append(cid)
                rows["bytes"].append(encode_wav(s, rate))
                rows["fmt"].append("wav")
            yield pd.DataFrame(rows)

    return spark.range(0, n_clips).mapInPandas(gen, WAV_CLIPS_SCHEMA)

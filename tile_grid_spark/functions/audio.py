"""Real WAV (RIFF) audio codec + batch feature extraction.

The reference library is pure tile math (/root/reference/src/tms.rs);
audio is part of the prompt-mandated multimodal surface (SURVEY.md
§2.D.6): payloads ride an opaque binary column with typed metadata, and
decode/featurize runs as Arrow-batched mapInPandas — never per-row
Python UDFs.

Codec scope (same philosophy as functions/png.py / jpeg.py — REAL
stdlib+numpy implementations of the canonical baseline, honest
NotImplementedError seams beyond):

- RIFF/WAVE container: chunk walk (fmt /data + unknown chunks skipped,
  odd-size pad bytes honored per the RIFF spec), PCM (format tag 1)
  8/16-bit, mono or interleaved multichannel.
- IEEE-float WAV, ADPCM, extensible-format WAV (tag 0xFFFE), mp3/ogg:
  raise NotImplementedError with the tag in the message.

Features are integer-dominant (n_samples, peak, zero crossings,
sum(|x|)) so the DuckDB oracle can value-hash them exactly; only rms is
floating and it is rounded.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = (
    "clip_id BIGINT, sample_rate INT, n_channels INT, n_samples INT, "
    "duration_ms BIGINT, peak INT, n_zero_cross INT, sum_abs BIGINT, rms DOUBLE"
)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal canonical PCM WAV writer (44-byte header + data).

    `samples` is int16, shape (n,) mono or (n, channels) interleaved on
    write. Used by datagen/tests; the decoder below must round-trip it
    bit-exactly.
    """
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()
    byte_rate = sample_rate * ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (samples int16 [n, channels], sample_rate).

    8-bit PCM (unsigned) is widened to int16 (x-128 << 8); 16-bit is
    returned as stored. Non-PCM format tags raise NotImplementedError
    (the honest codec seam); structural problems raise ValueError.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        # unknown chunks (LIST, fact, cue ...) are skipped; odd-sized
        # chunks carry one pad byte per the RIFF spec
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    tag, ch, rate, _byte_rate, _block, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"WAV format tag {tag:#x} unavailable in-sandbox (PCM only); "
            "plumbing supports it"
        )
    if ch < 1:
        raise ValueError("bad channel count")
    if bits == 16:
        s = np.frombuffer(data[: len(data) - (len(data) % (2 * ch))], dtype="<i2")
        s = s.astype(np.int16)
    elif bits == 8:
        u = np.frombuffer(data[: len(data) - (len(data) % ch)], dtype=np.uint8)
        s = ((u.astype(np.int16) - 128) << 8).astype(np.int16)
    else:
        raise NotImplementedError(f"PCM bit depth {bits} unavailable in-sandbox")
    return s.reshape(-1, ch), rate


def decode_audio_samples(payload: bytes, fmt: str) -> tuple[np.ndarray, int | None]:
    """Dispatch: 'wav' (real RIFF parse), 'pcm16' / 'pcm16z' raw streams
    (rate unknown -> None); everything else raises at the seam."""
    import zlib

    if fmt == "wav":
        return decode_wav(payload)
    if fmt == "pcm16":
        return np.frombuffer(payload, dtype="<i2").reshape(-1, 1), None
    if fmt == "pcm16z":
        return (
            np.frombuffer(zlib.decompress(payload), dtype="<i2").reshape(-1, 1),
            None,
        )
    raise NotImplementedError(
        f"audio codec {fmt!r} unavailable in-sandbox; plumbing supports it"
    )


AUDIO_FRAMES_SCHEMA = (
    "clip_id BIGINT, frame_idx INT, start_i INT, peak INT, "
    "n_zero_cross INT, sum_abs BIGINT, rms DOUBLE"
)


def audio_frame_features(
    clips: DataFrame, frame: int = 512, hop: int = 256
) -> DataFrame:
    """(clip_id, bytes, fmt) -> per-FRAME features: standard STFT-style
    framing (frame f covers samples [f*hop, f*hop+frame); trailing
    partial frames dropped), features mirror audio_features but within
    the frame — peak, strict nonzero sign flips, sum|x|, exact-sum rms
    rounded to 4.

    Framing happens INSIDE the decode mapper (rows fan out python-side,
    one task per input partition): like audio_features this is a
    zero-shuffle mapper — at 100 TB the payload bytes never cross the
    network, only ~frame-count feature rows do. The per-frame energy/zc
    profile is the input to VAD-style clip filtering and silence
    trimming in a training-data pipeline.
    """
    if frame <= 0 or hop <= 0:
        raise ValueError("audio_frame_features: frame and hop must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cols: dict = {k: [] for k in (
                "clip_id", "frame_idx", "start_i", "peak",
                "n_zero_cross", "sum_abs", "rms",
            )}
            for cid, payload, fmt in zip(b["clip_id"], b["bytes"], b["fmt"]):
                s, _rate = decode_audio_samples(bytes(payload), str(fmt))
                x = s[:, 0].astype(np.int64)
                n = int(x.size)
                nf = 0 if n < frame else 1 + (n - frame) // hop
                for f in range(nf):
                    w = x[f * hop : f * hop + frame]
                    nz = w[w != 0]
                    flips = int(
                        np.count_nonzero(np.signbit(nz[1:]) != np.signbit(nz[:-1]))
                    )
                    ss = int((w * w).sum())
                    cols["clip_id"].append(int(cid))
                    cols["frame_idx"].append(f)
                    cols["start_i"].append(f * hop)
                    cols["peak"].append(int(np.abs(w).max()))
                    cols["n_zero_cross"].append(flips)
                    cols["sum_abs"].append(int(np.abs(w).sum()))
                    cols["rms"].append(round(float(np.sqrt(ss / frame)), 4))
            yield pd.DataFrame(cols)

    return clips.select("clip_id", "bytes", "fmt").mapInPandas(
        run, AUDIO_FRAMES_SCHEMA
    )


def audio_features(clips: DataFrame) -> DataFrame:
    """(clip_id, bytes, fmt) -> per-clip integer-exact features, decoded
    with the real codec, Arrow-batched (one python task per input
    partition — the 100-TB shape is 'decode where the bytes already
    are', no shuffle).

    Features (first channel): peak = max |x|, n_zero_cross = count of
    strict sign flips between consecutive nonzero samples, sum_abs,
    rms = sqrt(mean(x^2)) rounded to 4 (the only float column).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in (
                "clip_id", "sample_rate", "n_channels", "n_samples",
                "duration_ms", "peak", "n_zero_cross", "sum_abs", "rms",
            )}
            for cid, payload, fmt in zip(b["clip_id"], b["bytes"], b["fmt"]):
                s, rate = decode_audio_samples(bytes(payload), str(fmt))
                x = s[:, 0].astype(np.int64)
                nz = x[x != 0]
                flips = int(np.count_nonzero(np.signbit(nz[1:]) != np.signbit(nz[:-1])))
                n = int(x.size)
                out["clip_id"].append(int(cid))
                out["sample_rate"].append(int(rate or 0))
                out["n_channels"].append(int(s.shape[1]))
                out["n_samples"].append(n)
                out["duration_ms"].append(int(n * 1000 // rate) if rate else 0)
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                out["n_zero_cross"].append(flips)
                out["sum_abs"].append(int(np.abs(x).sum()))
                out["rms"].append(
                    round(float(np.sqrt(np.mean((x * x).astype(np.float64)))), 4)
                    if n
                    else 0.0
                )
            yield pd.DataFrame(out)

    return clips.select("clip_id", "bytes", "fmt").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )

"""Real WAV/RIFF codec + audio_features operator.

Pure-python/numpy oracles for the codec (struct-built streams, not the
encoder, so encoder and decoder cannot share a bug), Spark round-trip
for the operator against a from-scratch feature recompute.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tile_grid_spark.functions.audio import (
    decode_audio_samples,
    decode_wav,
    encode_wav,
)


class TestWavCodec:
    def test_roundtrip_mono(self):
        s = (np.arange(1000) % 700 - 350).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        assert out.shape == (1000, 1)
        assert np.array_equal(out[:, 0], s)

    def test_roundtrip_stereo_interleave(self):
        l = (np.arange(500) % 300 - 150).astype(np.int16)
        r = (-l).astype(np.int16)
        out, rate = decode_wav(encode_wav(np.stack([l, r], axis=1), 44100))
        assert rate == 44100
        assert out.shape == (500, 2)
        assert np.array_equal(out[:, 0], l)
        assert np.array_equal(out[:, 1], r)

    def test_header_bytes_golden(self):
        # canonical 44-byte header, little-endian fields
        b = encode_wav(np.zeros(2, dtype=np.int16), 8000)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        assert b[12:16] == b"fmt " and struct.unpack_from("<I", b, 16)[0] == 16
        tag, ch, rate, byte_rate, block, bits = struct.unpack_from("<HHIIHH", b, 20)
        assert (tag, ch, rate, byte_rate, block, bits) == (1, 1, 8000, 16000, 2, 16)
        assert b[36:40] == b"data" and struct.unpack_from("<I", b, 40)[0] == 4
        assert len(b) == 48

    def test_foreign_stream_with_extra_chunks(self):
        # hand-built stream the encoder never produces: LIST chunk before
        # fmt, an ODD-sized junk chunk (pad byte per RIFF spec), fact
        # chunk after fmt — the chunk walk must skip them all
        samples = np.array([100, -100, 32767, -32768], dtype="<i2").tobytes()
        chunks = (
            b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd + pad
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 9000, 18000, 2, 16)
            + b"fact" + struct.pack("<II", 4, 4)
            + b"data" + struct.pack("<I", len(samples)) + samples
        )
        stream = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        out, rate = decode_wav(stream)
        assert rate == 9000
        assert out[:, 0].tolist() == [100, -100, 32767, -32768]

    def test_8bit_pcm_widens(self):
        data = bytes([0, 128, 255])
        stream = (
            b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data) + 1) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
        )
        out, _ = decode_wav(stream)
        assert out[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]

    def test_non_pcm_raises_not_implemented(self):
        stream = (
            b"RIFF" + struct.pack("<I", 4 + 24 + 8) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError, match="0x3"):
            decode_wav(stream)

    def test_garbage_raises_value_error(self):
        with pytest.raises(ValueError):
            decode_wav(b"OggS\x00\x00\x00\x00nope")
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data

    def test_dispatch_seam(self):
        s = np.array([1, -2, 3], dtype="<i2")
        out, rate = decode_audio_samples(s.tobytes(), "pcm16")
        assert rate is None and out[:, 0].tolist() == [1, -2, 3]
        with pytest.raises(NotImplementedError, match="mp3"):
            decode_audio_samples(b"\xff\xfb\x90", "mp3")


class TestAudioFeatures:
    def test_features_match_python_recompute(self, spark):
        from tile_grid_spark.functions.audio import audio_features
        from tile_grid_spark.sources.datagen import synth_wav_clips

        got = {r.clip_id: r for r in audio_features(synth_wav_clips(spark, 12)).collect()}
        assert len(got) == 12
        for cid in range(12):
            ns = 2000 + (cid % 5) * 500
            freq = 3 + cid % 7
            amp = 500 + 100 * (cid % 4)
            i = np.arange(ns, dtype=np.int64)
            x = (i * freq + cid) % (2 * amp) - amp
            nz = x[x != 0]
            flips = int(np.count_nonzero((nz[1:] < 0) != (nz[:-1] < 0)))
            r = got[cid]
            assert r.n_samples == ns
            assert r.n_channels == 1 + cid % 2
            assert r.sample_rate == 8000 + 1000 * (cid % 3)
            assert r.peak == int(np.abs(x).max())
            assert r.n_zero_cross == flips
            assert r.sum_abs == int(np.abs(x).sum())
            assert r.rms == round(float(np.sqrt(np.mean((x * x).astype(np.float64)))), 4)

    def test_zero_shuffle_plan(self, spark):
        from tile_grid_spark.functions.audio import audio_features
        from tile_grid_spark.sources.datagen import synth_wav_clips

        plan = (
            audio_features(synth_wav_clips(spark, 2))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestAudioFrames:
    def test_frames_match_python_recompute(self, spark):
        from tile_grid_spark.functions.audio import audio_frame_features, encode_wav
        from tile_grid_spark.sources.datagen import synth_wav_clips

        frame, hop = 512, 256
        got = {}
        for r in audio_frame_features(
            synth_wav_clips(spark, 6), frame=frame, hop=hop
        ).collect():
            got[(r.clip_id, r.frame_idx)] = r
        n_rows = 0
        for cid in range(6):
            ns = 2000 + (cid % 5) * 500
            freq = 3 + cid % 7
            amp = 500 + 100 * (cid % 4)
            i = np.arange(ns, dtype=np.int64)
            x = (i * freq + cid) % (2 * amp) - amp
            nf = 1 + (ns - frame) // hop
            for f in range(nf):
                w = x[f * hop : f * hop + frame]
                nz = w[w != 0]
                flips = int(np.count_nonzero(np.signbit(nz[1:]) != np.signbit(nz[:-1])))
                r = got[(cid, f)]
                n_rows += 1
                assert r.start_i == f * hop
                assert r.peak == int(np.abs(w).max())
                assert r.n_zero_cross == flips
                assert r.sum_abs == int(np.abs(w).sum())
                assert r.rms == round(float(np.sqrt(int((w * w).sum()) / frame)), 4)
        assert n_rows == len(got)

    def test_short_clip_yields_no_frames(self, spark):
        from tile_grid_spark.functions.audio import audio_frame_features, encode_wav

        s = np.arange(100, dtype=np.int16)
        df = spark.createDataFrame(
            [(0, bytearray(encode_wav(s, 8000)), "wav")],
            "clip_id BIGINT, bytes BINARY, fmt STRING",
        )
        assert audio_frame_features(df, frame=512, hop=256).count() == 0
        # exactly one full frame when n == frame
        s2 = np.arange(512, dtype=np.int16)
        df2 = spark.createDataFrame(
            [(1, bytearray(encode_wav(s2, 8000)), "wav")],
            "clip_id BIGINT, bytes BINARY, fmt STRING",
        )
        assert audio_frame_features(df2, frame=512, hop=256).count() == 1

    def test_bad_params_raise(self, spark):
        from tile_grid_spark.functions.audio import audio_frame_features
        from tile_grid_spark.sources.datagen import synth_wav_clips

        with pytest.raises(ValueError, match="positive"):
            audio_frame_features(synth_wav_clips(spark, 1), frame=0)

    def test_zero_shuffle_plan(self, spark):
        from tile_grid_spark.functions.audio import audio_frame_features
        from tile_grid_spark.sources.datagen import synth_wav_clips

        plan = (
            audio_frame_features(synth_wav_clips(spark, 2))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

"""Synthetic images table, payload invariants, rasterization round-trips."""

import json
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.functions.image import decode_image, psnr, with_payload_checks
from tile_grid_spark.operators.raster import (
    decode_mask,
    mosaic_to_parent,
    rasterize_points,
    vectorize_tiles,
)
from tile_grid_spark.sources.datagen import generate_images


@pytest.fixture(scope="module")
def wm():
    return tms().lookup("WebMercatorQuad")


@pytest.fixture(scope="module")
def images(spark):
    return generate_images(spark, 400, seed=42).cache()


class TestDatagen:
    def test_schema_and_determinism(self, spark, images):
        rows = images.orderBy("image_id").limit(5).collect()
        again = (
            generate_images(spark, 400, seed=42, partitions=7)
            .orderBy("image_id")
            .limit(5)
            .collect()
        )
        # identical across different partitioning (per-row seeding)
        for a, b in zip(rows, again):
            assert a.image_id == b.image_id
            assert bytes(a.bytes) == bytes(b.bytes)
            assert a.caption == b.caption and a.phash == b.phash
            assert (a.lon, a.lat) == (b.lon, b.lat)

    def test_payload_invariants(self, images):
        checked = with_payload_checks(images)
        agg = checked.agg(
            F.count("*").alias("n"),
            F.sum(F.col("phash_match").cast("int")).alias("match"),
            F.min("psnr_db").alias("min_psnr"),
        ).collect()[0]
        assert agg.n == 400
        assert agg.match == 400  # stored phash == recomputed phash
        assert agg.min_psnr >= 40.0  # lossless: 999 sentinel

    def test_decode_matches_metadata(self, images):
        r = images.limit(3).collect()
        for row in r:
            px = decode_image(bytes(row.bytes), row.fmt, row.w, row.h)
            assert px.shape == (row.h, row.w, 3)

    def test_unknown_codec_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"xx", "jpeg", 2, 2)

    def test_psnr(self):
        a = np.zeros((4, 4, 3), dtype=np.uint8)
        assert psnr(a, a) == float("inf")
        b = a.copy()
        b[0, 0, 0] = 255
        assert 10 < psnr(a, b) < 40


class TestPng:
    """functions/png.py: real stdlib PNG codec (round 3, VERDICT item 2)."""

    def test_roundtrip_mixed_filters(self):
        from tile_grid_spark.functions.png import decode_png, encode_png

        rng = np.random.default_rng(9)
        # >= 5 rows so every filter type 0..4 is exercised; odd sizes and
        # degenerate 1-px widths stress the left-neighbor boundaries
        for h, w in [(8, 8), (5, 1), (1, 7), (1, 1), (13, 31), (64, 48)]:
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            data = encode_png(px, filter_strategy="mixed")
            back = decode_png(data)
            assert np.array_equal(back, px), (h, w)
            # none-strategy too
            assert np.array_equal(decode_png(encode_png(px, filter_strategy="none")), px)

    def test_decoder_vs_handbuilt_png(self):
        # independent of encode_png: construct the container by hand
        # (filter 0 scanlines) straight from the spec
        import struct

        from tile_grid_spark.functions.png import decode_png

        px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(2))

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), px)

    def test_unfilter_vs_slow_reference(self):
        # slow byte-at-a-time unfilter straight from PNG spec §9 vs the
        # vectorized decoder, over random payloads with every filter type
        from tile_grid_spark.functions.png import decode_png, encode_png

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        def slow_decode(data, w, h):
            import struct

            pos = 8
            idat = b""
            while pos + 8 <= len(data):
                (ln,) = struct.unpack(">I", data[pos : pos + 4])
                tag = data[pos + 4 : pos + 8]
                if tag == b"IDAT":
                    idat += data[pos + 8 : pos + 8 + ln]
                pos += 12 + ln
            raw = zlib.decompress(idat)
            stride = w * 3
            out = bytearray(h * stride)
            for y in range(h):
                ft = raw[y * (stride + 1)]
                line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
                for x in range(stride):
                    a = out[y * stride + x - 3] if x >= 3 else 0
                    b = out[(y - 1) * stride + x] if y > 0 else 0
                    c = out[(y - 1) * stride + x - 3] if (y > 0 and x >= 3) else 0
                    fx = line[x]
                    if ft == 0:
                        v = fx
                    elif ft == 1:
                        v = fx + a
                    elif ft == 2:
                        v = fx + b
                    elif ft == 3:
                        v = fx + ((a + b) >> 1)
                    else:
                        v = fx + paeth(a, b, c)
                    out[y * stride + x] = v & 0xFF
            return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)

        rng = np.random.default_rng(17)
        for h, w in [(7, 5), (6, 1), (10, 12)]:
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            data = encode_png(px, filter_strategy="mixed")
            assert np.array_equal(decode_png(data), slow_decode(data, w, h))
            assert np.array_equal(decode_png(data), px)

    def test_corrupt_and_unsupported(self):
        import struct

        from tile_grid_spark.functions.png import decode_png, encode_png

        px = np.zeros((4, 4, 3), dtype=np.uint8)
        data = bytearray(encode_png(px))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"notapng" + bytes(data))
        data[30] ^= 0xFF  # flip a byte inside a chunk body
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        rgba = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        )
        with pytest.raises(NotImplementedError, match="color_type"):
            decode_png(rgba)

    def test_png_rows_flow_through_pipeline(self, images):
        # datagen now emits fmt='png' ~1/3 of rows; decode + phash + PSNR
        # invariants must hold on them specifically
        png_rows = images.filter(F.col("fmt") == "png")
        n = png_rows.count()
        assert n > 80, n
        checked = with_payload_checks(png_rows)
        agg = checked.agg(
            F.sum(F.col("phash_match").cast("int")).alias("match"),
            F.min("psnr_db").alias("min_psnr"),
        ).collect()[0]
        assert agg.match == n
        assert agg.min_psnr == 999.0  # PNG is lossless

    def test_decode_psnr_query_gates(self, spark):
        import __spark_entry__ as entry

        rows = entry.q_decode_psnr(spark, "/root/testdata/sf0.001").collect()
        fmts = {r.fmt for r in rows}
        assert fmts == {"raw", "zlib", "png"}
        for r in rows:
            assert r.n_phash_match == r.n_rows, r
            assert r.min_psnr_lossless == 999.0, r
            assert r.min_psnr_lossy >= 40.0, r


class TestRaster:
    def test_rasterize_counts(self, spark, wm, images):
        z = 4
        r = rasterize_points(images, wm, z).cache()
        total = r.agg(F.sum("n_points")).collect()[0][0]
        assert total == 400  # every point lands in exactly one tile
        row = r.orderBy(F.desc("n_points")).first()
        mask = decode_mask(bytes(row.mask))
        assert mask.shape == (256, 256)
        assert mask.sum() >= min(row.n_points, 255)  # counts painted
        assert row.max_count >= 1

    def test_mosaic_rollup(self, spark, wm, images):
        z = 4
        r = rasterize_points(images, wm, z)
        parent = mosaic_to_parent(r)
        tp = parent.agg(F.sum("n_points")).collect()[0][0]
        assert tp == 400
        pz = parent.select("zoom").distinct().collect()
        assert [x.zoom for x in pz] == [z - 1]

    def test_vectorize_feature(self, spark, wm):
        df = spark.createDataFrame([(10, 486, 332)], "zoom INT, tile_x BIGINT, tile_y BIGINT")
        feat = json.loads(vectorize_tiles(df).collect()[0].feature)
        assert feat["type"] == "Feature"
        assert feat["id"] == "10/486/332"
        ring = feat["geometry"]["coordinates"][0]
        assert len(ring) == 5 and ring[0] == ring[4]
        # golden corner: ul(486,332,10) = (-9.140625, 53.33087298301705)
        assert abs(ring[0][0] - (-9.140625)) < 1e-9
        assert abs(ring[1][1] - 53.33087298301705) < 1e-7

    def test_pixel_placement_golden(self, spark, wm):
        # a point at the exact center of tile (486,332,10) paints the
        # center pixel
        from tile_grid_spark.core import Xyz

        b = wm.xy_bounds(Xyz(486, 332, 10))
        from tile_grid_spark.core.transform import merc_to_lonlat

        cx, cy = (b.left + b.right) / 2, (b.top + b.bottom) / 2
        lon, lat = merc_to_lonlat(cx, cy)
        df = spark.createDataFrame([(float(lon), float(lat))], "lon DOUBLE, lat DOUBLE")
        r = rasterize_points(df, wm, 10).collect()[0]
        assert (r.tile_x, r.tile_y) == (486, 332)
        mask = decode_mask(bytes(r.mask))
        # the lon/lat round-trip perturbs the exact center by ~1e-10 m, so
        # the point may land on either side of the pixel boundary: accept
        # any of the four center pixels
        assert mask[127:129, 127:129].sum() == 1
        assert mask.sum() == 1

"""Bit-exact DataFrame assertions of reference goldens via the Arrow path.

The Column path asserts to round-to-7 (JVM libm); these UDFs must hit the
reference f64 values EXACTLY (== comparisons, no tolerance)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.functions.grid_udfs import (
    cover_limits_udf,
    quadkey_udf,
    tile_udf,
    xy_bounds_udf,
    xy_tile_udf,
)


@pytest.fixture(scope="module")
def wm():
    return tms().lookup("WebMercatorQuad")


class TestBitExactGoldens:
    def test_xy_bounds_exact(self, spark, wm):
        # tests/tms.rs:177-187 — asserted with == in the reference
        df = spark.createDataFrame([(10, 10)], "tx BIGINT, ty BIGINT")
        r = df.select(xy_bounds_udf(wm, 4)("tx", "ty").alias("b")).select("b.*").collect()[0]
        assert r.left == 5009377.085697308
        assert r.bottom == -7514065.628545959
        assert r.right == 7514065.628545959
        assert r.top == -5009377.085697308

    def test_tile_exact(self, spark, wm):
        df = spark.createDataFrame(
            [(-179.0, 85.0), (20.0, 15.0)], "lon DOUBLE, lat DOUBLE"
        )
        got = [
            (r.t.tile_x, r.t.tile_y)
            for r in df.select(tile_udf(wm, 5)("lon", "lat").alias("t")).collect()
        ]
        assert got == [(0, 0), (17, 14)]

    def test_xy_tile_exact(self, spark, wm):
        df = spark.createDataFrame([(17734308.1, -5160979.4)], "x DOUBLE, y DOUBLE")
        r = df.select(xy_tile_udf(wm, 4)("x", "y").alias("t")).collect()[0].t
        assert (r.tile_x, r.tile_y) == (15, 10)

    def test_quadkey_exact(self, spark, wm):
        df = spark.createDataFrame([(486, 332, 10), (0, 0, 0)], "tx BIGINT, ty BIGINT, tz INT")
        got = [r.qk for r in df.select(quadkey_udf(wm)("tx", "ty", "tz").alias("qk")).collect()]
        assert got == ["0313102310", ""]

    def test_cover_limits_match_reference_tiles(self, spark, wm):
        # (-105.0, 39.99, -104.99, 40.0)@z14 -> x 3413..3413, y 6202..6203
        df = spark.createDataFrame(
            [(-105.0, 39.99, -104.99, 40.0)], "w DOUBLE, s DOUBLE, e DOUBLE, n DOUBLE"
        )
        r = df.select(cover_limits_udf(wm, 14)("w", "s", "e", "n").alias("l")).collect()[0].l
        assert (r.x_min, r.x_max, r.y_min, r.y_max) == (3413, 3413, 6202, 6203)

    def test_udf_vs_column_path_consistency(self, spark, wm):
        # both paths agree on tile indices for a broad sample
        import numpy as np

        from tile_grid_spark.functions import grid_cols as G

        rng = np.random.default_rng(4)
        pdf = pd.DataFrame(
            {"lon": rng.uniform(-179.9, 179.9, 3000), "lat": rng.uniform(-84.9, 84.9, 3000)}
        )
        df = spark.createDataFrame(pdf)
        both = (
            G.with_tile(df, wm, 15)
            .withColumn("u", tile_udf(wm, 15)("lon", "lat"))
            .select("tile_x", "tile_y", "u.tile_x", "u.tile_y")
        )
        rows = both.collect()
        mismatch = [r for r in rows if (r[0], r[1]) != (r[2], r[3])]
        # JVM-vs-libm 1-ulp differences can flip a floor only on exact tile
        # boundaries — none expected on random samples
        assert not mismatch

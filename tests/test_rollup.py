"""tile_pyramid rollup vs direct per-zoom aggregation (independent oracle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.functions import grid_cols as G
from tile_grid_spark.operators.rollup import tile_pyramid


@pytest.fixture(scope="module")
def base(spark):
    wm = tms().lookup("WebMercatorQuad")
    rng = np.random.default_rng(7)
    n = 20000
    pts = spark.createDataFrame(
        list(
            zip(
                range(n),
                rng.uniform(-179, 179, n).tolist(),
                rng.uniform(-80, 80, n).tolist(),
                rng.integers(1, 100, n).tolist(),
            )
        ),
        "pid BIGINT, lon DOUBLE, lat DOUBLE, w BIGINT",
    )
    t = G.with_tile(pts, wm, 12)
    return (
        t.groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n"),
            F.sum("w").alias("sw"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
        )
        .cache()
    ), t.cache()


def _reaggs():
    # Columns need an active session -> build lazily, not at import
    return {
        "n": F.sum("n"),  # count re-aggregates as sum of partial counts
        "sw": F.sum("sw"),
        "min_w": F.min("min_w"),
        "max_w": F.max("max_w"),
    }


def _direct(t, z):
    dz = 12 - z
    return (
        t.select(
            F.shiftright("tile_x", dz).alias("tile_x"),
            F.shiftright("tile_y", dz).alias("tile_y"),
            "w",
        )
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n"),
            F.sum("w").alias("sw"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
        )
        .withColumn("zoom", F.lit(z))
        .select("zoom", "tile_x", "tile_y", "n", "sw", "min_w", "max_w")
    )


class TestTilePyramid:
    def test_cascade_matches_direct_per_zoom(self, spark, base):
        b, t = base
        pyr = tile_pyramid(b, 12, [10, 7, 4], _reaggs(), cascade=True)
        for z in (10, 7, 4):
            got = pyr.filter(F.col("zoom") == z)
            want = _direct(t, z)
            assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty(), z

    def test_cascade_equals_from_base(self, spark, base):
        b, _ = base
        a = tile_pyramid(b, 12, [9, 6], _reaggs(), cascade=True)
        c = tile_pyramid(b, 12, [9, 6], _reaggs(), cascade=False)
        assert a.exceptAll(c).isEmpty() and c.exceptAll(a).isEmpty()

    def test_base_level_included_verbatim(self, spark, base):
        b, _ = base
        pyr = tile_pyramid(b, 12, [10], {"n": F.sum("n")})
        got = pyr.filter("zoom = 12").drop("zoom")
        want = b.select("tile_x", "tile_y", "n")
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    def test_rejects_non_coarser_zoom(self, spark, base):
        b, _ = base
        with pytest.raises(ValueError, match="coarser"):
            tile_pyramid(b, 12, [12], {"n": F.sum("n")})

"""HLL sketch pyramid: union losslessness + estimate error vs exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.functions import grid_cols as G
from tile_grid_spark.operators.sketches import (
    hll_pyramid,
    tile_distinct_exact,
    tile_hll_sketches,
)


@pytest.fixture(scope="module")
def tiled(spark):
    wm = tms().lookup("WebMercatorQuad")
    rng = np.random.default_rng(5)
    n = 30000
    pts = spark.createDataFrame(
        list(
            zip(
                rng.integers(0, 2500, n).tolist(),  # user ids (many dups)
                rng.uniform(-179, 179, n).tolist(),
                rng.uniform(-80, 80, n).tolist(),
            )
        ),
        "user_id BIGINT, lon DOUBLE, lat DOUBLE",
    )
    return G.with_tile(pts, wm, 10).cache()


class TestHllPyramid:
    def test_union_rollup_equals_direct_sketch(self, spark, tiled):
        # sketch union is lossless w.r.t. set union: z10 sketches rolled
        # up to z7 must give the SAME estimates as sketching z7 directly
        base = tile_hll_sketches(tiled, "user_id", lg_k=12)
        pyr = hll_pyramid(base, 10, [7]).filter("zoom = 7")
        direct = (
            tiled.select(
                F.shiftright("tile_x", 3).alias("tile_x"),
                F.shiftright("tile_y", 3).alias("tile_y"),
                "user_id",
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
            .select(
                "tile_x", "tile_y", F.hll_sketch_estimate("sk").alias("est")
            )
        )
        j = pyr.join(direct, ["tile_x", "tile_y"], "full_outer")
        assert j.filter(
            F.col("n_distinct_est").isNull()
            | F.col("est").isNull()
            | (F.col("n_distinct_est") != F.col("est"))
        ).isEmpty()

    def test_estimate_within_error_of_exact(self, spark, tiled):
        base = tile_hll_sketches(tiled, "user_id", lg_k=12)
        pyr = hll_pyramid(base, 10, [4]).filter("zoom = 4")
        exact = tile_distinct_exact(
            tiled.select(
                F.shiftright("tile_x", 6).alias("tile_x"),
                F.shiftright("tile_y", 6).alias("tile_y"),
                "user_id",
            ),
            "user_id",
        )
        rows = pyr.join(exact, ["tile_x", "tile_y"]).select(
            "n_distinct_est", "n_distinct"
        ).collect()
        assert rows
        for r in rows:
            # lg_k=12 -> relative standard error ~1.6%; allow 5x RSE
            assert abs(r.n_distinct_est - r.n_distinct) <= max(
                0.08 * r.n_distinct, 3
            ), (r.n_distinct_est, r.n_distinct)

    def test_rejects_non_coarser_zoom(self, spark, tiled):
        base = tile_hll_sketches(tiled, "user_id")
        with pytest.raises(ValueError, match="coarser"):
            hll_pyramid(base, 10, [10])

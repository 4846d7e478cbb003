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


class TestCountMin:
    @pytest.fixture(scope="class")
    def cms_in(self, spark):
        # 4 tiles x skewed user frequencies (user u appears u times)
        rows = []
        for tx in range(2):
            for ty in range(2):
                for u in range(1, 13):
                    rows += [(tx * 2, ty * 2, u + 100 * tx)] * u
        return spark.createDataFrame(
            rows, "tile_x BIGINT, tile_y BIGINT, user_id BIGINT"
        )

    def test_estimate_bounds(self, spark, cms_in):
        from tile_grid_spark.operators.sketches import (
            cm_estimate_expr,
            tile_cm_sketch,
        )

        depth, width = 4, 64
        cms = tile_cm_sketch(cms_in, "user_id", depth=depth, width=width)
        probes = spark.createDataFrame(
            [(u,) for u in range(1, 15)], "user_id BIGINT"
        )
        est = cms.crossJoin(F.broadcast(probes)).select(
            "tile_x",
            "tile_y",
            "user_id",
            cm_estimate_expr(F.col("cms"), "user_id", depth, width).alias("est"),
        )
        exact = {
            (r.tile_x, r.tile_y, r.user_id): r.c
            for r in cms_in.groupBy("tile_x", "tile_y", "user_id")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        n_per_tile = 78  # sum 1..12
        import math

        eps_n = math.e / width * n_per_tile
        for r in est.collect():
            true = exact.get((r.tile_x, r.tile_y, r.user_id), 0)
            assert r.est >= true, r  # CMS never underestimates
            assert r.est <= true + eps_n + 1, r

    def test_sketch_is_dense_and_counts_sum(self, spark, cms_in):
        from tile_grid_spark.operators.sketches import tile_cm_sketch

        depth, width = 4, 32
        cms = tile_cm_sketch(cms_in, "user_id", depth=depth, width=width)
        for r in cms.collect():
            assert len(r.cms) == depth * width
            # every hash row holds the full tile count
            for d in range(depth):
                assert sum(r.cms[d * width : (d + 1) * width]) == 78

    def test_pyramid_merge_equals_direct_build(self, spark, cms_in):
        """rolling child sketches up one level must equal building the
        sketch directly at the parent keying — counter-exact, not just
        estimate-equal (merge is elementwise sum)."""
        from tile_grid_spark.operators.sketches import (
            cm_pyramid_level,
            tile_cm_sketch,
        )

        depth, width = 4, 32
        child = tile_cm_sketch(cms_in, "user_id", depth=depth, width=width)
        rolled = {
            (r.tile_x, r.tile_y): r.cms
            for r in cm_pyramid_level(child, depth=depth, width=width).collect()
        }
        direct_in = cms_in.withColumn(
            "tile_x", (F.col("tile_x") / 2).cast("bigint")
        ).withColumn("tile_y", (F.col("tile_y") / 2).cast("bigint"))
        direct = {
            (r.tile_x, r.tile_y): r.cms
            for r in tile_cm_sketch(
                direct_in, "user_id", depth=depth, width=width
            ).collect()
        }
        assert rolled == direct

    def test_merge_expr_elementwise(self, spark):
        from tile_grid_spark.operators.sketches import cm_merge_expr

        df = spark.createDataFrame(
            [([1, 2, 0], [0, 5, 7])], "a ARRAY<BIGINT>, b ARRAY<BIGINT>"
        )
        got = df.select(cm_merge_expr(F.col("a"), F.col("b")).alias("m")).collect()
        assert got[0].m == [1, 7, 7]

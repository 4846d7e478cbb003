"""Adaptive quadtree density tiling vs a recursive python oracle."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms as tms_mod
from tile_grid_spark.functions.grid_cols import with_tile
from tile_grid_spark.operators.adaptive import adaptive_density_tiles

WM = tms_mod().lookup("WebMercatorQuad")


def _skewed_points(spark, n, seed=7):
    rng = np.random.default_rng(seed)
    lon = np.concatenate([rng.uniform(-170, 170, n // 2), rng.uniform(8.4, 8.6, n - n // 2)])
    lat = np.concatenate([rng.uniform(-80, 80, n // 2), rng.uniform(47.3, 47.45, n - n // 2)])
    return spark.createDataFrame(
        pd.DataFrame({"pid": np.arange(n), "lon": lon, "lat": lat})
    )


def _oracle(spark, pts, k, z_min, z_max):
    """Literal recursive splitting over the z_max assignment."""
    base = with_tile(pts, WM, z_max).select("tile_x", "tile_y").toPandas()
    cz = Counter(zip(base.tile_x, base.tile_y))
    lc = {}
    for z in range(z_min, z_max + 1):
        s = z_max - z
        c = Counter()
        for (x, y), n_ in cz.items():
            c[(x >> s, y >> s)] += n_
        lc[z] = c
    expected = {}

    def rec(z, x, y):
        c = lc[z].get((x, y), 0)
        if c == 0:
            return
        if c <= k or z == z_max:
            expected[(z, x, y)] = c
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(z + 1, x * 2 + dx, y * 2 + dy)

    for (x, y) in list(lc[z_min]):
        rec(z_min, x, y)
    return expected


class TestAdaptiveDensityTiles:
    def test_matches_recursive_oracle_and_partitions_points(self, spark):
        n = 6000
        pts = _skewed_points(spark, n)
        k, z_min, z_max = 120, 1, 11
        out = adaptive_density_tiles(pts, WM, k, z_min, z_max).collect()
        leaves = {(r.zoom, r.tile_x, r.tile_y): r.n_points for r in out}
        assert leaves == _oracle(spark, pts, k, z_min, z_max)
        # leaves partition the points
        assert sum(leaves.values()) == n
        # density bound holds except at the zoom budget
        assert all(c <= k for (z, _, _), c in leaves.items() if z != z_max)
        # no leaf is an ancestor of another
        for (z, x, y) in leaves:
            for za in range(z_min, z):
                assert (za, x >> (z - za), y >> (z - za)) not in leaves

    def test_z_max_budget_exhaustion_keeps_oversized_leaf(self, spark):
        # all points on one spot: every level splits to the same child
        # until z_max, where the oversized tile must still be emitted
        pts = spark.createDataFrame(
            pd.DataFrame({"pid": range(50), "lon": [8.5417] * 50, "lat": [47.3769] * 50})
        )
        out = adaptive_density_tiles(pts, WM, 10, z_min=0, z_max=6).collect()
        assert len(out) == 1
        assert out[0].zoom == 6 and out[0].n_points == 50

    def test_no_split_when_under_bound(self, spark):
        pts = _skewed_points(spark, 40, seed=3)
        out = adaptive_density_tiles(pts, WM, 1000, z_min=2, z_max=9).collect()
        # nothing exceeds the bound at z_min -> all leaves sit at z_min
        assert {r.zoom for r in out} == {2}
        assert sum(r.n_points for r in out) == 40

    def test_param_validation(self, spark):
        pts = _skewed_points(spark, 10, seed=1)
        with pytest.raises(ValueError, match="z_min"):
            adaptive_density_tiles(pts, WM, 10, z_min=5, z_max=3)
        with pytest.raises(ValueError, match="max_per_tile"):
            adaptive_density_tiles(pts, WM, 0)

    def test_plan_shape(self, spark):
        """One point-level aggregation, chained tile-frame rollups and a
        single bigint-key self-join: no python eval nodes, no cartesian
        product, and the point rows are read exactly once."""
        pts = _skewed_points(spark, 2000, seed=5)
        df = adaptive_density_tiles(pts, WM, 100, z_min=3, z_max=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan

"""bbox_overlap_join vs brute-force cross product + plan shape."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.operators.overlap_join import bbox_overlap_join


def _layers(seed, n_left=300, n_right=120):
    rng = np.random.default_rng(seed)

    def mk(n, id_name, wmax):
        minx = rng.uniform(-179, 160, n)
        miny = rng.uniform(-84, 70, n)
        return pd.DataFrame(
            {
                id_name: np.arange(n),
                "minx": minx,
                "miny": miny,
                "maxx": minx + rng.uniform(0.5, wmax, n),
                "maxy": miny + rng.uniform(0.5, wmax / 2, n),
            }
        )

    return mk(n_left, "l_id", 20.0), mk(n_right, "r_id", 30.0)


def _brute(lpdf, rpdf):
    pairs = set()
    for l in lpdf.itertuples():
        hit = rpdf[
            (l.minx < rpdf.maxx)
            & (l.maxx > rpdf.minx)
            & (l.miny < rpdf.maxy)
            & (l.maxy > rpdf.miny)
        ]
        pairs.update((l.l_id, r) for r in hit.r_id)
    return pairs


def test_overlap_join_matches_bruteforce(spark):
    wm = tms().lookup("WebMercatorQuad")
    lpdf, rpdf = _layers(3)
    got = bbox_overlap_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), wm, zoom=4
    ).collect()
    got_pairs = {(r.l_id, r.r_id) for r in got}
    assert len(got) == len(got_pairs), "distinct() must dedupe multi-tile hits"
    assert got_pairs == _brute(lpdf, rpdf)


def test_overlap_join_zoom_invariance(spark):
    """Recall is exact at ANY zoom (tiles partition the plane)."""
    wm = tms().lookup("WebMercatorQuad")
    lpdf, rpdf = _layers(11, n_left=80, n_right=40)
    want = _brute(lpdf, rpdf)
    for z in (2, 5, 7):
        got = bbox_overlap_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), wm, zoom=z
        ).collect()
        assert {(r.l_id, r.r_id) for r in got} == want, f"zoom {z}"


def test_overlap_join_touching_edges_excluded(spark):
    wm = tms().lookup("WebMercatorQuad")
    l = spark.createDataFrame(
        pd.DataFrame({"l_id": [0], "minx": [0.0], "miny": [0.0], "maxx": [10.0], "maxy": [10.0]})
    )
    r = spark.createDataFrame(
        pd.DataFrame(
            {
                "r_id": [0, 1],
                "minx": [10.0, 9.999],
                "miny": [0.0, 0.0],
                "maxx": [20.0, 20.0],
                "maxy": [10.0, 10.0],
            }
        )
    )
    got = {t.r_id for t in bbox_overlap_join(l, r, wm, zoom=4).collect()}
    assert got == {1}  # edge-touching r_id=0 excluded (open intervals)


def test_overlap_join_no_nested_loop(spark):
    wm = tms().lookup("WebMercatorQuad")
    lpdf, rpdf = _layers(5, n_left=50, n_right=20)
    out = bbox_overlap_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), wm, zoom=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan

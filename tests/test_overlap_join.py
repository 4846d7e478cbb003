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


def test_overlap_join_antimeridian(spark):
    """Wrap boxes (minx > maxx) join plain and wrap boxes correctly on
    the circle (python oracle decomposes into arcs the same way)."""
    wm = tms().lookup("WebMercatorQuad")
    rng = np.random.default_rng(7)
    rows_l, rows_r = [], []
    for i in range(60):  # mixed layer: every 3rd box crosses the seam
        miny = float(rng.uniform(-70, 50))
        maxy = miny + float(rng.uniform(2, 15))
        if i % 3 == 0:
            minx = float(rng.uniform(150, 179))
            maxx = float(rng.uniform(-179, -150))
        else:
            minx = float(rng.uniform(-179, 150))
            maxx = minx + float(rng.uniform(2, 25))
        rows_l.append((i, minx, miny, maxx, maxy))
    for j in range(40):
        miny = float(rng.uniform(-70, 50))
        maxy = miny + float(rng.uniform(2, 15))
        if j % 4 == 0:
            minx = float(rng.uniform(150, 179))
            maxx = float(rng.uniform(-179, -150))
        else:
            minx = float(rng.uniform(-179, 150))
            maxx = minx + float(rng.uniform(2, 25))
        rows_r.append((j, minx, miny, maxx, maxy))
    # deterministic wrap x wrap and wrap x plain pairs
    rows_l.append((1000, 170.0, 0.0, -170.0, 10.0))
    rows_r.append((2000, 175.0, 5.0, -175.0, 15.0))   # wrap, overlaps 1000
    rows_r.append((2001, -178.0, 2.0, -160.0, 8.0))   # plain, overlaps 1000
    schema_l = "l_id BIGINT, minx DOUBLE, miny DOUBLE, maxx DOUBLE, maxy DOUBLE"
    schema_r = "r_id BIGINT, minx DOUBLE, miny DOUBLE, maxx DOUBLE, maxy DOUBLE"
    got = {
        (r.l_id, r.r_id)
        for r in bbox_overlap_join(
            spark.createDataFrame(rows_l, schema_l),
            spark.createDataFrame(rows_r, schema_r),
            wm,
            zoom=4,
        ).collect()
    }

    def arcs(minx, maxx):
        return [(minx, 180.0), (-180.0, maxx)] if minx > maxx else [(minx, maxx)]

    exp = set()
    for li, lminx, lminy, lmaxx, lmaxy in rows_l:
        for rj, rminx, rminy, rmaxx, rmaxy in rows_r:
            lat_ok = lminy < rmaxy and lmaxy > rminy
            lon_ok = any(
                a0 < b1 and a1 > b0
                for a0, a1 in arcs(lminx, lmaxx)
                for b0, b1 in arcs(rminx, rmaxx)
            )
            if lat_ok and lon_ok:
                exp.add((li, rj))
    assert got == exp
    # wrap x wrap and wrap x plain pairs genuinely exercised
    assert (1000, 2000) in got and (1000, 2001) in got


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

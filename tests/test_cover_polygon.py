"""Interior-exact polygon tile cover vs a from-scratch python oracle
(operators/cover.cover_polygon_exact)."""

import math

from tile_grid_spark.core import tms
from tile_grid_spark.operators.cover import cover_polygon_exact

R = 6378137.0


def _merc(lon, lat):
    return R * math.radians(lon), R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))


def _py_cover(polys, p, zoom):
    """Brute force over every tile of the polygon bbox cover: the same
    spec (segment/rect separating-line OR even-odd center parity), an
    independent sequential implementation."""
    uw = p.resolution * 256.0
    out = {}
    for pid, rings in polys.items():
        mrings = [[_merc(x, y) for x, y in r] for r in rings]
        edges = [
            (r[i][0], r[i][1], r[(i + 1) % len(r)][0], r[(i + 1) % len(r)][1])
            for r in mrings
            for i in range(len(r))
        ]
        xs = [v[0] for r in mrings for v in r]
        ys = [v[1] for r in mrings for v in r]
        tx0 = min(max(int(math.floor((min(xs) - p.origin_x) / uw)), 0), p.matrix_width - 1)
        tx1 = min(max(int(math.floor((max(xs) - p.origin_x) / uw)), 0), p.matrix_width - 1)
        ty0 = min(max(int(math.floor((p.origin_y - max(ys)) / uw)), 0), p.matrix_height - 1)
        ty1 = min(max(int(math.floor((p.origin_y - min(ys)) / uw)), 0), p.matrix_height - 1)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                minx = p.origin_x + tx * uw
                maxx = p.origin_x + (tx + 1) * uw
                maxy = p.origin_y - ty * uw
                miny = p.origin_y - (ty + 1) * uw
                hit = False
                for x1, y1, x2, y2 in edges:
                    # edge bbox must overlap the rect (the operator only
                    # tests edges whose bbox cover includes the tile)
                    if max(x1, x2) < minx or min(x1, x2) > maxx:
                        continue
                    if max(y1, y2) < miny or min(y1, y2) > maxy:
                        continue
                    ds = [
                        (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
                        for cx, cy in (
                            (minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy)
                        )
                    ]
                    if min(ds) <= 0 <= max(ds):
                        hit = True
                        break
                cx = p.origin_x + (tx + 0.5) * uw
                cy = p.origin_y - (ty + 0.5) * uw
                cross = 0
                for x1, y1, x2, y2 in edges:
                    if (y1 > cy) != (y2 > cy):
                        xint = (x2 - x1) * (cy - y1) / (y2 - y1) + x1
                        if cx < xint:
                            cross += 1
                inside = cross % 2 == 1
                if hit or inside:
                    out[(pid, tx, ty)] = (hit, inside)
    return out


def _mk(spark, polys):
    rows = [
        (pid, ri, vi, float(x), float(y))
        for pid, rings in polys.items()
        for ri, pts in enumerate(rings)
        for vi, (x, y) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "poly_id BIGINT, ring_idx INT, vert_idx INT, lon DOUBLE, lat DOUBLE"
    )


class TestPolygonCover:
    def test_matches_python_oracle_triangle_and_hole(self, spark):
        wm = tms().lookup("WebMercatorQuad")
        zoom = 6
        tri = [(1.0, 1.0), (41.0, 1.0), (1.0, 41.0)]  # half its bbox is empty
        sq = [(-60.0, -30.0), (-20.0, -30.0), (-20.0, 10.0), (-60.0, 10.0)]
        hole = [(-50.0, -20.0), (-50.0, 0.0), (-30.0, 0.0), (-30.0, -20.0)]
        polys = {0: [tri], 1: [sq, hole]}
        got = {
            (r.poly_id, r.tile_x, r.tile_y): (r.boundary, r.center_inside)
            for r in cover_polygon_exact(_mk(spark, polys), wm, zoom).collect()
        }
        exp = _py_cover(polys, wm.zoom_params(zoom), zoom)
        assert got == exp
        # the triangle's far bbox corner tile is NOT in the cover
        # (interior-exact beats the bbox cover exactly there)
        p = wm.zoom_params(zoom)
        uw = p.resolution * 256.0
        far_x = int(math.floor((_merc(41.0, 0)[0] - p.origin_x) / uw))
        far_y = int(math.floor((p.origin_y - _merc(0, 41.0)[1]) / uw))
        assert (0, far_x, far_y) not in got
        # some tile sits wholly inside the hole and is excluded
        hx = int(math.floor((_merc(-40.0, 0)[0] - p.origin_x) / uw))
        hy = int(math.floor((p.origin_y - _merc(0, -10.0)[1]) / uw))
        assert (1, hx, hy) not in got
        # but interior (non-hole) tiles of the square ARE covered
        assert any(pid == 1 and not b and i for (pid, _, _), (b, i) in got.items())

    def test_tiny_polygon_single_boundary_tile(self, spark):
        wm = tms().lookup("WebMercatorQuad")
        small = {0: [[(10.01, 10.01), (10.02, 10.01), (10.02, 10.02), (10.01, 10.02)]]}
        got = cover_polygon_exact(_mk(spark, small), wm, 5).collect()
        assert len(got) == 1
        r = got[0]
        assert r.boundary and not r.center_inside
        assert r.zoom == 5

    def test_no_python_nodes(self, spark):
        wm = tms().lookup("WebMercatorQuad")
        df = _mk(spark, {0: [[(0.0, 0.0), (5.0, 0.0), (0.0, 5.0)]]})
        plan = (
            cover_polygon_exact(df, wm, 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan

"""Shoelace polygon metrics vs hand/python oracles (operators/geometry)."""

import math

from tile_grid_spark.operators.geometry import polygon_metrics, ring_metrics


def _shoelace2(pts):
    n = len(pts)
    return sum(
        pts[i][0] * pts[(i + 1) % n][1] - pts[(i + 1) % n][0] * pts[i][1]
        for i in range(n)
    )


def _perimeter(pts):
    n = len(pts)
    return sum(
        math.dist(pts[i], pts[(i + 1) % n]) for i in range(n)
    )


def _mk(spark, polys):
    """polys: {poly_id: [ring0_pts, ring1_pts, ...]}"""
    rows = [
        (pid, ri, vi, float(x), float(y))
        for pid, rings in polys.items()
        for ri, pts in enumerate(rings)
        for vi, (x, y) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "poly_id BIGINT, ring_idx INT, vert_idx INT, lon DOUBLE, lat DOUBLE"
    )


class TestPolygonMetrics:
    def test_matches_python_oracle(self, spark):
        sq = [(0, 0), (4, 0), (4, 4), (0, 4)]  # ccw, area 16
        hole = [(1, 1), (1, 3), (3, 3), (3, 1)]  # cw hole, area 4
        tri_cw = [(0, 0), (0, 2), (2, 0)]  # cw triangle, area 2
        polys = {0: [sq, hole], 1: [tri_cw]}
        got = {r.poly_id: r for r in polygon_metrics(_mk(spark, polys)).collect()}

        assert got[0].area == 12.0  # 16 - 4
        assert got[0].winding == "ccw"
        assert got[0].perimeter == round(_perimeter(sq) + _perimeter(hole), 9)
        assert (got[0].ctr_lon, got[0].ctr_lat) == (2.0, 2.0)
        assert got[0].n_rings == 2 and got[0].n_vertices == 8

        assert got[1].area == 2.0
        assert got[1].winding == "cw"
        a2 = _shoelace2(tri_cw)
        cx = sum(
            (tri_cw[i][0] + tri_cw[(i + 1) % 3][0])
            * (
                tri_cw[i][0] * tri_cw[(i + 1) % 3][1]
                - tri_cw[(i + 1) % 3][0] * tri_cw[i][1]
            )
            for i in range(3)
        ) / (3 * a2)
        assert got[1].ctr_lon == round(cx, 6)

    def test_ring_metrics_signs_and_order_independence(self, spark):
        # shuffled vert_idx input must sort back before folding
        ccw = [(0, 0), (2, 0), (2, 2), (0, 2)]
        rows = [(7, 0, vi, float(x), float(y)) for vi, (x, y) in enumerate(ccw)]
        rows = [rows[2], rows[0], rows[3], rows[1]]
        df = spark.createDataFrame(
            rows, "poly_id BIGINT, ring_idx INT, vert_idx INT, lon DOUBLE, lat DOUBLE"
        )
        r = ring_metrics(df).collect()[0]
        assert r.area2 == 8.0  # ccw positive
        assert r.perimeter == 8.0
        cw = list(reversed(ccw))
        df2 = _mk(spark, {1: [cw]})
        assert ring_metrics(df2).collect()[0].area2 == -8.0

    def test_degenerate_rings(self, spark):
        got = {
            r.poly_id: r
            for r in polygon_metrics(
                _mk(spark, {0: [[(5, 5), (9, 9)]], 1: [[(1, 1)]]})
            ).collect()
        }
        assert got[0].area == 0.0 and got[0].ctr_lon is None
        assert got[1].area == 0.0 and got[1].perimeter == 0.0

    def test_two_exchanges_no_python(self, spark):
        df = _mk(spark, {0: [[(0, 0), (1, 0), (1, 1)]]})
        plan = (
            polygon_metrics(df)._jdf.queryExecution().executedPlan().toString()
        )
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") <= 2
        assert "EvalPython" not in final

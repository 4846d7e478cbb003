"""Stay-point detection vs a from-scratch python oracle."""

import datetime as dt
import math

from pyspark.sql import functions as F

from tile_grid_spark.operators.staypoint import M_PER_DEG, staypoints


def _dist_m(lon1, lat1, lon2, lat2):
    dx = (lon2 - lon1) * math.cos(math.radians((lat1 + lat2) / 2.0))
    dy = lat2 - lat1
    return math.sqrt(dx * dx + dy * dy) * M_PER_DEG


def _py_staypoints(rows, radius_m, min_points, min_duration_s):
    """rows: (user, ts, lon, lat) — sequential segmentation oracle."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, lo, la in rows:
        by_user[u].append((t, lo, la))
    out = {}
    for u, fixes in by_user.items():
        fixes.sort()
        seg, prev = 0, None
        segs = defaultdict(list)
        for t, lo, la in fixes:
            if prev is None or _dist_m(prev[0], prev[1], lo, la) > radius_m:
                seg += 1
            segs[seg].append((t, lo, la))
            prev = (lo, la)
        for s, pts in segs.items():
            dur = (pts[-1][0] - pts[0][0]).total_seconds()
            if len(pts) >= min_points and dur >= min_duration_s:
                out[(u, s)] = (
                    len(pts),
                    round(sum(p[1] for p in pts) / len(pts), 6),
                    round(sum(p[2] for p in pts) / len(pts), 6),
                )
    return out


class TestStaypoints:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            [(u, i, t, lo, la) for i, (u, t, lo, la) in enumerate(rows)],
            "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE",
        )

    def test_matches_python_oracle(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: dwell at (10, 50) for 5 fixes, jump 1km, dwell 3 fixes
        for i in range(5):
            rows.append((1, t0 + dt.timedelta(minutes=i), 10.0 + i * 1e-4, 50.0))
        for i in range(3):
            rows.append((1, t0 + dt.timedelta(minutes=30 + i), 10.02 + i * 1e-4, 50.0))
        # user 2: every fix jumps far -> no staypoint at min_points=2
        for i in range(4):
            rows.append((2, t0 + dt.timedelta(minutes=i), 10.0 + i * 0.5, 0.0))
        got = {
            (r.user_id, r.seg_id): (r.n_points, r.ctr_lon, r.ctr_lat)
            for r in staypoints(
                self._mk(spark, rows), radius_m=100.0, min_points=2, tiebreak="event_id"
            ).collect()
        }
        exp = _py_staypoints(
            [(u, t, lo, la) for u, t, lo, la in rows], 100.0, 2, 0.0
        )
        assert got == exp
        assert (1, 1) in got and got[(1, 1)][0] == 5
        assert (1, 2) in got and got[(1, 2)][0] == 3
        assert not any(u == 2 for u, _ in got)

    def test_duration_and_min_points_filters(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = [(1, t0 + dt.timedelta(seconds=10 * i), 10.0, 50.0) for i in range(4)]
        df = self._mk(spark, rows)
        # 4 fixes, 30s dwell
        assert staypoints(df, min_points=5).count() == 0
        assert staypoints(df, min_points=4, min_duration_s=31).count() == 0
        got = staypoints(df, min_points=4, min_duration_s=30).collect()
        assert len(got) == 1 and got[0].duration_s == 30

    def test_equal_ts_tiebreak_deterministic(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        # two same-timestamp fixes far apart: event_id order decides the
        # break structure; repeated runs must agree
        rows = [
            (1, t0, 10.0, 50.0),
            (1, t0, 11.0, 50.0),
            (1, t0 + dt.timedelta(minutes=1), 11.00001, 50.0),
        ]
        df = self._mk(spark, rows)
        a = sorted(
            (r.seg_id, r.n_points)
            for r in staypoints(df, min_points=1, tiebreak="event_id").collect()
        )
        assert a == [(1, 1), (2, 2)]

    def test_single_exchange_plan(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        df = self._mk(spark, [(1, t0, 10.0, 50.0), (1, t0, 10.1, 50.0)])
        plan = (
            staypoints(df, tiebreak="event_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        final = plan.split("== Initial Plan ==")[0]
        # the groupBy(user, seg) agg must reuse the window's
        # hashpartitioning(user) — one exchange total
        assert final.count("Exchange hashpartitioning") == 1, final


class TestOdFlows:
    def test_matches_hand_oracle(self, spark):
        from tile_grid_spark.core import tms as registry
        from tile_grid_spark.operators.staypoint import od_flows

        wm = registry().lookup("WebMercatorQuad")
        # user 1: A -> B -> A (tiles differ at z8: ~150 km apart)
        # user 2: A -> B  (one trip on the same corridor)
        rows = [
            (1, 1, 100, 150, 10.0, 50.0),
            (1, 2, 300, 350, 12.0, 50.0),
            (1, 3, 500, 520, 10.0, 50.0),
            (2, 1, 90, 100, 10.0, 50.0),
            (2, 2, 400, 410, 12.0, 50.0),
        ]
        sp = spark.createDataFrame(
            rows,
            "user_id BIGINT, seg_id BIGINT, t_start_s BIGINT, t_end_s BIGINT, "
            "ctr_lon DOUBLE, ctr_lat DOUBLE",
        )
        got = {
            (r.from_x, r.to_x): r
            for r in od_flows(sp, wm, zoom=8, min_trips=1).collect()
        }
        ax = wm.tile(10.0, 50.0, 8).x
        bx = wm.tile(12.0, 50.0, 8).x
        assert got[(ax, bx)].n_trips == 2  # users 1 and 2, A->B
        assert got[(ax, bx)].n_users == 2
        # travel: user1 300-150=150, user2 400-100=300
        assert got[(ax, bx)].total_travel_s == 450
        assert got[(bx, ax)].n_trips == 1 and got[(bx, ax)].n_users == 1
        assert got[(bx, ax)].total_travel_s == 150

    def test_min_trips_suppression(self, spark):
        from tile_grid_spark.core import tms as registry
        from tile_grid_spark.operators.staypoint import od_flows

        wm = registry().lookup("WebMercatorQuad")
        rows = [
            (1, 1, 0, 10, 10.0, 50.0),
            (1, 2, 20, 30, 12.0, 50.0),
        ]
        sp = spark.createDataFrame(
            rows,
            "user_id BIGINT, seg_id BIGINT, t_start_s BIGINT, t_end_s BIGINT, "
            "ctr_lon DOUBLE, ctr_lat DOUBLE",
        )
        assert od_flows(sp, wm, zoom=8, min_trips=2).count() == 0
        assert od_flows(sp, wm, zoom=8, min_trips=1).count() == 1

    def test_composed_pipeline_two_exchanges(self, spark):
        import datetime as dt

        from tile_grid_spark.core import tms as registry
        from tile_grid_spark.operators.staypoint import od_flows, staypoints

        wm = registry().lookup("WebMercatorQuad")
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, i, t0 + dt.timedelta(minutes=i), 10.0 + (i // 3) * 0.5, 50.0)
            for i in range(9)
        ]
        df = spark.createDataFrame(
            rows, "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, lon DOUBLE, lat DOUBLE"
        )
        sp = staypoints(df, radius_m=100.0, min_points=2, tiebreak="event_id")
        out = od_flows(sp, wm, zoom=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # staypoint window + its agg + the lead window all share
        # hashpartitioning(user); only the tile-pair agg reshuffles.
        # countDistinct adds its expand-phase exchange on the pair key.
        assert final.count("Exchange hashpartitioning") <= 3, final
        # the 0.5-deg hops stay inside one z8 tile (1.40625 deg): both
        # trips collapse into a single self-loop flow
        rows = out.collect()
        assert len(rows) == 1 and rows[0].n_trips == 2 and rows[0].n_users == 1

"""Property tests for the from-scratch S2 + hex cell indexes.

No oracle libraries exist in-sandbox (SURVEY.md §2.C), so validation is:
round-trips, hierarchy/prefix containment, Hilbert locality, face layout,
hex ring symmetry, and determinism across chunkings (vectorization safety).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.functions import cells as S


def rand_lonlat(n=5000, seed=2):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-89.9, 89.9, n)


class TestS2:
    def test_leaf_roundtrip_face_ij(self):
        rng = np.random.default_rng(1)
        face = rng.integers(0, 6, 2000).astype(np.int64)
        i = rng.integers(0, S._MAX_SIZE, 2000).astype(np.int64)
        j = rng.integers(0, S._MAX_SIZE, 2000).astype(np.int64)
        cid = S.face_ij_to_cell_id(face, i, j)
        f2, i2, j2 = S.cell_id_to_face_ij(cid)
        assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()

    def test_leaf_is_valid(self):
        lon, lat = rand_lonlat()
        cid = S.s2_cell_id(lon, lat, 30)
        # leaf ids are odd (trailing 1) and level 30
        assert (np.asarray(cid) & 1).all()
        assert (S.s2_level(np.asarray(cid)) == 30).all()

    def test_parent_prefix_property(self):
        lon, lat = rand_lonlat(2000, seed=3)
        leaf = np.asarray(S.s2_cell_id(lon, lat, 30))
        for level in (0, 5, 12, 20, 29):
            parent = np.asarray(S.s2_parent(leaf, level))
            assert (S.s2_level(parent) == level).all()
            # range containment: leaf in [parent - lsb + 1, parent + lsb - 1]
            lsb = np.uint64(1) << np.uint64(2 * (30 - level))
            pu = parent.view(np.uint64)
            lu = leaf.view(np.uint64)
            assert (lu >= pu - lsb + np.uint64(1)).all()
            assert (lu <= pu + lsb - np.uint64(1)).all()
            # parent of parent == coarser parent
            p2 = S.s2_parent(np.asarray(S.s2_parent(leaf, 20)), level) if level < 20 else None
            if p2 is not None:
                assert (np.asarray(p2) == parent).all()

    def test_face_layout(self):
        # cardinal directions hit the six faces
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        x, y, z = S.lonlat_to_xyz(lon, lat)
        face, u, v = S.xyz_to_face_uv(x, y, z)
        assert face.tolist() == [0, 1, 2, 3, 4, 5]
        # face centers project to (u,v)=(0,0)
        assert np.allclose(u, 0, atol=1e-12) and np.allclose(v, 0, atol=1e-12)

    def test_st_uv_roundtrip(self):
        s = np.linspace(0, 1, 101)
        assert np.allclose(S._uv_to_st(S._st_to_uv(s)), s, atol=1e-12)

    def test_hilbert_locality(self):
        # neighbors in ij space at a level share the parent at that level
        # more often than random pairs (weak locality smoke check)
        lon, lat = rand_lonlat(3000, seed=7)
        cid12 = np.asarray(S.s2_cell_id(lon, lat, 12))
        cid12b = np.asarray(S.s2_cell_id(lon + 1e-9, lat + 1e-9, 12))
        assert (cid12 == cid12b).mean() > 0.99

    def test_same_cell_same_point(self):
        lon, lat = rand_lonlat(500, seed=9)
        a = np.asarray(S.s2_cell_id(lon, lat, 16))
        b = np.asarray(S.s2_cell_id(lon.copy(), lat.copy(), 16))
        assert (a == b).all()

    def test_chunking_invariance(self):
        lon, lat = rand_lonlat(1001, seed=11)
        whole = np.asarray(S.s2_cell_id(lon, lat, 14))
        parts = np.concatenate(
            [np.asarray(S.s2_cell_id(lon[i : i + 100], lat[i : i + 100], 14)) for i in range(0, 1001, 100)]
        )
        assert (whole == parts).all()

    def test_ring_same_face(self):
        lon = np.array([10.0])
        lat = np.array([20.0])
        cid = np.asarray(S.s2_cell_id(lon, lat, 12))
        rings = S.s2_ring_same_face(cid, 12, 1)
        assert len(rings) == 1
        ring = rings[0]
        assert len(ring) == 8  # interior cell: full 8-ring
        assert len(set(ring.tolist())) == 8
        assert cid[0] not in ring.tolist()
        # all at level 12
        assert (S.s2_level(ring) == 12).all()

    def test_ring_cross_face_edge(self):
        # lon=45 is the face0|face1 cube edge: a cell hugging it must get
        # a FULL 8-ring with wrap (some cells live on face 1), while the
        # clamped variant loses the across-edge column
        lon = np.array([44.99999])
        lat = np.array([0.0])
        L = 12
        cid = np.asarray(S.s2_cell_id(lon, lat, L))
        wrapped = S.s2_ring(cid, L, 1, wrap=True)[0]
        clamped = S.s2_ring_same_face(cid, L, 1)[0]
        assert len(wrapped) == 8
        assert len(clamped) < 8
        assert (S.s2_level(wrapped) == L).all()
        faces = {int(c) >> 61 for c in wrapped.view(np.uint64)}
        assert faces == {0, 1}  # ring genuinely spans both faces

    def test_ring_cross_face_geometric_adjacency(self):
        # a point nudged ACROSS the edge by less than a cell width must
        # land in the wrap ring of the original cell
        L = 12
        p_lon, p_lat = 44.99999, 10.0
        cid = np.asarray(S.s2_cell_id(np.array([p_lon]), np.array([p_lat]), L))
        ring = set(S.s2_ring(cid, L, 1, wrap=True)[0].tolist())
        q = np.asarray(S.s2_cell_id(np.array([45.00001]), np.array([p_lat]), L))
        assert int(q[0]) in ring or int(q[0]) == int(cid[0])

    def test_ring_cross_face_corner(self):
        # cube corner (lon=45, lat=atan(1/sqrt(2))): the diagonal neighbor
        # doesn't exist, so the wrap ring dedupes to 7 cells
        corner_lat = np.degrees(np.arctan(1 / np.sqrt(2)))
        cid = np.asarray(
            S.s2_cell_id(np.array([44.999995]), np.array([corner_lat - 1e-5]), 12)
        )
        ring = S.s2_ring(cid, 12, 1, wrap=True)[0]
        assert len(ring) in (7, 8)
        assert len(set(ring.tolist())) == len(ring)


class TestHex:
    def test_roundtrip_pack(self):
        lon, lat = rand_lonlat(2000, seed=13)
        for res in (0, 5, 9, 15):
            cid = S.hex_cell_id(lon, lat, res)
            r2, face, q, r = S.hex_unpack(cid)
            assert (r2 == res).all()
            assert ((face >= 0) & (face < 20)).all()
            repacked = (
                (np.int64(res) << np.int64(59))
                | (face << np.int64(54))
                | ((q & S._M27) << np.int64(27))
                | (r & S._M27)
            )
            assert (repacked == cid).all()

    def test_stability(self):
        lon, lat = rand_lonlat(500, seed=15)
        a = S.hex_cell_id(lon, lat, 9)
        b = S.hex_cell_id(lon + 1e-10, lat, 9)
        assert (a == b).mean() > 0.999

    def test_resolution_nesting_statistical(self):
        # points sharing a res-9 cell nearly always share the res-5 cell:
        # aperture-7 children straddle parents (like real H3), so require
        # only a strong majority
        rng = np.random.default_rng(17)
        lon0, lat0 = 8.54, 47.37
        lon = lon0 + rng.uniform(-1e-4, 1e-4, 400)
        lat = lat0 + rng.uniform(-1e-4, 1e-4, 400)
        c9 = S.hex_cell_id(lon, lat, 9)
        c5 = S.hex_cell_id(lon, lat, 5)
        same9 = c9 == c9[0]
        frac = (c5[same9] == c5[same9][0]).mean()
        assert frac > 0.95

    def test_ring_offsets(self):
        assert len(S.hex_k_ring_offsets(0)) == 1
        for r in (1, 2, 3, 7):
            off = S.hex_k_ring_offsets(r)
            assert len(off) == 6 * r
            assert len(set(off)) == 6 * r
            # all at hex distance exactly r
            for q, s in off:
                dist = (abs(q) + abs(s) + abs(-q - s)) // 2
                assert dist == r

    def test_cell_size_shrinks(self):
        # aperture 7: res+1 cells ~7x smaller => more distinct cells
        # (coarse res needed: at res>=5 all 4000 random points are unique)
        lon, lat = rand_lonlat(4000, seed=19)
        n0 = len(np.unique(S.hex_cell_id(lon, lat, 0)))
        n2 = len(np.unique(S.hex_cell_id(lon, lat, 2)))
        assert 20 <= n0 < 2000
        assert n2 > n0 * 3


class TestSparkUdfs:
    def test_s2_udf(self, spark):
        import pandas as pd

        lon, lat = rand_lonlat(300, seed=23)
        df = spark.createDataFrame(
            pd.DataFrame({"lon": lon, "lat": lat})
        )
        out = df.withColumn("cell", S.s2_cell_udf(12)("lon", "lat")).toPandas()
        exp = np.asarray(S.s2_cell_id(lon, lat, 12))
        assert (out["cell"].to_numpy() == exp).all()

    def test_s2_face_ij_udf_consistent_with_cell_id(self, spark):
        # the projection companion must agree with the ij that the cell-id
        # path encodes: decode the LEAF id back to (face, i, j) and shift
        import pandas as pd

        lon, lat = rand_lonlat(300, seed=31)
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        out = df.withColumn("s", S.s2_face_ij_udf(10)("lon", "lat")).select(
            "s.face", "s.i", "s.j"
        ).toPandas()
        leaf = np.asarray(S.s2_cell_id(lon, lat, 30))
        face, i, j = S.cell_id_to_face_ij(leaf)
        assert (out["face"].to_numpy() == face).all()
        assert (out["i"].to_numpy() == (i >> 20)).all()
        assert (out["j"].to_numpy() == (j >> 20)).all()

    def test_hex_udf(self, spark):
        import pandas as pd

        lon, lat = rand_lonlat(300, seed=29)
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        out = df.withColumn("cell", S.hex_cell_udf(7)("lon", "lat")).toPandas()
        exp = np.asarray(S.hex_cell_id(lon, lat, 7))
        assert (out["cell"].to_numpy() == exp).all()


class TestGeohash:
    def _scalar_bisect(self, lon, lat, precision):
        # independent oracle: textbook bisection, one char at a time
        from tile_grid_spark.functions.cells import GEOHASH_B32

        lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
        out, even, v, nb = [], True, 0, 0
        while len(out) < precision:
            if even:
                mid = (lo_lon + hi_lon) / 2
                if lon >= mid:
                    v = v * 2 + 1
                    lo_lon = mid
                else:
                    v *= 2
                    hi_lon = mid
            else:
                mid = (lo_lat + hi_lat) / 2
                if lat >= mid:
                    v = v * 2 + 1
                    lo_lat = mid
                else:
                    v *= 2
                    hi_lat = mid
            even = not even
            nb += 1
            if nb == 5:
                out.append(GEOHASH_B32[v])
                v, nb = 0, 0
        return "".join(out)

    def test_wikipedia_golden(self):
        from tile_grid_spark.functions.cells import geohash_encode

        assert geohash_encode([10.40744], [57.64911], 11)[0] == "u4pruydqqvj"
        assert geohash_encode([-5.6], [42.6], 5)[0] == "ezs42"

    def test_matches_bisection_oracle(self):
        import numpy as np

        from tile_grid_spark.functions.cells import geohash_encode

        rng = np.random.default_rng(21)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        for p in (1, 5, 9, 12):
            got = geohash_encode(lon, lat, p)
            for i in range(len(lon)):
                assert got[i] == self._scalar_bisect(lon[i], lat[i], p), (
                    lon[i], lat[i], p,
                )

    def test_decode_roundtrip_contains_point(self):
        import numpy as np

        from tile_grid_spark.functions.cells import (
            geohash_decode_bbox,
            geohash_encode,
        )

        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 50)
        lat = rng.uniform(-90, 90, 50)
        for g, lo, la in zip(geohash_encode(lon, lat, 8), lon, lat):
            minx, miny, maxx, maxy = geohash_decode_bbox(g)
            assert minx <= lo < maxx and miny <= la < maxy

    def test_decode_cols_match_scalar_bbox(self, spark):
        import numpy as np

        from tile_grid_spark.functions.cells import (
            geohash_bounds_cols,
            geohash_code_col,
            geohash_decode_bbox,
            geohash_encode,
        )
        from pyspark.sql import functions as F

        rng = np.random.default_rng(33)
        lon = rng.uniform(-180, 180, 120)
        lat = rng.uniform(-90, 90, 120)
        df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
            "id INT, lon DOUBLE, lat DOUBLE",
        )
        p = 6
        coded = df.withColumn("gh_code", geohash_code_col("lon", "lat", p))
        out = coded.withColumns(geohash_bounds_cols("gh_code", p)).collect()
        strs = geohash_encode(lon, lat, p)
        for r in out:
            minx, miny, maxx, maxy = geohash_decode_bbox(strs[r.id])
            assert abs(r.gh_minlon - minx) < 1e-9 and abs(r.gh_maxlon - maxx) < 1e-9
            assert abs(r.gh_minlat - miny) < 1e-9 and abs(r.gh_maxlat - maxy) < 1e-9
            assert r.gh_minlon <= lon[r.id] < r.gh_maxlon
            assert r.gh_minlat <= lat[r.id] < r.gh_maxlat

    def test_neighbors_cols_vs_python_oracle(self, spark):
        import numpy as np

        from tile_grid_spark.functions.cells import (
            geohash_code_col,
            geohash_encode,
            geohash_neighbors_exploded,
            geohash_str_from_code,
        )
        from pyspark.sql import functions as F

        p = 4
        nbits = 5 * p
        nb_lon, nb_lat = (nbits + 1) // 2, nbits // 2
        w, h = 360.0 / (1 << nb_lon), 180.0 / (1 << nb_lat)
        # seam + pole + interior cases
        pts = [(179.99, 10.0), (-179.99, -10.0), (0.5, 89.99), (0.5, -89.99), (12.3, 45.6)]
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pts)], "id INT, lon DOUBLE, lat DOUBLE"
        )
        coded = df.withColumn("gh_code", geohash_code_col("lon", "lat", p))
        got = (
            geohash_neighbors_exploded(coded, "gh_code", p)
            .withColumn("ngh", geohash_str_from_code(F.col("neighbor_code"), p))
            .select("id", "ngh")
            .collect()
        )
        by_id = {}
        for r in got:
            by_id.setdefault(r.id, set()).add(r.ngh)
        for i, (lo, la) in enumerate(pts):
            qlon = min(max(int((lo + 180.0) / 360.0 * (1 << nb_lon)), 0), (1 << nb_lon) - 1)
            qlat = min(max(int((la + 90.0) / 180.0 * (1 << nb_lat)), 0), (1 << nb_lat) - 1)
            exp = set()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    nx = (qlon + dx) % (1 << nb_lon)  # lon wraps
                    ny = qlat + dy
                    if not 0 <= ny < (1 << nb_lat):
                        continue  # lat clamps
                    cx = (nx + 0.5) * w - 180.0
                    cy = (ny + 0.5) * h - 90.0
                    exp.add(geohash_encode([cx], [cy], p)[0])
            assert by_id[i] == exp, (i, pts[i])
            # pole rows lose a rank (5 neighbors), interior rows have 8
            assert len(by_id[i]) == (5 if abs(la) > 89.9 else 8)

    def test_spark_udf(self, spark):
        from tile_grid_spark.functions.cells import geohash_udf

        df = spark.createDataFrame(
            [(10.40744, 57.64911), (0.0, 0.0)], "lon DOUBLE, lat DOUBLE"
        )
        got = [r.g for r in df.select(geohash_udf(7)("lon", "lat").alias("g")).collect()]
        assert got[0] == "u4pruyd"
        assert len(got[1]) == 7

    def test_native_columns_match_numpy(self, spark):
        import numpy as np

        from tile_grid_spark.functions.cells import (
            geohash_code_col,
            geohash_encode,
            geohash_str_from_code,
        )
        from pyspark.sql import functions as F

        rng = np.random.default_rng(9)
        lon = rng.uniform(-180, 180, 400)
        lat = rng.uniform(-90, 90, 400)
        df = spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))],
            "id INT, lon DOUBLE, lat DOUBLE",
        )
        for p in (1, 5, 9):
            got = {
                r.id: r.g
                for r in df.withColumn("c", geohash_code_col("lon", "lat", p))
                .select("id", geohash_str_from_code(F.col("c"), p).alias("g"))
                .collect()
            }
            want = geohash_encode(lon, lat, p)
            assert [got[i] for i in range(len(lon))] == list(want), p


class TestGeohashCover:
    def test_cover_contains_all_member_points_and_only_touching_cells(self, spark):
        from tile_grid_spark.functions.cells import (
            geohash_cover_exploded,
            geohash_decode_bbox,
            geohash_encode,
            geohash_str_from_code,
        )

        rects = [(0, -10.3, -5.2, 7.9, 3.4), (1, 120.0, 40.0, 139.9, 55.1),
                 (2, -180.0, -90.0, -170.0, -85.0), (3, 178.0, 60.0, 180.0, 62.0)]
        df = spark.createDataFrame(
            rects, "rid INT, minx DOUBLE, miny DOUBLE, maxx DOUBLE, maxy DOUBLE"
        )
        cov = geohash_cover_exploded(df, precision=3)
        got = {}
        for r in cov.select(
            "rid", geohash_str_from_code(F.col("gh_code"), 3).alias("gh")
        ).collect():
            got.setdefault(r.rid, set()).add(r.gh)

        rng = np.random.default_rng(9)
        for rid, w, s, e, n in rects:
            # completeness: interior points' geohash is in the cover
            lons = rng.uniform(w + 1e-6, e - 1e-6, 300)
            lats = rng.uniform(s + 1e-6, n - 1e-6, 300)
            ghs = set(geohash_encode(lons, lats, 3).tolist())
            assert ghs <= got[rid], (rid, sorted(ghs - got[rid]))
            # soundness: every covered cell's bbox intersects the rect
            for gh in got[rid]:
                clo, cla, chi, cha = geohash_decode_bbox(gh)
                assert chi >= w and clo <= e and cha >= s and cla <= n, (rid, gh)

    def test_inverted_bbox_does_not_descend(self, spark):
        from tile_grid_spark.functions.cells import geohash_cover_exploded

        df = spark.createDataFrame(
            [(0, 10.0, 10.0, -10.0, -10.0)],
            "rid INT, minx DOUBLE, miny DOUBLE, maxx DOUBLE, maxy DOUBLE",
        )
        # malformed (inverted) bbox still enumerates the swapped range
        # instead of feeding sequence() a descending pair
        n = geohash_cover_exploded(df, precision=2).count()
        assert n > 0

"""Golden-value tests ported from the reference test suite.

Every assertion cites its reference location. Exact `==` is used wherever
the reference asserts equality on f64; rounded comparison only where the
reference rounds (round-to-7).
"""

import math

import pytest

from tile_grid_spark.core import (
    BoundingBox,
    Crs,
    Extent,
    ExtentInt,
    Grid,
    PointOutsideBounds,
    TransformationUnsupported,
    Xyz,
    extent_wgs84_to_merc,
    grid_iterator,
    lonlat_to_merc,
    lookup,
    merc_tile_ul,
    meters_per_unit,
    round_to_prec,
    tms,
)


def rp(v, p=7):
    return round_to_prec(v, p)


# ---------------------------------------------------------------------------
# Registry (tests/tiles.rs:10-20, tests/tms.rs:166-170)
# ---------------------------------------------------------------------------

class TestRegistry:
    def test_default_grids(self):
        assert len(tms().list()) == 3  # non-proj build registers 3

    def test_invalid_tms(self):
        with pytest.raises(Exception):
            tms().get("ANotValidName")
        with pytest.raises(Exception):
            tms().lookup("ANotValidName")


# ---------------------------------------------------------------------------
# TMS properties (tests/tiles.rs:76-84, tests/tms.rs:90-95)
# ---------------------------------------------------------------------------

class TestProperties:
    def test_tms_properties(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.crs().to_urn() == "urn:ogc:def:crs:EPSG:0:3857"
        assert meters_per_unit(t.crs()) == 1.0
        assert t.minzoom == 0
        assert t.maxzoom == 24

    def test_matrix_count(self):
        assert len(tms().lookup("WebMercatorQuad").matrices()) == 25

    def test_mercator_tms_roundtrip(self):
        # The parsed definition serializes back with identical values
        t = tms().get("WebMercatorQuad")
        d = t.to_json_dict()
        assert d["id"] == "WebMercatorQuad"
        assert d["crs"] == "http://www.opengis.net/def/crs/EPSG/0/3857"
        m0 = d["tileMatrices"][0]
        assert m0["scaleDenominator"] == 559082264.028717
        assert m0["cellSize"] == 156543.033928041
        assert m0["pointOfOrigin"] == [-20037508.3427892, 20037508.3427892]
        m24 = d["tileMatrices"][24]
        assert m24["scaleDenominator"] == 33.3238997476528
        assert m24["matrixWidth"] == 16777216


# ---------------------------------------------------------------------------
# zoom_for_res (tests/tms.rs:38-88)
# ---------------------------------------------------------------------------

class TestZoomForRes:
    def test_strategies(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.zoom_for_res(612.0, None, "auto", None) == 8
        assert t.zoom_for_res(612.0, None, "lower", None) == 7
        assert t.zoom_for_res(612.0, None, "upper", None) == 8
        assert t.zoom_for_res(610.0, None, "auto", None) == 8
        assert t.zoom_for_res(0.0001, None, "auto", None) == 24
        assert t.zoom_for_res(0.0001, 25, "auto", None) == 24


# ---------------------------------------------------------------------------
# Tile coordinates (tests/tiles.rs:87-97, tests/tms.rs:173-214)
# ---------------------------------------------------------------------------

class TestTileCoordinates:
    def test_tile_coordinates(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.tile(-179.0, 85.0, 5) == Xyz(0, 0, 5)
        assert t.tile(20.0, 15.0, 5) == Xyz(17, 14, 5)

    def test_morecantile_examples(self):
        t = tms().lookup("WebMercatorQuad")
        b = t.xy_bounds(Xyz(10, 10, 4))
        assert b == BoundingBox(
            5009377.085697308, -7514065.628545959, 7514065.628545959, -5009377.085697308
        )
        b = t.bounds(Xyz(10, 10, 4))
        assert b == BoundingBox(45.0, -55.77657301866769, 67.5, -40.97989806962013)
        assert t.tile(159.31, -42.0, 4) == Xyz(15, 10, 4)
        assert t.xy_tile(17734308.1, -5160979.4, 4) == Xyz(15, 10, 4)

    def test_bounds_rounded(self):
        # tests/tiles.rs:100-112
        t = tms().lookup("WebMercatorQuad")
        expected = [-9.140625, 53.12040528310657, -8.7890625, 53.33087298301705]
        b = t.bounds(Xyz(486, 332, 10))
        for a, bb in zip(expected, [b.left, b.bottom, b.right, b.top]):
            assert abs(rp(a - bb)) == 0.0

    def test_xy_bounds_rounded(self):
        # tests/tiles.rs:114-131
        t = tms().lookup("WebMercatorQuad")
        expected = [-1017529.7205322663, 7005300.768279833, -978393.962050256, 7044436.526761846]
        b = t.xy_bounds(Xyz(486, 332, 10))
        for a, bb in zip(expected, [b.left, b.bottom, b.right, b.top]):
            assert abs(rp(a - bb)) == 0.0

    def test_ul_tile(self):
        # tests/tiles.rs:133-141, 198-208
        t = tms().lookup("WebMercatorQuad")
        xy = t.ul(Xyz(486, 332, 10))
        expected = [-9.140625, 53.33087298301705]
        for a, b in zip(expected, [xy.x, xy.y]):
            assert rp(a - b) == 0.0

    def test_projul_tile(self):
        # tests/tiles.rs:148-157
        t = tms().lookup("WebMercatorQuad")
        xy = t.xy_ul(Xyz(486, 332, 10))
        expected = [-1017529.7205322663, 7044436.526761846]
        for a, b in zip(expected, [xy.x, xy.y]):
            assert abs(rp(a - b)) == 0.0

    def test_xy_tile_roundtrip(self):
        # tests/tiles.rs:225-235
        t = tms().lookup("WebMercatorQuad")
        ul = t.ul(Xyz(486, 332, 10))
        xy = t.xy(ul.x, ul.y)
        expected = [-1017529.7205322663, 7044436.526761846]
        for a, b in zip(expected, [xy.x, xy.y]):
            assert abs(a - b) < 1e-7

    def test_xy_null_island(self):
        t = tms().lookup("WebMercatorQuad")
        xy = t.xy(0.0, 0.0)
        assert abs(xy.x) < 1e-7 and abs(xy.y) < 1e-7

    def test_xy_south_pole_ieee(self):
        # Rust ln() is IEEE (no panic): ln(tan(0)) = ln(0) = -inf at
        # lat=-90, ln(<0) = NaN below it; xy_tile maps non-finite y to
        # row 0 (tms.rs:506-515 infinite check + NaN-saturating cast).
        # Python math.log raises instead — the engine must reproduce
        # the IEEE results, not crash.
        import math

        t = tms().lookup("WebMercatorQuad")
        assert t.xy(8.5, -90.0).y == float("-inf")
        assert math.isnan(t.xy(8.5, -91.0).y)
        assert t.tile(8.5417, -90.0, 5).y == 0
        assert t.tile(8.5417, 90.0, 5).y == 0  # y >> origin -> floor < 0 -> clamp 0

    def test_xy_truncate(self):
        # tests/tiles.rs:259-267 (engine supports this without proj)
        t = tms().lookup("WebMercatorQuad")
        assert t.xy_truncated(-181.0, 0.0) == t.xy(t.bbox().left, 0.0)

    def test_point_outside_bounds(self):
        t = tms().lookup("WebMercatorQuad")
        with pytest.raises(PointOutsideBounds):
            t.lnglat(-30000000.0, 0.0)


# ---------------------------------------------------------------------------
# Tile cover (tests/tiles.rs:301-351 — proj-gated in the reference; the
# engine's closed-form inverse Mercator supports it natively)
# ---------------------------------------------------------------------------

class TestTiles:
    def test_tiles_bbox(self):
        t = tms().lookup("WebMercatorQuad")
        got = list(t.tiles(-105.0, 39.99, -104.99, 40.0, [14], False))
        assert got == [Xyz(3413, 6202, 14), Xyz(3413, 6203, 14)]

    def test_tiles_truncate(self):
        t = tms().lookup("WebMercatorQuad")
        assert list(t.tiles(-181.0, 0.0, -170.0, 10.0, [2], True)) == list(
            t.tiles(-180.0, 0.0, -170.0, 10.0, [2], False)
        )

    def test_tiles_world_z0(self):
        t = tms().lookup("WebMercatorQuad")
        assert list(t.tiles(-180.0, -90.0, 180.0, 90.0, [0], False)) == [Xyz(0, 0, 0)]

    def test_tiles_antimeridian(self):
        t = tms().lookup("WebMercatorQuad")
        assert len(list(t.tiles(175.0, 5.0, -175.0, 10.0, [2], False))) == 2


# ---------------------------------------------------------------------------
# Extended zoom (tests/tiles.rs:369-408): reference behavior self-consistency
# ---------------------------------------------------------------------------

class TestExtendZoom:
    def test_extend_zoom_degenerate(self):
        # WebMercatorQuad sd ratio rounds (Rust round) to 0 -> factor inf ->
        # extended matrices have sd=0 and width=U64_MAX; xy_bounds collapses
        # to the origin. This mirrors the as-built reference exactly.
        t = tms().lookup("WebMercatorQuad")
        m25 = t.matrix(25)
        assert m25.scale_denominator == 0.0
        assert m25.matrix_width == 2**64 - 1
        b = t.xy_bounds(Xyz(1000, 1000, 25))
        origin = t.matrix_z(0).point_of_origin
        assert (b.left, b.top) == (origin[0], origin[1])
        assert (b.right, b.bottom) == (origin[0], origin[1])

    def test_extend_zoom_unit_ratio(self):
        # The WGS1984Quad definition (registered under its internal id
        # WorldCRS84Quad, like the reference) has consecutive ratio exactly
        # 0.5 -> Rust round -> 1 -> factor 1.0 -> extension repeats the
        # last matrix under a new id.
        t = tms().lookup("WorldCRS84Quad")
        last = t.matrices()[-1]
        m = t.matrix(int(last.id) + 2)
        assert m.scale_denominator == last.scale_denominator
        assert m.matrix_width == last.matrix_width


# ---------------------------------------------------------------------------
# Parent / children (tests/tiles.rs:440-492)
# ---------------------------------------------------------------------------

class TestRelatives:
    def test_parent_multi(self):
        t = tms().lookup("WebMercatorQuad")
        parent = t.parent(Xyz(486, 332, 10), 8)
        assert parent[0] == Xyz(121, 83, 8)

    def test_children(self):
        t = tms().lookup("WebMercatorQuad")
        x, y, z = 243, 166, 9
        ch = t.children(Xyz(x, y, z))
        assert len(ch) == 4
        for c in [
            Xyz(2 * x, 2 * y, z + 1),
            Xyz(2 * x + 1, 2 * y, z + 1),
            Xyz(2 * x + 1, 2 * y + 1, z + 1),
            Xyz(2 * x, 2 * y + 1, z + 1),
        ]:
            assert c in ch

    def test_children_multi(self):
        t = tms().lookup("WebMercatorQuad")
        ch = t.children(Xyz(243, 166, 9), 11)
        assert len(ch) == 16
        for xx in range(972, 976):
            for yy in range(664, 668):
                assert Xyz(xx, yy, 11) in ch

    def test_neighbors(self):
        t = tms().lookup("WebMercatorQuad")
        n = t.neighbors(Xyz(0, 0, 2))
        assert sorted((a.x, a.y) for a in n) == [(0, 1), (1, 0), (1, 1)]
        n = t.neighbors(Xyz(2, 2, 3))
        assert len(n) == 8

    def test_is_valid(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.is_valid(Xyz(0, 0, 0))
        assert not t.is_valid(Xyz(1, 0, 0))
        assert t.is_valid(Xyz(3, 3, 2))
        assert not t.is_valid(Xyz(4, 3, 2))


# ---------------------------------------------------------------------------
# Quadkeys (tests/quadkey.rs)
# ---------------------------------------------------------------------------

class TestQuadkey:
    def test_quadkey_support(self):
        cases = [
            ("WorldMercatorWGS84Quad", True),
            ("WorldCRS84Quad", False),
            ("WebMercatorQuad", True),
            ("EuropeanETRS89_LAEAQuad", True),
            ("CanadianNAD83_LCC", False),
            ("UPSArcticWGS84Quad", True),
            ("UTM31WGS84Quad", False),
            ("UPSAntarcticWGS84Quad", True),
        ]
        for name, expected in cases:
            assert lookup(name, extended=True).is_quadtree == expected, name

    def test_quadkey(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.quadkey(Xyz(486, 332, 10)) == "0313102310"

    def test_quadkey_to_tile(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.quadkey_to_tile("0313102310") == Xyz(486, 332, 10)

    def test_empty_quadkey_to_tile(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.quadkey_to_tile("") == Xyz(0, 0, 0)

    def test_quadkey_vectorized(self):
        t = tms().lookup("WebMercatorQuad")
        import numpy as np

        qk = t.quadkey_arrays(
            np.array([486, 0, 1]), np.array([332, 0, 1]), np.array([10, 1, 1])
        )
        assert list(qk) == ["0313102310", "0", "3"]


# ---------------------------------------------------------------------------
# XyzIterator order (src/tms_iterator.rs:84-160)
# ---------------------------------------------------------------------------

class TestXyzIterator:
    def test_mercator_iter(self):
        t = tms().lookup("WebMercatorQuad")
        cells = list(t.xyz_iterator(t.xy_bbox(), 0, 2))
        assert cells[:5] == [Xyz(0, 0, 0), Xyz(0, 0, 1), Xyz(0, 1, 1), Xyz(1, 0, 1), Xyz(1, 1, 1)]
        assert len(cells) == 21
        assert cells[5:] == [Xyz(x, y, 2) for x in range(4) for y in range(4)]

        cells = list(t.xyz_iterator(t.xy_bbox(), 1, 2))
        assert len(cells) == 20
        assert cells[0] == Xyz(0, 0, 1)

        assert list(t.xyz_iterator(t.xy_bbox(), 0, 0)) == [Xyz(0, 0, 0)]

    def test_invalid_iters(self):
        t = tms().lookup("WebMercatorQuad")
        assert list(t.xyz_iterator(t.xy_bbox(), 3, 2)) == []
        assert len(list(t.xyz_iterator(t.xy_bbox(), 2, 3))) == 80


# ---------------------------------------------------------------------------
# Legacy WMTS grid (src/wmts/grid_test.rs)
# ---------------------------------------------------------------------------

class TestLegacyGrid:
    def test_bbox(self):
        g = Grid.web_mercator()
        assert g.tile_extent(0, 0, 0) == Extent(
            -20037508.342789248, -20037508.342789248, 20037508.342789248, 20037508.342789248
        )
        assert g.tile_extent_xyz(486, 332, 10) == Extent(
            -1017529.7205322683, 7005300.768279836, -978393.9620502554, 7044436.526761845
        )
        assert g.tile_extent(486, 691, 10) == Extent(
            -1017529.7205322683, 7005300.768279836, -978393.9620502554, 7044436.526761845
        )
        assert g.tile_extent(32, 42, 6) == Extent(
            0.0, 6261721.357121639, 626172.1357121654, 6887893.492833804
        )
        # u32::MAX overflow -> saturating flip
        assert g.tile_extent_xyz(486, 2**32 - 1, 10) == Extent(
            -1017529.7205322683, -20037508.342789248, -978393.9620502554, -19998372.58430724
        )
        assert g.tile_extent_xyz(1073, 717, 11) == Extent(
            958826.0828092508, 5987771.047747567, 978393.9620502554, 6007338.926988572
        )
        assert Grid.wgs84().tile_extent(0, 0, 0) == Extent(-180.0, -90.0, 0.0, 90.0)

    def test_resolutions(self):
        g = Grid.web_mercator()
        assert [g.pixel_width(z) for z in range(23)] == [
            156543.0339280410 / math.exp2(z) for z in range(23)
        ]

    def test_grid_calculations(self):
        g = Grid.web_mercator()
        assert g.pixel_width(10) == 152.87405657035254
        assert g.scale_denominator(10) == 545978.7734655448
        assert g.level_limit(0) == (1, 1)
        assert g.level_limit(10) == (1024, 1024)

        limits = g.tile_limits(g.tile_extent(0, 0, 0), 0)
        assert limits[0] == ExtentInt(0, 0, 1, 1)
        assert limits[10] == ExtentInt(0, 0, 1024, 1024)

        limits = g.tile_limits(
            Extent(-1017529.7205322683, 7005300.768279828, -978393.9620502591, 7044436.526761841),
            0,
        )
        assert limits[0] == ExtentInt(0, 0, 1, 1)
        assert limits[10] == ExtentInt(486, 691, 487, 692)

        extent = g.tile_extent(133, 165, 8)
        assert extent == g.tile_extent_xyz(133, 90, 8)
        assert extent == Extent(
            782715.1696402058, 5792092.255337518, 939258.2035682462, 5948635.289265558
        )
        limits = g.tile_limits(extent, 0)
        assert limits[8] == ExtentInt(133, 165, 134, 166)

    def test_wgs84_grid(self):
        g = Grid.wgs84()
        assert g.pixel_width(10) == 76.43702828517625
        assert g.scale_denominator(10) == 272989.38673277234

    def test_projected_extent(self):
        e = extent_wgs84_to_merc(Extent(4.0, 52.0, 5.0, 53.0))
        assert e == Extent(
            445277.96317309426, 6800125.454397307, 556597.4539663679, 6982997.920389788
        )
        x, y = lonlat_to_merc(4.0, 52.0)
        assert (float(x), float(y)) == (e.minx, e.miny)


# ---------------------------------------------------------------------------
# Legacy grid iterator (src/wmts/grid_iterator.rs:74-197)
# ---------------------------------------------------------------------------

class TestGridIterator:
    def test_mercator_iter(self):
        g = Grid.web_mercator()
        limits = g.tile_limits(g.extent, 0)
        cells = list(grid_iterator(0, 2, limits))
        assert cells == (
            [(0, 0, 0)]
            + [(1, x, y) for x in range(2) for y in range(2)]
            + [(2, x, y) for x in range(4) for y in range(4)]
        )
        cells = list(grid_iterator(1, 2, limits))
        assert len(cells) == 20
        assert list(grid_iterator(0, 0, limits)) == [(0, 0, 0)]

    def test_bad_params(self):
        g = Grid.web_mercator()
        assert list(grid_iterator(0, 10, [])) == []
        limits = g.tile_limits(g.extent, 0)
        assert list(grid_iterator(3, 2, limits)) == []
        two = [ExtentInt(0, 0, 1, 1), ExtentInt(0, 0, 2, 2)]
        assert list(grid_iterator(0, 2, two)) == [
            (0, 0, 0), (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)
        ]
        assert list(grid_iterator(1, 2, [ExtentInt(0, 0, 1, 1)])) == []


# ---------------------------------------------------------------------------
# Web-mercator formula goldens (src/wmts/grid_test.rs:228-360)
# ---------------------------------------------------------------------------

class TestWebMercatorFormulas:
    def test_ul(self):
        lon, lat = merc_tile_ul(486.0, 332.0, 10)
        assert (float(lon), float(lat)) == (-9.140625, 53.33087298301705)
        lon, lat = merc_tile_ul(32.0, 42.0, 6)
        assert (float(lon), float(lat)) == (0.0, -48.92249926375824)

    def test_xy(self):
        x, y = lonlat_to_merc(0.0, 0.0)
        assert (float(x), float(y)) == (0.0, -0.0000000007081154551613622)
        lon, lat = merc_tile_ul(486.0, 332.0, 10)
        x, y = lonlat_to_merc(float(lon), float(lat))
        assert (float(x), float(y)) == (-1017529.7205322663, 7044436.526761846)
        lon, lat = merc_tile_ul(32.0, 42.0, 6)
        x, y = lonlat_to_merc(float(lon), float(lat))
        assert (float(x), float(y)) == (0.0, -6261721.357121639)


# ---------------------------------------------------------------------------
# LV95 custom grid (tests/tms.rs:675-1100 + src/wmts/mod.rs:36-63)
# ---------------------------------------------------------------------------

LV95_RESOLUTIONS = [
    4000.0, 3750.0, 3500.0, 3250.0, 3000.0, 2750.0, 2500.0, 2250.0, 2000.0, 1750.0,
    1500.0, 1250.0, 1000.0, 750.0, 650.0, 500.0, 250.0, 100.0, 50.0, 20.0, 10.0,
    5.0, 2.5, 2.0, 1.5, 1.0, 0.5,
]


class TestLV95:
    def make(self):
        from tile_grid_spark.core import Tms

        return Tms.custom_resolutions(
            [2420000.0, 1030000.0, 2900000.0, 1350000.0],
            Crs.from_epsg(2056),
            256,
            256,
            Crs.from_epsg(2056),
            LV95_RESOLUTIONS,
            "LV95/CH1903+",
            "LV95",
            ["E", "N"],
            Crs.default(),
        )

    def test_json_goldens(self):
        t = self.make()
        d = t.tms.to_json_dict()
        assert d["title"] == "LV95/CH1903+"
        assert d["id"] == "LV95"
        assert d["crs"] == "http://www.opengis.net/def/crs/EPSG/0/2056"
        assert d["orderedAxes"] == ["E", "N"]
        assert d["boundingBox"]["lowerLeft"] == [2420000.0, 1030000.0]
        assert d["boundingBox"]["upperRight"] == [2900000.0, 1350000.0]
        ms = d["tileMatrices"]
        assert len(ms) == 27
        assert ms[0]["scaleDenominator"] == 14285714.285714287
        assert ms[0]["cellSize"] == 4000.0
        assert ms[0]["pointOfOrigin"] == [2420000.0, 1350000.0]
        assert ms[0]["matrixWidth"] == 1 and ms[0]["matrixHeight"] == 1
        assert ms[1]["scaleDenominator"] == 13392857.142857144
        assert ms[2]["scaleDenominator"] == 12500000.000000002
        assert ms[3]["scaleDenominator"] == 11607142.857142858
        assert ms[4]["scaleDenominator"] == 10714285.714285715
        assert ms[26]["matrixWidth"] == 3750 and ms[26]["matrixHeight"] == 2500

    def test_xy_bounds_lake_zurich(self):
        t = self.make()
        b = t.xy_bounds(Xyz(10, 4, 17))
        assert b == BoundingBox(2676000.0, 1222000.0, 2701600.0, 1247600.0)

    def test_bounds_unsupported_transform(self):
        t = self.make()
        with pytest.raises(TransformationUnsupported) as ei:
            t.bounds(Xyz(10, 4, 17))
        assert str(ei.value) == (
            'Unsupported transformation from `Crs { authority: EPSG, version: "0", '
            'code: "2056" }` to `Crs { authority: OGC, version: "1.3", code: "CRS84" }`'
        )

    def test_legacy_lv95_doc_example(self):
        # src/wmts/mod.rs:36-63
        from tile_grid_spark.core import Origin, Unit

        g = Grid(
            256, 256,
            Extent(2420000.0, 1030000.0, 2900000.0, 1350000.0),
            2056, Unit.Meters, LV95_RESOLUTIONS, Origin.TopLeft,
        )
        assert g.tile_extent(0, 0, 15) == Extent(2420000.0, 1222000.0, 2548000.0, 1350000.0)

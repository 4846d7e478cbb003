"""Error-surface tests + hypothesis property tests for the core grid math."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tile_grid_spark.core import (
    BoundingBox,
    Crs,
    InvalidZoom,
    InvalidZoomId,
    NonZeroError,
    TileMatrix,
    TileMatrixSet,
    TileMatrixSets,
    Tms,
    TmsAlreadyRegistered,
    Xyz,
    load_definition,
    tms,
)


class TestErrorSurface:
    def test_registry_duplicate(self):
        reg = TileMatrixSets()
        d = load_definition("WebMercatorQuad")
        reg.register([d])
        with pytest.raises(TmsAlreadyRegistered):
            reg.register([d])
        reg.register([d], overwrite=True)  # no raise

    def test_invalid_zoom_id(self):
        d = load_definition("WebMercatorQuad")
        bad = TileMatrixSet(
            id="bad",
            crs=d.crs,
            tile_matrices=[
                TileMatrix(
                    id="not-a-number",
                    scale_denominator=1.0,
                    cell_size=1.0,
                    point_of_origin=(0.0, 0.0),
                    tile_width=256,
                    tile_height=256,
                    matrix_width=1,
                    matrix_height=1,
                )
            ],
        )
        with pytest.raises(InvalidZoomId):
            Tms(bad)

    def test_nonzero_error(self):
        with pytest.raises(NonZeroError):
            TileMatrix(
                id="0", scale_denominator=1.0, cell_size=1.0, point_of_origin=(0, 0),
                tile_width=0, tile_height=256, matrix_width=1, matrix_height=1,
            )

    def test_parent_invalid_zoom(self):
        t = tms().lookup("WebMercatorQuad")
        with pytest.raises(InvalidZoom):
            t.parent(Xyz(1, 1, 3), 5)  # target zoom above tile zoom
        with pytest.raises(InvalidZoom):
            t.children(Xyz(1, 1, 3), 2)  # target zoom below tile zoom

    def test_intersect_tms(self):
        t = tms().lookup("WebMercatorQuad")
        assert t.intersect_tms(BoundingBox(0.0, 0.0, 1000.0, 1000.0))
        assert not t.intersect_tms(
            BoundingBox(30e6, 30e6, 40e6, 40e6)
        )  # fully outside

    def test_custom_constructor_resolutions(self):
        # Tms.custom derives resolutions res(z) = max(w,h)/(tile*ms)/2^z
        # (tms.rs:169-211); the z0 matrix must cover the extent in one tile
        t = Tms.custom(
            [-20037508.342789244, -20037508.342789244, 20037508.342789244, 20037508.342789244],
            Crs.from_epsg(3857),
            minzoom=0,
            maxzoom=4,
        )
        assert t.maxzoom == 4
        m0 = t.matrix_z(0)
        assert m0.matrix_width == 1 and m0.matrix_height == 1
        # resolution halves per zoom
        r = [t.resolution(t.matrix_z(z)) for z in range(5)]
        for a, b in zip(r, r[1:]):
            assert abs(a / b - 2.0) < 1e-12


WM = tms().lookup("WebMercatorQuad")


class TestProperties:
    @given(
        x=st.integers(min_value=0, max_value=2**20 - 1),
        y=st.integers(min_value=0, max_value=2**20 - 1),
        z=st.just(20),
    )
    @settings(max_examples=200, deadline=None)
    def test_quadkey_roundtrip(self, x, y, z):
        assert WM.quadkey_to_tile(WM.quadkey(Xyz(x, y, z))) == Xyz(x, y, z)

    @given(
        z=st.integers(min_value=1, max_value=18),
        data=st.data(),
    )
    @settings(max_examples=150, deadline=None)
    def test_cover_of_own_bounds_is_self(self, z, data):
        # the LL_EPSILON inset exists exactly so that tiles(bounds(t), z)
        # yields t alone (tms.rs:703-705)
        x = data.draw(st.integers(min_value=0, max_value=2**z - 1))
        y = data.draw(st.integers(min_value=0, max_value=2**z - 1))
        b = WM.bounds(Xyz(x, y, z))
        cover = list(WM.tiles(b.left, b.bottom, b.right, b.top, [z], False))
        assert cover == [Xyz(x, y, z)]

    @given(
        z=st.integers(min_value=1, max_value=20),
        data=st.data(),
    )
    @settings(max_examples=150, deadline=None)
    def test_parent_child_consistency(self, z, data):
        x = data.draw(st.integers(min_value=0, max_value=2**z - 1))
        y = data.draw(st.integers(min_value=0, max_value=2**z - 1))
        t = Xyz(x, y, z)
        parents = WM.parent(t)
        assert len(parents) == 1
        p = parents[0]
        assert p == Xyz(x >> 1, y >> 1, z - 1)
        assert t in WM.children(p)

    @given(
        lon=st.floats(min_value=-179.99, max_value=179.99),
        lat=st.floats(min_value=-85.0, max_value=85.0),
        z=st.integers(min_value=0, max_value=22),
    )
    @settings(max_examples=200, deadline=None)
    def test_point_in_own_tile_bounds(self, lon, lat, z):
        t = WM.tile(lon, lat, z)
        b = WM.xy_bounds(t)
        from tile_grid_spark.core import lonlat_to_merc

        x, y = lonlat_to_merc(lon, lat)
        assert b.left - 1e-6 <= float(x) <= b.right + 1e-6
        assert b.bottom - 1e-6 <= float(y) <= b.top + 1e-6

    @given(
        lon=st.floats(min_value=-179.9, max_value=179.9),
        lat=st.floats(min_value=-84.9, max_value=84.9),
    )
    @settings(max_examples=200, deadline=None)
    def test_mercator_roundtrip(self, lon, lat):
        from tile_grid_spark.core import lonlat_to_merc, merc_to_lonlat

        x, y = lonlat_to_merc(lon, lat)
        lon2, lat2 = merc_to_lonlat(float(x), float(y))
        assert math.isclose(float(lon2), lon, abs_tol=1e-9)
        assert math.isclose(float(lat2), lat, abs_tol=1e-9)

    @given(
        z=st.integers(min_value=0, max_value=10),
        data=st.data(),
    )
    @settings(max_examples=100, deadline=None)
    def test_vectorized_equals_scalar(self, z, data):
        n = 20
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        lon = rng.uniform(-179.9, 179.9, n)
        lat = rng.uniform(-84.9, 84.9, n)
        xt, yt = WM.tile_arrays(lon, lat, z)
        for i in range(n):
            s = WM.tile(float(lon[i]), float(lat[i]), z)
            assert (xt[i], yt[i]) == (s.x, s.y)

"""Generic-CRS (ProjTransformer) seam — reference src/transform/proj.rs.

Three states exercised:
- default/featureless: unsupported pairs raise the reference-golden
  TransformationUnsupported (LV95 bounds golden lives in
  test_core_goldens.TestLV95).
- seam wiring without pyproj: a stub factory installed via
  set_fallback_factory flows through Tms construction and bounds() —
  proves the dispatch, not the projection math.
- real pyproj (importorskip — absent in-sandbox, runs in production
  environments): enable_pyproj() makes LV95 bounds() return real WGS84
  coordinates.
"""

import numpy as np
import pytest

from tile_grid_spark.core import Crs, Tms, TransformationUnsupported, Xyz
from tile_grid_spark.core.transform import set_fallback_factory

LV95_RESOLUTIONS = [
    4000.0, 3750.0, 3500.0, 3250.0, 3000.0, 2750.0, 2500.0, 2250.0, 2000.0,
    1750.0, 1500.0, 1250.0, 1000.0, 750.0, 650.0, 500.0, 250.0, 100.0, 50.0,
    20.0, 10.0, 5.0, 2.5, 2.0, 1.5, 1.0, 0.5,
]


def _lv95():
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


@pytest.fixture()
def clean_factory():
    set_fallback_factory(None)
    yield
    set_fallback_factory(None)


class _StubTransformer:
    """Duck-typed generic transformer: a fake affine LV95->'geographic'
    map, good enough to prove the dispatch path end to end."""

    def __init__(self, from_crs, to_crs):
        self.from_crs = from_crs
        self.to_crs = to_crs

    def transform(self, x, y):
        return (
            np.asarray(x, dtype=np.float64) * 1e-5,
            np.asarray(y, dtype=np.float64) * 1e-5,
        )

    def transform_bounds(self, left, bottom, right, top):
        minx, miny = self.transform(left, bottom)
        maxx, maxy = self.transform(right, top)
        return float(minx), float(miny), float(maxx), float(maxy)


class TestSeamWiring:
    def test_default_state_raises_reference_message(self, clean_factory):
        t = _lv95()
        with pytest.raises(TransformationUnsupported, match="2056"):
            t.bounds(Xyz(10, 4, 17))

    def test_stub_factory_flows_through_tms(self, clean_factory):
        set_fallback_factory(lambda f, t: _StubTransformer(f, t))
        t = _lv95()  # construct AFTER enabling: transformers bind at init
        assert t.to_geographic is not None
        b = t.bounds(Xyz(10, 4, 17))
        # xy_bounds golden (test_core_goldens): (2676000, 1222000,
        # 2701600, 1247600) — the stub scales by 1e-5
        assert (b.left, b.bottom, b.right, b.top) == (
            pytest.approx(26.76), pytest.approx(12.22),
            pytest.approx(27.016), pytest.approx(12.476),
        )

    def test_factory_cleared_restores_featureless(self, clean_factory):
        set_fallback_factory(lambda f, t: _StubTransformer(f, t))
        assert _lv95().to_geographic is not None
        set_fallback_factory(None)
        assert _lv95().to_geographic is None

    def test_enable_pyproj_absent_raises_hint(self, clean_factory):
        try:
            import pyproj  # noqa: F401

            pytest.skip("pyproj installed — covered by TestRealPyproj")
        except ImportError:
            pass
        from tile_grid_spark.core.proj import enable_pyproj

        with pytest.raises(ImportError, match="pip install pyproj"):
            enable_pyproj()


class TestRealPyproj:
    def test_lv95_bounds_real_coordinates(self, clean_factory):
        """Runs only where pyproj exists (production clusters)."""
        pytest.importorskip("pyproj")
        from tile_grid_spark.core.proj import disable_pyproj, enable_pyproj

        enable_pyproj()
        try:
            t = _lv95()
            b = t.bounds(Xyz(10, 4, 17))
            # tile (10,4,17) covers the Lake Zurich area: lon ~8.5, lat ~47
            assert 8.0 < b.left < 9.0 and 46.5 < b.bottom < 47.5
            assert b.left < b.right and b.bottom < b.top
        finally:
            disable_pyproj()

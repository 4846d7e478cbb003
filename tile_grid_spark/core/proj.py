"""Generic-CRS transforms via pyproj — the ProjTransformer seam.

Reference parity (src/transform/proj.rs:7-26): with the `projtransform`
feature the reference swaps its BasicTransformer for a proj-backed one
and every CRS pair becomes constructible; without it, non-basic pairs
error. The engine mirrors both builds:

- default (no pyproj, the sandbox state): core.transform raises
  TransformationUnsupported with the reference's exact message — LV95
  `bounds()` raising is tested against the reference golden.
- `enable_pyproj()` (production, optional dependency): installs
  :class:`ProjTransformer` as the fallback factory in the SAME
  Transformer.from_crs dispatch, so Tms.bounds/tile/transformed_bbox on
  any proj-known CRS (LV95/EPSG:2056, UTM zones, ...) work with zero
  call-site changes. pyproj is not installable in-sandbox; the
  with-pyproj tests are importorskip-gated and run wherever the package
  exists (tests/test_proj_seam.py exercises both states).

Scalar results stay np.float64 like the basic transformer; array inputs
vectorize through pyproj's C path.
"""

from __future__ import annotations

import numpy as np

from .model import Crs
from .transform import set_fallback_factory


def _crs_string(crs: Crs) -> str:
    """pyproj authority string: 'EPSG:2056', 'OGC:CRS84', ..."""
    return f"{crs.authority}:{crs.code}"


class ProjTransformer:
    """pyproj-backed transformer with the engine Transformer's duck type
    (transform, transform_bounds, from_crs/to_crs attrs)."""

    def __init__(self, from_crs: Crs, to_crs: Crs):
        try:
            from pyproj import Transformer as _PT
        except ImportError as e:
            raise ImportError(
                "ProjTransformer requires the 'pyproj' package (pip install "
                "pyproj); without it the engine matches the reference's "
                "non-projtransform build (basic 4326/3857/3395 pairs only)"
            ) from e
        self.from_crs = from_crs
        self.to_crs = to_crs
        self._t = _PT.from_crs(
            _crs_string(from_crs), _crs_string(to_crs), always_xy=True
        )

    def transform(self, x, y):
        rx, ry = self._t.transform(x, y)
        if np.ndim(rx) == 0:
            return np.float64(rx), np.float64(ry)
        return np.asarray(rx, dtype=np.float64), np.asarray(ry, dtype=np.float64)

    def transform_bounds(self, left, bottom, right, top):
        # pyproj densifies edges — exact for non-monotonic CRS pairs,
        # where the basic transformer's corner-wise min/max would not be
        l, b, r, t = self._t.transform_bounds(left, bottom, right, top)
        return float(l), float(b), float(r), float(t)


def enable_pyproj() -> None:
    """Install the generic-CRS fallback (raises ImportError with the
    install hint if pyproj is absent — checked eagerly so a misconfigured
    cluster fails at setup, not mid-job)."""
    try:
        import pyproj  # noqa: F401  (eager presence check)
    except ImportError as e:
        raise ImportError(
            "enable_pyproj requires the 'pyproj' package (pip install "
            "pyproj); without it the engine matches the reference's "
            "non-projtransform build (basic 4326/3857/3395 pairs only)"
        ) from e
    set_fallback_factory(lambda f, t: ProjTransformer(f, t))


def disable_pyproj() -> None:
    """Restore the reference's featureless-build behavior."""
    set_fallback_factory(None)

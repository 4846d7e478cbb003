"""Core data model: coordinate/tile value types, CRS handle, errors.

Semantics derived from the reference library pka/tile-grid:
- BoundingBox/Coords/Xyz: /root/reference/src/tile.rs:5-60
- MinMax: /root/reference/src/tms.rs:1064-1070
- error surface: /root/reference/src/tms.rs:27-48, src/registry.rs:15-23,
  src/transform/mod.rs:28-34

This is a brand-new Python implementation for a PySpark engine, not a port
of the Rust execution model: these types are driver-side configuration and
test scaffolding; on executors the same quantities travel as flat DataFrame
columns (tile_x/tile_y/zoom BIGINT/INT, minx..maxy DOUBLE).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

U64_MAX = 2**64 - 1
U32_MAX = 2**32 - 1

# Earth semi-major axis used throughout the reference (WGS84 / spherical
# Mercator), /root/reference/src/tms.rs:1100.
SEMI_MAJOR_METRE = 6378137.0

# Resolution <-> scaleDenominator conversion pixel size (OGC SE standardized
# rendering pixel), /root/reference/src/tms.rs:370, src/wmts/grid.rs:199.
STANDARDIZED_PIXEL = 0.28e-3

# Epsilon used by geographic tile-cover enumeration,
# /root/reference/src/tms.rs:1118.
LL_EPSILON = 1e-11

# Default precision of the point-in-bbox pre-check,
# /root/reference/src/tms.rs:1120.
DEFAULT_BBOX_PREC = 5


class TmsError(Exception):
    """Base error for tile-matrix-set operations."""


class InvalidZoomId(TmsError):
    def __init__(self, zoom_id: str):
        super().__init__(f"Invalid tile zoom identifier: `{zoom_id}`")


class InvalidZoom(TmsError):
    def __init__(self, zoom: int):
        super().__init__(f"Invalid zoom level: `{zoom}`")


class PointOutsideBounds(TmsError):
    def __init__(self, x: float, y: float, bbox: "BoundingBox"):
        super().__init__(f"Point ({x}, {y}) is outside bounds {bbox!r}")


class NonZeroError(TmsError):
    def __init__(self):
        super().__init__("Zero width or height")


class TransformationUnsupported(TmsError):
    """Mirrors transform::Error::TransformationUnsupported message shape
    (/root/reference/src/transform/mod.rs:30-31, asserted verbatim by the
    reference LV95 test, tests/tms.rs:1095-1098)."""

    def __init__(self, from_crs: "Crs", to_crs: "Crs"):
        super().__init__(
            f"Unsupported transformation from `{from_crs.rust_debug()}` "
            f"to `{to_crs.rust_debug()}`"
        )


class RegistryError(Exception):
    pass


class TmsNotFound(RegistryError):
    def __init__(self, tms_id: str):
        super().__init__(f"Tile Matrix set not found: `{tms_id}`")


class TmsAlreadyRegistered(RegistryError):
    def __init__(self, tms_id: str):
        super().__init__(f"`{tms_id}` is already a registered TMS")


class QuadKeyError(TmsError):
    pass


def rust_round(v: float) -> float:
    """f64::round — round half AWAY FROM ZERO (not banker's).

    Python's round() is half-to-even, so round(0.5) == 0 there; the
    reference relies on away-from-zero (e.g. matrix extension factor at
    /root/reference/src/tms.rs:322 for ratios that land exactly on 0.5).
    """
    if math.isnan(v) or math.isinf(v):
        return v
    return math.copysign(math.floor(abs(v) + 0.5), v)


def f64_as_u64(v: float) -> int:
    """Rust `as u64` saturating float->int cast (NaN -> 0)."""
    if math.isnan(v):
        return 0
    if v <= 0.0:
        return 0
    if v >= 2.0**64:
        return U64_MAX
    return int(v)


def f64_as_u32(v: float) -> int:
    if math.isnan(v):
        return 0
    if v <= 0.0:
        return 0
    if v >= 2.0**32:
        return U32_MAX
    return int(v)


def f64_as_i32(v: float) -> int:
    if math.isnan(v):
        return 0
    if v <= -(2.0**31):
        return -(2**31)
    if v >= 2.0**31:
        return 2**31 - 1
    return int(v)


def round_to_prec(number: float, precision: int) -> float:
    """(number * 10^p).round() / 10^p with away-from-zero rounding,
    /root/reference/src/tms.rs:1124-1127."""
    factor = 10.0**precision
    return rust_round(number * factor) / factor


@dataclass(frozen=True)
class Coords:
    x: float
    y: float


@dataclass(frozen=True)
class Xyz:
    x: int
    y: int
    z: int


@dataclass(frozen=True)
class BoundingBox:
    left: float
    bottom: float
    right: float
    top: float

    def __repr__(self) -> str:  # mirrors Rust Debug for error-message parity
        return (
            f"BoundingBox {{ left: {self.left}, bottom: {self.bottom}, "
            f"right: {self.right}, top: {self.top} }}"
        )


@dataclass(frozen=True)
class MinMax:
    x_min: int
    x_max: int
    y_min: int
    y_max: int


@dataclass(frozen=True)
class Crs:
    """Minimal CRS handle: authority + version + code (URI round-trip)."""

    authority: str = "OGC"
    version: str = "1.3"
    code: str = "CRS84"

    @staticmethod
    def from_uri(uri: str) -> "Crs":
        # e.g. http://www.opengis.net/def/crs/EPSG/0/3857
        parts = uri.rstrip("/").split("/")
        return Crs(authority=parts[-3], version=parts[-2], code=parts[-1])

    @staticmethod
    def from_epsg(code: int) -> "Crs":
        return Crs(authority="EPSG", version="0", code=str(code))

    @staticmethod
    def default() -> "Crs":
        """WGS84 geographic (OGC CRS84), the reference default geographic CRS."""
        return Crs()

    def to_uri(self) -> str:
        return f"http://www.opengis.net/def/crs/{self.authority}/{self.version}/{self.code}"

    def to_urn(self) -> str:
        return f"urn:ogc:def:crs:{self.authority}:{self.version}:{self.code}"

    def as_srid(self) -> int:
        if self.authority == "OGC" and self.code == "CRS84":
            return 4326
        try:
            return int(self.code)
        except ValueError:
            return 0

    def rust_debug(self) -> str:
        return (
            f'Crs {{ authority: {self.authority}, version: "{self.version}", '
            f'code: "{self.code}" }}'
        )


def meters_per_unit(crs: Crs) -> float:
    """metersPerUnit coefficient, /root/reference/src/tms.rs:1099-1116.

    The reference resolves the unit from SRID==4326 -> degree else metre
    (its own FIXME shortcut); we match that exactly, including CRS84->4326.
    """
    unit_name = "degree" if crs.as_srid() == 4326 else "metre"
    if unit_name == "metre":
        return 1.0
    if unit_name == "degree":
        return 2.0 * math.pi * SEMI_MAJOR_METRE / 360.0
    if unit_name == "foot":
        return 0.3048
    if unit_name == "US survey foot":
        return 0.30480060960121924
    raise TmsError(f"CRS {crs!r} with Unit Name `{unit_name}` is not supported")


def point_in_bbox(point: Coords, bbox: BoundingBox, precision: int = DEFAULT_BBOX_PREC) -> None:
    """Inclusive containment after rounding both operands,
    /root/reference/src/tms.rs:1123-1137. Raises PointOutsideBounds."""
    inside = (
        round_to_prec(point.x, precision) >= round_to_prec(bbox.left, precision)
        and round_to_prec(point.x, precision) <= round_to_prec(bbox.right, precision)
        and round_to_prec(point.y, precision) >= round_to_prec(bbox.bottom, precision)
        and round_to_prec(point.y, precision) <= round_to_prec(bbox.top, precision)
    )
    if not inside:
        raise PointOutsideBounds(point.x, point.y, bbox)


def bbox_to_feature(west: float, south: float, east: float, north: float) -> dict:
    """GeoJSON Polygon ring for a bbox, /root/reference/src/tile.rs:63-70."""
    return {
        "type": "Polygon",
        "coordinates": [
            [[west, south], [west, north], [east, north], [east, south], [west, south]]
        ],
    }

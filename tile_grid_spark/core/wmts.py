"""Legacy WMTS grid (v2 API): explicit-resolution grids + iterator.

Semantics: /root/reference/src/wmts/grid.rs and grid_iterator.rs. This is
the "custom grid (LV95/CH1903+)" surface named in the north star. All math
is numpy-vectorizable; per-zoom constants (resolutions, level_max) are
precomputed at construction, as the reference does (grid.rs:176-179).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from enum import Enum
from typing import Iterator, Sequence

import numpy as np

from .model import SEMI_MAJOR_METRE, f64_as_i32, f64_as_u32
from .transform import lonlat_to_merc


@dataclass(frozen=True)
class Extent:
    minx: float
    miny: float
    maxx: float
    maxy: float


@dataclass(frozen=True)
class ExtentInt:
    minx: int
    miny: int
    maxx: int
    maxy: int


class Origin(str, Enum):
    TopLeft = "TopLeft"
    BottomLeft = "BottomLeft"


class Unit(str, Enum):
    Meters = "Meters"
    Degrees = "Degrees"
    Feet = "Feet"


# 18 hard-coded WGS84 resolutions 0.703125 / 2^z, grid.rs:91-110
_WGS84_RESOLUTIONS = [0.703125 / 2.0**z for z in range(18)]

# 23 WebMercator resolutions from PIXEL_WIDTH_Z0 rounded to 10 digits
# (deliberate rounding, grid.rs:129-131 / grid_test.rs:95-98)
_PIXEL_WIDTH_Z0 = 156543.0339280410
_WEB_MERCATOR_RESOLUTIONS = [_PIXEL_WIDTH_Z0 / math.exp2(z) for z in range(23)]

_WEB_MERCATOR_EXTENT = Extent(
    -20037508.3427892480, -20037508.3427892480, 20037508.3427892480, 20037508.3427892480
)


class Grid:
    """Legacy tile grid parameterized by explicit resolution list."""

    def __init__(
        self,
        width: int,
        height: int,
        extent: Extent,
        srid: int,
        units: Unit,
        resolutions: Sequence[float],
        origin: Origin,
    ):
        self.width = int(width)
        self.height = int(height)
        self.extent = extent
        self.srid = int(srid)
        self.units = units
        self.resolutions = [float(r) for r in resolutions]
        self.origin = origin
        self.level_max_list = [self.level_limit(z) for z in range(self.nlevels())]

    @staticmethod
    def wgs84() -> "Grid":
        """grid.rs:79-113: 256px, (-180,-90,180,90), SRID 4326, BottomLeft."""
        return Grid(
            256, 256, Extent(-180.0, -90.0, 180.0, 90.0), 4326, Unit.Degrees,
            _WGS84_RESOLUTIONS, Origin.BottomLeft,
        )

    @staticmethod
    def web_mercator() -> "Grid":
        """grid.rs:117-157: Google-maps-compatible grid, BottomLeft."""
        return Grid(
            256, 256, _WEB_MERCATOR_EXTENT, 3857, Unit.Meters,
            _WEB_MERCATOR_RESOLUTIONS, Origin.BottomLeft,
        )

    def nlevels(self) -> int:
        return len(self.resolutions)

    def maxzoom(self) -> int:
        return self.nlevels() - 1

    def pixel_width(self, zoom: int) -> float:
        """grid.rs:188-195."""
        meters_per_degree = SEMI_MAJOR_METRE * 2.0 * math.pi / 360.0
        r = self.resolutions[zoom]
        if self.units == Unit.Meters:
            return r
        if self.units == Unit.Degrees:
            return r * meters_per_degree
        return r * 0.3048

    def scale_denominator(self, zoom: int) -> float:
        """grid.rs:197-201 (0.00028 m standardized pixel)."""
        return self.pixel_width(zoom) / 0.00028

    def tile_extent_arrays(self, xtile, ytile, zoom: int):
        """Vectorized tile extent in TMS addressing, grid.rs:203-222.

        Returns (minx, miny, maxx, maxy) float64 arrays.
        """
        res = self.resolutions[zoom]
        x = np.asarray(xtile, dtype=np.float64)
        y = np.asarray(ytile, dtype=np.float64)
        tsx, tsy = float(self.width), float(self.height)
        if self.origin == Origin.BottomLeft:
            minx = self.extent.minx + res * x * tsx
            miny = self.extent.miny + res * y * tsy
            maxx = self.extent.minx + res * (x + 1.0) * tsx
            maxy = self.extent.miny + res * (y + 1.0) * tsy
        else:
            minx = self.extent.minx + res * x * tsx
            miny = self.extent.maxy - res * (y + 1.0) * tsy
            maxx = self.extent.minx + res * (x + 1.0) * tsx
            maxy = self.extent.maxy - res * y * tsy
        return minx, miny, maxx, maxy

    def tile_extent(self, xtile: int, ytile: int, zoom: int) -> Extent:
        minx, miny, maxx, maxy = self.tile_extent_arrays(
            float(xtile), float(ytile), zoom
        )
        return Extent(float(minx), float(miny), float(maxx), float(maxy))

    def ytile_from_xyz(self, ytile: int, zoom: int) -> int:
        """XYZ->TMS row flip with u32-saturating subtraction, grid.rs:224-229."""
        maxy = self.level_max_list[zoom][1]
        return max(max(maxy - ytile, 0) - 1, 0)

    def ytile_from_xyz_arrays(self, ytile, zoom: int):
        maxy = np.int64(self.level_max_list[zoom][1])
        y = np.asarray(ytile, dtype=np.int64)
        return np.maximum(np.maximum(maxy - y, 0) - 1, 0)

    def tile_extent_xyz(self, xtile: int, ytile: int, zoom: int) -> Extent:
        """grid.rs:231-234."""
        return self.tile_extent(xtile, self.ytile_from_xyz(ytile, zoom), zoom)

    def level_limit(self, zoom: int) -> tuple[int, int]:
        """(maxx, maxy) tile counts with the 1%-of-tile shrink, grid.rs:236-246."""
        res = self.resolutions[zoom]
        unitheight = float(self.height) * res
        unitwidth = float(self.width) * res
        maxy = f64_as_u32(
            math.ceil((self.extent.maxy - self.extent.miny - 0.01 * unitheight) / unitheight)
        )
        maxx = f64_as_u32(
            math.ceil((self.extent.maxx - self.extent.minx - 0.01 * unitwidth) / unitwidth)
        )
        return (maxx, maxy)

    def level_max(self) -> list[tuple[int, int]]:
        return list(self.level_max_list)

    def tile_limits(self, extent: Extent, tolerance: int) -> list[ExtentInt]:
        """Per-zoom covering limits (EXCLUSIVE maxx/maxy), grid.rs:254-309.

        EPSILON=1e-7 inward nudge; clamped to [0, level_max]; mapcache
        `mapcache_grid_compute_limits` semantics.
        """
        EPSILON = 0.0000001
        out = []
        for i in range(self.nlevels()):
            res = self.resolutions[i]
            unitheight = float(self.height) * res
            unitwidth = float(self.width) * res
            level_maxx, level_maxy = self.level_max_list[i]

            minx = f64_as_i32(math.floor((extent.minx - self.extent.minx) / unitwidth + EPSILON)) - tolerance
            maxx = f64_as_i32(math.ceil((extent.maxx - self.extent.minx) / unitwidth - EPSILON)) + tolerance
            if self.origin == Origin.BottomLeft:
                miny = f64_as_i32(math.floor((extent.miny - self.extent.miny) / unitheight + EPSILON)) - tolerance
                maxy = f64_as_i32(math.ceil((extent.maxy - self.extent.miny) / unitheight - EPSILON)) + tolerance
            else:
                miny = f64_as_i32(math.floor((self.extent.maxy - extent.maxy) / unitheight + EPSILON)) - tolerance
                maxy = f64_as_i32(math.ceil((self.extent.maxy - extent.miny) / unitheight - EPSILON)) + tolerance

            minx = max(minx, 0)
            maxx = min(maxx, level_maxx)
            miny = max(miny, 0)
            maxy = min(maxy, level_maxy)
            out.append(ExtentInt(minx=minx, miny=miny, maxx=maxx, maxy=maxy))
        return out


def grid_iterator(minz: int, maxz: int, limits: Sequence[ExtentInt]) -> Iterator[tuple[int, int, int]]:
    """(z, x, y) enumeration with EXCLUSIVE maxx/maxy limits,
    /root/reference/src/wmts/grid_iterator.rs:11-72. y fastest; empty on
    minz>maxz or minz >= len(limits); maxz clamped to len(limits)-1."""
    if minz > maxz or len(limits) <= minz:
        return
    maxz = min(maxz, len(limits) - 1)
    for z in range(minz, maxz + 1):
        lim = limits[z]
        for x in range(lim.minx, lim.maxx):
            for y in range(lim.miny, lim.maxy):
                yield (z, x, y)


def extent_wgs84_to_merc(extent: Extent) -> Extent:
    """Corner-wise projection, grid.rs:313-322."""
    minx, miny = lonlat_to_merc(extent.minx, extent.miny)
    maxx, maxy = lonlat_to_merc(extent.maxx, extent.maxy)
    return Extent(float(minx), float(miny), float(maxx), float(maxy))

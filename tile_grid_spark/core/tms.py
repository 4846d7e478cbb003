"""TileMatrixSet runtime (v2 API): per-zoom grid parameters + tile math.

Re-derives the semantics of the reference Tms (/root/reference/src/tms.rs)
as driver-side configuration plus numpy-vectorized math. Every formula keeps
the reference's exact IEEE-754 expression tree, epsilons and clamping:

- resolution(z) = scale_denominator * 0.28e-3 / meters_per_unit  (tms.rs:369-371)
- xy_tile floor/clamp semantics incl. +-inf -> 0, clamp to matrix_width
  (NOT width-1)                                                   (tms.rs:490-535)
- matrix extension beyond maxzoom with Rust round()/saturating-cast
  semantics                                                       (tms.rs:313-362)
- tile cover epsilon insets: LL_EPSILON=1e-11 geographic, res/10 CRS-space
  (tms.rs:736-737, 796-798, 1001-1005)

Heavy per-row work in the engine does NOT go through this class row-by-row:
the same formulas are emitted as native Spark Column expressions
(tile_grid_spark.functions.grid_cols) with constants precomputed here and
inlined as literals, or as Arrow-vectorized pandas UDFs calling the numpy
batch methods below.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from .model import (
    LL_EPSILON,
    U64_MAX,
    BoundingBox,
    Coords,
    Crs,
    InvalidZoom,
    InvalidZoomId,
    MinMax,
    NonZeroError,
    QuadKeyError,
    TransformationUnsupported,
    Xyz,
    f64_as_u64,
    meters_per_unit,
    point_in_bbox,
    rust_round,
)
from .transform import Transformer, merc_tile_ul


@dataclass
class TileMatrix:
    """One zoom level of a TMS (OGC 17-083r4 tileMatrix)."""

    id: str
    scale_denominator: float
    cell_size: float
    point_of_origin: tuple[float, float]
    tile_width: int
    tile_height: int
    matrix_width: int
    matrix_height: int
    corner_of_origin: Optional[str] = None  # None == "topLeft"
    title: Optional[str] = None

    def __post_init__(self):
        if (
            self.tile_width <= 0
            or self.tile_height <= 0
            or self.matrix_width <= 0
            or self.matrix_height <= 0
        ):
            raise NonZeroError()

    def to_json_dict(self) -> dict:
        d: dict = {"id": self.id}
        d["scaleDenominator"] = self.scale_denominator
        d["cellSize"] = self.cell_size
        if self.corner_of_origin is not None:
            d["cornerOfOrigin"] = self.corner_of_origin
        d["pointOfOrigin"] = list(self.point_of_origin)
        d["tileWidth"] = self.tile_width
        d["tileHeight"] = self.tile_height
        d["matrixWidth"] = self.matrix_width
        d["matrixHeight"] = self.matrix_height
        return d


@dataclass
class TileMatrixSet:
    id: str
    crs: Crs
    tile_matrices: list[TileMatrix]
    title: Optional[str] = None
    uri: Optional[str] = None
    ordered_axes: Optional[list[str]] = None
    well_known_scale_set: Optional[str] = None
    bounding_box: Optional[dict] = None  # {'lowerLeft','upperRight','crs'?,'orderedAxes'?}

    @staticmethod
    def from_json_dict(d: dict) -> "TileMatrixSet":
        matrices = [
            TileMatrix(
                id=m["id"],
                scale_denominator=float(m["scaleDenominator"]),
                cell_size=float(m["cellSize"]),
                point_of_origin=(
                    float(m["pointOfOrigin"][0]),
                    float(m["pointOfOrigin"][1]),
                ),
                tile_width=int(m["tileWidth"]),
                tile_height=int(m["tileHeight"]),
                matrix_width=int(m["matrixWidth"]),
                matrix_height=int(m["matrixHeight"]),
                corner_of_origin=m.get("cornerOfOrigin"),
                title=m.get("title"),
            )
            for m in d["tileMatrices"]
        ]
        return TileMatrixSet(
            id=d["id"],
            crs=Crs.from_uri(d["crs"]) if isinstance(d["crs"], str) else d["crs"],
            tile_matrices=matrices,
            title=d.get("title"),
            uri=d.get("uri"),
            ordered_axes=d.get("orderedAxes"),
            well_known_scale_set=d.get("wellKnownScaleSet"),
            bounding_box=d.get("boundingBox"),
        )

    def to_json_dict(self) -> dict:
        d: dict = {}
        if self.title is not None:
            d["title"] = self.title
        d["id"] = self.id
        if self.uri is not None:
            d["uri"] = self.uri
        d["crs"] = self.crs.to_uri()
        if self.ordered_axes is not None:
            d["orderedAxes"] = self.ordered_axes
        if self.well_known_scale_set is not None:
            d["wellKnownScaleSet"] = self.well_known_scale_set
        if self.bounding_box is not None:
            d["boundingBox"] = self.bounding_box
        d["tileMatrices"] = [m.to_json_dict() for m in self.tile_matrices]
        return d

    def crs_axis_inverted(self) -> bool:
        """Inverted iff first ordered axis in {Y, LAT, N} upper-cased,
        /root/reference/src/tile_matrix_set.rs:29-44."""
        if self.ordered_axes:
            return ordered_axes_inverted(self.ordered_axes)
        return False


def ordered_axes_inverted(axes: Sequence[str]) -> bool:
    return first_axes_inverted(axes[0].upper())


def first_axes_inverted(first: str) -> bool:
    return first in ("Y", "LAT", "N")


def check_quadkey_support(matrices: list[TileMatrix]) -> bool:
    """/root/reference/src/quadkey.rs:5-16."""

    def is_power_of_two(n: int) -> bool:
        return n & max(n - 1, 0) == 0 and n != 0

    return all(
        m.matrix_width == m.matrix_height
        and is_power_of_two(m.matrix_width)
        and m.matrix_width * 2 == matrices[i + 1].matrix_width
        for i, m in enumerate(matrices[: len(matrices) - 1])
    )


@dataclass(frozen=True)
class ZoomParams:
    """Resolved per-zoom constants shipped to executors (broadcast dict or
    inlined literals in Column expressions)."""

    zoom: int
    resolution: float
    origin_x: float
    origin_y: float
    tile_width: int
    tile_height: int
    matrix_width: int
    matrix_height: int


class Tms:
    """A TileMatrixSet with runtime state (transformers, quadtree flag)."""

    def __init__(self, tms: TileMatrixSet, geographic_crs: Optional[Crs] = None):
        # init semantics: /root/reference/src/tms.rs:81-105
        self.is_quadtree = check_quadkey_support(tms.tile_matrices)
        self.data_crs = tms.crs
        self.geographic_crs = geographic_crs or Crs.default()
        try:
            self.to_geographic: Optional[Transformer] = Transformer.from_crs(
                self.data_crs, self.geographic_crs
            )
        except TransformationUnsupported:
            self.to_geographic = None
        try:
            self.from_geographic: Optional[Transformer] = Transformer.from_crs(
                self.geographic_crs, self.data_crs
            )
        except TransformationUnsupported:
            self.from_geographic = None
        self.tms = _sorted_matrices(tms)
        if self.tms.bounding_box is not None:
            bb_crs = self.tms.bounding_box.get("crs")
            if bb_crs is not None:
                bb_crs = Crs.from_uri(bb_crs) if isinstance(bb_crs, str) else bb_crs
                if bb_crs != self.tms.crs:
                    Transformer.from_crs(bb_crs, self.tms.crs)  # raises if unsupported

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @staticmethod
    def custom(
        extent: Sequence[float],
        crs: Crs,
        tile_width: int = 256,
        tile_height: int = 256,
        matrix_scale: Optional[Sequence[int]] = None,
        extent_crs: Optional[Crs] = None,
        minzoom: int = 0,
        maxzoom: int = 24,
        title: str = "Custom TileMatrixSet",
        id: str = "Custom",
        ordered_axes: Optional[list[str]] = None,
        geographic_crs: Optional[Crs] = None,
    ) -> "Tms":
        """Custom TMS from extent+CRS, /root/reference/src/tms.rs:169-211."""
        matrix_scale = list(matrix_scale) if matrix_scale is not None else [1, 1]
        bbox = _transformed_bbox(extent, crs, extent_crs)
        width = abs(bbox.right - bbox.left)
        height = abs(bbox.top - bbox.bottom)
        resolutions = [
            max(
                width / (tile_width * float(matrix_scale[0])) / float(2**zoom),
                height / (tile_height * float(matrix_scale[1])) / float(2**zoom),
            )
            for zoom in range(minzoom, maxzoom + 1)
        ]
        return Tms.custom_resolutions(
            extent,
            crs,
            tile_width,
            tile_height,
            extent_crs,
            resolutions,
            title,
            id,
            ordered_axes,
            geographic_crs,
        )

    @staticmethod
    def custom_resolutions(
        extent: Sequence[float],
        crs: Crs,
        tile_width: int,
        tile_height: int,
        extent_crs: Optional[Crs],
        resolutions: Sequence[float],
        title: str = "Custom TileMatrixSet",
        id: str = "Custom",
        ordered_axes: Optional[list[str]] = None,
        geographic_crs: Optional[Crs] = None,
    ) -> "Tms":
        """Custom TMS from explicit resolutions, /root/reference/src/tms.rs:215-302.

        Golden output: the LV95/CH1903+ serialized JSON at
        /root/reference/tests/tms.rs:694-1070.
        """
        is_inverted = (
            ordered_axes_inverted(ordered_axes)
            if ordered_axes is not None
            else TileMatrixSet(
                id=id, crs=crs, tile_matrices=[], ordered_axes=None
            ).crs_axis_inverted()
        )

        if is_inverted:
            bounding_box = {
                "lowerLeft": [extent[1], extent[0]],
                "upperRight": [extent[3], extent[2]],
                "crs": (extent_crs or crs).to_uri(),
                "orderedAxes": list(ordered_axes) if ordered_axes else None,
            }
        else:
            bounding_box = {
                "lowerLeft": [extent[0], extent[1]],
                "upperRight": [extent[2], extent[3]],
                "crs": (extent_crs or crs).to_uri(),
                "orderedAxes": list(ordered_axes) if ordered_axes else None,
            }
        if bounding_box.get("orderedAxes") is None:
            bounding_box.pop("orderedAxes", None)

        bbox = _transformed_bbox(extent, crs, extent_crs)
        x_origin = bbox.left if not is_inverted else bbox.top
        y_origin = bbox.top if not is_inverted else bbox.left
        corner_of_origin = None if not is_inverted else "bottomLeft"

        mpu = meters_per_unit(crs)
        matrices: list[TileMatrix] = []
        for zoom, res in enumerate(resolutions):
            unitheight = float(tile_height) * res
            unitwidth = float(tile_width) * res
            maxy = f64_as_u64(math.ceil((bbox.top - bbox.bottom - 0.01 * unitheight) / unitheight))
            maxx = f64_as_u64(math.ceil((bbox.right - bbox.left - 0.01 * unitwidth) / unitwidth))
            matrices.append(
                TileMatrix(
                    id=str(zoom),
                    scale_denominator=res * mpu / 0.00028,
                    cell_size=res,
                    corner_of_origin=corner_of_origin,
                    point_of_origin=(x_origin, y_origin),
                    tile_width=tile_width,
                    tile_height=tile_height,
                    matrix_width=maxx,
                    matrix_height=maxy,
                )
            )

        tms = TileMatrixSet(
            id=id,
            crs=crs,
            tile_matrices=matrices,
            title=title,
            ordered_axes=list(ordered_axes) if ordered_axes else None,
            bounding_box=bounding_box,
        )
        return Tms(tms, geographic_crs=geographic_crs or Crs.default())

    # ------------------------------------------------------------------
    # Matrix lookup / per-zoom parameters
    # ------------------------------------------------------------------

    def matrices(self) -> list[TileMatrix]:
        return self.tms.tile_matrices

    def crs(self) -> Crs:
        return self.tms.crs

    @property
    def minzoom(self) -> int:
        return int(self.tms.tile_matrices[0].id)

    @property
    def maxzoom(self) -> int:
        return int(self.tms.tile_matrices[-1].id)

    def invert_axis(self) -> bool:
        return self.tms.crs_axis_inverted()

    def matrix_z(self, zoom: int) -> Optional[TileMatrix]:
        for m in self.tms.tile_matrices:
            if m.id == str(zoom):
                return m
        return None

    def matrix(self, zoom: int) -> TileMatrix:
        """Lookup with automatic extension beyond maxzoom,
        /root/reference/src/tms.rs:313-362.

        Mirrors the Rust build exactly, including `round()` (half away from
        zero) of the FIRST consecutive scale-denominator ratio and saturating
        float->u64 casts. NB: for TMSs whose sd ratio rounds to 0 (e.g.
        WebMercatorQuad's 0.4999999999999991) this yields factor=inf and a
        degenerate extended matrix (sd=0, width=U64_MAX) — the same values
        the reference produces (its own extension test, tests/tiles.rs:369-408,
        only asserts self-consistency).
        """
        m = self.matrix_z(zoom)
        if m is not None:
            return m

        mats = self.tms.tile_matrices
        ratio0 = rust_round(mats[1].scale_denominator / mats[0].scale_denominator)
        factor = math.inf if ratio0 == 0.0 else 1.0 / ratio0

        tm = mats[-1]
        tid = int(tm.id)
        sd = tm.scale_denominator
        mw, mh = tm.matrix_width, tm.matrix_height
        while tid != zoom:
            tid += 1
            sd = sd / factor
            mw = max(f64_as_u64(rust_round(float(mw) * factor)), 1)
            mh = max(f64_as_u64(rust_round(float(mh) * factor)), 1)
        return TileMatrix(
            id=str(tid),
            scale_denominator=sd,
            cell_size=tm.cell_size,
            corner_of_origin=tm.corner_of_origin,
            point_of_origin=tm.point_of_origin,
            tile_width=tm.tile_width,
            tile_height=tm.tile_height,
            matrix_width=mw,
            matrix_height=mh,
        )

    def resolution(self, matrix: TileMatrix) -> float:
        """/root/reference/src/tms.rs:369-371."""
        return matrix.scale_denominator * 0.28e-3 / meters_per_unit(self.crs())

    def resolution_z(self, zoom: int) -> Optional[float]:
        m = self.matrix_z(zoom)
        return self.resolution(m) if m is not None else None

    def zoom_params(self, zoom: int) -> ZoomParams:
        """Resolved constants for one zoom; what executors actually consume."""
        m = self.matrix(zoom)
        if self.invert_axis():
            ox, oy = m.point_of_origin[1], m.point_of_origin[0]
        else:
            ox, oy = m.point_of_origin[0], m.point_of_origin[1]
        return ZoomParams(
            zoom=zoom,
            resolution=self.resolution(m),
            origin_x=ox,
            origin_y=oy,
            tile_width=m.tile_width,
            tile_height=m.tile_height,
            matrix_width=m.matrix_width,
            matrix_height=m.matrix_height,
        )

    def zoom_for_res(
        self,
        res: float,
        max_z: Optional[int] = None,
        zoom_level_strategy: str = "auto",
        min_z: Optional[int] = None,
    ) -> int:
        """/root/reference/src/tms.rs:392-428. Strategy in {lower, upper, auto}."""
        def fdiv(a: float, b: float) -> float:
            # IEEE-754 division (x/0 -> +-inf, 0/0 -> nan) as Rust f64 does
            if b == 0.0:
                return math.nan if a == 0.0 else math.copysign(math.inf, a) * math.copysign(1.0, b)
            return a / b

        max_z = max_z if max_z is not None else self.maxzoom
        min_z = min_z if min_z is not None else self.minzoom
        zoom_level = min_z
        matrix_res = 0.0
        for z in range(min_z, max_z + 1):
            zoom_level = z
            matrix_res = self.resolution(self.matrix(zoom_level))
            if res > matrix_res or fdiv(abs(res - matrix_res), matrix_res) <= 1e-8:
                break
        if zoom_level > 0 and fdiv(abs(res - matrix_res), matrix_res) > 1e-8:
            s = zoom_level_strategy.lower()
            if s == "lower":
                zoom_level = max(zoom_level - 1, min_z)
            elif s == "upper":
                zoom_level = min(zoom_level, max_z)
            elif s == "auto":
                if fdiv(self.resolution(self.matrix(max(zoom_level - 1, min_z))), res) < fdiv(
                    res, matrix_res
                ):
                    zoom_level = max(zoom_level - 1, min_z)
            else:
                raise ValueError(f"unknown zoom_level_strategy {zoom_level_strategy!r}")
        return zoom_level

    # ------------------------------------------------------------------
    # Point transforms
    # ------------------------------------------------------------------

    def lnglat(self, x: float, y: float, truncate: bool = False) -> Coords:
        """CRS -> geographic, /root/reference/src/tms.rs:431-443."""
        if self.to_geographic is None:
            raise TransformationUnsupported(self.data_crs, self.geographic_crs)
        point_in_bbox(Coords(x, y), self.xy_bbox())
        lng, lat = self.to_geographic.transform(x, y)
        lng, lat = float(lng), float(lat)
        if truncate:
            lng, lat = self.truncate_lnglat(lng, lat)
        return Coords(lng, lat)

    def xy(self, lng: float, lat: float) -> Coords:
        """Geographic -> CRS, /root/reference/src/tms.rs:446-455.

        NB the reference prechecks the *geographic* point against the
        CRS-space bbox (tms.rs:450) — reproduced as-is.
        """
        if self.from_geographic is None:
            raise TransformationUnsupported(self.geographic_crs, self.data_crs)
        point_in_bbox(Coords(lng, lat), self.xy_bbox())
        x, y = self.from_geographic.transform(lng, lat)
        return Coords(float(x), float(y))

    def xy_truncated(self, lng: float, lat: float) -> Coords:
        lng, lat = self.truncate_lnglat(lng, lat)
        return self.xy(lng, lat)

    def truncate_lnglat(self, lng: float, lat: float) -> tuple[float, float]:
        """/root/reference/src/tms.rs:466-483."""
        bbox = self.bbox()
        if lng > bbox.right:
            lng = bbox.right
        elif lng < bbox.left:
            lng = bbox.left
        if lat > bbox.top:
            lat = bbox.top
        elif lat < bbox.bottom:
            lat = bbox.bottom
        return lng, lat

    # ------------------------------------------------------------------
    # Tile assignment (vectorized core)
    # ------------------------------------------------------------------

    def xy_tile_arrays(self, xcoord, ycoord, zoom: int):
        """Vectorized xy_tile, /root/reference/src/tms.rs:490-535.

        Returns (xtile, ytile) int64 arrays. floor((x-ox)/(res*tw));
        +-inf coord -> 0; NaN floor -> 0; negatives -> 0; clamp to
        matrix_width/_height (the reference clamps to width, not width-1).
        """
        p = self.zoom_params(zoom)
        x = np.asarray(xcoord, dtype=np.float64)
        y = np.asarray(ycoord, dtype=np.float64)
        if p.matrix_width >= 2**53 or p.matrix_height >= 2**53:
            raise InvalidZoom(zoom)  # degenerate extended matrix: not vectorizable
        with np.errstate(invalid="ignore", divide="ignore"):
            xt = np.floor((x - p.origin_x) / (p.resolution * float(p.tile_width)))
            yt = np.floor((p.origin_y - y) / (p.resolution * float(p.tile_height)))
        xt = np.where(np.isinf(x), 0.0, xt)
        yt = np.where(np.isinf(y), 0.0, yt)
        xt = np.where(np.isnan(xt), 0.0, xt)
        yt = np.where(np.isnan(yt), 0.0, yt)
        xt = np.clip(xt, 0.0, float(p.matrix_width))
        yt = np.clip(yt, 0.0, float(p.matrix_height))
        return xt.astype(np.int64), yt.astype(np.int64)

    def xy_tile(self, xcoord: float, ycoord: float, zoom: int) -> Xyz:
        p = self.zoom_params(zoom)
        if p.matrix_width >= 2**53 or p.matrix_height >= 2**53:
            # scalar IEEE path, exact for degenerate extended matrices
            # (res may be 0.0 -> inf/NaN division, matching Rust f64 ops)
            with np.errstate(invalid="ignore", divide="ignore"):
                xv = float(
                    np.floor(np.float64(xcoord - p.origin_x) / np.float64(p.resolution * float(p.tile_width)))
                )
                yv = float(
                    np.floor(np.float64(p.origin_y - ycoord) / np.float64(p.resolution * float(p.tile_height)))
                )
            xt = 0.0 if math.isinf(xcoord) else xv
            yt = 0.0 if math.isinf(ycoord) else yv
            return Xyz(
                min(f64_as_u64(xt), p.matrix_width),
                min(f64_as_u64(yt), p.matrix_height),
                zoom,
            )
        xt, yt = self.xy_tile_arrays(xcoord, ycoord, zoom)
        return Xyz(int(xt), int(yt), zoom)

    def tile_arrays(self, lng, lat, zoom: int):
        """Vectorized tile(): geographic -> tile indices (WebMercator-family
        fast path through the closed-form transform). No bbox precheck —
        out-of-range floors clamp exactly as the reference's xy_tile does."""
        if self.from_geographic is None:
            raise TransformationUnsupported(self.geographic_crs, self.data_crs)
        x, y = self.from_geographic.transform(lng, lat)
        return self.xy_tile_arrays(x, y, zoom)

    def tile(self, lng: float, lat: float, zoom: int) -> Xyz:
        """/root/reference/src/tms.rs:542-545 (includes the bbox precheck)."""
        xy = self.xy(lng, lat)
        return self.xy_tile(xy.x, xy.y, zoom)

    def tile_truncated(self, lng: float, lat: float, zoom: int) -> Xyz:
        xy = self.xy_truncated(lng, lat)
        return self.xy_tile(xy.x, xy.y, zoom)

    # ------------------------------------------------------------------
    # Tile -> coordinates
    # ------------------------------------------------------------------

    def xy_ul_arrays(self, x, y, zoom: int):
        """Vectorized upper-left corner in CRS, /root/reference/src/tms.rs:561-580."""
        p = self.zoom_params(zoom)
        xs = np.asarray(x, dtype=np.float64)
        ys = np.asarray(y, dtype=np.float64)
        xcoord = p.origin_x + xs * p.resolution * float(p.tile_width)
        ycoord = p.origin_y - ys * p.resolution * float(p.tile_height)
        return xcoord, ycoord

    def xy_ul(self, tile: Xyz) -> Coords:
        xc, yc = self.xy_ul_arrays(float(tile.x), float(tile.y), tile.z)
        return Coords(float(xc), float(yc))

    def xy_bounds(self, tile: Xyz) -> BoundingBox:
        """/root/reference/src/tms.rs:586-590."""
        tl = self.xy_ul(tile)
        br = self.xy_ul(Xyz(tile.x + 1, tile.y + 1, tile.z))
        return BoundingBox(tl.x, br.y, br.x, tl.y)

    def ul(self, tile: Xyz) -> Coords:
        """Geographic UL with the 3857->4326 fast path,
        /root/reference/src/tms.rs:596-605."""
        if self.data_crs.as_srid() == 3857 and self.geographic_crs.as_srid() == 4326:
            lon, lat = merc_tile_ul(float(tile.x), float(tile.y), tile.z)
            return Coords(float(lon), float(lat))
        xy = self.xy_ul(tile)
        return self.lnglat(xy.x, xy.y, False)

    def bounds(self, tile: Xyz) -> BoundingBox:
        """/root/reference/src/tms.rs:611-620."""
        tl = self.ul(tile)
        br = self.ul(Xyz(tile.x + 1, tile.y + 1, tile.z))
        return BoundingBox(tl.x, br.y, br.x, tl.y)

    # ------------------------------------------------------------------
    # Whole-TMS bounds / predicates
    # ------------------------------------------------------------------

    def xy_bbox(self) -> BoundingBox:
        """/root/reference/src/tms.rs:623-668."""
        bb = self.tms.bounding_box
        if bb is not None:
            ll, ur = bb["lowerLeft"], bb["upperRight"]
            if self.invert_axis():
                left, bottom = ll[1], ll[0]
                right, top = ur[1], ur[0]
            else:
                left, bottom = ll[0], ll[1]
                right, top = ur[0], ur[1]
            bb_crs = bb.get("crs")
            if bb_crs is not None:
                bb_crs = Crs.from_uri(bb_crs) if isinstance(bb_crs, str) else bb_crs
                if bb_crs != self.crs():
                    t = Transformer.from_crs(bb_crs, self.crs())
                    left, bottom, right, top = t.transform_bounds(left, bottom, right, top)
            return BoundingBox(float(left), float(bottom), float(right), float(top))
        zoom = self.minzoom
        m = self.matrix(zoom)
        tl = self.xy_ul(Xyz(0, 0, zoom))
        br = self.xy_ul(Xyz(m.matrix_width, m.matrix_height, zoom))
        return BoundingBox(tl.x, br.y, br.x, tl.y)

    def bbox(self) -> BoundingBox:
        """/root/reference/src/tms.rs:671-683."""
        if self.to_geographic is None:
            raise TransformationUnsupported(self.data_crs, self.geographic_crs)
        xyb = self.xy_bbox()
        left, bottom, right, top = self.to_geographic.transform_bounds(
            xyb.left, xyb.bottom, xyb.right, xyb.top
        )
        return BoundingBox(left, bottom, right, top)

    def intersect_tms(self, bbox: BoundingBox) -> bool:
        """Open-interval overlap, /root/reference/src/tms.rs:686-692."""
        t = self.xy_bbox()
        return (
            bbox.left < t.right
            and bbox.right > t.left
            and bbox.top > t.bottom
            and bbox.bottom < t.top
        )

    def minmax(self, zoom: int) -> MinMax:
        m = self.matrix(zoom)
        return MinMax(0, max(m.matrix_width - 1, 0), 0, max(m.matrix_height - 1, 0))

    def is_valid(self, tile: Xyz) -> bool:
        """/root/reference/src/tms.rs:929-939."""
        if tile.z < self.minzoom:
            return False
        e = self.minmax(tile.z)
        return e.x_min <= tile.x <= e.x_max and e.y_min <= tile.y <= e.y_max

    # ------------------------------------------------------------------
    # Relatives / enumeration
    # ------------------------------------------------------------------

    def neighbors(self, tile: Xyz) -> list[Xyz]:
        """Up to 8 valid adjacent tiles, /root/reference/src/tms.rs:951-971."""
        e = self.minmax(tile.z)
        out = []
        for x in range(max(tile.x - 1, 0), min(tile.x + 1, U64_MAX) + 1):
            for y in range(max(tile.y - 1, 0), min(tile.y + 1, U64_MAX) + 1):
                if (x == tile.x and y == tile.y) or x < e.x_min or y < e.y_min or x > e.x_max or y > e.y_max:
                    continue
                out.append(Xyz(x, y, tile.z))
        return out

    def parent(self, tile: Xyz, zoom: Optional[int] = None) -> list[Xyz]:
        """/root/reference/src/tms.rs:982-1015."""
        if tile.z == self.minzoom:
            return []
        if zoom is not None:
            if tile.z <= zoom:
                raise InvalidZoom(zoom)
        elif tile.z == 0:
            raise InvalidZoom(0)
        target_zoom = zoom if zoom is not None else tile.z - 1
        res = self.resolution(self.matrix(tile.z)) / 10.0
        bbox = self.xy_bounds(tile)
        ul_tile = self.xy_tile(bbox.left + res, bbox.top - res, target_zoom)
        lr_tile = self.xy_tile(bbox.right - res, bbox.bottom + res, target_zoom)
        return [
            Xyz(i, j, target_zoom)
            for i in range(ul_tile.x, lr_tile.x + 1)
            for j in range(ul_tile.y, lr_tile.y + 1)
        ]

    def children(self, tile: Xyz, zoom: Optional[int] = None) -> list[Xyz]:
        """/root/reference/src/tms.rs:1025-1053."""
        if zoom is not None and tile.z > zoom:
            raise InvalidZoom(zoom)
        target_zoom = zoom if zoom is not None else tile.z + 1
        bbox = self.xy_bounds(tile)
        res = self.resolution(self.matrix(tile.z)) / 10.0
        ul_tile = self.xy_tile(bbox.left + res, bbox.top - res, target_zoom)
        lr_tile = self.xy_tile(bbox.right - res, bbox.bottom + res, target_zoom)
        return [
            Xyz(i, j, target_zoom)
            for i in range(ul_tile.x, lr_tile.x + 1)
            for j in range(ul_tile.y, lr_tile.y + 1)
        ]

    def tiles(
        self,
        west: float,
        south: float,
        east: float,
        north: float,
        zooms: Sequence[int],
        truncate: bool = False,
    ) -> Iterator[Xyz]:
        """Tile cover of a geographic bbox (antimeridian-aware),
        /root/reference/src/tms.rs:706-746. x-major, y-minor order."""
        bbox = self.bbox()
        if west > east:
            bboxes = [(bbox.left, south, east, north), (west, south, bbox.right, north)]
        else:
            bboxes = [(west, south, east, north)]
        get_tile = self.tile_truncated if truncate else self.tile
        for bb in bboxes:
            w = max(bb[0], bbox.left)
            s = max(bb[1], bbox.bottom)
            e = min(bb[2], bbox.right)
            n = min(bb[3], bbox.top)
            for z in zooms:
                ul_tile = get_tile(w + LL_EPSILON, n - LL_EPSILON, z)
                lr_tile = get_tile(e - LL_EPSILON, s + LL_EPSILON, z)
                for i in range(ul_tile.x, lr_tile.x + 1):
                    for j in range(ul_tile.y, lr_tile.y + 1):
                        yield Xyz(i, j, z)

    def extent_limits(
        self, extent: BoundingBox, minzoom: int, maxzoom: int, truncate: bool = False
    ) -> list[MinMax]:
        """Per-zoom MinMax of a geographic extent, /root/reference/src/tms.rs:749-782."""
        if extent.left > extent.right or minzoom > maxzoom:
            return []
        bbox = self.bbox()
        get_tile = self.tile_truncated if truncate else self.tile
        w = max(extent.left, bbox.left)
        s = max(extent.bottom, bbox.bottom)
        e = min(extent.right, bbox.right)
        n = min(extent.top, bbox.top)
        out = []
        for z in range(minzoom, maxzoom + 1):
            ul_tile = get_tile(w + LL_EPSILON, n - LL_EPSILON, z)
            lr_tile = get_tile(e - LL_EPSILON, s + LL_EPSILON, z)
            out.append(MinMax(ul_tile.x, lr_tile.x, ul_tile.y, lr_tile.y))
        return out

    def extent_limits_xy(
        self, extent: BoundingBox, minzoom: int, maxzoom: int
    ) -> list[MinMax]:
        """Per-zoom MinMax of a CRS-space extent (res/10 inset),
        /root/reference/src/tms.rs:785-807."""
        if extent.left > extent.right or minzoom > maxzoom:
            return []
        bbox = self.xy_bbox()
        w = max(extent.left, bbox.left)
        s = max(extent.bottom, bbox.bottom)
        e = min(extent.right, bbox.right)
        n = min(extent.top, bbox.top)
        out = []
        for z in range(minzoom, maxzoom + 1):
            res = self.resolution(self.matrix(z)) / 10.0
            ul_tile = self.xy_tile(w + res, n - res, z)
            lr_tile = self.xy_tile(e - res, s + res, z)
            out.append(MinMax(ul_tile.x, lr_tile.x, ul_tile.y, lr_tile.y))
        return out

    def xyz_iterator(
        self, extent: BoundingBox, minzoom: int, maxzoom: int
    ) -> Iterator[Xyz]:
        """Lazy z-major / x-middle / y-fastest enumeration over CRS-space
        extent, /root/reference/src/tms_iterator.rs:11-78 (inclusive limits,
        z_max clamped to z_min + len(limits) - 1)."""
        limits = self.extent_limits_xy(extent, minzoom, maxzoom)
        return iter_xyz(minzoom, maxzoom, limits)

    def xyz_iterator_geographic(
        self, extent: BoundingBox, minzoom: int, maxzoom: int
    ) -> Iterator[Xyz]:
        limits = self.extent_limits(extent, minzoom, maxzoom, False)
        return iter_xyz(minzoom, maxzoom, limits)

    # ------------------------------------------------------------------
    # Quadkeys
    # ------------------------------------------------------------------

    def quadkey(self, tile: Xyz) -> str:
        """/root/reference/src/quadkey.rs:23-44."""
        if not self.is_quadtree:
            raise QuadKeyError("This Tile Matrix Set doesn't support 2 x 2 quadkeys.")
        qk = []
        for z in range(tile.z, self.minzoom, -1):
            digit = 0
            mask = 1 << (z - 1)
            if tile.x & mask:
                digit += 1
            if tile.y & mask:
                digit += 2
            qk.append(str(digit))
        return "".join(qk)

    def quadkey_to_tile(self, qk: str) -> Xyz:
        """/root/reference/src/quadkey.rs:50-78."""
        if not self.is_quadtree:
            raise QuadKeyError("This Tile Matrix Set doesn't support 2 x 2 quadkeys.")
        if not qk:
            return Xyz(0, 0, 0)
        xtile = ytile = 0
        z = 0
        for i, digit in enumerate(reversed(qk)):
            z = i
            mask = 1 << i
            if digit == "1":
                xtile |= mask
            elif digit == "2":
                ytile |= mask
            elif digit == "3":
                xtile |= mask
                ytile |= mask
            elif digit != "0":
                raise QuadKeyError(f"Unexpected quadkey digit: {digit}")
        return Xyz(xtile, ytile, z + 1)

    def quadkey_arrays(self, x, y, z):
        """Vectorized quadkey for uniform zoom arrays (numpy bit ops)."""
        if not self.is_quadtree:
            raise QuadKeyError("This Tile Matrix Set doesn't support 2 x 2 quadkeys.")
        x = np.asarray(x, dtype=np.int64)
        y = np.asarray(y, dtype=np.int64)
        z = np.asarray(z, dtype=np.int64)
        n = x.shape[0]
        maxz = int(z.max()) if n else 0
        out = np.full(n, "", dtype=object)
        for zz in range(maxz, self.minzoom, -1):
            mask = np.int64(1) << np.int64(zz - 1)
            digit = ((x & mask) != 0).astype(np.int64) + 2 * ((y & mask) != 0).astype(np.int64)
            sel = z >= zz
            chars = digit.astype("U1")
            out[sel] = np.char.add(out[sel].astype("U64"), chars[sel])
        return out


def iter_xyz(z_min: int, z_max: int, limits: Sequence[MinMax]) -> Iterator[Xyz]:
    """XyzIterator order semantics, /root/reference/src/tms_iterator.rs:21-78."""
    if z_min > z_max or not limits:
        return
    z_max = min(z_max, z_min + max(len(limits) - 1, 0))
    for z in range(z_min, z_max + 1):
        lim = limits[z - z_min]
        for x in range(lim.x_min, lim.x_max + 1):
            for y in range(lim.y_min, lim.y_max + 1):
                yield Xyz(x, y, z)


def _sorted_matrices(tms: TileMatrixSet) -> TileMatrixSet:
    """/root/reference/src/tms.rs:108-120 — ids must parse as u8, sort numerically."""
    for m in tms.tile_matrices:
        try:
            v = int(m.id)
        except ValueError:
            raise InvalidZoomId(m.id)
        if not (0 <= v <= 255):
            raise InvalidZoomId(m.id)
    ms = sorted(tms.tile_matrices, key=lambda m: int(m.id))
    return TileMatrixSet(
        id=tms.id,
        crs=tms.crs,
        tile_matrices=ms,
        title=tms.title,
        uri=tms.uri,
        ordered_axes=tms.ordered_axes,
        well_known_scale_set=tms.well_known_scale_set,
        bounding_box=tms.bounding_box,
    )


def _transformed_bbox(
    extent: Sequence[float], crs: Crs, extent_crs: Optional[Crs]
) -> BoundingBox:
    """/root/reference/src/tms.rs:1079-1089."""
    left, bottom, right, top = (float(v) for v in extent[:4])
    if extent_crs is not None and extent_crs != crs:
        t = Transformer.from_crs(extent_crs, crs)
        left, bottom, right, top = t.transform_bounds(left, bottom, right, top)
    return BoundingBox(left, bottom, right, top)

"""Tile-cover enumeration: bbox columns -> exploded (zoom, tile_x, tile_y).

Spark form of the reference's tiles()/extent_limits/XyzIterator family
(/root/reference/src/tms.rs:706-824, src/tms_iterator.rs). Not an iterator:
`explode(sequence(...))` is a codegen'd generator, so nothing materializes
on the driver and cover rows stream straight into downstream joins.

Order parity with the reference iterators is a presentation concern:
`ORDER BY zoom, tile_x, tile_y` reproduces the golden sequences (z-major,
x-middle, y-fastest) when a test needs it; production plans never sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.model import LL_EPSILON
from ..core.tms import Tms
from ..functions.grid_cols import (
    mercator_x,
    mercator_y,
    xy_tile_x,
    xy_tile_y,
)


def cover_bbox_geographic(
    df: DataFrame,
    tms: Tms,
    zoom: int,
    west: str = "minx",
    south: str = "miny",
    east: str = "maxx",
    north: str = "maxy",
    out_x: str = "tile_x",
    out_y: str = "tile_y",
) -> DataFrame:
    """Explode each row into the tiles its geographic bbox overlaps at `zoom`.

    Columns west..north are geographic degrees. Reproduces the reference
    corner-tile + epsilon-inset algorithm (tms.rs:706-746): UL tile of
    (w+eps, n-eps), LR tile of (e-eps, s+eps), inclusive ranges.

    Antimeridian-crossing boxes (west > east) split into two x-ranges —
    (bbox.left -> east) and (west -> bbox.right) — exactly as the
    reference does (tms.rs:717-724, tested tests/tiles.rs:344-351); the
    two ranges explode from one array column, so the split stays row-local
    (no union of two plans, no second scan).

    Inverted ranges (bbox fully outside the TMS, sub-epsilon-thin box)
    produce ZERO tiles, matching the reference's `ul..=lr` empty range —
    without the guard, Spark's sequence() would generate a DESCENDING
    range of phantom tiles.
    """
    p = tms.zoom_params(zoom)
    bbox = tms.bbox()
    eps = F.lit(LL_EPSILON)

    srid = tms.crs().as_srid()
    if srid == 3857:
        to_x = lambda c: mercator_x(c)  # noqa: E731
        to_y = lambda c: mercator_y(c)  # noqa: E731
    elif srid == 4326:
        to_x = to_y = lambda c: c  # noqa: E731
    else:
        raise ValueError(f"cover supports EPSG:3857/4326 TMS, got {tms.crs()}")

    def x_range(wcol, ecol):
        w_ = F.greatest(wcol, F.lit(bbox.left)) + eps
        e_ = F.least(ecol, F.lit(bbox.right)) - eps
        return F.struct(
            xy_tile_x(to_x(w_), p).alias("lo"), xy_tile_x(to_x(e_), p).alias("hi")
        )

    s = F.greatest(F.col(south), F.lit(bbox.bottom)) + eps
    n = F.least(F.col(north), F.lit(bbox.top)) - eps
    ul_y = xy_tile_y(to_y(n), p)
    lr_y = xy_tile_y(to_y(s), p)

    wrap = F.col(west) > F.col(east)
    x_ranges = F.when(
        wrap,
        # reference order: left part (bbox.left -> east) first, then
        # (west -> bbox.right); duplicates at coarse zooms are faithful
        F.array(
            x_range(F.lit(bbox.left), F.col(east)),
            x_range(F.col(west), F.lit(bbox.right)),
        ),
    ).otherwise(F.array(x_range(F.col(west), F.col(east))))

    out = (
        df.withColumn("_xr", F.explode(x_ranges))
        .withColumn("_uly", ul_y)
        .withColumn("_lry", lr_y)
        .filter((F.col("_xr.lo") <= F.col("_xr.hi")) & (F.col("_uly") <= F.col("_lry")))
        .withColumn(out_x, F.explode(F.sequence(F.col("_xr.lo"), F.col("_xr.hi"))))
        .withColumn(out_y, F.explode(F.sequence(F.col("_uly"), F.col("_lry"))))
        .withColumn("zoom", F.lit(zoom))
        .drop("_xr", "_uly", "_lry")
    )
    return out


def cover_bbox_xy(
    df: DataFrame,
    tms: Tms,
    zoom: int,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
) -> DataFrame:
    """CRS-space cover with the res/10 inset (tms.rs:785-807)."""
    p = tms.zoom_params(zoom)
    inset = F.lit(p.resolution / 10.0)
    b = tms.xy_bbox()
    w = F.greatest(F.col(minx), F.lit(b.left)) + inset
    s = F.greatest(F.col(miny), F.lit(b.bottom)) + inset
    e = F.least(F.col(maxx), F.lit(b.right)) - inset
    n = F.least(F.col(maxy), F.lit(b.top)) - inset
    return (
        df.withColumn("_ulx", xy_tile_x(w, p))
        .withColumn("_uly", xy_tile_y(n, p))
        .withColumn("_lrx", xy_tile_x(e, p))
        .withColumn("_lry", xy_tile_y(s, p))
        # inverted range (bbox outside TMS / thinner than the inset) ->
        # zero tiles, not sequence()'s descending phantom range
        .filter((F.col("_ulx") <= F.col("_lrx")) & (F.col("_uly") <= F.col("_lry")))
        .withColumn("tile_x", F.explode(F.sequence(F.col("_ulx"), F.col("_lrx"))))
        .withColumn("tile_y", F.explode(F.sequence(F.col("_uly"), F.col("_lry"))))
        .withColumn("zoom", F.lit(zoom))
        .drop("_ulx", "_uly", "_lrx", "_lry")
    )


def cover_bbox_xy_exact(
    df: DataFrame,
    tms: Tms,
    zoom: int,
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
) -> DataFrame:
    """INSET-FREE CRS-space cover: every tile whose area the bbox touches,
    by pure floor arithmetic (clamped to the matrix, inverted-range
    guarded). This is the ENGINE'S exact variant, not reference
    semantics: the reference's res/10 inset (cover_bbox_xy) exists for
    enumerating large extents without edge-tile noise, but it drops any
    bbox thinner than res/5 entirely — wrong for footprint rasterization,
    where a footprint always covers at least one pixel of one tile."""
    p = tms.zoom_params(zoom)
    b = tms.xy_bbox()
    w = F.greatest(F.col(minx), F.lit(b.left))
    s = F.greatest(F.col(miny), F.lit(b.bottom))
    e = F.least(F.col(maxx), F.lit(b.right))
    n = F.least(F.col(maxy), F.lit(b.top))
    # xy_tile_* keeps the reference's clamp-to-WIDTH quirk; a bbox edge
    # exactly on xy_bbox.right/bottom would enumerate the phantom tile
    # column/row `matrix_width` — cap at the last real tile instead
    mx = F.lit(p.matrix_width - 1)
    my = F.lit(p.matrix_height - 1)
    return (
        # a bbox entirely OUTSIDE the matrix must be rejected on the raw
        # coords: clamping would collapse its disjoint range onto an edge
        # tile and the inverted-range guard below could no longer see it
        # (edge-touch from outside keeps the interior edge-touch
        # semantics: >= / <= includes the boundary tile row/col)
        df.filter(
            (F.col(maxx) >= F.lit(b.left))
            & (F.col(minx) <= F.lit(b.right))
            & (F.col(maxy) >= F.lit(b.bottom))
            & (F.col(miny) <= F.lit(b.top))
        )
        .withColumn("_ulx", F.least(xy_tile_x(w, p), mx))
        .withColumn("_uly", F.least(xy_tile_y(n, p), my))
        .withColumn("_lrx", F.least(xy_tile_x(e, p), mx))
        .withColumn("_lry", F.least(xy_tile_y(s, p), my))
        .filter((F.col("_ulx") <= F.col("_lrx")) & (F.col("_uly") <= F.col("_lry")))
        .withColumn("tile_x", F.explode(F.sequence(F.col("_ulx"), F.col("_lrx"))))
        .withColumn("tile_y", F.explode(F.sequence(F.col("_uly"), F.col("_lry"))))
        .withColumn("zoom", F.lit(zoom))
        .drop("_ulx", "_uly", "_lrx", "_lry")
    )


def cover_multizoom(
    df: DataFrame, tms: Tms, zooms: Sequence[int], geographic: bool = True, **cols
) -> DataFrame:
    """Union of per-zoom covers (matches reference per-zoom loop)."""
    fn = cover_bbox_geographic if geographic else cover_bbox_xy
    out = None
    for z in zooms:
        part = fn(df, tms, z, **cols)
        out = part if out is None else out.unionByName(part)
    return out


def enumerate_legacy(spark, grid, extent, tolerance: int, minzoom: int, maxzoom: int) -> DataFrame:
    """Legacy GridIterator as a DataFrame: tile_limits (EXCLUSIVE maxx/maxy,
    /root/reference/src/wmts/grid_iterator.rs:51-71) -> explode. Golden
    order reproduced by ORDER BY zoom, tile_x, tile_y."""
    limits = grid.tile_limits(extent, tolerance)
    if minzoom > maxzoom or len(limits) <= minzoom:
        return spark.createDataFrame([], "zoom INT, tile_x BIGINT, tile_y BIGINT")
    maxzoom = min(maxzoom, len(limits) - 1)
    rows = [
        (z, limits[z].minx, limits[z].maxx - 1, limits[z].miny, limits[z].maxy - 1)
        for z in range(minzoom, maxzoom + 1)
    ]
    base = spark.createDataFrame(
        rows, "zoom INT, x_min BIGINT, x_max BIGINT, y_min BIGINT, y_max BIGINT"
    )
    return (
        base.withColumn("tile_x", F.explode(F.sequence("x_min", "x_max")))
        .withColumn("tile_y", F.explode(F.sequence("y_min", "y_max")))
        .select("zoom", "tile_x", "tile_y")
    )


def enumerate_tms(spark_df_or_session, tms: Tms, minzoom: int, maxzoom: int) -> DataFrame:
    """All tiles of a TMS between zooms — DataFrame form of XyzIterator over
    the whole xy_bbox (tms_iterator.rs golden: 21 rows for z0-2)."""
    from pyspark.sql import SparkSession

    spark = (
        spark_df_or_session
        if isinstance(spark_df_or_session, SparkSession)
        else spark_df_or_session.sparkSession
    )
    limits = tms.extent_limits_xy(tms.xy_bbox(), minzoom, maxzoom)
    rows = [
        (z, lim.x_min, lim.x_max, lim.y_min, lim.y_max)
        for z, lim in zip(range(minzoom, maxzoom + 1), limits)
    ]
    base = spark.createDataFrame(
        rows, "zoom INT, x_min BIGINT, x_max BIGINT, y_min BIGINT, y_max BIGINT"
    )
    return (
        base.withColumn("tile_x", F.explode(F.sequence("x_min", "x_max")))
        .withColumn("tile_y", F.explode(F.sequence("y_min", "y_max")))
        .select("zoom", "tile_x", "tile_y")
    )

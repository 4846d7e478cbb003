"""Vector-tile payload production: points -> real MVT binaries per tile.

Completes the raster<->vector story (operators/raster.py paints raster
masks; this emits the vector side) on top of the reference's tile
addressing (/root/reference/src/tms.rs xy_bounds/tile semantics for the
local-coordinate transform). Payload format is the public Mapbox Vector
Tile 2.1 spec via the stdlib-only codec in functions/mvt.py.

Scale shape: ONE shuffle (groupBy tile key — the same exchange any
per-tile sink needs), then applyInPandas builds each tile's binary
where its rows landed; feature coords are quantized to tile-local
integers with native Column math BEFORE the shuffle, so only
(tile, id, px, py) ints move, never raw payloads. Dense tiles are real
data skew: cap features per tile explicitly (`max_features_per_tile`
raises) rather than OOM inside a task — producers should roll up dense
zooms first (operators/rollup.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.tms import Tms
from ..functions.grid_cols import mercator_x, mercator_y, xy_tile_x, xy_tile_y
from ..functions.mvt import (
    DEFAULT_EXTENT,
    decode_line_tile,
    decode_point_tile,
    decode_poly_tile,
    encode_line_tile,
    encode_point_tile,
    encode_poly_tile,
)
from .cover import cover_bbox_geographic

TILES_SCHEMA = "tile_x BIGINT, tile_y BIGINT, n_features INT, mvt BINARY"


def _batched_group_apply(rows: DataFrame, key_cols: list[str], build) -> DataFrame:
    """Per-group build with MANY groups per Arrow round trip: repartition
    on the group key, sort the partition so each key's rows are
    contiguous, then mapInPandas, calling `build(group_pdf)` (one
    1-row-out tile builder, same contract as applyInPandas) for every
    whole group inside an Arrow batch and carrying a boundary-straddling
    group into the next batch. Same single exchange as
    groupBy().applyInPandas, but the per-group Arrow round trip — which
    dominates when groups are small (a z6 tile has ~hundreds of points,
    a pyramid parent has <= 4 children) — is amortized over the batch
    (measured 1.7x on the simplify bench with the identical pattern)."""

    def run(batches):
        carry: pd.DataFrame | None = None
        for b in batches:
            if carry is not None and len(carry):
                b = pd.concat([carry, b], ignore_index=True)
            if len(b) == 0:
                carry = None
                continue
            tail = pd.Series(True, index=b.index)
            for k in key_cols:
                tail &= b[k] == b[k].iloc[-1]
            carry = b.loc[tail]
            body = b.loc[~tail]
            if len(body):
                yield pd.concat(
                    [
                        build(g.reset_index(drop=True))
                        for _, g in body.groupby(key_cols, sort=False)
                    ],
                    ignore_index=True,
                )
        if carry is not None and len(carry):
            yield build(carry.reset_index(drop=True))

    parts = rows.repartition(*[F.col(k) for k in key_cols]).sortWithinPartitions(
        *key_cols
    )
    return parts.mapInPandas(run, TILES_SCHEMA)


def encode_point_tiles(
    points: DataFrame,
    tms: Tms,
    zoom: int,
    id_col: str = "pid",
    lon: str = "lon",
    lat: str = "lat",
    extent: int = DEFAULT_EXTENT,
    layer: str = "points",
    max_features_per_tile: int = 2_000_000,
    attr_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, lon, lat) -> one row per non-empty tile at `zoom`:
    (tile_x, tile_y, n_features, mvt). Features are sorted by id inside
    each tile, so the binaries are deterministic. Local coordinates are
    floor((frac_within_tile) * extent) clamped to [0, extent-1] — the
    formula a SQL oracle replays verbatim.

    `attr_cols` columns ride the shuffle and land in the payload as the
    spec's tag dictionaries (per-layer key/value tables, per-feature
    index pairs; string/int64/double/bool). Null attribute values are
    elided from that feature's tags."""
    p = tms.zoom_params(zoom)
    srid = tms.crs().as_srid()
    if srid == 3857:
        gx, gy = mercator_x(lon), mercator_y(lat)
    elif srid == 4326:
        gx, gy = F.col(lon), F.col(lat)
    else:
        raise ValueError(f"encode_point_tiles supports EPSG:3857/4326, got {tms.crs()}")
    span_x = p.resolution * float(p.tile_width)
    span_y = p.resolution * float(p.tile_height)

    def local(g, origin, span, tile, flip):
        frac = (F.lit(origin) - g) / F.lit(span) if flip else (g - F.lit(origin)) / F.lit(span)
        raw = F.floor((frac - tile) * F.lit(float(extent)))
        return F.least(
            F.greatest(raw, F.lit(0)), F.lit(extent - 1)
        ).cast("int")

    staged = points.withColumns({"_gx": gx, "_gy": gy})
    staged = staged.withColumns(
        {
            "tile_x": xy_tile_x(F.col("_gx"), p),
            "tile_y": xy_tile_y(F.col("_gy"), p),
        }
    )
    from pyspark.sql import types as T

    attr_casts = {
        c: (
            int
            if isinstance(
                points.schema[c].dataType,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
            )
            else bool
            if isinstance(points.schema[c].dataType, T.BooleanType)
            else float
            if isinstance(points.schema[c].dataType, (T.FloatType, T.DoubleType))
            else None
        )
        for c in attr_cols
    }
    rows = staged.select(
        "tile_x",
        "tile_y",
        F.col(id_col).alias("fid"),
        local(F.col("_gx"), p.origin_x, span_x, F.col("tile_x"), False).alias("px"),
        local(F.col("_gy"), p.origin_y, span_y, F.col("tile_y"), True).alias("py"),
        *[F.col(c) for c in attr_cols],
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_features_per_tile:
            raise ValueError(
                f"tile ({pdf.tile_x.iloc[0]},{pdf.tile_y.iloc[0]}) has "
                f"{len(pdf)} features > max_features_per_tile="
                f"{max_features_per_tile} — roll up before encoding"
            )
        pdf = pdf.sort_values("fid")
        if not attr_cols:
            # no tag dictionaries: the whole feature stream is three
            # varints per row around fixed key bytes — vectorized numpy
            # encoder, byte-identical (parity pytest), ~10x the scalar
            # per-point loop that dominated the MVT production bench
            from ..functions.mvt import encode_point_tile_np

            return pd.DataFrame(
                {
                    "tile_x": [int(pdf.tile_x.iloc[0])],
                    "tile_y": [int(pdf.tile_y.iloc[0])],
                    "n_features": [len(pdf)],
                    "mvt": [
                        encode_point_tile_np(
                            pdf.fid.to_numpy(),
                            pdf.px.to_numpy(),
                            pdf.py.to_numpy(),
                            layer,
                            extent,
                        )
                    ],
                }
            )
        feats = [(int(f), int(x), int(y)) for f, x, y in zip(pdf.fid, pdf.px, pdf.py)]
        attrs = None
        if attr_cols:
            # nullable integral/bool columns arrive in pandas as float64
            # (NaN for null) — restore the declared Spark type so the
            # codec's int/bool/float/str switch sees python natives;
            # null and NaN are both elided from the feature's tags
            import math as _math

            def _clean(c: str) -> list:
                cast = attr_casts[c]
                out = []
                for v in pdf[c].tolist():
                    if v is None or (isinstance(v, float) and _math.isnan(v)):
                        out.append(None)
                    else:
                        out.append(cast(v) if cast else v)
                return out

            cols = {c: _clean(c) for c in attr_cols}
            attrs = [
                {c: cols[c][i] for c in attr_cols if cols[c][i] is not None}
                for i in range(len(pdf))
            ]
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [encode_point_tile(feats, layer, extent, attrs=attrs)],
            }
        )

    return _batched_group_apply(rows, ["tile_x", "tile_y"], build)


def encode_bbox_poly_tiles(
    rects: DataFrame,
    tms: Tms,
    zoom: int,
    id_col: str = "rid",
    west: str = "minx",
    south: str = "miny",
    east: str = "maxx",
    north: str = "maxy",
    extent: int = DEFAULT_EXTENT,
    layer: str = "polys",
    max_features_per_tile: int = 2_000_000,
) -> DataFrame:
    """Geographic bboxes -> polygon MVT binaries, one row per covered
    tile. Each rect lands UNCLIPPED in every tile its bbox covers
    (cover_bbox_geographic — the reference's epsilon-inset cover), so a
    tile's ring vertices may lie outside [0, extent): that is the MVT
    clip-buffer convention renderers expect, and it keeps the local
    quantization pure floor math a SQL oracle can replay with no clamp.
    Rings wind (w,n)->(e,n)->(e,s)->(w,s): clockwise in the y-down tile
    frame = exterior per spec. Same one-exchange shape as
    encode_point_tiles: quantize with native Columns, shuffle only
    (tile, id, 4 ints), build bytes where the rows land."""
    p = tms.zoom_params(zoom)
    srid = tms.crs().as_srid()
    if srid == 3857:
        to_x = lambda c: mercator_x(c)  # noqa: E731
        to_y = lambda c: mercator_y(c)  # noqa: E731
    elif srid == 4326:
        to_x = to_y = F.col  # noqa: E731
    else:
        raise ValueError(
            f"encode_bbox_poly_tiles supports EPSG:3857/4326, got {tms.crs()}"
        )
    span_x = p.resolution * float(p.tile_width)
    span_y = p.resolution * float(p.tile_height)

    def local_x(col):
        frac = (to_x(col) - F.lit(p.origin_x)) / F.lit(span_x)
        return F.floor((frac - F.col("tile_x")) * F.lit(float(extent))).cast("int")

    def local_y(col):
        frac = (F.lit(p.origin_y) - to_y(col)) / F.lit(span_y)
        return F.floor((frac - F.col("tile_y")) * F.lit(float(extent))).cast("int")

    covered = cover_bbox_geographic(rects, tms, zoom, west, south, east, north)
    rows = covered.select(
        "tile_x",
        "tile_y",
        F.col(id_col).alias("fid"),
        local_x(west).alias("pxw"),
        local_x(east).alias("pxe"),
        local_y(north).alias("pyn"),
        local_y(south).alias("pys"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_features_per_tile:
            raise ValueError(
                f"tile ({pdf.tile_x.iloc[0]},{pdf.tile_y.iloc[0]}) has "
                f"{len(pdf)} features > max_features_per_tile="
                f"{max_features_per_tile} — roll up before encoding"
            )
        pdf = pdf.sort_values("fid")
        feats = [
            (
                int(f),
                [[(int(xw), int(yn)), (int(xe), int(yn)),
                  (int(xe), int(ys)), (int(xw), int(ys))]],
            )
            for f, xw, xe, yn, ys in zip(pdf.fid, pdf.pxw, pdf.pxe, pdf.pyn, pdf.pys)
        ]
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [encode_poly_tile(feats, layer, extent)],
            }
        )

    return _batched_group_apply(rows, ["tile_x", "tile_y"], build)


def encode_path_tiles(
    points: DataFrame,
    tms: Tms,
    zoom: int,
    id_col: str = "tid",
    order_col: str = "seq",
    lon: str = "lon",
    lat: str = "lat",
    extent: int = DEFAULT_EXTENT,
    layer: str = "lines",
    max_features_per_tile: int = 2_000_000,
) -> DataFrame:
    """Ordered trajectories -> LINESTRING MVT binaries, one row per tile
    a path visits. Semantics are VERTEX-RUN tiling, not geometric
    clipping: a trajectory is split into maximal runs of consecutive
    vertices that land in the same tile, each surviving run (>= 2
    vertices) becomes one part of that tile's feature for the
    trajectory, and the segment that crosses a tile border is drawn in
    neither tile. That keeps every step pure column math + two window
    functions a SQL oracle replays verbatim (no line/edge intersection),
    and is the standard cheap trajectory-tiling trade renderers accept
    at high zooms. A path that re-enters a tile yields a multi-part
    (MULTILINESTRING) feature — the spec's repeated MoveTo/LineTo stream
    (functions/mvt.encode_line_tile).

    Scale shape: one exchange for the per-trajectory windows (hash by
    `id_col` — trajectories are the natural partition key and fit
    executors by construction), then the same groupBy-tile exchange any
    per-tile sink needs; only (tile, id, run, seq, px, py) ints ever
    shuffle. Runs shorter than 2 vertices are dropped inside the tile
    build (no extra window pass). Reference addressing: tile/local
    coords re-derive /root/reference/src/tms.rs xy_tile + xy_bounds
    semantics, as in encode_point_tiles."""
    from pyspark.sql import Window

    p = tms.zoom_params(zoom)
    srid = tms.crs().as_srid()
    if srid == 3857:
        gx, gy = mercator_x(lon), mercator_y(lat)
    elif srid == 4326:
        gx, gy = F.col(lon), F.col(lat)
    else:
        raise ValueError(f"encode_path_tiles supports EPSG:3857/4326, got {tms.crs()}")
    span_x = p.resolution * float(p.tile_width)
    span_y = p.resolution * float(p.tile_height)

    def local(g, origin, span, tile, flip):
        frac = (F.lit(origin) - g) / F.lit(span) if flip else (g - F.lit(origin)) / F.lit(span)
        raw = F.floor((frac - tile) * F.lit(float(extent)))
        return F.least(F.greatest(raw, F.lit(0)), F.lit(extent - 1)).cast("int")

    staged = points.withColumns({"_gx": gx, "_gy": gy})
    staged = staged.withColumns(
        {
            "tile_x": xy_tile_x(F.col("_gx"), p),
            "tile_y": xy_tile_y(F.col("_gy"), p),
        }
    )
    w = Window.partitionBy(id_col).orderBy(order_col)
    # first row of a trajectory (lag null) starts run 1, as does every
    # tile change; the cumulative sum is the run index
    chg = (
        F.coalesce(
            (F.lag("tile_x").over(w) != F.col("tile_x"))
            | (F.lag("tile_y").over(w) != F.col("tile_y")),
            F.lit(True),
        )
    ).cast("int")
    staged = staged.withColumn("_chg", chg).withColumn(
        "run_id", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    rows = staged.select(
        "tile_x",
        "tile_y",
        F.col(id_col).alias("fid"),
        "run_id",
        F.col(order_col).alias("vseq"),
        local(F.col("_gx"), p.origin_x, span_x, F.col("tile_x"), False).alias("px"),
        local(F.col("_gy"), p.origin_y, span_y, F.col("tile_y"), True).alias("py"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_features_per_tile:
            raise ValueError(
                f"tile ({pdf.tile_x.iloc[0]},{pdf.tile_y.iloc[0]}) has "
                f"{len(pdf)} vertices > max_features_per_tile="
                f"{max_features_per_tile} — roll up before encoding"
            )
        pdf = pdf.sort_values(["fid", "run_id", "vseq"])
        feats = []
        for fid, g in pdf.groupby("fid", sort=True):
            parts = [
                [(int(x), int(y)) for x, y in zip(r.px, r.py)]
                for _, r in g.groupby("run_id", sort=True)
                if len(r) >= 2
            ]
            if parts:
                feats.append((int(fid), parts))
        if not feats:
            return pd.DataFrame(
                {"tile_x": [], "tile_y": [], "n_features": [], "mvt": []}
            ).astype({"tile_x": "int64", "tile_y": "int64", "n_features": "int32"})
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [encode_line_tile(feats, layer, extent)],
            }
        )

    return _batched_group_apply(rows, ["tile_x", "tile_y"], build)


DECODED_SCHEMA = (
    "tile_x BIGINT, tile_y BIGINT, n_features INT, min_id BIGINT, "
    "max_id BIGINT, sum_px BIGINT, sum_py BIGINT, extent INT"
)


def decode_tile_stats(tiles: DataFrame) -> DataFrame:
    """Re-parse the MVT binaries and aggregate what they CONTAIN —
    everything except the passthrough tile address is recomputed from
    the bytes, so any encoder/wire bug surfaces as a value mismatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in (
                "tile_x", "tile_y", "n_features", "min_id", "max_id",
                "sum_px", "sum_py", "extent",
            )}
            for tx, ty, payload in zip(b["tile_x"], b["tile_y"], b["mvt"]):
                d = decode_point_tile(bytes(payload))
                (layer,) = d["layers"]
                fs = layer["features"]
                out["tile_x"].append(int(tx))
                out["tile_y"].append(int(ty))
                out["n_features"].append(len(fs))
                out["min_id"].append(min(f[0] for f in fs))
                out["max_id"].append(max(f[0] for f in fs))
                out["sum_px"].append(sum(f[1] for f in fs))
                out["sum_py"].append(sum(f[2] for f in fs))
                out["extent"].append(int(layer["extent"]))
            yield pd.DataFrame(out)

    return tiles.select("tile_x", "tile_y", "mvt").mapInPandas(run, DECODED_SCHEMA)


POLY_DECODED_SCHEMA = (
    "tile_x BIGINT, tile_y BIGINT, n_features INT, n_vertices INT, "
    "min_id BIGINT, max_id BIGINT, sum_px BIGINT, sum_py BIGINT, extent INT"
)


def decode_poly_stats(tiles: DataFrame) -> DataFrame:
    """Polygon twin of decode_tile_stats: re-parse the command streams
    (cumulative deltas and all) and aggregate the absolute ring vertices
    the bytes encode — the oracle re-derives the same quantities from
    the quantization formula, so a delta/winding/wire bug mismatches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in (
                "tile_x", "tile_y", "n_features", "n_vertices", "min_id",
                "max_id", "sum_px", "sum_py", "extent",
            )}
            for tx, ty, payload in zip(b["tile_x"], b["tile_y"], b["mvt"]):
                d = decode_poly_tile(bytes(payload))
                (layer,) = d["layers"]
                fs = layer["features"]
                verts = [v for _, rings in fs for ring in rings for v in ring]
                out["tile_x"].append(int(tx))
                out["tile_y"].append(int(ty))
                out["n_features"].append(len(fs))
                out["n_vertices"].append(len(verts))
                out["min_id"].append(min(f[0] for f in fs))
                out["max_id"].append(max(f[0] for f in fs))
                out["sum_px"].append(sum(v[0] for v in verts))
                out["sum_py"].append(sum(v[1] for v in verts))
                out["extent"].append(int(layer["extent"]))
            yield pd.DataFrame(out)

    return tiles.select("tile_x", "tile_y", "mvt").mapInPandas(
        run, POLY_DECODED_SCHEMA
    )


LINE_DECODED_SCHEMA = (
    "tile_x BIGINT, tile_y BIGINT, n_features INT, n_parts INT, "
    "n_vertices INT, min_id BIGINT, max_id BIGINT, sum_px BIGINT, "
    "sum_py BIGINT, extent INT"
)


def decode_line_stats(tiles: DataFrame) -> DataFrame:
    """Linestring twin of decode_poly_stats: re-parse the MoveTo/LineTo
    command streams (cumulative deltas across parts) and aggregate the
    absolute vertices the bytes encode — the oracle re-derives the same
    quantities from the quantization + run-split windows, so a delta,
    part-boundary, or wire bug mismatches on values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in (
                "tile_x", "tile_y", "n_features", "n_parts", "n_vertices",
                "min_id", "max_id", "sum_px", "sum_py", "extent",
            )}
            for tx, ty, payload in zip(b["tile_x"], b["tile_y"], b["mvt"]):
                d = decode_line_tile(bytes(payload))
                (layer,) = d["layers"]
                fs = layer["features"]
                verts = [v for _, parts in fs for part in parts for v in part]
                out["tile_x"].append(int(tx))
                out["tile_y"].append(int(ty))
                out["n_features"].append(len(fs))
                out["n_parts"].append(sum(len(parts) for _, parts in fs))
                out["n_vertices"].append(len(verts))
                out["min_id"].append(min(f[0] for f in fs))
                out["max_id"].append(max(f[0] for f in fs))
                out["sum_px"].append(sum(v[0] for v in verts))
                out["sum_py"].append(sum(v[1] for v in verts))
                out["extent"].append(int(layer["extent"]))
            yield pd.DataFrame(out)

    return tiles.select("tile_x", "tile_y", "mvt").mapInPandas(
        run, LINE_DECODED_SCHEMA
    )


def rollup_point_tiles(tiles: DataFrame, levels: int = 1, layer: str = "points") -> DataFrame:
    """One pyramid step (applied `levels` times): z -> z-1 POINT MVT
    tiles built purely from the CHILD BINARIES — decode each child's
    features, re-quantize into the parent's pixel frame, merge the <= 4
    children, re-encode. Tile-store maintenance without re-reading base
    data: the shape a serving pyramid refresh needs (children are
    already materialized; the base table may be 100 TB away).

    The parent-local coordinate is exact integer halving:
      px' = (child_x & 1) * (extent/2) + px // 2
    which equals floor(frac_parent * extent) whenever the TMS halves
    resolutions exactly between zooms (computed custom TMS; for
    JSON-loaded WebMercatorQuad the decimal-rounded denominators can be
    1 ulp off the direct z-1 quantization — same caveat as the
    multizoom quadtree fast path, see functions/grid_cols). Duplicate
    feature ids across children are kept (same id may appear once per
    child); features sort by (id, px, py) for deterministic bytes. Tag
    attributes survive the rollup (decoded with the dictionaries and
    re-encoded); attr-less children produce byte-identical attr-less
    parents.

    Scale shape: ONE exchange per level (groupBy parent tile, <= 4 rows
    per group); decode/encode run where the rows land via applyInPandas.
    """
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        extent = DEFAULT_EXTENT
        for tx, ty, payload in zip(pdf.tile_x, pdf.tile_y, pdf.mvt):
            (lyr,) = decode_point_tile(bytes(payload), with_attrs=True)["layers"]
            extent = lyr["extent"]
            half = extent // 2
            ox = (int(tx) & 1) * half
            oy = (int(ty) & 1) * half
            rows += [
                (fid, ox + px // 2, oy + py // 2, a)
                for fid, px, py, a in lyr["features"]
            ]
        rows.sort(key=lambda r: r[:3])
        feats = [(f, x, y) for f, x, y, _ in rows]
        attrs = [a for *_, a in rows]
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.ptx.iloc[0])],
                "tile_y": [int(pdf.pty.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [
                    encode_point_tile(
                        feats, layer, extent,
                        attrs=attrs if any(attrs) else None,
                    )
                ],
            }
        )

    out = tiles
    for _ in range(levels):
        parented = out.select(
            "tile_x",
            "tile_y",
            "mvt",
            F.shiftright("tile_x", 1).alias("ptx"),
            F.shiftright("tile_y", 1).alias("pty"),
        )
        out = _batched_group_apply(parented, ["ptx", "pty"], build)
    return out


ATTR_DECODED_SCHEMA = (
    "tile_x BIGINT, tile_y BIGINT, n_features INT, min_id BIGINT, "
    "max_id BIGINT, sum_attr BIGINT, n_cats INT, max_cat STRING, extent INT"
)


def decode_attr_stats(tiles: DataFrame, int_key: str, str_key: str) -> DataFrame:
    """Attribute twin of decode_tile_stats: re-parse the binaries WITH
    the tag dictionaries and aggregate what the tags contain — the sum
    of an int64 attribute, the distinct count and lexicographic max of a
    string attribute — so a dictionary-index, value-typing, or tag-pair
    bug mismatches against the oracle's relational re-derivation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in (
                "tile_x", "tile_y", "n_features", "min_id", "max_id",
                "sum_attr", "n_cats", "max_cat", "extent",
            )}
            for tx, ty, payload in zip(b["tile_x"], b["tile_y"], b["mvt"]):
                d = decode_point_tile(bytes(payload), with_attrs=True)
                (layer,) = d["layers"]
                fs = layer["features"]
                cats = sorted({f[3][str_key] for f in fs if str_key in f[3]})
                out["tile_x"].append(int(tx))
                out["tile_y"].append(int(ty))
                out["n_features"].append(len(fs))
                out["min_id"].append(min(f[0] for f in fs))
                out["max_id"].append(max(f[0] for f in fs))
                out["sum_attr"].append(sum(f[3].get(int_key, 0) for f in fs))
                out["n_cats"].append(len(cats))
                out["max_cat"].append(cats[-1] if cats else None)
                out["extent"].append(int(layer["extent"]))
            yield pd.DataFrame(out)

    return tiles.select("tile_x", "tile_y", "mvt").mapInPandas(
        run, ATTR_DECODED_SCHEMA
    )


def encode_ring_poly_tiles(
    vertices: DataFrame,
    tms: Tms,
    zoom: int,
    id_col: str = "rid",
    ring_col: str = "ring_idx",
    order_col: str = "vert_idx",
    lon: str = "lon",
    lat: str = "lat",
    extent: int = DEFAULT_EXTENT,
    layer: str = "polys",
    max_vertices_per_tile: int = 2_000_000,
) -> DataFrame:
    """Arbitrary-ring polygons (exploded vertex rows: one row per
    (polygon, ring, vertex), ring 0 = exterior, later rings = holes) ->
    polygon MVT binaries, one row per tile the polygon's BBOX covers
    (the reference epsilon-inset cover). Rings land UNCLIPPED in every
    covered tile — the clip-buffer convention, same as
    encode_bbox_poly_tiles — so local coords are pure unclamped floor
    math a SQL oracle replays. Every ring must have >= 3 vertices (the
    codec raises otherwise).

    Scale shape: per-polygon bbox via groupBy(id) min/max (exchange 1);
    the bbox rows explode through the cover and join back to the vertex
    rows on the SAME id key (both sides arrive hash-partitioned by id,
    so the join adds no exchange); then the per-tile groupBy any tile
    sink needs (exchange 2). The real cost is the honest one — each
    polygon's vertex list replicates into each covered tile — which is
    exactly what clip-buffer payloads require; producers simplify rings
    first (operators/simplify) to bound it."""
    p = tms.zoom_params(zoom)
    srid = tms.crs().as_srid()
    if srid == 3857:
        to_x = lambda c: mercator_x(c)  # noqa: E731
        to_y = lambda c: mercator_y(c)  # noqa: E731
    elif srid == 4326:
        to_x = to_y = F.col  # noqa: E731
    else:
        raise ValueError(
            f"encode_ring_poly_tiles supports EPSG:3857/4326, got {tms.crs()}"
        )
    span_x = p.resolution * float(p.tile_width)
    span_y = p.resolution * float(p.tile_height)

    v = vertices.select(
        F.col(id_col).alias("fid"),
        F.col(ring_col).alias("ring"),
        F.col(order_col).alias("vert"),
        F.col(lon).alias("_lon"),
        F.col(lat).alias("_lat"),
    )
    boxes = v.groupBy("fid").agg(
        F.min("_lon").alias("minx"),
        F.min("_lat").alias("miny"),
        F.max("_lon").alias("maxx"),
        F.max("_lat").alias("maxy"),
    )
    covered = cover_bbox_geographic(boxes, tms, zoom).select("fid", "tile_x", "tile_y")
    rows = covered.join(v, "fid").select(
        "tile_x",
        "tile_y",
        "fid",
        "ring",
        "vert",
        F.floor(
            ((to_x(F.col("_lon")) - F.lit(p.origin_x)) / F.lit(span_x) - F.col("tile_x"))
            * F.lit(float(extent))
        ).cast("int").alias("px"),
        F.floor(
            ((F.lit(p.origin_y) - to_y(F.col("_lat"))) / F.lit(span_y) - F.col("tile_y"))
            * F.lit(float(extent))
        ).cast("int").alias("py"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_vertices_per_tile:
            raise ValueError(
                f"tile ({pdf.tile_x.iloc[0]},{pdf.tile_y.iloc[0]}) has "
                f"{len(pdf)} vertices > max_vertices_per_tile="
                f"{max_vertices_per_tile} — simplify rings before encoding"
            )
        pdf = pdf.sort_values(["fid", "ring", "vert"])
        feats = []
        for fid, g in pdf.groupby("fid", sort=True):
            rings = [
                [(int(x), int(y)) for x, y in zip(r.px, r.py)]
                for _, r in g.groupby("ring", sort=True)
            ]
            feats.append((int(fid), rings))
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_features": [len(feats)],
                "mvt": [encode_poly_tile(feats, layer, extent)],
            }
        )

    return _batched_group_apply(rows, ["tile_x", "tile_y"], build)


def merge_point_tiles(old: DataFrame, new: DataFrame, layer: str = "points") -> DataFrame:
    """Upsert-merge two point-MVT tile sets BY FEATURE ID: for each
    tile, decode both binaries (tags included), let the `new` side win
    on fid collisions, re-encode sorted by fid. Union + one groupBy-tile
    exchange (2-row groups); idempotent — re-merging the same `new` set
    reproduces identical bytes, which is what makes the streaming
    foreachBatch store refresh safe under at-least-once replay."""
    tagged = old.select(
        "tile_x", "tile_y", "mvt", F.lit(0).alias("_side")
    ).unionByName(new.select("tile_x", "tile_y", "mvt", F.lit(1).alias("_side")))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        feats: dict = {}
        extent = DEFAULT_EXTENT
        for _, r in pdf.sort_values("_side").iterrows():
            (lyr,) = decode_point_tile(bytes(r.mvt), with_attrs=True)["layers"]
            extent = lyr["extent"]
            for fid, px, py, a in lyr["features"]:
                feats[fid] = (px, py, a)
        fids = sorted(feats)
        rows = [(f, feats[f][0], feats[f][1]) for f in fids]
        attrs = [feats[f][2] for f in fids]
        return pd.DataFrame(
            {
                "tile_x": [int(pdf.tile_x.iloc[0])],
                "tile_y": [int(pdf.tile_y.iloc[0])],
                "n_features": [len(rows)],
                "mvt": [
                    encode_point_tile(
                        rows, layer, extent, attrs=attrs if any(attrs) else None
                    )
                ],
            }
        )

    return _batched_group_apply(tagged, ["tile_x", "tile_y"], build)


def tiles_for_viewport(
    tiles: DataFrame,
    tms: Tms,
    west: float,
    south: float,
    east: float,
    north: float,
    zoom: int,
) -> DataFrame:
    """Serving read path: the store rows for every tile a geographic
    viewport covers at `zoom` (the reference epsilon-inset cover,
    antimeridian split included). The cover is enumerated DRIVER-side
    with the core library (viewports are a few hundred tiles by
    construction — a renderer fetches one screen) and applied as TWO
    filter layers: per-column IN-lists on raw tile_x/tile_y, which ARE
    source-pushable (.explain shows them under PushedFilters, so a
    parquet/Iceberg store prunes row groups on column statistics; the
    rectangle-union over-selection is bounded by the cover's bbox), and
    the exact packed-key IN (grid_cols.tile_key layout) that trims the
    rows the pushable rectangle lets through. Raises if the viewport
    covers more than 4096 tiles — that means the caller wants a lower
    zoom, not a bigger scan."""
    from ..functions.grid_cols import tile_key

    cover = list(tms.tiles(west, south, east, north, [zoom], truncate=False))
    if len(cover) > 4096:
        raise ValueError(
            f"viewport covers {len(cover)} tiles at z{zoom} — render a "
            "lower zoom (serving reads are screen-sized by construction)"
        )
    if not cover:
        return tiles.where(F.lit(False))
    xs = sorted({int(t.x) for t in cover})
    ys = sorted({int(t.y) for t in cover})
    # mirror grid_cols.tile_key's no-zoom layout: tx * 2^28 + ty
    keys = [(int(t.x) << 28) + int(t.y) for t in cover]
    return tiles.where(
        F.col("tile_x").isin(xs)
        & F.col("tile_y").isin(ys)
        & tile_key("tile_x", "tile_y").isin(keys)
    )

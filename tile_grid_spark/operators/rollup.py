"""Hierarchical tile-pyramid rollup (continuous-aggregate pattern).

Aggregate raw rows ONCE at the finest zoom, then derive every coarser
level from the aggregate by quadtree bit-shift (parent_x = x >> dz —
the reference's power-of-2 parent arithmetic, tms.rs:982-1015). At
100 TB this re-aggregates |tiles| rows per level instead of rescanning
|points|; with cascade=True each level rolls up from the PREVIOUS level
(4x fewer rows per step), so the whole pyramid costs ~1.33x the finest
level's aggregate.

Semantics: parent x = x >> dz is EXACT in tile-INDEX space whenever the
matrix width doubles per zoom (every registered quadtree TMS, including
JSON-loaded WebMercatorQuad — widths are exact powers of two even where
the decimal-rounded resolutions are 1 ulp off). The pyramid is therefore
always an exact rollup OF THE BASE-ZOOM ASSIGNMENT. Whether it also
equals re-ASSIGNING the raw points at the coarse zoom depends on the
resolutions halving exactly in doubles — true for computed custom TMS,
1-ulp-boundary-sensitive for JSON WMQ — the same caveat as
grid_cols._multizoom_by_shift. Pass `tms` to validate the width
doubling; rollup-of-assignment semantics need nothing more.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tile_pyramid(
    base: DataFrame,
    base_zoom: int,
    zooms: Sequence[int],
    reaggs: dict[str, Column],
    tile_x: str = "tile_x",
    tile_y: str = "tile_y",
    zoom_col: str = "zoom",
    cascade: bool = True,
    tms=None,
) -> DataFrame:
    """Roll a per-tile aggregate at `base_zoom` up to coarser `zooms`.

    base     per-tile aggregate rows at base_zoom: (tile_x, tile_y,
             <metric columns>) — NOT raw points; aggregate those first.
    reaggs   metric -> re-aggregation expression over the SAME column
             name (e.g. {"n": F.sum("n"), "max_n": F.max("max_n")}).
             Must be associative (sum/min/max; a count is re-aggregated
             as sum of partial counts) — cascading applies them
             repeatedly.
    cascade  True: each level aggregates the previous (coarser-1) level
             — 4x fewer input rows per step. False: every level derives
             from `base` directly (use when re-aggregation is
             associative but you want independent lineage per level).

    Returns the union of all levels (base included) with a `zoom`
    column, one row per (zoom, tile_x, tile_y).
    """
    zs = sorted(set(int(z) for z in zooms), reverse=True)
    if any(z >= base_zoom for z in zs):
        raise ValueError(f"zooms {zs} must all be coarser than base_zoom={base_zoom}")
    if tms is not None:
        # index-space shift requires the matrix width to double per zoom
        for z in zs:
            pw = tms.zoom_params(z).matrix_width
            bw = tms.zoom_params(base_zoom).matrix_width
            if pw << (base_zoom - z) != bw:
                raise ValueError(
                    f"tile_pyramid needs power-of-2 width scaling: width(z{z})="
                    f"{pw} << {base_zoom - z} != width(z{base_zoom})={bw}"
                )

    metrics = list(reaggs)
    cur = base.select(tile_x, tile_y, *metrics).withColumn(
        zoom_col, F.lit(base_zoom)
    )
    levels = [cur]
    prev_zoom = base_zoom
    src = cur
    for z in zs:
        dz = (prev_zoom if cascade else base_zoom) - z
        parent = (src if cascade else levels[0]).select(
            F.shiftright(F.col(tile_x), dz).alias(tile_x),
            F.shiftright(F.col(tile_y), dz).alias(tile_y),
            *metrics,
        )
        lvl = (
            parent.groupBy(tile_x, tile_y)
            .agg(*[expr.alias(name) for name, expr in reaggs.items()])
            .withColumn(zoom_col, F.lit(z))
        )
        levels.append(lvl)
        src = lvl
        prev_zoom = z

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(zoom_col, tile_x, tile_y, *metrics)

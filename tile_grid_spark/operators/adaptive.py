"""Adaptive quadtree density tiling — split tiles until balanced.

Fixed-zoom tiling of skewed point data (cities vs oceans) produces a
few enormous tiles and millions of empty ones; every downstream
consumer (per-tile workers, MVT payload caps, training-shard sizing)
wants tiles bounded by CONTENT, not area. The classic answer is the
adaptive quadtree: start at a coarse zoom and split any tile holding
more than `max_per_tile` points into its four children, recursing
until the bound holds or `z_max` is reached. The output leaves
partition the input points exactly.

Spark shape (the 100-TB plan):
- ONE aggregation over the points at `z_max` (the only pass that
  touches point rows; for z_max >= ~10 group cardinality approaches
  row count, so the shuffle-by-key-first `pre_partitioned_agg` shape
  applies upstream if needed).
- z_max-z_min chained 4-to-1 rollups over geometrically SHRINKING
  tile-count frames (total extra shuffle volume <= 1/3 of the z_max
  frame — the pyramid-rollup trick: never re-read the base table).
- Leaf selection is one self-join child->parent on the packed
  single-BIGINT tile key (LongHashedRelation probe path), then a
  filter. No per-point iteration, no driver-side loop over splits.

Semantics note: a point's tile at zoom z is DEFINED as the quadtree
ancestor of its z_max tile (right-shift by z_max - z). For computed
custom TMS this equals per-zoom assignment bit-for-bit (exact 2^-z
scaling commutes with IEEE rounding); for JSON-loaded WebMercatorQuad
the per-zoom formula can differ by ~1 ulp at tile borders
(grid_cols._multizoom_by_shift doc). The quadtree definition is the
correct one HERE regardless: a split tree must nest exactly, so the
ancestor relation — not the per-zoom float formula — is the spec.

No reference counterpart (pka/tile-grid enumerates fixed-zoom covers,
src/tms.rs:734-815); this is the density-balanced extension a
web-scale image+caption corpus needs for shard sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.tms import Tms
from ..functions.grid_cols import tile_key, with_tile


def adaptive_density_tiles(
    points: DataFrame,
    tms: Tms,
    max_per_tile: int,
    z_min: int = 0,
    z_max: int = 12,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Leaf tiles (zoom, tile_x, tile_y, n_points) of the adaptive
    quadtree refinement of `points`.

    A tile is a leaf iff its count is <= max_per_tile (or it sits at
    z_max, where the budget is exhausted and the count may exceed the
    bound) AND its parent was split (parent count > max_per_tile; at
    z_min there is no parent). Leaves partition the points: summing
    n_points over the output equals the input row count, and no leaf
    is an ancestor of another — both property-tested.
    """
    if z_min < 0 or z_max < z_min:
        raise ValueError(f"need 0 <= z_min <= z_max, got {z_min}..{z_max}")
    if max_per_tile < 1:
        raise ValueError(f"max_per_tile must be >= 1, got {max_per_tile}")
    base = with_tile(points, tms, z_max, lon=lon, lat=lat)
    counts = base.groupBy("tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_points")
    )
    level = counts.withColumn("zoom", F.lit(z_max))
    frames = [level]
    for z in range(z_max - 1, z_min - 1, -1):
        level = (
            level.select(
                F.shiftright("tile_x", 1).alias("tile_x"),
                F.shiftright("tile_y", 1).alias("tile_y"),
                "n_points",
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.sum("n_points").alias("n_points"))
            .withColumn("zoom", F.lit(z))
        )
        frames.append(level)
    all_levels = frames[0]
    for fr in frames[1:]:
        all_levels = all_levels.unionByName(fr)
    # child -> parent self-join on the packed key (zoom fits the 6-bit
    # field for z_max <= 28, the tile_key contract)
    parents = all_levels.select(
        tile_key("tile_x", "tile_y", F.col("zoom")).alias("_pk"),
        F.col("n_points").alias("_parent_n"),
    )
    children = all_levels.withColumn(
        "_ck",
        tile_key(
            F.shiftright("tile_x", 1), F.shiftright("tile_y", 1), F.col("zoom") - 1
        ),
    )
    joined = children.join(parents, children["_ck"] == parents["_pk"], "left")
    k = F.lit(int(max_per_tile))
    is_leaf = ((F.col("n_points") <= k) | (F.col("zoom") == z_max)) & (
        (F.col("zoom") == z_min) | (F.col("_parent_n") > k)
    )
    return joined.filter(is_leaf).select("zoom", "tile_x", "tile_y", "n_points")

"""Mergeable distinct-count sketches per tile (HLL pyramid rollup).

COUNT(DISTINCT) at 100 TB is a full shuffle of every distinct value per
group — and it cannot roll up (distinct counts are not additive across
pyramid levels). The scale shape is a MERGEABLE sketch: build one HLL
sketch per tile at the finest zoom (Spark's Datasketches-backed
hll_sketch_agg, JVM-side), then derive every coarser level by sketch
UNION (hll_union_agg) over the child tiles — |tiles| rows of kilobyte
sketches per level instead of rescanning raw rows. Union is lossless
with respect to the underlying set union: rolling z10 sketches up to z8
gives the SAME estimate as sketching the z8 groups directly (pytest
pins this, plus the estimate-vs-exact error bound).

Exact variants are provided for oracle checks / small groups.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_distinct_exact(
    df: DataFrame,
    value: str,
    keys: Sequence[str] = ("tile_x", "tile_y"),
    out: str = "n_distinct",
) -> DataFrame:
    """Exact per-tile distinct count (shuffle-heavy; the baseline the
    sketch path is validated against, and the oracle-checkable form)."""
    return df.groupBy(*keys).agg(F.count_distinct(F.col(value)).alias(out))


def tile_hll_sketches(
    df: DataFrame,
    value: str,
    keys: Sequence[str] = ("tile_x", "tile_y"),
    lg_k: int = 12,
    out: str = "sketch",
) -> DataFrame:
    """Per-tile HLL sketch of `value` (binary column, ~2^lg_k bytes max).
    Map-side partial sketches combine in the shuffle, so the network
    carries sketches, not values."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value), F.lit(lg_k)).alias(out)
    )


def hll_pyramid(
    sketches: DataFrame,
    base_zoom: int,
    zooms: Sequence[int],
    tile_x: str = "tile_x",
    tile_y: str = "tile_y",
    sketch: str = "sketch",
    zoom_col: str = "zoom",
) -> DataFrame:
    """Roll per-tile sketches up a quadtree pyramid by sketch union —
    the cascading pyramid is operators/rollup.tile_pyramid with
    hll_union_agg as the re-aggregation (sketch union is the metric's
    associative combine). Output: (zoom, tile_x, tile_y, sketch,
    n_distinct_est) for the base and every requested level."""
    from .rollup import tile_pyramid

    out = tile_pyramid(
        sketches.select(tile_x, tile_y, F.col(sketch).alias(sketch)),
        base_zoom,
        zooms,
        {sketch: F.hll_union_agg(F.col(sketch))},
        tile_x=tile_x,
        tile_y=tile_y,
        zoom_col=zoom_col,
        cascade=True,
    )
    return out.withColumn(
        "n_distinct_est", F.hll_sketch_estimate(F.col(sketch))
    )

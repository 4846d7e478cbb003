"""Mergeable sketches per tile: HLL distinct-count + count-min frequency.

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


# ---------------------------------------------------------------------------
# count-min: mergeable FREQUENCY sketch per tile
# ---------------------------------------------------------------------------

def cm_bucket(value, seed: int, width: int) -> F.Column:
    """Count-min bucket for hash row `seed`: 60-bit md5 family
    (operators.dedup.md5_hash60 — the engine's portable seeded hash;
    xxhash64 has no DuckDB twin) mod `width`."""
    from .dedup import md5_hash60

    return F.pmod(md5_hash60(F.col(value) if isinstance(value, str) else value,
                             prefix=f"cm{seed}"), F.lit(width)).cast("int")


def tile_cm_sketch(
    df: DataFrame,
    value: str,
    keys: Sequence[str] = ("tile_x", "tile_y"),
    depth: int = 4,
    width: int = 256,
    out: str = "cms",
) -> DataFrame:
    """Per-key count-min sketch (Cormode & Muthukrishnan) as a DENSE
    array<bigint> of depth*width counters — the mergeable frequency twin
    of the HLL distinct sketch: point-frequency estimates within
    eps = e/width of the group total (w.h.p. over `depth` rows), and
    merge across keys/pyramid levels is plain elementwise sum
    (`cm_merge_expr`), so coarser zooms roll up from child SKETCHES.

    Build shape: each record explodes to `depth` (row, bucket) pairs,
    counts aggregate per (key, row, bucket) with map-side partial agg
    (the shuffle carries at most depth*width rows per key, not raw
    records), and the dense vector assembles via one map lookup per
    slot. 100-TB posture: network cost per tile is bounded by the
    sketch size, independent of row count — same contract as HLL."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"), cm_bucket(value, r, width).alias("b")
            )
            for r in range(depth)
        ]
    )
    ex = df.select(*keys, F.explode(rows).alias("_rb"))
    cnt = ex.groupBy(
        *keys, F.col("_rb.r").alias("_r"), F.col("_rb.b").alias("_b")
    ).agg(F.count("*").alias("_c"))
    m = F.map_from_entries(
        F.collect_list(
            F.struct(
                (F.col("_r") * width + F.col("_b")).alias("k"), F.col("_c").alias("v")
            )
        )
    )
    # try_element_at, not element_at: a missing map key is a normal
    # zero counter here, but ANSI mode (the driver's default) makes
    # element_at raise MAP_KEY_DOES_NOT_EXIST
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("_m"), i), F.lit(0).cast("long")),
    )
    return (
        cnt.groupBy(*keys)
        .agg(m.alias("_m"))
        .withColumn(out, dense)
        .drop("_m")
    )


def cm_merge_expr(a, b) -> F.Column:
    """Merge two count-min sketches (same depth/width): elementwise sum."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cm_estimate_expr(cms, value, depth: int, width: int) -> F.Column:
    """Point-frequency estimate: min over rows of the value's counter.
    Always >= the true count; <= true + e/width * N w.h.p."""
    return F.least(
        *[
            F.element_at(cms, F.lit(1) + F.lit(r * width) + cm_bucket(value, r, width))
            for r in range(depth)
        ]
    )


def cm_pyramid_level(
    sketches: DataFrame,
    depth: int = 4,
    width: int = 256,
    tile_x: str = "tile_x",
    tile_y: str = "tile_y",
    cms: str = "cms",
) -> DataFrame:
    """One pyramid step z -> z-1 by SKETCH merge: children re-key to the
    parent tile (quadtree halving) and counters sum elementwise — via
    explode to (slot, count) + re-agg + reassemble, so the combine is a
    plain partial-aggregable SUM (an array-valued reduce would not
    combine map-side). Zero slots are elided from the shuffle and
    restored on assembly (the dense output is always depth*width long —
    estimates index it directly, and under ANSI mode a short array would
    be an element_at error, not a silent NULL). Shuffle volume:
    <= depth*width non-zero rows per parent."""
    ex = sketches.select(
        (F.col(tile_x) / 2).cast("bigint").alias(tile_x),
        (F.col(tile_y) / 2).cast("bigint").alias(tile_y),
        F.posexplode(cms).alias("_k", "_c"),
    ).filter(F.col("_c") != 0)
    cnt = ex.groupBy(tile_x, tile_y, "_k").agg(F.sum("_c").alias("_c"))
    n = cnt.groupBy(tile_x, tile_y).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_k").alias("k"), F.col("_c").alias("v")))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(depth * width - 1)),
        lambda i: F.coalesce(F.try_element_at(F.col("_m"), i), F.lit(0).cast("long")),
    )
    return n.withColumn(cms, dense).drop("_m")

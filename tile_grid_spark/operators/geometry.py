"""Planar polygon metrics over exploded ring-vertex tables.

The engine's polygon inputs (GeoJSON layers, the ring tiler) are
vertex-exploded frames — (poly_id, ring_idx, vert_idx, lon, lat) — and
at 100 TB that stays the right layout: geometry columns would drag every
vertex through every shuffle, while metrics reduce each ring to a
handful of doubles in ONE hash exchange on the polygon key.

All math is the classic shoelace family (signed area, area-weighted
centroid, perimeter, winding), computed as sequential HOF folds over
vert_idx-sorted vertex arrays — the same left-to-right order DuckDB's
list_sum uses, so oracles replay every double bit-for-bit. No UDFs,
no collect: the folds run inside whole-stage codegen.

Reference geometry context: the reference library is tile/bbox math
only (src/tms.rs bbox handling); polygon metrics extend the engine's
GeoJSON/PIP surface (operators/pip_join.py ray-cast semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rot(vs: F.Column) -> F.Column:
    """Cyclic shift by one: [v1..vn] -> [v2..vn, v1] (pairs each vertex
    with its ring successor; rings are stored OPEN, last != first)."""
    return F.concat(F.slice(vs, 2, F.size(vs) - 1), F.slice(vs, 1, 1))


def ring_metrics(
    vertices: DataFrame,
    id_col: str = "poly_id",
    ring_col: str = "ring_idx",
    seq_col: str = "vert_idx",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-ring shoelace metrics: signed doubled area (`area2`, positive
    = counter-clockwise), perimeter, centroid numerators (`cx2`/`cy2`,
    the standard (x_i + x_{i+1})·cross_i sums — divide by 3·area2 for
    the ring centroid), vertex count. One exchange: groupBy collects the
    ring's vertices into a vert_idx-sorted array; every fold after that
    is a projection."""
    vs = F.array_sort(
        F.collect_list(F.struct(F.col(seq_col).alias("s"), F.col(lon).alias("x"), F.col(lat).alias("y")))
    )
    rings = vertices.groupBy(id_col, ring_col).agg(vs.alias("_vs"))
    edges = F.zip_with("_vs", _rot(F.col("_vs")), lambda a, b: F.struct(
        (a["x"] * b["y"] - b["x"] * a["y"]).alias("cross"),
        ((a["x"] + b["x"]) * (a["x"] * b["y"] - b["x"] * a["y"])).alias("cxt"),
        ((a["y"] + b["y"]) * (a["x"] * b["y"] - b["x"] * a["y"])).alias("cyt"),
        F.sqrt(
            (b["x"] - a["x"]) * (b["x"] - a["x"])
            + (b["y"] - a["y"]) * (b["y"] - a["y"])
        ).alias("elen"),
    ))
    folded = rings.withColumn("_e", edges).select(
        id_col,
        ring_col,
        F.size("_vs").alias("n_vertices"),
        F.aggregate("_e", F.lit(0.0), lambda s, e: s + e["cross"]).alias("area2"),
        F.aggregate("_e", F.lit(0.0), lambda s, e: s + e["cxt"]).alias("cx2"),
        F.aggregate("_e", F.lit(0.0), lambda s, e: s + e["cyt"]).alias("cy2"),
        F.aggregate("_e", F.lit(0.0), lambda s, e: s + e["elen"]).alias("perimeter"),
    )
    return folded


def polygon_metrics(
    vertices: DataFrame,
    id_col: str = "poly_id",
    ring_col: str = "ring_idx",
    seq_col: str = "vert_idx",
    lon: str = "lon",
    lat: str = "lat",
    round_digits: int = 9,
) -> DataFrame:
    """Per-polygon metrics from a multi-ring vertex table (ring 0 =
    exterior, others = holes, any stored winding):

    - `area` = |exterior|/2 − Σ|hole|/2 (orientation-insensitive)
    - `perimeter` = all rings (boundary length incl. hole boundaries)
    - `winding` = exterior stored orientation ('ccw' | 'cw')
    - `ctr_lon`/`ctr_lat` = EXTERIOR ring centroid (cx2 / (3·area2);
      hole-aware mass centroids need hole orientation conventions the
      storage doesn't promise — the exterior centroid is the stable,
      convention-free choice and is what label placement wants)
    - `n_rings`, `n_vertices`

    Second exchange only on the polygon key (ring rows are tiny).
    Degenerate rings (< 3 vertices, zero area) pass through with
    area 0 and a NULL centroid."""
    r = ring_metrics(vertices, id_col, ring_col, seq_col, lon, lat)
    is_ext = F.col(ring_col) == 0
    area_term = F.when(is_ext, F.abs(F.col("area2")) / 2.0).otherwise(
        -F.abs(F.col("area2")) / 2.0
    )
    ext_ctr_x = F.when(
        is_ext & (F.col("area2") != 0.0), F.col("cx2") / (3.0 * F.col("area2"))
    )
    ext_ctr_y = F.when(
        is_ext & (F.col("area2") != 0.0), F.col("cy2") / (3.0 * F.col("area2"))
    )
    winding = F.when(is_ext, F.when(F.col("area2") > 0, "ccw").otherwise("cw"))
    out = (
        r.groupBy(id_col)
        .agg(
            F.round(F.sum(area_term), round_digits).alias("area"),
            F.round(F.sum("perimeter"), round_digits).alias("perimeter"),
            F.max(winding).alias("winding"),
            F.round(F.max(ext_ctr_x), 6).alias("ctr_lon"),
            F.round(F.max(ext_ctr_y), 6).alias("ctr_lat"),
            F.count("*").alias("n_rings"),
            F.sum("n_vertices").alias("n_vertices"),
        )
    )
    return out

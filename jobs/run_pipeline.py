"""End-to-end resumable tiling pipeline (spark-submit entry point).

Usage (local):
    python jobs/run_pipeline.py --out /tmp/tgs_out --rows 20000 --zooms 0-8

Production:
    spark-submit --py-files tile_grid_spark.zip jobs/run_pipeline.py \
        --out s3://bucket/tiles --images <iceberg table> --zooms 0-14

Stages (each resumable via per-partition lineage, see plans/lineage.py):
  ingest   - synthesize (or read) the image+caption table
  assign   - tile assignment per zoom, written partitioned by zoom,
             range-sorted by (tile_x, tile_y)
  stats    - per-tile density aggregate with measured salting
  raster   - per-tile density masks at the deepest zoom

Re-running the same command after an interruption skips completed units
(check the `_lineage` parquet for the audit trail).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.functions import grid_cols as G
from tile_grid_spark.operators.raster import rasterize_points
from tile_grid_spark.plans.lineage import LineageLog, run_stage
from tile_grid_spark.plans.session import build_session
from tile_grid_spark.plans.skew import measure_tile_skew, salted_tile_agg, skew_stats
from tile_grid_spark.sources.datagen import generate_images


def parse_zooms(s: str) -> list[int]:
    if "-" in s:
        a, b = s.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(x) for x in s.split(",")]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--images", default=None, help="parquet path of an existing images table")
    ap.add_argument("--zooms", default="0-8")
    ap.add_argument("--raster-zoom", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    zooms = parse_zooms(args.zooms)
    spark = build_session("tgs-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    wm = tms().lookup("WebMercatorQuad")
    log = LineageLog(spark, args.out)

    # ---- ingest ----
    images_path = os.path.join(args.out, "ingest", "unit=images")

    def build_images(_unit: str):
        if args.images:
            return spark.read.parquet(args.images)
        return generate_images(spark, args.rows, seed=args.seed)

    r = run_stage(spark, log, "ingest", ["images"], build_images)
    print(f"[ingest] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")
    images = spark.read.parquet(images_path)

    # ---- assign (unit per zoom) ----
    def build_assign(unit: str):
        z = int(unit)
        out = G.with_tile(images.select("image_id", "lon", "lat"), wm, z)
        return (
            out.withColumn("zoom", F.lit(z))
            .repartitionByRange(max(spark.sparkContext.defaultParallelism, 8), "tile_x", "tile_y")
            .sortWithinPartitions("tile_x", "tile_y")
        )

    r = run_stage(spark, log, "assign", [str(z) for z in zooms], build_assign)
    print(f"[assign] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")

    # ---- stats (salted per-tile aggregate over the deepest zoom) ----
    deep = max(zooms)
    assigned = spark.read.parquet(os.path.join(args.out, "assign", f"unit={deep}"))

    def build_stats(_unit: str):
        counts = measure_tile_skew(assigned.withColumn("zoom", F.lit(deep)))
        print("[stats] skew profile:", skew_stats(counts))
        return salted_tile_agg(
            assigned.withColumn("zoom", F.lit(deep)),
            {"n_images": (F.count("*"), F.sum("n_images"))},
            counts=counts,
            target_rows_per_task=1_000_000,
            id_col="image_id",
        )

    r = run_stage(spark, log, "stats", [f"z{deep}"], build_stats)
    print(f"[stats] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")

    # ---- pyramid (cascading rollup of the per-tile stats) ----
    from tile_grid_spark.operators.rollup import tile_pyramid

    coarser = sorted({z for z in zooms if z < deep}, reverse=True)[:3]

    def build_pyramid(_unit: str):
        base = spark.read.parquet(
            os.path.join(args.out, "stats", f"unit=z{deep}")
        ).select("tile_x", "tile_y", "n_images")
        return tile_pyramid(base, deep, coarser, {"n_images": F.sum("n_images")})

    if coarser:
        r = run_stage(spark, log, "pyramid", [f"z{deep}->z{min(coarser)}"], build_pyramid)
        print(f"[pyramid] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")

    # ---- distinct-capture sketch (mergeable HLL per tile) ----
    from tile_grid_spark.operators.sketches import tile_hll_sketches

    def build_sketches(_unit: str):
        t = assigned.withColumn("zoom", F.lit(deep))
        sk = tile_hll_sketches(t, "image_id", keys=("zoom", "tile_x", "tile_y"))
        return sk.select(
            "zoom", "tile_x", "tile_y",
            F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
        )

    r = run_stage(spark, log, "sketches", [f"z{deep}"], build_sketches)
    print(f"[sketches] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")

    # ---- raster ----
    rz = args.raster_zoom if args.raster_zoom is not None else min(max(zooms), 6)

    def build_raster(_unit: str):
        return rasterize_points(images, wm, rz)

    r = run_stage(spark, log, "raster", [f"z{rz}"], build_raster)
    print(f"[raster] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")

    print("[lineage]")
    log.summary().orderBy("ts").show(50, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()

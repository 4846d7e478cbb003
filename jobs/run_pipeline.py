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
  hotspot  - Getis-Ord Gi* significance layer per deep-zoom tile
  pyramid  - cascading rollup of the per-tile stats
  sketches - mergeable HLL distinct sketches per tile
  polys    - deterministic polygon layer (second input table)
  pip      - point-in-polygon join images x polys on the SHUFFLE path
             (multi-input, shuffle-bearing — the resume shapes that
             matter at scale)
  dedup    - MinHash+LSH caption near-dup pairs (banded shuffle)
  cluster  - pairs -> connected components -> keep-one verdicts
  export   - dedup-filtered, caption-length-stratified sample written
             as deterministic training shards + manifest
  raster   - per-tile density masks at the deepest zoom

Re-running the same command after an interruption skips completed units
(check the `_lineage` parquet for the audit trail). `stop_after=<stage>`
simulates a crash right after a stage for the resume tests.
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


def run_pipeline(
    spark,
    out: str,
    rows: int = 20000,
    images_in: str | None = None,
    zooms: list[int] | None = None,
    raster_zoom: int | None = None,
    seed: int = 42,
    n_polys: int = 200,
    stop_after: str | None = None,
    verbose: bool = True,
):
    """Run (or resume) every stage; returns {stage: StageResult}.
    `stop_after` returns right after the named stage — the crash-resume
    tests use it to prove later runs skip completed shuffle stages."""
    zooms = zooms or list(range(0, 9))
    wm = tms().lookup("WebMercatorQuad")
    log = LineageLog(spark, out)
    results = {}

    def report(name, r):
        results[name] = r
        if verbose:
            print(f"[{name}] ran={r.ran_units} skipped={r.skipped_units} rows={r.rows}")
        return stop_after == name

    # ---- ingest ----
    images_path = os.path.join(out, "ingest", "unit=images")

    def build_images(_unit: str):
        if images_in:
            return spark.read.parquet(images_in)
        return generate_images(spark, rows, seed=seed)

    r = run_stage(spark, log, "ingest", ["images"], build_images)
    if report("ingest", r):
        return results
    images = spark.read.parquet(images_path)

    # ---- assign (unit per zoom) ----
    def build_assign(unit: str):
        z = int(unit)
        out_df = G.with_tile(images.select("image_id", "lon", "lat"), wm, z)
        return (
            out_df.withColumn("zoom", F.lit(z))
            .repartitionByRange(max(spark.sparkContext.defaultParallelism, 8), "tile_x", "tile_y")
            .sortWithinPartitions("tile_x", "tile_y")
        )

    r = run_stage(spark, log, "assign", [str(z) for z in zooms], build_assign)
    if report("assign", r):
        return results

    # ---- stats (salted per-tile aggregate over the deepest zoom) ----
    deep = max(zooms)
    assigned = spark.read.parquet(os.path.join(out, "assign", f"unit={deep}"))

    def build_stats(_unit: str):
        counts = measure_tile_skew(assigned.withColumn("zoom", F.lit(deep)))
        if verbose:
            print("[stats] skew profile:", skew_stats(counts))
        return salted_tile_agg(
            assigned.withColumn("zoom", F.lit(deep)),
            {"n_images": (F.count("*"), F.sum("n_images"))},
            counts=counts,
            target_rows_per_task=1_000_000,
            id_col="image_id",
        )

    r = run_stage(spark, log, "stats", [f"z{deep}"], build_stats)
    if report("stats", r):
        return results

    # ---- hotspot (Gi* significance layer over the deep-zoom tiles) ----
    def build_hotspot(_unit: str):
        from tile_grid_spark.operators.hotspot import getis_ord_gi_star

        return getis_ord_gi_star(images.select("lon", "lat"), wm, deep)

    r = run_stage(spark, log, "hotspot", [f"z{deep}"], build_hotspot)
    if report("hotspot", r):
        return results

    # ---- pyramid (cascading rollup of the per-tile stats) ----
    from tile_grid_spark.operators.rollup import tile_pyramid

    coarser = sorted({z for z in zooms if z < deep}, reverse=True)[:3]

    def build_pyramid(_unit: str):
        base = spark.read.parquet(
            os.path.join(out, "stats", f"unit=z{deep}")
        ).select("tile_x", "tile_y", "n_images")
        return tile_pyramid(base, deep, coarser, {"n_images": F.sum("n_images")})

    if coarser:
        r = run_stage(spark, log, "pyramid", [f"z{deep}->z{min(coarser)}"], build_pyramid)
        if report("pyramid", r):
            return results

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
    if report("sketches", r):
        return results

    # ---- polys (second input table for the multi-input join stage) ----
    from tile_grid_spark.operators.pip_join import generate_polygons, pip_join

    def build_polys(_unit: str):
        return generate_polygons(spark, n_polys, seed=seed + 1)

    r = run_stage(spark, log, "polys", ["layer"], build_polys)
    if report("polys", r):
        return results

    # ---- pip (shuffle-bearing, multi-input: ingest output x polys output) ----
    pip_zoom = min(deep, 8)

    def build_pip(_unit: str):
        polys = spark.read.parquet(os.path.join(out, "polys", "unit=layer"))
        pts = images.select("image_id", "lon", "lat")
        # broadcast_polys=False: the tile-key SHUFFLE join path (rings
        # re-attached by poly_id after the narrow prefilter) — resume must
        # be proven on the plan shape that runs at 100 TB, not only on
        # narrow map-side stages
        return pip_join(pts, polys, wm, pip_zoom, broadcast_polys=False)

    r = run_stage(spark, log, "pip", [f"z{pip_zoom}"], build_pip)
    if report("pip", r):
        return results

    # ---- dedup (banded-shuffle caption near-dups) ----
    from tile_grid_spark.operators.dedup import minhash_lsh_pairs

    def build_dedup(_unit: str):
        docs = images.select(
            F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
        )
        return minhash_lsh_pairs(docs, k=16, bands=8, jaccard_threshold=0.4)

    r = run_stage(spark, log, "dedup", ["captions"], build_dedup)
    if report("dedup", r):
        return results

    # ---- cluster (pairs -> components -> keep-one mapping) ----
    from tile_grid_spark.operators.cluster import connected_components

    def build_cluster(_unit: str):
        pairs = spark.read.parquet(os.path.join(log.root, "dedup", "unit=captions"))
        nodes = images.select(F.col("image_id").alias("id"))
        comp = connected_components(pairs, "id_a", "id_b", nodes=nodes)
        # the dedup verdict: keep component representatives only
        return comp.withColumn("keep", F.col("node") == F.col("component"))

    r = run_stage(spark, log, "cluster", ["components"], build_cluster)
    if report("cluster", r):
        return results

    # ---- export (dedup verdicts -> stratified sample -> training shards) ----
    from tile_grid_spark.operators.sample import stratified_sample
    from tile_grid_spark.sources.io import write_training_shards

    def build_export(_unit: str):
        keep = spark.read.parquet(
            os.path.join(log.root, "cluster", "unit=components")
        ).filter(F.col("keep"))
        corpus = images.join(
            keep.select(F.col("node").alias("image_id")), "image_id"
        )
        # caption-length strata: keep every long-caption image, half of
        # the short ones — md5-threshold verdicts, so a resumed or
        # incremental export re-selects the identical sample
        strata = F.when(F.length("caption") >= 40, F.lit("long")).otherwise(
            F.lit("short")
        )
        sampled = stratified_sample(
            corpus, "image_id", strata, {"long": 1.0}, default_rate=0.5,
            seed="export",
        )
        manifest = write_training_shards(
            sampled.select("image_id", "caption", "w", "h", "fmt"),
            os.path.join(out, "export_shards"),
            n_shards=4,
            id_col="image_id",
            sort_cols=("image_id",),
        )
        return spark.createDataFrame(
            [
                (int(s), int(v["rows"]), str(v["fingerprint"]))
                for s, v in sorted(manifest["shards"].items())
            ],
            "shard INT, n_rows BIGINT, fingerprint STRING",
        )

    r = run_stage(spark, log, "export", ["shards"], build_export)
    if report("export", r):
        return results

    # ---- raster (point density + image-footprint coverage units) ----
    rz = raster_zoom if raster_zoom is not None else min(deep, 6)

    def build_raster(unit: str):
        if unit.startswith("fp-"):
            from tile_grid_spark.operators.raster import rasterize_footprints

            return rasterize_footprints(images, wm, rz, ground_px_m=100.0)
        return rasterize_points(images, wm, rz)

    r = run_stage(spark, log, "raster", [f"z{rz}", f"fp-z{rz}"], build_raster)
    if report("raster", r):
        return results

    # ---- mvt (vector-tile payload export: the served artifact) ----
    def build_mvt(unit: str):
        from tile_grid_spark.operators.vector_tiles import encode_point_tiles

        # MVT feature ids are u64 in the spec; image_id is "img-%012d"
        # (datagen.py:113), so the numeric suffix is the natural fid.
        # Format + caption length ride along as tag-dictionary attrs.
        return encode_point_tiles(
            images.select(
                F.substring("image_id", 5, 12).cast("bigint").alias("pid"),
                F.col("lon"),
                F.col("lat"),
                F.col("fmt"),
                F.length("caption").cast("bigint").alias("caption_len"),
            ),
            wm,
            rz,
            attr_cols=("fmt", "caption_len"),
        )

    r = run_stage(spark, log, "mvt", [f"z{rz}"], build_mvt)
    if report("mvt", r):
        return results

    # ---- mvt_pyramid (serve the upper zooms from the child binaries) ----
    def build_mvt_pyramid(unit: str):
        from tile_grid_spark.operators.vector_tiles import rollup_point_tiles

        levels = rz - int(unit[1:])
        base = spark.read.parquet(os.path.join(out, "mvt", f"unit=z{rz}"))
        return rollup_point_tiles(base, levels=levels)

    up_units = [f"z{z}" for z in range(max(rz - 3, 0), rz)]
    if up_units:
        r = run_stage(spark, log, "mvt_pyramid", up_units, build_mvt_pyramid)
        report("mvt_pyramid", r)
    results["_log"] = log
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--images", default=None, help="parquet path of an existing images table")
    ap.add_argument("--zooms", default="0-8")
    ap.add_argument("--raster-zoom", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = build_session("tgs-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    results = run_pipeline(
        spark,
        args.out,
        rows=args.rows,
        images_in=args.images,
        zooms=parse_zooms(args.zooms),
        raster_zoom=args.raster_zoom,
        seed=args.seed,
    )
    print("[lineage]")
    results["_log"].summary().orderBy("ts").show(50, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()

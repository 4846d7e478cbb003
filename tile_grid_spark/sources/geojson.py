"""GeoJSON polygon-layer source.

A reference user's polygon layers arrive as GeoJSON (the reference
emits GeoJSON features the other way — `bbox_to_feature`,
src/tile.rs:130-160); this reader turns a FeatureCollection (or a
newline-delimited feature sequence) into the engine's ring-array
polygon schema:

    (feature_id STRING, poly_id BIGINT, ring_lon ARRAY<DOUBLE>,
     ring_lat ARRAY<DOUBLE>, properties STRING)

Polygon -> one row per part; holes either dropped with a counter
(default) or encoded into the flat ring arrays as NaN-separated closed
rings (`holes="evenodd"` — the engine's even-odd ray cast then
excludes hole interiors with no operator changes). MultiPolygon ->
one row per part (poly_id disambiguates).

Scale shape: file listing and JSON decode run DISTRIBUTED via
spark.read.text + a mapInPandas parser (one feature per line for NDJSON
/ GeoJSONSeq, the format large layers actually ship in). A single
monolithic FeatureCollection cannot be line-split; those are parsed
driver-side (they are by definition small enough to be one JSON
document) and parallelized."""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

POLYGON_SCHEMA = (
    "feature_id STRING, poly_id BIGINT, ring_lon ARRAY<DOUBLE>, "
    "ring_lat ARRAY<DOUBLE>, properties STRING, n_holes_dropped INT"
)


def _rows_from_feature(feat: dict, idx: int, holes: str = "drop"):
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    fid = str(feat.get("id", f"feature-{idx}"))
    props = json.dumps(feat.get("properties") or {}, sort_keys=True)
    if gtype == "Polygon":
        parts = [geom.get("coordinates") or []]
    elif gtype == "MultiPolygon":
        parts = geom.get("coordinates") or []
    else:
        return
    for p, rings in enumerate(parts):
        if not rings:
            continue
        if holes == "evenodd" and len(rings) > 1:
            # NaN-separated multi-ring encoding: the ray-cast even-odd
            # parity over concatenated CLOSED rings subtracts holes for
            # free — bridge edges touching the NaN sentinel can never
            # register a crossing (px < NaN is false), so the flat array
            # behaves exactly like the ring set. Rings MUST be closed
            # (GeoJSON guarantees first == last).
            lon_arr: list[float] = []
            lat_arr: list[float] = []
            for k, ring in enumerate(rings):
                if k:
                    lon_arr.append(float("nan"))
                    lat_arr.append(float("nan"))
                lon_arr.extend(float(c[0]) for c in ring)
                lat_arr.extend(float(c[1]) for c in ring)
            dropped = 0
        else:
            outer = rings[0]
            lon_arr = [float(c[0]) for c in outer]
            lat_arr = [float(c[1]) for c in outer]
            dropped = len(rings) - 1
        yield {
            "feature_id": fid,
            "poly_id": p,
            "ring_lon": lon_arr,
            "ring_lat": lat_arr,
            "properties": props,
            "n_holes_dropped": dropped,
        }


def read_geojson(spark: SparkSession, path: str, holes: str = "drop") -> DataFrame:
    """Read a GeoJSON layer into the ring-array polygon schema.

    `path` may be a single .geojson file (FeatureCollection — parsed
    driver-side, parallelized) or a file/glob of newline-delimited
    features (GeoJSONSeq / NDJSON — parsed distributed).

    `holes`: "drop" (default) keeps outer rings only and counts dropped
    interior rings; "evenodd" encodes holes into the same flat ring
    arrays with NaN separators — the engine's even-odd ray cast then
    excludes hole interiors with no operator changes (with_ring_bbox is
    NaN-safe)."""
    if holes not in ("drop", "evenodd"):
        raise ValueError(f"holes must be 'drop' or 'evenodd', got {holes!r}")
    head = spark.read.text(path).limit(1).collect()
    # normalize BEFORE the '{' check: GeoJSONSeq lines carry an \x1e
    # record-separator prefix (RFC 8142) and must still route to the
    # distributed line parser
    first = head[0].value.strip().lstrip("\x1e").strip() if head else ""
    # A FeatureCollection opens with a '{' whose document spans ALL
    # lines; NDJSON lines are each a complete feature object.
    is_ndjson = False
    if first.startswith("{"):
        try:
            is_ndjson = json.loads(first).get("type") == "Feature"
        except ValueError:
            is_ndjson = False

    if is_ndjson:
        lines = spark.read.text(path)

        import hashlib

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for b in batches:
                out = []
                for line in b["value"]:
                    line = line.strip().lstrip("\x1e").rstrip(",")
                    if not line:
                        continue
                    feat = json.loads(line)
                    # fallback id for id-less features must be unique
                    # ACROSS batches/partitions/files (a batch-local
                    # index collides) and stable under repartitioning:
                    # hash the feature content. Identical id-less
                    # features collapse to one id — same rings, so PIP
                    # results are unchanged.
                    if "id" not in feat:
                        feat = dict(feat)
                        feat["id"] = (
                            "feature-"
                            + hashlib.md5(line.encode()).hexdigest()[:16]
                        )
                    out.extend(_rows_from_feature(feat, 0, holes))
                yield pd.DataFrame(
                    out,
                    columns=[
                        "feature_id", "poly_id", "ring_lon", "ring_lat",
                        "properties", "n_holes_dropped",
                    ],
                )

        return lines.mapInPandas(parse, POLYGON_SCHEMA)

    # monolithic FeatureCollection: one JSON document per file, driver
    # parse. Files are fetched via sc.wholeTextFiles — the Hadoop FS API
    # — so the same s3a://, hdfs://, or glob path that works for the
    # NDJSON branch works here too (a local open()/glob would silently
    # read nothing on a non-local filesystem). Sorted by path so poly_id
    # assignment is deterministic across runs.
    docs = sorted(spark.sparkContext.wholeTextFiles(path).collect())
    rows = []
    i = 0
    for _p, text in docs:
        doc = json.loads(text)
        feats = doc.get("features", [doc] if doc.get("type") == "Feature" else [])
        for feat in feats:
            rows.extend(_rows_from_feature(feat, i, holes))
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows), POLYGON_SCHEMA) if rows else (
        spark.createDataFrame([], POLYGON_SCHEMA)
    )

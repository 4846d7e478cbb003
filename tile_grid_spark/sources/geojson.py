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
from pyspark.sql import functions as F

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


# FeatureCollection documents are parsed ON THE DRIVER (a single JSON
# document cannot be line-split); refuse to collect more than this many
# bytes — convert to NDJSON/GeoJSONSeq for the distributed path instead.
MAX_FEATURECOLLECTION_BYTES = 256 * 1024 * 1024


def _fc_total_bytes(spark: SparkSession, path: str) -> int:
    """Total size (metadata only, nothing read) of the files `path`
    resolves to, via the same Hadoop FS API wholeTextFiles uses — so
    s3a://, hdfs:// and globs are all sized correctly."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    total = 0
    statuses = fs.globStatus(hpath)
    if statuses is None:
        return 0
    for st in statuses:
        if st.isDirectory():
            for child in fs.listStatus(st.getPath()):
                if child.isFile():
                    total += child.getLen()
        else:
            total += st.getLen()
    return total


def read_geojson(spark: SparkSession, path: str, holes: str = "drop") -> DataFrame:
    """Read a GeoJSON layer into the ring-array polygon schema.

    `path` may be a single .geojson file (FeatureCollection — parsed
    driver-side, parallelized, capped at MAX_FEATURECOLLECTION_BYTES)
    or a file/glob of newline-delimited features (GeoJSONSeq / NDJSON —
    parsed distributed, unbounded).

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
    # assignment is deterministic across runs. Guarded: the collect is
    # driver-memory bound, so refuse oversized layers up front (metadata
    # check, nothing read) instead of OOMing mid-parse.
    total = _fc_total_bytes(spark, path)
    if total > MAX_FEATURECOLLECTION_BYTES:
        raise ValueError(
            f"read_geojson: FeatureCollection layer at {path!r} is "
            f"{total} bytes (> {MAX_FEATURECOLLECTION_BYTES} driver-parse "
            "cap). Convert to newline-delimited GeoJSON (GeoJSONSeq / one "
            "Feature per line) — read_geojson parses that form fully "
            "distributed with no size limit."
        )
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


def write_geojson_bbox_features(
    df: DataFrame,
    path: str,
    feature_id: str = "feature_id",
    minx: str = "minx",
    miny: str = "miny",
    maxx: str = "maxx",
    maxy: str = "maxy",
    prop_cols: tuple[str, ...] = (),
    mode: str = "error",
) -> None:
    """GeoJSON SINK — the reference's bbox_to_feature direction
    (src/tile.rs:130-160) distributed: each row becomes one
    newline-delimited GeoJSON Feature whose geometry is the bbox
    polygon (CCW exterior ring, closed: [[w,s],[e,s],[e,n],[w,n],
    [w,s]]), with `prop_cols` carried under properties plus the id.

    Feature construction is a pure native-Column to_json projection —
    zero shuffle, one output file per input partition, and the NDJSON
    layout is exactly what read_geojson's distributed branch parses, so
    engine output round-trips through the engine's own reader
    (pytest-gated ring-for-ring)."""
    F_ = F
    w, s, e, n = (F_.col(c).cast("double") for c in (minx, miny, maxx, maxy))

    def pt(x, y):
        return F_.array(x, y)

    ring = F_.array(pt(w, s), pt(e, s), pt(e, n), pt(w, n), pt(w, s))
    props = F_.struct(
        F_.col(feature_id).cast("string").alias("feature_id"),
        *[F_.col(c).alias(c) for c in prop_cols],
    )
    feature = F_.struct(
        F_.lit("Feature").alias("type"),
        F_.struct(
            F_.lit("Polygon").alias("type"),
            F_.array(ring).alias("coordinates"),
        ).alias("geometry"),
        props.alias("properties"),
    )
    df.select(F_.to_json(feature).alias("value")).write.mode(mode).text(path)

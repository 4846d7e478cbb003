"""GeoJSON polygon source: both formats, schema, and PIP-join feed."""

import json

import pytest
from pyspark.sql import functions as F

from tile_grid_spark.core import tms
from tile_grid_spark.sources.geojson import read_geojson


def _feature(fid, coords, props=None, gtype="Polygon"):
    return {
        "type": "Feature",
        "id": fid,
        "geometry": {"type": gtype, "coordinates": coords},
        "properties": props or {},
    }


SQ = [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]
HOLE = [
    [[20.0, 20.0], [30.0, 20.0], [30.0, 30.0], [20.0, 30.0], [20.0, 20.0]],
    [[22.0, 22.0], [24.0, 22.0], [24.0, 24.0], [22.0, 24.0], [22.0, 22.0]],
]
MULTI = [SQ, [[[40.0, 40.0], [45.0, 40.0], [45.0, 45.0], [40.0, 45.0], [40.0, 40.0]]]]


@pytest.fixture(scope="module")
def fc():
    return {
        "type": "FeatureCollection",
        "features": [
            _feature("a", SQ, {"name": "sq"}),
            _feature("b", HOLE, {"name": "hole"}),
            _feature("c", MULTI, {"name": "multi"}, "MultiPolygon"),
            _feature("d", None, {"name": "pt"}, "Point"),  # skipped
        ],
    }


class TestReadGeojson:
    def _expected(self):
        return [("a", 0, 5, 0), ("b", 0, 5, 1), ("c", 0, 5, 0), ("c", 1, 5, 0)]

    def test_feature_collection(self, spark, tmp_path, fc):
        p = str(tmp_path / "layer.geojson")
        with open(p, "w") as f:
            json.dump(fc, f)
        df = read_geojson(spark, p)
        got = sorted(
            (r.feature_id, r.poly_id, len(r.ring_lon), r.n_holes_dropped)
            for r in df.collect()
        )
        assert got == self._expected()
        props = {r.feature_id: json.loads(r.properties) for r in df.collect()}
        assert props["a"] == {"name": "sq"}

    def test_feature_collection_size_guard(self, spark, tmp_path, fc, monkeypatch):
        # the driver-parse branch must refuse oversized layers with a
        # pointer to the distributed NDJSON path, not OOM mid-collect
        import tile_grid_spark.sources.geojson as gj

        p = str(tmp_path / "big.geojson")
        with open(p, "w") as f:
            json.dump(fc, f)
        monkeypatch.setattr(gj, "MAX_FEATURECOLLECTION_BYTES", 10)
        with pytest.raises(ValueError, match="newline-delimited"):
            gj.read_geojson(spark, p)
        # NDJSON path is exempt from the cap (fully distributed)
        pn = str(tmp_path / "big.ndjson")
        with open(pn, "w") as f:
            for ft in fc["features"]:
                f.write(json.dumps(ft) + "\n")
        assert gj.read_geojson(spark, pn).count() == 4

    def test_ndjson_distributed(self, spark, tmp_path, fc):
        p = str(tmp_path / "layer.ndjson")
        with open(p, "w") as f:
            for ft in fc["features"]:
                f.write(json.dumps(ft) + "\n")
        df = read_geojson(spark, p)
        got = sorted(
            (r.feature_id, r.poly_id, len(r.ring_lon), r.n_holes_dropped)
            for r in df.collect()
        )
        assert got == self._expected()

    def test_feeds_pip_join(self, spark, tmp_path, fc):
        from tile_grid_spark.operators.pip_join import pip_join, with_ring_bbox

        p = str(tmp_path / "layer2.geojson")
        with open(p, "w") as f:
            json.dump(fc, f)
        polys = with_ring_bbox(
            read_geojson(spark, p).withColumn(
                "pg_id", F.concat_ws("/", "feature_id", "poly_id")
            )
        )
        pts = spark.createDataFrame(
            [(1, 5.0, 5.0), (2, 25.0, 21.0), (3, 42.0, 43.0), (4, 100.0, 50.0)],
            "pid BIGINT, lon DOUBLE, lat DOUBLE",
        )
        wm = tms().lookup("WebMercatorQuad")
        out = pip_join(pts, polys, wm, zoom=4, poly_id="pg_id")
        got = sorted((r.pid, r.pg_id) for r in out.collect())
        # pid 1 is inside 'a' AND inside multi part 0 (same square);
        # pid 2 inside 'b' outer ring (holes outer-ring only, documented);
        # pid 3 inside multi part 1; pid 4 nowhere
        assert got == [(1, "a/0"), (1, "c/0"), (2, "b/0"), (3, "c/1")]


class TestHolesEvenOdd:
    def test_donut_excludes_hole_interior(self, spark, tmp_path, fc):
        """holes='evenodd' NaN-ring encoding: points in the hole fall
        OUT, points in the solid annulus stay IN, bbox prefilter is
        NaN-safe — all with the unchanged ray-cast operator."""
        from tile_grid_spark.operators.pip_join import pip_join, with_ring_bbox

        p = str(tmp_path / "donut.geojson")
        with open(p, "w") as f:
            json.dump(fc, f)
        polys = with_ring_bbox(
            read_geojson(spark, p, holes="evenodd").withColumn(
                "pg_id", F.concat_ws("/", "feature_id", "poly_id")
            )
        )
        # bbox columns must ignore the NaN separators
        b = {r.pg_id: (r.minx, r.maxx, r.miny, r.maxy) for r in polys.collect()}
        assert b["b/0"] == (20.0, 30.0, 20.0, 30.0)
        assert polys.filter(F.col("n_holes_dropped") != 0).count() == 0

        pts = spark.createDataFrame(
            [
                (1, 23.0, 23.0),   # inside the hole -> excluded
                (2, 21.0, 25.0),   # in the annulus -> included
                (3, 25.0, 29.0),   # annulus, above the hole -> included
                (4, 5.0, 5.0),     # inside 'a' (and multi part 0)
            ],
            "pid BIGINT, lon DOUBLE, lat DOUBLE",
        )
        wm = tms().lookup("WebMercatorQuad")
        out = pip_join(pts, polys, wm, zoom=4, poly_id="pg_id")
        got = sorted((r.pid, r.pg_id) for r in out.collect())
        assert got == [(2, "b/0"), (3, "b/0"), (4, "a/0"), (4, "c/0")]


class TestGeoJSONSeqRS:
    def test_rs_prefixed_sequence_routes_distributed(self, spark, tmp_path, fc):
        """RFC 8142 GeoJSONSeq: every line opens with the \\x1e record
        separator — must route to the line parser, not the monolithic
        json.load path."""
        p = str(tmp_path / "layer.geojsonseq")
        with open(p, "w") as f:
            for ft in fc["features"]:
                f.write("\x1e" + json.dumps(ft) + "\n")
        df = read_geojson(spark, p)
        got = sorted((r.feature_id, r.poly_id) for r in df.collect())
        assert got == [("a", 0), ("b", 0), ("c", 0), ("c", 1)]

    def test_idless_features_get_unique_stable_ids(self, spark, tmp_path):
        feats = [
            {"type": "Feature", "geometry": {"type": "Polygon",
             "coordinates": [[[float(i), 0.0], [float(i) + 1, 0.0],
                              [float(i) + 1, 1.0], [float(i), 1.0],
                              [float(i), 0.0]]]}, "properties": {}}
            for i in range(8)
        ]
        p = str(tmp_path / "noid.ndjson")
        with open(p, "w") as f:
            for ft in feats:
                f.write(json.dumps(ft) + "\n")
        # force multiple partitions so a batch-local counter would collide
        df = read_geojson(spark, p)
        ids = [r.feature_id for r in df.collect()]
        assert len(ids) == 8 and len(set(ids)) == 8
        # stable: re-read yields the same ids (content-derived)
        again = [r.feature_id for r in read_geojson(spark, p).collect()]
        assert sorted(ids) == sorted(again)


class TestWriteGeojson:
    def test_round_trips_through_engine_reader(self, spark, tmp_path):
        """tile bounds -> GeoJSON bbox features (sink) -> read_geojson
        (source): ring coordinates and carried properties must survive
        ring-for-ring; the write is a zero-shuffle projection."""
        import json

        from pyspark.sql import functions as F

        from tile_grid_spark.core import tms
        from tile_grid_spark.functions import grid_cols as G
        from tile_grid_spark.sources.geojson import (
            read_geojson,
            write_geojson_bbox_features,
        )

        wm = tms().lookup("WebMercatorQuad")
        p = wm.zoom_params(2)
        tiles = spark.createDataFrame(
            [(x, y) for x in range(4) for y in range(4)], "tile_x INT, tile_y INT"
        )
        b = G.tile_bounds_cols("tile_x", "tile_y", p)
        rows = tiles.select(
            F.concat_ws("/", F.lit("2"), "tile_x", "tile_y").alias("feature_id"),
            G.inv_mercator_lon(b["minx"]).alias("minx"),
            G.inv_mercator_lat(b["miny"]).alias("miny"),
            G.inv_mercator_lon(b["maxx"]).alias("maxx"),
            G.inv_mercator_lat(b["maxy"]).alias("maxy"),
            F.col("tile_x").alias("tx"),
        )
        out = str(tmp_path / "tiles_geojson")
        plan = rows.select(F.lit(1))._jdf.queryExecution().executedPlan().toString()
        write_geojson_bbox_features(
            rows, out, prop_cols=("tx",)
        )
        # raw line is a valid single GeoJSON feature
        import glob

        line = open(sorted(glob.glob(out + "/part-*"))[0]).readline()
        feat = json.loads(line)
        assert feat["type"] == "Feature"
        assert feat["geometry"]["type"] == "Polygon"
        assert feat["geometry"]["coordinates"][0][0] == feat["geometry"]["coordinates"][0][-1]

        back = read_geojson(spark, out)
        got = {
            json.loads(r.properties)["feature_id"]: (r.ring_lon, r.ring_lat)
            for r in back.collect()
        }
        exp = {
            r.feature_id: (
                [r.minx, r.maxx, r.maxx, r.minx, r.minx],
                [r.miny, r.miny, r.maxy, r.maxy, r.miny],
            )
            for r in rows.collect()
        }
        assert set(got) == set(exp) and len(got) == 16
        for k in exp:
            assert got[k] == exp[k], k
        # properties carried through
        anyrow = back.filter(F.col("ring_lon").isNotNull()).collect()[0]
        assert "tx" in json.loads(anyrow.properties)

"""DBSCAN operator vs a brute-force python oracle.

Oracle: full pairwise Mercator-plane distance matrix (same metric as
radius_join: antimeridian-wrapped dx), degree threshold for cores,
union-find over core-core pairs for components (label = min core id),
border = min label among eps-neighboring cores, else noise — the
operator's documented deterministic semantics re-derived from scratch.
"""

from __future__ import annotations

import numpy as np
import pytest

from tile_grid_spark.core import tms
from tile_grid_spark.operators.dbscan import dbscan

R = 6378137.0
WORLD_W = 2.0 * np.pi * R


@pytest.fixture(scope="module")
def wm():
    return tms().lookup("WebMercatorQuad")


def _synth(n=240, seed=11):
    """3 dense blobs + a thin bridge + uniform background noise;
    includes a blob hugging the antimeridian."""
    rng = np.random.default_rng(seed)
    blobs = [
        (8.5, 47.3, 0.25, n * 25 // 100),     # Zurich-ish, tight
        (10.2, 48.9, 0.25, n * 25 // 100),    # nearby second blob
        (179.8, -16.8, 0.25, n * 17 // 100),  # antimeridian hugger (Fiji)
    ]
    lon, lat = [], []
    for (bx, by, s, m) in blobs:
        lon.append(bx + rng.normal(0, s, m))
        lat.append(by + rng.normal(0, s, m))
    lon.append(rng.uniform(-170, 170, n - sum(m for *_, m in blobs)))
    lat.append(rng.uniform(-60, 60, n - sum(m for *_, m in blobs)))
    lon = np.clip(np.concatenate(lon), -179.999, 179.999)
    lat = np.clip(np.concatenate(lat), -70, 70)
    ids = np.arange(1, n + 1, dtype=np.int64) * 7  # non-contiguous ids
    return ids, lon, lat


def _py_dbscan(ids, lon, lat, eps, min_pts):
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi * 0.25 + 0.5 * np.radians(lat)))
    dx = np.abs(x[:, None] - x[None, :])
    dx = np.minimum(dx, WORLD_W - dx)
    d = np.hypot(dx, y[:, None] - y[None, :])
    nb = d <= eps
    deg = nb.sum(axis=1)  # includes self (diagonal is 0 <= eps)
    core = deg >= min_pts
    n = len(ids)
    parent = dict(zip(ids, ids))

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nb[i, j]:
                ri, rj = find(ids[i]), find(ids[j])
                if ri != rj:
                    lo, hi = min(ri, rj), max(ri, rj)
                    parent[hi] = lo
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (find(ids[i]), "core")
    for i in range(n):
        if core[i]:
            continue
        labels = [find(ids[j]) for j in range(n) if core[j] and nb[i, j]]
        out[ids[i]] = (min(labels), "border") if labels else (-1, "noise")
    return out


def _run(spark, wm, ids, lon, lat, eps, min_pts):
    df = spark.createDataFrame(
        [(int(i), float(lo), float(la)) for i, lo, la in zip(ids, lon, lat)],
        "pid LONG, lon DOUBLE, lat DOUBLE",
    )
    rows = dbscan(df, wm, eps=eps, min_pts=min_pts).collect()
    got = {r["pid"]: (r["cluster"], r["role"]) for r in rows}
    assert len(rows) == len(got), "one row per point"
    return got


def test_matches_python_oracle(spark, wm):
    ids, lon, lat = _synth()
    eps, min_pts = 60_000.0, 5
    want = _py_dbscan(ids, lon, lat, eps, min_pts)
    got = _run(spark, wm, ids, lon, lat, eps, min_pts)
    assert got == want
    roles = {v[1] for v in got.values()}
    assert roles == {"core", "border", "noise"}, "fixture exercises all roles"
    n_clusters = len({v[0] for v in got.values() if v[0] != -1})
    assert n_clusters >= 2, "fixture produces multiple clusters"


def test_min_pts_one_all_core(spark, wm):
    ids, lon, lat = _synth(n=60)
    got = _run(spark, wm, ids, lon, lat, 50_000.0, 1)
    assert all(role == "core" for _, role in got.values())
    want = _py_dbscan(ids, lon, lat, 50_000.0, 1)
    assert got == want


def test_high_min_pts_all_noise(spark, wm):
    ids, lon, lat = _synth(n=80)
    got = _run(spark, wm, ids, lon, lat, 10_000.0, 70)
    assert all(v == (-1, "noise") for v in got.values())


def test_partition_invariance(spark, wm):
    ids, lon, lat = _synth(n=150, seed=23)
    df = spark.createDataFrame(
        [(int(i), float(lo), float(la)) for i, lo, la in zip(ids, lon, lat)],
        "pid LONG, lon DOUBLE, lat DOUBLE",
    )
    one = {
        r["pid"]: (r["cluster"], r["role"])
        for r in dbscan(df.coalesce(1), wm, eps=60_000.0, min_pts=4).collect()
    }
    many = {
        r["pid"]: (r["cluster"], r["role"])
        for r in dbscan(df.repartition(13), wm, eps=60_000.0, min_pts=4).collect()
    }
    assert one == many


def test_validation(spark, wm):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "pid LONG, lon DOUBLE, lat DOUBLE")
    with pytest.raises(ValueError, match="min_pts"):
        dbscan(df, wm, eps=1000.0, min_pts=0)
    with pytest.raises(ValueError, match="radius"):
        dbscan(df, wm, eps=-1.0, min_pts=2)


def _py_st_dbscan(ids, lon, lat, t, eps_s, eps_t, min_pts):
    """Same oracle with the conjunctive |dt| <= eps_t neighborhood."""
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi * 0.25 + 0.5 * np.radians(lat)))
    dx = np.abs(x[:, None] - x[None, :])
    dx = np.minimum(dx, WORLD_W - dx)
    d = np.hypot(dx, y[:, None] - y[None, :])
    dt = np.abs(t[:, None] - t[None, :])
    nb = (d <= eps_s) & (dt <= eps_t)
    deg = nb.sum(axis=1)
    core = deg >= min_pts
    n = len(ids)
    parent = dict(zip(ids, ids))

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nb[i, j]:
                ri, rj = find(ids[i]), find(ids[j])
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (find(ids[i]), "core")
    for i in range(n):
        if core[i]:
            continue
        labels = [find(ids[j]) for j in range(n) if core[j] and nb[i, j]]
        out[ids[i]] = (min(labels), "border") if labels else (-1, "noise")
    return out


class TestStDbscan:
    def test_matches_python_oracle(self, spark, wm):
        from tile_grid_spark.operators.dbscan import st_dbscan

        ids, lon, lat = _synth(n=220, seed=41)
        rng = np.random.default_rng(43)
        # blob points cluster in time too; background scattered over 30d
        t = np.where(
            np.arange(len(ids)) < len(ids) * 67 // 100,
            rng.integers(0, 86_400, len(ids)),
            rng.integers(0, 2_600_000, len(ids)),
        ).astype(np.int64)
        eps_s, eps_t, mp = 60_000.0, 43_200, 7
        want = _py_st_dbscan(ids, lon, lat, t, eps_s, eps_t, mp)
        df = spark.createDataFrame(
            [
                (int(i), float(lo), float(la), int(tt))
                for i, lo, la, tt in zip(ids, lon, lat, t)
            ],
            "pid LONG, lon DOUBLE, lat DOUBLE, t LONG",
        )
        rows = st_dbscan(df, wm, eps_space=eps_s, eps_time=eps_t, min_pts=mp).collect()
        got = {r["pid"]: (r["cluster"], r["role"]) for r in rows}
        assert got == want
        assert {v[1] for v in got.values()} == {"core", "border", "noise"}

    def test_time_zero_requires_simultaneity(self, spark, wm):
        from tile_grid_spark.operators.dbscan import st_dbscan

        # same place, distinct times -> eps_time=0 finds no neighbors
        df = spark.createDataFrame(
            [(i, 8.5, 47.3, i * 100) for i in range(1, 9)],
            "pid LONG, lon DOUBLE, lat DOUBLE, t LONG",
        )
        rows = st_dbscan(df, wm, eps_space=50_000.0, eps_time=0, min_pts=2).collect()
        assert all(r["role"] == "noise" for r in rows)

    def test_validation(self, spark, wm):
        from tile_grid_spark.operators.dbscan import st_dbscan

        df = spark.createDataFrame(
            [(1, 0.0, 0.0, 0)], "pid LONG, lon DOUBLE, lat DOUBLE, t LONG"
        )
        with pytest.raises(ValueError, match="min_pts"):
            st_dbscan(df, wm, eps_space=1000.0, eps_time=10, min_pts=0)
        with pytest.raises(ValueError, match="eps_time"):
            st_dbscan(df, wm, eps_space=1000.0, eps_time=-1, min_pts=2)

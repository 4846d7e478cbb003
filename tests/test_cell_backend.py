"""CellBackend contract battery (the H3 production seam, round-4).

The SAME assertions run against the built-in aperture-7 backend and a
mock "published-id" backend whose ids share nothing with the built-in
bit layout — proving consumers treat cell ids as opaque and that
swapping in h3-py is a constructor change with already-exercised shape.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.functions.cell_backend import (
    CellBackend,
    H3Backend,
    HexBackend,
    OpaqueRemapBackend,
    cell_udf,
    disk_udf,
    parent_udf,
)

BACKENDS = [HexBackend(), OpaqueRemapBackend()]
IDS = ["builtin-hex", "mock-published"]


def _points(n=500, seed=3):
    rng = np.random.default_rng(seed)
    # stay away from poles / extreme face corners for disk determinism
    return rng.uniform(-170, 170, n), rng.uniform(-60, 60, n)


@pytest.mark.parametrize("backend", BACKENDS, ids=IDS)
class TestCellBackendContract:
    def test_is_a_backend(self, backend):
        assert isinstance(backend, CellBackend)

    def test_deterministic_and_batch_invariant(self, backend):
        lon, lat = _points()
        a = backend.latlng_to_cell(lon, lat, 8)
        b = backend.latlng_to_cell(lon, lat, 8)
        assert np.array_equal(a, b)
        # batch split must not change ids (no cross-row state)
        c = np.concatenate([
            backend.latlng_to_cell(lon[:100], lat[:100], 8),
            backend.latlng_to_cell(lon[100:], lat[100:], 8),
        ])
        assert np.array_equal(a, c)

    def test_resolution_monotonicity(self, backend):
        lon, lat = _points()
        counts = [len(np.unique(backend.latlng_to_cell(lon, lat, r)))
                  for r in (0, 1, 2)]
        assert counts[0] < counts[1] < counts[2]

    def test_parent_consistency(self, backend):
        lon, lat = _points()
        child = backend.latlng_to_cell(lon, lat, 9)
        parent = backend.cell_to_parent(child, 5)
        direct = backend.latlng_to_cell(lon, lat, 5)
        # hex hierarchies are approximate (children straddle parents):
        # require overwhelming agreement, not equality
        agree = float(np.mean(parent == direct))
        assert agree >= 0.9, agree
        # parents of one child are a single id; parent is coarser
        assert len(np.unique(backend.cell_to_parent(child[:1], 0))) == 1

    def test_parent_res_validation(self, backend):
        lon, lat = _points(10)
        child = backend.latlng_to_cell(lon, lat, 4)
        with pytest.raises(ValueError, match="parent_res"):
            backend.cell_to_parent(child, 9)

    def test_grid_disk_shape(self, backend):
        lon, lat = _points(50, seed=11)
        cells = backend.latlng_to_cell(lon, lat, 7)
        rings = backend.grid_disk(cells, 2)
        assert [r.shape[1] for r in rings] == [1, 6, 12]
        assert np.array_equal(rings[0][:, 0], cells)  # center included
        for i in range(len(cells)):
            disk = np.concatenate([r[i] for r in rings])
            assert len(np.unique(disk)) == 19  # 1 + 6 + 12, all distinct
            assert cells[i] not in rings[1][i]


class TestSparkSurface:
    def test_udf_parity_both_backends(self, spark):
        lon, lat = _points(200, seed=7)
        df = spark.createDataFrame(
            [(i, float(lo), float(la)) for i, (lo, la) in enumerate(zip(lon, lat))],
            "id BIGINT, lon DOUBLE, lat DOUBLE",
        ).orderBy("id")
        for backend in BACKENDS:
            got = (
                df.withColumn("cell", cell_udf(backend, 7)("lon", "lat"))
                .withColumn("parent", parent_udf(backend, 3)("cell"))
                .withColumn("disk", disk_udf(backend, 1)("cell"))
                .orderBy("id")
                .collect()
            )
            want_cell = backend.latlng_to_cell(lon, lat, 7)
            want_par = backend.cell_to_parent(want_cell, 3)
            assert [r.cell for r in got] == [int(x) for x in want_cell]
            assert [r.parent for r in got] == [int(x) for x in want_par]
            for r, c in zip(got, want_cell):
                assert len(r.disk) == 7 and r.disk[0] == int(c)

    def test_swap_changes_ids_not_shape(self, spark):
        """The literal production scenario: same plan, different backend
        — ids differ everywhere, per-cell aggregation shape survives."""
        lon, lat = _points(300, seed=13)
        df = spark.createDataFrame(
            [(float(lo), float(la)) for lo, la in zip(lon, lat)],
            "lon DOUBLE, lat DOUBLE",
        )

        def density(backend):
            return (
                df.withColumn("cell", cell_udf(backend, 5)("lon", "lat"))
                .groupBy("cell")
                .agg(F.count("*").alias("n"))
            )

        a = density(BACKENDS[0]).collect()
        b = density(BACKENDS[1]).collect()
        assert sorted(r.n for r in a) == sorted(r.n for r in b)
        assert {r.cell for r in a}.isdisjoint({r.cell for r in b})


class TestH3Adapter:
    def test_absent_h3_raises_with_hint(self):
        try:
            import h3  # noqa: F401

            pytest.skip("h3 installed — covered by test_real_h3_contract")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="pip install h3"):
            H3Backend()

    def test_real_h3_contract(self):
        """Runs only where h3-py exists (production): the adapter must
        pass the same determinism + disk-shape contract."""
        pytest.importorskip("h3")
        backend = H3Backend()
        lon, lat = _points(50)
        a = backend.latlng_to_cell(lon, lat, 8)
        assert np.array_equal(a, backend.latlng_to_cell(lon, lat, 8))
        rings = backend.grid_disk(a[:5], 1)
        assert rings[0].shape[1] == 1 and rings[1].shape[1] == 6

"""Pluggable hexagonal cell-index backend — the H3 production seam.

Round-3 adjudication (SURVEY.md §2.C): bit-compatible H3 ids are
permanently out of scope in-sandbox, and the engine ships an honestly
H3-*inspired* aperture-7 index instead (functions/cells.py). This module
turns the prose "production swaps in h3-py" claim into a TESTED
interface: every consumer goes through a :class:`CellBackend`, the
built-in index implements it, an ``h3-py`` adapter implements it behind
an import guard, and the contract battery (tests/test_cell_backend.py)
runs the SAME assertions against the built-in backend and a mock
"published-id" backend — so a production swap is a one-line constructor
change that the contract test has already exercised in shape.

Backend operations (the H3 core trio):
  latlng_to_cell(lon, lat, res) -> int64 cell ids  (vectorized)
  cell_to_parent(cell, parent_res) -> int64 parent ids
  grid_disk(cell, k) -> list of id-arrays (cell + rings 1..k)

All vectorized over numpy arrays; `cell_udf(backend, res)` lifts any
backend into the Arrow pandas-UDF Spark surface unchanged.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


@runtime_checkable
class CellBackend(Protocol):
    """Contract every hex-cell id scheme must satisfy (see the contract
    battery in tests/test_cell_backend.py):

    - determinism: equal inputs -> equal ids, across calls and batches
    - resolution monotonicity: finer res -> at least as many distinct
      cells over a spread of points
    - parent consistency: cell_to_parent(latlng_to_cell(p, r), pr) ==
      latlng_to_cell agreement for the overwhelming majority of points
      (hex hierarchies are approximate — children straddle parents)
    - disk shape: grid_disk(c, k) includes c, has 1 + sum(6r) unique
      ids away from face boundaries, and every ring-1 id is distinct
    """

    def latlng_to_cell(self, lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
        ...

    def cell_to_parent(self, cell: np.ndarray, parent_res: int) -> np.ndarray:
        ...

    def grid_disk(self, cell: np.ndarray, k: int) -> list[np.ndarray]:
        ...


class HexBackend:
    """The built-in H3-inspired aperture-7 index (functions/cells.py) as
    a CellBackend. cell_to_parent re-indexes the cell CENTER at the
    coarser resolution — deterministic, and exactly the approximate
    containment an aperture-7 hierarchy provides (real H3's exact ijk
    parent math is also approximate containment for the same reason:
    children straddle parent boundaries)."""

    def latlng_to_cell(self, lon, lat, res: int) -> np.ndarray:
        from .cells import hex_cell_id

        return hex_cell_id(np.asarray(lon, dtype=np.float64),
                           np.asarray(lat, dtype=np.float64), res)

    def cell_to_parent(self, cell, parent_res: int) -> np.ndarray:
        from .cells import hex_cell_center, hex_cell_id, hex_unpack

        cell = np.asarray(cell, dtype=np.int64)
        res, _f, _q, _r = hex_unpack(cell)
        if np.any(res < parent_res):
            raise ValueError("cell_to_parent: parent_res must be <= cell res")
        lon, lat = hex_cell_center(cell)
        return hex_cell_id(lon, lat, parent_res)

    def grid_disk(self, cell, k: int) -> list[np.ndarray]:
        """Disk of axial-offset neighbors per ring (center ring 0 first).
        Valid away from icosahedron face boundaries — offsets do not
        cross faces (documented limitation of the built-in index; the
        h3 adapter has no such caveat)."""
        from .cells import hex_k_ring_offsets, hex_unpack

        cell = np.asarray(cell, dtype=np.int64)
        res, face, q, r = hex_unpack(cell)
        m27 = (1 << 27) - 1
        rings = []
        for ring in range(k + 1):
            offs = hex_k_ring_offsets(ring)
            ids = np.empty((len(cell), len(offs)), dtype=np.int64)
            for j, (dq, dr) in enumerate(offs):
                ids[:, j] = (
                    (res << np.int64(59))
                    | (face << np.int64(54))
                    | (((q + dq) & m27) << np.int64(27))
                    | ((r + dr) & m27)
                )
            rings.append(ids)
        return rings


class H3Backend:
    """Published-id backend via the real ``h3`` package (optional — not
    in the sandbox; raises ImportError with the install hint when
    absent). Same three operations, ids are genuine H3 indexes."""

    def __init__(self) -> None:
        try:
            import h3  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no h3
            raise ImportError(
                "H3Backend requires the 'h3' package (pip install h3); "
                "in-sandbox use HexBackend (H3-inspired ids) instead"
            ) from e
        self._h3 = h3

    def latlng_to_cell(self, lon, lat, res: int) -> np.ndarray:  # pragma: no cover
        h3 = self._h3
        return np.array(
            [int(h3.str_to_int(h3.latlng_to_cell(la, lo, res)))
             for lo, la in zip(np.asarray(lon), np.asarray(lat))],
            dtype=np.int64,
        )

    def cell_to_parent(self, cell, parent_res: int) -> np.ndarray:  # pragma: no cover
        h3 = self._h3
        return np.array(
            [int(h3.str_to_int(h3.cell_to_parent(h3.int_to_str(int(c)), parent_res)))
             for c in np.asarray(cell)],
            dtype=np.int64,
        )

    def grid_disk(self, cell, k: int) -> list[np.ndarray]:  # pragma: no cover
        h3 = self._h3
        cells = [h3.int_to_str(int(c)) for c in np.asarray(cell)]
        rings = []
        for ring in range(k + 1):
            per_cell = [
                np.array(sorted(int(h3.str_to_int(x))
                                for x in h3.grid_ring(c, ring)), dtype=np.int64)
                for c in cells
            ]
            rings.append(np.stack(per_cell))
        return rings


class OpaqueRemapBackend:
    """Contract-test double simulating an EXTERNAL id scheme (like
    h3-py's published ids): delegates to an inner backend and
    bijectively remaps every id (xor). Any consumer that peeks inside
    the id bit layout breaks on this backend, so the contract battery
    passing on it is the evidence the seam is id-scheme-agnostic. Ships
    in the package (not in tests/) so Spark workers can unpickle UDFs
    built over it."""

    def __init__(self, inner: CellBackend | None = None,
                 key: int = -0x5A5A5A5A5A5A5A5B) -> None:
        self._inner = inner or HexBackend()
        self._key = np.int64(key)

    def _x(self, ids: np.ndarray) -> np.ndarray:
        return np.asarray(ids, dtype=np.int64) ^ self._key

    def latlng_to_cell(self, lon, lat, res: int) -> np.ndarray:
        return self._x(self._inner.latlng_to_cell(lon, lat, res))

    def cell_to_parent(self, cell, parent_res: int) -> np.ndarray:
        return self._x(self._inner.cell_to_parent(self._x(cell), parent_res))

    def grid_disk(self, cell, k: int) -> list[np.ndarray]:
        return [self._x(r) for r in self._inner.grid_disk(self._x(cell), k)]


def cell_udf(backend: CellBackend, res: int):
    """Arrow pandas UDF: (lon, lat) -> cell id under ANY backend. This
    is the Spark surface consumers bind to — swapping the id scheme
    never touches the DataFrame plan."""

    @F.pandas_udf(LongType())
    def f(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            backend.latlng_to_cell(lon.to_numpy(), lat.to_numpy(), res)
        )

    return f


def parent_udf(backend: CellBackend, parent_res: int):
    @F.pandas_udf(LongType())
    def f(cell: pd.Series) -> pd.Series:
        return pd.Series(backend.cell_to_parent(cell.to_numpy(), parent_res))

    return f


def disk_udf(backend: CellBackend, k: int):
    """(cell) -> array<bigint> of the full k-disk (center + rings)."""

    @F.pandas_udf(ArrayType(LongType()))
    def f(cell: pd.Series) -> pd.Series:
        rings = backend.grid_disk(cell.to_numpy(), k)
        flat = np.concatenate(rings, axis=1)
        return pd.Series(list(flat))

    return f

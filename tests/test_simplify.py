"""Douglas-Peucker simplification vs an independent recursive oracle."""

from __future__ import annotations

import numpy as np
import pytest

from tile_grid_spark.operators.simplify import dp_keep_mask, simplify_paths


def _dp_recursive(xs, ys, tol):
    """Textbook recursive RDP — an independent formulation of the same
    algorithm (recursion vs the kernel's explicit stack)."""
    n = len(xs)
    keep = set([0, n - 1])

    def rec(i0, i1):
        if i1 - i0 < 2:
            return
        ax, ay, bx, by = xs[i0], ys[i0], xs[i1], ys[i1]
        best_d, best_j = -1.0, None
        for j in range(i0 + 1, i1):
            len2 = (bx - ax) ** 2 + (by - ay) ** 2
            if len2 == 0.0:
                d = ((xs[j] - ax) ** 2 + (ys[j] - ay) ** 2) ** 0.5
            else:
                d = abs((bx - ax) * (ay - ys[j]) - (ax - xs[j]) * (by - ay)) / len2 ** 0.5
            if d > best_d:
                best_d, best_j = d, j
        if best_d > tol:
            keep.add(best_j)
            rec(i0, best_j)
            rec(best_j, i1)

    rec(0, n - 1)
    return np.array([i in keep for i in range(n)])


def _walks(n_traj=8, n=60, seed=5):
    rng = np.random.default_rng(seed)
    for _ in range(n_traj):
        xs = np.cumsum(rng.uniform(-1, 1.2, n))
        ys = np.cumsum(rng.uniform(-1, 1, n))
        yield xs, ys


class TestDpKernel:
    def test_matches_recursive_reference(self):
        for xs, ys in _walks():
            for tol in (0.0, 0.3, 1.0, 5.0):
                got = dp_keep_mask(xs, ys, tol)
                want = _dp_recursive(xs, ys, tol)
                assert (got == want).all()

    def test_final_segments_within_tol(self):
        # DP guarantee: every dropped vertex is within tol of the chord
        # of its enclosing pair of kept vertices
        tol = 0.8
        for xs, ys in _walks(seed=9):
            keep = dp_keep_mask(xs, ys, tol)
            kept_idx = np.flatnonzero(keep)
            for i0, i1 in zip(kept_idx[:-1], kept_idx[1:]):
                ax, ay, bx, by = xs[i0], ys[i0], xs[i1], ys[i1]
                for j in range(i0 + 1, i1):
                    len2 = (bx - ax) ** 2 + (by - ay) ** 2
                    d = abs((bx - ax) * (ay - ys[j]) - (ax - xs[j]) * (by - ay)) / len2 ** 0.5
                    assert d <= tol

    def test_edges(self):
        assert dp_keep_mask(np.array([]), np.array([]), 1.0).tolist() == []
        assert dp_keep_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() == [True]
        assert dp_keep_mask(np.array([0.0, 1.0]), np.array([0.0, 0.0]), 1.0).tolist() == [True, True]
        # exactly collinear interior vertices drop at tol=0 (strict >)
        m = dp_keep_mask(np.array([0.0, 1.0, 2.0]), np.array([0.0, 0.0, 0.0]), 0.0)
        assert m.tolist() == [True, False, True]
        # duplicate endpoints (degenerate chord): falls back to point
        # distance, keeps the far vertex
        m = dp_keep_mask(np.array([0.0, 3.0, 0.0]), np.array([0.0, 0.0, 0.0]), 1.0)
        assert m.tolist() == [True, True, True]

    def test_negative_tolerance_raises(self, spark):
        pts = spark.createDataFrame(
            [(1, 0, 0.0, 0.0)], "tid BIGINT, seq BIGINT, x DOUBLE, y DOUBLE"
        )
        with pytest.raises(ValueError, match="tolerance"):
            simplify_paths(pts, -1.0)


class TestSimplifyPathsSpark:
    def test_matches_local_kernel(self, spark):
        rows = []
        for tid, (xs, ys) in enumerate(_walks(n_traj=6, n=50, seed=17)):
            # shuffle input order: the operator must re-sort by seq
            order = np.random.default_rng(tid).permutation(len(xs))
            rows += [
                (tid, int(i), float(xs[i]), float(ys[i])) for i in order
            ]
        pts = spark.createDataFrame(rows, "tid BIGINT, seq BIGINT, x DOUBLE, y DOUBLE")
        tol = 0.7
        got = {
            (r.tid, r.seq): (r.x, r.y)
            for r in simplify_paths(pts, tol).collect()
        }
        expect = {}
        for tid, (xs, ys) in enumerate(_walks(n_traj=6, n=50, seed=17)):
            keep = dp_keep_mask(xs, ys, tol)
            for i in np.flatnonzero(keep):
                expect[(tid, int(i))] = (xs[i], ys[i])
        assert got == expect

    def test_single_exchange_plan(self, spark):
        pts = spark.createDataFrame(
            [(1, i, float(i), 0.0) for i in range(5)],
            "tid BIGINT, seq BIGINT, x DOUBLE, y DOUBLE",
        )
        plan = (
            simplify_paths(pts, 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1

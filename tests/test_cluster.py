"""Connected components (large-star/small-star) vs a union-find oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_grid_spark.operators.cluster import connected_components


def _union_find(n_edges, nodes=()):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in n_edges:
        union(a, b)
    for x in nodes:
        find(x)
    return {x: find(x) for x in parent}


def _run(spark, edges, nodes=None):
    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)], "id_a BIGINT, id_b BIGINT"
    )
    if not edges:
        e = e.filter(F.lit(False))
    nd = None
    if nodes is not None:
        nd = spark.createDataFrame([(int(x),) for x in nodes], "id BIGINT")
    out = connected_components(e, nodes=nd)
    return {r.node: r.component for r in out.collect()}


class TestConnectedComponents:
    def test_random_graph_vs_union_find(self, spark):
        rng = np.random.default_rng(11)
        n = 300
        edges = [tuple(sorted(p)) for p in rng.integers(0, n, (220, 2)) if p[0] != p[1]]
        got = _run(spark, edges)
        assert got == _union_find(edges)

    def test_long_chain_needs_multiple_rounds(self, spark):
        edges = [(i, i + 1) for i in range(64)]
        got = _run(spark, edges)
        assert set(got.values()) == {0}
        assert len(got) == 65

    def test_star_and_reverse_star(self, spark):
        # hub-max star (all point at 99) exercises large-star's hub fix
        edges = [(i, 99) for i in range(10)] + [(200, 200 + i) for i in range(1, 8)]
        got = _run(spark, edges)
        assert {got[i] for i in range(10)} == {0}
        assert got[99] == 0
        assert {got[200 + i] for i in range(8)} == {200}

    def test_isolated_nodes_and_duplicates(self, spark):
        edges = [(5, 6), (6, 5), (5, 6), (7, 7)]
        got = _run(spark, edges, nodes=[5, 6, 7, 42])
        assert got == {5: 5, 6: 5, 7: 7, 42: 42}

    def test_empty_edges(self, spark):
        got = _run(spark, [], nodes=[1, 2, 3])
        assert got == {1: 1, 2: 2, 3: 3}

    def test_max_iter_raises(self, spark):
        edges = [(i, i + 1) for i in range(64)]
        e = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")
        # global star rounds (frontier tiers disabled) can't close a
        # 64-chain in one round -> must raise, not return wrong labels
        with pytest.raises(RuntimeError, match="converge"):
            connected_components(e, max_iter=1, frontier_max_nodes=0)
        # the frontier driver-solve tier needs no rounds at all: the
        # same graph converges even at max_iter=1
        got = {
            r.node: r.component for r in connected_components(e, max_iter=1).collect()
        }
        assert got == _union_find(edges)

    def test_huge_hub_star_skew(self, spark):
        """A 150k-leaf hub at the MAX id: small-star funnels every leaf
        into the hub's group — partial aggregation must keep the hot key
        to one row per map task and converge in the star-bound rounds."""
        n = 150_000
        e = spark.range(0, n - 1).select(
            F.col("id").alias("id_a"), F.lit(n - 1).alias("id_b")
        )
        out = connected_components(e)
        assert out.count() == n
        assert out.filter(F.col("component") != 0).count() == 0

    def test_nodes_never_filters_edge_endpoints(self, spark):
        """`nodes` ADDS isolated vertices; endpoints absent from `nodes`
        must keep their rows (r3 ADVICE: the old left-join silently
        dropped them from the output while they still shaped labels)."""
        got = _run(spark, [(1, 2), (2, 9)], nodes=[1, 42])
        assert got == {1: 1, 2: 1, 9: 1, 42: 42}

    def test_string_ids(self, spark):
        """The pipeline clusters image_id STRINGS — min/least/greatest
        order lexicographically; representative = lexicographic min."""
        edges = [("img-003", "img-001"), ("img-001", "img-002"), ("img-010", "img-011")]
        e = spark.createDataFrame(edges, "id_a STRING, id_b STRING")
        nodes = spark.createDataFrame([("img-%03d" % i,) for i in range(12)], "id STRING")
        got = {r.node: r.component for r in connected_components(e, nodes=nodes).collect()}
        assert got["img-001"] == "img-001"
        assert got["img-002"] == "img-001"
        assert got["img-003"] == "img-001"
        assert got["img-010"] == "img-010"
        assert got["img-011"] == "img-010"
        assert got["img-007"] == "img-007"  # isolated


class TestStarImplEquivalence:
    def test_window_equals_agg_on_random_graphs(self, spark):
        """Both star implementations must produce identical components
        on random graphs (incl. chains and hub stars mixed in)."""
        rng = np.random.default_rng(23)
        n = 200
        edges = [tuple(sorted(p)) for p in rng.integers(0, n, (160, 2)) if p[0] != p[1]]
        edges += [(i, i + 1) for i in range(100, 140)]  # chain
        edges += [(150, j) for j in range(151, 180)]  # hub star
        e = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "id_a BIGINT, id_b BIGINT"
        )
        w = {
            r.node: r.component
            for r in connected_components(e, star_impl="window").collect()
        }
        a = {
            r.node: r.component
            for r in connected_components(e, star_impl="agg").collect()
        }
        assert w == a == _union_find(edges)

    def test_bad_impl_raises(self, spark):
        e = spark.createDataFrame([(1, 2)], "id_a BIGINT, id_b BIGINT")
        with pytest.raises(ValueError, match="star_impl"):
            connected_components(e, star_impl="nope")


class TestPreContraction:
    def test_pre_contract_equals_plain_on_random_graphs(self, spark):
        rng = np.random.default_rng(23)
        for trial in range(3):
            n = 200 + trial * 100
            edges = [
                tuple(int(x) for x in p)
                for p in rng.integers(0, n, (n, 2))
                if p[0] != p[1]
            ]
            e = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT").repartition(7)
            a = {
                r.node: r.component
                for r in connected_components(e, pre_contract=True).collect()
            }
            b = {
                r.node: r.component
                for r in connected_components(e, pre_contract=False).collect()
            }
            assert a == b == _union_find(edges)

    def test_contract_partitions_preserves_components_and_shrinks(self, spark):
        from tile_grid_spark.operators.cluster import _contract_partitions

        # chains are the worst case for star rounds and the best case
        # for local contraction: each partition collapses its chain
        # segment to a star in one map pass
        edges = [(i, i + 1) for i in range(400)]
        e = spark.createDataFrame(edges, "u BIGINT, v BIGINT").repartition(8)
        c = _contract_partitions(e)
        rows = [(r.u, r.v) for r in c.collect()]
        assert len(rows) <= len(edges)
        # contracted edges are canonical (root < child) star edges
        assert all(u < v for u, v in rows)
        # connectivity is preserved: same components as the original
        assert _union_find(rows) == _union_find(edges)

    def test_frontier_equals_global_rounds_on_random_graphs(self, spark):
        """The frontier quotient solve (default) must label identically
        to full global star rounds (frontier_max_nodes=0) and to the
        union-find oracle — random graphs mix chains, hubs and
        cross-partition components."""
        rng = np.random.default_rng(41)
        for parts in (2, 9, 32):
            n = 250
            edges = [
                tuple(int(x) for x in p)
                for p in rng.integers(0, n, (300, 2))
                if p[0] != p[1]
            ]
            edges += [(i, i + 1) for i in range(200, 240)]
            e = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT").repartition(
                parts
            )
            a = {
                r.node: r.component
                for r in connected_components(e).collect()  # frontier default
            }
            b = {
                r.node: r.component
                for r in connected_components(e, frontier_max_nodes=0).collect()
            }
            assert a == b == _union_find(edges)

    def test_frontier_cap_falls_back_to_global_rounds(self, spark):
        """frontier_max_nodes smaller than the frontier forces the
        global-round fallback — identical labels."""
        edges = [(i, i + 1) for i in range(300)]  # one long chain
        e = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT").repartition(16)
        got = {
            r.node: r.component
            for r in connected_components(e, frontier_max_nodes=1).collect()
        }
        assert got == _union_find(edges)
        assert set(got.values()) == {0}

    def test_pre_contract_partition_invariant(self, spark):
        rng = np.random.default_rng(5)
        edges = [
            tuple(int(x) for x in p)
            for p in rng.integers(0, 150, (120, 2))
            if p[0] != p[1]
        ]
        base = None
        for parts in (1, 3, 16):
            e = spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT").repartition(
                parts
            )
            got = {
                r.node: r.component for r in connected_components(e).collect()
            }
            if base is None:
                base = got
            assert got == base

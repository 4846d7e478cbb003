"""Distributed connected components — candidate pairs -> dedup clusters.

Turning near-dup candidate PAIRS (the output of minhash_lsh_pairs /
simhash_near_pairs / hamming_near_pairs / embedding_near_pairs) into
duplicate CLUSTERS with one representative per component is the final
stage of a web-scale dedup pipeline: transitive closure, "keep the
minimum id per component".

At 10^12 rows the edge list fits nowhere central and components can be
huge (boilerplate near-dup blobs), so this is the alternating
large-star / small-star algorithm (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", ACM SoCC 2014): O(log^2 n) rounds w.h.p., each round two
groupBy-min shuffles over the edge list and nothing else — no
driver-side graph, no per-task state beyond a grouped min.

Scale notes:
- Each round shuffles (node, neighbor) BIGINT pairs only; `distinct`
  between rounds keeps the edge multiset from ballooning (star steps
  emit duplicates when several neighbors map to the same min — measured:
  skipping the per-round distinct OOMs a 1M-node chain graph before
  convergence; it is load-bearing, not a polish).
- Skew: a huge star component concentrates on its min-id root node.
  large-star is exactly the paper's fix — high-degree hubs hand their
  GREATER neighbors to the component min without routing everything
  through one reducer chain. Two interchangeable star implementations
  (property-tested equal): the default window shape does each star step
  in ONE edge-list exchange (measured 1.8x faster end to end — star
  rounds are pure shuffle, exchanges are the cost) but sorts a node's
  whole adjacency into one task; star_impl="agg" keeps the groupBy-min
  (map-side partial agg, one row per hot key per map task) + AQE-skew-
  splittable join for adversarial degree distributions.
- Lineage: each round localCheckpoints the edge set (iterative plans
  otherwise nest and re-execute; same gotcha as knn ring escalation).
- Convergence test is a checksum (count + sum of xxhash64 over
  canonical edges) that rides the round's OWN checkpoint action via
  DataFrame.observe — zero extra jobs per round, not a subtract/anti
  join and not a second pass over the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected canonical form: (min, max), loops dropped, distinct."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star_agg(e: DataFrame) -> DataFrame:
    """Attach every strictly-greater neighbor of u to min(N(u) + {u}).

    groupBy-min + join shape: two edge-list exchanges per step, but the
    min is partially aggregated map-side (hub nodes receive one row per
    map task) and the join back is a sort-merge join AQE can skew-split
    — the shape to pick when single components reach adjacency lists
    too large for one task (degree ~> 10^8)."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star_agg(e: DataFrame) -> DataFrame:
    """Attach every lesser-or-equal neighbor of u (and u) to their min."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Window-shaped large-star: min(N(u) + {u}) as a whole-partition
    window min — ONE edge-list exchange per step instead of the agg
    shape's groupBy + join-back two (measured 1.8x on the 1M-node bench
    graph; a star round is nothing but shuffles, so exchanges ARE the
    cost). Trade-off: a node's full adjacency sorts into one task, so
    per-node degree must fit a task (~10^8 rows) — true for banded
    dedup graphs (candidate generation caps bucket sizes upstream) and
    after round one (large-star flattens hubs); `star_impl="agg"`
    remains the AQE-skew-splittable fallback."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    m = F.least(F.col("u"), F.min("v").over(w))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Window-shaped small-star: one ordered window computes both the
    partition min (full frame) and rn==1 (the per-u emission of
    (u, min)), so the whole step is one exchange + one sort; the two
    output families leave via a 2-element explode instead of a union of
    two reads (a union would re-shuffle the frame twice)."""
    o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    ws = Window.partitionBy("u").orderBy("v")
    full = ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    st = o.select(
        "u",
        "v",
        F.min("v").over(full).alias("m"),
        F.row_number().over(ws).alias("rn"),
    )
    pairs = F.array(
        F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
        F.when(
            F.col("rn") == 1, F.struct(F.col("u").alias("a"), F.col("m").alias("b"))
        ),
    )
    return (
        st.select(F.explode(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("u"), F.col("p.b").alias("v"))
    )


def _uf_star_arrays(u, v):
    """Vectorized union-find over int64 edge arrays: min-hooking +
    pointer jumping over factorized ids (np.minimum.at resolves
    concurrent hooks; ids come back from np.unique SORTED, so index
    order == id order). Returns (roots, children) — one canonical
    (root=component min) < child edge per non-root node."""
    import numpy as np

    ids, codes = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = codes[: len(u)], codes[len(u):]
    p = np.arange(len(ids), dtype=np.int64)
    while True:
        while True:  # full path compression (p monotone under jumps)
            pp = p[p]
            if np.array_equal(pp, p):
                break
            p = pp
        ru, rv = p[ui], p[vi]
        live = ru != rv
        if not live.any():
            break
        hi = np.maximum(ru[live], rv[live])
        lo = np.minimum(ru[live], rv[live])
        np.minimum.at(p, hi, lo)  # union-by-min; collisions take min
    child = np.nonzero(p != np.arange(len(ids)))[0]
    return ids[p[child]], ids[child]


def _contract_partitions(e: DataFrame) -> DataFrame:
    """Partition-LOCAL pre-contraction — the standard two-phase CC
    optimization (SoCC'14 §6 'optimizations'): before any global star
    round shuffles, each partition contracts its own edges with an
    in-memory union-find and emits one (root, node) edge per non-root
    node it saw. Connectivity is preserved (contraction within a
    partition + union across partitions spans the same components), the
    output is never larger than the input (≤ one edge per distinct
    non-root node, parallel edges collapse for free), and long chains
    inside a partition vanish — so the global rounds start from a union
    of star forests and converge in 1-3 rounds instead of O(diameter).

    Zero shuffle: one mapInPandas pass. The union-find is vectorized
    min-hooking + pointer jumping over factorized ids (np.minimum.at
    resolves concurrent hooks; ids come back from np.unique SORTED, so
    index order == id order and emitted edges are already canonical
    u < v with u the partition-local component min)."""
    import numpy as np
    import pandas as pd

    def run(batches):
        us, vs = [], []
        for b in batches:
            us.append(b["u"].to_numpy(np.int64))
            vs.append(b["v"].to_numpy(np.int64))
        if not us:
            return
        u = np.concatenate(us)
        v = np.concatenate(vs)
        if len(u) == 0:
            return
        ru, rv = _uf_star_arrays(u, v)
        yield pd.DataFrame({"u": ru, "v": rv})

    return e.mapInPandas(run, "u BIGINT, v BIGINT")


def _star_rounds(
    e: DataFrame,
    prev: tuple[int, int],
    large,
    small,
    max_iter: int,
) -> tuple[DataFrame, tuple[int, int]]:
    """Alternating large/small star rounds until the canonical edge-set
    checksum reaches a fixed point. `e` must already be checkpointed
    with `prev` its checksum. Raises on non-convergence."""
    converged = prev[0] == 0
    for _ in range(max_iter):
        if converged:
            return e, prev
        e, cur = _checkpoint_with_checksum(_canonical(small(large(e))))
        converged = cur == prev
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components: star rounds did not converge after "
            f"{max_iter} iterations ({prev[0]} edges) — raise max_iter"
        )
    return e, prev


def _solve_frontier(
    E: DataFrame,
    prev: tuple[int, int],
    large,
    small,
    max_iter: int,
    frontier_max_nodes: int,
) -> tuple[DataFrame, tuple[int, int], bool]:
    """Solve the quotient graph: global star rounds over ONLY the edges
    incident to a CONFLICT node, then rewire the settled stars through
    the solved frontier with one broadcast join. `E` must be the
    checkpointed canonical output of partition-local pre-contraction
    (a union of per-partition min-rooted star forests) with checksum
    `prev`.

    Every cross-partition interaction MANIFESTS in E as a local
    star-property violation: a node that is a child in one partition's
    forest and a root (or child) in another's appears in E either in
    both the u and v columns (chained) or more than once in v
    (multi-parent). The conflict set S is therefore computable from E
    alone — one groupBy over the exploded endpoints.

    Why the rewire is sound: a settled edge (u, x) has u not in S and
    x not in S, so x appears exactly once in E (single parent, no
    children) and touches no frontier edge. u may still be merged into
    a smaller component through ANOTHER edge (u, y) with y in S — but
    that edge IS frontier, so u is a node of the solved frontier forest
    and the remap (child -> root) covers it; if u stayed a root (or
    never touched the frontier) the coalesce keeps u. Children stay
    unique across the final set (frontier children are disjoint from
    settled children) and every root is a component minimum; the
    post-convergence star-forest guard still verifies the result at
    runtime instead of trusting this argument.

    Cost: one skinny endpoint groupBy + a solve of the conflict
    subgraph + map-side broadcast splits/rewire of the checkpointed E.
    The solve itself is tiered: when S is empty E already IS the
    answer; when the frontier edge set fits the same cap it is solved
    ON THE DRIVER with the identical vectorized union-find (a star
    round costs ~0.5s of pure job overhead regardless of size — for a
    few-MB quotient graph the driver solve replaces 3+ rounds with one
    Arrow collect); when it exceeds the cap but S still broadcasts,
    distributed star rounds run over just the frontier subgraph; and
    when S itself exceeds `frontier_max_nodes` (hash-scattered edges at
    extreme scale, where the broadcast would not fit) it falls back to
    full global rounds — identical labels through every tier,
    property-tested.

    Returns (edges, checksum, guarded): guarded=True means the star-
    forest + child-uniqueness invariants were already verified HERE —
    in the driver tier the frontier forest is checked in numpy on the
    exact arrays the union-find produced (u∩v empty, v unique), and
    the settled side needs no pass at all: a settled child has nc == 1
    and np == 0 over ALL of E by the S predicate, so it appears in no
    other edge of either family, and a settled parent that the
    frontier merged is remapped to its frontier root (u ∈ fe ⇒ u is a
    node of the solved forest) while one that never touched fe has
    nc == 0 and stays a root. The caller then skips the distributed
    endpoint-explode guard — one full pass over the converged edge set
    (r6: measured ~15-20% of cc wall at bench scale, pure guard)."""
    sym = _endpoint_flags(E)
    S, n_frontier = _checkpoint_with_count(
        sym.groupBy("n")
        .agg(F.sum("p").alias("np"), F.sum("c").alias("nc"))
        .filter((F.col("nc") > 0) & ((F.col("np") > 0) | (F.col("nc") > 1)))
        .select("n")
    )
    if n_frontier == 0:
        # E is already a min-rooted star forest: the global answer.
        # S's filter IS the guard predicate (chained/multi-parent
        # endpoint detection over all of E), so zero frontier nodes ==
        # the guard already passed — no second endpoint pass needed.
        return E, prev, True
    if n_frontier > frontier_max_nodes:
        return (*_star_rounds(E, prev, large, small, max_iter), False)
    su = F.broadcast(S.select(F.col("n").alias("_fn"), F.lit(True).alias("_fu")))
    sv = F.broadcast(S.select(F.col("n").alias("_gn"), F.lit(True).alias("_fv")))
    flagged = (
        E.join(su, E["u"] == su["_fn"], "left")
        .drop("_fn")
        .join(sv, F.col("v") == sv["_gn"], "left")
        .drop("_gn")
    )
    is_front = F.col("_fu").isNotNull() | F.col("_fv").isNotNull()
    fe = flagged.filter(is_front).select("u", "v")
    settled = flagged.filter(~is_front).select("u", "v")
    # capped collect: limit(cap+1) decides driver-vs-distributed AND
    # delivers the rows in the SAME action (the interval_join probe
    # pattern) — previously a full count pass preceded the toPandas
    # pass, re-running the broadcast-flag scan of E for nothing
    pdf = fe.limit(frontier_max_nodes + 1).toPandas()
    guarded = len(pdf) <= frontier_max_nodes
    if guarded:
        # quotient graph fits the driver: one Arrow collect + the same
        # vectorized union-find the partitions ran, zero round jobs.
        # The star-forest invariants are checked RIGHT HERE on the
        # exact arrays (docstring's settled-side argument covers the
        # rewired edges), so the caller's distributed guard is skipped.
        import numpy as np
        import pandas as pd

        ru, rv = _uf_star_arrays(
            pdf["u"].to_numpy("int64"), pdf["v"].to_numpy("int64")
        )
        if len(np.intersect1d(ru, rv)) or len(np.unique(rv)) != len(rv):
            raise RuntimeError(
                "connected_components: driver union-find emitted a "
                "non-star frontier forest (internal invariant)"
            )
        f = E.sparkSession.createDataFrame(
            pd.DataFrame({"u": ru, "v": rv}), "u BIGINT, v BIGINT"
        )
    else:
        f, fprev = _checkpoint_with_checksum(fe)
        f, fprev = _star_rounds(f, fprev, large, small, max_iter)
    remap = F.broadcast(f.select(F.col("v").alias("_rn"), F.col("u").alias("_rr")))
    final = f.unionByName(
        settled.join(remap, settled["u"] == remap["_rn"], "left").select(
            F.coalesce(F.col("_rr"), F.col("u")).alias("u"), "v"
        )
    )
    return (*_checkpoint_with_checksum(final), guarded)


def _endpoint_flags(e: DataFrame) -> DataFrame:
    """(n, p, c) endpoint rows of an edge set — one row per endpoint with
    parent/child indicator columns, via a 2-element explode (ONE pass
    over the edges; the previous unionByName shape read them twice)."""
    return e.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u").alias("n"), F.lit(1).alias("p"), F.lit(0).alias("c")
                ),
                F.struct(
                    F.col("v").alias("n"), F.lit(0).alias("p"), F.lit(1).alias("c")
                ),
            )
        ).alias("s")
    ).select("s.*")


def _checkpoint_with_count(e: DataFrame) -> tuple[DataFrame, int]:
    """Materialize + row count in ONE action (count rides the eager
    localCheckpoint via observe — same trick as _checkpoint_with_checksum
    without the hash column)."""
    obs = Observation()
    observed = e.observe(obs, F.count(F.lit(1)).alias("n")).localCheckpoint()
    return observed, int(obs.get["n"])


def _checkpoint_with_checksum(e: DataFrame) -> tuple[DataFrame, tuple[int, int]]:
    """Materialize one round's edge set AND its convergence checksum in a
    SINGLE driver action: the (count, hash-sum) metrics ride the eager
    localCheckpoint's own materialization via DataFrame.observe, so a
    round costs exactly one job — previously it was two (checkpoint,
    then a checksum .first() re-reading the checkpointed partitions),
    and at bench scale the extra per-round action dominated cc latency.

    decimal(38,0) accumulator: a BIGINT sum of xxhash64 values overflows
    (and ANSI mode makes that an error, not a wrap)."""
    obs = Observation()
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).localCheckpoint()
    m = obs.get
    return observed, (int(m["n"]), int(m["h"]))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    max_iter: int = 30,
    star_impl: str = "window",
    pre_contract: bool = True,
    frontier_max_nodes: int = 2_000_000,
) -> DataFrame:
    """Connected components of the undirected graph given by `edges`.

    Returns a DataFrame (node, component) where component is the MINIMUM
    node id in the node's component — i.e. the dedup representative
    ("keep the smallest id, drop the rest" is a filter on
    node != component).

    `nodes` (optional, single column `id`) adds isolated vertices that
    appear in no edge; they map to themselves. Raises RuntimeError if
    the star rounds have not converged after `max_iter` (the paper's
    bound is O(log^2 n) w.h.p.; 30 covers any realistic corpus).

    `star_impl`: "window" (default — one exchange per star step,
    measured 1.8x faster; per-node adjacency must fit one task) or
    "agg" (groupBy+join — map-side partial min + AQE-splittable join
    for adversarial hub degrees). Identical results, property-tested.

    `pre_contract` (default True): contract each partition's edges with
    a local union-find before any shuffle (_contract_partitions) —
    strictly fewer edges enter the star rounds and chains local to a
    partition collapse immediately. Only applies to integral id
    columns (the factorized numpy union-find needs int64); any other
    type silently keeps the plain path. Identical results,
    property-tested.

    `frontier_max_nodes` (default 2M; 0 disables): with pre_contract,
    a node seen by exactly ONE partition had its whole neighborhood
    contracted locally — its star is globally final. Global star rounds
    therefore only need the edges touching the cross-partition frontier
    (nodes seen by >=2 partitions). When the frontier fits a broadcast
    (<= frontier_max_nodes), the rounds run on that quotient subgraph
    and the settled stars are rewired with one broadcast join — on
    locality-preserving inputs (range-partitioned ingest, band-bucketed
    candidate pairs) the frontier is a fraction of a percent of the
    edges. Above the cap (e.g. fully hash-scattered edges at 10^12
    scale) it falls back to global rounds — same results either way,
    property-tested, and the post-convergence star-forest +
    child-uniqueness guards verify the construction at runtime.
    """
    if star_impl == "window":
        large, small = _large_star, _small_star
    elif star_impl == "agg":
        large, small = _large_star_agg, _small_star_agg
    else:
        raise ValueError(f"star_impl must be 'window' or 'agg', got {star_impl!r}")
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    integral = all(
        t in ("tinyint", "smallint", "int", "bigint") for _, t in e0.dtypes
    )
    if pre_contract and integral:
        canon0 = e0.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        # NO _canonical here: contraction output is canonical BY
        # CONSTRUCTION (each partition emits root < child with root the
        # local component min, no loops), so the only thing _canonical
        # added was a full-edge-list distinct exchange. Cross-partition
        # duplicate (root, child) rows are harmless: a duplicated child
        # has nc >= 2, which is exactly the frontier-conflict predicate,
        # so every copy lands in the conflict subgraph where the
        # union-find (driver tier) or _canonical-per-round (star tiers)
        # collapses it — settled edges (nc == 1) are dup-free by
        # definition. Saves one full shuffle of the contracted edges.
        e, prev = _checkpoint_with_checksum(_contract_partitions(canon0))
        if frontier_max_nodes > 0 and prev[0] > 0:
            e, prev, guarded = _solve_frontier(
                e, prev, large, small, max_iter, frontier_max_nodes
            )
        else:
            e, prev = _star_rounds(e, prev, large, small, max_iter)
            guarded = False
    else:
        e, prev = _checkpoint_with_checksum(_canonical(e0))
        e, prev = _star_rounds(e, prev, large, small, max_iter)
        guarded = False
    if prev[0] > 0 and not guarded:
        # A checksum fixed point of S∘L (or the distributed frontier
        # construction) must also BE a star forest before we read
        # components off the edges: in canonical (min, max) form a star
        # forest has no node in both the parent (u) and child (v)
        # columns AND no child with two parents. ONE endpoint-explode
        # exchange checks both (the previous two-distinct-join shape
        # cost three exchanges); the child-uniqueness check is what
        # licenses the shuffle-free comp assembly below. Tiers that
        # already proved the invariants (empty frontier == the guard
        # predicate itself; driver union-find checked on its arrays +
        # the settled-side argument) skip this pass — it re-read the
        # whole converged edge set only to verify it (r6).
        non_star = (
            _endpoint_flags(e)
            .groupBy("n")
            .agg(F.sum("p").alias("np"), F.sum("c").alias("nc"))
            .filter((F.col("nc") > 0) & ((F.col("np") > 0) | (F.col("nc") > 1)))
            .count()
        )
        if non_star:
            raise RuntimeError(
                "connected_components: converged edge set is not a star "
                f"forest ({non_star} chained/multi-parent nodes) — raise "
                "max_iter"
            )
    # converged canonical edges are (root=component min, child). The
    # guard proved children unique and disjoint from roots, so the
    # child rows need NO aggregation at all (zero shuffle) — only the
    # root self-rows dedup, and that distinct's map-side partials
    # shrink it to one row per root per task before the exchange
    # (previously the whole 2|E| node list went through a groupBy-min).
    comp = e.select(F.col("v").alias("node"), F.col("u").alias("component")).unionByName(
        e.select("u").distinct().select(F.col("u").alias("node"), F.col("u").alias("component"))
    )
    if nodes is not None:
        # `nodes` ADDS isolated vertices; it never filters. Edge
        # endpoints absent from `nodes` keep their rows (anti-join picks
        # out only the genuinely isolated ids), so the output always
        # covers endpoints ∪ nodes.
        all_nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()
        isolated = all_nodes.join(comp.select("node"), "node", "left_anti").select(
            "node", F.col("node").alias("component")
        )
        comp = comp.unionByName(isolated)
    return comp

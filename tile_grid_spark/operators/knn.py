"""Cell-ring kNN join with ring escalation.

North-rule operator. Generalizes the reference's neighbors() 1-ring
(/root/reference/src/tms.rs:951-971) to ring-r candidate enumeration:

  1. index queries and candidates to tiles at `zoom`
  2. ring r: explode query tiles to all tiles with Chebyshev distance <= r
     (sequence x sequence generator, no UDF)
  3. equi-join candidates on the tile key, compute exact distance,
     window row_number top-k per query
  4. a query is DONE when it has >= k neighbors AND its k-th distance is
     <= r * tile_unit (everything outside the searched rings is provably
     farther in the Mercator plane); pending queries escalate r
     (1 -> 4 -> 16 ...) and finally fall back to a brute-force join.

Distance metric: Euclidean in the Mercator plane (meters at the equator,
scaled by cos(lat) elsewhere) — monotone with tile geometry so the ring
stopping rule is exact for this metric. On globally-spanning grids the
x axis WRAPS at lon=+-180: ring tiles wrap modulo matrix_width and the
distance uses the shorter way around (min(|dx|, world - |dx|)), so
queries near the seam find their true wrapped neighbors. Non-global
grids filter out-of-matrix ring tiles instead.

Each escalation round is one Spark job over only the still-pending
queries (anti-join), so dense areas finish at r=1 and the long tail pays
for itself only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.tms import Tms, ZoomParams
from ..functions.grid_cols import mercator_x, mercator_y, with_tile


def _ring_explode(
    df: DataFrame, r: int, p: ZoomParams, wrap_x: bool, r_exclude: int | None = None
) -> DataFrame:
    """Explode each row to VALID tiles at Chebyshev distance <= r of its
    tile (optionally excluding the inner <= r_exclude box already
    searched). y never wraps (rows outside the matrix are filtered, so a
    negative index can never alias into the previous x-slot of the packed
    key); x wraps modulo matrix_width when wrap_x, else filters. Caller
    guarantees 2r+1 <= matrix_width when wrap_x so wrapped tiles stay
    distinct per row."""
    from ..functions.grid_cols import tile_key

    e = (
        df.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
    )
    if r_exclude is not None:
        e = e.filter(
            (F.abs(F.col("_dx")) > r_exclude) | (F.abs(F.col("_dy")) > r_exclude)
        )
    ny = F.col("tile_y") + F.col("_dy")
    e = e.filter((ny >= 0) & (ny <= F.lit(p.matrix_height - 1)))
    nx = F.col("tile_x") + F.col("_dx")
    if wrap_x:
        nx = F.pmod(nx, F.lit(p.matrix_width))
    else:
        e = e.filter((nx >= 0) & (nx <= F.lit(p.matrix_width - 1)))
    return e.withColumn("_jk", tile_key(nx, ny)).drop("_dx", "_dy")


def knn_join(
    queries: DataFrame,
    candidates: DataFrame,
    tms: Tms,
    zoom: int,
    k: int,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    lon: str = "lon",
    lat: str = "lat",
    max_ring: int = 16,
    broadcast_threshold_rows: int = 2_000_000,
    max_tail_pairs: int | None = 10_000_000_000,
) -> DataFrame:
    """Exact k nearest candidates per query (Mercator-plane metric,
    antimeridian-wrapped on global grids).

    Returns (query_id, cand_id, dist, rank). Driver-side escalation loop;
    each round is localCheckpoint()ed so both the data AND the logical
    plan of prior rounds are never re-derived (plan-blowup guard). The
    brute-force tail broadcasts whichever side fits under
    `broadcast_threshold_rows` and refuses (raises) beyond
    `max_tail_pairs` pending x candidate pairs — the one place a
    cartesian could survive at scale is bounded, not silent.
    """
    from ..core.model import meters_per_unit

    p = tms.zoom_params(zoom)
    # The distance metric is ALWAYS Mercator-plane meters (qx/qy below),
    # so the ring stopping bound and the wrap width must be in the SAME
    # units. meters_per_unit converts the CRS tile edge: exact for
    # projected-meter grids (mpu=1) and for the x axis of geographic
    # grids (mercator_x(lon) = lon * pi*R/180 = lon * mpu); a LOWER
    # bound in y (d|mercator_y|/dlat = mpu / cos(lat) >= mpu), so the
    # "everything outside the searched rings is farther" rule stays
    # exact — conservative at worst. Pre-fix, a 4326 TMS mixed degrees
    # (unit, world_w=360) with meter distances and the wrap arm
    # corrupted every distance via least(adx_m, 360 - adx_m).
    mpu = meters_per_unit(tms.crs())
    unit = p.resolution * float(p.tile_width) * mpu  # tile edge, Mercator m
    bbox = tms.bbox()
    # x wraps only when the grid spans the full longitude range
    wrap_x = abs(bbox.left + 180.0) < 1e-9 and abs(bbox.right - 180.0) < 1e-9
    xyb = tms.xy_bbox()
    world_w = float(xyb.right - xyb.left) * mpu  # Mercator world width

    q = with_tile(
        queries.select(query_id, lon, lat), tms, zoom, lon=lon, lat=lat
    ).withColumns({"qx": mercator_x(lon), "qy": mercator_y(lat)}).select(
        query_id, "tile_x", "tile_y", "qx", "qy"
    )
    from ..functions.grid_cols import tile_key

    c = with_tile(
        candidates.select(cand_id, lon, lat), tms, zoom, lon=lon, lat=lat
    ).withColumns({"cx": mercator_x(lon), "cy": mercator_y(lat)}).select(
        cand_id, tile_key("tile_x", "tile_y").alias("_jk"), "cx", "cy"
    )
    # localCheckpoint, not .cache(): the candidate index is re-read every
    # escalation round + the brute tail, but a Dataset cache entry stays
    # pinned in the session CacheManager after return with no unpersist
    # hook; checkpoint storage is ContextCleaner-released once the result
    # is GC'd.
    c = c.localCheckpoint()

    adx = F.abs(F.col("qx") - F.col("cx"))
    dx_eff = F.least(adx, F.lit(world_w) - adx) if wrap_x else adx
    dist = F.sqrt(dx_eff ** 2 + (F.col("qy") - F.col("cy")) ** 2)
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(cand_id).asc())

    pending = q.localCheckpoint()
    results: list[DataFrame] = []
    r = 1
    # with wrap, rings wider than the matrix would duplicate wrapped
    # tiles; such zooms go straight to the (tiny-matrix) brute force
    while r <= max_ring and (not wrap_x or 2 * r + 1 <= p.matrix_width):
        ringed = _ring_explode(pending, r, p, wrap_x)
        joined = ringed.join(c, on="_jk", how="inner").withColumn("dist", dist)
        topk = (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, cand_id, "dist", "rank")
        )
        # localCheckpoint (not cache): truncates lineage so the unioned
        # result plan stays O(rounds) — with cache the LOGICAL plan still
        # accretes every prior round and Catalyst re-analyzes a growing
        # tree each iteration (measured 117 exchanges in the printed plan
        # at 3 rounds; bounded and tiny after truncation). Trade-off:
        # checkpointed partitions are not recomputable on executor loss —
        # production reruns the job stage from the lineage log instead.
        topk = topk.localCheckpoint()
        # done: k found and k-th distance provably inside the searched rings
        kth = topk.groupBy(query_id).agg(
            F.count("*").alias("_n"), F.max("dist").alias("_kth")
        )
        # strict <: a candidate in an unsearched tile can sit exactly at
        # r*unit when the query hugs its tile edge, so <= could drop an
        # equal-distance neighbor; < makes the rule exact.
        done_ids = kth.filter(
            (F.col("_n") >= k) & (F.col("_kth") < F.lit(float(r) * unit))
        ).select(query_id)
        results.append(
            topk.join(F.broadcast(done_ids), query_id, "left_semi")
        )
        pending = pending.join(F.broadcast(done_ids), query_id, "left_anti").localCheckpoint()
        if pending.isEmpty():
            pending = None
            break
        r *= 4

    if pending is not None and not pending.isEmpty():
        # brute-force tail: remaining queries x all candidates. Broadcast
        # the side that fits (BroadcastNestedLoopJoin) and bound the pair
        # count — an unbounded cartesian is the one plan that cannot
        # survive a 100x scale-up.
        n_c = c.count()
        n_p = pending.count()
        if max_tail_pairs is not None and n_p * n_c > max_tail_pairs:
            raise ValueError(
                f"kNN brute-force tail is {n_p} pending x {n_c} candidates "
                f"= {n_p * n_c} pairs > max_tail_pairs={max_tail_pairs}; "
                "raise max_ring (more escalation rounds) or max_tail_pairs"
            )
        if n_c <= broadcast_threshold_rows:
            cj = pending.crossJoin(F.broadcast(c))
        elif n_p <= broadcast_threshold_rows:
            cj = c.crossJoin(F.broadcast(pending))
        else:
            raise ValueError(
                f"kNN brute-force tail: neither side fits the broadcast "
                f"threshold ({n_p} pending, {n_c} candidates, threshold "
                f"{broadcast_threshold_rows}); raise max_ring so the ring "
                "join handles these queries"
            )
        tail = (
            cj.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, cand_id, "dist", "rank")
        )
        results.append(tail)

    if not results:
        # empty queries (or a zero-round loop on a degenerate grid) with
        # nothing pending: return an empty frame with the right schema
        return (
            q.join(c, F.lit(False))
            .withColumn("dist", F.lit(0.0))
            .withColumn("rank", F.lit(1))
            .select(query_id, cand_id, "dist", "rank")
        )
    out = results[0]
    for part in results[1:]:
        out = out.unionByName(part)
    return out


def radius_join(
    left: DataFrame,
    right: DataFrame,
    tms: Tms,
    radius: float,
    left_id: str = "left_id",
    right_id: str = "right_id",
    lon: str = "lon",
    lat: str = "lat",
    zoom: int | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """All (left, right) pairs within `radius` Mercator-plane meters —
    the WITHIN-DISTANCE companion of knn_join (same metric, same
    antimeridian wrap; generalizes the reference's 1-ring neighbors(),
    /root/reference/src/tms.rs:951-971, to distance predicates).

    Returns (left_id, right_id, dist). Self-pairs of a self-join are the
    caller's filter (ids are opaque here).

    Scale shape — a distance predicate with no equality conjunct plans
    as a cartesian nested loop; this operator manufactures the equi-key
    from tile geometry instead:

      zoom is auto-picked as the DEEPEST level whose tile edge >= radius
      (tile edges are uniform in the Mercator plane, so the pick is one
      closed-form scan of the pyramid); then any pair within `radius`
      differs by <= 1 tile index per axis, so a fixed 3x3 ring explode
      of the LEFT side + equi-join on the packed tile key provably finds
      every pair exactly once (right rows live in exactly one tile; ring
      tiles are distinct). Constant 9x build fan-out, candidate volume
      ~ sum_t |L_ring(t)|*|R(t)| — local density, never |L|x|R| — and
      the exact-distance verify is native Column math inside the join.
      Dense-tile key skew is runtime-handled by AQE skew-join splitting.

    Raises when no zoom gives a wrap-safe cover (radius within a factor
    ~4 of the world width): such a predicate matches a constant fraction
    of the globe per row — use bbox_overlap/cross strategies explicitly.

    `broadcast_right=True` hints the right-side tile index into a
    broadcast hash join (LongHashedRelation on the packed key): the
    9x-exploded LEFT side then never shuffles at all. Callers assert
    the right side fits a broadcast (e.g. dbscan's capped |points|
    probe); the default keeps the shuffled join AQE can skew-split.
    """
    from ..core.model import meters_per_unit
    from ..functions.grid_cols import tile_key

    if radius <= 0:
        raise ValueError("radius_join: radius must be positive")
    mpu = meters_per_unit(tms.crs())
    bbox = tms.bbox()
    wrap_x = abs(bbox.left + 180.0) < 1e-9 and abs(bbox.right - 180.0) < 1e-9
    xyb = tms.xy_bbox()
    world_w = float(xyb.right - xyb.left) * mpu

    if zoom is None:
        # deepest z whose tile edge still covers the radius; shallow
        # levels of a wrapping grid (matrix width < 3) are skipped, NOT
        # break points — z0/z1 of a global quadtree fail the wrap check
        # while z2+ are fine
        zoom = -1
        for z in range(31):
            try:
                pz = tms.zoom_params(z)
            except Exception:
                break
            unit_z = pz.resolution * float(pz.tile_width) * mpu
            if unit_z < radius:
                break  # monotone: deeper only shrinks
            if not wrap_x or pz.matrix_width >= 3:
                zoom = z
        if zoom < 0:
            raise ValueError(
                f"radius_join: no zoom of this TMS gives a wrap-safe 3x3 "
                f"cover for radius={radius} (world width {world_w:.0f} m) "
                "— use an explicit bbox/cross strategy for near-global radii"
            )
    p = tms.zoom_params(zoom)
    unit = p.resolution * float(p.tile_width) * mpu
    if unit < radius:
        raise ValueError(
            f"radius_join: tile edge at zoom {zoom} is {unit:.0f} m < "
            f"radius {radius:.0f} m — the 3x3 ring would miss pairs"
        )

    l = with_tile(
        left.select(left_id, lon, lat), tms, zoom, lon=lon, lat=lat
    ).withColumns({"qx": mercator_x(lon), "qy": mercator_y(lat)}).select(
        left_id, "tile_x", "tile_y", "qx", "qy"
    )
    r = with_tile(
        right.select(right_id, lon, lat), tms, zoom, lon=lon, lat=lat
    ).withColumns({"cx": mercator_x(lon), "cy": mercator_y(lat)}).select(
        right_id, tile_key("tile_x", "tile_y").alias("_jk"), "cx", "cy"
    )
    if broadcast_right:
        r = F.broadcast(r)
    ringed = _ring_explode(l, 1, p, wrap_x)
    adx = F.abs(F.col("qx") - F.col("cx"))
    dx_eff = F.least(adx, F.lit(world_w) - adx) if wrap_x else adx
    dy = F.col("qy") - F.col("cy")
    # dx*dx (not pow) so the oracle's `x * x` reproduces the value
    # bit-for-bit (Math.pow(x, 2) is not guaranteed correctly rounded)
    dist = F.sqrt(dx_eff * dx_eff + dy * dy)
    return (
        ringed.join(r, on="_jk", how="inner")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(float(radius)))
        .select(left_id, right_id, "dist")
    )

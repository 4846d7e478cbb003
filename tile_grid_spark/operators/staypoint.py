"""Stay-point (dwell) detection over point trajectories.

A stay point is a maximal run of consecutive fixes that stays within a
radius — the unit of "the user was AT a place" that feeds POI mining,
home/work inference, and trip segmentation (Li et al., GIS'08 shape,
expressed as a windowed segmentation instead of the paper's anchor
scan so it distributes).

Spark-first shape: ONE shuffle total. The lag-window partitions by the
trajectory key and sorts by time; the break flag's running sum labels
segments; the per-(key, segment) aggregate reuses the window's hash
partitioning (groupBy on a superset key needs no second exchange —
plan-tested). Geometry is the equirectangular planar approximation
(adequate at dwell radii of tens-to-hundreds of meters; it degrades
only for segments spanning degrees, which are not dwells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# meters per degree of latitude (and of longitude at the equator)
M_PER_DEG = 111320.0


def planar_dist_m(lon1, lat1, lon2, lat2) -> F.Column:
    """Equirectangular distance in meters between two lon/lat Columns:
    sqrt((dlon*cos(mid_lat))^2 + dlat^2) * 111320."""
    dx = (lon2 - lon1) * F.cos(F.radians((lat1 + lat2) / 2.0))
    dy = lat2 - lat1
    return F.sqrt(dx * dx + dy * dy) * F.lit(M_PER_DEG)


def od_flows(
    sp: DataFrame,
    tms,
    zoom: int,
    user: str = "user_id",
    seg: str = "seg_id",
    t_start: str = "t_start_s",
    t_end: str = "t_end_s",
    lon: str = "ctr_lon",
    lat: str = "ctr_lat",
    min_trips: int = 1,
) -> DataFrame:
    """Origin→destination flow matrix from per-user stay-point
    sequences: consecutive stay points (lead over the user's dwell
    timeline) become trips; trip endpoints snap to engine grid tiles at
    `zoom`; flows aggregate per (from_tile, to_tile) with trip count,
    distinct travelers, and total travel seconds (gap between leaving
    the origin and entering the destination).

    Composed with staypoints() the whole mobility pipeline is TWO
    exchanges: the stay-point agg leaves the frame hash-partitioned by
    user, the lead window reuses that, and only the final tile-pair agg
    reshuffles — short integer keys end to end. The privacy-style
    `min_trips` floor (k-anonymity-ish suppression of thin flows) is a
    standard release gate for OD matrices."""
    from tile_grid_spark.functions import grid_cols as G

    w = Window.partitionBy(user).orderBy(t_start, seg)
    t = (
        sp.withColumn("_nlon", F.lead(lon).over(w))
        .withColumn("_nlat", F.lead(lat).over(w))
        .withColumn(
            "_travel_s", F.lead(t_start).over(w) - F.col(t_end)
        )
        .filter(F.col("_nlon").isNotNull())
    )
    t = G.with_tile(t, tms, zoom, lon=lon, lat=lat, out_x="from_x", out_y="from_y")
    t = G.with_tile(
        t, tms, zoom, lon="_nlon", lat="_nlat", out_x="to_x", out_y="to_y"
    )
    return (
        t.groupBy("from_x", "from_y", "to_x", "to_y")
        .agg(
            F.count("*").alias("n_trips"),
            F.countDistinct(user).alias("n_users"),
            F.sum("_travel_s").alias("total_travel_s"),
        )
        .filter(F.col("n_trips") >= min_trips)
    )


def staypoints(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    radius_m: float = 100.0,
    min_duration_s: float = 0.0,
    min_points: int = 2,
    tiebreak: str | None = None,
) -> DataFrame:
    """Segments each user's time-ordered fixes at gaps where the step to
    the previous fix exceeds `radius_m`, then keeps segments with at
    least `min_points` fixes and `min_duration_s` seconds of dwell.

    Returns (user, seg_id, n_points, t_start_s, t_end_s, duration_s,
    ctr_lon, ctr_lat); seg_id counts from 1 in time order per user;
    t_*_s are floor-epoch seconds (the engine-portable timestamp form,
    same convention as the sessionization query); centroids are segment
    means rounded to 6. `tiebreak` orders same-timestamp fixes
    deterministically (pass the event id — without it, equal timestamps
    make segmentation nondeterministic).
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    prev_lon = F.lag(lon).over(w)
    prev_lat = F.lag(lat).over(w)
    brk = (
        F.when(prev_lon.isNull(), F.lit(1))
        .when(
            planar_dist_m(prev_lon, prev_lat, F.col(lon), F.col(lat))
            > F.lit(float(radius_m)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    seg = df.withColumn(
        "seg_id", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    out = (
        seg.groupBy(user, "seg_id")
        .agg(
            F.count("*").alias("n_points"),
            F.min(F.col(ts).cast("timestamp").cast("long")).alias("t_start_s"),
            F.max(F.col(ts).cast("timestamp").cast("long")).alias("t_end_s"),
            (
                F.max(F.col(ts).cast("timestamp").cast("long"))
                - F.min(F.col(ts).cast("timestamp").cast("long"))
            ).alias("duration_s"),
            F.round(F.avg(lon), 6).alias("ctr_lon"),
            F.round(F.avg(lat), 6).alias("ctr_lat"),
        )
        .filter(
            (F.col("n_points") >= min_points)
            & (F.col("duration_s") >= float(min_duration_s))
        )
    )
    return out

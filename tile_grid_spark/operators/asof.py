"""As-of (point-in-time) join.

The reference library has no temporal operators (it is pure tile math,
/root/reference/src/tms.rs); this is one of the engine-level dataflow
operators a web-scale pipeline needs (SURVEY.md §2.B.3 "as-of/range
flavor"). Semantics follow the industry-standard backward as-of join
(pandas.merge_asof / DuckDB ASOF JOIN): for each left row, pick the
single right row with the greatest right-ts <= left-ts within the same
key group.

Scale design — union + running window, NOT a range join:

    left(tag=1) ∪ right(tag=0)
      -> window partitionBy(keys) orderBy(ts, tag, tiebreak)
      -> last(right_cols, ignoreNulls) over rowsBetween(-inf, 0)
      -> filter tag=1

One shuffle on the join keys, linear work, no candidate explosion. A
naive theta-join (l.key = r.key AND r.ts <= l.ts) + max() produces
|left| x |right-per-key| intermediate rows — quadratic per key, fatal
at 100 TB. The union plan's cost is |left| + |right| regardless of
temporal density. Skewed keys degrade to single-task sort per key; for
known-hot keys pre-split by time range and stitch (not needed at the
test scales — documented here for the 1000-executor case).

Ties: right rows sort before left rows at equal ts (tag 0 < 1), so a
right row at exactly left-ts matches (<=, like merge_asof). Among
right rows with identical ts, the greatest tiebreak column wins,
making the result deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at-or-before.

    on         equality key columns (both sides)
    left_ts    event-time column on left (timestamp)
    right_ts   event-time column on right (timestamp)
    right_cols right columns to carry (each becomes `asof_<name>`)
    tiebreak   right column ordering ties at equal ts (default: first
               of right_cols)
    tolerance_sec  if set, matches older than this many seconds are
               nulled out (pandas merge_asof `tolerance`)

    Returns left schema + asof_<c> for c in right_cols + asof_ts.
    """
    on = list(on)
    right_cols = list(right_cols)
    tiebreak = tiebreak or right_cols[0]
    from pyspark.sql.types import DateType, NumericType, TimestampType, TimestampNTZType

    tb_type = right.schema[tiebreak].dataType
    if not isinstance(tb_type, (NumericType, TimestampType, TimestampNTZType, DateType)):
        # a non-castable tiebreak would silently become NULL and make
        # equal-ts matches nondeterministic across runs/partitionings
        raise TypeError(f"tiebreak column {tiebreak!r} must be numeric/temporal, got {tb_type}")

    # all right payload rides in ONE struct so the window's last() picks
    # the matched row ATOMICALLY — per-column last(ignorenulls) would
    # back-fill a NULL payload column from an OLDER right row, tearing
    # the output across two right rows (merge_asof/DuckDB carry the
    # matched row's NULL)
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        (
            F.col(tiebreak).cast("timestamp").cast("long")
            if isinstance(tb_type, (TimestampType, TimestampNTZType, DateType))
            else F.col(tiebreak).cast("long")
        ).alias("_tie"),
        F.struct(
            *[F.col(c) for c in right_cols],
            F.col(right_ts).alias("_rts"),
        ).alias("_r"),
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
    )
    r_tagged = r_tagged.withColumn(
        "_left", F.lit(None).cast(l_tagged.schema["_left"].dataType)
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )

    out = carried.filter(F.col("_tag") == 1)
    matched = F.col("_m")
    if tolerance_sec is not None:
        # double cast: TIMESTAMP_NTZ has no direct long cast
        stale = (
            F.col("_ts").cast("timestamp").cast("long")
            - F.col("_m._rts").cast("timestamp").cast("long")
        ) > F.lit(int(tolerance_sec))
        matched = F.when(stale, F.lit(None)).otherwise(F.col("_m"))
        out = out.withColumn("_m", matched)

    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_cols],
        F.col("_m._rts").alias("asof_ts"),
    )

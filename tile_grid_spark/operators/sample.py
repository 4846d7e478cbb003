"""Deterministic stratified sampling for corpus construction.

No reference counterpart (pure tile math, /root/reference/src/tms.rs);
SURVEY.md §2.D.5 corpus management. Building a training mix means
down/up-weighting strata (source, language, quality band) at exact
per-stratum rates — and at 100 TB the sample must be:

- partition-invariant: a row's verdict depends only on its own id,
  never on partitioning, task count, or row order (df.sample() is
  per-partition pseudo-random — repartitioning changes the sample);
- append-stable: adding new rows never flips existing verdicts, so
  incremental corpus refreshes don't churn the training set;
- zero-shuffle: the filter is a scan-side mapper, selectivity applied
  before anything downstream shuffles.

Same md5-threshold scheme as the train/val/test split
(__spark_entry__.q_dataset_split): bucket = md5_60bit(seed:id) mod M,
keep iff bucket < rate·M. Integer compare — no float-boundary parity
risk against the DuckDB oracle, and disjoint seeds give independent
samples from the same table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tile_grid_spark.operators.dedup import md5_hash60

# rate denominator: rates are exact multiples of 1e-6
SAMPLE_MOD = 1_000_000


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str | Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    id_col       unique row id (hashed with `seed` for the verdict)
    strata_col   stratum label column (or expression)
    rates        stratum -> keep rate in [0, 1]; exact at 1e-6
                 granularity (rate*1e6 is truncated to an integer
                 threshold, so 1.0 keeps everything, 0.0 nothing)
    default_rate rate for strata not listed in `rates`
    seed         hash-family seed: different seeds draw independent
                 samples; the same seed is reproducible forever

    Adds `_sample_bucket` (the 0..999999 hash bucket) for auditability;
    callers can drop it. One codegen'd filter, no shuffle, no RNG state.
    """
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"stratified_sample: rate for {k!r} not in [0,1]: {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"stratified_sample: default_rate not in [0,1]")
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr: Column = F.lit(int(default_rate * SAMPLE_MOD))
    for k, v in rates.items():
        thr = F.when(s == F.lit(k), F.lit(int(v * SAMPLE_MOD))).otherwise(thr)
    bucket = F.pmod(
        md5_hash60(F.col(id_col).cast("string"), prefix=seed), F.lit(SAMPLE_MOD)
    )
    return df.withColumn("_sample_bucket", bucket).filter(
        F.col("_sample_bucket") < thr
    )


def rendezvous_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shard",
    out: str = "shard",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: shard(id) =
    argmax over s in [0, n_shards) of md5_60bit('{seed}:{s}:' || id) —
    the standard minimal-movement sharding for incremental corpus
    refreshes: growing n -> n+1 moves ONLY the rows whose new shard
    wins the argmax (expected 1/(n+1) of the data); every other row
    keeps its shard, so downstream per-shard artifacts (training shards,
    tile stores) stay valid. mod-N hashing would reshuffle ~all rows.

    Zero-shuffle native-Column mapper (one md5 per shard per row —
    n_shards is the SHARD count, e.g. 64-4096, not the row count; the
    n_shards-way fan-out stays inside one codegen'd projection). Ties
    break to the LOWEST shard index deterministically (array_position
    returns the first maximum). Partition-invariant and append-stable
    like stratified_sample."""
    if n_shards < 1:
        raise ValueError(f"rendezvous_shard: n_shards must be >= 1, got {n_shards}")
    from tile_grid_spark.operators.dedup import md5_hash60

    sid = F.col(id_col).cast("string")
    hs = F.array(
        *[md5_hash60(sid, prefix=f"{seed}:{s}") for s in range(n_shards)]
    )
    return df.withColumn(
        out, (F.array_position(hs, F.array_max(hs)) - 1).cast("int")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    strata_col: str | Column | None = None,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis A-ES scheme — per row draw u in (0, 1] from the
    md5 hash family (seeded, id-keyed: partition-invariant like
    stratified_sample) and keep the k rows per stratum with the
    smallest exponential key -ln(u)/w. Inclusion probability is
    proportional to weight within the without-replacement constraint —
    the standard way to bias a training mix toward long/high-quality
    documents while keeping the draw reproducible and append-stable in
    distribution (existing rows' keys never change; a new row can only
    displace the current k-th).

    Shape: one window shuffle on the stratum (WindowGroupLimit pushes
    the rank<=k filter before the exchange, so each map task forwards
    at most k rows per stratum it sees). With strata_col=None a single
    global stratum is used — fine because of the pushed partial top-k:
    the final task receives tasks*k rows, not the table.

    Returns the sampled rows + `ws_rank` (1..k by key order). Weights
    must be > 0 — enforced with an in-plan assertion (no eager scan).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    strat = (
        (F.col(strata_col) if isinstance(strata_col, str) else strata_col)
        if strata_col is not None
        else F.lit("_all")
    )
    h = md5_hash60(F.col(id_col), prefix=seed)
    # u in (0, 1]: (h + 1) / 2^60 — h is uniform on [0, 2^60)
    u = (h + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    guard = F.when(
        w > 0, -F.log(u) / w.cast("double")
    ).otherwise(
        F.assert_true(w > 0, F.lit("weighted_sample: weight must be > 0")).cast(
            "double"
        )
    )
    key = guard
    win = Window.partitionBy(strat).orderBy(F.col("_ws_key").asc(), F.col(id_col))
    return (
        df.withColumn("_ws_key", key)
        .withColumn("ws_rank", F.row_number().over(win))
        .filter(F.col("ws_rank") <= k)
        .drop("_ws_key")
    )

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

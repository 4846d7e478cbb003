"""IO seam: one place that maps logical table names to physical storage.

Local/sandbox: parquet files under a scale-factor directory. Production:
the same logical schema as an Iceberg table — swap `read_table` to
``spark.read.format("iceberg").load(f"{catalog}.{db}.{name}")``; nothing
above this seam changes. (No Iceberg jar ships in the sandbox, so the
production path is documented, not imported.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("zoom",),
    sort_cols: tuple[str, ...] = ("tile_x", "tile_y"),
    mode: str = "overwrite",
) -> None:
    """Tile-layout write: partition dirs by zoom, files range-sorted by tile.

    At 100 TB this is what makes downstream reads prune: partition pruning
    on zoom + min/max file skipping on tile_x/tile_y. Iceberg equivalent:
    ``writeTo(...).partitionedBy(col("zoom")).createOrReplace()`` with a
    sort order on (tile_x, tile_y).
    """
    (
        df.repartitionByRange(*(list(partition_cols) + list(sort_cols)))
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    bucket_cols: tuple[str, ...] = ("tile_key",),
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table write: pre-pays the shuffle
    ONCE at write time so every later join/aggregate on the bucket key
    between co-bucketed tables runs with ZERO exchanges (asserted in
    tests/test_plan_shapes.py). At 100 TB this turns per-query fact x
    fact shuffles into local merge joins. Iceberg equivalent: a
    ``bucket(N, tile_key)`` partition transform + sort order; parquet +
    session catalog here (bucket metadata needs saveAsTable).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)

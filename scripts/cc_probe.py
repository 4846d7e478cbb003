"""One-off probe: where does connected_components spend its time at
bench scale? Prints rounds, per-round wall, and total. Not part of the
suite — run manually in a quiet window."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tile_grid_spark.plans.session import build_session  # noqa: E402


def main() -> None:
    n = int(os.environ.get("CC_NODES", "1000000"))
    spark = build_session()
    ids = spark.range(n)
    e1 = ids.filter(F.pmod("id", F.lit(8)) < 7).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    e2 = ids.filter(F.pmod("id", F.lit(80)) == 3).select(
        F.col("id").alias("id_a"), (F.col("id") + 11).alias("id_b")
    )
    edges = e1.unionByName(e2)

    import tile_grid_spark.operators.cluster as C

    orig = C._checkpoint_with_checksum
    times = []

    def timed(e):
        t0 = time.time()
        out = orig(e)
        times.append(time.time() - t0)
        return out

    C._checkpoint_with_checksum = timed
    t0 = time.time()
    comp = C.connected_components(edges)
    rows = comp.count()
    total = time.time() - t0
    print(
        f"rounds={len(times) - 1} total={total:.2f}s rows={rows} "
        f"round_times={[round(t, 2) for t in times]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Property-based tests (hypothesis) for the engine-only operators:
asof_join vs pandas.merge_asof and bbox_overlap_join vs brute force on
randomized inputs. Spark-roundtrip per example is expensive, so examples
are few but adversarial (tight ranges force collisions and ties)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tile_grid_spark.core import tms
from tile_grid_spark.operators.asof import asof_join
from tile_grid_spark.operators.overlap_join import bbox_overlap_join

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(5, 40))
    n_right = draw(st.integers(1, 40))
    n_keys = draw(st.integers(1, 3))
    # tiny timestamp domain -> guaranteed ties across and within sides
    lts = draw(
        st.lists(st.integers(0, 20), min_size=n_left, max_size=n_left)
    )
    rts = draw(
        st.lists(st.integers(0, 20), min_size=n_right, max_size=n_right)
    )
    lk = draw(st.lists(st.integers(0, n_keys - 1), min_size=n_left, max_size=n_left))
    rk = draw(st.lists(st.integers(0, n_keys - 1), min_size=n_right, max_size=n_right))
    return lts, rts, lk, rk


@given(asof_case())
@settings(**_SETTINGS)
def test_asof_property(spark, case):
    lts, rts, lk, rk = case
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": lk,
            "lts": [base + pd.Timedelta(seconds=int(t)) for t in lts],
            "lid": range(len(lts)),
        }
    )
    right = pd.DataFrame(
        {
            "k": rk,
            "rts": [base + pd.Timedelta(seconds=int(t)) for t in rts],
            "rid": range(len(rts)),
        }
    )
    for df, c in ((left, "lts"), (right, "rts")):
        df[c] = df[c].astype("datetime64[us]")

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "lts",
            "rts",
            ["rid"],
            tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    # oracle: dedupe equal (k, ts) keeping max rid (operator's tiebreak)
    r = (
        right.sort_values(["k", "rts", "rid"])
        .drop_duplicates(["k", "rts"], keep="last")
        .sort_values(["rts", "rid"])
    )
    want = pd.merge_asof(
        left.sort_values(["lts", "lid"]),
        r,
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("lid")

    g = got["asof_rid"].astype("float64").where(got["asof_rid"].notna(), -1)
    w = want["rid"].astype("float64").where(want["rid"].notna(), -1)
    assert g.tolist() == w.tolist()


@st.composite
def overlap_case(draw):
    n = draw(st.integers(2, 25))
    m = draw(st.integers(2, 25))
    seed = draw(st.integers(0, 2**31 - 1))
    return n, m, seed


@given(overlap_case())
@settings(**_SETTINGS)
def test_overlap_property(spark, case):
    n, m, seed = case
    rng = np.random.default_rng(seed)

    def mk(k, id_name):
        # clustered boxes force overlaps, touching edges and containment
        minx = rng.choice([-50.0, -49.5, 0.0, 0.25, 120.0], k)
        miny = rng.choice([-30.0, -29.5, 10.0, 10.25], k)
        return pd.DataFrame(
            {
                id_name: np.arange(k),
                "minx": minx,
                "miny": miny,
                "maxx": minx + rng.choice([0.5, 1.0, 40.0], k),
                "maxy": miny + rng.choice([0.5, 1.0, 25.0], k),
            }
        )

    lpdf, rpdf = mk(n, "l_id"), mk(m, "r_id")
    wm = tms().lookup("WebMercatorQuad")
    got = {
        (r.l_id, r.r_id)
        for r in bbox_overlap_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), wm, zoom=3
        ).collect()
    }
    want = set()
    for l in lpdf.itertuples():
        hit = rpdf[
            (l.minx < rpdf.maxx)
            & (l.maxx > rpdf.minx)
            & (l.miny < rpdf.maxy)
            & (l.maxy > rpdf.miny)
        ]
        want.update((l.l_id, r) for r in hit.r_id)
    assert got == want

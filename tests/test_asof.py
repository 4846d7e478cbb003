"""asof_join vs pandas.merge_asof (independent oracle)."""

import numpy as np
import pandas as pd

from tile_grid_spark.operators.asof import asof_join


def _mk(spark, n_left=400, n_right=300, seed=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_left),
            "lts": base + pd.to_timedelta(rng.integers(0, 86400, n_left), unit="s"),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_right),
            "rts": base + pd.to_timedelta(rng.integers(0, 86400, n_right), unit="s"),
            "rid": np.arange(n_right),
            "val": rng.normal(size=n_right).round(6),
        }
    )
    # force ts collisions to exercise tie handling
    right.loc[5, ["k", "rts"]] = [3, left.loc[0, "lts"]]
    left.loc[1, ["k", "lts"]] = [3, left.loc[0, "lts"]]
    for df in (left, right):
        for c in df.columns:
            if df[c].dtype.kind == "M":
                df[c] = df[c].astype("datetime64[us]")
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def _pandas_asof(left, right, tolerance=None):
    # merge_asof needs global ts sort; dedupe equal (k, rts) keeping max rid
    # to mirror the operator's deterministic tiebreak
    r = (
        right.sort_values(["k", "rts", "rid"])
        .drop_duplicates(["k", "rts"], keep="last")
        .sort_values("rts")
    )
    out = pd.merge_asof(
        left.sort_values("lts"),
        r,
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
        tolerance=tolerance,
    )
    return out.sort_values("lid").reset_index(drop=True)


def test_asof_matches_merge_asof(spark):
    ldf, rdf, left, right = _mk(spark)
    got = (
        asof_join(ldf, rdf, ["k"], "lts", "rts", ["rid", "val"], tiebreak="rid")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _pandas_asof(left, right)
    assert len(got) == len(left)
    g_rid = got["asof_rid"].astype("float64")
    w_rid = want["rid"].astype("float64")
    assert g_rid.where(g_rid.notna(), -1).tolist() == w_rid.where(w_rid.notna(), -1).tolist()
    gv = got["asof_val"].fillna(-999).to_numpy()
    wv = want["val"].fillna(-999).to_numpy()
    assert np.allclose(gv, wv)


def test_asof_tolerance(spark):
    ldf, rdf, left, right = _mk(spark, seed=11)
    got = (
        asof_join(
            ldf, rdf, ["k"], "lts", "rts", ["rid"], tiebreak="rid", tolerance_sec=3600
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _pandas_asof(left, right, tolerance=pd.Timedelta(seconds=3600))
    g = got["asof_rid"].astype("float64").where(got["asof_rid"].notna(), -1)
    w = want["rid"].astype("float64").where(want["rid"].notna(), -1)
    assert g.tolist() == w.tolist()


def test_asof_null_payload_not_backfilled(spark):
    # the MATCHED right row has val=NULL; an older right row has val=7.
    # merge_asof carries the matched row's NULL — per-column
    # last(ignorenulls) would tear the output (rid from the newer row,
    # val back-filled from the older one)
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "lts": [pd.Timestamp("2024-01-03").to_pydatetime()],
                "lid": [0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1],
                "rts": [
                    pd.Timestamp("2024-01-01").to_pydatetime(),
                    pd.Timestamp("2024-01-02").to_pydatetime(),
                ],
                "rid": [10, 20],
                "val": [7.0, None],
            }
        )
    )
    out = asof_join(left, right, ["k"], "lts", "rts", ["rid", "val"], tiebreak="rid").collect()
    assert len(out) == 1
    assert out[0]["asof_rid"] == 20
    assert out[0]["asof_val"] is None  # NOT back-filled to 7.0


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "lts": [pd.Timestamp("2024-01-01").to_pydatetime()], "lid": [0]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "rts": [pd.Timestamp("2024-06-01").to_pydatetime()], "rid": [9]})
    )
    out = asof_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    assert len(out) == 1 and out[0]["asof_rid"] is None

"""Composition queries over the relational surface: boundary semantics the
sf0.01 oracle may not exercise (exact-boundary elements, orderless
customers) pinned at unit scale."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg
from mmgraphrag_ray.stages.join import bucketed_join


def test_left_join_preserves_zero_match_rows():
    left = pd.DataFrame({"k": pd.Series([1, 2, 3, 4], dtype="int64"),
                         "tag": pd.Series(list("wxyz"), dtype=object)})
    right = pd.DataFrame({"k": pd.Series([2, 4], dtype="int64"),
                          "n": pd.Series([10, 20], dtype="int64")})
    out = (
        bucketed_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            on="k", how="left",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["n"].fillna(-1).tolist() == [-1, 10, -1, 20]


def test_decile_boundary_element_goes_low():
    # an x exactly equal to a boundary must classify into the LOWER decile
    # (strictly-below count), matching the SQL (x > b) sum
    bounds = np.array([10.0, 20.0, 30.0])
    x = np.array([5.0, 10.0, 10.5, 20.0, 35.0])
    decile = 1 + np.searchsorted(bounds, x, side="left")
    assert decile.tolist() == [1, 1, 2, 2, 4]


def test_exact_distinct_two_level_agg():
    # count(distinct user) per group via (g, user) pre-group then count
    df = pd.DataFrame(
        {"g": pd.Series(["a"] * 5 + ["b"] * 3, dtype=object),
         "user": pd.Series([1, 1, 2, 2, 3, 7, 7, 7], dtype="int64")}
    )
    lvl1 = bucketed_groupby_agg(
        ray.data.from_pandas(df).repartition(3),
        keys=["g", "user"], aggs={"n": (None, "count")},
    )
    lvl2 = (
        bucketed_groupby_agg(lvl1, keys=["g"], aggs={"n_users": (None, "count")})
        .to_pandas()
        .sort_values("g")
    )
    assert lvl2["n_users"].tolist() == [3, 1]

"""stages/reshape.py (pivot/rollup), stages/sample.py (weighted top-k),
stages/sketch.table_checksum — checked against serial pandas."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray.stages.reshape import distinct_values, pivot_counts, rollup_agg
from mmgraphrag_ray.stages.sample import weighted_topk_sample
from mmgraphrag_ray.stages.sketch import CHECKSUM_MOD, table_checksum


def _events(n=2000, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "user": rng.randint(0, 40, n).astype("int64"),
            "etype": pd.Series(
                rng.choice(["a", "b", "c"], n), dtype=object
            ),
            "v": rng.randint(0, 1000, n).astype("int64"),
        }
    )


def test_pivot_counts_matches_crosstab():
    df = _events()
    got = (
        pivot_counts(
            ray.data.from_pandas(df).repartition(5), ["user"], "etype",
            categories=["a", "b", "c"],
        )
        .to_pandas()
        .sort_values("user")
        .reset_index(drop=True)
    )
    ct = pd.crosstab(df["user"], df["etype"]).reset_index()
    exp = pd.DataFrame(
        {"user": ct["user"].astype("int64"),
         "n_a": ct["a"].astype("int64"), "n_b": ct["b"].astype("int64"),
         "n_c": ct["c"].astype("int64")}
    )
    pd.testing.assert_frame_equal(got, exp)


def test_pivot_discovers_categories_and_zero_rows():
    df = _events(300)
    df = df[df["etype"] != "c"]  # absent category must not appear
    ds = ray.data.from_pandas(df).repartition(3)
    assert distinct_values(ds, "etype") == ["a", "b"]
    got = pivot_counts(ds, ["user"], "etype").to_pandas()
    assert set(got.columns) == {"user", "n_a", "n_b"}
    # a user with only 'a' events still gets an explicit n_b=0
    only_a = df.groupby("user")["etype"].nunique()
    single = only_a[only_a == 1].index
    if len(single):
        row = got[got["user"] == single[0]].iloc[0]
        assert row["n_a"] == 0 or row["n_b"] == 0


def test_pivot_collision_raises():
    df = pd.DataFrame({"k": [1], "c": pd.Series(["x y"], dtype=object)})
    with pytest.raises(ValueError, match="collide"):
        pivot_counts(ray.data.from_pandas(df), ["k"], "c",
                     categories=["x y", "x-y"])


def test_rollup_levels_match_serial():
    df = _events(1500, seed=9)
    got = (
        rollup_agg(
            ray.data.from_pandas(df).repartition(4),
            keys=["etype", "user"],
            aggs={"n": (None, "count"), "vmin": ("v", "min"), "vmax": ("v", "max")},
        )
        .to_pandas()
        .sort_values(["etype", "user"])
        .reset_index(drop=True)
    )

    def lvl(keys):
        if keys:
            g = df.groupby(keys, sort=False)
            out = pd.DataFrame(
                {"n": g.size(), "vmin": g["v"].min(), "vmax": g["v"].max()}
            ).reset_index()
        else:
            out = pd.DataFrame(
                {"n": [len(df)], "vmin": [df["v"].min()], "vmax": [df["v"].max()]}
            )
        for k in ["etype", "user"]:
            out[k] = out[k].astype(str) if k in keys else "ALL"
        return out[["etype", "user", "n", "vmin", "vmax"]]

    exp = (
        pd.concat([lvl(["etype", "user"]), lvl(["etype"]), lvl([])])
        .sort_values(["etype", "user"])
        .reset_index(drop=True)
        .astype({"n": "int64", "vmin": "int64", "vmax": "int64"})
    )
    pd.testing.assert_frame_equal(got, exp)


def test_weighted_topk_sample_exact_and_split_invariant():
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {"id": np.arange(1000, dtype="int64"),
         "w": rng.randint(1, 5000, 1000).astype("int64")}
    )
    h = df["id"].map(lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16))
    prio = (h.to_numpy() // np.maximum(df["w"].to_numpy(), 1)).astype("int64")
    exp_ids = (
        pd.DataFrame({"id": df["id"], "p": prio})
        .nsmallest(25, ["p", "id"])["id"]
        .tolist()
    )

    def run(nblocks):
        out = weighted_topk_sample(
            ray.data.from_pandas(df).repartition(nblocks), "id", "w", k=25
        ).to_pandas()
        return out.sort_values("priority")["id"].tolist()

    assert run(1) == exp_ids
    assert run(7) == exp_ids


def test_weighted_sample_prefers_heavy_rows():
    # two ids with identical hash inputs impossible; instead check the
    # aggregate property: heavy rows are overrepresented in the sample
    df = pd.DataFrame(
        {"id": np.arange(2000, dtype="int64"),
         "w": np.where(np.arange(2000) < 1000, 10000, 1).astype("int64")}
    )
    out = weighted_topk_sample(ray.data.from_pandas(df), "id", "w", k=100).to_pandas()
    assert (out["id"] < 1000).mean() > 0.9


def test_table_checksum_order_and_split_invariant():
    df = _events(800, seed=21)
    ds1 = ray.data.from_pandas(df).repartition(2)
    ds2 = ray.data.from_pandas(df.sample(frac=1, random_state=1)).repartition(9)
    c1 = table_checksum(ds1, ["user", "etype", "v"]).to_pandas()
    c2 = table_checksum(ds2, ["user", "etype", "v"]).to_pandas()
    pd.testing.assert_frame_equal(
        c1.reset_index(drop=True), c2.reset_index(drop=True)
    )
    assert c1["n_rows"].iloc[0] == 800
    assert 0 <= c1["checksum"].iloc[0] < CHECKSUM_MOD
    # a single changed value changes the checksum
    df2 = df.copy()
    df2.loc[0, "v"] = df2.loc[0, "v"] + 1
    c3 = table_checksum(ray.data.from_pandas(df2), ["user", "etype", "v"]).to_pandas()
    assert c3["checksum"].iloc[0] != c1["checksum"].iloc[0]


def test_profile_table_nulls_and_distincts():
    from mmgraphrag_ray.stages.profile import profile_table

    df = pd.DataFrame(
        {
            "a": pd.Series([1, 2, 2, None, 4], dtype="float64"),
            "b": pd.Series(["x", None, "y", "x", "z"], dtype=object),
        }
    )
    out = (
        profile_table(ray.data.from_pandas(df).repartition(3), ["a", "b"])
        .to_pandas()
        .set_index("col")
    )
    assert out.loc["a", "n"] == 5 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3  # 1, 2, 4 (nulls excluded)
    assert out.loc["a", "min_val"] == "1" and out.loc["a", "max_val"] == "4"
    assert out.loc["b", "n_null"] == 1 and out.loc["b", "n_distinct"] == 3
    assert out.loc["b", "min_val"] == "x" and out.loc["b", "max_val"] == "z"

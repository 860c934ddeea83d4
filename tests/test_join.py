"""bucketed_join: shuffle path vs the small-side broadcast hash-join path
(`small_side=` hint) must agree, including the guard fallback and the
left-join restriction."""

import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray.stages.join import bucketed_join

LEFT = pd.DataFrame({"k": [1, 2, 2, 5], "lv": ["a", "b", "c", "d"]})
RIGHT = pd.DataFrame({"k": [1, 2, 3], "rv": ["x", "y", "z"]})


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True).astype({"k": "int64"})
    )


@pytest.fixture()
def sides():
    return (
        ray.data.from_pandas(LEFT).materialize(),
        ray.data.from_pandas(RIGHT).materialize(),
    )


def test_broadcast_right_matches_shuffle_inner(sides):
    left, right = sides
    shuffled = _norm(bucketed_join(left, right, on="k").to_pandas())
    broadcast = _norm(
        bucketed_join(left, right, on="k", small_side="right").to_pandas()
    )
    assert broadcast.equals(shuffled)
    assert set(broadcast["lv"]) == {"a", "b", "c"}


def test_broadcast_left_matches_shuffle_inner(sides):
    left, right = sides
    shuffled = _norm(bucketed_join(left, right, on="k").to_pandas())
    broadcast = _norm(
        bucketed_join(left, right, on="k", small_side="left").to_pandas()
    )
    assert broadcast.equals(shuffled)


def test_broadcast_right_left_join_preserves_left_rows(sides):
    left, right = sides
    out = bucketed_join(
        left, right, on="k", how="left", small_side="right"
    ).to_pandas()
    assert len(out) == 4
    assert out.loc[out["k"] == 5, "rv"].isna().all()


def test_broadcast_left_hint_ignored_for_left_join(sides):
    # small_side='left' cannot preserve left rows under broadcast; the hint
    # must silently fall back to the shuffle plan with identical results
    left, right = sides
    out = _norm(
        bucketed_join(left, right, on="k", how="left", small_side="left")
        .to_pandas()
        .fillna("~")
    )
    assert len(out) == 4


def test_broadcast_cap_falls_back_to_shuffle(sides, monkeypatch):
    monkeypatch.setenv("RAYKG_JOIN_BROADCAST_MAX", "0")
    left, right = sides
    out = _norm(bucketed_join(left, right, on="k", small_side="right").to_pandas())
    assert out.equals(_norm(bucketed_join(left, right, on="k").to_pandas()))


def test_broadcast_empty_small_side(sides):
    left, _ = sides
    empty = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype="int64"), "rv": pd.Series(dtype=str)})
    ).materialize()
    out = bucketed_join(left, empty, on="k", small_side="right").to_pandas()
    assert len(out) == 0


def test_bucketed_join_full_outer_matches_pandas():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.join import bucketed_join

    l = pd.DataFrame({"k": [1, 2, 2, 5], "a": [10, 20, 21, 50]})
    r = pd.DataFrame({"k": [2, 3], "b": [200, 300]})
    got = (
        bucketed_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                      on="k", how="outer")
        .to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
    )
    exp = (
        l.merge(r, on="k", how="outer")
        .sort_values(["k", "a"]).reset_index(drop=True)
    )
    assert len(got) == len(exp) == 5
    assert got["k"].tolist() == exp["k"].tolist()
    # unmatched sides surface as nulls on the other side's columns
    assert got.loc[got["k"] == 5, "b"].isna().all()
    assert got.loc[got["k"] == 3, "a"].isna().all()


def test_table_diff_all_four_statuses():
    import pandas as pd

    from mmgraphrag_ray.stages.join import table_diff

    left = pd.DataFrame(
        {
            "k": pd.Series([1, 2, 3, 4], dtype="int64"),
            "v": pd.Series([10.0, 20.0, 30.0, 40.0]),
            "s": pd.Series(list("abcd"), dtype=object),
        }
    )
    right = pd.DataFrame(
        {
            "k": pd.Series([1, 2, 3, 5], dtype="int64"),
            "v": pd.Series([10.0, 21.0, 30.0, 50.0]),
            "s": pd.Series(["a", "b", "X", "e"], dtype=object),
        }
    )
    out = (
        table_diff(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(3),
            key_col="k", compare_cols=["v", "s"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert dict(zip(out.k.astype(int), out.status)) == {
        1: "same", 2: "changed", 3: "changed", 4: "removed", 5: "added"
    }


def test_salted_join_equals_plain_join_under_hot_key():
    import numpy as np
    import pandas as pd

    from mmgraphrag_ray.stages.join import bucketed_join, salted_join

    rng = np.random.RandomState(3)
    # 90% of left rows share ONE hot key
    keys = np.where(rng.rand(2000) < 0.9, 7, rng.randint(0, 20, 2000))
    left = pd.DataFrame(
        {"k": pd.Series(keys, dtype="int64"),
         "v": pd.Series(np.arange(2000), dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": pd.Series(range(20), dtype="int64"),
         "dim": pd.Series([f"d{i}" for i in range(20)], dtype=object)}
    )

    def norm(ds):
        return (
            ds.to_pandas()[["k", "v", "dim"]]
            .sort_values(["k", "v"]).reset_index(drop=True)
            .astype({"k": "int64", "v": "int64"})
        )

    salted = norm(
        salted_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(2),
            on="k", salt=4,
        )
    )
    plain = norm(
        bucketed_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(2),
            on="k",
        )
    )
    pd.testing.assert_frame_equal(salted, plain)
    assert len(salted) == 2000  # every left row matched exactly once


def test_join_size_estimate_exact():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.join import join_size_estimate

    l = pd.DataFrame({"k": [1, 1, 1, 2, 3]})
    r = pd.DataFrame({"j": [1, 1, 2, 4]})
    out = join_size_estimate(
        ray.data.from_pandas(l).repartition(2),
        ray.data.from_pandas(r).repartition(2),
        "k", "j",
    ).to_pandas()
    # key 1: 3*2=6; key 2: 1*1=1; keys 3,4 unmatched
    assert out.loc[0, "join_rows"] == 7
    assert out.loc[0, "n_keys_common"] == 2
    assert out.loc[0, "max_key_rows"] == 6
    # cross-check against the actual join
    real = l.merge(r, left_on="k", right_on="j")
    assert len(real) == 7


def test_dimension_pipelines_plan_parity(ray_session, monkeypatch):
    """The relational dimension attaches (segment_order_stats, q3/q5's
    customer/supplier sides, grouped-topk and quantile segments) must be
    plan-invariant: forcing the bucketed shuffle (RAYKG_JOIN_BROADCAST_MAX=1,
    the 100x-dimension path that never pulls a dimension to the driver)
    produces frames row-identical to the default broadcast plan."""
    import pandas as pd

    from mmgraphrag_ray.pipelines.relational import (
        q5_nation_volume,
        q14_promo_share,
        q16_supplier_counts,
        q21_waiting_supplier,
        segment_order_stats,
        segment_price_quantiles,
        topk_orders_per_segment,
    )

    sf = "/root/testdata/sf0.001"
    pipelines = {
        "segment_order_stats": segment_order_stats,
        "topk_orders_per_segment": topk_orders_per_segment,
        "segment_price_quantiles": segment_price_quantiles,
        "q5_nation_volume": q5_nation_volume,
        "q14_promo_share": q14_promo_share,
        "q16_supplier_counts": q16_supplier_counts,
        "q21_waiting_supplier": q21_waiting_supplier,
    }

    def norm(ds):
        df = ds.to_pandas()
        return (df[sorted(df.columns)]
                .sort_values(sorted(df.columns), kind="mergesort")
                .reset_index(drop=True))

    broadcast = {n: norm(fn(sf)) for n, fn in pipelines.items()}
    monkeypatch.setenv("RAYKG_JOIN_BROADCAST_MAX", "1")
    for n, fn in pipelines.items():
        pd.testing.assert_frame_equal(
            broadcast[n], norm(fn(sf)), check_dtype=False, obj=n
        )

"""stages/groupagg.global_quantiles — exact global selection via
iterative histogram refinement, checked against numpy's serial type-1
selection (sorted[ceil(q*n)-1])."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray.stages.groupagg import global_quantiles

QS = [0.01, 0.25, 0.5, 0.75, 0.99, 1.0]


def _expected(vals: np.ndarray, qs):
    v = np.sort(vals[~np.isnan(vals)])
    n = len(v)
    return [float(v[min(max(math.ceil(q * n), 1), n) - 1]) for q in qs]


def _run(df, qs, **kw):
    ds = ray.data.from_pandas(df).repartition(4)
    out = global_quantiles(ds, "x", qs, **kw).to_pandas()
    return out.sort_values("rank")["value"].tolist()


def test_global_quantiles_matches_serial_selection():
    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.normal(0, 1, 5000), rng.exponential(3, 5000)])
    df = pd.DataFrame({"x": vals})
    assert _run(df, QS) == _expected(vals, QS)


def test_global_quantiles_forced_recursion_and_nulls():
    rng = np.random.RandomState(11)
    vals = rng.uniform(-100, 100, 4000)
    df = pd.DataFrame({"x": vals})
    df.loc[::7, "x"] = None  # NULLs are excluded from the selection
    kept = df["x"].to_numpy(dtype=float)
    # n_bins=4 + tiny cap forces several refinement rounds
    got = _run(df, [0.1, 0.5, 0.9], n_bins=4, bin_cap=20)
    assert got == _expected(kept, [0.1, 0.5, 0.9])


def test_global_quantiles_heavy_duplicates_short_circuit():
    # one value holds 90% of the mass: the containing bin never splits
    # (min == max short-circuit), the rest resolves by fetch
    vals = np.concatenate([np.full(9000, 42.0), np.arange(1000, dtype=float)])
    df = pd.DataFrame({"x": vals})
    got = _run(df, [0.05, 0.5, 0.95], n_bins=8, bin_cap=100)
    assert got == _expected(vals, [0.05, 0.5, 0.95])


def test_global_quantiles_all_equal_and_empty():
    df = pd.DataFrame({"x": np.full(100, 3.5)})
    assert _run(df, [0.5]) == [3.5]
    empty = pd.DataFrame({"x": pd.Series(dtype="float64")})
    out = global_quantiles(ray.data.from_pandas(empty), "x", [0.5])
    assert out.count() == 0
    # schema survives the empty path (to_pandas of a 0-row dataset drops
    # columns in this Ray build, so assert on the dataset schema)
    assert out.schema().names == ["q", "value", "rank", "n"]


def test_global_quantiles_round_budget_exhaustion_raises():
    # n_bins=2 halves the population per round at best; 1000 distinct
    # values with bin_cap=1 cannot reach a fetchable bin in 2 rounds —
    # must raise, not silently return a wrong element
    vals = np.arange(1000, dtype=float)
    df = pd.DataFrame({"x": vals})
    with pytest.raises(RuntimeError, match="did not converge"):
        global_quantiles(
            ray.data.from_pandas(df), "x", [0.5], n_bins=2, bin_cap=1, max_rounds=2
        ).to_pandas()


def test_column_histogram_total_and_clamped():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.profile import column_histogram

    v = np.concatenate([np.linspace(-5, 25, 100), [None]])
    df = pd.DataFrame({"x": pd.Series(v, dtype="float64")})
    out = (
        column_histogram(ray.data.from_pandas(df).repartition(4),
                         "x", 0.0, 20.0, 4)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    assert list(out.bin) == [0, 1, 2, 3]
    assert out.n.sum() == 100  # nulls dropped, out-of-range clamped
    # serial expectation
    vv = pd.Series(v).dropna().to_numpy()
    idx = np.clip(((vv - 0.0) / 5.0).astype("int64"), 0, 3)
    exp = np.bincount(idx, minlength=4)
    assert list(out.n) == list(exp)
    assert list(out.lo_edge) == [0.0, 5.0, 10.0, 15.0]
    assert list(out.hi_edge) == [5.0, 10.0, 15.0, 20.0]


def test_global_mad_matches_serial():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.groupagg import global_mad

    rng = np.random.RandomState(11)
    v = np.concatenate([rng.uniform(0, 100, 501), [1e9]])  # one outlier
    df = pd.DataFrame({"x": pd.Series(v, dtype="float64")})
    out = global_mad(
        ray.data.from_pandas(df).repartition(5), "x", bin_cap=64
    ).to_pandas()
    s = np.sort(v)
    med = s[int(np.ceil(0.5 * len(s))) - 1]  # type-1
    d = np.sort(np.abs(v - med))
    mad = d[int(np.ceil(0.5 * len(d))) - 1]
    assert out.loc[0, "median"] == med
    assert out.loc[0, "mad"] == mad
    assert out.loc[0, "n"] == len(v)
    # robustness: the outlier barely moves MAD (unlike stddev)
    assert out.loc[0, "mad"] < 60


def test_grouped_robust_outliers_flags():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.groupagg import grouped_robust_outliers

    # group a: tight cluster at 100 +/- 2 with one wild point;
    # group b: all identical (mad=0 -> any deviation flags)
    df = pd.DataFrame(
        {
            "id": range(8),
            "g": ["a"] * 5 + ["b"] * 3,
            "v": [98, 99, 100, 102, 1000, 7, 7, 9],
        }
    ).astype({"v": "int64"})
    out = (
        grouped_robust_outliers(
            ray.data.from_pandas(df).repartition(3), ["g"], "v", z=3, n_buckets=4
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # a: med=100 (type-1 over [98,99,100,102,1000]), devs [2,1,0,2,900],
    # mad=2 -> only 1000 flagged; b: med=7, mad=0 -> 9 flagged
    assert out["med"].tolist() == [100] * 5 + [7] * 3
    assert out["mad"].tolist() == [2] * 5 + [0] * 3
    assert out["is_outlier"].tolist() == [False] * 4 + [True, False, False, True]


def test_grouped_exact_rank_matches_serial():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.groupagg import grouped_exact_rank

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "id": np.arange(400, dtype="int64"),
            "g": rng.choice(["a", "b", "c"], 400),
            "v": rng.randint(0, 300, 400).astype("int64"),  # heavy ties
        }
    )
    out = (
        grouped_exact_rank(
            ray.data.from_pandas(df).repartition(7), "g", "v", "id", step=16
        )
        .to_pandas()
        .sort_values(["g", "rnk"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "v", "id"]).reset_index(drop=True)
    exp["rnk"] = exp.groupby("g").cumcount() + 1
    n = df.groupby("g")["id"].count()
    exp["pct"] = (exp["rnk"] - 1).astype("float64") / (
        exp["g"].map(n) - 1
    ).astype("float64")
    pd.testing.assert_frame_equal(
        out[["id", "g", "v", "rnk", "pct"]],
        exp[["id", "g", "v", "rnk", "pct"]].reset_index(drop=True),
    )
    # singleton group -> pct 0
    one = grouped_exact_rank(
        ray.data.from_pandas(
            pd.DataFrame({"id": [1], "g": ["z"], "v": [9]}).astype(
                {"id": "int64", "v": "int64"}
            )
        ),
        "g", "v", "id",
    ).to_pandas()
    assert one["rnk"].tolist() == [1] and one["pct"].tolist() == [0.0]


def test_weighted_global_quantile_matches_serial():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.groupagg import weighted_global_quantile

    rng = np.random.RandomState(3)
    v = rng.randint(0, 5000, 2000).astype("float64")
    w = rng.randint(1, 50, 2000).astype("int64")
    df = pd.DataFrame({"x": v, "w": w})
    out = weighted_global_quantile(
        ray.data.from_pandas(df).repartition(6), "x", "w", p=50,
        n_bins=16, bin_cap=64,  # force several refinement rounds
    ).to_pandas()
    W = int(w.sum())
    T = (W * 50 + 99) // 100
    order = np.argsort(v, kind="mergesort")
    cw = np.cumsum(w[order])
    exp = v[order][int(np.argmax(cw >= T))]
    assert out.loc[0, "value"] == exp
    assert out.loc[0, "threshold"] == T
    assert out.loc[0, "total_weight"] == W
    assert out.loc[0, "n"] == 2000
    # degenerate: single distinct value
    one = weighted_global_quantile(
        ray.data.from_pandas(pd.DataFrame({"x": [7.0] * 10, "w": [3] * 10})),
        "x", "w", p=50,
    ).to_pandas()
    assert one.loc[0, "value"] == 7.0 and one.loc[0, "total_weight"] == 30

"""stages/window.py — as-of join, range join, grouped top-k, running
aggregates, group quantiles (the windowed-operator extension family)."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.window import (
    asof_join,
    grouped_topk,
    group_quantiles,
    range_join,
    running_agg,
)


def _events() -> pd.DataFrame:
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "key": rng.randint(0, 9, n).astype("int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="m"),
            "value": rng.rand(n).round(4),
        }
    )


def _dims() -> pd.DataFrame:
    rng = np.random.RandomState(11)
    n = 60
    df = pd.DataFrame(
        {
            "key": rng.randint(0, 12, n).astype("int64"),  # keys 9-11 never match
            "dts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(-500, 9_000, n), unit="m"),
            "dim_val": np.arange(n, dtype="int64"),
        }
    )
    # asof right side must be unique per (key, ts)
    return df.drop_duplicates(["key", "dts"]).reset_index(drop=True)


def test_asof_join_matches_pandas_merge_asof():
    left, right = _events(), _dims()
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="key",
            left_ts="ts",
            right_ts="dts",
            n_buckets=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("dts", kind="mergesort"),
        left_on="ts",
        right_on="dts",
        by="key",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(left)
    pd.testing.assert_series_equal(got["dts"], want["dts"], check_names=False)
    # unmatched left rows survive with nulls; matched ints stay integral
    assert str(got["dim_val"].dtype) == "Int64"
    pd.testing.assert_series_equal(
        got["dim_val"].astype("float64"),
        want["dim_val"].astype("float64"),
        check_names=False,
    )


def test_asof_join_left_rows_all_preserved_when_no_right():
    left = _events()
    right = _dims().iloc[0:0]
    got = asof_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="key",
        left_ts="ts",
        right_ts="dts",
        n_buckets=3,
    ).to_pandas()
    assert len(got) == len(left)
    assert got["dim_val"].isna().all()


def test_range_join_half_open_boundaries():
    left = pd.DataFrame(
        {
            "key": pd.Series([1, 1, 1, 2], dtype="int64"),
            "pt": pd.Series([5, 10, 15, 10], dtype="int64"),
            "lid": pd.Series([0, 1, 2, 3], dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": pd.Series([1, 1, 2], dtype="int64"),
            "lo": pd.Series([5, 10, 0], dtype="int64"),
            "hi": pd.Series([10, 15, 10], dtype="int64"),
            "rid": pd.Series([100, 101, 102], dtype="int64"),
        }
    )
    got = (
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="key",
            left_point="pt",
            right_lo="lo",
            right_hi="hi",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    # pt=5 ∈ [5,10) → rid 100; pt=10 ∈ [10,15) only (half-open); pt=15 none;
    # key 2 pt=10 ∉ [0,10)
    assert list(zip(got["lid"], got["rid"])) == [(0, 100), (1, 101)]


def test_range_join_matches_bruteforce():
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "key": rng.randint(0, 6, 200).astype("int64"),
            "pt": rng.randint(0, 1000, 200).astype("int64"),
            "lid": np.arange(200, dtype="int64"),
        }
    )
    lo = rng.randint(0, 900, 40).astype("int64")
    right = pd.DataFrame(
        {
            "key": rng.randint(0, 6, 40).astype("int64"),
            "lo": lo,
            "hi": lo + rng.randint(1, 200, 40).astype("int64"),
            "rid": np.arange(40, dtype="int64"),
        }
    )
    got = (
        range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="key",
            left_point="pt",
            right_lo="lo",
            right_hi="hi",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    brute = left.merge(right, on="key")
    brute = brute[(brute["pt"] >= brute["lo"]) & (brute["pt"] < brute["hi"])]
    want = brute.sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["lid"]) == list(want["lid"])
    assert list(got["rid"]) == list(want["rid"])


def test_grouped_topk_rank_and_ties():
    df = pd.DataFrame(
        {
            "g": pd.Series(["a"] * 4 + ["b"] * 2, dtype=object),
            "score": pd.Series([3.0, 3.0, 2.0, 1.0, 5.0, 5.0]),
            "id": pd.Series([11, 10, 12, 13, 20, 21], dtype="int64"),
        }
    )
    got = (
        grouped_topk(
            ray.data.from_pandas(df),
            keys=["g"],
            order_col="score",
            k=2,
            tie_cols=["id"],
            n_buckets=3,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # ties break by id asc: group a keeps (3.0,10),(3.0,11); b keeps (5.0,20),(5.0,21)
    assert list(got["id"]) == [10, 11, 20, 21]
    assert list(got["rank"]) == [1, 2, 1, 2]


def test_grouped_topk_batch_split_invariant():
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 7, 500).astype("int64"),
            "score": rng.rand(500).round(6),
            "id": np.arange(500, dtype="int64"),
        }
    )

    def run(nblocks):
        return (
            grouped_topk(
                ray.data.from_pandas(df).repartition(nblocks),
                keys=["g"],
                order_col="score",
                k=3,
                tie_cols=["id"],
            )
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(13)
    # combiner (per-batch partial top-k) must not change the result
    pd.testing.assert_frame_equal(a, b)
    want = df.sort_values(["score", "id"], ascending=[False, True]).groupby("g").head(3)
    assert sorted(a["id"]) == sorted(want["id"])


def test_running_agg_matches_pandas_cumulatives():
    ev = _events().rename(columns={"key": "user"})
    got = (
        running_agg(
            ray.data.from_pandas(ev),
            key="user",
            order_cols=["ts", "event_id"],
            value_col="value",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    w = ev.sort_values(["user", "ts", "event_id"], kind="mergesort")
    g = w.groupby("user", sort=False)
    w = w.assign(
        n=(g.cumcount() + 1).astype("int64"),
        mn=g["value"].cummin(),
        mx=g["value"].cummax(),
        sm=g["value"].cumsum(),
    ).sort_values("event_id").reset_index(drop=True)
    assert list(got["n_so_far"]) == list(w["n"])
    assert np.allclose(got["min_so_far"], w["mn"])
    assert np.allclose(got["max_so_far"], w["mx"])
    # the float running sum is exact vs the same-order pandas cumsum
    assert list(got["sum_so_far"]) == list(w["sm"])


def test_group_quantiles_type1_selection():
    df = pd.DataFrame(
        {
            "g": pd.Series(["x"] * 4 + ["y"] * 5, dtype=object),
            "v": pd.Series([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0, 50.0]),
        }
    )
    got = (
        group_quantiles(
            ray.data.from_pandas(df), keys=["g"], value_col="v", qs=[0.5, 0.9],
            n_buckets=3,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # type-1 (DuckDB quantile_disc): sorted[ceil(q*n)-1]
    assert list(got["p50"]) == [2.0, 30.0]  # n=4 → idx 1; n=5 → idx 2
    assert list(got["p90"]) == [4.0, 50.0]  # ceil(3.6)=4 → idx 3; ceil(4.5)=5 → idx 4
    assert list(got["n_rows"]) == [4, 5]


def test_sliding_window_expand_membership():
    from mmgraphrag_ray.stages.window import sliding_window_expand

    ev = _events()
    got = sliding_window_expand(
        ray.data.from_pandas(ev),
        ts_col="ts",
        window=pd.Timedelta(hours=1),
        hop=pd.Timedelta(minutes=15),
    ).to_pandas()
    # every event lands in exactly window/hop = 4 windows...
    assert len(got) == 4 * len(ev)
    # ...each of which actually contains it: win_start <= ts < win_start + 1h
    assert (got["win_start"] <= got["ts"]).all()
    assert (got["ts"] < got["win_start"] + pd.Timedelta(hours=1)).all()
    # window starts are hop-aligned
    assert (got["win_start"].astype("int64") % (15 * 60 * 1_000_000)).eq(0).all()


def test_asof_join_broadcast_plan_equals_shuffle_plan():
    left, right = _events(), _dims()
    kw = dict(on="key", left_ts="ts", right_ts="dts")
    a = (
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right), **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            small_right=True,
            **kw,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_range_join_hot_key_completes_and_is_exact():
    """One key holding most rows on both sides (skew case): the bucketed
    plan bounds the work to that key's own output size."""
    left = pd.DataFrame(
        {
            "key": pd.Series([7] * 3000 + [1, 2, 3], dtype="int64"),
            "pt": pd.Series(list(range(3000)) + [5, 5, 5], dtype="int64"),
            "lid": np.arange(3003, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": pd.Series([7] * 40 + [1], dtype="int64"),
            "lo": pd.Series([i * 100 for i in range(40)] + [0], dtype="int64"),
            "hi": pd.Series([i * 100 + 50 for i in range(40)] + [10], dtype="int64"),
            "rid": np.arange(41, dtype="int64"),
        }
    )
    got = range_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        on="key",
        left_point="pt",
        right_lo="lo",
        right_hi="hi",
        n_buckets=8,
    ).to_pandas()
    brute = left.merge(right, on="key")
    want = brute[(brute["pt"] >= brute["lo"]) & (brute["pt"] < brute["hi"])]
    # intervals i=0..29 lie under the 0..2999 point range: 30 x 50 matches
    assert len(got) == len(want) == 30 * 50 + 1
    assert sorted(zip(got["lid"], got["rid"])) == sorted(zip(want["lid"], want["rid"]))


def test_window_dedup_first_event_and_counts():
    import pandas as pd

    from mmgraphrag_ray.stages.window import window_dedup

    ts = pd.to_datetime(
        [
            "2026-01-01 00:10:00", "2026-01-01 00:50:00",  # same 1h window
            "2026-01-01 01:10:00",                          # next window
            "2026-01-01 00:20:00",                          # other user
        ]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "user_id": pd.Series([1, 1, 1, 2], dtype="int64"),
            "event_type": pd.Series(["c", "c", "c", "c"], dtype=object),
            "ts": ts,
            "event_id": pd.Series([42, 7, 9, 5], dtype="int64"),
        }
    )
    out = (
        window_dedup(
            ray.data.from_pandas(df).repartition(3),
            keys=["user_id", "event_type"], ts_col="ts",
            id_col="event_id", window_us=3_600_000_000,
        )
        .to_pandas()
        .sort_values(["user_id", "w"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    u1 = out[out.user_id == 1].reset_index(drop=True)
    # earliest ts wins even though its event_id (42) is larger
    assert u1.loc[0, "first_id"] == 42 and u1.loc[0, "n"] == 2
    assert u1.loc[1, "first_id"] == 9 and u1.loc[1, "n"] == 1
    assert out[out.user_id == 2].iloc[0]["first_id"] == 5


def test_window_dedup_ts_tie_breaks_on_id():
    import pandas as pd

    from mmgraphrag_ray.stages.window import window_dedup

    t = pd.to_datetime(["2026-01-01 00:10:00"] * 2).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "user_id": pd.Series([1, 1], dtype="int64"),
            "event_type": pd.Series(["c", "c"], dtype=object),
            "ts": t,
            "event_id": pd.Series([9, 3], dtype="int64"),
        }
    )
    out = window_dedup(
        ray.data.from_pandas(df), keys=["user_id", "event_type"],
        ts_col="ts", id_col="event_id", window_us=3_600_000_000,
    ).to_pandas()
    assert out.iloc[0]["first_id"] == 3 and out.iloc[0]["n"] == 2


def test_grouped_sequence_ngrams_respects_key_boundaries():
    import pandas as pd

    from mmgraphrag_ray.stages.window import grouped_sequence_ngrams

    # user 1: a,b,c,b,c -> trigrams a>b>c, b>c>b, c>b>c
    # user 2: c,a,b     -> c>a>b (no cross-user a>b>c despite adjacency)
    ts = pd.to_datetime(
        ["2026-01-01 00:%02d:00" % m for m in range(5)]
        + ["2026-01-01 01:%02d:00" % m for m in range(3)]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "user_id": pd.Series([1] * 5 + [2] * 3, dtype="int64"),
            "event_type": pd.Series(list("abcbc") + list("cab"), dtype=object),
            "ts": ts,
            "event_id": pd.Series(range(8), dtype="int64"),
        }
    )
    out = (
        grouped_sequence_ngrams(
            ray.data.from_pandas(df).repartition(3),
            keys=["user_id"], order_cols=["ts", "event_id"],
            val_col="event_type", n=3, k=10,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    got = dict(zip(out.ngram, out.n))
    assert got == {"a>b>c": 1, "b>c>b": 1, "c>b>c": 1, "c>a>b": 1}
    # rank ties break on ngram asc
    assert list(out.ngram) == sorted(got)


def test_grouped_gap_stats_singletons_and_ties():
    import pandas as pd

    from mmgraphrag_ray.stages.window import grouped_gap_stats

    ts = pd.to_datetime(
        ["2026-01-01 00:00:00", "2026-01-01 00:00:10", "2026-01-01 00:00:10",
         "2026-01-01 00:05:00"]
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "user_id": pd.Series([1, 1, 1, 2], dtype="int64"),
            "ts": ts,
            "event_id": pd.Series([5, 6, 7, 8], dtype="int64"),
        }
    )
    out = (
        grouped_gap_stats(
            ray.data.from_pandas(df).repartition(3),
            keys=["user_id"], ts_col="ts", id_col="event_id",
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    u1 = out.iloc[0]
    assert (u1.n_events, u1.n_gaps) == (3, 2)
    assert (u1.min_gap_us, u1.max_gap_us, u1.sum_gap_us) == (0, 10_000_000, 10_000_000)
    u2 = out.iloc[1]  # singleton: no gaps, null stats
    assert (u2.n_events, u2.n_gaps) == (1, 0)
    assert pd.isna(u2.min_gap_us) and pd.isna(u2.sum_gap_us)


def test_token_budget_select_greedy_per_group():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.sample import token_budget_select

    # group x: weights in pick order 5,4,3 -> cum 5,9,12; budget 10 keeps 2
    # group y: single row over budget -> kept? cum=11 > 10 -> dropped
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "g": ["x", "x", "x", "y"],
            "score": [30, 20, 10, 50],
            "w": [5, 4, 3, 11],
        }
    ).astype({"w": "int64"})
    out = (
        token_budget_select(
            ray.data.from_pandas(df).repartition(2),
            group_col="g",
            weight_col="w",
            budget=10,
            order_cols=["score", "id"],
            descending=[True, False],
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["id"].tolist() == [1, 2]
    assert out["cum_weight"].tolist() == [5, 9]


def test_global_shuffle_order_permutation():
    import hashlib

    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.sample import global_shuffle_order

    ids = pd.DataFrame({"doc_id": pd.Series(range(200), dtype="int64")})
    out = (
        global_shuffle_order(ray.data.from_pandas(ids).repartition(5), "doc_id", seed=3)
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    assert sorted(out["ord"]) == list(range(1, 201))  # a true permutation
    exp = sorted(range(200), key=lambda i: (hashlib.md5(f"3:{i}".encode()).hexdigest(), i))
    assert out["doc_id"].tolist() == exp
    # different seed -> different order (overwhelmingly)
    out2 = global_shuffle_order(
        ray.data.from_pandas(ids), "doc_id", seed=4
    ).to_pandas().sort_values("ord")
    assert out2["doc_id"].tolist() != exp


def test_scd2_intervals_changelog_semantics():
    from mmgraphrag_ray.stages.window import scd2_intervals

    # user 1: a->a->b->b->a (3 versions); user 2: single event (1 current)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 2],
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            "2024-01-05", "2024-01-03",
        ]),
        "event_id": [10, 11, 12, 13, 14, 20],
        "val": ["a", "a", "b", "b", "a", "x"],
    })
    out = (
        scd2_intervals(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                       id_col="event_id", value_col="val")
        .to_pandas()
        .sort_values(["user_id", "version"])
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1]
    assert list(u1["val"]) == ["a", "b", "a"]
    assert list(u1["version"]) == [1, 2, 3]
    # interval stitching: each valid_to = next change's valid_from
    assert list(u1["valid_to"].iloc[:2]) == list(u1["valid_from"].iloc[1:])
    assert list(u1["is_current"]) == [0, 0, 1]
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2["is_current"].iloc[0] == 1
    assert pd.isna(u2["valid_to"].iloc[0])


def test_scd2_same_ts_ties_break_by_id():
    from mmgraphrag_ray.stages.window import scd2_intervals

    ts = pd.to_datetime(["2024-01-01"] * 3)
    df = pd.DataFrame({"user_id": [5, 5, 5], "ts": ts,
                       "event_id": [3, 1, 2], "val": ["c", "a", "b"]})
    out = (
        scd2_intervals(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                       id_col="event_id", value_col="val")
        .to_pandas().sort_values("version").reset_index(drop=True)
    )
    # id order 1,2,3 -> values a,b,c all distinct -> 3 versions
    assert list(out["val"]) == ["a", "b", "c"]


def test_lateness_profile_counts_watermark_violations():
    from mmgraphrag_ray.stages.window import lateness_profile

    # arrival order 1..4; event times: 10, 30, 20 (late by 10), 40
    df = pd.DataFrame({
        "user_id": [7, 7, 7, 7],
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([10, 30, 20, 40], unit="s"),
    })
    out = lateness_profile(ray.data.from_pandas(df), key="user_id",
                           ts_col="ts", arrival_col="event_id").to_pandas()
    assert out["n_events"].iloc[0] == 4
    assert out["n_late"].iloc[0] == 1
    assert out["max_lateness_us"].iloc[0] == 10_000_000
    assert out["sum_lateness_us"].iloc[0] == 10_000_000


def test_funnel_counts_vs_brute_force(ray_session):
    """funnel_counts must equal a per-user brute-force strict-sequence
    simulation on a randomized event log (fixed seed), including users
    who do steps out of order or repeat steps."""
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.window import funnel_counts

    rng = np.random.default_rng(11)
    steps = ["a", "b", "c"]
    rows = []
    for u in range(120):
        n = rng.integers(1, 12)
        for ts in sorted(rng.integers(0, 1000, size=n).tolist()):
            rows.append({"user_id": u,
                         "ts": pd.Timestamp("2024-01-01")
                         + pd.Timedelta(seconds=int(ts)),
                         "event_type": str(rng.choice(steps + ["x", "y"]))})
    ev = pd.DataFrame(rows).drop_duplicates(["user_id", "ts"])

    out = funnel_counts(
        ray.data.from_pandas(ev).repartition(5), steps,
    ).to_pandas().set_index("step")["n_users"].to_dict()

    expect = {1: 0, 2: 0, 3: 0}
    for _, g in ev.sort_values("ts").groupby("user_id"):
        prev = None
        for k, st in enumerate(steps, 1):
            sel = g[(g["event_type"] == st)
                    & ((g["ts"] > prev) if prev is not None else True)]
            if not len(sel):
                break
            prev = sel["ts"].min()
            expect[k] += 1
    assert out == expect and expect[1] > expect[3] > 0

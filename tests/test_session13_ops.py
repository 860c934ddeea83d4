"""Edge-case unit tests for the session-13 operators (the oracle gate
covers corpus-scale parity; these pin the corner semantics)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def test_cube_agg_emits_every_grouping_set():
    from mmgraphrag_ray.stages.reshape import cube_agg

    ds = ray.data.from_pandas(pd.DataFrame({
        "a": ["x", "x", "y"],
        "b": ["1", "2", "1"],
        "v": [10, 20, 5],
    }))
    out = cube_agg(
        ds, keys=["a", "b"],
        aggs={"n": (None, "count"), "mx": ("v", "max")},
    ).to_pandas().set_index(["a", "b"]).sort_index()
    # 2^2 grouping sets: finest (3 groups), by-a (2), by-b (2), total (1)
    assert len(out) == 8
    assert out.loc[("x", "2"), "n"] == 1 and out.loc[("x", "2"), "mx"] == 20
    assert out.loc[("x", "ALL"), "n"] == 2 and out.loc[("x", "ALL"), "mx"] == 20
    assert out.loc[("ALL", "1"), "n"] == 2 and out.loc[("ALL", "1"), "mx"] == 10
    assert out.loc[("ALL", "ALL"), "n"] == 3 and out.loc[("ALL", "ALL"), "mx"] == 20


def _write_lineitem(d: str, rows: dict):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table(rows), os.path.join(d, "lineitem.parquet"))


def test_regression_negative_slope_truncates_toward_zero():
    from mmgraphrag_ray.pipelines.relational import lineitem_regression

    d = "/tmp/raykg_s13_reg"
    # x=[1,2,4], y cents=[300,250,100]: num=-950, den=14 ->
    # slope = -67857142.857..., DuckDB // truncates toward zero
    _write_lineitem(d, {
        "l_returnflag": pa.array(["N", "N", "N"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 4.0], pa.float64()),
        "l_extendedprice": pa.array([3.00, 2.50, 1.00], pa.float64()),
    })
    out = lineitem_regression(d).to_pandas()
    assert out.loc[0, ["n", "sum_x", "sum_y", "sxx", "sxy"]].tolist() == \
        [3, 7, 650, 21, 1200]
    assert out.loc[0, "slope_ppm"] == -67_857_142


def test_regression_perfect_line_and_degenerate_x():
    from mmgraphrag_ray.pipelines.relational import lineitem_regression

    d = "/tmp/raykg_s13_reg2"
    # flag P: y = 200x exactly -> slope 2_000_000 ppm (cents per unit)
    # flag D: constant x -> den = 0 -> slope 0 by definition
    _write_lineitem(d, {
        "l_returnflag": pa.array(["P", "P", "P", "D", "D"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 5.0, 5.0], pa.float64()),
        "l_extendedprice": pa.array([2.0, 4.0, 6.0, 1.0, 9.0], pa.float64()),
    })
    out = lineitem_regression(d).to_pandas().set_index("l_returnflag")
    assert out.loc["P", "slope_ppm"] == 200 * 1_000_000
    assert out.loc["D", "slope_ppm"] == 0


def _write_events(d: str, ts_list, etype="t"):
    os.makedirs(d, exist_ok=True)
    n = len(ts_list)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts_list), pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array([etype] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))


def test_cusum_locates_step_change_boundary():
    from mmgraphrag_ray.pipelines.relational import events_cusum

    # daily counts 1,1,1,5,5,5: dev=(-12,-12,-12,+12,+12,+12),
    # cusum=(-12,-24,-36,-24,-12,0) -> |cusum| peaks at day 3
    ts = []
    for day, cnt in [(1, 1), (2, 1), (3, 1), (4, 5), (5, 5), (6, 5)]:
        ts += [f"2024-01-0{day} 10:{m:02d}:00" for m in range(cnt)]
    d = "/tmp/raykg_s13_cusum"
    _write_events(d, ts)
    out = events_cusum(d).to_pandas()
    assert out.loc[0, "n_days"] == 6 and out.loc[0, "total"] == 18
    assert out.loc[0, "change_day"] == pd.Timestamp("2024-01-03")
    assert out.loc[0, "cusum_at"] == -36


def test_cusum_flat_series_ties_to_earliest_day():
    from mmgraphrag_ray.pipelines.relational import events_cusum

    d = "/tmp/raykg_s13_cusum_flat"
    _write_events(d, ["2024-02-01 09:00:00", "2024-02-02 09:00:00",
                      "2024-02-03 09:00:00"])
    out = events_cusum(d).to_pandas()
    # dev == 0 everywhere -> every cusum 0 -> earliest day wins the tie
    assert out.loc[0, "change_day"] == pd.Timestamp("2024-02-01")
    assert out.loc[0, "cusum_at"] == 0


def test_backlog_overlapping_intervals():
    from mmgraphrag_ray.pipelines.relational import orders_backlog

    d = "/tmp/raykg_s13_backlog"
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"], pa.string()),
        "o_totalprice": pa.array([1.0, 2.0], pa.float64()),
        "o_orderdate": pa.array(
            pd.to_datetime(["2024-03-01", "2024-03-02"]), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1", "1"], pa.string()),
    }), os.path.join(d, "orders.parquet"))
    # order 1 ships last on 03-03 (two lines), order 2 on 03-02
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array(
            pd.to_datetime(["2024-03-02", "2024-03-03", "2024-03-02"]),
            pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    out = (orders_backlog(d).to_pandas()
           .sort_values("day").reset_index(drop=True))
    got = list(zip(out["day"].dt.strftime("%m-%d"), out["open_orders"]))
    # open: 1 on 03-01, 2 on 03-02, 1 on 03-03 (order2 closed), 0 on 03-04
    assert got == [("03-01", 1), ("03-02", 2), ("03-03", 1), ("03-04", 0)]


def test_basket_rules_counts_and_exclusions():
    from mmgraphrag_ray.pipelines.relational import basket_rules

    d = "/tmp/raykg_s13_rules"
    os.makedirs(d, exist_ok=True)
    # baskets: o1={1,2}, o2={1,2}, o3={1,3}, o4={9} (size-1: excluded)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3, 4], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 1, 3, 9], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    out = basket_rules(d, min_support=2).to_pandas()
    # only (1,2) survives min_support=2; (1,3) has support 1
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["pa"], r["pb"], r["support"]) == (1, 2, 2)
    assert (r["n_a"], r["n_b"], r["n_baskets"]) == (3, 2, 3)
    assert r["conf_a_ppm"] == 2 * 1_000_000 // 3   # 666_666
    assert r["conf_b_ppm"] == 1_000_000
    assert r["lift_ppm"] == 2 * 3 * 1_000_000 // (3 * 2)  # 1_000_000


def _write_dims(d: str, supp_nation, nation_region):
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([k for k, _ in supp_nation], pa.int64()),
        "s_name": pa.array([f"s{k}" for k, _ in supp_nation], pa.string()),
        "s_nationkey": pa.array([n for _, n in supp_nation], pa.int64()),
        "s_acctbal": pa.array([1.0] * len(supp_nation), pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([k for k, _ in nation_region], pa.int64()),
        "n_name": pa.array([f"N{k}" for k, _ in nation_region], pa.string()),
        "n_regionkey": pa.array([r for _, r in nation_region], pa.int64()),
    }), os.path.join(d, "nation.parquet"))


def test_q11_mean_relative_threshold_and_region_filter():
    from mmgraphrag_ray.pipelines.relational import q11_important_parts

    d = "/tmp/raykg_s13_q11"
    # supplier 1 in region 0 (counted), supplier 2 in region 1 (ignored)
    _write_dims(d, supp_nation=[(1, 10), (2, 11)],
                nation_region=[(10, 0), (11, 1)])
    # in-region part values (cents): p1=1000, p2=100, p4=100 -> mean=400;
    # 2x mean = 800 -> only p1 qualifies.  p3 ships only via supplier 2.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 4, 3], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, 1.0, 1.0, 99.0], pa.float64()),
    }), os.path.join(d, "lineitem.parquet"))
    out = q11_important_parts(d).to_pandas()
    assert out[["l_partkey", "value_cents"]].values.tolist() == [[1, 1000]]


def test_q16_filters_parts_and_excludes_region_suppliers():
    from mmgraphrag_ray.pipelines.relational import q16_supplier_counts

    d = "/tmp/raykg_s13_q16"
    # supplier 1 excluded (region 0); suppliers 2,3 counted
    _write_dims(d, supp_nation=[(1, 10), (2, 11), (3, 11)],
                nation_region=[(10, 0), (11, 1)])
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["a", "b", "c"], pa.string()),
        # part 2 filtered by brand, part 3 by size
        "p_brand": pa.array(["Brand#2", "Brand#1", "Brand#3"], pa.string()),
        "p_type": pa.array(["SMALL", "SMALL", "SMALL"], pa.string()),
        "p_size": pa.array([4, 4, 5], pa.int64()),
        "p_retailprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    # part 1 supplied by all three suppliers (1 is excluded) + a dup row
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 3, 2, 2], pa.int64()),
    }), os.path.join(d, "lineitem.parquet"))
    out = q16_supplier_counts(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"]) == \
        ("Brand#2", "SMALL", 4, 2)


def test_user_top_event_tie_breaks_lexicographically():
    from mmgraphrag_ray.pipelines.relational import user_top_event

    d = "/tmp/raykg_s13_topev"
    # user 1: 2 views vs 2 clicks -> 'click' wins the tie; user 2: view
    _write_events_multi = [
        (1, "view"), (1, "view"), (1, "click"), (1, "click"),
        (2, "view"), (2, "view"), (2, "click"),
    ]
    os.makedirs(d, exist_ok=True)
    n = len(_write_events_multi)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * n),
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in _write_events_multi], pa.int64()),
        "event_type": pa.array([t for _, t in _write_events_multi],
                               pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = (user_top_event(d).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out.values.tolist() == [[1, "click", 2], [2, "view", 2]]


def test_conductance_zero_for_isolated_components():
    from mmgraphrag_ray.stages.graphalgo import conductance_int

    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": ["a", "b", "c", "x", "y"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "b", "a", "x"],
        "tgt_id": ["b", "c", "c", "y"],
    }))
    out = (conductance_int(nodes, edges, rounds=4).to_pandas()
           .set_index("label").sort_index())
    # triangle {a,b,c}: vol=6, internal=3, cut=0; edge {x,y}: vol=2, cut=0
    assert out.loc["a"].tolist() == [3, 0, 6, 0]
    assert out.loc["x"].tolist() == [2, 0, 2, 0]


def test_conductance_cut_edges_on_unconverged_partition():
    from mmgraphrag_ray.stages.graphalgo import conductance_int

    # path a-b-c-d with ONE label-prop round: labels a:a b:a c:b d:c ->
    # community a has 1 internal + 1 cut edge; b and c are all-cut
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": ["a", "b", "c", "d"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "b", "c"],
        "tgt_id": ["b", "c", "d"],
    }))
    out = (conductance_int(nodes, edges, rounds=1).to_pandas()
           .set_index("label").sort_index())
    # m=3: community a: vol=3, cut=1 -> 1e6 // min(3, 3) = 333333
    assert out.loc["a"].tolist() == [2, 1, 3, 333_333]
    assert out.loc["b"].tolist() == [1, 2, 2, 1_000_000]
    assert out.loc["c"].tolist() == [1, 1, 1, 1_000_000]


def test_ab_test_split_and_exact_cents():
    import hashlib

    from mmgraphrag_ray.pipelines.relational import events_ab_test

    d = "/tmp/raykg_s13_ab"
    os.makedirs(d, exist_ok=True)
    users = [1, 2, 3, 4]
    # two events per user, values 1.25 and 2.50 -> 375 cents per user
    uu = [u for u in users for _ in range(2)]
    vv = [1.25, 2.50] * len(users)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(uu)), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * len(uu)),
                       pa.timestamp("us")),
        "user_id": pa.array(uu, pa.int64()),
        "event_type": pa.array(["t"] * len(uu), pa.string()),
        "value": pa.array(vv, pa.float64()),
        "props": pa.array(["{}"] * len(uu), pa.string()),
    }), os.path.join(d, "events.parquet"))

    def variant(u):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
        return "A" if h % 2 == 0 else "B"

    exp = {}
    for u in users:
        v = variant(u)
        exp.setdefault(v, [0, 0, 0])
        exp[v][0] += 1          # users
        exp[v][1] += 2          # events
        exp[v][2] += 375        # cents
    out = events_ab_test(d).to_pandas().set_index("variant")
    for v, (nu, ne, cents) in exp.items():
        assert out.loc[v, ["n_users", "n_events", "value_cents"]].tolist() \
            == [nu, ne, cents]
        assert out.loc[v, "cents_per_user"] == cents // nu


def test_microbatch_sessions_stitch_across_slice_boundary():
    from mmgraphrag_ray.pipelines.relational import events_sessions_microbatch

    d = "/tmp/raykg_s13_mbsess"
    os.makedirs(d, exist_ok=True)
    base = pd.Timestamp("2024-05-01 00:00:00")
    h = pd.Timedelta(hours=1)
    rows = [
        # u3 pins global min/max: slices cut [0h,10h,20h,30h,40h]
        (3, base), (3, base + 40 * h),
        # u1's session straddles the 10h cut (10-minute gap)
        (1, base + 9 * h + pd.Timedelta(minutes=55)),
        (1, base + 10 * h + pd.Timedelta(minutes=5)),
        # u2 is idle through two middle slices: state must carry
        (2, base + 5 * h), (2, base + 35 * h),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["t"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = (events_sessions_microbatch(d, n_slices=4).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    got = [(int(r.user_id), int(r.session_id), int(r.n_events))
           for r in out.itertuples()]
    # boundary-spanning session merges into ONE row with n_events=2
    assert got == [(1, 1, 2), (2, 1, 1), (2, 2, 1), (3, 1, 1), (3, 2, 1)]
    u1 = out[out.user_id == 1].iloc[0]
    assert u1["first_ts"] == base + 9 * h + pd.Timedelta(minutes=55)
    assert u1["last_ts"] == base + 10 * h + pd.Timedelta(minutes=5)

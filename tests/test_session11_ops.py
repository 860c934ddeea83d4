"""Edge-case unit tests for the session-11 operators (the oracle gate
covers corpus-scale parity; these pin the corner semantics)."""

import numpy as np
import pandas as pd
import ray.data


def test_quantile_cont_micro_interpolates_exactly():
    from mmgraphrag_ray.stages.groupagg import quantile_cont_micro

    # values 10..50 cents (n=5): p50 lands exactly on 30 (rem=0),
    # p25 sits at pos=(5-1)*25/100=1.0 -> rank 2 exactly (rem=0),
    # p90 at pos=3.6 -> lo=rank4 (40), rem=60 -> 40*1e6 + 10*60*1e4
    ds = ray.data.from_pandas(pd.DataFrame({"v": [10, 20, 30, 40, 50]}))
    out = quantile_cont_micro(ds, "v", [25, 50, 90]).to_pandas()
    got = dict(zip(out["q"], out["value_micro"]))
    assert got == {
        "p25": 20_000_000,
        "p50": 30_000_000,
        "p90": 40_000_000 + 10 * 60 * 10_000,
    }
    assert (out["n"] == 5).all()


def test_quantile_cont_micro_single_row_and_dupes():
    from mmgraphrag_ray.stages.groupagg import quantile_cont_micro

    one = ray.data.from_pandas(pd.DataFrame({"v": [7]}))
    out = quantile_cont_micro(one, "v", [50, 90]).to_pandas()
    # n=1: every percentile is the single element, rem irrelevant
    assert set(out["value_micro"]) == {7_000_000}

    dupes = ray.data.from_pandas(pd.DataFrame({"v": [5, 5, 5, 5]}))
    out = quantile_cont_micro(dupes, "v", [25, 75]).to_pandas()
    assert set(out["value_micro"]) == {5_000_000}


def test_filtered_topk_restricts_to_label():
    from mmgraphrag_ray.stages.similarity import brute_topk

    # 3 vectors per label; query label 0 must never rank a label-1 row
    vecs = np.eye(6, dtype=np.float64) + 0.1
    corpus = ray.data.from_pandas(pd.DataFrame({
        "vec_id": np.arange(6, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
        "label": np.array([0, 0, 0, 1, 1, 1], dtype=np.int64),
    }))
    out = brute_topk(
        corpus, np.array([0]), vecs[:1], k=5,
        query_labels=np.array([0]),
    ).to_pandas()
    # self excluded, only the two other label-0 rows remain
    assert sorted(out["vec_id"].tolist()) == [1, 2]
    assert out["rank"].tolist() == [1, 2]


def test_events_ohlc_single_event_day():
    from mmgraphrag_ray.pipelines.relational import events_ohlc
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = "/tmp/raykg_s11_ohlc"
    os.makedirs(d, exist_ok=True)
    ts = pd.to_datetime([
        "2024-01-01 09:00:00", "2024-01-01 15:00:00",
        "2024-01-01 12:00:00", "2024-01-02 10:00:00",
    ])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["t", "t", "t", "t"], pa.string()),
        "value": pa.array([1.00, 3.00, 9.00, 5.00], pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = events_ohlc(d).to_pandas().sort_values("day").reset_index(drop=True)
    # day 1: open=1.00 (09:00), close=3.00 (15:00), high=9.00, low=1.00
    assert out.loc[0, ["open_cents", "high_cents", "low_cents",
                       "close_cents", "n_events"]].tolist() == \
        [100, 900, 100, 300, 3]
    # single-event day: open == close == high == low
    assert out.loc[1, ["open_cents", "high_cents", "low_cents",
                       "close_cents", "n_events"]].tolist() == \
        [500, 500, 500, 500, 1]


def test_api_surface_counts_and_distinct():
    from mmgraphrag_ray.stages.codegraph import api_surface

    files = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r1", "r1", "r2"],
        "lang": ["python", "python", "go"],
        "content": [
            "def a():\n    pass\ndef b():\n    pass\nclass C:\n    pass\n",
            "def a():\n    pass\n",      # duplicate name 'a' across files
            "class D:\n    pass\n",      # no defs at all
        ],
    }))
    out = api_surface(files).to_pandas().set_index(["repo", "lang"])
    assert out.loc[("r1", "python")].tolist() == [3, 1, 2]  # defs, classes, distinct
    assert out.loc[("r2", "go")].tolist() == [0, 1, 0]


def test_q19_arm_overlap_counts_once_in_any():
    # a line matching two arms contributes to both arm rows but once to
    # 'any' — pin the de-overlap semantics with a synthetic part table
    from mmgraphrag_ray.pipelines.relational import q19_disjunctive_revenue
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = "/tmp/raykg_s11_q19"
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": pa.array(["p"], pa.string()),
        "p_brand": pa.array(["Brand#2"], pa.string()),
        "p_type": pa.array(["PROMO"], pa.string()),
        "p_size": pa.array([25], pa.int64()),
        "p_retailprice": pa.array([900.0], pa.float64()),
    }), os.path.join(d, "part.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_partkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_linenumber": pa.array([1], pa.int64()),
        "l_quantity": pa.array([20.0], pa.float64()),
        "l_extendedprice": pa.array([100.0], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
        "l_returnflag": pa.array(["N"], pa.string()),
        "l_linestatus": pa.array(["O"], pa.string()),
        "l_shipdate": pa.array(
            pd.to_datetime(["1997-06-01"]), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    out = q19_disjunctive_revenue(d).to_pandas().set_index("arm")
    # Brand#2 size 25 qty 20: matches arm2 (10..30, 5..30) and arm3? no —
    # arm3 needs Brand#3.  So arm2 only; 'any' equals arm2.
    assert out.loc["arm2", "n_lines"] == 1
    assert out.loc["any", "n_lines"] == 1
    assert out.loc["arm1", "n_lines"] == 0
    assert out.loc["any", "revenue_cents"] == 10_000


def test_ktruss_k4_keeps_only_the_k4():
    from mmgraphrag_ray.stages.graphalgo import ktruss_edges

    # K4 on {a,b,c,d} (every edge in 2 triangles) + a pendant triangle
    # {d,e,f} (support 1 each): 4-truss keeps exactly the K4
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "a", "a", "b", "b", "c", "d", "d", "e"],
        "tgt_id": ["b", "c", "d", "c", "d", "d", "e", "f", "f"],
    }))
    out = ktruss_edges(edges, k=4, rounds=2).to_pandas()
    assert sorted(zip(out["a"], out["b"])) == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d")]
    assert (out["support"] == 2).all()


def test_ktruss_second_round_peels_cascades():
    from mmgraphrag_ray.stages.graphalgo import ktruss_edges

    # two triangles sharing edge (a,b): abc and abd, plus edge (c,d):
    # all of abcd minus nothing... use a triangle chain instead:
    # t1 = abc, t2 = bcd -> edge (b,c) support 2, others 1.  3-truss
    # round 1 keeps all (support >= 1); removing nothing -> stable.
    # For a cascade: triangle abc + pendant edge (c, x): round 1 drops
    # (c, x) (support 0 -> not credited at all), triangle survives.
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "a", "b", "c"],
        "tgt_id": ["b", "c", "c", "x"],
    }))
    out = ktruss_edges(edges, k=3, rounds=2).to_pandas()
    assert sorted(zip(out["a"], out["b"])) == [
        ("a", "b"), ("a", "c"), ("b", "c")]
    assert (out["support"] == 1).all()


def test_ktruss_triangle_free_is_empty():
    from mmgraphrag_ray.stages.graphalgo import ktruss_edges

    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "b", "c"], "tgt_id": ["b", "c", "d"],
    }))
    out = ktruss_edges(edges, k=3, rounds=1).to_pandas()
    assert len(out) == 0


def test_cdc_apply_upsert_delete_insert():
    from mmgraphrag_ray.stages.join import cdc_apply

    base = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 2, 3], "v": ["one", "two", "three"],
    }))
    changes = ray.data.from_pandas(pd.DataFrame({
        "k": [2, 3, 4],
        "v": ["TWO", None, "four"],
        "op": ["upsert", "delete", "upsert"],
    }))
    out = cdc_apply(base, changes, key_col="k", payload_cols=["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 4]
    assert out["v"].tolist() == ["one", "TWO", "four"]


def test_range_partition_plan_balances():
    from mmgraphrag_ray.stages.layout import range_partition_plan

    ds = ray.data.from_pandas(pd.DataFrame({"v": list(range(1, 101))}))
    out = range_partition_plan(ds, "v", n_parts=4).to_pandas() \
        .sort_values("part_id").reset_index(drop=True)
    # 1..100, boundaries at the exact 25/50/75 elements; ties (the
    # boundary itself) land in the LOWER partition
    assert out["part_id"].tolist() == [0, 1, 2, 3]
    assert out["n_rows"].tolist() == [25, 25, 25, 25]
    assert out["min_v"].tolist() == [1, 26, 51, 76]
    assert out["max_v"].tolist() == [25, 50, 75, 100]


def test_cdc_apply_closes_the_diff_loop():
    # apply(diff-changes) over the base must equal the mutated version
    from mmgraphrag_ray.stages.join import cdc_apply

    base = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"],
    }))
    target = pd.DataFrame({"k": [1, 2, 5], "v": ["a", "B", "e"]})
    changes = ray.data.from_pandas(pd.DataFrame({
        "k": [2, 3, 4, 5],
        "v": ["B", None, None, "e"],
        "op": ["upsert", "delete", "delete", "upsert"],
    }))
    out = cdc_apply(base, changes, key_col="k", payload_cols=["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, target)


def test_ppr_mass_concentrates_on_seed():
    from mmgraphrag_ray.stages.graphalgo import ppr_int

    # path graph a-b-c-d, seed {a}: rank(a) > rank(b) > rank(c) > rank(d)
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": ["a", "b", "c", "d"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "b", "c"], "tgt_id": ["b", "c", "d"],
    }))
    seeds = ray.data.from_pandas(pd.DataFrame({"entity_name": ["a"]}))
    out = ppr_int(nodes, edges, seeds, iterations=3).to_pandas() \
        .set_index("node")["r"]
    # hand-unrolled integer power steps (SCALE=1e12, damp 85/100,
    # teleport only to the seed):
    #   r1 = (150e9, 850e9, 0, 0)
    #   r2 = (511.25e9, 127.5e9, 361.25e9, 0)
    #   r3 = (204.1875e9, 588.09375e9, 54.1875e9, 153.53125e9)
    assert out["a"] == 204_187_500_000
    assert out["b"] == 588_093_750_000
    assert out["c"] == 54_187_500_000
    assert out["d"] == 153_531_250_000
    # non-seed teleport is zero: a node unreachable from the seed scores 0
    nodes2 = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": ["a", "b", "z1", "z2"]}))
    edges2 = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "z1"], "tgt_id": ["b", "z2"],
    }))
    out2 = ppr_int(nodes2, edges2, seeds, iterations=2).to_pandas() \
        .set_index("node")["r"]
    assert out2["z1"] == 0 and out2["z2"] == 0


def test_rolling_7d_gap_shrinks_window():
    from mmgraphrag_ray.pipelines.relational import events_rolling_7d
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = "/tmp/raykg_s11_roll"
    os.makedirs(d, exist_ok=True)
    # days 1, 2, then a jump to day 20: the rolling window at day 20
    # must NOT include days 1-2 (RANGE frame, not ROWS)
    ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-20"])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["t", "t", "t"], pa.string()),
        "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
        "props": pa.array(["{}"] * 3, pa.string()),
    }), os.path.join(d, "events.parquet"))
    out = events_rolling_7d(d).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    assert out["rolling_7d_cents"].tolist() == [100, 300, 400]


def test_q20_share_test_is_integer_exact():
    from mmgraphrag_ray.pipelines.relational import q20_part_share_suppliers
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = "/tmp/raykg_s11_q20"
    os.makedirs(d, exist_ok=True)
    # part 1: supplier 1 ships exactly 1/5 (NOT >1/5, excluded);
    # part 2: supplier 2 ships 3/5 (included)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([1, 9, 2, 9], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 4.0, 3.0, 2.0], pa.float64()),
        "l_extendedprice": pa.array([10.0] * 4, pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array(
            pd.to_datetime(["1997-06-01"] * 4), pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 9], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s9"], pa.string()),
        "s_nationkey": pa.array([0, 0, 0], pa.int64()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }), os.path.join(d, "supplier.parquet"))
    out = q20_part_share_suppliers(d).to_pandas()
    got = dict(zip(out["s_suppkey"], out["n_dominated_parts"]))
    assert 1 not in got          # exactly 1/5 is not > 1/5
    assert got[2] == 1           # 3/5 of part 2
    assert got[9] == 2           # 4/5 of part 1 and 2/5 of part 2

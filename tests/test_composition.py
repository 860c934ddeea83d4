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


def test_mixture_allocate_largest_remainder_and_caps():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.sample import mixture_allocate

    # sources a(w=3,n=5), b(w=1,n=5), c(w=1,n=1): total=7, W=5
    # base: a=4 b=1 c=1, rem = 7-6 = 1 -> fracs: a: 21%5=1, b: 7%5=2, c: 2
    # order by (frac desc, name): b, c, a -> b gets +1 -> quotas a4 b2 c1... 
    # c has only 1 row anyway; shortfall would show if quota exceeded n.
    rows = ([("a", i) for i in range(5)] + [("b", 10 + i) for i in range(5)]
            + [("c", 99)])
    df = pd.DataFrame(rows, columns=["source", "doc_id"])
    df["doc_id"] = df["doc_id"].astype("int64")
    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (mixture_allocate(ds, {"a": 3, "b": 1, "c": 1}, total=7)
               .to_pandas().sort_values(["source", "rank"])
               .reset_index(drop=True))
        assert list(got["source"]) == ["a"] * 4 + ["b"] * 2 + ["c"]
        assert list(got["doc_id"]) == [0, 1, 2, 3, 10, 11, 99]
        assert got[got["source"] == "b"]["quota"].iloc[0] == 2


def test_mixture_allocate_quota_exceeds_available():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.sample import mixture_allocate

    df = pd.DataFrame({"source": ["a", "a", "b"], "doc_id": [1, 2, 3]})
    df["doc_id"] = df["doc_id"].astype("int64")
    got = mixture_allocate(
        ray.data.from_pandas(df), {"a": 1, "b": 9}, total=10
    ).to_pandas()
    # b's quota is 9 but only 1 row exists: shortfall, no redistribution
    assert len(got[got["source"] == "b"]) == 1
    assert len(got[got["source"] == "a"]) == 1


def test_grouped_corr_components_exact_and_split_invariant():
    from mmgraphrag_ray.stages.groupagg import grouped_corr_components

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "g": pd.Series(rng.choice(["a", "b"], 500), dtype=object),
            "x": pd.Series(rng.randint(1, 50, 500).astype(float)),
            # fractional y exercises the trunc-toward-zero quantization
            "y": pd.Series(rng.uniform(10, 99999, 500).round(2)),
        }
    )

    def run(nblocks):
        return (
            grouped_corr_components(
                ray.data.from_pandas(df).repartition(nblocks),
                keys=["g"], x_col="x", y_col="y",
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)
    xi = df.x.astype("int64")
    yi = df.y.astype("int64")  # trunc toward zero, matches the stage
    for _, row in a.iterrows():
        m = df.g == row.g
        assert row.n == int(m.sum())
        assert row.sx == int(xi[m].sum()) and row.sy == int(yi[m].sum())
        assert row.sxx == int((xi[m] ** 2).sum())
        assert row.syy == int((yi[m] ** 2).sum())
        assert row.sxy == int((xi[m] * yi[m]).sum())
    # the components reconstruct pandas corr on the quantized columns
    for g in ["a", "b"]:
        r = a[a.g == g].iloc[0]
        num = r.n * r.sxy - r.sx * r.sy
        den = np.sqrt(float(r.n * r.sxx - r.sx**2) * float(r.n * r.syy - r.sy**2))
        m = df.g == g
        expected = np.corrcoef(xi[m], yi[m])[0, 1]
        assert abs(num / den - expected) < 1e-9


def test_grouped_hash_sample_deterministic_and_stable_under_growth():
    import hashlib

    from mmgraphrag_ray.stages.sample import grouped_hash_sample

    df = pd.DataFrame(
        {
            "lang": pd.Series(["en"] * 10 + ["fr"] * 2, dtype=object),
            "doc_id": pd.Series(range(12), dtype="int64"),
        }
    )

    def run(frame, nblocks=4):
        return (
            grouped_hash_sample(
                ray.data.from_pandas(frame).repartition(nblocks),
                keys=["lang"], id_col="doc_id", k=3,
            )
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )

    out = run(df)
    # k=3 per group, short groups keep all members
    assert len(out[out.lang == "en"]) == 3 and len(out[out.lang == "fr"]) == 2
    # serial expectation: md5(str(id)) ascending
    exp = sorted(range(10), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:3]
    assert sorted(out[out.lang == "en"].doc_id) == sorted(exp)
    # adding rows that hash later does not evict earlier picks... verify
    # stability by re-running on a superset and checking the en picks only
    # change if a new id hashes earlier
    df2 = pd.concat(
        [df, pd.DataFrame({"lang": ["en"], "doc_id": [100]})], ignore_index=True
    )
    out2 = run(df2)
    exp2 = sorted(
        list(range(10)) + [100],
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
    )[:3]
    assert sorted(out2[out2.lang == "en"].doc_id) == sorted(exp2)


def test_bucketed_count_distinct_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.groupagg import bucketed_count_distinct

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": rng.randint(0, 7, 500).astype("int64"),
        "h": rng.choice(["x", "y"], 500),
        "u": rng.randint(0, 40, 500).astype("int64"),
    })
    got = (
        bucketed_count_distinct(
            ray.data.from_pandas(df).repartition(8),
            keys=["g", "h"], distinct_col="u", out_col="n_users",
        )
        .to_pandas().sort_values(["g", "h"]).reset_index(drop=True)
    )
    want = (
        df.groupby(["g", "h"])["u"].nunique().reset_index(name="n_users")
        .sort_values(["g", "h"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_rfm_scores_quintiles():
    import pandas as pd

    from mmgraphrag_ray.pipelines.relational import events_rfm

    out = events_rfm("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"user_id", "recency_us", "frequency",
                                "monetary_cents", "r_score", "f_score",
                                "m_score", "rfm"}
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, 5).all()
    # the highest-frequency user gets f_score 5, the lowest gets 1
    assert out.loc[out["frequency"].idxmax(), "f_score"] == 5
    assert out.loc[out["frequency"].idxmin(), "f_score"] == 1
    assert (out["rfm"] ==
            out["r_score"] * 100 + out["f_score"] * 10 + out["m_score"]).all()


def test_q6_pushdown_matches_unfiltered_compute():
    import duckdb

    from mmgraphrag_ray.pipelines.relational import q6_revenue

    out = q6_revenue("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    want = con.sql("""
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """).df()
    assert int(out["revenue_cents"].iloc[0]) == int(want["revenue_cents"].iloc[0])
    assert int(out["n_rows"].iloc[0]) == int(want["n_rows"].iloc[0])


def test_curation_funnel_is_monotone_and_consistent():
    from mmgraphrag_ray.pipelines.relational import curation_funnel, doc_curation

    fun = curation_funnel("/root/testdata/sf0.001").to_pandas() \
        .sort_values("rule_idx").reset_index(drop=True)
    assert list(fun["rule"]) == ["keep_exact", "keep_lang",
                                 "keep_quality", "keep_decon"]
    # the cumulative column never increases down the funnel
    assert (fun["n_cum"].diff().dropna() <= 0).all()
    # last cumulative == total keeps from the per-doc verdicts
    flags = doc_curation("/root/testdata/sf0.001").to_pandas()
    assert fun["n_cum"].iloc[-1] == flags["keep"].sum()
    assert fun["n_pass"].iloc[1] == flags["keep_lang"].sum()


def test_events_dwell_attributes_gaps_to_current_state():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.pipelines.relational import events_dwell

    out = events_dwell("/root/testdata/sf0.001").to_pandas()
    # every dwell interval is non-negative and the interval count equals
    # total events minus one per user (each user's last event has no gap)
    import duckdb
    con = duckdb.connect()
    n_ev, n_users = con.sql(
        "SELECT count(*), count(DISTINCT user_id) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()
    assert out["n_intervals"].sum() == n_ev - n_users
    assert (out["total_dwell_us"] >= 0).all()
    assert (out["max_dwell_us"] <= out["total_dwell_us"]).all()

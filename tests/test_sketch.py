"""stages/sketch.py — HyperLogLog register build + estimate."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.sketch import M, hll_estimate, hll_registers


def _data(n_groups=3, per_group=5000):
    rng = np.random.RandomState(13)
    gs, vs = [], []
    for g in range(n_groups):
        # distinct cardinality differs per group: 500, 1500, 2500
        card = 500 + g * 1000
        gs.extend([f"g{g}"] * per_group)
        vs.extend(rng.randint(0, card, per_group).tolist())
    return pd.DataFrame({"g": pd.Series(gs, dtype=object), "v": pd.Series(vs, dtype="int64")})


def test_hll_registers_batch_split_invariant():
    df = _data()

    def run(nblocks):
        return (
            hll_registers(
                ray.data.from_pandas(df).repartition(nblocks), "g", "v", n_buckets=4
            )
            .to_pandas()
            .sort_values(["g", "register"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)
    assert (a["register"] >= 0).all() and (a["register"] < M).all()
    assert (a["max_rho"] >= 1).all() and (a["max_rho"] <= 59).all()


def test_hll_estimate_within_error_bound():
    df = _data()
    regs = hll_registers(ray.data.from_pandas(df), "g", "v", n_buckets=4).to_pandas()
    est = hll_estimate(regs, "g").set_index("g")["approx_distinct"]
    truth = df.groupby("g")["v"].nunique()
    for g in truth.index:
        rel = abs(est[g] - truth[g]) / truth[g]
        # m=64 -> sigma ~ 13%; 3-sigma bound
        assert rel < 0.4, (g, est[g], truth[g])


def test_hll_merge_is_max_union():
    """Registers of a union equal elementwise max of the parts' registers —
    the property that makes the sketch mergeable across shards."""
    df = _data(n_groups=1)
    half1, half2 = df.iloc[: len(df) // 2], df.iloc[len(df) // 2 :]
    r_all = (
        hll_registers(ray.data.from_pandas(df), "g", "v", n_buckets=2)
        .to_pandas()
        .set_index("register")["max_rho"]
    )
    r1 = (
        hll_registers(ray.data.from_pandas(half1), "g", "v", n_buckets=2)
        .to_pandas()
        .set_index("register")["max_rho"]
    )
    r2 = (
        hll_registers(ray.data.from_pandas(half2), "g", "v", n_buckets=2)
        .to_pandas()
        .set_index("register")["max_rho"]
    )
    merged = pd.concat([r1, r2], axis=1).fillna(0).max(axis=1).astype("int64")
    merged = merged[merged > 0].sort_index()
    pd.testing.assert_series_equal(r_all.sort_index(), merged, check_names=False)


def test_bloom_semi_join_no_false_negatives_and_deterministic():
    from mmgraphrag_ray.stages.sketch import (
        BLOOM_K,
        BLOOM_M,
        _bloom_positions,
        bloom_build,
        bloom_semi_join,
    )

    rng = np.random.RandomState(23)
    build = pd.DataFrame({"k": rng.choice(5000, 800, replace=False).astype("int64")})
    probe = pd.DataFrame(
        {"k": np.arange(5000, dtype="int64"), "payload": np.arange(5000, dtype="int64") * 2}
    )
    bits_ref = bloom_build(ray.data.from_pandas(build).repartition(7), "k")
    kept = (
        bloom_semi_join(ray.data.from_pandas(probe).repartition(5), bits_ref, "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # no false negatives: every build key survives
    assert set(build["k"]).issubset(set(kept["k"]))
    # exact reference: a key survives iff all K of its positions are set
    bits = np.zeros(BLOOM_M, dtype=bool)
    bits[_bloom_positions(build["k"].to_numpy()).ravel()] = True
    want = probe[bits[_bloom_positions(probe["k"].to_numpy())].all(axis=1)]
    assert list(kept["k"]) == sorted(want["k"])
    # filter actually prunes: true members + a tiny fp tail, nowhere near
    # the probe size (fill ratio 800*4/2^20 -> fp rate ~1e-10)
    assert len(build) <= len(kept) <= len(build) + 50 < len(probe)
    assert BLOOM_K == 4


def test_bloom_build_block_split_invariant():
    from mmgraphrag_ray.stages.sketch import bloom_build

    import ray as _ray

    df = pd.DataFrame({"k": np.arange(300, dtype="int64")})
    a = _ray.get(bloom_build(ray.data.from_pandas(df).repartition(1), "k"))
    b = _ray.get(bloom_build(ray.data.from_pandas(df).repartition(11), "k"))
    assert (a == b).all()


def test_cm_sketch_upper_bound_and_split_invariance():
    from mmgraphrag_ray.stages.sketch import cm_estimate, cm_registers

    rng = np.random.RandomState(41)
    keys = rng.zipf(1.5, 20000) % 1000  # skewed counts
    df = pd.DataFrame({"k": keys.astype("int64")})

    def run(nblocks):
        return (
            cm_registers(ray.data.from_pandas(df).repartition(nblocks), "k", n_buckets=4)
            .to_pandas()
            .sort_values(["row", "col"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)
    truth = df["k"].value_counts()
    est = cm_estimate(a, truth.index.tolist()).set_index("key")["approx_count"]
    # count-min never underestimates; total mass per row is exact
    assert (est >= truth).all()
    assert a.groupby("row")["cnt"].sum().eq(len(df)).all()
    # heavy hitters are near-exact (collisions only ADD small-key mass)
    top = truth.head(5)
    assert (est[top.index] - top <= len(df) * 0.02).all()

"""Z-order layout keys: interleave math + locality property."""

import sys

import numpy as np
import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.stages.layout import interleave_bits, zorder_keys


def test_interleave_known_values():
    # x=0b101 (bits 0,2), y=0b011 (bits 0,1)
    # z bits: x0->0, y0->1, x1->2(0), y1->3, x2->4
    qx = np.array([0b101], dtype=np.int64)
    qy = np.array([0b011], dtype=np.int64)
    z = interleave_bits(qx, qy, 3)
    assert z[0] == (1 << 0) | (1 << 1) | (1 << 3) | (1 << 4)


def test_zorder_keys_deterministic_and_bucketed():
    df = pd.DataFrame(
        {
            "id": np.arange(1000),
            "x": np.arange(1000) % 37,
            "y": (np.arange(1000) * 7) % 53,
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    out = (
        zorder_keys(ds, "x", "y", id_cols=["id"], bits=8, n_buckets=16)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert len(out) == 1000
    # bucket is exactly the top 4 bits of the 16-bit key
    assert (
        out["zbucket"].to_numpy() == (out["zkey"].to_numpy() >> 12)
    ).all()
    assert out["zbucket"].between(0, 15).all()
    # same input twice -> identical keys (pure function of data)
    out2 = (
        zorder_keys(ds, "x", "y", id_cols=["id"], bits=8, n_buckets=16)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_zorder_locality_beats_single_column_for_y_predicates():
    # points with equal zbucket should be close in BOTH dims on average:
    # check that for a y-range predicate, the number of distinct zbuckets
    # touched is < total buckets (i.e. some skipping is possible), which
    # an x-only sort layout cannot offer
    n = 4096
    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {"id": np.arange(n), "x": rng.randint(0, 1 << 12, n),
         "y": rng.randint(0, 1 << 12, n)}
    )
    out = zorder_keys(
        ray.data.from_pandas(df), "x", "y", id_cols=["id"], bits=12,
        n_buckets=64,
    ).to_pandas()
    merged = df.merge(out, on="id")
    narrow = merged[merged["y"] < (1 << 12) // 8]  # bottom 12.5% of y
    assert narrow["zbucket"].nunique() < 64


def test_parquet_prune_plan_skips_out_of_range_files():
    import glob

    from mmgraphrag_ray.stages.layout import (
        ensure_partitioned_docs, parquet_prune_plan,
    )

    d = ensure_partitioned_docs("/root/testdata/sf0.001", n_parts=8)
    paths = glob.glob(f"{d}/part-*.parquet")
    assert len(paths) == 8
    plan = parquet_prune_plan(paths, col="doc_id", lo=0, hi=50).to_pandas()
    assert len(plan) >= 8
    # range clustering makes the predicate selective: at most one part
    # can contain [0, 50], the rest are skipped on footer stats alone
    assert plan["skipped"].sum() >= len(plan) - 1
    kept = plan[plan["skipped"] == 0]
    assert ((kept["min_val"] <= 50) & (kept["max_val"] >= 0)).all()
    # stats are consistent: min <= max, n_rows positive
    assert (plan["min_val"] <= plan["max_val"]).all()
    assert (plan["n_rows"] > 0).all()

"""Misra-Gries heavy hitters: sketch path, certification bound, fallback."""

import sys

import numpy as np
import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.stages.sketch import heavy_hitters_frame


def _exact_topk(s: pd.Series, k: int) -> pd.DataFrame:
    c = s.value_counts().rename_axis("key").reset_index(name="cnt")
    c = c.sort_values(["cnt", "key"], ascending=[False, True],
                      kind="mergesort").head(k).reset_index(drop=True)
    c["rank"] = np.arange(1, len(c) + 1, dtype=np.int64)
    return c


def test_skewed_stream_certifies_on_sketch_path():
    # few hot keys over a long tail of singletons: the MG bound certifies
    rng = np.random.RandomState(0)
    hot = np.repeat(np.arange(5), 2000)            # 5 keys x 2000
    tail = np.arange(1000, 1000 + 6000)            # 6000 singletons
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    ds = ray.data.from_pandas(pd.DataFrame({"key": keys})).repartition(8)
    frame, certified, fallback = heavy_hitters_frame(ds, "key", k=5, capacity=64)
    assert certified and not fallback
    expect = _exact_topk(pd.Series(keys), 5)
    pd.testing.assert_frame_equal(
        frame.reset_index(drop=True), expect, check_dtype=False
    )


def test_uniform_stream_falls_back_and_stays_exact():
    # near-uniform over > capacity keys: certification must fail, the
    # fallback groupby must still return the exact deterministic top-k
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 500, size=20_000)
    ds = ray.data.from_pandas(pd.DataFrame({"key": keys})).repartition(8)
    frame, certified, fallback = heavy_hitters_frame(ds, "key", k=10, capacity=32)
    assert fallback and not certified
    expect = _exact_topk(pd.Series(keys), 10)
    pd.testing.assert_frame_equal(
        frame.reset_index(drop=True), expect, check_dtype=False
    )


def test_no_eviction_short_circuit_is_exact():
    # distinct keys < capacity in every batch: dmax == 0, single pass
    keys = np.concatenate([np.repeat(np.arange(10), 50), np.arange(10, 20)])
    ds = ray.data.from_pandas(pd.DataFrame({"key": keys})).repartition(4)
    frame, certified, fallback = heavy_hitters_frame(ds, "key", k=3, capacity=128)
    assert certified and not fallback
    expect = _exact_topk(pd.Series(keys), 3)
    pd.testing.assert_frame_equal(
        frame.reset_index(drop=True), expect, check_dtype=False
    )

"""Deterministic sampling operators.

The consistent hash-threshold samplers live in ``pipelines/relational.py``
(pure filters); this module holds the ones that need a reduce.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _hash_u32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def weighted_topk_sample(ds, id_col: str, weight_col: str, k: int):
    """Deterministic weighted priority sample: keep the ``k`` rows with the
    smallest ``priority = md5_u32(id) // max(weight, 1)`` (ties by id).
    Heavier rows draw proportionally smaller priorities, so selection
    probability grows with weight — the hash-keyed analog of
    probability-proportional-to-size sampling (weights enter via integer
    division, so the whole chain is integer-exact across engines), with the
    same stability property as the hash-threshold samplers: membership is a
    pure function of (id, weight), reproducible across runs and engines.

    Scale shape: per-batch vectorized priority + LOCAL top-k (the
    combiner), then one tiny reduce over n_batches x k rows — no shuffle of
    the input, driver holds k rows.  Output: id, weight, priority.
    """

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 weight_col: pd.Series(dtype="int64"),
                 "priority": pd.Series(dtype="int64")}
            )
        h = batch[id_col].map(lambda i: _hash_u32(str(i))).astype("int64")
        w = np.maximum(batch[weight_col].to_numpy().astype("int64"), 1)
        out = pd.DataFrame(
            {id_col: batch[id_col].astype("int64"),
             weight_col: batch[weight_col].astype("int64"),
             "priority": (h.to_numpy() // w).astype("int64")}
        )
        return out.nsmallest(k, ["priority", id_col], keep="first")

    partials = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    top = partials.nsmallest(k, ["priority", id_col], keep="first")
    import ray.data

    return ray.data.from_pandas(top.reset_index(drop=True))

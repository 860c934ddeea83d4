"""Generic bucketed grouped aggregation (count/sum/min/max).

Ray's built-in ``groupby(keys).aggregate(...)`` pays per-group overhead that
dominates once group counts reach ~1e5; this operator uses the same two-layer
pattern as the KG merges (stages/merge.py):

1. partial aggregate per batch (vectorized pandas groupby — the combiner),
2. shuffle only the partials, grouped by ``crc32(keys) % n_buckets``,
3. vectorized final combine per bucket.

All supported reductions are associative+commutative, so partials compose:
count -> sum of partial counts, sum -> sum, min -> min, max -> max.
"""

from __future__ import annotations

import zlib

import pandas as pd

N_BUCKETS = 64

_FINAL_OP = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def key_bucket(df: pd.DataFrame, keys: list[str], n_buckets: int) -> pd.Series:
    """THE routing bucket for multi-key grouped shuffles: crc32 of the
    '\\x1f'-joined stringified key tuple, mod n_buckets.  Shared by every
    operator that buckets on composite keys (groupagg, window.grouped_topk,
    window.group_quantiles) — the hash and separator must stay byte-
    identical across them for bucket compatibility."""
    key_str = df[keys[0]].astype(str)
    for k in keys[1:]:
        key_str = key_str + "\x1f" + df[k].astype(str)
    return key_str.map(lambda s: zlib.crc32(s.encode()) % n_buckets).astype("int32")


def bucketed_groupby_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    n_buckets: int = N_BUCKETS,
):
    """aggs: {out_col: (in_col | None, op)} with op in count/sum/min/max
    (in_col ignored for count). Returns Dataset(keys..., out_cols...)."""
    for out, (_, op) in aggs.items():
        if op not in _FINAL_OP:
            raise ValueError(f"unsupported op {op} for {out}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, op) in aggs.items():
            cols[out] = g.size() if op == "count" else g[col].agg(op)
        out_df = pd.DataFrame(cols).reset_index()
        out_df["_bucket"] = key_bucket(out_df, keys, n_buckets)
        # Arrow out: avoid pandas schema metadata in the shuffle (arrowutil)
        from ..arrowutil import strip_pd_metadata

        return strip_pd_metadata(out_df) if len(out_df) else out_df

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(keys, sort=False, dropna=False)
        cols = {out: g[out].agg(_FINAL_OP[aggs[out][1]]) for out in aggs}
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby("_bucket").map_groups(final, batch_format="pandas")
    # coalesce away schema-less empty blocks from empty hash partitions
    return out.repartition(8)

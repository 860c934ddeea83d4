"""Join operators.

The reference's joins are all small-side lookups (SURVEY §2.4: image->chunk
fuzzy join J1, img_path remap J3, graph lookups J6, anti-join on existing
keys J7).  The Ray-native equivalents:

- broadcast_join: put the small side in the object store ONCE (`ray.put`),
  merge per batch inside map_batches — no shuffle, the canonical dimension
  join.
- semi/anti join: broadcast the key set and filter per batch.

Large-large joins are expressed as hash-bucketed groupbys where needed
(see stages/merge.py backfill for the anti-join-by-groupby pattern that
avoids any driver-side key set).
"""

from __future__ import annotations

import pandas as pd
import ray


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner"):
    ref = ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def broadcast_semi_join(ds, keys, col: str, anti: bool = False):
    ref = ray.put(frozenset(keys))

    def filter_batch(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[col].isin(ray.get(ref))
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(filter_batch, batch_format="pandas")

"""Deduplication operators (exact + near-dup families).

Exact dedup mirrors the reference's content-hash anti-join on insert
(preprocessing.py:107-118, 126-150 via storage.py:223-224 filter_keys): only
the first row per content hash survives.  The reference keeps "whichever was
inserted first"; a distributed run has no insertion order, so we make the
survivor deterministic: the row with the smallest `order_by` tuple.

Scale notes: the heavy lifting is a hash shuffle on the (short) hash key, not
on the payload; each batch is pre-deduplicated locally first so the shuffle
only moves one candidate row per (key, batch) instead of every duplicate —
this is the partial-aggregation pattern for skewed duplicate clusters.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def dedup_exact(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[str],
) -> ray.data.Dataset:
    """Keep exactly one row per `key`: the one minimizing `order_by`."""

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        # mergesort = stable; pre-prune duplicates within the batch
        return batch.sort_values(order_by, kind="mergesort").drop_duplicates(
            subset=[key], keep="first"
        )

    def group_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(order_by, kind="mergesort").head(1)

    pruned = ds.map_batches(local_first, batch_format="pandas")
    return pruned.groupby(key).map_groups(group_first, batch_format="pandas")

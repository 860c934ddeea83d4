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


N_BUCKETS = 64


def dedup_exact(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[str],
    n_buckets: int = N_BUCKETS,
) -> ray.data.Dataset:
    """Keep exactly one row per `key`: the one minimizing `order_by`.

    Grouping is by hash bucket (not by raw key) so the final pass is one
    vectorized drop_duplicates per bucket instead of per-key Python overhead;
    equal keys always share a bucket, so the result is identical."""
    import zlib

    def local_first(batch: pd.DataFrame) -> pd.DataFrame:
        # mergesort = stable; pre-prune duplicates within the batch
        out = batch.sort_values(order_by, kind="mergesort").drop_duplicates(
            subset=[key], keep="first"
        )
        out = out.assign(
            _bucket=out[key].map(lambda s: zlib.crc32(str(s).encode()) % n_buckets)
        )
        return out

    def bucket_first(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.sort_values(order_by, kind="mergesort")
            .drop_duplicates(subset=[key], keep="first")
            .drop(columns=["_bucket"])
        )

    pruned = ds.map_batches(local_first, batch_format="pandas")
    out = pruned.groupby("_bucket").map_groups(bucket_first, batch_format="pandas")
    # coalesce away schema-less empty blocks from empty hash partitions
    return out.repartition(16)

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


def bucketed_join(left, right, on: str, how: str = "inner", n_buckets: int = 64):
    """Hash-partitioned join of two Datasets on one key column — the
    portable large-large join: both sides get bucket = crc32(key) % B, the
    union is grouped by bucket, and matching buckets merge pairwise inside
    map_groups (ray_guide pattern). Columns other than `on` must be disjoint.
    `how` supports inner/left (left = preserve left rows)."""
    import zlib

    import pandas as pd

    from ..arrowutil import dataset_arrow_types, df_to_table_aligned

    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    overlap = (set(left_cols) & set(right_cols)) - {on}
    if overlap:
        raise ValueError(f"bucketed_join column overlap: {overlap}")

    # one unified Arrow schema for BOTH tagged sides: each side's missing
    # columns ride as typed nulls, so the shuffle sees a single metadata-free
    # schema (no pandas-metadata hash failures, no per-block schema unify)
    types = {**dataset_arrow_types(left), **dataset_arrow_types(right)}
    import pyarrow as pa

    types["_side"], types["_jbucket"] = pa.string(), pa.int32()
    all_cols = left_cols + [c for c in right_cols if c != on] + ["_side", "_jbucket"]

    def tag(side):
        def fn(batch: pd.DataFrame):
            out = batch.copy()
            out["_side"] = side
            out["_jbucket"] = (
                out[on].map(lambda s: zlib.crc32(str(s).encode()) % n_buckets).astype("int32")
                if len(out)
                else pd.Series(dtype="int32")
            )
            return df_to_table_aligned(out, all_cols, types)

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )

    out_cols = left_cols + [c for c in right_cols if c != on]

    def join_bucket(bucket: "pa.Table") -> "pa.Table":
        # Arrow-native join: integer key columns keep int64-with-nulls
        # semantics (a pandas merge would upcast nullable ints to float,
        # corrupting downstream key hashing/rejoining)
        import pyarrow.compute as pc

        side = bucket.column("_side")
        l = bucket.filter(pc.equal(side, "l")).select(left_cols)
        r = bucket.filter(pc.equal(side, "r")).select(right_cols)
        joined = l.join(
            r, keys=on, join_type="inner" if how == "inner" else "left outer"
        )
        return joined.select(out_cols)

    return (
        both.groupby("_jbucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .repartition(16)
    )


def broadcast_semi_join(ds, keys, col: str, anti: bool = False):
    ref = ray.put(frozenset(keys))

    def filter_batch(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[col].isin(ray.get(ref))
        return batch[~mask] if anti else batch[mask]

    return ds.map_batches(filter_batch, batch_format="pandas")

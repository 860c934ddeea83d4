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

from ..hashing import bucket_any


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner"):
    ref = ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def bucketed_join(
    left,
    right,
    on: str,
    how: str = "inner",
    n_buckets: int = 64,
    small_side: str | None = None,
):
    """Hash-partitioned join of two Datasets on one key column — the
    portable large-large join: both sides get bucket = crc32(key) % B, the
    union is grouped by bucket, and matching buckets merge pairwise inside
    map_groups (ray_guide pattern). Columns other than `on` must be disjoint.
    `how` supports inner/left/outer (left = preserve left rows; outer =
    full outer, key column coalesced across sides).

    `small_side` ('left'/'right') is the caller's claim that one side is a
    dimension table: if its row count is within `RAYKG_JOIN_BROADCAST_MAX`,
    it is collected once, `ray.put`, and the join runs as a broadcast hash
    join per batch of the big side — no shuffle (the classic small-side
    plan every engine picks).  The claim is only a hint: above the cap the
    bucketed shuffle computes the identical result.  `small_side='left'`
    requires how='inner' (a broadcast left side cannot preserve left rows);
    callers should pass a materialized or cheap-to-count small side."""
    import os
    import zlib

    import pandas as pd
    import pyarrow as pa

    from ..arrowutil import dataset_arrow_types, df_to_table_aligned

    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    overlap = (set(left_cols) & set(right_cols)) - {on}
    if overlap:
        raise ValueError(f"bucketed_join column overlap: {overlap}")

    _ARROW_HOW = {"inner": "inner", "left": "left outer", "outer": "full outer"}
    if how not in _ARROW_HOW:
        raise ValueError(f"unsupported how={how!r}")
    out_cols_b = left_cols + [c for c in right_cols if c != on]
    if small_side == "left" and how != "inner":
        small_side = None
    if how == "outer":
        # a broadcast side cannot contribute its unmatched rows exactly once
        small_side = None
    if small_side is not None:
        cap = int(os.environ.get("RAYKG_JOIN_BROADCAST_MAX", "500000"))
        # materialize ONCE: count() and the broadcast collection would
        # otherwise each re-execute the dimension's read+map pipeline
        # (measured ~0.5-1 s per extra execution on the TPC-H q5/q10
        # dimension attaches); the bucketed path below reuses the same
        # materialized blocks
        small = (left if small_side == "left" else right).materialize()
        if small_side == "left":
            left = small
        else:
            right = small
        if small.count() <= cap:
            from ..arrowutil import df_to_table

            small_cols = left_cols if small_side == "left" else right_cols
            # blocks may be pandas or arrow depending on upstream stages
            blocks = [ray.get(r) for r in small.to_arrow_refs()]
            tbls = [
                (df_to_table(b) if isinstance(b, pd.DataFrame) else b)
                .replace_schema_metadata(None)
                for b in blocks
            ]
            tbls = [t for t in tbls if t.num_rows]
            if tbls:
                small_tbl = pa.concat_tables(tbls, promote_options="default").combine_chunks()
            else:
                types = dataset_arrow_types(small)
                small_tbl = pa.schema(
                    [(c, types[c]) for c in small_cols]
                ).empty_table()
            ref = ray.put(small_tbl)
            big = right if small_side == "left" else left

            def bj(batch: pa.Table) -> pa.Table:
                s = ray.get(ref)
                batch = batch.replace_schema_metadata(None)
                if small_side == "left":
                    joined = s.select(left_cols).join(
                        batch.select(right_cols), keys=on, join_type="inner"
                    )
                else:
                    joined = batch.select(left_cols).join(
                        s.select(right_cols), keys=on, join_type=_ARROW_HOW[how]
                    )
                return joined.select(out_cols_b)

            return big.map_batches(bj, batch_format="pyarrow")

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
                pd.Series(bucket_any(out[on], n_buckets), index=out.index)
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

        def typed(tbl: "pa.Table", cols) -> "pa.Table":
            # Ray's hash shuffle aggregates via pandas: the other side's
            # typed-null int64 columns become NaN doubles, and a bucket
            # holding ONLY one side degrades the absent side's columns to
            # Arrow `null` type, which pa.Table.join rejects.  After the
            # side filter every remaining value is the side's own (no
            # NaNs), so casting back to the DECLARED input types is always
            # safe — and keeps the join output schema stable (int64 ids
            # stay int64, so downstream crc32(str(key)) bucketing agrees).
            want = pa.schema([pa.field(c, types[c]) for c in cols])
            return tbl if tbl.schema == want else tbl.cast(want)

        side = bucket.column("_side")
        l = typed(bucket.filter(pc.equal(side, "l")).select(left_cols), left_cols)
        r = typed(bucket.filter(pc.equal(side, "r")).select(right_cols), right_cols)
        joined = l.join(r, keys=on, join_type=_ARROW_HOW[how])
        return joined.select(out_cols)

    from ..arrowutil import compact_blocks

    return compact_blocks(
        both.groupby("_jbucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def attach_dim(fact, dim, on: str, rename: dict | None = None,
               project: list | None = None, how: str = "inner"):
    """Attach dimension columns to a fact Dataset through the capped dual
    plan — the ONLY sanctioned way to consume a growing dimension table
    (customer/supplier/part scale linearly with SF; an unconditional
    .to_pandas()/dict broadcast is a multi-GB driver pull at 100x):
    `bucketed_join(small_side='right')` broadcasts the dimension once via
    ray.put under RAYKG_JOIN_BROADCAST_MAX and runs a map-side Arrow hash
    join (no shuffle, the dict-stamp equivalent); above the cap it is the
    bucketed shuffle with no driver state.  ``rename`` maps dimension
    column names onto the fact's key/attr names; ``project`` trims the
    output columns.  A key-only renamed dimension makes this a semi-join
    (keys unique -> no row duplication)."""
    from ..arrowutil import strip_pd_metadata

    if rename:
        dim = dim.map_batches(
            lambda b: strip_pd_metadata(b.rename(columns=rename))
            if len(b) else b.rename(columns=rename),
            batch_format="pandas",
        )
    out = bucketed_join(fact, dim, on=on, how=how, small_side="right")
    if project:
        out = out.map_batches(
            lambda b: strip_pd_metadata(b[project]) if len(b)
            else b[project],
            batch_format="pandas",
        )
    return out


def broadcast_semi_join(ds, keys, col: str, anti: bool = False):
    ref = ray.put(frozenset(keys))

    def filter_batch(batch: pd.DataFrame):
        # typed-Arrow output: raw pandas slices with string columns trip
        # Ray's size estimator whenever a batch filters to empty
        from ..arrowutil import df_to_table

        mask = batch[col].isin(ray.get(ref))
        return df_to_table(batch[~mask] if anti else batch[mask])

    return ds.map_batches(filter_batch, batch_format="pandas")


def table_diff(
    left,
    right,
    key_col: str,
    compare_cols: list[str],
    n_buckets: int = 64,
):
    """CDC / anti-entropy diff of two table versions by primary key — the
    migration-audit primitive next to sketch.table_checksum (checksum says
    WHETHER tables diverged; this says WHERE): classify every key as
    'added' (right only), 'removed' (left only), 'changed' (both sides,
    different compare_cols payload) or 'same'.

    -> Dataset(key_col, status).  Payload never shuffles: each side
    reduces to (key, md5(payload)) rows first, so the diff moves two
    fixed-width rows per key no matter how wide the tables are; then one
    bucketed FULL OUTER join + a vectorized status classify."""
    import hashlib

    def hash_side(tag: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[[key_col]].copy()
            payload = batch[compare_cols[0]].astype(str)
            for c in compare_cols[1:]:
                payload = payload + "\x1f" + batch[c].astype(str)
            out["h_" + tag] = payload.map(
                lambda s: hashlib.md5(s.encode()).hexdigest()
            )
            return out

        return fn

    lh = left.map_batches(hash_side("l"), batch_format="pandas")
    rh = right.map_batches(hash_side("r"), batch_format="pandas")
    joined = bucketed_join(lh, rh, on=key_col, how="outer",
                           n_buckets=n_buckets)

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        out = batch[[key_col]].copy()
        l_null = batch["h_l"].isna()
        r_null = batch["h_r"].isna()
        status = np.where(
            l_null, "added",
            np.where(
                r_null, "removed",
                np.where(batch["h_l"] == batch["h_r"], "same", "changed"),
            ),
        )
        out["status"] = pd.Series(status, index=batch.index, dtype=object)
        return out

    return joined.map_batches(classify, batch_format="pandas")


def salted_join(
    left,
    right,
    on: str,
    salt: int = 8,
    n_buckets: int = 64,
):
    """Skew-mitigating INNER join — the classic hot-key fix at shuffle
    scale: a key with millions of left rows would land every row in ONE
    reduce bucket of `bucketed_join`; here the small/dimension RIGHT side
    is replicated `salt` times and each left row picks one replica, so a
    hot key's rows spread over `salt` buckets and per-task memory is
    bounded by (largest key / salt).  Output rows are identical to the
    unsalted join for ANY salt assignment (each left row still meets
    every right match exactly once), pinned by tests.

    Cost model: right side ships `salt` copies — use for (big skewed) ⋈
    (small dimension); for small right sides under the broadcast cap
    prefer `bucketed_join(small_side='right')`, which shuffles nothing.
    """
    import numpy as np

    sep = "\x1f"

    def salt_left(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_sk"] = (
            batch[on].astype(str)
            + sep
            + pd.Series(np.arange(len(batch)) % salt, index=batch.index).astype(str)
        )
        return out

    def replicate_right(batch: pd.DataFrame) -> pd.DataFrame:
        reps = []
        for s in range(salt):
            r = batch.drop(columns=[on]).copy()
            r["_sk"] = batch[on].astype(str) + sep + str(s)
            reps.append(r)
        return pd.concat(reps, ignore_index=True)

    joined = bucketed_join(
        left.map_batches(salt_left, batch_format="pandas"),
        right.map_batches(replicate_right, batch_format="pandas"),
        on="_sk",
        n_buckets=n_buckets,
    )
    return joined.map_batches(
        lambda b: b.drop(columns=["_sk"]), batch_format="pandas"
    )


def join_size_estimate(left, right, left_key: str, right_key: str,
                       n_buckets: int = 64):
    """EXACT inner-join cardinality WITHOUT executing the join — the
    planning pass a 100-TB engine runs before committing to a shuffle
    strategy (pick broadcast vs bucketed vs salted by the real output
    size and the hottest key's contribution).

    Both sides reduce to (key, count) via the combiner groupby — the only
    thing shuffled is one row per distinct key per side; the estimate is
    sum(count_l * count_r) over matching keys plus the max single-key
    product (the skew indicator salting decisions read).

    -> 1-row Dataset(join_rows, n_keys_common, max_key_rows)."""
    import pandas as pd

    from .groupagg import bucketed_groupby_agg

    lc = bucketed_groupby_agg(
        left.map_batches(
            lambda b, k=left_key: b[[k]].rename(columns={k: "key"}),
            batch_format="pandas",
        ),
        keys=["key"],
        aggs={"nl": (None, "count")},
        n_buckets=n_buckets,
    )
    rc = bucketed_groupby_agg(
        right.map_batches(
            lambda b, k=right_key: b[[k]].rename(columns={k: "key"}),
            batch_format="pandas",
        ),
        keys=["key"],
        aggs={"nr": (None, "count")},
        n_buckets=n_buckets,
    )
    pairs = bucketed_join(lc, rc, on="key", n_buckets=n_buckets)

    def reduce_batch(b: pd.DataFrame) -> pd.DataFrame:
        prod = (b["nl"] * b["nr"]).astype("int64")
        return pd.DataFrame(
            {
                "join_rows": [int(prod.sum())],
                "n_keys_common": [len(b)],
                "max_key_rows": [int(prod.max()) if len(b) else 0],
            }
        )

    partial = pairs.map_batches(reduce_batch, batch_format="pandas").to_pandas()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "join_rows": pd.Series([int(partial["join_rows"].sum())], dtype="int64"),
                "n_keys_common": pd.Series([int(partial["n_keys_common"].sum())], dtype="int64"),
                "max_key_rows": pd.Series([int(partial["max_key_rows"].max()) if len(partial) else 0], dtype="int64"),
            }
        )
    )


def cdc_apply(
    base,
    changes,
    key_col: str,
    payload_cols: list[str],
    n_buckets: int = 64,
):
    """MERGE INTO — apply a CDC change set onto a base table by primary
    key (the replication/upsert primitive that closes the loop with
    :func:`table_diff`): ``changes`` carries (key_col, op, payload...)
    with op in {'upsert', 'delete'}; the result is every base row whose
    key has NO change, plus the payload of every 'upsert' row (which both
    updates existing keys and inserts new ones); 'delete' keys vanish.

    Scale shape: the base side never moves its payload twice — ONE
    bucketed LEFT join of base against the (key, op) columns of the
    change set classifies survivors, and the upsert payload unions in as
    already-final rows.  A key may appear at most once in ``changes``
    (standard CDC compaction contract; enforced upstream).

    -> Dataset(key_col, payload_cols...) of the merged table."""
    from ..arrowutil import strip_pd_metadata

    cols = [key_col] + list(payload_cols)

    ops = changes.map_batches(
        lambda b: strip_pd_metadata(b[[key_col, "op"]]) if len(b)
        else b[[key_col, "op"]],
        batch_format="pandas",
    )
    joined = bucketed_join(base, ops, on=key_col, how="left",
                           n_buckets=n_buckets)
    survivors = joined.map_batches(
        lambda b: strip_pd_metadata(b[b["op"].isna()][cols]) if len(b)
        else b[cols],
        batch_format="pandas",
    )
    upserts = changes.map_batches(
        lambda b: strip_pd_metadata(b[b["op"] == "upsert"][cols]) if len(b)
        else b[cols],
        batch_format="pandas",
    )
    return survivors.union(upserts)

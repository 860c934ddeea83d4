"""Temporal joins and windowed aggregates — the custom-operator family a
large-scale training-data pipeline needs beyond plain groupbys (SURVEY
§2.10 scopes streaming semantics out of the reference; these are the batch
re-expressions Ray Data lacks natively):

- ``asof_join``      — per-key "latest right row at or before the left
                       timestamp" (pandas ``merge_asof`` inside a hash
                       bucket; the classic event→dimension-history join).
- ``range_join``     — per-key interval join: left points matched to right
                       [lo, hi) intervals sharing an equality key.
- ``grouped_topk``   — top-k rows per key with a per-batch combiner so only
                       k rows per key per batch ride the shuffle.
- ``running_agg``    — per-key cumulative count/max/sum in event order
                       (window frame ROWS UNBOUNDED PRECEDING).
- ``group_quantiles``— exact discrete (type-1) quantiles per key,
                       DuckDB ``quantile_disc`` semantics.

Partitioning contract (shared with stages/merge.py, stages/join.py): every
operator shuffles ONCE on ``crc32(key) % n_buckets``; all per-key state
lives inside one reduce bucket, so skewed keys bound per-task memory by the
largest single key, not the table.  For ``grouped_topk`` the combiner also
bounds what the shuffle carries.  ``running_agg`` / ``group_quantiles``
assume one key's rows fit a worker (true for per-user/per-segment state;
the 100-TB fallback is a distributed sort + rank-select, documented in
BASELINE.md engineering notes).
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from ..hashing import bucket_any

N_BUCKETS = 64


def _bucket_of(series: pd.Series, n_buckets: int) -> pd.Series:
    if len(series) == 0:
        return pd.Series(dtype="int32")
    return pd.Series(bucket_any(series, n_buckets), index=series.index)


def _tagged_union(left, right, on: str, n_buckets: int):
    """Union the two sides under ONE metadata-free Arrow schema (each side's
    missing columns ride as typed nulls) so the hash shuffle sees a single
    hashable schema — same pattern as stages/join.bucketed_join."""
    import pyarrow as pa

    from ..arrowutil import dataset_arrow_types, df_to_table_aligned

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    overlap = (set(left_cols) & set(right_cols)) - {on}
    if overlap:
        raise ValueError(f"column overlap outside the key: {overlap}")
    types = {**dataset_arrow_types(left), **dataset_arrow_types(right)}
    types["_side"], types["_wbucket"] = pa.string(), pa.int32()
    all_cols = left_cols + [c for c in right_cols if c != on] + ["_side", "_wbucket"]

    def tag(side):
        def fn(batch: pd.DataFrame):
            out = batch.copy()
            out["_side"] = side
            out["_wbucket"] = _bucket_of(out[on], n_buckets)
            return df_to_table_aligned(out, all_cols, types)

        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas")
    )
    return both, left_cols, right_cols


def asof_join(
    left,
    right,
    on: str,
    left_ts: str,
    right_ts: str,
    n_buckets: int = N_BUCKETS,
    small_right: bool = False,
):
    """Left as-of join: each left row picks the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same ``on`` key (DuckDB
    ``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``); left rows with no
    match keep nulls.  Right-side (key, ts) pairs must be unique — callers
    pre-aggregate the right side to make the pick deterministic.

    Shape: ONE hash shuffle on the key; ``pd.merge_asof`` (a sorted merge,
    O(n log n) per bucket) does the per-key backward search inside the
    bucket.  Nothing is driver-materialized and no side is broadcast, so
    both sides may be arbitrarily large.

    ``small_right=True`` is the caller's claim that the right side is a
    dimension-history table: if its row count is within
    ``RAYKG_JOIN_BROADCAST_MAX`` it is collected once, sorted, ``ray.put``,
    and each left batch merge_asofs against it locally — NO shuffle, the
    classic broadcast plan (identical result; falls back to the shuffle
    above the cap)."""
    import pyarrow as pa

    from ..arrowutil import dataset_arrow_types

    right_int_cols_all = [
        c
        for c, t in dataset_arrow_types(right).items()
        if c != on and pa.types.is_integer(t)
    ]
    if small_right:
        import os

        import ray

        cap = int(os.environ.get("RAYKG_JOIN_BROADCAST_MAX", "500000"))
        right = right.materialize()
        if right.count() <= cap:
            left_cols_b = list(left.schema().names)
            right_cols_b = list(right.schema().names)
            overlap = (set(left_cols_b) & set(right_cols_b)) - {on}
            if overlap:
                raise ValueError(f"column overlap outside the key: {overlap}")
            out_cols_b = left_cols_b + [c for c in right_cols_b if c != on]
            r_sorted = right.to_pandas().sort_values(right_ts, kind="mergesort")
            ref = ray.put(r_sorted)

            def bj(batch: pd.DataFrame) -> pd.DataFrame:
                # merge_asof handles an empty batch and keeps the broadcast
                # side's dtypes, so empty blocks share the non-empty schema
                out = pd.merge_asof(
                    batch.sort_values(left_ts, kind="mergesort"),
                    ray.get(ref),
                    left_on=left_ts,
                    right_on=right_ts,
                    by=on,
                    direction="backward",
                )[out_cols_b]
                for c in right_int_cols_all:
                    out[c] = out[c].astype("Int64")
                return out

            return left.map_batches(bj, batch_format="pandas")

    both, left_cols, right_cols = _tagged_union(left, right, on, n_buckets)
    out_cols = left_cols + [c for c in right_cols if c != on]
    right_int_cols = right_int_cols_all

    def join_bucket(bucket: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        # split sides in Arrow BEFORE to_pandas: each side's own columns are
        # null-free there, so ints stay int64 instead of NaN-floating
        side = bucket.column("_side")
        l = bucket.filter(pc.equal(side, "l")).select(left_cols).to_pandas()
        r = bucket.filter(pc.equal(side, "r")).select(right_cols).to_pandas()
        # merge_asof handles empty sides and keeps both frames' dtypes, so
        # every block (incl. all-right buckets) shares one schema
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, by=on, direction="backward"
        )[out_cols]
        # unmatched right ints NaN-float under pandas; pin them to nullable
        # Int64 so every output block shares one schema
        for c in right_int_cols:
            out[c] = out[c].astype("Int64")
        return out

    return (
        both.groupby("_wbucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .repartition(8)
    )


def range_join(
    left,
    right,
    on: str,
    left_point: str,
    right_lo: str,
    right_hi: str,
    n_buckets: int = N_BUCKETS,
):
    """Inner interval join: pairs (left, right) sharing the equality key
    ``on`` with ``right_lo <= left_point < right_hi`` (half-open, the usual
    window convention).  The equality key does the partitioning — the range
    predicate only filters within a key — so this is ONE hash shuffle;
    the pre-mask intermediate is a per-key equality join, so the bucket task
    processes the LEFT side in fixed-size chunks: peak memory is chunk_rows
    x the hottest key's interval count — bounded even when one key dominates
    both sides (the output itself still pays the true match fanout, as any
    range join must)."""
    import pyarrow as pa

    both, left_cols, right_cols = _tagged_union(left, right, on, n_buckets)
    out_cols = left_cols + [c for c in right_cols if c != on]
    chunk_rows = 8192

    def join_bucket(bucket: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        side = bucket.column("_side")
        l = bucket.filter(pc.equal(side, "l")).select(left_cols).to_pandas()
        r = bucket.filter(pc.equal(side, "r")).select(right_cols).to_pandas()
        if len(l) == 0 or len(r) == 0:
            return l.merge(r, on=on, how="inner").reindex(columns=out_cols)
        outs = []
        for i in range(0, len(l), chunk_rows):
            merged = l.iloc[i : i + chunk_rows].merge(r, on=on, how="inner")
            mask = (merged[left_point] >= merged[right_lo]) & (
                merged[left_point] < merged[right_hi]
            )
            outs.append(merged[mask][out_cols])
        return pd.concat(outs, ignore_index=True)

    return (
        both.groupby("_wbucket")
        .map_groups(join_bucket, batch_format="pyarrow")
        .repartition(8)
    )


def grouped_topk(
    ds,
    keys: list[str],
    order_col: str,
    k: int,
    tie_cols: list[str] | None = None,
    descending: bool = True,
    n_buckets: int = N_BUCKETS,
):
    """Top-k rows per key group, ranked by ``order_col`` (desc by default)
    with deterministic ``tie_cols`` (asc) tie-break; emits a 1-based
    ``rank`` column.  Per-batch combiner first: each input batch keeps at
    most k rows per key, so the shuffle carries O(k · keys-per-batch) rows
    — the same partial/final split as stages/groupagg.py."""
    tie_cols = tie_cols or []
    sort_cols = [order_col] + tie_cols
    ascending = [not descending] + [True] * len(tie_cols)

    def topk_frame(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        from .groupagg import key_bucket

        out = topk_frame(batch).copy()
        # empty batches still carry the _bucket column so every block
        # entering the shuffle shares one schema
        out["_bucket"] = key_bucket(out, keys, n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        out = topk_frame(bucket.drop(columns=["_bucket"]))
        out = out.copy()
        out["rank"] = out.groupby(keys, sort=False, dropna=False).cumcount() + 1
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
        .repartition(8)
    )


def running_agg(
    ds,
    key: str,
    order_cols: list[str],
    value_col: str,
    n_buckets: int = N_BUCKETS,
):
    """Per-key running aggregates in event order (SQL frame ``PARTITION BY
    key ORDER BY order_cols ROWS UNBOUNDED PRECEDING``): cumulative row
    count ``n_so_far``, running ``min_so_far``/``max_so_far`` and running
    ``sum_so_far`` of ``value_col``.  count/min/max are float-exact across
    engines; the running sum adds left-to-right (numpy cumsum), which a SQL
    engine's segment-tree window may associate differently in the last
    ulps — callers needing cross-engine bit-equality should compare the
    exact columns only.  One hash shuffle on the key; ``order_cols`` must
    make the order total (include a unique id to break timestamp ties)."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return bucket.assign(
                n_so_far=pd.Series(dtype="int64"),
                min_so_far=pd.Series(dtype="float64"),
                max_so_far=pd.Series(dtype="float64"),
                sum_so_far=pd.Series(dtype="float64"),
            ).drop(columns=["_wbucket"], errors="ignore")
        b = bucket.sort_values([key] + order_cols, kind="mergesort")
        g = b.groupby(key, sort=False)
        b = b.assign(
            n_so_far=(g.cumcount() + 1).astype("int64"),
            min_so_far=g[value_col].cummin(),
            max_so_far=g[value_col].cummax(),
            sum_so_far=g[value_col].cumsum(),
        )
        return b.drop(columns=["_wbucket"])

    def add_bucket(batch: pd.DataFrame):
        from ..arrowutil import strip_pd_metadata

        out = batch.copy()
        out["_wbucket"] = _bucket_of(out[key], n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_wbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


def sliding_window_expand(
    ds,
    ts_col: str,
    window: "pd.Timedelta",
    hop: "pd.Timedelta",
    out_col: str = "win_start",
):
    """Expand each row into the hopping windows containing it: windows of
    length ``window`` starting every ``hop`` (epoch-aligned).  A row at time
    t joins the window/hop windows with start in (t - window, t]; emits one
    copy per window with ``out_col`` = window start.  Pure per-batch
    replication (vectorized tile/repeat) — the downstream aggregate is a
    normal keyed groupby, so the shuffle carries window/hop copies (bounded
    fanout, the standard hopping-window trade)."""
    k = int(window // hop)
    if window % hop:
        raise ValueError("window must be a multiple of hop")

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.copy()
            # match the non-empty branch's unit (input-native, e.g. ns vs us)
            out[out_col] = pd.Series(dtype=batch[ts_col].dtype)
            return out
        base = batch[ts_col].dt.floor(hop)
        reps = pd.concat([batch] * k, ignore_index=True)
        offsets = np.repeat(np.arange(k), len(batch))
        reps[out_col] = pd.concat([base] * k, ignore_index=True) - pd.to_timedelta(
            offsets * hop
        )
        return reps

    return ds.map_batches(expand, batch_format="pandas")


def group_quantiles(
    ds,
    keys: list[str],
    value_col: str,
    qs: list[float],
    n_buckets: int = N_BUCKETS,
):
    """Exact discrete quantiles per key: the type-1 selection
    ``sorted_values[ceil(q·n) - 1]`` — DuckDB ``quantile_disc`` semantics,
    so the value is always an actual element (float-exact across engines).
    Output: keys..., one ``p<q>`` column per requested quantile, plus
    ``n_rows``.  One hash shuffle; assumes one key's values fit a worker
    (exact quantiles are a per-key sort — the scale fallback for huge
    single keys is a distributed sort + rank select)."""

    def add_bucket(batch: pd.DataFrame):
        from ..arrowutil import strip_pd_metadata

        from .groupagg import key_bucket

        out = batch[keys + [value_col]].copy()
        out["_bucket"] = key_bucket(out, keys, n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    qcols = [f"p{int(round(q * 100)):02d}" for q in qs]

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in bucket.groupby(keys, sort=False, dropna=False):
            # NULL values are excluded from the selection (quantile_disc
            # semantics); n_rows still counts every row (count(*))
            vals = np.sort(g[value_col].dropna().to_numpy())
            n = len(vals)
            if n == 0:
                picks = [None] * len(qs)
            else:
                picks = [vals[min(max(int(np.ceil(q * n)) - 1, 0), n - 1)] for q in qs]
            kv = kv if isinstance(kv, tuple) else (kv,)
            rows.append((*kv, *picks, len(g)))
        return pd.DataFrame(rows, columns=keys + qcols + ["n_rows"])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


def window_dedup(
    ds,
    keys: list[str],
    ts_col: str,
    id_col: str,
    window_us: int,
    n_buckets: int = N_BUCKETS,
):
    """Windowed event deduplication — the streaming-hygiene pass that
    collapses at-least-once duplicate deliveries: within each
    (keys, tumbling window of ``window_us`` microseconds) group only the
    FIRST event survives (earliest ts, id asc tie-break).

    -> Dataset(keys..., w, n, first_id): one row per occupied window with
    the survivor id and the group size (n-1 = dropped duplicates).

    Scale shape: the argmin rides the standard combiner/bucketed-sum
    shuffle as a zero-padded sortable '(ts|id)' string (bytewise min ==
    (ts, id) lexicographic min, composing across batches), so per-window
    state is one string + one count regardless of duplicate volume."""
    from .groupagg import bucketed_groupby_agg

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys].copy()
        ts = batch[ts_col].astype("int64")
        out["w"] = ts // window_us
        out["_first"] = (
            ts.map("{:020d}".format)
            + "|"
            + batch[id_col].astype("int64").map("{:020d}".format)
        )
        out["n"] = np.int64(1)
        return out

    agg = bucketed_groupby_agg(
        ds.map_batches(widen, batch_format="pandas"),
        keys=keys + ["w"],
        aggs={"n": ("n", "sum"), "_first": ("_first", "min")},
        n_buckets=n_buckets,
    )

    def decode(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys + ["w", "n"]].copy()
        out["first_id"] = (
            batch["_first"].str.split("|").str[1].astype("int64")
        )
        return out

    return agg.map_batches(decode, batch_format="pandas")


def grouped_sequence_ngrams(
    ds,
    keys: list[str],
    order_cols: list[str],
    val_col: str,
    n: int = 3,
    k: int = 20,
    sep: str = ">",
    n_buckets: int = N_BUCKETS,
):
    """Per-key ordered sequence n-grams, counted corpus-wide — clickstream
    path mining ("which signup>view>purchase chains dominate"): within
    each key group (a user), order rows by ``order_cols`` and emit every
    run of ``n`` consecutive ``val_col`` values as one joined n-gram.

    -> Dataset(ngram, n, rank): global top-k by (count desc, ngram asc).

    Scale shape: ONE hash shuffle on the key (all of a user's rows land in
    one bucket — per-task memory is bounded by the largest single key's
    history, the same contract as running_agg); inside the bucket the
    n-gram build is a vectorized shift-and-mask, and what leaves the
    bucket is a combiner count table (distinct n-grams, not occurrences),
    reduced by the standard bucketed sum + combiner top-k."""
    from .groupagg import bucketed_groupby_agg

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        key = batch[keys[0]].astype(str)
        for c in keys[1:]:
            key = key + "\x1f" + batch[c].astype(str)
        out = batch.assign(_sbucket=_bucket_of(key, n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values(keys + order_cols, kind="mergesort")
        vals = b[val_col].astype(str).to_numpy()
        key = b[keys[0]].astype(str)
        for c in keys[1:]:
            key = key + "\x1f" + b[c].astype(str)
        karr = key.to_numpy()
        if len(b) < n:
            return pd.DataFrame({"ngram": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        grams = vals[: len(vals) - n + 1].copy()
        ok = np.ones(len(grams), dtype=bool)
        for j in range(1, n):
            grams = np.char.add(
                np.char.add(grams.astype(str), sep),
                vals[j : len(vals) - n + 1 + j].astype(str),
            )
            ok &= karr[: len(karr) - n + 1] == karr[j : len(karr) - n + 1 + j]
        g = pd.Series(grams[ok])
        counts = g.value_counts()
        return pd.DataFrame(
            {"ngram": counts.index.to_numpy(dtype=object),
             "n": counts.to_numpy(dtype="int64")}
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    sums = bucketed_groupby_agg(
        parts, keys=["ngram"], aggs={"n": ("n", "sum")}
    ).map_batches(lambda b: b.assign(_g=np.int64(0)), batch_format="pandas")
    top = grouped_topk(sums, keys=["_g"], order_col="n", k=k,
                       tie_cols=["ngram"])
    return top.map_batches(
        lambda b: b[["ngram", "n", "rank"]], batch_format="pandas"
    )


def grouped_gap_stats(
    ds,
    keys: list[str],
    ts_col: str,
    id_col: str,
    n_buckets: int = N_BUCKETS,
):
    """Per-key inter-event gap statistics — the cadence/anomaly profile
    behind bot detection and session tuning: order each key's events by
    (ts, id), take consecutive timestamp deltas, reduce to
    (n_events, n_gaps, min_gap_us, max_gap_us, sum_gap_us) per key.
    Integer microseconds end to end, so the SQL mirror (lag window) is
    value-exact; mean gap = one float division away downstream.

    Keys with a single event emit n_gaps=0 and NULL gap stats.

    Shape: same ONE-shuffle contract as grouped_sequence_ngrams — a key's
    rows land in one bucket, deltas are a vectorized diff over the sorted
    bucket, and one row per key leaves it."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        key = batch[keys[0]].astype(str)
        for c in keys[1:]:
            key = key + "\x1f" + batch[c].astype(str)
        out = batch.assign(_gbucket=_bucket_of(key, n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {**{k: pd.Series(dtype=object) for k in keys},
                 "n_events": pd.Series(dtype="int64"),
                 "n_gaps": pd.Series(dtype="int64"),
                 "min_gap_us": pd.Series(dtype="Int64"),
                 "max_gap_us": pd.Series(dtype="Int64"),
                 "sum_gap_us": pd.Series(dtype="Int64")}
            )
        b = bucket.sort_values(keys + [ts_col, id_col], kind="mergesort")
        ts = b[ts_col].astype("int64").to_numpy()
        key = b[keys[0]].astype(str)
        for c in keys[1:]:
            key = key + "\x1f" + b[c].astype(str)
        karr = key.to_numpy()
        same = np.concatenate([[False], karr[1:] == karr[:-1]])
        gap = np.diff(ts, prepend=ts[:1])  # gap[i] = ts[i] - ts[i-1]
        gaps = pd.DataFrame(
            {"_k": karr[same], "gap": gap[same].astype("int64")}
        )
        per_key = b.groupby(keys, sort=False).size().rename("n_events")
        g = gaps.groupby("_k")["gap"]
        stats = pd.DataFrame(
            {"n_gaps": g.size(), "min_gap_us": g.min(),
             "max_gap_us": g.max(), "sum_gap_us": g.sum()}
        )
        out = per_key.reset_index()
        kser = out[keys[0]].astype(str)
        for c in keys[1:]:
            kser = kser + "\x1f" + out[c].astype(str)
        out = out.join(stats.reindex(kser.to_numpy()).reset_index(drop=True))
        out["n_gaps"] = out["n_gaps"].fillna(0).astype("int64")
        for c in ("min_gap_us", "max_gap_us", "sum_gap_us"):
            col = out[c].astype("Int64")
            # plain int64 when the bucket has no single-event keys, so the
            # output dtype matches the SQL mirror; Int64 only carries NULLs
            out[c] = col.astype("int64") if not col.isna().any() else col
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_gbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


def scd2_intervals(
    ds,
    key: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    n_buckets: int = N_BUCKETS,
):
    """Slowly-changing-dimension TYPE-2 history build from a changelog —
    the warehouse-side operator every CDC ingest needs: per key ordered by
    (ts, id), rows whose ``value_col`` equals the previous row's value are
    no-op updates and are dropped; each surviving change opens a version
    interval ``[valid_from, valid_to)`` with ``valid_to`` = the next
    change's timestamp (NULL = the currently-open version) and a 1-based
    ``version`` counter.  SQL mirror: lag() to flag changes, lead() +
    row_number() over the change rows.

    -> Dataset(key, value_col, valid_from, valid_to, version, is_current);
    ``valid_to`` is nullable, all other columns non-null.

    Shape: the module's ONE-shuffle grouped-window contract — a key's rows
    land in one crc32 bucket, change detection and interval stitching are
    vectorized shifts over the sorted bucket, and only change rows (a
    fraction bounded by the key's true update rate, not its event rate)
    survive to the output."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = batch[[key, ts_col, id_col, value_col]].copy()
        out["_sbucket"] = _bucket_of(out[key], n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {key: pd.Series(dtype="int64"),
                 value_col: pd.Series(dtype=object),
                 "valid_from": pd.Series(dtype="datetime64[us]"),
                 "valid_to": pd.Series(dtype="datetime64[us]"),
                 "version": pd.Series(dtype="int64"),
                 "is_current": pd.Series(dtype="int64")}
            )
        b = bucket.sort_values([key, ts_col, id_col], kind="mergesort")
        karr = b[key].to_numpy()
        same_key = np.concatenate([[False], karr[1:] == karr[:-1]])
        varr = b[value_col].to_numpy()
        same_val = np.concatenate([[False], varr[1:] == varr[:-1]])
        ch = b[~(same_key & same_val)]  # key's first row, or value changed
        g = ch.groupby(key, sort=False)
        out = pd.DataFrame({
            key: ch[key].to_numpy(),
            value_col: ch[value_col].to_numpy(),
            "valid_from": ch[ts_col].to_numpy(),
            "valid_to": g[ts_col].shift(-1).to_numpy(),
            "version": (g.cumcount() + 1).astype("int64").to_numpy(),
        })
        out["is_current"] = out["valid_to"].isna().astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


def lateness_profile(
    ds,
    key: str,
    ts_col: str,
    arrival_col: str,
    n_buckets: int = N_BUCKETS,
):
    """Out-of-orderness / watermark-lateness profile — the diagnostic a
    streaming pipeline runs before choosing watermark delay and window
    allowed-lateness: process events in ARRIVAL order (``arrival_col``),
    track the running event-time high watermark per key, and measure how
    far behind it each event's timestamp arrives.

    -> Dataset(key, n_events, n_late, max_lateness_us, sum_lateness_us):
    late = event-time strictly below the watermark at arrival; lateness
    in exact integer microseconds (0s when a key has no late events).

    Shape: the module's ONE-shuffle grouped-window contract — per-key
    cummax over the arrival-sorted bucket, vectorized; one row per key
    leaves the reduce."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = batch[[key, ts_col, arrival_col]].copy()
        out["_lbucket"] = _bucket_of(out[key], n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {key: pd.Series(dtype="int64"),
                 "n_events": pd.Series(dtype="int64"),
                 "n_late": pd.Series(dtype="int64"),
                 "max_lateness_us": pd.Series(dtype="int64"),
                 "sum_lateness_us": pd.Series(dtype="int64")}
            )
        b = bucket.sort_values([key, arrival_col], kind="mergesort")
        # normalize to µs regardless of the input's datetime resolution
        b = b.assign(_ts_us=b[ts_col].astype("datetime64[us]").astype("int64"))
        ts = b["_ts_us"].to_numpy()
        g = b.groupby(key, sort=False)
        # watermark BEFORE each event: per-key exclusive running max
        wm = g["_ts_us"].transform(
            lambda s: s.cummax().shift(1)
        ).to_numpy()
        late = np.nan_to_num(wm - ts, nan=0.0)
        late = np.where(late > 0, late, 0).astype("int64")
        out = pd.DataFrame({key: b[key].to_numpy(), "late": late})
        gg = out.groupby(key, sort=False)["late"]
        res = pd.DataFrame({
            "n_events": gg.size().astype("int64"),
            "n_late": gg.apply(lambda s: int((s > 0).sum())).astype("int64"),
            "max_lateness_us": gg.max().astype("int64"),
            "sum_lateness_us": gg.sum().astype("int64"),
        }).reset_index()
        return res

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_lbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


def funnel_counts(events_ds, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", n_buckets: int = 64):
    """Ordered event FUNNEL — per step, how many users reached it: a user
    reaches step k when an event of type ``steps[k]`` exists STRICTLY
    after their (minimal) step-k-1 timestamp; t_k(user) = min such ts (the
    standard strict-sequence funnel, SQL-mirrorable as a chain of
    min-after-previous joins).

    Scale shape: events prune to the step types at the scan; ONE hash
    shuffle co-locates each user's step events (bucketed by user), and
    every per-bucket pass is vectorized pandas (per-step: merge previous
    step times, strict-after filter, groupby-min) — state per bucket is
    one timestamp per active user per step, never raw history; the final
    reduce sums |steps| counter rows per bucket.

    -> Dataset(step, event_type, n_users), one row per funnel step."""
    import zlib

    import pandas as pd

    from ..arrowutil import df_to_table
    from .groupagg import bucketed_groupby_agg

    step_set = frozenset(steps)

    def prune(b: pd.DataFrame):
        out = b.loc[b[type_col].isin(step_set),
                    [user_col, ts_col, type_col]]
        if len(out):
            out = out.copy()
            out["_fbucket"] = bucket_any(out[user_col], n_buckets)
        else:
            out = out.assign(_fbucket=pd.Series(dtype="int32"))
        return df_to_table(out)

    def per_bucket(g: pd.DataFrame):
        counts = []
        prev = None  # Series: user -> t_{k-1}
        for k, st in enumerate(steps):
            sel = g[g[type_col] == st]
            if prev is None:
                cur = sel.groupby(user_col, sort=False)[ts_col].min()
            else:
                # index-map, not merge: a right_index merge renames the
                # result index to user_col, making the next groupby
                # ambiguous (index level vs column label)
                prev_ts = sel[user_col].map(prev)
                m = sel[prev_ts.notna() & (sel[ts_col] > prev_ts)]
                cur = m.groupby(user_col, sort=False)[ts_col].min()
            counts.append(len(cur))
            prev = cur
        return df_to_table(pd.DataFrame({
            "step": pd.array(range(1, len(steps) + 1), dtype="int64"),
            "event_type": pd.array(list(steps), dtype=object),
            "n_users": pd.array(counts, dtype="int64"),
        }))

    partials = (
        events_ds.map_batches(prune, batch_format="pandas")
        .groupby("_fbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_groupby_agg(
        partials, keys=["step", "event_type"],
        aggs={"n_users": ("n_users", "sum")},
    )

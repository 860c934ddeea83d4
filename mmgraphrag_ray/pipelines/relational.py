"""Relational demonstration pipelines over the driver-provided TPC-H-ish
tables — the generic aggregate/join/sort/window operator surface
(SURVEY §2.5 aggregations, §2.4 joins, §2.7 sorts/limits).

Aggregate outputs deliberately use only order-insensitive exact reductions
(count, min, max, and sums of integral-valued columns) so the DuckDB oracle
hash-matches bit-for-bit regardless of distributed summation order.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data

from ..hashing import bucket_ints
from ..stages.groupagg import bucketed_groupby_agg
from ..stages.join import broadcast_join, bucketed_join


def _read(sf_dir: str, table: str, columns=None):
    from ..runtime import configure

    configure()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _sorted_small(ds, by, ascending):
    """Deterministic output order for a k-row result (ADVICE r4): pull the
    k rows to the driver, mergesort, re-wrap — a full Dataset.sort stage
    costs ~0.3 s of spin-up for the same 10-20 rows.  Only ever called on
    top-k / tie-set outputs (bounded by construction)."""
    df = ds.to_pandas().sort_values(
        by, ascending=ascending, kind="mergesort").reset_index(drop=True)
    return ray.data.from_pandas(df)


def _guard_sentinel(series, sentinel, label: str):
    """Marker-row sentinel guard (ADVICE r4): the fused single-shuffle
    plans tag the other side's rows with an in-band sentinel in a reused
    payload column — silently wrong if real data ever contains the
    sentinel value.  Called on the REAL side of each such shuffle; one
    vectorized comparison per batch."""
    if len(series) and (series == sentinel).any():
        raise ValueError(
            f"fused-plan sentinel collision: real {label} contains {sentinel!r}")


def q1_pricing(sf_dir: str):
    """TPC-H Q1 shape: groupby returnflag/linestatus with exact aggregates.
    Pre-aggregation happens inside Ray's hash-aggregate; input pruned to the
    4 needed columns at the read."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    return bucketed_groupby_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty": ("l_quantity", "sum"),
            "count_order": (None, "count"),
            "max_qty": ("l_quantity", "max"),
        },
    )


def segment_order_stats(sf_dir: str):
    """Join orders->customer via bucketed_join's capped dual plan (the
    dimension broadcasts under RAYKG_JOIN_BROADCAST_MAX — one ray.put, no
    shuffle; above the cap it shuffles, no driver pull), then exact
    per-segment aggregates."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = bucketed_join(orders, cust, on="o_custkey", small_side="right")
    return bucketed_groupby_agg(
        joined,
        keys=["c_mktsegment"],
        aggs={
            "n_orders": (None, "count"),
            "min_price": ("o_totalprice", "min"),
            "max_price": ("o_totalprice", "max"),
        },
    )


def q3_shipping(sf_dir: str, k: int = 10, cut: str = "1998-06-01"):
    """TPC-H Q3 shape — the canonical 3-table star join:
    customer(filtered segment) ⋈ orders(date filter) ⋈ lineitem(date
    filter), revenue per order, global top-k.

    Scale plan: the customer side reduces to a key-only column before
    touching the fact tables and attaches through bucketed_join's capped
    dual plan (a key-only inner join IS the semi-join since custkeys are
    unique: broadcast map-side under RAYKG_JOIN_BROADCAST_MAX, bucketed
    shuffle above — no unconditional driver pull); lineitem revenue
    is pre-aggregated to one row per order (combiner + one bucketed
    shuffle) BEFORE the orders join, so the fact⋈fact join moves one
    row per qualifying order on each side; the final ranking is a
    sort+limit over per-order aggregates only.  Revenue is exact:
    per-row floor(price·(1−discount)·100) in int64 cents — identical
    IEEE double ops on both engines, then an order-insensitive sum."""
    import numpy as np

    cut_ts = pd.Timestamp(cut)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda b: b[b["c_mktsegment"] == "BUILDING"][["c_custkey"]]
        .rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )
    orders = bucketed_join(orders, keys, on="o_custkey", small_side="right")
    orders = orders.map_batches(
        lambda b: b[b["o_orderdate"] < cut_ts][
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ].rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def rev(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] > cut_ts]
        cents = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy())
            * 100.0
        ).astype("int64")
        return pd.DataFrame(
            {"l_orderkey": b["l_orderkey"].to_numpy(), "revenue_cents": cents}
        )

    # round-4 fused tail: the per-order revenue reduce and the orders
    # join share ONE orderkey-hash-bucketed shuffle (q10/q21's fusion);
    # each bucket joins, reduces, and keeps its local top-k, so the final
    # is a one-block k-row sort

    from ..arrowutil import df_to_table

    N_B = 64

    def _okb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def li_rows(b: pd.DataFrame):
        r = rev(b)
        out = (
            r.groupby("l_orderkey", sort=False, as_index=False)
            ["revenue_cents"].sum()
        ) if len(r) else pd.DataFrame({
            "l_orderkey": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
        })
        _guard_sentinel(out["revenue_cents"], -1, "revenue_cents")
        out["o_orderdate"] = pd.NaT
        out["o_orderpriority"] = ""
        out["_qbucket"] = _okb(out["l_orderkey"])
        return df_to_table(out)

    def o_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "revenue_cents": np.int64(-1),
            "o_orderdate": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"].astype(object),
        }) if len(b) else pd.DataFrame({
            "l_orderkey": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "o_orderpriority": pd.Series(dtype=object),
        })
        out["_qbucket"] = _okb(out["l_orderkey"])
        return df_to_table(out)

    sort_cols = ["revenue_cents", "o_orderdate", "l_orderkey"]
    asc = [False, True, True]

    def topk_per_bucket(g: pd.DataFrame):
        li_sum = (
            g[g["revenue_cents"] >= 0]
            .groupby("l_orderkey", sort=False, as_index=False)
            ["revenue_cents"].sum()
        )
        od = g.loc[g["revenue_cents"] == -1,
                   ["l_orderkey", "o_orderdate", "o_orderpriority"]]
        m = li_sum.merge(od, on="l_orderkey", how="inner")
        out = m.sort_values(sort_cols, ascending=asc,
                            kind="mergesort").head(k)
        return df_to_table(out[
            ["l_orderkey", "revenue_cents", "o_orderdate",
             "o_orderpriority"]]) if len(out) else df_to_table(
            pd.DataFrame({
                "l_orderkey": pd.Series(dtype="int64"),
                "revenue_cents": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="datetime64[us]"),
                "o_orderpriority": pd.Series(dtype=object),
            }))

    def final_topk(b: pd.DataFrame):
        return df_to_table(
            b.sort_values(sort_cols, ascending=asc,
                          kind="mergesort").head(k))

    return (
        li.map_batches(li_rows, batch_format="pandas")
        .union(orders.map_batches(o_rows, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(topk_per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(final_topk, batch_format="pandas")
    )


def topk_orders(sf_dir: str, k: int = 10):
    """Global top-k by sort+limit (reference O2-O4 top-k family)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def events_window(sf_dir: str):
    """Tumbling 1-hour window per user over the events stream table:
    event-time bucketing in map_batches, then an exact groupby aggregate.
    (Ray Data has no watermarks; the window is a derived key — SURVEY §2.10.)"""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["hour"] = batch["ts"].dt.floor("h")
        return batch[["user_id", "hour", "value"]]

    return bucketed_groupby_agg(
        ev.map_batches(bucket, batch_format="pandas"),
        keys=["user_id", "hour"],
        aggs={
            "n_events": (None, "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )


def events_asof_orders(sf_dir: str):
    """As-of join (the dimension-history lookup Ray Data lacks natively):
    each event picks the user's LATEST order day at or before the event
    timestamp — ``ASOF LEFT JOIN`` in DuckDB.  The right side is first
    pre-aggregated per (custkey, orderdate) so the as-of pick is
    deterministic (no same-day ties); both sides then meet in ONE hash
    shuffle on the key (stages/window.asof_join)."""
    from ..stages.window import asof_join

    import os

    import ray.data as rd

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["o_custkey", "o_orderdate"], sort=False)
        out = pd.DataFrame(
            {
                "last_order_n": g.size().astype("int64"),
                "last_order_max_price": g["o_totalprice"].max(),
            }
        ).reset_index()
        return out.rename(
            columns={"o_custkey": "user_id", "o_orderdate": "last_order_date"}
        )

    # per-batch combiner first; the cross-batch FINAL aggregate runs
    # driver-side under the broadcast cap (the same rows asof_join's
    # broadcast plan would collect anyway), else via the groupby shuffle
    parts = orders.map_batches(day_partial, batch_format="pandas").materialize()
    cap = int(os.environ.get("RAYKG_JOIN_BROADCAST_MAX", "500000"))
    if parts.count() <= cap:
        df = parts.to_pandas()
        g = df.groupby(["user_id", "last_order_date"], sort=False)
        day = rd.from_pandas(
            pd.DataFrame(
                {
                    "last_order_n": g["last_order_n"].sum(),
                    "last_order_max_price": g["last_order_max_price"].max(),
                }
            ).reset_index()
        )
        small = True
    else:
        day = bucketed_groupby_agg(
            parts.map_batches(
                lambda b: b.rename(columns={"last_order_date": "o_orderdate"}),
                batch_format="pandas",
            ),
            keys=["user_id", "o_orderdate"],
            aggs={
                "last_order_n": ("last_order_n", "sum"),
                "last_order_max_price": ("last_order_max_price", "max"),
            },
        ).map_batches(
            lambda b: b.rename(columns={"o_orderdate": "last_order_date"}),
            batch_format="pandas",
        )
        small = False
    # broadcast asof plan under the same cap — identical result, shuffle
    # fallback above it (plan parity pinned in tests/test_window.py)
    out = asof_join(
        ev, day, on="user_id", left_ts="ts", right_ts="last_order_date",
        small_right=small,
    )

    def denullable(b: pd.DataFrame) -> pd.DataFrame:
        # left rows with no as-of match: coalesce counts/prices to 0 so the
        # column dtypes are unconditionally int64/float64 in every batch
        # (pandas nullable Int64 and DuckDB's NULL->float64 promotion would
        # otherwise disagree batch-by-batch); last_order_date stays NaT
        b = b.copy()
        b["last_order_n"] = b["last_order_n"].fillna(0).astype("int64")
        b["last_order_max_price"] = b["last_order_max_price"].fillna(0.0)
        return b

    return out.map_batches(denullable, batch_format="pandas")


def lineitem_ship_range_join(sf_dir: str, days: int = 30):
    """Interval join: lineitems that SHIPPED inside the half-open window
    [orderdate, orderdate + ``days``) of their own order — the per-key
    range join (stages/window.range_join).  The equality key (orderkey)
    partitions; the range predicate filters inside the bucket.  TPC-H ships
    1-121 days after the order, so a 30-day window keeps a real subset."""
    from ..stages.window import range_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        out = b.rename(columns={"o_orderkey": "l_orderkey"})
        out["win_end"] = out["o_orderdate"] + pd.Timedelta(days=days)
        return out

    win = orders.map_batches(widen, batch_format="pandas")
    return range_join(
        li, win, on="l_orderkey", left_point="l_shipdate",
        right_lo="o_orderdate", right_hi="win_end",
    )


def topk_orders_per_segment(sf_dir: str, k: int = 3):
    """Grouped top-k (window-rank analog): the k priciest orders per market
    segment, rank emitted.  Per-batch combiner keeps only k rows per
    segment per batch before the shuffle (stages/window.grouped_topk)."""
    from ..stages.window import grouped_topk

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = bucketed_join(orders, cust, on="o_custkey", small_side="right")
    return grouped_topk(
        joined,
        keys=["c_mktsegment"],
        order_col="o_totalprice",
        k=k,
        tie_cols=["o_orderkey"],
    )


def user_running_stats(sf_dir: str):
    """Per-user running aggregates over the event stream in (ts, event_id)
    order — the SQL window frame ROWS UNBOUNDED PRECEDING, partitioned by
    user (stages/window.running_agg).  The driver-compared columns are the
    cross-engine-exact ones (count/min/max); the running float sum is
    dropped here because SQL segment-tree windows associate additions
    differently in the last ulps (it is tested against pandas cumsum in
    tests/test_window.py instead)."""
    from ..stages.window import running_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    out = running_agg(ev, key="user_id", order_cols=["ts", "event_id"], value_col="value")
    return out.select_columns(
        ["event_id", "user_id", "ts", "value", "n_so_far", "min_so_far", "max_so_far"]
    )


def segment_price_quantiles(sf_dir: str):
    """Exact discrete price quantiles per market segment (p25/p50/p90,
    DuckDB quantile_disc semantics) — stages/window.group_quantiles."""
    from ..stages.window import group_quantiles

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = bucketed_join(
        orders, cust, on="o_custkey", small_side="right"
    ).select_columns(["c_mktsegment", "o_totalprice"])
    return group_quantiles(
        joined, keys=["c_mktsegment"], value_col="o_totalprice", qs=[0.25, 0.5, 0.9]
    )


def price_global_quantiles(sf_dir: str):
    """Exact GLOBAL price quantiles (p25/p50/p75/p99, quantile_disc
    semantics) over the full lineitem price column without a global sort —
    stages/groupagg.global_quantiles (iterative histogram refinement; the
    driver only holds bin counts, never values, until the final <=bin_cap
    candidate fetch)."""
    from ..stages.groupagg import global_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return global_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75, 0.99])


def events_sliding_window(sf_dir: str):
    """Hopping (sliding) 1-hour window with 15-minute hop per user: each
    event lands in 4 overlapping windows (stages/window.sliding_window_expand
    — vectorized per-batch replication), then one exact keyed aggregate."""
    from ..stages.window import sliding_window_expand

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    expanded = sliding_window_expand(
        ev, ts_col="ts", window=pd.Timedelta(hours=1), hop=pd.Timedelta(minutes=15)
    ).select_columns(["user_id", "win_start", "value"])
    return bucketed_groupby_agg(
        expanded,
        keys=["user_id", "win_start"],
        aggs={
            "n_events": (None, "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
    )


def events_hll_registers(sf_dir: str):
    """HyperLogLog register table for approx-distinct users per event type
    (stages/sketch.py): md5-derived hashing makes the registers — and hence
    the estimate — integer-exact and SQL-mirrorable."""
    from ..stages.sketch import hll_registers

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_registers(ev, group_col="event_type", value_col="user_id")


def doc_consistent_sample(sf_dir: str, percent: int = 10):
    """Consistent (hash-threshold) sample: keep documents whose
    md5(doc_id)-derived bucket falls below ``percent`` of 100 — the
    standard stable holdout selector (membership depends only on the key,
    so it is reproducible across runs, engines and growing corpora, unlike
    RNG sampling). Pure per-batch filter, no shuffle."""
    import hashlib

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        buckets = b["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100
        )
        return b[buckets < percent]

    return docs.map_batches(keep, batch_format="pandas")


def doc_stratified_sample(sf_dir: str, rates: dict | None = None,
                          default_percent: int = 30):
    """Stratified consistent sample: per-language sampling rates (e.g.
    downsample the dominant language, keep more of the tails — the standard
    corpus-rebalancing op for multilingual training data).  Membership is
    md5(lang:doc_id)-derived, so it is a pure function of the row key:
    stable across runs, engines, and corpus growth, and requires NO shuffle
    — one vectorizable filter pass.  Rates are percent-of-100 per lang."""
    import hashlib

    rates = rates if rates is not None else {"en": 10}
    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        buckets = [
            int(hashlib.md5(f"{lang}:{d}".encode()).hexdigest()[:8], 16) % 100
            for lang, d in zip(b["lang"], b["doc_id"])
        ]
        limits = b["lang"].map(lambda l: rates.get(l, default_percent))
        mask = pd.Series(buckets, index=b.index) < limits
        return b[mask]

    return docs.map_batches(keep, batch_format="pandas")


def events_cm_registers(sf_dir: str):
    """Count-min sketch register table over event user occurrences
    (stages/sketch.py): 4 x 256 integer counters, order-independent and
    SQL-exact; per-batch combiner bounds the shuffle at d*w rows/batch."""
    from ..stages.sketch import cm_registers

    ev = _read(sf_dir, "events", ["user_id"])
    return cm_registers(ev, key_col="user_id")


def customer_bloom_semi_events(sf_dir: str):
    """Bloom-filter semi-join (stages/sketch.py): customers whose key MIGHT
    appear as an events user — the no-shuffle join-pruning pre-filter.
    Deterministic md5 bit schedule, so the kept set (true matches + the
    filter's false positives) is exactly reproducible in SQL."""
    from ..stages.sketch import bloom_build, bloom_semi_join

    ev = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer")
    bits = bloom_build(ev, "user_id")
    return bloom_semi_join(cust, bits, "c_custkey")


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap-based): events of one user sorted by ts;
    a gap > `gap_minutes` starts a new session.  Ray shape: partition by
    user (bucketed groupby), per-user pandas sessionization inside the group
    — the ray_guide streaming-shaped pattern (ordered, partitioned log).
    Output: (user_id, session_id, n_events, first_ts, last_ts)."""

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"), "ts": pd.Series(dtype="datetime64[us]"),
                 "_bucket": pd.Series(dtype="int32")}
            )
        out = b.copy()
        out["_bucket"] = bucket_ints(out["user_id"], 64)
        return out

    def sessionize(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in bucket.groupby("user_id", sort=False):
            g = g.sort_values("ts", kind="mergesort")
            gaps = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
            session_ids = gaps.cumsum().astype("int64") + 1
            for sid, s in g.assign(sid=session_ids).groupby("sid", sort=False):
                rows.append(
                    (int(uid), int(sid), len(s), s["ts"].iloc[0], s["ts"].iloc[-1])
                )
        return pd.DataFrame(
            rows, columns=["user_id", "session_id", "n_events", "first_ts", "last_ts"]
        )

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(sessionize, batch_format="pandas")
        .repartition(8)
    )


def user_event_pivot(sf_dir: str):
    """Long -> wide crosstab: per-user event-type counts as columns
    (stages/reshape.pivot_counts — indicator widening + combiner, input
    rows never shuffle).  Category domain passed explicitly (it is the
    output schema; discovery via reshape.distinct_values exists for the
    unknown-domain case)."""
    from ..stages.reshape import pivot_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(
        ev, ["user_id"], "event_type",
        categories=["click", "error", "purchase", "signup", "view"],
    )


def orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority): order counts + exact min/max
    price at every prefix level, subtotal keys carried as 'ALL'
    (stages/reshape.rollup_agg — one input pass, coarser levels
    re-aggregate the materialized group-sized table)."""
    from ..stages.reshape import rollup_agg

    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return rollup_agg(
        orders,
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={
            "n_orders": (None, "count"),
            "min_price": ("o_totalprice", "min"),
            "max_price": ("o_totalprice", "max"),
        },
    )


def doc_weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted priority sample of documents, weight =
    n_chars (longer docs proportionally likelier) —
    stages/sample.weighted_topk_sample: per-batch local top-k combiner +
    one tiny reduce, integer-exact across engines."""
    from ..stages.sample import weighted_topk_sample

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_topk_sample(docs, "doc_id", "n_chars", k=k)


def documents_checksum(sf_dir: str):
    """Order-independent content checksum over the documents metadata
    projection — stages/sketch.table_checksum (sum-mod-prime of md5 row
    hashes; constant state, no shuffle — the anti-entropy/migration-audit
    primitive)."""
    from ..stages.sketch import table_checksum

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    return table_checksum(docs, ["doc_id", "lang", "source", "n_chars"])


def customer_order_counts(sf_dir: str):
    """Zero-preserving LEFT join: every customer with their order count and
    max price, customers without orders kept at n_orders=0 — pins the
    bucketed_join ``how='left'`` path behind a value oracle.  The fact side
    is pre-aggregated per key (combiner) BEFORE the join, so the shuffle
    moves one row per customer, not one per order."""
    from ..stages.join import bucketed_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    per_cust = bucketed_groupby_agg(
        orders,
        keys=["o_custkey"],
        aggs={"n_orders": (None, "count"), "max_price": ("o_totalprice", "max")},
    ).map_batches(
        lambda b: b.rename(columns={"o_custkey": "c_custkey"}), batch_format="pandas"
    )
    joined = bucketed_join(cust, per_cust, on="c_custkey", how="left")

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
        out["max_price"] = out["max_price"].fillna(0.0)
        return out

    return joined.map_batches(fill, batch_format="pandas")


def lineitem_price_decile(sf_dir: str):
    """Global-decile classification: label every lineitem with its price
    decile using the exact global quantile boundaries (composes
    stages/groupagg.global_quantiles -> broadcast searchsorted classify ->
    one grouped aggregate).  decile = 1 + #boundaries strictly below x,
    boundaries at p10..p90."""
    import numpy as np

    from ..stages.groupagg import global_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qs = [q / 10 for q in range(1, 10)]
    bounds = (
        global_quantiles(li, "l_extendedprice", qs)
        .to_pandas()
        .sort_values("rank")["value"]
        .to_numpy()
    )

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_extendedprice"].to_numpy()
        return pd.DataFrame(
            {
                "decile": (1 + np.searchsorted(bounds, x, side="left")).astype("int64"),
                "x": x,
            }
        )

    return bucketed_groupby_agg(
        li.map_batches(classify, batch_format="pandas"),
        keys=["decile"],
        aggs={
            "n_items": (None, "count"),
            "min_price": ("x", "min"),
            "max_price": ("x", "max"),
        },
    )


def events_user_retention(sf_dir: str):
    """Cohort retention: users grouped by first-event week (the cohort),
    counted in every week they were active — the standard product-analytics
    rollup.  Exact distinct users via two-level aggregation (group to
    (cohort, week, user) first, then count rows), first-event lookup joined
    back with the key-bucketed join."""
    from ..stages.join import bucketed_join

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    first = bucketed_groupby_agg(
        ev, keys=["user_id"], aggs={"first_ts": ("ts", "min")}
    )
    joined = bucketed_join(ev, first, on="user_id", small_side="right")

    def weeks(b: pd.DataFrame) -> pd.DataFrame:
        # Monday-anchored weeks == DuckDB date_trunc('week', ts); start_time
        # yields ns resolution, cast back to the table's us so the output
        # schema matches the SQL mirror
        return pd.DataFrame(
            {
                "cohort_week": b["first_ts"].dt.to_period("W-SUN").dt.start_time
                .astype("datetime64[us]"),
                "week": b["ts"].dt.to_period("W-SUN").dt.start_time
                .astype("datetime64[us]"),
                "user_id": b["user_id"],
            }
        )

    per_user = bucketed_groupby_agg(
        joined.map_batches(weeks, batch_format="pandas"),
        keys=["cohort_week", "week", "user_id"],
        aggs={"n_events": (None, "count")},
    )
    return bucketed_groupby_agg(
        per_user,
        keys=["cohort_week", "week"],
        aggs={"n_users": (None, "count"), "n_events": ("n_events", "sum")},
    )


def events_funnel(sf_dir: str):
    """Ordered conversion funnel signup -> view -> purchase on FIRST
    timestamps per user (stages/reshape.pivot_agg with op=min — the
    masked-widening pivot), reduced to one row of stage counts via
    constant-state partial sums."""
    from ..stages.reshape import pivot_agg

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    firsts = pivot_agg(
        ev, ["user_id"], "event_type", "ts", op="min",
        categories=["signup", "view", "purchase"],
    )

    def stage_counts(b: pd.DataFrame) -> pd.DataFrame:
        s1 = b["min_signup"].notna()
        s2 = s1 & (b["min_view"] > b["min_signup"])
        s3 = s2 & (b["min_purchase"] > b["min_view"])
        return pd.DataFrame(
            {"n_signup": [int(s1.sum())], "n_view_after": [int(s2.sum())],
             "n_purchase_after": [int(s3.sum())]}
        )

    parts = firsts.map_batches(stage_counts, batch_format="pandas").to_pandas()
    return ray.data.from_pandas(
        pd.DataFrame(
            {c: pd.Series([int(parts[c].sum())], dtype="int64")
             for c in ("n_signup", "n_view_after", "n_purchase_after")}
        )
    )


def documents_profile(sf_dir: str):
    """Column profile of the documents metadata projection —
    stages/profile.profile_table (combiner min/max/null counts + one
    bucketed shuffle for exact distincts)."""
    from ..stages.profile import profile_table

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    return profile_table(docs, ["doc_id", "lang", "source", "n_chars"])


def doc_curation(sf_dir: str):
    """Corpus-curation composition — the full training-data hygiene verdict
    per document in one pipeline: exact-dup survivorship (min doc_id per
    content md5), language allowlist, integer quality gates (word count +
    cross-multiplied alnum ratio, no float thresholds), and benchmark
    decontamination.  Emits one row per document with a keep flag per
    dimension plus the final verdict, so the curated corpus is a trivial
    ``keep == 1`` mask and every drop is attributable.

    Shuffle budget: one bucketed min-groupby on the content hash + one
    bucketed join back (payload = ids and flags, never text), one bucketed
    join against the decontamination flags; the decon benchmark set is a
    broadcast.  (The synthetic documents table has no exact duplicates, so
    keep_exact is constant here — the exact-dedup path is positively
    exercised by kg_files over the code corpus, which does contain dups.)"""
    import hashlib

    import numpy as np

    from ..stages.dedup import decontaminate
    from ..stages.join import bucketed_join

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def featurize(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id"]].copy()
        out["text_md5"] = [
            hashlib.md5(t.encode()).hexdigest() for t in b["text"]
        ]
        nw = b["text"].str.count(r"[A-Za-z]+").to_numpy(np.int64)
        na = b["text"].str.count(r"[A-Za-z0-9]").to_numpy(np.int64)
        nc = b["text"].str.len().to_numpy(np.int64)
        out["keep_lang"] = b["lang"].isin(["en", "es", "de"]).to_numpy(
            np.int64
        )
        out["keep_quality"] = ((nw >= 20) & (100 * na >= 82 * nc)).astype(
            np.int64
        )
        return out

    feats = docs.map_batches(featurize, batch_format="pandas").materialize()
    surv = bucketed_groupby_agg(
        feats, ["text_md5"], {"keep_id": ("doc_id", "min")}
    )
    flagged = bucketed_join(feats, surv, on="text_md5")
    decon = decontaminate(docs, k=4, bench_mod=97)
    joined = bucketed_join(
        flagged.map_batches(
            lambda b: b.drop(columns=["text_md5"]), batch_format="pandas"
        ),
        decon,
        on="doc_id",
    )

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["doc_id", "keep_lang", "keep_quality"]].copy()
        out["keep_exact"] = (b["doc_id"] == b["keep_id"]).astype("int64")
        out["keep_decon"] = (
            (b["is_benchmark"] == 0) & (b["contaminated"] == 0)
        ).astype("int64")
        out["keep"] = (
            out["keep_exact"] * out["keep_lang"]
            * out["keep_quality"] * out["keep_decon"]
        ).astype("int64")
        return out[
            ["doc_id", "keep_exact", "keep_lang", "keep_quality",
             "keep_decon", "keep"]
        ]

    return joined.map_batches(verdict, batch_format="pandas")


def user_customer_outer(sf_dir: str):
    """FULL OUTER join behind a value oracle: per-key event counts vs
    per-key customer counts over derived keys chosen so all three outer
    cases fire (left-only, both, right-only).  Both sides pre-aggregate to
    one row per key (combiner) before the join — the shuffle moves counts,
    never fact rows; unmatched keys surface with the other side's count
    coalesced to zero."""
    from ..stages.join import bucketed_join

    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda b: pd.DataFrame({"k": (b["user_id"] * 2).astype("int64")}),
        batch_format="pandas",
    )
    ev_agg = bucketed_groupby_agg(ev, ["k"], {"n_events": (None, "count")})
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pd.DataFrame({"k": (b["c_custkey"] % 250).astype("int64")}),
        batch_format="pandas",
    )
    cu_agg = bucketed_groupby_agg(cust, ["k"], {"n_customers": (None, "count")})
    joined = bucketed_join(ev_agg, cu_agg, on="k", how="outer")

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["n_events"] = out["n_events"].fillna(0).astype("int64")
        out["n_customers"] = out["n_customers"].fillna(0).astype("int64")
        out["k"] = out["k"].astype("int64")
        return out

    return joined.map_batches(fill, batch_format="pandas")


def basket_part_pairs(sf_dir: str, k: int = 20, max_basket: int = 64):
    """Market-basket pair mining over lineitem — the frequent-itemset
    primitive (recommendation / co-purchase features): top-k part pairs
    by the number of orders containing BOTH, ranked (support desc,
    pa, pb).  -> Dataset(pa, pb, support, rank).

    Scale shape: per-order pair enumeration inside an order-bucketed
    groupby — TPC-H baskets hold <= 7 items so the in-group quadratic is
    inherently tiny; ``max_basket`` guards degenerate data (an over-cap
    basket is excluded from the statistic BY DEFINITION, mirrored in
    SQL).  Pair supports fold through the combiner reduce; one combiner
    top-k out.  Driver state: none."""

    import numpy as np

    from mmgraphrag_ray.arrowutil import strip_pd_metadata
    from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg
    from mmgraphrag_ray.stages.window import grouped_topk

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o": b["l_orderkey"].astype("int64"),
             "p": b["l_partkey"].astype("int64")}
        )
        out["_bucket"] = bucket_ints(out["o"], 64)
        return strip_pd_metadata(out) if len(out) else out

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        pa_, pb_ = [], []
        for _, g in bucket.groupby("o", sort=False):
            parts = sorted(set(int(x) for x in g["p"]))
            if len(parts) < 2 or len(parts) > max_basket:
                continue
            for i in range(len(parts)):
                for j in range(i + 1, len(parts)):
                    pa_.append(parts[i])
                    pb_.append(parts[j])
        return pd.DataFrame(
            {"pa": np.asarray(pa_, dtype=np.int64),
             "pb": np.asarray(pb_, dtype=np.int64)}
        )

    support = bucketed_groupby_agg(
        li.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .repartition(8),
        keys=["pa", "pb"],
        aggs={"support": (None, "count")},
    )
    scored = support.map_batches(
        lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
    )
    top = grouped_topk(
        scored, keys=["_g"], order_col="support", k=k, tie_cols=["pa", "pb"]
    )
    return top.map_batches(
        lambda b: b[["pa", "pb", "support", "rank"]], batch_format="pandas"
    )


def events_scd2(sf_dir: str):
    """SCD2 dimension-history build from the events changelog: per user,
    consecutive same-``event_type`` rows collapse and each change opens a
    [valid_from, valid_to) version interval (stages/window.scd2_intervals).
    SQL mirror: lag() change flags -> lead()/row_number() over changes."""
    from ..stages.window import scd2_intervals

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    return scd2_intervals(ev, key="user_id", ts_col="ts", id_col="event_id",
                          value_col="event_type")


def events_window_users(sf_dir: str):
    """EXACT distinct-user counts per (tumbling 1-hour window, event_type)
    — the DAU/window-cardinality aggregate, via the two-phase exact
    distinct of stages/groupagg.bucketed_count_distinct (a hot window's
    user set never sits in one task)."""
    from ..stages.groupagg import bucketed_count_distinct

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["hour"] = out["ts"].dt.floor("h")
        return out[["hour", "event_type", "user_id"]]

    return bucketed_count_distinct(
        ev.map_batches(bucket, batch_format="pandas"),
        keys=["hour", "event_type"],
        distinct_col="user_id",
        out_col="n_users",
    )


def orders_monthly_share(sf_dir: str):
    """Share-of-total window aggregate: per (order month, orderpriority),
    exact revenue cents and its parts-per-million share of the month's
    total — the market-share / mixture-monitoring reduce.  Two grouped
    sums (fine keys, then month totals: a few dozen rows) and one
    broadcast join of the totals back onto the fine rows; integer floor
    division makes the share cross-engine exact."""
    import numpy as np

    from ..stages.groupagg import bucketed_groupby_agg
    from ..stages.join import broadcast_join

    orders = _read(sf_dir, "orders",
                   ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "month": batch["o_orderdate"].dt.to_period("M").dt.to_timestamp(),
            "o_orderpriority": batch["o_orderpriority"],
            "cents": np.floor(
                batch["o_totalprice"].to_numpy() * 100.0
            ).astype("int64"),
        })
        return out

    fine = bucketed_groupby_agg(
        orders.map_batches(widen, batch_format="pandas"),
        keys=["month", "o_orderpriority"],
        aggs={"revenue_cents": ("cents", "sum"),
              "n_orders": (None, "count")},
    ).materialize()
    # month totals: the fine table is dimension-sized by construction
    # (months x priorities), so the total roll-up is a driver-side fold of
    # already-reduced rows — not a second shuffle over the fact table
    totals = (
        fine.to_pandas()
        .groupby("month", as_index=False)["revenue_cents"]
        .sum()
        .rename(columns={"revenue_cents": "month_cents"})
    )

    joined = broadcast_join(fine, totals, on="month")
    return joined.map_batches(
        lambda b: b.assign(
            share_ppm=(b["revenue_cents"] * 1_000_000 // b["month_cents"])
            .astype("int64")
        )[["month", "o_orderpriority", "revenue_cents", "n_orders",
           "share_ppm"]],
        batch_format="pandas",
    )


def events_rfm(sf_dir: str):
    """RFM (recency / frequency / monetary) customer scoring — the
    segmentation reduce behind retention dashboards: per user, last-event
    time (int µs), event count, exact summed value cents; each metric is
    then ranked EXACTLY across all users (groupagg.grouped_exact_rank —
    range-prefix-sum rank, no global sort) and mapped to a 1-5 quintile
    score by integer rank arithmetic ((rnk-1)*5//n + 1, higher = better).

    -> Dataset(user_id, recency_us, frequency, monetary_cents, r_score,
    f_score, m_score, rfm) with rfm = 100r + 10f + m, all int64.

    Shape: one grouped combiner reduce to the per-user table, then three
    rank passes whose driver state is one int per value-range cell, then
    two user-bucketed joins to assemble the score vector."""
    import numpy as np

    from ..stages.groupagg import bucketed_groupby_agg, grouped_exact_rank
    from ..stages.join import bucketed_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "ts_us": b["ts"].astype("int64"),
            "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
        })

    pu = bucketed_groupby_agg(
        ev.map_batches(widen, batch_format="pandas"),
        keys=["user_id"],
        aggs={
            "recency_us": ("ts_us", "max"),
            "frequency": (None, "count"),
            "monetary_cents": ("cents", "sum"),
        },
    ).map_batches(
        lambda b: b.assign(_all=np.int64(0)), batch_format="pandas"
    ).materialize()
    n = pu.count()

    def rank_of(metric: str, out: str):
        r = grouped_exact_rank(pu, "_all", metric, "user_id", step=1 << 32)
        return r.map_batches(
            lambda b, out=out: pd.DataFrame({
                "user_id": b["user_id"].astype("int64"),
                out: ((b["rnk"] - 1) * 5 // n + 1).astype("int64"),
            }),
            batch_format="pandas",
        )

    scores = bucketed_join(
        bucketed_join(rank_of("recency_us", "r_score"),
                      rank_of("frequency", "f_score"),
                      on="user_id").materialize(),
        rank_of("monetary_cents", "m_score"),
        on="user_id",
    )
    out = bucketed_join(
        pu.drop_columns(["_all"]), scores.materialize(), on="user_id"
    )
    return out.map_batches(
        lambda b: b.assign(
            rfm=(b["r_score"] * 100 + b["f_score"] * 10 + b["m_score"])
            .astype("int64")
        ),
        batch_format="pandas",
    )


def q6_revenue(sf_dir: str, d1: str = "1997-01-01", d2: str = "1998-01-01",
               qty_cut: int = 24):
    """TPC-H Q6 shape — the pure scan-filter-aggregate benchmark and the
    canonical predicate-pushdown demo: the date filter is handed to the
    PARQUET READER as a pyarrow dataset expression, so at 100 TB whole
    row groups outside the ship-date range never leave storage; the
    residual filters and the exact cents revenue run vectorized per
    batch; the global reduce is a per-batch combiner + one tiny fold.

    -> Dataset with ONE row (revenue_cents, n_rows), both int64."""
    import numpy as np
    import pyarrow.dataset as pads

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= d1_ts.to_pydatetime())
        & (pads.field("l_shipdate") < d2_ts.to_pydatetime()),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_shipdate"] >= d1_ts) & (b["l_shipdate"] < d2_ts)
            & (b["l_discount"] >= 0.05) & (b["l_discount"] <= 0.07)
            & (b["l_quantity"] < qty_cut)
        )
        s = b[m]
        cents = np.floor(
            s["l_extendedprice"].to_numpy() * s["l_discount"].to_numpy()
            * 100.0
        ).astype("int64")
        return pd.DataFrame({"revenue_cents": [int(cents.sum())],
                             "n_rows": [int(m.sum())]})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "revenue_cents": [int(b["revenue_cents"].sum())],
            "n_rows": [int(b["n_rows"].sum())],
        })

    return (
        li.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def curation_funnel(sf_dir: str):
    """Curation-funnel diagnostics over doc_curation's per-doc verdicts —
    the drop-attribution report a corpus team reads before shipping a
    filter change: for each rule IN GATE ORDER (exact-dup, language,
    quality, decontamination), how many docs pass it alone and how many
    survive the funnel up to and including it.

    -> Dataset(rule_idx, rule, n_pass, n_cum), 4 rows.

    Shape: doc_curation's own shuffle budget, then a per-batch 8-counter
    combiner + one single-row fold — the funnel itself adds no shuffle."""
    import numpy as np

    RULES = ["keep_exact", "keep_lang", "keep_quality", "keep_decon"]
    flags = doc_curation(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cum = np.ones(len(b), dtype=np.int64)
        alone, cums = [], []
        for r in RULES:
            v = b[r].to_numpy(np.int64)
            alone.append(int(v.sum()))
            cum = cum * v
            cums.append(int(cum.sum()))
        return pd.DataFrame({
            "rule_idx": np.arange(1, len(RULES) + 1, dtype=np.int64),
            "rule": pd.Series(RULES, dtype=object),
            "n_pass": pd.Series(alone, dtype="int64"),
            "n_cum": pd.Series(cums, dtype="int64"),
        })

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["rule_idx", "rule"], sort=True)[["n_pass", "n_cum"]]
        return g.sum().reset_index()

    return (
        flags.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def region_segment_stats(sf_dir: str):
    """Snowflake-dimension denormalization — the 3-level dimension chain
    (customer -> nation -> region) flattened with two BROADCAST joins
    (each dimension is ray.put once; no shuffle touches the chain), then
    exact per-(region, segment) aggregates.  The multi-hop sibling of
    segment_order_stats' single-hop star join.

    -> Dataset(r_name, c_mktsegment, n_customers, acctbal_cents)."""
    import numpy as np

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "r_name"]]
    dim = dim.rename(columns={"n_nationkey": "c_nationkey"})
    # pandas int32 keys from parquet: align dtype with the fact side
    dim["c_nationkey"] = dim["c_nationkey"].astype("int32")

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"])
    joined = broadcast_join(cust, dim, on="c_nationkey")

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["r_name", "c_mktsegment"]].copy()
        out["cents"] = np.floor(
            b["c_acctbal"].to_numpy() * 100.0
        ).astype("int64")
        return out

    return bucketed_groupby_agg(
        joined.map_batches(widen, batch_format="pandas"),
        keys=["r_name", "c_mktsegment"],
        aggs={"n_customers": (None, "count"),
              "acctbal_cents": ("cents", "sum")},
    )


def events_dwell(sf_dir: str):
    """State dwell-time analysis — "how long do users stay in each state":
    order each user's events by (ts, event_id); the gap to the NEXT event
    is dwell time attributed to the CURRENT event_type (the last state has
    no successor and contributes no dwell).  Exact integer microseconds.

    -> Dataset(event_type, n_intervals, total_dwell_us, max_dwell_us).

    Shape: one user-bucketed grouped-window pass (vectorized shift over
    the sorted bucket) emitting per-batch per-type partials; one tiny
    grouped sum over the vocabulary-bounded type key."""
    import numpy as np

    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = b.copy()
        out["_dbucket"] = _bucket_of(out["user_id"], 64)
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {"event_type": pd.Series(dtype=object),
                 "n_intervals": pd.Series(dtype="int64"),
                 "total_dwell_us": pd.Series(dtype="int64"),
                 "max_dwell_us": pd.Series(dtype="int64")}
            )
        b = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        ts = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        uid = b["user_id"].to_numpy()
        nxt_same = np.concatenate([uid[:-1] == uid[1:], [False]])
        dwell = np.concatenate([ts[1:] - ts[:-1], [0]])
        d = pd.DataFrame({"event_type": b["event_type"].to_numpy()[nxt_same],
                          "dw": dwell[nxt_same].astype("int64")})
        g = d.groupby("event_type", sort=False)["dw"]
        return pd.DataFrame({
            "n_intervals": g.size().astype("int64"),
            "total_dwell_us": g.sum().astype("int64"),
            "max_dwell_us": g.max().astype("int64"),
        }).reset_index()

    partials = (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_dbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_groupby_agg(
        partials, keys=["event_type"],
        aggs={"n_intervals": ("n_intervals", "sum"),
              "total_dwell_us": ("total_dwell_us", "sum"),
              "max_dwell_us": ("max_dwell_us", "max")},
    )


def q4_late_orders(sf_dir: str, d1: str = "1997-01-01", d2: str = "1998-01-01"):
    """TPC-H Q4 shape — the distributed EXISTS: count orders per priority
    that have at least one lineitem shipped AFTER the order date (the
    late-shipment proxy; this corpus has no commit/receipt dates).

    Scale plan: lineitem reduces to ONE row per order (max shipdate) via
    a per-batch combiner + one bucketed shuffle BEFORE it meets orders —
    the correlated-EXISTS test `any(l_shipdate > o_orderdate)` is exactly
    `max(l_shipdate) > o_orderdate`, so the semi-join payload is one
    fixed-width row per order.  Orders are date-pruned at the parquet
    reader.  The join is the portable bucketed hash join; the final
    reduce is a 5-row priority count."""
    import pyarrow.dataset as pads

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= d1_ts.to_pydatetime())
        & (pads.field("o_orderdate") < d2_ts.to_pydatetime()),
    ).map_batches(
        lambda b: b[(b["o_orderdate"] >= d1_ts) & (b["o_orderdate"] < d2_ts)],
        batch_format="pandas",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    # round-4 fused plan: the per-order max-shipdate reduce and the
    # orders join share ONE orderkey-hash-bucketed shuffle (the
    # one-key-reused fusion also applied to q10/q21); each bucket emits
    # per-priority partial counts, so the final is a 5-row sum

    import numpy as np

    from ..arrowutil import df_to_table

    N_B = 64

    def _okb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def li_rows(b: pd.DataFrame):
        out = (
            pd.DataFrame({"o_orderkey": b["l_orderkey"],
                          "d": b["l_shipdate"]})
            .groupby("o_orderkey", sort=False, as_index=False).max()
        ) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "d": pd.Series(dtype="datetime64[us]"),
        })
        out["o_orderpriority"] = ""
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def o_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "d": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"].astype(object),
        }) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "d": pd.Series(dtype="datetime64[us]"),
            "o_orderpriority": pd.Series(dtype=object),
        })
        _guard_sentinel(out["o_orderpriority"], "", "o_orderpriority")
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def late_per_bucket(g: pd.DataFrame):
        li_max = (
            g[g["o_orderpriority"] == ""]
            .groupby("o_orderkey", sort=False, as_index=False)["d"].max()
            .rename(columns={"d": "max_shipdate"})
        )
        od = g[g["o_orderpriority"] != ""]
        m = od.merge(li_max, on="o_orderkey", how="inner")
        late = m[m["max_shipdate"] > m["d"]]
        out = (
            late.groupby("o_orderpriority", sort=False)
            .size().rename("n").reset_index()
        ) if len(late) else pd.DataFrame({
            "o_orderpriority": pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
        })
        out["n"] = out["n"].astype("int64") if len(out) else out["n"]
        return df_to_table(out)

    partials = (
        li.map_batches(li_rows, batch_format="pandas")
        .union(orders.map_batches(o_rows, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(late_per_bucket, batch_format="pandas")
        .materialize()
    )
    return bucketed_groupby_agg(
        partials, keys=["o_orderpriority"],
        aggs={"n_late_orders": ("n", "sum")},
    )


def _nation_stamped_sides(sf_dir: str):
    """Shared q5/q7 plan: orders stamped with the customer's nation,
    lineitem stamped with the supplier's nation + exact int64 cents.

    Each dimension attach goes through bucketed_join's capped dual plan
    (`small_side='right'`): under RAYKG_JOIN_BROADCAST_MAX the dimension
    is ray.put once and the attach is a map-side Arrow hash join (no
    shuffle); above the cap it is a bucketed shuffle — no driver pull at
    any dimension size.  Returns (orders_stamped, li_stamped) =
    (o_orderkey, c_nation) / (o_orderkey, s_nation, cents)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata

    def _p(out: pd.DataFrame) -> pd.DataFrame:
        return strip_pd_metadata(out) if len(out) else out

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: _p(pd.DataFrame({
            "o_custkey": b["c_custkey"],
            "c_nation": b["c_nationkey"].astype("int64"),
        })),
        batch_format="pandas",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: _p(pd.DataFrame({
            "l_suppkey": b["s_suppkey"],
            "s_nation": b["s_nationkey"].astype("int64"),
        })),
        batch_format="pandas",
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    orders_stamped = bucketed_join(
        orders, cust, on="o_custkey", small_side="right"
    ).map_batches(
        lambda b: _p(b[["o_orderkey", "c_nation"]]), batch_format="pandas"
    )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_cents(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        return _p(pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "cents": cents,
        }))

    li_stamped = bucketed_join(
        li.map_batches(li_cents, batch_format="pandas"),
        supp, on="l_suppkey", small_side="right",
    ).map_batches(
        lambda b: _p(b[["o_orderkey", "s_nation", "cents"]]),
        batch_format="pandas",
    )
    return orders_stamped, li_stamped


def _nation_flow_partials(sf_dir: str):
    """Shared q5/q7 FUSED core (round 4): the fact⋈fact orderkey join and
    the nation-pair reduce share ONE orderkey-hash-bucketed shuffle —
    the stamped lineitem side pre-combines (okey, s_nation) cents per
    batch, stamped orders ride as (okey, c_nation) marker rows, and each
    bucket joins + reduces to (s_nation, c_nation, revenue_cents,
    n_items) partials.  q7 sums all pairs; q5 sums the diagonal."""

    import numpy as np

    from ..arrowutil import df_to_table

    orders_stamped, li_stamped = _nation_stamped_sides(sf_dir)
    N_B = 64

    def _okb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def li_rows(b: pd.DataFrame):
        out = (
            b.groupby(["o_orderkey", "s_nation"], sort=False)
            .agg(cents=("cents", "sum"), n=("cents", "size")).reset_index()
        ) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "s_nation": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        })
        if len(out):
            out["n"] = out["n"].astype("int64")
        _guard_sentinel(out["s_nation"], -1, "s_nation")
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def o_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "s_nation": np.int64(-1),
            "cents": b["c_nation"].astype("int64"),  # payload reuse
            "n": np.int64(0),
        }) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "s_nation": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        })
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def flows_per_bucket(g: pd.DataFrame):
        cn = g.loc[g["s_nation"] == -1,
                   ["o_orderkey", "cents"]].rename(
            columns={"cents": "c_nation"})
        li = g[g["s_nation"] != -1]
        m = li.merge(cn, on="o_orderkey", how="inner")
        out = (
            m.groupby(["s_nation", "c_nation"], sort=False)
            .agg(revenue_cents=("cents", "sum"), n_items=("n", "sum"))
            .reset_index()
        ) if len(m) else pd.DataFrame({
            "s_nation": pd.Series(dtype="int64"),
            "c_nation": pd.Series(dtype="int64"),
            "revenue_cents": pd.Series(dtype="int64"),
            "n_items": pd.Series(dtype="int64"),
        })
        return df_to_table(out)

    return (
        li_stamped.map_batches(li_rows, batch_format="pandas")
        .union(orders_stamped.map_batches(o_rows, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(flows_per_bucket, batch_format="pandas")
        .materialize()
    )


def q5_nation_volume(sf_dir: str):
    """TPC-H Q5 shape — revenue per nation where the CUSTOMER and the
    SUPPLIER sit in the same nation (the local-supplier-volume join).

    Scale plan: dimension attaches via _nation_stamped_sides' capped dual
    plan; then the FUSED _nation_flow_partials core (join + nation-pair
    reduce in one orderkey shuffle); the diagonal filter and final
    per-nation sum run over the tiny pair table; nation names arrive via
    one constant-size broadcast."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    pairs = _nation_flow_partials(sf_dir)
    local = pairs.map_batches(
        lambda b: b[b["s_nation"] == b["c_nation"]][
            ["s_nation", "revenue_cents", "n_items"]]
        .rename(columns={"s_nation": "n_nationkey"}),
        batch_format="pandas",
    )
    per_nation = bucketed_groupby_agg(
        local, keys=["n_nationkey"],
        aggs={"revenue_cents": ("revenue_cents", "sum"),
              "n_items": ("n_items", "sum")},
    )
    named = broadcast_join(per_nation, nation, on="n_nationkey")
    return named.map_batches(
        lambda b: b[["n_name", "revenue_cents", "n_items"]],
        batch_format="pandas",
    )


def q13_order_distribution(sf_dir: str, excl_priority: str = "1-URGENT"):
    """TPC-H Q13 shape — the distribution of a distribution: per-customer
    order counts (orders under a priority filter), INCLUDING the zero
    customers via a left outer join, then how many customers share each
    count.

    Scale plan: orders reduce to one (custkey, count) row via combiner +
    bucketed shuffle; the customer key column left-joins that small
    profile (bucketed, payload = two int64s per row); missing matches
    count as 0; the outer groupby is over the tiny count domain."""
    # round-4 fused plan: the per-customer order count and the customer
    # left join share ONE custkey-hash-bucketed shuffle (q10/q21's
    # one-key-reused fusion) — orders pre-count per batch, customer keys
    # ride as marker rows (zero-order customers get count 0), and each
    # bucket emits per-c_count partials for a tiny final reduce

    import numpy as np

    from ..arrowutil import df_to_table

    N_B = 64

    def _ckb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def order_rows(b: pd.DataFrame):
        kept = b[b["o_orderpriority"] != excl_priority]
        out = (
            kept.groupby("o_custkey", sort=False)
            .size().rename("n").reset_index()
            .rename(columns={"o_custkey": "c_custkey"})
        ) if len(kept) else pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        })
        if len(out):
            out["n"] = out["n"].astype("int64")
        _guard_sentinel(out["n"], -1, "order count n")
        out["_qbucket"] = _ckb(out["c_custkey"])
        return df_to_table(out)

    def cust_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "n": np.int64(-1),  # marker: customer-universe row
        }) if len(b) else pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        })
        out["_qbucket"] = _ckb(out["c_custkey"])
        return df_to_table(out)

    def dist_per_bucket(g: pd.DataFrame):
        per_cust = (
            g[g["n"] >= 0]
            .groupby("c_custkey", sort=False, as_index=False)["n"].sum()
        )
        universe = g.loc[g["n"] == -1, ["c_custkey"]].drop_duplicates()
        m = universe.merge(per_cust, on="c_custkey", how="left")
        cc = m["n"].fillna(0).astype("int64")
        out = (
            cc.value_counts().rename("custdist").rename_axis("c_count")
            .reset_index()
        ) if len(m) else pd.DataFrame({
            "c_count": pd.Series(dtype="int64"),
            "custdist": pd.Series(dtype="int64"),
        })
        if len(out):
            out["custdist"] = out["custdist"].astype("int64")
        return df_to_table(out)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust_keys = _read(sf_dir, "customer", ["c_custkey"])
    partials = (
        orders.map_batches(order_rows, batch_format="pandas")
        .union(cust_keys.map_batches(cust_rows, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(dist_per_bucket, batch_format="pandas")
        .materialize()
    )
    return bucketed_groupby_agg(
        partials, keys=["c_count"], aggs={"custdist": ("custdist", "sum")}
    )


def q14_promo_share(sf_dir: str, d1: str = "1997-03-01", d2: str = "1997-09-01"):
    """TPC-H Q14 shape — promo revenue share: the fraction (integer ppm)
    of shipped revenue in a date window that comes from parts of type
    'PROMO'.

    Scale plan: part is a dimension — its partkey->is_promo flag attaches
    through the capped dual plan (join.attach_dim: ray.put broadcast under
    RAYKG_JOIN_BROADCAST_MAX, bucketed shuffle above — no unconditional
    driver pull); lineitem is date-pruned at the reader and folds to TWO
    int64 counters per batch (promo cents, total cents); the global reduce
    is a one-row fold.  Share = promo*1_000_000 // total — integer
    division on both engines, no float ratio."""
    import numpy as np
    import pyarrow.dataset as pads

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    flags = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_partkey": b["p_partkey"],
            "is_promo": (b["p_type"] == "PROMO").astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_partkey": pd.Series(dtype="int64"),
            "is_promo": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= d1_ts.to_pydatetime())
        & (pads.field("l_shipdate") < d2_ts.to_pydatetime()),
    )
    li = attach_dim(li, flags, on="l_partkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["l_shipdate"] >= d1_ts) & (b["l_shipdate"] < d2_ts)
        s = b[m]
        cents = np.floor(
            s["l_extendedprice"].to_numpy()
            * (1.0 - s["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        promo = s["is_promo"].to_numpy() == 1
        return pd.DataFrame({
            "promo_cents": [int(cents[promo].sum())],
            "total_cents": [int(cents.sum())],
        })

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        promo = int(b["promo_cents"].sum())
        total = int(b["total_cents"].sum())
        return pd.DataFrame({
            "promo_cents": [promo],
            "total_cents": [total],
            "promo_ppm": [promo * 1_000_000 // total if total else 0],
        })

    return (
        li.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def q18_big_orders(sf_dir: str, qty_cut: int = 300, k: int = 20):
    """TPC-H Q18 shape — large-volume orders: orders whose total lineitem
    quantity exceeds a threshold, top-k by quantity (HAVING over a fact
    groupby, then a selective join back to the order header).

    Scale plan: lineitem folds to one (orderkey, sum_qty) row via
    combiner + bucketed shuffle; the HAVING filter drops all but a
    handful of rows BEFORE any join, so the orders join back is a
    broadcast of the tiny survivor set; the top-k is a per-batch partial
    sort + one global limit with a deterministic orderkey tie-break.
    Quantities are integral-valued in this corpus, so the sum is an
    exact int64."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    qty = bucketed_groupby_agg(
        li.map_batches(
            lambda b: pd.DataFrame({
                "o_orderkey": b["l_orderkey"],
                "qty": b["l_quantity"].astype("int64"),
            }),
            batch_format="pandas",
        ),
        keys=["o_orderkey"],
        aggs={"total_qty": ("qty", "sum")},
    )
    big = qty.map_batches(
        lambda b: b[b["total_qty"] > qty_cut], batch_format="pandas"
    ).materialize()
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    from ..stages.join import bucketed_join

    joined = bucketed_join(orders, big, on="o_orderkey", how="inner",
                           small_side="right")
    return (
        joined.sort(["total_qty", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def events_decay(sf_dir: str, ref: str = "1998-01-01", k_max: int = 20,
                 week_us: int = 7 * 24 * 3600 * 1_000_000):
    """Exponentially time-decayed engagement score per user — the
    recency-weighted activity signal behind churn/engagement ranking,
    with the decay kept EXACT: an event aged ``a`` whole weeks at the
    reference instant contributes ``2^(k_max − min(a, k_max))`` (half-life
    = one week, power-of-two weights, no float decay).  Bit-deterministic
    and mirrored by DuckDB's ``<<`` on the same integer ages.

    Scale shape: one streaming pass stamps each event's weight
    vectorized (integer µs arithmetic + numpy shifts); the per-user fold
    is the standard combiner + bucketed-sum groupby.  -> Dataset(user_id,
    decay_score, n_events)."""
    import numpy as np

    ref_us = int(pd.Timestamp(ref).value // 1000)
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        age = np.maximum(ref_us - ts, 0) // week_us
        shift = k_max - np.minimum(age, k_max)
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "w": (np.int64(1) << shift.astype("int64")),
        })

    return bucketed_groupby_agg(
        ev.map_batches(stamp, batch_format="pandas"),
        keys=["user_id"],
        aggs={"decay_score": ("w", "sum"), "n_events": (None, "count")},
    )


def events_transitions(sf_dir: str):
    """First-order Markov transition profile over per-user event streams:
    for every ordered (prev_type, next_type) adjacency in (ts, event_id)
    arrival order, the exact transition count and its row-normalized
    probability in integer ppm (n·1e6 // total-from-prev) — the
    session-model / anomaly-baseline input next to events_path_trigrams.

    Scale shape: adjacency extraction is the one user-bucketed window
    pass this repo's grouped-window contract always uses (sort only
    inside a user bucket); counts reduce by the tiny type×type vocabulary;
    the row totals fold over the type vocabulary and broadcast back as a
    dimension join.  -> Dataset(prev_type, next_type, n, ppm)."""
    import numpy as np

    from ..stages.join import broadcast_join
    from ..stages.window import _bucket_of  # shared user-bucket hash

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = b.copy()
        out["_tbucket"] = _bucket_of(out["user_id"], 64)
        return strip_pd_metadata(out) if len(out) else out

    def adjacencies(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
            })
        b = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        uid = b["user_id"].to_numpy()
        same = np.concatenate([uid[:-1] == uid[1:], [False]])
        et = b["event_type"].to_numpy()
        nxt = np.concatenate([et[1:], [""]])
        return pd.DataFrame({"prev_type": et[same], "next_type": nxt[same]})

    adj = (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_tbucket")
        .map_groups(adjacencies, batch_format="pandas")
    )
    counts = bucketed_groupby_agg(
        adj, keys=["prev_type", "next_type"], aggs={"n": (None, "count")}
    ).materialize()
    totals = (
        counts.to_pandas().groupby("prev_type")["n"].sum().rename("row_total")
        .reset_index()
    )  # type-vocabulary-sized (bounded)
    joined = broadcast_join(counts, totals, on="prev_type")
    return joined.map_batches(
        lambda b: b.assign(
            ppm=(b["n"].astype("int64") * 1_000_000
                 // b["row_total"].astype("int64"))
        )[["prev_type", "next_type", "n", "ppm"]],
        batch_format="pandas",
    )


def events_props_stats(sf_dir: str):
    """Semi-structured ingestion: parse the JSON ``props`` column
    (``{"k": <int>}`` event payloads) and reduce the extracted field per
    event type — the schema-on-read pass every event pipeline runs before
    payload fields become real columns.  Parsing is an honest per-record
    ``json.loads`` (JSON is inherently per-record work) inside a
    stateless task-pool map; everything downstream is the combiner
    groupby.  Malformed payloads count in ``n_bad`` instead of crashing
    the stage.  -> Dataset(event_type, n, n_bad, sum_k, min_k, max_k)."""
    import json

    import numpy as np

    ev = _read(sf_dir, "events", ["event_type", "props"])

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        ks = np.empty(len(b), dtype=np.int64)
        bad = np.zeros(len(b), dtype=np.int64)
        for i, p in enumerate(b["props"].to_numpy()):
            try:
                ks[i] = int(json.loads(p)["k"])
            except (ValueError, TypeError, KeyError):
                ks[i] = 0
                bad[i] = 1
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "k": ks, "bad": bad,
        })

    return bucketed_groupby_agg(
        ev.map_batches(parse, batch_format="pandas"),
        keys=["event_type"],
        aggs={
            "n": (None, "count"),
            "n_bad": ("bad", "sum"),
            "sum_k": ("k", "sum"),
            "min_k": ("k", "min"),
            "max_k": ("k", "max"),
        },
    )


def events_trending(sf_dir: str, k: int = 3):
    """Trending event types per UTC day: exact daily counts, then the
    top-k types per day (ties -> lexicographic type) — the daily-digest /
    anomaly-headline query over the event stream.

    Scale shape: day truncation is integer µs arithmetic; counts reduce
    by the (day × type) vocabulary via the combiner groupby; the per-day
    top-k is grouped_topk's combiner plan (each batch keeps <= k rows per
    day before the tiny shuffle).  -> Dataset(day, event_type, n, rank)."""
    import numpy as np

    from ..stages.window import grouped_topk

    day_us = 24 * 3600 * 1_000_000
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({
            "day": pd.to_datetime((ts // day_us) * day_us, unit="us"),
            "event_type": b["event_type"].to_numpy(),
        })

    counts = bucketed_groupby_agg(
        ev.map_batches(stamp, batch_format="pandas"),
        keys=["day", "event_type"],
        aggs={"n": (None, "count")},
    )
    return grouped_topk(counts, keys=["day"], order_col="n", k=k,
                        tie_cols=["event_type"])


def q7_nation_flows(sf_dir: str):
    """TPC-H Q7 shape — shipping volume between nation PAIRS: exact cents
    revenue per ordered (supplier nation -> customer nation) pair, the
    full trade-flow matrix rather than Q7's two-nation filter.

    Scale plan: identical to q5_nation_volume — the capped dual-plan
    dimension attaches, then the FUSED _nation_flow_partials core (join +
    nation-pair reduce in ONE orderkey shuffle); only the final differs:
    q7 sums the full pair vocabulary, q5 the diagonal.  -> Dataset(
    supp_nation, cust_nation, revenue_cents, n_items)."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    flows = bucketed_groupby_agg(
        _nation_flow_partials(sf_dir),
        keys=["s_nation", "c_nation"],
        aggs={"revenue_cents": ("revenue_cents", "sum"),
              "n_items": ("n_items", "sum")},
    )
    names_ref = ray.put(name_of)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(names_ref)
        return pd.DataFrame({
            "supp_nation": b["s_nation"].map(m),
            "cust_nation": b["c_nation"].map(m),
            "revenue_cents": b["revenue_cents"].astype("int64"),
            "n_items": b["n_items"].astype("int64"),
        })

    return flows.map_batches(label, batch_format="pandas")


def lineitem_winsorized(sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95):
    """Robust aggregate suite over the price column — winsorized and
    trimmed statistics at exact (p05, p95) bounds: the outlier-resistant
    summary a metrics pipeline publishes next to the raw mean.

    Plan: bounds come from groupagg.global_quantiles (exact selection,
    driver holds bin counts only); then ONE more streaming pass clips /
    filters on the integer CENTS grid (both engines compute
    floor(x·100) identically, and the bounds are corpus elements, so
    clamping commutes with the grid).  All sums are int64 cents.

    -> ONE row: (n, n_below, n_above, lo_cents, hi_cents,
    winsorized_sum_cents, trimmed_sum_cents, trimmed_n)."""
    import numpy as np

    from ..stages.groupagg import global_quantiles

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qdf = global_quantiles(li, "l_extendedprice", [q_lo, q_hi]).to_pandas()
    vals = dict(zip(qdf["q"], qdf["value"]))
    lo_c = int(np.floor(vals[f"p{int(round(q_lo*100)):02d}"] * 100.0))
    hi_c = int(np.floor(vals[f"p{int(round(q_hi*100)):02d}"] * 100.0))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(
            b["l_extendedprice"].to_numpy(dtype="float64") * 100.0
        ).astype("int64")
        below = c < lo_c
        above = c > hi_c
        mid = ~(below | above)
        wins = np.clip(c, lo_c, hi_c)
        return pd.DataFrame({
            "n": [len(c)],
            "n_below": [int(below.sum())],
            "n_above": [int(above.sum())],
            "winsorized_sum_cents": [int(wins.sum())],
            "trimmed_sum_cents": [int(c[mid].sum())],
            "trimmed_n": [int(mid.sum())],
        })

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({k: [int(b[k].sum())] for k in b.columns})
        out["lo_cents"] = lo_c
        out["hi_cents"] = hi_c
        return out

    return (
        li.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def customer_revenue_gini(sf_dir: str):
    """Exact Gini concentration of per-customer order revenue — the
    inequality/concentration metric behind "top 1% of customers drive X%
    of revenue" dashboards, computed with NO global sort:

        G = Σ (2·r_i − n − 1)·v_i / (n·Σv)   (v asc, r = exact rank)

    Ranks come from groupagg.grouped_exact_rank's range-prefix-sum scheme
    (driver holds one int per value-range cell, never rows); the Gini
    fold needs only the associative partials (n, Σv, Σr·v) because
    Σ(2r−n−1)v = 2Σrv − (n+1)Σv.  Ties contribute identically under any
    tie order (equal v), so the statistic is deterministic, and the
    row_number tie-break makes it bit-equal to the SQL mirror.  Products
    accumulate as Python ints (int64 overflows at ~1e9 rows × large
    values; the mirror casts through HUGEINT).

    -> ONE row: (n, total_cents, gini_num, gini_ppm)."""
    import numpy as np

    from ..stages.groupagg import bucketed_groupby_agg, grouped_exact_rank

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    rev = bucketed_groupby_agg(
        orders.map_batches(
            lambda b: pd.DataFrame({
                "o_custkey": b["o_custkey"],
                "v": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0).astype("int64"),
            }),
            batch_format="pandas",
        ),
        keys=["o_custkey"],
        aggs={"v": ("v", "sum")},
    ).map_batches(
        lambda b: b.assign(_g="all"), batch_format="pandas"
    )
    ranked = grouped_exact_rank(rev, "_g", "v", "o_custkey", step=1_000_000)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s_v = int(b["v"].astype("int64").sum())
        s_rv = sum(int(r) * int(v) for r, v in zip(b["rnk"], b["v"]))
        return pd.DataFrame({"cnt": [len(b)], "s_v": [s_v], "s_rv": [s_rv]})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        n = int(b["cnt"].sum())
        s_v = int(b["s_v"].sum())
        s_rv = int(b["s_rv"].sum())
        num = 2 * s_rv - (n + 1) * s_v
        return pd.DataFrame({
            "n": [n],
            "total_cents": [s_v],
            "gini_num": [num],
            "gini_ppm": [num * 1_000_000 // (n * s_v) if n and s_v else 0],
        })

    return (
        ranked.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    )


def events_spike_days(sf_dir: str, factor_num: int = 2, factor_den: int = 1):
    """Traffic-spike detection per event type: flag UTC days whose event
    count exceeds ``factor`` × the type's average daily count — the
    integer-exact monitoring rule (n_day · n_days · den > num · total ⇔
    n_day > factor · avg) with no float average, so both engines agree on
    every boundary case.

    Scale shape: exact (type × day) counts via the combiner groupby; the
    per-type totals fold over the tiny type vocabulary and ride back as a
    broadcast dimension join.  -> Dataset(event_type, day, n, type_total,
    n_days, spike) for all (type, day) cells."""
    import numpy as np

    from ..stages.join import broadcast_join

    day_us = 24 * 3600 * 1_000_000
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({
            "day": pd.to_datetime((ts // day_us) * day_us, unit="us"),
            "event_type": b["event_type"].to_numpy(),
        })

    counts = bucketed_groupby_agg(
        ev.map_batches(stamp, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"n": (None, "count")},
    ).materialize()
    totals = (
        counts.to_pandas().groupby("event_type")["n"]
        .agg(type_total="sum", n_days="size").reset_index()
    )  # type-vocabulary-sized
    joined = broadcast_join(counts, totals, on="event_type")
    return joined.map_batches(
        lambda b: b.assign(
            type_total=b["type_total"].astype("int64"),
            n_days=b["n_days"].astype("int64"),
            spike=(
                b["n"].astype("int64") * b["n_days"].astype("int64")
                * factor_den
                > factor_num * b["type_total"].astype("int64")
            ).astype("int64"),
        )[["event_type", "day", "n", "type_total", "n_days", "spike"]],
        batch_format="pandas",
    )


def lineitem_share_of_order(sf_dir: str, min_cents: int = 1):
    """Percent-of-parent at fact scale: each line's share of its order's
    revenue in integer ppm — the within-group share pattern where BOTH
    sides are fact-sized (unlike orders_monthly_share's tiny dimension
    fold).

    Scale plan: per-order revenue folds via combiner + ONE bucketed
    shuffle; the join back to lines is the bucketed orderkey join moving
    (orderkey, cents) fixed-width rows; the ppm is vectorized.  ->
    Dataset(l_orderkey, l_linenumber, cents, order_cents, share_ppm)."""
    import numpy as np

    from ..stages.join import bucketed_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice",
                "l_discount"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        cents = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        out = pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "l_linenumber": b["l_linenumber"].astype("int64"),
            "cents": cents,
        })
        return strip_pd_metadata(out) if len(out) else out

    lines = li.map_batches(stamp, batch_format="pandas").materialize()
    per_order = bucketed_groupby_agg(
        lines.map_batches(lambda b: b[["l_orderkey", "cents"]]
                          .rename(columns={"cents": "order_cents"}),
                          batch_format="pandas"),
        keys=["l_orderkey"],
        aggs={"order_cents": ("order_cents", "sum")},
    )
    joined = bucketed_join(lines, per_order, on="l_orderkey")
    return joined.map_batches(
        lambda b: b.assign(
            share_ppm=(
                b["cents"].astype("int64") * 1_000_000
                // b["order_cents"].where(b["order_cents"] > 0, 1)
                .astype("int64")
            )
        ),
        batch_format="pandas",
    )


def events_type_overlap(sf_dir: str):
    """Audience-overlap matrix: exact Jaccard (integer ppm) between the
    distinct-user sets of every event-type pair — the "do buyers also
    search" cohort-overlap query, computed without ever holding a user
    set in one task.

    Scale shape: distinct (user, type) via ONE bucketed reduce; pair
    enumeration happens per USER inside a user-bucketed pass (a user has
    at most |type vocabulary| types, so per-user work is bounded); pair
    counts and per-type totals both reduce over the tiny type domain,
    totals ride back as a broadcast.  -> Dataset(type_a, type_b, n_a,
    n_b, n_both, jaccard_ppm) for co-occurring pairs, type_a < type_b."""
    import numpy as np

    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    ut = bucketed_groupby_agg(
        ev, keys=["user_id", "event_type"], aggs={"_n": (None, "count")}
    ).map_batches(
        lambda b: b[["user_id", "event_type"]], batch_format="pandas"
    ).materialize()

    totals = (
        ut.to_pandas().groupby("event_type").size().astype("int64").to_dict()
    )  # type-vocabulary-sized
    tot_ref = ray.put(totals)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = b.assign(_obucket=_bucket_of(b["user_id"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def user_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        ta, tb = [], []
        for _, g in bucket.groupby("user_id", sort=False):
            types = sorted(g["event_type"])
            for i in range(len(types)):
                for j in range(i + 1, len(types)):
                    ta.append(types[i])
                    tb.append(types[j])
        return pd.DataFrame({
            "type_a": pd.array(ta, dtype="string"),
            "type_b": pd.array(tb, dtype="string"),
        })

    pairs = bucketed_groupby_agg(
        ut.map_batches(add_bucket, batch_format="pandas")
        .groupby("_obucket")
        .map_groups(user_pairs, batch_format="pandas"),
        keys=["type_a", "type_b"],
        aggs={"n_both": (None, "count")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tot_ref)
        n_a = b["type_a"].map(t).astype("int64")
        n_b = b["type_b"].map(t).astype("int64")
        both = b["n_both"].astype("int64")
        return pd.DataFrame({
            "type_a": b["type_a"], "type_b": b["type_b"],
            "n_a": n_a, "n_b": n_b, "n_both": both,
            "jaccard_ppm": both * 1_000_000 // (n_a + n_b - both),
        })

    return pairs.map_batches(finish, batch_format="pandas")


def orders_weekday_profile(sf_dir: str):
    """Calendar-dimension extraction demo: exact order counts and cents
    revenue per ISO weekday (0 = Monday, matching pandas dt.dayofweek;
    the mirror uses isodow − 1).  One vectorized stamp + the tiny
    weekday-domain reduce.  -> Dataset(dow, n_orders, total_cents)."""
    import numpy as np

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "dow": b["o_orderdate"].dt.dayofweek.astype("int64"),
            "cents": np.floor(
                b["o_totalprice"].to_numpy() * 100.0).astype("int64"),
        })

    return bucketed_groupby_agg(
        orders.map_batches(stamp, batch_format="pandas"),
        keys=["dow"],
        aggs={"n_orders": (None, "count"), "total_cents": ("cents", "sum")},
    )


def customer_pareto_80(sf_dir: str, num: int = 4, den: int = 5,
                       step: int = 1_000_000, fetch_cap: int = 100_000):
    """Exact Pareto concentration ("what fraction of customers produce
    80% of revenue"): the smallest k such that the top-k customers by
    revenue cover >= num/den of total cents — computed with NO global
    sort, by the same range-suffix-sum selection global_quantiles uses:

    1. per-customer revenue (combiner + one bucketed shuffle);
    2. one streaming pass -> per value-range (v // step) count/sum
       partials — the driver holds two ints per RANGE, never rows;
    3. walk ranges from the top until the num/den threshold falls inside
       one boundary range; fetch only that range's rows (<= fetch_cap)
       and finish the walk exactly (the integer test den·cum >= num·T —
       no float share).  k is tie-order-independent: equal values
       contribute equally, so the minimal k is unique.

    -> ONE row: (n, total_cents, k_top, topk_cents, k_ppm)."""
    import numpy as np

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    rev = bucketed_groupby_agg(
        orders.map_batches(
            lambda b: pd.DataFrame({
                "o_custkey": b["o_custkey"],
                "v": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0).astype("int64"),
            }),
            batch_format="pandas",
        ),
        keys=["o_custkey"],
        aggs={"v": ("v", "sum")},
    ).materialize()

    def range_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b["v"].astype("int64") // step)
        d = pd.DataFrame({"rng": g, "v": b["v"].astype("int64")})
        out = d.groupby("rng").agg(cnt=("v", "size"), s=("v", "sum"))
        return out.reset_index().astype("int64")

    ranges = (
        rev.map_batches(range_partial, batch_format="pandas")
        .to_pandas().groupby("rng")[["cnt", "s"]].sum()
        .sort_index(ascending=False)
    )
    total = int(ranges["s"].sum())
    n = int(ranges["cnt"].sum())

    k0, s0, boundary = 0, 0, None
    for rng, row in ranges.iterrows():
        if den * (s0 + int(row["s"])) >= num * total:
            boundary = int(rng)
            break
        k0 += int(row["cnt"])
        s0 += int(row["s"])

    k_top, topk = n, total
    if boundary is not None:
        rows = rev.map_batches(
            lambda b: b[(b["v"].astype("int64") // step) == boundary],
            batch_format="pandas",
        ).to_pandas()  # <= fetch_cap rows by construction of `step`
        if len(rows) > fetch_cap:
            raise ValueError("boundary range exceeds fetch_cap; raise step")
        rows = rows.sort_values(["v", "o_custkey"],
                                ascending=[False, False])
        cum, k = s0, k0
        for v in rows["v"].astype("int64"):
            cum += int(v)
            k += 1
            if den * cum >= num * total:
                k_top, topk = k, cum
                break

    return ray.data.from_items([{
        "n": n, "total_cents": total, "k_top": k_top,
        "topk_cents": topk, "k_ppm": k_top * 1_000_000 // n if n else 0,
    }])


def events_sliding_users(sf_dir: str):
    """Sliding-window distinct users: exact count(DISTINCT user) per
    hopping 1-hour window with 15-minute hop — the "active users per
    rolling hour" composition of sliding_window_expand (each event lands
    in 4 windows, vectorized per batch) with the two-phase exact-distinct
    aggregate (no window ever holds its user set in one task).
    -> Dataset(win_start, n_distinct)."""
    from ..stages.groupagg import bucketed_count_distinct
    from ..stages.window import sliding_window_expand

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    expanded = sliding_window_expand(
        ev, ts_col="ts", window=pd.Timedelta(hours=1),
        hop=pd.Timedelta(minutes=15),
    )
    return bucketed_count_distinct(
        expanded, keys=["win_start"], distinct_col="user_id"
    )


def events_user_span(sf_dir: str):
    """First/last-touch attribution per user: the first and last event
    type in (ts, event_id) order plus the activity span in exact µs —
    the attribution table marketing joins against conversions.

    Shape: the ONE-shuffle grouped-window contract (sort only inside a
    user bucket), emitting a single fixed-width row per user.
    -> Dataset(user_id, first_type, last_type, n_events, span_us)."""
    import numpy as np

    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = b.assign(_sbucket=_bucket_of(b["user_id"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "first_type": pd.Series(dtype=object),
                "last_type": pd.Series(dtype=object),
                "n_events": pd.Series(dtype="int64"),
                "span_us": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(["user_id", "ts", "event_id"],
                               kind="mergesort")
        g = b.groupby("user_id", sort=False)
        ts = b["ts"].astype("datetime64[us]").astype("int64")
        first = g.head(1).set_index("user_id")["event_type"]
        last = g.tail(1).set_index("user_id")["event_type"]
        spans = ts.groupby(b["user_id"], sort=False).agg(["min", "max"])
        n = g.size()
        return pd.DataFrame({
            "user_id": n.index.astype("int64"),
            "first_type": first.reindex(n.index).to_numpy(),
            "last_type": last.reindex(n.index).to_numpy(),
            "n_events": n.to_numpy().astype("int64"),
            "span_us": (spans["max"] - spans["min"]).reindex(n.index)
            .to_numpy().astype("int64"),
        })

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def q10_returned_items(sf_dir: str, d1: str = "1997-01-01",
                       d2: str = "1997-07-01", k: int = 20):
    """TPC-H Q10 shape — returned-item revenue: top-k customers by the
    revenue of their 'R'-flagged lineitems on orders placed in a date
    window (reference Q10's returned-item report over a quarter).

    Scale plan (round-4 fused): the per-order revenue reduce and the
    orders join share ONE orderkey-hash-bucketed shuffle — lineitem
    combines 'R' cents per orderkey per batch, date-pruned orders ride as
    (orderkey, custkey) marker rows, and each bucket joins + pre-reduces
    to per-customer partials; the per-customer final is the only other
    shuffle (different key), over one row per (bucket, customer).  Top-k
    BEFORE the dual-plan customer-name attach.  Exact int64 cents
    throughout."""
    import numpy as np
    import pyarrow.dataset as pads

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= d1_ts.to_pydatetime())
        & (pads.field("o_orderdate") < d2_ts.to_pydatetime()),
    ).map_batches(
        lambda b: strip_pd_metadata(
            b[(b["o_orderdate"] >= d1_ts) & (b["o_orderdate"] < d2_ts)][
                ["o_orderkey", "o_custkey"]
            ]
        ),
        batch_format="pandas",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )


    from ..arrowutil import df_to_table

    N_B = 64

    def _okey_bucket(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def returned_cents(b: pd.DataFrame):
        s = b[b["l_returnflag"] == "R"]
        cents = np.floor(
            s["l_extendedprice"].to_numpy()
            * (1.0 - s["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        # per-batch combiner: one (okey, cents-sum) row per order per batch
        out = (
            pd.DataFrame({"o_orderkey": s["l_orderkey"], "cents": cents})
            .groupby("o_orderkey", sort=False, as_index=False).sum()
        ) if len(s) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
        })
        out["o_custkey"] = np.int64(-1)
        out["_qbucket"] = _okey_bucket(out["o_orderkey"])
        return df_to_table(out)

    def order_markers(b: pd.DataFrame):
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "cents": np.int64(0),
            "o_custkey": b["o_custkey"].astype("int64"),
        }) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
        })
        _guard_sentinel(out["o_custkey"], -1, "o_custkey")
        out["_qbucket"] = _okey_bucket(out["o_orderkey"])
        return df_to_table(out)

    def join_reduce(g: pd.DataFrame):
        li_sum = (
            g[g["o_custkey"] == -1]
            .groupby("o_orderkey", sort=False, as_index=False)["cents"].sum()
        )
        od = g.loc[g["o_custkey"] != -1, ["o_orderkey", "o_custkey"]]
        m = od.merge(li_sum, on="o_orderkey", how="inner")
        out = (
            pd.DataFrame({"c_custkey": m["o_custkey"], "cents": m["cents"]})
            .groupby("c_custkey", sort=False, as_index=False).sum()
        ) if len(m) else pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
        })
        return df_to_table(out)

    # fused: per-order reduce + orders join in ONE orderkey shuffle,
    # emitting per-customer partials; the custkey final is the 2nd shuffle
    partials = (
        li.map_batches(returned_cents, batch_format="pandas")
        .union(orders.map_batches(order_markers, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(join_reduce, batch_format="pandas")
        .materialize()
    )
    per_cust = bucketed_groupby_agg(
        partials, keys=["c_custkey"],
        aggs={"revenue_cents": ("cents", "sum")},
    )
    # top-k BEFORE the name lookup (sort keys are in the reduced table),
    # then attach the customer dimension through the capped dual plan;
    # nation is constant-size (25 rows) and rides as a closure map
    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))
    dim = _read(sf_dir, "customer",
                ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"].astype(object),
            "n_name": b["c_nationkey"].astype(int).map(n_name).astype(object),
        })) if len(b) else pd.DataFrame({
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype=object),
            "n_name": pd.Series(dtype=object),
        }),
        batch_format="pandas",
    )
    topk = per_cust.sort(["revenue_cents", "c_custkey"],
                         descending=[True, False]).limit(k)
    # re-sort after the attach (order not preserved; k rows — free)
    return _sorted_small(attach_dim(
        topk, dim, on="c_custkey",
        project=["c_custkey", "c_name", "n_name", "revenue_cents"],
    ), ["revenue_cents", "c_custkey"], [False, True])


def q12_priority_lines(sf_dir: str, d1: str = "1997-01-01",
                       d2: str = "1998-01-01"):
    """TPC-H Q12 shape — shipment-class priority split: per lineitem
    linestatus (this corpus has no shipmode column), how many lines
    shipped in a date window belong to high-priority orders
    (1-URGENT / 2-HIGH) vs everything else.

    Scale plan: lineitem is date-pruned at the reader and carries only
    (orderkey, linestatus); orders collapse to (orderkey, is_high int)
    fixed-width rows; ONE bucketed orderkey join, then the reduce is a
    conditional-count fold over the tiny linestatus domain (high_lines =
    sum(flag), low_lines = count - sum)."""
    import pyarrow.dataset as pads

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= d1_ts.to_pydatetime())
        & (pads.field("l_shipdate") < d2_ts.to_pydatetime()),
    ).map_batches(
        lambda b: strip_pd_metadata(
            b[(b["l_shipdate"] >= d1_ts) & (b["l_shipdate"] < d2_ts)][
                ["l_orderkey", "l_linestatus"]
            ].rename(columns={"l_orderkey": "o_orderkey"})
        ),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        return strip_pd_metadata(pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "is_high": b["o_orderpriority"].isin(
                ["1-URGENT", "2-HIGH"]).astype("int64"),
        }))

    joined = bucketed_join(
        li, orders.map_batches(flag, batch_format="pandas"),
        on="o_orderkey", how="inner",
    ).materialize()
    return bucketed_groupby_agg(
        joined, keys=["l_linestatus"],
        aggs={"high_lines": ("is_high", "sum"),
              "n_lines": (None, "count")},
    ).map_batches(
        lambda b: b.assign(
            low_lines=(b["n_lines"] - b["high_lines"]).astype("int64")
        ),
        batch_format="pandas",
    )


def q15_top_supplier(sf_dir: str, d1: str = "1997-01-01",
                     d2: str = "1997-04-01"):
    """TPC-H Q15 shape — top supplier(s): revenue per supplier over a
    date window, then the supplier(s) achieving the GLOBAL maximum (the
    revenue-view + scalar-subquery max selection).

    Scale plan: lineitem is date-pruned at the reader and folds to one
    (suppkey, cents) row per supplier via combiner + bucketed shuffle —
    the reduced table has one row per supplier, so the global max is a
    driver-side scalar over an already-tiny table (NOT a scan of the
    fact), broadcast back as a filter constant; supplier names arrive
    via one dimension broadcast."""
    import numpy as np
    import pyarrow.dataset as pads

    from ..arrowutil import strip_pd_metadata

    d1_ts, d2_ts = pd.Timestamp(d1), pd.Timestamp(d2)
    from ..runtime import configure

    configure()
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= d1_ts.to_pydatetime())
        & (pads.field("l_shipdate") < d2_ts.to_pydatetime()),
    )

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        s = b[(b["l_shipdate"] >= d1_ts) & (b["l_shipdate"] < d2_ts)]
        c = np.floor(
            s["l_extendedprice"].to_numpy()
            * (1.0 - s["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        return strip_pd_metadata(
            pd.DataFrame({"s_suppkey": s["l_suppkey"], "cents": c})
        )

    per_supp = bucketed_groupby_agg(
        li.map_batches(cents, batch_format="pandas"),
        keys=["s_suppkey"],
        aggs={"total_revenue_cents": ("cents", "sum")},
    ).materialize()
    top = per_supp.max("total_revenue_cents")
    best = per_supp.map_batches(
        lambda b: b[b["total_revenue_cents"] == top],
        batch_format="pandas",
    )
    from ..stages.join import attach_dim

    # deterministic output order for the (possibly tied) max set
    return _sorted_small(attach_dim(
        best, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        on="s_suppkey",
        project=["s_suppkey", "s_name", "total_revenue_cents"],
    ), ["s_suppkey"], [True])


def q17_small_qty_cents(sf_dir: str, brand: str = "Brand#1"):
    """TPC-H Q17 shape — small-quantity-order revenue: for one brand's
    parts, the total revenue of lineitems whose quantity is below 20%% of
    that part's average ordered quantity (the correlated per-part AVG
    subquery), kept integer-exact: qty < sum_qty/(5*cnt) is evaluated as
    5*qty*cnt < sum_qty (quantities are integral in this corpus).

    Scale plan: part is a dimension — the brand's partkeys attach as a
    key-only semi-join through the capped dual plan (join.attach_dim);
    the surviving lineitems fold to one (partkey, sum_qty, cnt) row per
    part, which joins BACK to the same filtered lines via one bucketed
    partkey join (fact⋈fold, the correlated-aggregate shape); the final
    answer is a one-row fold."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim, bucketed_join

    brand_keys = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: strip_pd_metadata(
            b.loc[b["p_brand"] == brand, ["p_partkey"]]
            .rename(columns={"p_partkey": "l_partkey"}))
        if len(b) else pd.DataFrame({"l_partkey": pd.Series(dtype="int64")}),
        batch_format="pandas",
    )
    li = attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        brand_keys, on="l_partkey",
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        return strip_pd_metadata(pd.DataFrame({
            "p_partkey": b["l_partkey"],
            "qty": b["l_quantity"].astype("int64"),
            "price_cents": np.floor(
                b["l_extendedprice"].to_numpy() * 100.0).astype("int64"),
        })) if len(b) else pd.DataFrame({
            "p_partkey": pd.Series(dtype="int64"),
            "qty": pd.Series(dtype="int64"),
            "price_cents": pd.Series(dtype="int64"),
        })

    lines = li.map_batches(keep, batch_format="pandas").materialize()
    folds = bucketed_groupby_agg(
        lines, keys=["p_partkey"],
        aggs={"sum_qty": ("qty", "sum"), "cnt": (None, "count")},
    ).materialize()
    joined = bucketed_join(lines, folds, on="p_partkey", how="inner",
                           small_side="right")

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        m = 5 * b["qty"] * b["cnt"] < b["sum_qty"]
        return pd.DataFrame({
            "small_qty_cents": [int(b.loc[m, "price_cents"].sum())],
            "n_small_lines": [int(m.sum())],
        })

    def refold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "small_qty_cents": [int(b["small_qty_cents"].sum())],
            "n_small_lines": [int(b["n_small_lines"].sum())],
        })

    return (
        joined.map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(refold, batch_format="pandas")
    )


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive predicate arms: revenue from
    lineitems matching ANY of three (brand, size-range, quantity-range)
    arm predicates (the multi-arm OR join that defeats naive predicate
    pushdown), reported per arm plus the OR-total.

    Scale plan: part is a dimension — its (brand, size) attributes attach
    through the capped dual plan (join.attach_dim: broadcast Arrow join
    under the cap, bucketed shuffle above); lineitem evaluates all three
    arms vectorized in ONE scan and folds to a 4-row counter table
    (arm1/arm2/arm3/any); rows matching several arms count in each arm
    but once in the total."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim

    ARMS = [
        ("arm1", "Brand#1", 1, 15, 1, 20),
        ("arm2", "Brand#2", 10, 30, 5, 30),
        ("arm3", "Brand#3", 20, 50, 10, 40),
    ]
    attrs = _read(sf_dir, "part",
                  ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_partkey": b["p_partkey"],
            "p_brand": b["p_brand"].astype(object),
            "p_size": b["p_size"].astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_partkey": pd.Series(dtype="int64"),
            "p_brand": pd.Series(dtype=object),
            "p_size": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )
    li = attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]),
        attrs, on="l_partkey",
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        brands = b["p_brand"]
        sizes = b["p_size"].astype("int64")
        qty = b["l_quantity"].astype("int64").to_numpy()
        cents = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        rows = []
        any_mask = np.zeros(len(b), dtype=bool)
        for name, brand, s_lo, s_hi, q_lo, q_hi in ARMS:
            m = (
                (brands == brand).to_numpy()
                & (sizes.to_numpy() >= s_lo) & (sizes.to_numpy() <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
            any_mask |= m
            rows.append((name, int(cents[m].sum()), int(m.sum())))
        rows.append(("any", int(cents[any_mask].sum()),
                     int(any_mask.sum())))
        return strip_pd_metadata(pd.DataFrame({
            "arm": [r[0] for r in rows],
            "revenue_cents": pd.Series([r[1] for r in rows], dtype="int64"),
            "n_lines": pd.Series([r[2] for r in rows], dtype="int64"),
        }))

    parts = li.map_batches(partial, batch_format="pandas")
    return bucketed_groupby_agg(
        parts, keys=["arm"],
        aggs={"revenue_cents": ("revenue_cents", "sum"),
              "n_lines": ("n_lines", "sum")},
    )


def q21_waiting_supplier(sf_dir: str, k: int = 10):
    """TPC-H Q21 shape — the lone-laggard supplier: on finalized ('F')
    multi-supplier orders, the supplier who ALONE shipped last (this
    corpus has no commit/receipt dates, so "kept the order waiting" =
    holds the order's max shipdate and is the only supplier at that max
    — the same exists/not-exists composition as the reference Q21).

    Scale plan — ONE fused orderkey shuffle (round 4; the previous plan
    ran FIVE sequential shuffles all keyed on o_orderkey — per-(o,s) max,
    per-order reduce, F-semi-join, the at-max join and the lone reduce —
    the exact one-partitioning-key-reused-everywhere case):

    (1) lineitem COMBINES per batch to (okey, skey, max ship) rows and
        F-orders contribute key-only marker rows, all bucketed by
        hash(okey) into the SAME shuffle;
    (2) inside each bucket every per-order step is a vectorized pandas
        groupby chain — per-(o,s) max, order max + supplier count,
        F-gate, at-max filter on >= 2-supplier orders, lone laggard
        (exactly one at-max supplier) — emitting one s_suppkey row per
        waiting order;
    (3) one tiny supplier-keyed reduce counts waiting orders; top-k
        BEFORE the name lookup, dual-plan dimension attach."""

    from ..arrowutil import df_to_table

    N_B = 64

    def li_combine(b: pd.DataFrame):
        # per-batch combiner: only the per-(okey, skey) max can win
        out = (
            pd.DataFrame({
                "o_orderkey": b["l_orderkey"],
                "s_suppkey": b["l_suppkey"],
                "ship": b["l_shipdate"],
            })
            .groupby(["o_orderkey", "s_suppkey"], sort=False, as_index=False)
            .max()
        ) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "s_suppkey": pd.Series(dtype="int64"),
            "ship": pd.Series(dtype="datetime64[us]"),
        })
        _guard_sentinel(out["s_suppkey"], -1, "s_suppkey")
        out["_qbucket"] = bucket_ints(out["o_orderkey"], N_B)
        return df_to_table(out)

    def f_markers(b: pd.DataFrame):
        keys = b.loc[b["o_orderstatus"] == "F", ["o_orderkey"]]
        out = pd.DataFrame({
            "o_orderkey": keys["o_orderkey"],
            "s_suppkey": np.int64(-1),
            "ship": pd.NaT,
        }) if len(keys) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "s_suppkey": pd.Series(dtype="int64"),
            "ship": pd.Series(dtype="datetime64[us]"),
        })
        out["_qbucket"] = bucket_ints(out["o_orderkey"], N_B)
        return df_to_table(out)

    def lone_per_bucket(g: pd.DataFrame):
        f_keys = g.loc[g["s_suppkey"] == -1, "o_orderkey"].unique()
        li_rows = g[g["s_suppkey"] != -1]
        li_rows = li_rows[li_rows["o_orderkey"].isin(f_keys)]
        per_os = li_rows.groupby(
            ["o_orderkey", "s_suppkey"], sort=False, as_index=False
        )["ship"].max()
        grp = per_os.groupby("o_orderkey", sort=False)
        order_max = grp["ship"].transform("max")
        n_supp = grp["s_suppkey"].transform("size")
        at_max = per_os[(per_os["ship"] == order_max) & (n_supp >= 2)]
        lone = at_max.groupby("o_orderkey", sort=False).agg(
            n=("s_suppkey", "size"), s=("s_suppkey", "min"))
        lone = lone[lone["n"] == 1]
        return df_to_table(pd.DataFrame({
            "s_suppkey": lone["s"].astype("int64").reset_index(drop=True)
        }))

    import numpy as np

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    lone = (
        li.map_batches(li_combine, batch_format="pandas")
        .union(orders.map_batches(f_markers, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(lone_per_bucket, batch_format="pandas")
        .materialize()
    )
    per_supp = bucketed_groupby_agg(
        lone, keys=["s_suppkey"], aggs={"numwait": (None, "count")}
    )
    # top-k BEFORE the name lookup (sort keys need no dimension column),
    # so the dual-plan attach labels k rows, never the supplier universe
    from ..stages.join import attach_dim

    topk = per_supp.sort(["numwait", "s_suppkey"],
                         descending=[True, False]).limit(k)
    # re-sort AFTER the dimension attach: neither attach plan preserves
    # row order, and the documented output order is top-k (ADVICE r4);
    # k rows, so the trailing sort is free
    return _sorted_small(attach_dim(
        topk, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        on="s_suppkey", project=["s_suppkey", "s_name", "numwait"],
    ), ["numwait", "s_suppkey"], [False, True])


def q22_idle_customers(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape — the global-scalar + anti-join prospect report:
    per market segment, customers whose account balance exceeds the
    average POSITIVE balance (the scalar subquery) and who have placed
    no order since a cutoff date (the NOT EXISTS, widened from Q22's
    no-orders-ever because this synthetic corpus gives every customer at
    least one order).

    Scale plan: the balance average broadcasts as TWO integers
    (sum_cents, n) and the comparison is the exact cross-multiplication
    bal_cents * n > sum_cents — no float average on either engine;
    recent orders fold to one (custkey, last_order) row via combiner +
    bucketed shuffle; customers LEFT-join that profile (bucketed,
    fixed-width) so never-matched rows survive as idle; the final
    per-segment reduce is tiny."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    cutoff_ts = pd.Timestamp(cutoff)
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["c_acctbal"].to_numpy() * 100.0).astype("int64")
        pos = cents[cents > 0]
        return pd.DataFrame({"sum_cents": [int(pos.sum())],
                             "n_pos": [int(len(pos))]})

    stats = (
        cust.map_batches(bal_partial, batch_format="pandas")
        .repartition(1)
        .map_batches(
            lambda b: pd.DataFrame({
                "sum_cents": [int(b["sum_cents"].sum())],
                "n_pos": [int(b["n_pos"].sum())],
            }),
            batch_format="pandas",
        )
        .to_pandas()
    )
    sum_cents, n_pos = int(stats["sum_cents"][0]), int(stats["n_pos"][0])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    last = bucketed_groupby_agg(
        orders.map_batches(
            lambda b: strip_pd_metadata(
                b.rename(columns={"o_custkey": "c_custkey"})),
            batch_format="pandas",
        ),
        keys=["c_custkey"],
        aggs={"last_order": ("o_orderdate", "max")},
    ).materialize()
    joined = bucketed_join(cust, last, on="c_custkey", how="left")

    def idle(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["c_acctbal"].to_numpy() * 100.0).astype("int64")
        rich = cents * n_pos > sum_cents
        no_recent = b["last_order"].isna() | (b["last_order"] < cutoff_ts)
        s = b[rich & no_recent.to_numpy()]
        if not len(s):
            # typed ARROW empty block: a pandas empty frame (even with
            # StringDtype) still trips Ray's batch-size estimator
            # (np.vectorize on size-0 input) — df_to_table never does
            from ..arrowutil import df_to_table

            return df_to_table(pd.DataFrame({
                "c_mktsegment": pd.Series(dtype=object),
                "bal_cents": pd.Series(dtype="int64"),
            }))
        return strip_pd_metadata(pd.DataFrame({
            "c_mktsegment": s["c_mktsegment"],
            "bal_cents": np.round(
                s["c_acctbal"].to_numpy() * 100.0).astype("int64"),
        }))

    kept = joined.map_batches(idle, batch_format="pandas").materialize()
    return bucketed_groupby_agg(
        kept, keys=["c_mktsegment"],
        aggs={"n_cust": (None, "count"),
              "total_bal_cents": ("bal_cents", "sum")},
    )


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_2"):
    """TPC-H Q8 shape — national market share: within the orders of one
    REGION's customers, the ppm share of revenue supplied by one target
    NATION, per order year (the two-sided nation-stamp + share-of-total
    report).

    Scale plan: region/nation/customer/supplier are dimensions —
    in-region custkeys and the target nation's suppkeys broadcast as
    frozensets; orders keep only in-region rows as (orderkey, year);
    lineitem folds its revenue to (orderkey, target_cents, total_cents)
    fixed-width rows; ONE bucketed orderkey join, then the reduce is a
    per-year two-counter fold.  Share = target*1e6 // total, integer on
    both engines."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_key = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(
        nat.loc[nat["n_regionkey"] == region_key, "n_nationkey"].tolist())
    target_key = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])

    # region-filtered customer keys and the target-nation supplier flag
    # attach through the capped dual plan (region/nation literals are
    # constant-size closures; customer/supplier never pull to the driver)
    from ..stages.join import attach_dim

    region_custkeys = _read(sf_dir, "customer",
                            ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(
            b.loc[b["c_nationkey"].isin(region_nations), ["c_custkey"]]
            .rename(columns={"c_custkey": "o_custkey"}))
        if len(b) else pd.DataFrame({"o_custkey": pd.Series(dtype="int64")}),
        batch_format="pandas",
    )
    target_flags = _read(sf_dir, "supplier",
                         ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_suppkey": b["s_suppkey"],
            "is_target": (b["s_nationkey"].astype("int64") == target_key)
            .astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_suppkey": pd.Series(dtype="int64"),
            "is_target": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )

    orders = attach_dim(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
        region_custkeys, on="o_custkey",
    )

    def order_year(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "o_year": b["o_orderdate"].dt.year.astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    li = attach_dim(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        target_flags, on="l_suppkey",
    )

    def li_cents(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        is_target = b["is_target"].to_numpy() == 1
        return strip_pd_metadata(pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "target_cents": np.where(is_target, cents, 0),
            "total_cents": cents,
        }))

    per_order = bucketed_groupby_agg(
        li.map_batches(li_cents, batch_format="pandas"),
        keys=["o_orderkey"],
        aggs={"target_cents": ("target_cents", "sum"),
              "total_cents": ("total_cents", "sum")},
    ).materialize()
    joined = bucketed_join(
        orders.map_batches(order_year, batch_format="pandas"),
        per_order, on="o_orderkey", how="inner",
    ).materialize()
    per_year = bucketed_groupby_agg(
        joined, keys=["o_year"],
        aggs={"target_cents": ("target_cents", "sum"),
              "total_cents": ("total_cents", "sum")},
    )
    return per_year.map_batches(
        lambda b: b.assign(
            share_ppm=(b["target_cents"] * 1_000_000
                       // b["total_cents"]).astype("int64")
        ),
        batch_format="pandas",
    )


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 shape — product-type profit: profit per (supplier
    nation, order year), with cost proxied by the part's retail price ×
    quantity (this corpus has no partsupp/supplycost table):
    profit_cents = floor(extprice*(1-disc)*100) - round(retail*100)*qty.

    Scale plan: part and supplier are dimensions — partkey->retail_cents
    and suppkey->nationkey attach through the capped dual plan
    (join.attach_dim); lineitem stamps nation + profit in one scan and
    folds to (orderkey, nation, cents) combiner rows; orders carry
    (orderkey, year); ONE bucketed orderkey join, then the (nation, year)
    reduce is tiny; nation names via one final broadcast (nation is
    constant-size, 25 rows)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim, bucketed_join

    retail = _read(sf_dir, "part",
                   ["p_partkey", "p_retailprice"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_partkey": b["p_partkey"],
            "retail_cents": np.round(
                b["p_retailprice"].to_numpy() * 100.0).astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_partkey": pd.Series(dtype="int64"),
            "retail_cents": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )
    supp_nat = _read(sf_dir, "supplier",
                     ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_suppkey": b["s_suppkey"],
            "n_nationkey": b["s_nationkey"].astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_suppkey": pd.Series(dtype="int64"),
            "n_nationkey": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()

    li = attach_dim(
        attach_dim(
            _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                   "l_extendedprice", "l_discount"]),
            retail, on="l_partkey",
        ),
        supp_nat, on="l_suppkey",
    )

    def profit(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(
            b["l_extendedprice"].to_numpy()
            * (1.0 - b["l_discount"].to_numpy()) * 100.0
        ).astype("int64")
        cost = (
            b["retail_cents"].to_numpy().astype("int64")
            * b["l_quantity"].astype("int64").to_numpy()
        )
        return strip_pd_metadata(pd.DataFrame({
            "o_orderkey": b["l_orderkey"],
            "n_nationkey": b["n_nationkey"].astype("int64"),
            "profit_cents": rev - cost,
        }))

    # round-4 fused plan: the per-(order, nation) profit reduce and the
    # order-year join share ONE orderkey-hash-bucketed shuffle (the
    # q10/q21 one-key-reused fusion); buckets emit per-(nation, year)
    # partials carrying the n_orders count, so the final reduce is tiny

    N_B = 64

    def _okb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    from ..arrowutil import df_to_table

    def li_rows(b: pd.DataFrame):
        p = profit(b)
        if not isinstance(p, pd.DataFrame):  # strip_pd_metadata -> pa.Table
            p = p.to_pandas()
        out = (
            p.groupby(["o_orderkey", "n_nationkey"], sort=False,
                      as_index=False)["profit_cents"].sum()
        ) if len(p) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "n_nationkey": pd.Series(dtype="int64"),
            "profit_cents": pd.Series(dtype="int64"),
        })
        _guard_sentinel(out["n_nationkey"], -1, "n_nationkey")
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def year_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "n_nationkey": np.int64(-1),
            "profit_cents": b["o_orderdate"].dt.year.astype("int64"),
        }) if len(b) else pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "n_nationkey": pd.Series(dtype="int64"),
            "profit_cents": pd.Series(dtype="int64"),
        })
        out["_qbucket"] = _okb(out["o_orderkey"])
        return df_to_table(out)

    def ny_per_bucket(g: pd.DataFrame):
        yrs = g.loc[g["n_nationkey"] == -1,
                    ["o_orderkey", "profit_cents"]].rename(
            columns={"profit_cents": "o_year"})
        pk = g[g["n_nationkey"] != -1]
        pk = (
            pk.groupby(["o_orderkey", "n_nationkey"], sort=False,
                       as_index=False)["profit_cents"].sum()
        )
        m = pk.merge(yrs, on="o_orderkey", how="inner")
        out = (
            m.groupby(["n_nationkey", "o_year"], sort=False)
            .agg(profit_cents=("profit_cents", "sum"),
                 n_orders=("o_orderkey", "size"))
            .reset_index()
        ) if len(m) else pd.DataFrame({
            "n_nationkey": pd.Series(dtype="int64"),
            "o_year": pd.Series(dtype="int64"),
            "profit_cents": pd.Series(dtype="int64"),
            "n_orders": pd.Series(dtype="int64"),
        })
        if len(out):
            out["n_orders"] = out["n_orders"].astype("int64")
        return df_to_table(out)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    partials = (
        li.map_batches(li_rows, batch_format="pandas")
        .union(orders.map_batches(year_rows, batch_format="pandas"))
        .groupby("_qbucket")
        .map_groups(ny_per_bucket, batch_format="pandas")
        .materialize()
    )
    per_ny = bucketed_groupby_agg(
        partials, keys=["n_nationkey", "o_year"],
        aggs={"profit_cents": ("profit_cents", "sum"),
              "n_orders": ("n_orders", "sum")},
    )
    return broadcast_join(per_ny, nation, on="n_nationkey").map_batches(
        lambda b: b[["n_name", "o_year", "profit_cents", "n_orders"]],
        batch_format="pandas",
    )


def events_ohlc(sf_dir: str):
    """Daily OHLC candles per event type — open/high/low/close of the
    event value over tumbling calendar days (the time-series rollup
    behind any metrics dashboard), exact: values live on the integer
    cents grid and open/close are picked by the deterministic
    (ts, event_id) order.

    Shape: the ONE-shuffle grouped-window contract — rows route to a
    (event_type, day)-hashed bucket, the ordered first/last/min/max are
    computed inside the bucket, one fixed-width row per candle comes
    out.  -> Dataset(event_type, day, open_cents, high_cents, low_cents,
    close_cents, n_events)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["event_type", "ts", "event_id", "value"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].dt.floor("D")
        out = b.assign(
            day=day,
            cents=np.round(b["value"].to_numpy() * 100.0).astype("int64"),
            _sbucket=_bucket_of(
                b["event_type"].astype(str) + "|" + day.astype(str), 64
            ),
        )[["event_type", "day", "ts", "event_id", "cents", "_sbucket"]]
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "day": pd.Series(dtype="datetime64[us]"),
                "open_cents": pd.Series(dtype="int64"),
                "high_cents": pd.Series(dtype="int64"),
                "low_cents": pd.Series(dtype="int64"),
                "close_cents": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(["event_type", "day", "ts", "event_id"],
                               kind="mergesort")
        g = b.groupby(["event_type", "day"], sort=False)
        first = g.head(1).set_index(["event_type", "day"])["cents"]
        last = g.tail(1).set_index(["event_type", "day"])["cents"]
        agg = g["cents"].agg(["max", "min", "size"])
        idx = agg.index
        return pd.DataFrame({
            "event_type": idx.get_level_values(0).to_numpy(),
            "day": idx.get_level_values(1).astype("datetime64[us]"),
            "open_cents": first.reindex(idx).to_numpy().astype("int64"),
            "high_cents": agg["max"].to_numpy().astype("int64"),
            "low_cents": agg["min"].to_numpy().astype("int64"),
            "close_cents": last.reindex(idx).to_numpy().astype("int64"),
            "n_events": agg["size"].to_numpy().astype("int64"),
        })

    return (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def lineitem_quantile_cont(sf_dir: str, pcts: list[int] = (25, 50, 75, 90)):
    """Interpolated global percentiles (percentile_cont semantics) of the
    lineitem price on the integer cents grid, exact in micro-units — the
    continuous companion of price_global_quantiles' discrete selection.

    Scale shape: quantile_cont_micro — one count pass + histogram-
    refinement selection of ONLY the <= 2*|pcts| neighbor order
    statistics; no global sort, driver state = bin counts."""
    import numpy as np

    from ..stages.groupagg import quantile_cont_micro

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return quantile_cont_micro(
        li, "l_extendedprice", list(pcts),
        quant=lambda col: pd.Series(
            np.floor(col.to_numpy() * 100.0).astype("int64")),
    )


def events_drawdown(sf_dir: str):
    """Maximum drawdown per event type over the daily close series — the
    running-max-minus-current scan reduction (the risk metric shape:
    cumulative max, deficit, global max deficit), exact on the cents
    grid with the deterministic (ts, event_id) close.

    Shape: the daily closes come out of the OHLC grouped-window pass
    (one shuffle); the per-type day series is tiny (one row per
    (type, day)), so the drawdown scan runs inside a second grouped
    window keyed on type alone.  -> Dataset(event_type, n_days,
    max_drawdown_cents, peak_cents)."""
    from ..stages.window import _bucket_of

    closes = events_ohlc(sf_dir)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = b[["event_type", "day", "close_cents"]].assign(
            _sbucket=_bucket_of(b["event_type"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "n_days": pd.Series(dtype="int64"),
                "max_drawdown_cents": pd.Series(dtype="int64"),
                "peak_cents": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(["event_type", "day"], kind="mergesort")
        g = b.groupby("event_type", sort=False)
        run_max = g["close_cents"].cummax()
        dd = run_max - b["close_cents"]
        agg = pd.DataFrame({
            "event_type": b["event_type"],
            "dd": dd,
            "peak": b["close_cents"],
        }).groupby("event_type", sort=False).agg(
            n_days=("dd", "size"),
            max_drawdown_cents=("dd", "max"),
            peak_cents=("peak", "max"),
        ).reset_index()
        for c in ("n_days", "max_drawdown_cents", "peak_cents"):
            agg[c] = agg[c].astype("int64")
        return agg

    return (
        closes.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def q2_min_cost_supplier(sf_dir: str, k: int = 20):
    """TPC-H Q2 shape — the correlated-MIN equality join: for every part,
    the supplier(s) offering the minimum unit price (this corpus has no
    partsupp/supplycost table, so unit cost derives from lineitem:
    min over a supplier's lines of floor(100*extendedprice)//qty), then
    the (part, supplier) rows achieving that part's minimum, top-k by
    (partkey, suppkey).

    Scale plan: lineitem folds to one (part, supp, unit_cents) row per
    observed pair via combiner + bucketed shuffle; the per-part MIN is a
    second small grouped reduce; the equality join back is one bucketed
    partkey join of two already-reduced tables; names arrive by
    dimension broadcast.  Integer unit price (floor division) on both
    engines."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def unit(b: pd.DataFrame) -> pd.DataFrame:
        qty = b["l_quantity"].astype("int64").to_numpy()
        cents = np.floor(b["l_extendedprice"].to_numpy() * 100.0).astype("int64")
        return strip_pd_metadata(pd.DataFrame({
            "p_partkey": b["l_partkey"],
            "s_suppkey": b["l_suppkey"],
            "unit_cents": cents // qty,
        }))

    # pins between the hash shuffles (q4 note)
    per_ps = bucketed_groupby_agg(
        li.map_batches(unit, batch_format="pandas"),
        keys=["p_partkey", "s_suppkey"],
        aggs={"unit_cents": ("unit_cents", "min")},
    ).materialize()
    per_p = bucketed_groupby_agg(
        per_ps, keys=["p_partkey"],
        aggs={"min_cents": ("unit_cents", "min")},
    ).materialize()
    joined = bucketed_join(per_ps, per_p, on="p_partkey", how="inner",
                           small_side="right")
    best = joined.map_batches(
        lambda b: b[b["unit_cents"] == b["min_cents"]][
            ["p_partkey", "s_suppkey", "unit_cents"]],
        batch_format="pandas",
    )
    # top-k first (sort keys are the join keys themselves), then label the
    # k rows through the dual-plan attaches — neither dimension is pulled
    from ..stages.join import attach_dim

    topk = best.sort(["p_partkey", "s_suppkey"]).limit(k).materialize()
    named = attach_dim(
        attach_dim(topk, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
                   on="s_suppkey"),
        _read(sf_dir, "part", ["p_partkey", "p_name"]),
        on="p_partkey",
        project=["p_partkey", "p_name", "s_suppkey", "s_name", "unit_cents"],
    )
    # re-sort after the attaches: attach plans don't preserve order and
    # the documented output order is (p_partkey, s_suppkey); k rows
    return _sorted_small(named, ["p_partkey", "s_suppkey"], [True, True])


def q20_part_share_suppliers(sf_dir: str, num: int = 1, den: int = 5):
    """TPC-H Q20 shape — the nested-aggregate semi-join: suppliers who
    shipped MORE than num/den (default a fifth) of some part's total
    shipped quantity (the excess-stock supplier probe), with the share
    test kept integer: den·supp_qty > num·part_qty.

    Scale plan (round-4 fused): lineitem pre-combines (part, supp, qty)
    per batch and ONE partkey-hash-bucketed shuffle does everything
    per-part — the (part, supp) reduce, the part total, and the integer
    share test den·supp_qty > num·part_qty — emitting per-supplier
    partial domination counts; the only other shuffle is the tiny
    supplier final, then the dual-plan name attach.
    -> Dataset(s_suppkey, s_name, n_dominated_parts)."""

    from ..arrowutil import df_to_table

    N_B = 64

    def _pkb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_ints(s, N_B), index=s.index)

    def fold(b: pd.DataFrame):
        out = (
            pd.DataFrame({
                "p_partkey": b["l_partkey"],
                "s_suppkey": b["l_suppkey"],
                "qty": b["l_quantity"].astype("int64"),
            })
            .groupby(["p_partkey", "s_suppkey"], sort=False, as_index=False)
            .sum()
        ) if len(b) else pd.DataFrame({
            "p_partkey": pd.Series(dtype="int64"),
            "s_suppkey": pd.Series(dtype="int64"),
            "qty": pd.Series(dtype="int64"),
        })
        out["_qbucket"] = _pkb(out["p_partkey"])
        return df_to_table(out)

    def dominate_per_bucket(g: pd.DataFrame):
        per_ps = g.groupby(["p_partkey", "s_suppkey"], sort=False,
                           as_index=False)["qty"].sum()
        part_qty = per_ps.groupby("p_partkey", sort=False)["qty"]\
            .transform("sum")
        dom = per_ps[den * per_ps["qty"] > num * part_qty]
        out = (
            dom.groupby("s_suppkey", sort=False)
            .size().rename("n").reset_index()
        ) if len(dom) else pd.DataFrame({
            "s_suppkey": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
        })
        if len(out):
            out["n"] = out["n"].astype("int64")
        return df_to_table(out)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity"])
    partials = (
        li.map_batches(fold, batch_format="pandas")
        .groupby("_qbucket")
        .map_groups(dominate_per_bucket, batch_format="pandas")
        .materialize()
    )
    per_supp = bucketed_groupby_agg(
        partials, keys=["s_suppkey"],
        aggs={"n_dominated_parts": ("n", "sum")},
    )
    from ..stages.join import attach_dim

    return attach_dim(
        per_supp, _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        on="s_suppkey",
        project=["s_suppkey", "s_name", "n_dominated_parts"],
    )


def basket_part_triples(sf_dir: str, k: int = 20, min_pair_support: int = 2,
                        max_basket: int = 64):
    """A-Priori round 2 — frequent part TRIPLES: candidate triples are
    generated only inside baskets, but counted only when ALL THREE member
    pairs are frequent (support >= min_pair_support) — the classic
    candidate-pruning step that keeps the lattice from exploding.  Top-k
    triples by (support desc, pa, pb, pc).

    Scale plan: round 1 (pair supports) is basket_part_pairs' bounded
    in-basket enumeration + combiner reduce; the frequent-pair SET is a
    tiny broadcast (it shrinks with min_support by A-Priori's own
    argument); round 2 re-scans baskets once, emits only triples whose 3
    pairs are all frequent, and folds through the same combiner reduce.
    -> Dataset(pa, pb, pc, support, rank)."""

    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.groupagg import bucketed_groupby_agg
    from ..stages.window import grouped_topk

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o": b["l_orderkey"].astype("int64"),
             "p": b["l_partkey"].astype("int64")}
        )
        out["_bucket"] = bucket_ints(out["o"], 64)
        return strip_pd_metadata(out) if len(out) else out

    buckets = (
        li.map_batches(add_bucket, batch_format="pandas").materialize()
    )

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        pa_, pb_ = [], []
        for _, g in bucket.groupby("o", sort=False):
            parts = sorted(set(int(x) for x in g["p"]))
            if len(parts) < 2 or len(parts) > max_basket:
                continue
            for i in range(len(parts)):
                for j in range(i + 1, len(parts)):
                    pa_.append(parts[i])
                    pb_.append(parts[j])
        return pd.DataFrame(
            {"pa": np.asarray(pa_, dtype=np.int64),
             "pb": np.asarray(pb_, dtype=np.int64)}
        )

    pair_support = bucketed_groupby_agg(
        buckets.groupby("_bucket").map_groups(pairs, batch_format="pandas")
        .repartition(8),
        keys=["pa", "pb"],
        aggs={"support": (None, "count")},
    ).materialize()
    freq = pair_support.map_batches(
        lambda b: b[b["support"] >= min_pair_support][["pa", "pb"]],
        batch_format="pandas",
    ).to_pandas()
    freq_set = ray.put(frozenset(zip(freq["pa"], freq["pb"])))

    def triples(bucket: pd.DataFrame) -> pd.DataFrame:
        fs = ray.get(freq_set)
        pa_, pb_, pc_ = [], [], []
        for _, g in bucket.groupby("o", sort=False):
            parts = sorted(set(int(x) for x in g["p"]))
            if len(parts) < 3 or len(parts) > max_basket:
                continue
            n = len(parts)
            for i in range(n):
                for j in range(i + 1, n):
                    if (parts[i], parts[j]) not in fs:
                        continue
                    for m in range(j + 1, n):
                        if ((parts[j], parts[m]) in fs
                                and (parts[i], parts[m]) in fs):
                            pa_.append(parts[i])
                            pb_.append(parts[j])
                            pc_.append(parts[m])
        return pd.DataFrame(
            {"pa": np.asarray(pa_, dtype=np.int64),
             "pb": np.asarray(pb_, dtype=np.int64),
             "pc": np.asarray(pc_, dtype=np.int64)}
        )

    support = bucketed_groupby_agg(
        buckets.groupby("_bucket").map_groups(triples, batch_format="pandas")
        .repartition(8),
        keys=["pa", "pb", "pc"],
        aggs={"support": (None, "count")},
    )
    scored = support.map_batches(
        lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
    )
    top = grouped_topk(
        scored, keys=["_g"], order_col="support", k=k,
        tie_cols=["pa", "pb", "pc"],
    )
    return top.map_batches(
        lambda b: b[["pa", "pb", "pc", "support", "rank"]],
        batch_format="pandas",
    )


def events_rolling_7d(sf_dir: str):
    """Rolling 7-day revenue per event type — the RANGE-frame window
    (value-based frame over days, NOT a row count: gaps in the calendar
    shrink the window), exact integer cents.

    Shape: daily totals come from one combiner-backed grouped sum (the
    only fact-sized shuffle); the per-type day series is tiny, so the
    rolling sum runs vectorized inside a type-bucketed grouped window
    (prefix sums + a searchsorted left edge at day-6).
    -> Dataset(event_type, day, day_cents, rolling_7d_cents)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return strip_pd_metadata(pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["ts"].dt.floor("D"),
            "cents": np.round(b["value"].to_numpy() * 100.0).astype("int64"),
        }))

    daily = bucketed_groupby_agg(
        ev.map_batches(fold, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"day_cents": ("cents", "sum")},
    ).materialize()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_sbucket=_bucket_of(b["event_type"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "day": pd.Series(dtype="datetime64[us]"),
                "day_cents": pd.Series(dtype="int64"),
                "rolling_7d_cents": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(["event_type", "day"], kind="mergesort")
        frames = []
        for _, g in b.groupby("event_type", sort=False):
            days = g["day"].astype("datetime64[us]").astype("int64").to_numpy()
            cents = g["day_cents"].to_numpy()
            cum = np.concatenate([[0], np.cumsum(cents)])
            day_us = 24 * 3600 * 1_000_000
            lo = np.searchsorted(days, days - 6 * day_us, side="left")
            rolling = cum[1 + np.arange(len(days))] - cum[lo]
            frames.append(pd.DataFrame({
                "event_type": g["event_type"].to_numpy(),
                "day": g["day"].astype("datetime64[us]").to_numpy(),
                "day_cents": cents.astype("int64"),
                "rolling_7d_cents": rolling.astype("int64"),
            }))
        return pd.concat(frames, ignore_index=True)

    return (
        daily.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def orders_cdc_compact(sf_dir: str):
    """CDC log compaction — last-writer-wins: collapse a multi-op change
    log (key, seq, op, payload) to the single latest op per key (what a
    replication sink does before cdc_apply).  The change log is
    synthesized deterministically from orders: every %5 key gets
    upsert@1 then delete@2; every %3 (non-%5) key gets upsert@2 after a
    stale upsert@1 with the wrong payload — compaction must keep the
    delete and the FRESH upsert respectively.

    Shape: the ONE-shuffle grouped-window contract (max-seq row per key
    inside a key bucket); exact integer cents payload.
    -> Dataset(o_orderkey, seq, op, price_cents)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.window import _bucket_of

    raw = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def make_log(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"]
        cents = np.round(b["o_totalprice"].to_numpy() * 100.0).astype("int64")
        m5 = (k % 5 == 0).to_numpy()
        m3 = ((k % 3 == 0) & (k % 5 != 0)).to_numpy()
        frames = [
            pd.DataFrame({"o_orderkey": k[m5], "seq": 1, "op": "upsert",
                          "price_cents": cents[m5]}),
            pd.DataFrame({"o_orderkey": k[m5], "seq": 2, "op": "delete",
                          "price_cents": 0}),
            pd.DataFrame({"o_orderkey": k[m3], "seq": 1, "op": "upsert",
                          "price_cents": cents[m3] + 999}),  # stale
            pd.DataFrame({"o_orderkey": k[m3], "seq": 2, "op": "upsert",
                          "price_cents": cents[m3]}),
        ]
        out = pd.concat(frames, ignore_index=True)
        out["seq"] = out["seq"].astype("int64")
        out["price_cents"] = out["price_cents"].astype("int64")
        return strip_pd_metadata(out) if len(out) else out

    log = raw.map_batches(make_log, batch_format="pandas")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_sbucket=_bucket_of(b["o_orderkey"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series(dtype="int64"),
                "seq": pd.Series(dtype="int64"),
                "op": pd.Series(dtype=object),
                "price_cents": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(["o_orderkey", "seq"], kind="mergesort")
        last = b.groupby("o_orderkey", sort=False).tail(1)
        return last[["o_orderkey", "seq", "op", "price_cents"]] \
            .reset_index(drop=True)

    return (
        log.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def orders_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority): order counts + exact min/max
    price at ALL four grouping sets, subtotal keys carried as 'ALL'
    (stages/reshape.cube_agg — one input pass; every coarser set
    re-aggregates the materialized finest table)."""
    from ..stages.reshape import cube_agg

    orders = _read(sf_dir, "orders",
                   ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    return cube_agg(
        orders,
        keys=["o_orderstatus", "o_orderpriority"],
        aggs={
            "n_orders": (None, "count"),
            "min_price": ("o_totalprice", "min"),
            "max_price": ("o_totalprice", "max"),
        },
    )


def lineitem_regression(sf_dir: str):
    """Exact OLS sufficient statistics per return flag — the trend-fit /
    linear-probe reduction (price-cents vs quantity): n, Σx, Σy, Σx²,
    Σxy fold as int64 sums on the cents grid (associative combiner +
    one tiny grouped sum — the classic "train a linear model as an
    aggregation" shape), then slope_ppm = 1e6·(nΣxy−ΣxΣy)/(nΣx²−ΣxΣx)
    computed from those exact integers per group with explicit
    truncate-toward-zero division (DuckDB ``//`` truncates; Python
    floors — the sign-aware abs form makes both engines agree).
    -> Dataset(l_returnflag, n, sum_x, sum_y, sxx, sxy, slope_ppm)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy().astype("int64")
        y = np.floor(b["l_extendedprice"].to_numpy() * 100.0).astype("int64")
        out = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "sum_x": x, "sum_y": y, "sxx": x * x, "sxy": x * y,
        })
        return strip_pd_metadata(out) if len(out) else out

    agg = bucketed_groupby_agg(
        li.map_batches(stats, batch_format="pandas"),
        keys=["l_returnflag"],
        aggs={
            "n": (None, "count"),
            "sum_x": ("sum_x", "sum"),
            "sum_y": ("sum_y", "sum"),
            "sxx": ("sxx", "sum"),
            "sxy": ("sxy", "sum"),
        },
    )

    def fit(b: pd.DataFrame) -> pd.DataFrame:
        # per-group fold over the tiny (one row per flag) stats table;
        # Python ints: n*sxy exceeds int64 at large scale factors
        slopes = []
        for r in b.itertuples(index=False):
            n, sx, sy, sxx, sxy = (int(r.n), int(r.sum_x), int(r.sum_y),
                                   int(r.sxx), int(r.sxy))
            num = n * sxy - sx * sy
            den = n * sxx - sx * sx
            if den == 0:
                slopes.append(0)
            else:
                v = (abs(num) * 1_000_000) // abs(den)
                slopes.append(v if (num >= 0) == (den > 0) else -v)
        out = b.assign(slope_ppm=pd.Series(slopes, dtype="int64",
                                           index=b.index))
        return out[["l_returnflag", "n", "sum_x", "sum_y", "sxx", "sxy",
                    "slope_ppm"]]

    return agg.map_batches(fit, batch_format="pandas")


def events_cusum(sf_dir: str):
    """CUSUM changepoint detection per event type over the daily count
    series: deviation_d = n_days·count_d − total (integer, sums to zero
    over the observed days), cumulative-sum scan, report the day where
    |CUSUM| peaks (tie -> earliest day) — the burst/regime-shift locator
    run next to spike detection.

    Shape: daily counts fold via combiner + one grouped shuffle; the
    per-type day series is tiny (one row per (type, day)), so the scan
    runs inside a second grouped window keyed on type alone — state
    bounded by #days, never #events.
    -> Dataset(event_type, n_days, total, change_day, cusum_at)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def day_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "event_type": b["event_type"],
            "day": b["ts"].dt.floor("D"),
        })
        return strip_pd_metadata(out) if len(out) else out

    daily = bucketed_groupby_agg(
        ev.map_batches(day_rows, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"c": (None, "count")},
    ).materialize()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_sbucket=_bucket_of(b["event_type"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "n_days": pd.Series(dtype="int64"),
                "total": pd.Series(dtype="int64"),
                "change_day": pd.Series(dtype="datetime64[us]"),
                "cusum_at": pd.Series(dtype="int64"),
            })
        rows = []
        b = bucket.sort_values(["event_type", "day"], kind="mergesort")
        for et, g in b.groupby("event_type", sort=False):
            c = g["c"].to_numpy().astype("int64")
            n_days, total = len(c), int(c.sum())
            cusum = np.cumsum(n_days * c - total)
            idx = int(np.argmax(np.abs(cusum)))  # first max -> earliest day
            rows.append((et, n_days, total, g["day"].iloc[idx],
                         int(cusum[idx])))
        return pd.DataFrame(rows, columns=["event_type", "n_days", "total",
                                           "change_day", "cusum_at"])

    return (
        daily.map_batches(add_bucket, batch_format="pandas")
        .groupby("_sbucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def orders_backlog(sf_dir: str):
    """Concurrent open-order count per day (interval stabbing): an order
    is open from o_orderdate through its last line's l_shipdate; the
    running count at each boundary day is the fulfilment-backlog series
    ops dashboards plot.

    Shape: per-order close folds via combiner + one grouped max; the
    interval becomes two +1/−1 delta rows which fold per day (second
    grouped sum) — the scan then runs over the DAY-count-sized delta
    table in one bounded group (state = #distinct days, never #orders).
    -> Dataset(day, open_orders) at every interval boundary day."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    close = bucketed_groupby_agg(
        li.map_batches(
            lambda b: strip_pd_metadata(b.rename(
                columns={"l_orderkey": "o_orderkey"})) if len(b) else b,
            batch_format="pandas"),
        keys=["o_orderkey"],
        aggs={"close_day": ("l_shipdate", "max")},
    ).materialize()

    iv = bucketed_join(orders, close, on="o_orderkey")

    def deltas(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "day": pd.concat(
                [b["o_orderdate"],
                 b["close_day"] + pd.Timedelta(days=1)],
                ignore_index=True),
            "delta": np.concatenate(
                [np.ones(len(b), dtype="int64"),
                 -np.ones(len(b), dtype="int64")]),
        })
        return strip_pd_metadata(out) if len(out) else out

    per_day = bucketed_groupby_agg(
        iv.map_batches(deltas, batch_format="pandas"),
        keys=["day"],
        aggs={"delta": ("delta", "sum")},
    ).materialize()

    def scan(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "day": pd.Series(dtype="datetime64[us]"),
                "open_orders": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values("day", kind="mergesort")
        return pd.DataFrame({
            "day": b["day"],
            "open_orders": b["delta"].to_numpy().astype("int64").cumsum(),
        })

    return (
        per_day.map_batches(
            lambda b: b.assign(_g=np.int64(0)), batch_format="pandas")
        .groupby("_g")
        .map_groups(scan, batch_format="pandas")
    )


def basket_rules(sf_dir: str, min_support: int = 2, max_basket: int = 64):
    """Association rules from the frequent part pairs: confidence in both
    directions and lift, all in integer ppm over the qualifying-basket
    universe (orders holding 2..max_basket distinct parts) — the
    recommendation-rule report layered on basket_part_pairs' support
    counting.

    Shape: ONE order-bucketed grouped pass emits tagged rows (pair /
    item / basket marker) so pair supports, item supports and the basket
    count N all fold from the same shuffle; item supports broadcast
    (parts-table-sized) onto the surviving pairs; every ratio is an
    exact floor division of int64 counts.
    -> Dataset(pa, pb, support, n_a, n_b, n_baskets, conf_a_ppm,
    conf_b_ppm, lift_ppm) for pairs with support >= min_support."""

    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import broadcast_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"o": b["l_orderkey"].astype("int64"),
             "p": b["l_partkey"].astype("int64")}
        )
        out["_bucket"] = bucket_ints(out["o"], 64)
        return strip_pd_metadata(out) if len(out) else out

    def tagged(bucket: pd.DataFrame) -> pd.DataFrame:
        kind, a, bb = [], [], []
        for _, g in bucket.groupby("o", sort=False):
            parts = sorted(set(int(x) for x in g["p"]))
            if len(parts) < 2 or len(parts) > max_basket:
                continue
            kind.append("n"); a.append(-1); bb.append(-1)
            for p in parts:
                kind.append("i"); a.append(p); bb.append(-1)
            for i in range(len(parts)):
                for j in range(i + 1, len(parts)):
                    kind.append("p"); a.append(parts[i]); bb.append(parts[j])
        return pd.DataFrame({
            "kind": pd.Series(kind, dtype=object),
            "a": np.asarray(a, dtype=np.int64),
            "b": np.asarray(bb, dtype=np.int64),
        })

    rows = (
        li.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(tagged, batch_format="pandas")
        .repartition(8)
        .materialize()
    )
    n_baskets = rows.map_batches(
        lambda b: b[b["kind"] == "n"], batch_format="pandas").count()
    support = bucketed_groupby_agg(
        rows.map_batches(
            lambda b: b[b["kind"] == "p"][["a", "b"]]
            .rename(columns={"a": "pa", "b": "pb"}),
            batch_format="pandas"),
        keys=["pa", "pb"],
        aggs={"support": (None, "count")},
    ).map_batches(
        lambda b: b[b["support"] >= min_support].reset_index(drop=True),
        batch_format="pandas",
    )
    item_df = bucketed_groupby_agg(
        rows.map_batches(
            lambda b: b[b["kind"] == "i"][["a"]], batch_format="pandas"),
        keys=["a"],
        aggs={"np": (None, "count")},
    ).to_pandas()  # one row per distinct part — dimension-table-sized

    ia = item_df.rename(columns={"a": "pa", "np": "n_a"})
    ib = item_df.rename(columns={"a": "pb", "np": "n_b"})
    joined = broadcast_join(broadcast_join(support, ia, on="pa"), ib, on="pb")

    def ratios(b: pd.DataFrame) -> pd.DataFrame:
        s = b["support"].astype("int64")
        na = b["n_a"].astype("int64")
        nb = b["n_b"].astype("int64")
        return pd.DataFrame({
            "pa": b["pa"], "pb": b["pb"], "support": s,
            "n_a": na, "n_b": nb,
            "n_baskets": np.int64(n_baskets),
            "conf_a_ppm": s * 1_000_000 // na,
            "conf_b_ppm": s * 1_000_000 // nb,
            "lift_ppm": s * int(n_baskets) * 1_000_000 // (na * nb),
        })

    return joined.map_batches(ratios, batch_format="pandas")


def q11_important_parts(sf_dir: str, regionkey: int = 0, mult: int = 2):
    """TPC-H Q11 shape — parts whose inventory value (proxied by shipped
    lineitem cents from suppliers in ONE region; this schema has no
    partsupp table) exceeds ``mult`` x the MEAN per-part value: the
    HAVING-above-a-global-scalar pattern.  (Q11's literal fraction
    0.0001/SF is scale-dependent by design; the mean-relative threshold
    keeps the result non-empty at every corpus size.)

    Scale plan: the region's supplier set is a dimension broadcast
    applied at the lineitem scan; per-part values fold via combiner +
    one grouped shuffle; the global total and part count are distributed
    scalar folds over the per-part table; the threshold is the exact
    integer cross-multiplication value_cents * n_parts > mult * total —
    no float share ever computed.  -> Dataset(l_partkey, value_cents)."""
    import numpy as np

    from ..arrowutil import strip_pd_metadata

    # region's supplier keys attach as a key-only semi-join through the
    # capped dual plan (nation is a constant 25-row closure map)
    from ..stages.join import attach_dim

    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_regionkey"]).to_pandas()
    region_nations = set(
        nation.loc[nation["n_regionkey"] == regionkey, "n_nationkey"]
        .astype(int)
    )
    region_suppkeys = _read(sf_dir, "supplier",
                            ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(
            b.loc[b["s_nationkey"].astype(int).isin(region_nations),
                  ["s_suppkey"]].rename(columns={"s_suppkey": "l_suppkey"}))
        if len(b) else pd.DataFrame({"l_suppkey": pd.Series(dtype="int64")}),
        batch_format="pandas",
    )

    li = attach_dim(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice"]),
        region_suppkeys, on="l_suppkey",
    )

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_partkey": b["l_partkey"].astype("int64"),
            "cents": np.floor(
                b["l_extendedprice"].to_numpy() * 100.0).astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else pd.DataFrame({
            "l_partkey": pd.Series(dtype="int64"),
            "cents": pd.Series(dtype="int64"),
        })

    per_part = bucketed_groupby_agg(
        li.map_batches(stamp, batch_format="pandas"),
        keys=["l_partkey"],
        aggs={"value_cents": ("cents", "sum")},
    ).materialize()
    total = int(per_part.sum("value_cents") or 0)
    n_parts = per_part.count()

    def above_mean(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["value_cents"] * n_parts > mult * total]
        out = out.reset_index(drop=True)
        if len(out) == 0:
            return pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                                 "value_cents": pd.Series(dtype="int64")})
        return out

    return per_part.map_batches(above_mean, batch_format="pandas")


def q16_supplier_counts(sf_dir: str, excl_regionkey: int = 0):
    """TPC-H Q16 shape — distinct-supplier count per (brand, type, size)
    over a filtered part universe, with an excluded-supplier anti-set
    (suppliers in region ``excl_regionkey`` stand in for the reference's
    'Customer Complaints' comment filter; this schema has no comment
    column).

    Scale plan: the filtered part universe and the excluded-supplier flag
    both attach through the capped dual plan (join.attach_dim) at the
    lineitem scan — fully vectorized (the old partkey->attrs dict walk
    was a per-row Python loop) — with per-batch local dedup; the exact
    distinct count is the standard two-phase grouped reduce (distinct
    pairs, then count) — no count-distinct state on any single node.
    -> Dataset(p_brand, p_type, p_size, supplier_cnt)."""
    from ..arrowutil import strip_pd_metadata
    from ..stages.join import attach_dim

    sizes = {1, 4, 9, 14, 19, 24, 29, 34}

    def part_attrs(b: pd.DataFrame):
        keep = b[(b["p_brand"] != "Brand#1") & (b["p_type"] != "PROMO")
                 & b["p_size"].isin(sizes)]
        out = pd.DataFrame({
            "l_partkey": keep["p_partkey"],
            "p_brand": keep["p_brand"].astype(object),
            "p_type": keep["p_type"].astype(object),
            "p_size": keep["p_size"].astype("int64"),
        }) if len(keep) else pd.DataFrame({
            "l_partkey": pd.Series(dtype="int64"),
            "p_brand": pd.Series(dtype=object),
            "p_type": pd.Series(dtype=object),
            "p_size": pd.Series(dtype="int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    px = _read(sf_dir, "part",
               ["p_partkey", "p_brand", "p_type", "p_size"]).map_batches(
        part_attrs, batch_format="pandas")
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_regionkey"]).to_pandas()
    excl_nations = set(
        nation.loc[nation["n_regionkey"] == excl_regionkey, "n_nationkey"]
        .astype(int)
    )
    supp_flags = _read(sf_dir, "supplier",
                       ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({
            "l_suppkey": b["s_suppkey"],
            "excl": b["s_nationkey"].astype(int).isin(excl_nations)
            .astype("int64"),
        })) if len(b) else pd.DataFrame({
            "l_suppkey": pd.Series(dtype="int64"),
            "excl": pd.Series(dtype="int64"),
        }),
        batch_format="pandas",
    )

    li = attach_dim(
        attach_dim(_read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
                   px, on="l_partkey"),
        supp_flags, on="l_suppkey",
    )

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        out = b.loc[b["excl"] == 0,
                    ["p_brand", "p_type", "p_size", "l_suppkey"]]
        out = pd.DataFrame({
            "p_brand": out["p_brand"].astype(object),
            "p_type": out["p_type"].astype(object),
            "p_size": out["p_size"].astype("int64"),
            "l_suppkey": out["l_suppkey"].astype("int64"),
        }).drop_duplicates(ignore_index=True)  # local dedup pre-shuffle
        return strip_pd_metadata(out) if len(out) else out

    pairs = bucketed_groupby_agg(
        li.map_batches(stamp, batch_format="pandas"),
        keys=["p_brand", "p_type", "p_size", "l_suppkey"],
        aggs={"n_occ": (None, "count")},
    ).materialize()
    return bucketed_groupby_agg(
        pairs.map_batches(
            lambda b: b[["p_brand", "p_type", "p_size"]],
            batch_format="pandas"),
        keys=["p_brand", "p_type", "p_size"],
        aggs={"supplier_cnt": (None, "count")},
    )


def user_top_event(sf_dir: str):
    """Grouped MODE with deterministic tie-break: each user's most
    frequent event type (ties -> lexicographically smallest type) plus
    its count — the per-entity dominant-category reduction (top interest
    / primary device / majority label).

    Scale plan: (user, type) counts fold via combiner + one grouped
    shuffle; the argmax folds in a SECOND user-bucketed reduce whose
    state is one candidate row per (user, type) — never raw events.
    -> Dataset(user_id, top_event, n)."""
    from ..arrowutil import strip_pd_metadata
    from ..stages.window import _bucket_of

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = bucketed_groupby_agg(
        ev, keys=["user_id", "event_type"], aggs={"n": (None, "count")},
    ).materialize()

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_ubucket=_bucket_of(b["user_id"], 64))
        return strip_pd_metadata(out) if len(out) else out

    def argmax(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "top_event": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
            })
        b = bucket.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True], kind="mergesort")
        top = b.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "top_event": top["event_type"],
            "n": top["n"].astype("int64"),
        })

    return (
        counts.map_batches(add_bucket, batch_format="pandas")
        .groupby("_ubucket")
        .map_groups(argmax, batch_format="pandas")
    )


def events_ab_test(sf_dir: str):
    """Deterministic A/B experiment readout: users split by md5(user_id)
    parity (the consistent-hash assignment real experiment platforms
    use — membership is a pure key function, reproducible across runs
    and engines), then per-variant distinct users, event count, exact
    value cents, and floor cents-per-user.

    Scale plan: the variant stamp + cents conversion is a stateless
    vectorized map; distinct users fold via the two-phase grouped
    reduce; counts/sums fold via combiner — two short shuffles over
    (variant[, user]) rows.  -> Dataset(variant, n_users, n_events,
    value_cents, cents_per_user)."""
    import hashlib

    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from ..stages.join import broadcast_join

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        variants = b["user_id"].map(
            lambda u: "A" if int(hashlib.md5(
                str(int(u)).encode()).hexdigest()[:8], 16) % 2 == 0 else "B"
        )
        out = pd.DataFrame({
            "variant": variants,
            "user_id": b["user_id"].astype("int64"),
            "cents": np.floor(b["value"].to_numpy() * 100.0).astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    s = ev.map_batches(stamp, batch_format="pandas").materialize()
    users = bucketed_groupby_agg(
        s.map_batches(lambda b: b[["variant", "user_id"]],
                      batch_format="pandas"),
        keys=["variant", "user_id"], aggs={"n_occ": (None, "count")},
    )
    n_users = bucketed_groupby_agg(
        users.map_batches(lambda b: b[["variant"]], batch_format="pandas"),
        keys=["variant"], aggs={"n_users": (None, "count")},
    )
    totals = bucketed_groupby_agg(
        s, keys=["variant"],
        aggs={"n_events": (None, "count"), "value_cents": ("cents", "sum")},
    )
    joined = broadcast_join(totals, n_users.to_pandas(), on="variant")
    return joined.map_batches(
        lambda b: b.assign(
            cents_per_user=(b["value_cents"].astype("int64")
                            // b["n_users"].astype("int64"))
        )[["variant", "n_users", "n_events", "value_cents",
           "cents_per_user"]],
        batch_format="pandas",
    )


def events_sessions_microbatch(sf_dir: str, gap_minutes: int = 30,
                               n_slices: int = 4):
    """STREAMING sessionization: the event log is consumed as
    ``n_slices`` sequential time slices (micro-batches) with carried
    per-user state — (last event ts, last session id) — stitching
    sessions ACROSS slice boundaries; the output is bit-equal to the
    one-shot batch sessionization, which is exactly what the oracle
    (the batch sessions mirror) checks.  This is the exactly-once
    continuity contract a streaming ingest pipeline must honor.

    Shape: each micro-batch is one user-bucketed grouped scan whose
    group input is the slice's events UNION the state table (tagged
    rows — state is data, never driver memory); the state table is one
    short row per active user.  A boundary-spanning session emits
    partial rows in adjacent slices under the SAME session id; one
    final grouped fold (sum/min/max) merges them.
    -> Dataset(user_id, session_id, n_events, first_ts, last_ts)."""

    import numpy as np

    from ..arrowutil import strip_pd_metadata

    gap = pd.Timedelta(minutes=gap_minutes)
    ev = _read(sf_dir, "events", ["user_id", "ts"]).materialize()
    rng = ev.map_batches(
        lambda b: pd.DataFrame({"mn": [b["ts"].min()], "mx": [b["ts"].max()]}),
        batch_format="pandas").to_pandas()
    lo, hi = rng["mn"].min(), rng["mx"].max()
    # integer cut arithmetic: np.linspace would round the ~1e18 ns values
    # through float64 (2^53 exact-int ceiling) and can push cut 0 ABOVE
    # the true min, silently dropping the first event
    lo_ns, hi_ns = int(lo.value), int(hi.value)
    cuts = pd.to_datetime(
        [lo_ns + ((hi_ns - lo_ns) * k) // n_slices
         for k in range(n_slices + 1)])

    def empty_tagged():
        # typed Arrow (not a pandas object-column empty — size-estimator
        # hygiene; df_to_table maps the object kind column to string)
        from ..arrowutil import df_to_table

        return df_to_table(pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "ts": pd.Series(dtype="datetime64[us]"),
            "kind": pd.Series(dtype=object),
            "sid": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "first_ts": pd.Series(dtype="datetime64[us]"),
            "last_ts": pd.Series(dtype="datetime64[us]"),
        }))

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = empty_tagged()
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        out = b.copy()
        out["_bucket"] = bucket_ints(out["user_id"], 64)
        return strip_pd_metadata(out)

    def step(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in bucket.groupby("user_id", sort=False):
            st = g[g["kind"] == "s"]
            evs = g[g["kind"] == "e"].sort_values("ts", kind="mergesort")
            base_sid = int(st["sid"].iloc[0]) if len(st) else 0
            prev_ts = st["ts"].iloc[0] if len(st) else None
            if len(evs) == 0:
                # no activity this slice: carry the state row forward
                rows.append((int(uid), prev_ts, "s", base_sid, 0,
                             pd.NaT, pd.NaT))
                continue
            ts = evs["ts"].reset_index(drop=True)
            new_flag = (ts.diff() > gap)
            new_flag.iloc[0] = (prev_ts is None) or (ts.iloc[0] - prev_ts > gap)
            sids = (base_sid + new_flag.cumsum()).astype("int64")
            for sid, s in evs.assign(_sid=sids.to_numpy()).groupby(
                    "_sid", sort=False):
                rows.append((int(uid), pd.NaT, "p", int(sid), len(s),
                             s["ts"].iloc[0], s["ts"].iloc[-1]))
            rows.append((int(uid), ts.iloc[-1], "s", int(sids.iloc[-1]), 0,
                         pd.NaT, pd.NaT))
        if not rows:
            return empty_tagged()
        return pd.DataFrame(rows, columns=[
            "user_id", "ts", "kind", "sid", "n", "first_ts", "last_ts"])

    state = None
    partials = []
    for k in range(n_slices):
        lo_k, hi_k, last = cuts[k], cuts[k + 1], k == n_slices - 1

        def in_slice(b, lo_k=lo_k, hi_k=hi_k, last=last):
            m = (b["ts"] >= lo_k) & (
                (b["ts"] <= hi_k) if last else (b["ts"] < hi_k))
            sel = b[m]
            if len(sel) == 0:
                return empty_tagged()
            out = pd.DataFrame({
                "user_id": sel["user_id"].astype("int64"),
                "ts": sel["ts"],
                "kind": "e",
                "sid": np.int64(-1),
                "n": np.int64(0),
                "first_ts": pd.NaT,
                "last_ts": pd.NaT,
            })
            return strip_pd_metadata(out)

        feed = ev.map_batches(in_slice, batch_format="pandas")
        if state is not None:
            feed = feed.union(state)
        stepped = (
            feed.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(step, batch_format="pandas")
            .repartition(8)
            .materialize()
        )
        partials.append(stepped.map_batches(
            lambda b: b[b["kind"] == "p"].reset_index(drop=True),
            batch_format="pandas"))
        state = stepped.map_batches(
            lambda b: b[b["kind"] == "s"].reset_index(drop=True),
            batch_format="pandas").materialize()

    allp = partials[0]
    for p in partials[1:]:
        allp = allp.union(p)
    merged = bucketed_groupby_agg(
        allp.map_batches(
            lambda b: b[["user_id", "sid", "n", "first_ts", "last_ts"]]
            .rename(columns={"sid": "session_id", "n": "n_events"}),
            batch_format="pandas"),
        keys=["user_id", "session_id"],
        aggs={"n_events": ("n_events", "sum"),
              "first_ts": ("first_ts", "min"),
              "last_ts": ("last_ts", "max")},
    )
    return merged


def orders_ship_lag(sf_dir: str):
    """Order-to-ship latency distribution per order priority — the
    fulfilment-SLA report shape: a FACT-FACT join (lineitem x orders on
    orderkey, stages/join.bucketed_join hash-partitioned both sides)
    feeding per-group exact discrete quantiles (window.group_quantiles,
    quantile_disc semantics).  lag_days = whole days from o_orderdate to
    l_shipdate (both midnight timestamps, so day arithmetic is exact and
    signed — early ships are negative).

    -> Dataset(o_orderpriority, p50, p90, n_rows)."""
    import pandas as pd

    from ..stages.join import bucketed_join
    from ..stages.window import group_quantiles

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    joined = bucketed_join(li, orders, on="o_orderkey")

    def lag(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype=object),
                "lag_days": pd.Series(dtype="int64"),
            })
        d = pd.to_datetime(b["l_shipdate"]) - pd.to_datetime(b["o_orderdate"])
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "lag_days": d.dt.days.astype("int64"),
        })

    return group_quantiles(
        joined.map_batches(lag, batch_format="pandas"),
        keys=["o_orderpriority"],
        value_col="lag_days",
        qs=[0.5, 0.9],
    )


def events_sessions_in_spikes(
    sf_dir: str,
    gap_minutes: int = 30,
    factor_num: int = 21,
    factor_den: int = 20,
):
    """Interval-overlap semi-join between two DERIVED streams: user
    sessions (events_sessions) x corpus-wide spike days (events_spike_days
    with spike = 1 under a 5%-over-mean factor, any event type) — "which
    sessions touched an anomaly window", the standard incident-correlation
    report.  The default factor is 21/20 rather than spike_days' headline
    2x because the synthetic corpus is near-uniform: a 2x day never occurs
    above sf0.001, which would make this composition vacuous.

    Overlap rule (day granularity, inclusive both ends like SQL BETWEEN):
    a session [first_ts, last_ts] overlaps spike day D iff
    trunc_day(first_ts) <= D <= last_ts.  Only overlapping sessions are
    emitted (inner-join semantics).

    Scale shape: spike days are bounded by the calendar (#distinct days),
    so the spike side is collected once and broadcast via ray.put; each
    session batch counts overlaps with two binary searches over the sorted
    day array — no shuffle beyond the two parents' own plans.

    -> Dataset(user_id, session_id, n_events, n_spike_days)."""
    import numpy as np

    import ray as _ray

    sessions = events_sessions(sf_dir, gap_minutes=gap_minutes)
    spikes = events_spike_days(sf_dir, factor_num=factor_num,
                               factor_den=factor_den)
    day_rows = spikes.map_batches(
        lambda b: b.loc[b["spike"] == 1, ["day"]].drop_duplicates(),
        batch_format="pandas",
    ).take_all()
    days = np.array(
        sorted({pd.Timestamp(r["day"]).value for r in day_rows}),
        dtype="int64",
    )
    ref = _ray.put(days)

    day_ns = 24 * 3600 * 1_000_000_000

    def overlap(b: pd.DataFrame):
        import pyarrow as pa

        # Arrow out so empty blocks still carry the schema (an all-empty
        # result must not collapse to a column-less frame)
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_spike_days": pa.array([], pa.int64()),
        })
        if len(b) == 0:
            return empty
        d = _ray.get(ref)
        first = b["first_ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        last = b["last_ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        lo = (first // day_ns) * day_ns  # trunc_day(first_ts)
        n = (
            np.searchsorted(d, last, side="right")
            - np.searchsorted(d, lo, side="left")
        ).astype(np.int64)
        keep = n >= 1
        if not keep.any():
            return empty
        return pa.table({
            "user_id": pa.array(b["user_id"].to_numpy()[keep], pa.int64()),
            "session_id": pa.array(b["session_id"].to_numpy()[keep],
                                   pa.int64()),
            "n_events": pa.array(b["n_events"].to_numpy()[keep], pa.int64()),
            "n_spike_days": pa.array(n[keep], pa.int64()),
        })

    return sessions.map_batches(overlap, batch_format="pandas")


def orders_cdc_ivm(sf_dir: str):
    """Incremental view maintenance over the repo's deterministic CDC
    stream (same mutation orders_cdc_diff/apply use: delete keys %13,
    +100-cent price bump on surviving %7 keys, re-insert %11 keys under
    +10M ids): the view  per-o_orderstatus (n_orders, sum_cents)  is
    maintained as  base view (+) delta  in the counting semiring —
    deletes contribute (-1, -old_cents), in-place bumps (0, +100),
    inserts (+1, +new_cents) — WITHOUT rescanning the applied table.
    The oracle recomputes the same view from the applied snapshot, so a
    green check proves the IVM algebra equals full recomputation.

    Scale shape: ONE streaming pass over the base emits base-view AND
    delta partials per batch (vectorized masks, grouped combiner rows —
    at most 2 x |status| rows per batch); one tiny bucketed grouped sum
    folds them.  A real warehouse would read the change LOG instead of
    deriving it, but the fold is identical.

    -> Dataset(o_orderstatus, n_orders, sum_cents)."""
    import numpy as np

    ords = _read(sf_dir, "orders",
                 ["o_orderkey", "o_totalprice", "o_orderstatus"])

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "o_orderstatus": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
            })
        k = b["o_orderkey"].to_numpy()
        cents = np.round(b["o_totalprice"].to_numpy() * 100.0).astype("int64")
        status = b["o_orderstatus"].to_numpy()
        m13 = k % 13 == 0
        m7 = (k % 7 == 0) & ~m13
        m11 = k % 11 == 0
        frames = [
            # base view
            pd.DataFrame({"o_orderstatus": status,
                          "n": np.ones(len(k), dtype=np.int64), "s": cents}),
            # deletes: remove the old row's contribution
            pd.DataFrame({"o_orderstatus": status[m13],
                          "n": np.full(int(m13.sum()), -1, dtype=np.int64),
                          "s": -cents[m13]}),
            # in-place bumps: +100 cents, count unchanged
            pd.DataFrame({"o_orderstatus": status[m7],
                          "n": np.zeros(int(m7.sum()), dtype=np.int64),
                          "s": np.full(int(m7.sum()), 100, dtype=np.int64)}),
            # inserts under new ids: original price rides along
            pd.DataFrame({"o_orderstatus": status[m11],
                          "n": np.ones(int(m11.sum()), dtype=np.int64),
                          "s": cents[m11]}),
        ]
        allf = pd.concat(frames, ignore_index=True)
        g = allf.groupby("o_orderstatus", sort=False).sum().reset_index()
        return g

    folded = bucketed_groupby_agg(
        ords.map_batches(partials, batch_format="pandas"),
        keys=["o_orderstatus"],
        aggs={"n_orders": ("n", "sum"), "sum_cents": ("s", "sum")},
    )
    return folded


def events_autocorr(sf_dir: str):
    """Lag-1 autocorrelation SUFFICIENT STATS of the daily event-count
    series per event type — the time-series self-similarity diagnostic
    (is yesterday's volume predictive of today's?).  Emits the exact
    integer components (n, sx, sy, sxx, syy, sxy) over consecutive-day
    pairs (x = count(day), y = count(day+1); days missing from the series
    contribute no pair) — the consumer forms r, keeping this table
    float-free like lineitem_corr_components / kg_assortativity.

    Scale shape: exact (type, day) counts via the combiner groupby; the
    lag join keys on 'type|epoch_day' so consecutive days co-locate in
    ONE bucketed join (no window sort); the final fold is per-type.

    -> Dataset(event_type, n, sx, sy, sxx, syy, sxy)."""
    import numpy as np

    from ..stages.join import bucketed_join

    day_us = 24 * 3600 * 1_000_000
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "eday": ts // day_us,
        })

    counts = bucketed_groupby_agg(
        ev.map_batches(stamp, batch_format="pandas"),
        keys=["event_type", "eday"],
        aggs={"n": (None, "count")},
    ).materialize()

    def key_today(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["event_type"].astype(str) + "|"
                 + b["eday"].astype("int64").astype(str),
            "x": b["n"].astype("int64"),
        })

    def key_tomorrow(b: pd.DataFrame) -> pd.DataFrame:
        # shift the key one day forward: this row becomes the 'y' of the
        # PREVIOUS day's pair
        return pd.DataFrame({
            "k": b["event_type"].astype(str) + "|"
                 + (b["eday"].astype("int64") - 1).astype(str),
            "y": b["n"].astype("int64"),
        })

    pairs = bucketed_join(
        counts.map_batches(key_today, batch_format="pandas"),
        counts.map_batches(key_tomorrow, batch_format="pandas"),
        on="k",
    )

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({c: pd.Series(dtype="int64" if c != "event_type" else object)
                                 for c in ["event_type", "one", "x", "y",
                                           "xx", "yy", "xy"]})
        x = b["x"].to_numpy(dtype=np.int64)
        y = b["y"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "event_type": b["k"].str.split("|").str[0],
            "one": np.ones(len(b), dtype=np.int64),
            "x": x, "y": y, "xx": x * x, "yy": y * y, "xy": x * y,
        })

    return bucketed_groupby_agg(
        pairs.map_batches(widen, batch_format="pandas"),
        keys=["event_type"],
        aggs={"n": ("one", "sum"), "sx": ("x", "sum"), "sy": ("y", "sum"),
              "sxx": ("xx", "sum"), "syy": ("yy", "sum"),
              "sxy": ("xy", "sum")},
    )


def documents_schema_drift(sf_dir: str):
    """Mixed-generation scan with SCHEMA EVOLUTION — the read every
    long-lived lake table eventually needs: generation v1 of the documents
    feed carries (doc_id, text, lang), generation v2 dropped ``lang`` and
    added (source, n_chars).  Both generations (materialized once as
    parquet under /tmp, even doc_ids -> v1, odd -> v2) are read with their
    OWN schemas, aligned to the evolved superset by adding the missing
    columns as typed NULLs per batch, unioned, and audited: per-generation
    row count, NULL counts for the two drifting columns, and the summed
    text length (integrity of the shared column through the union).

    Ray shape: one read_parquet per generation + a stateless align
    map_batches + union + combiner groupby; nothing about the union is
    driver-side, so generations of any size stream.  -> Dataset(gen,
    n_rows, null_lang, null_source, sum_len)."""
    import hashlib as _hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    # Cache tag covers the SOURCE CONTENT identity (path + mtime + size),
    # so regenerating the corpus at the same path invalidates the cache;
    # writes go through a tmp dir + atomic rename (lineage-checkpoint
    # style) so concurrent runs can't observe a half-written generation.
    st = os.stat(src)
    tag = _hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/raykg_schema_drift/{tag}"
    if not os.path.isdir(root):
        tmp = f"{root}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        t = pq.read_table(src, columns=["doc_id", "text", "lang",
                                        "source", "n_chars"])
        even = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        v1 = t.filter(even).select(["doc_id", "text", "lang"])
        v2 = t.filter(pc.invert(even)).select(
            ["doc_id", "text", "source", "n_chars"])
        pq.write_table(v1, os.path.join(tmp, "v1.parquet"))
        pq.write_table(v2, os.path.join(tmp, "v2.parquet"))
        try:
            os.rename(tmp, root)
        except OSError:
            # Another run won the rename race; its contents are identical.
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)

    def align(gen: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "gen": np.int64(gen),
                "doc_id": b["doc_id"].astype("int64"),
                "text": b["text"],
                "lang": b["lang"] if "lang" in b.columns
                        else pd.Series([None] * len(b), dtype=object),
                "source": b["source"] if "source" in b.columns
                          else pd.Series([None] * len(b), dtype=object),
            })
            return out
        return fn

    v1_ds = ray.data.read_parquet(f"{root}/v1.parquet").map_batches(
        align(1), batch_format="pandas")
    v2_ds = ray.data.read_parquet(f"{root}/v2.parquet").map_batches(
        align(2), batch_format="pandas")
    unioned = v1_ds.union(v2_ds)

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "gen": pd.Series(dtype="int64"),
                "one": pd.Series(dtype="int64"),
                "nl": pd.Series(dtype="int64"),
                "ns": pd.Series(dtype="int64"),
                "ln": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "gen": b["gen"].astype("int64"),
            "one": np.int64(1),
            "nl": b["lang"].isna().astype("int64"),
            "ns": b["source"].isna().astype("int64"),
            "ln": b["text"].str.len().astype("int64"),
        })

    return bucketed_groupby_agg(
        unioned.map_batches(widen, batch_format="pandas"),
        keys=["gen"],
        aggs={"n_rows": ("one", "sum"), "null_lang": ("nl", "sum"),
              "null_source": ("ns", "sum"), "sum_len": ("ln", "sum")},
    )


def user_event_unpivot(sf_dir: str):
    """Round-trip reshape check: the wide per-user crosstab
    (user_event_pivot) melted back to sparse long form — pivot ∘ unpivot
    must equal the plain grouped count, which is exactly what the oracle
    computes, so a green check proves the two reshapes are inverses.
    -> Dataset(user_id, event_type, n) with n > 0."""
    from ..stages.reshape import unpivot

    cats = ["click", "error", "purchase", "signup", "view"]
    wide = user_event_pivot(sf_dir)
    return unpivot(
        wide, keys=["user_id"], value_cols=[f"n_{c}" for c in cats],
        var_col="event_type", val_col="n",
        drop_zero=True, strip_prefix="n_",
    )


def events_late_arrivals(sf_dir: str, allowance_minutes: int = 10):
    """Allowed-lateness window accounting (the Flink/Beam late-firing
    semantics made batch-checkable): an event is LATE if its timestamp is
    more than ``allowance_minutes`` behind its user's watermark at
    arrival — watermark = max event-time over the user's STRICTLY EARLIER
    arrivals; a user's first arrival is never late.  Per (event_type,
    tumbling hour of event time): total events and how many arrived late
    — the per-window late-update budget a streaming job must provision.

    Arrival order = (md5(event_id), event_id): the synthetic corpus is
    time-ordered per user (event_id follows ts), under which nothing is
    ever late and the accounting path would verify vacuously — the keyed
    md5 permutation models network reordering deterministically on both
    engines, so late counts are non-zero and positively checked.

    Ray shape: the sessionizer's partition-by-user bucketed groupby, one
    vectorized per-user pass (sort by arrival, expanding max, shift), then
    the combiner groupby to windows.  Exact integer microsecond compares.

    -> Dataset(event_type, hour, n_total, n_late)."""

    import numpy as np

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    allow_us = allowance_minutes * 60 * 1_000_000
    hour_us = 3600 * 1_000_000

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = b.copy()
            out["_bucket"] = pd.Series(dtype="int32")
            return out
        out = b.copy()
        out["_bucket"] = bucket_ints(out["user_id"], 64)
        return out

    def flag_late(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "hour_us": pd.Series(dtype="int64"),
                "one": pd.Series(dtype="int64"),
                "late": pd.Series(dtype="int64"),
            })
        import hashlib

        frames = []
        for _, g in bucket.groupby("user_id", sort=False):
            g = g.assign(_arr=g["event_id"].map(
                lambda e: hashlib.md5(str(int(e)).encode()).hexdigest()[:8]
            )).sort_values(["_arr", "event_id"], kind="mergesort")
            ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            wm = np.maximum.accumulate(ts)
            # watermark at arrival i = max over arrivals < i
            prev_wm = np.concatenate(([np.iinfo(np.int64).min], wm[:-1]))
            late = (prev_wm != np.iinfo(np.int64).min) & (
                ts < prev_wm - allow_us)
            frames.append(pd.DataFrame({
                "event_type": g["event_type"].to_numpy(),
                "hour_us": (ts // hour_us) * hour_us,
                "one": np.int64(1),
                "late": late.astype(np.int64),
            }))
        return pd.concat(frames, ignore_index=True)

    flagged = (
        ev.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(flag_late, batch_format="pandas")
    )
    agg = bucketed_groupby_agg(
        flagged, keys=["event_type", "hour_us"],
        aggs={"n_total": ("one", "sum"), "n_late": ("late", "sum")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "event_type": pd.Series(dtype=object),
                "hour": pd.Series(dtype="datetime64[us]"),
                "n_total": pd.Series(dtype="int64"),
                "n_late": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "event_type": b["event_type"],
            "hour": pd.to_datetime(b["hour_us"].astype("int64"), unit="us"),
            "n_total": b["n_total"].astype("int64"),
            "n_late": b["n_late"].astype("int64"),
        })

    return agg.map_batches(finish, batch_format="pandas")


def doc_tokenizer_fertility(sf_dir: str):
    """Tokenizer-eval fertility report: BPE tokens per word, per language
    — THE acceptance metric for a trained tokenizer (a lang whose
    fertility stays near 1e6 ppm compresses well; high fertility means
    the merges were learned on someone else's distribution).  Composes
    the trained-tokenizer application (bpe.bpe_encode_counts, 5 learned
    merges) with the documents dimension: per lang, doc/word/BPE-token
    sums and fertility_ppm = total_tokens · 1e6 // total_words.

    Scale shape: encoding is bpe_encode_counts' documented one-vocab-join
    plan; the lang stamp is ONE bucketed join on doc_id; the final fold
    is |langs| rows.  -> Dataset(lang, n_docs, n_words, n_tokens_bpe,
    fertility_ppm)."""
    import numpy as np

    from ..stages.bpe import bpe_encode_counts
    from ..stages.join import bucketed_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    enc = bpe_encode_counts(docs, n_merges=5).materialize()
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])
    joined = bucketed_join(enc, langs, on="doc_id")

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "lang": pd.Series(dtype=object),
                "one": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="int64"),
                "t": pd.Series(dtype="int64"),
            })
        return pd.DataFrame({
            "lang": b["lang"],
            "one": np.int64(1),
            "w": b["n_words"].astype("int64"),
            "t": b["n_tokens_bpe"].astype("int64"),
        })

    agg = bucketed_groupby_agg(
        joined.map_batches(widen, batch_format="pandas"),
        keys=["lang"],
        aggs={"n_docs": ("one", "sum"), "n_words": ("w", "sum"),
              "n_tokens_bpe": ("t", "sum")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = b.copy()
            out["fertility_ppm"] = pd.Series(dtype="int64")
            return out
        out = b.copy()
        out["fertility_ppm"] = (
            out["n_tokens_bpe"].astype("int64") * 1_000_000
            // out["n_words"].astype("int64")
        )
        return out

    return agg.map_batches(finish, batch_format="pandas")

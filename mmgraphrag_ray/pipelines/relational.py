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

from ..stages.groupagg import bucketed_groupby_agg
from ..stages.join import broadcast_join


def _read(sf_dir: str, table: str, columns=None):
    from ..runtime import configure

    configure()
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


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
    """Broadcast join orders->customer (dimension side via ray.put), then
    exact per-segment aggregates."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust.rename(columns={"c_custkey": "o_custkey"})
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, on="o_custkey")
    return bucketed_groupby_agg(
        joined,
        keys=["c_mktsegment"],
        aggs={
            "n_orders": (None, "count"),
            "min_price": ("o_totalprice", "min"),
            "max_price": ("o_totalprice", "max"),
        },
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


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap-based): events of one user sorted by ts;
    a gap > `gap_minutes` starts a new session.  Ray shape: partition by
    user (bucketed groupby), per-user pandas sessionization inside the group
    — the ray_guide streaming-shaped pattern (ordered, partitioned log).
    Output: (user_id, session_id, n_events, first_ts, last_ts)."""
    import zlib

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"), "ts": pd.Series(dtype="datetime64[us]"),
                 "_bucket": pd.Series(dtype="int32")}
            )
        out = b.copy()
        out["_bucket"] = out["user_id"].map(
            lambda u: zlib.crc32(str(int(u)).encode()) % 64
        ).astype("int32")
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

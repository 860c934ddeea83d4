"""Reshaping aggregates: long->wide pivot and multi-level rollup.

Both are thin compositions over :func:`groupagg.bucketed_groupby_agg` so
they inherit its scale shape — per-batch vectorized combiners, a shuffle
that moves only partial rows (distinct keys per batch, not input rows),
and crc32-bucketed vectorized finals.
"""

from __future__ import annotations

import re

import pandas as pd

from .groupagg import bucketed_groupby_agg

_COLSAFE = re.compile(r"[^0-9a-zA-Z]+")


def _colname(prefix: str, cat: str) -> str:
    return f"{prefix}{_COLSAFE.sub('_', str(cat)).strip('_').lower()}"


def distinct_values(ds, col: str) -> list:
    """Sorted distinct values of a (low-cardinality) column — one combiner
    pass; the shuffle moves one row per distinct value per batch."""
    out = bucketed_groupby_agg(
        ds.map_batches(lambda b: b[[col]], batch_format="pandas"),
        keys=[col],
        aggs={"c": (None, "count")},
    ).to_pandas()
    return sorted(out[col].tolist())


def pivot_counts(
    ds,
    key_cols: list[str],
    cat_col: str,
    categories: list | None = None,
    prefix: str = "n_",
):
    """Long -> wide: one row per key, one ``<prefix><category>`` count
    column per category (the classic crosstab / one-hot aggregate).

    The category domain must be small (it becomes the schema); pass it
    explicitly or it is discovered with one cheap distinct pass.  Rows are
    widened to integer indicator columns per batch, then the standard
    combiner + bucketed-sum reduces them — input rows never shuffle.
    """
    cats = categories if categories is not None else distinct_values(ds, cat_col)
    out_cols = {c: _colname(prefix, c) for c in cats}
    if len(set(out_cols.values())) != len(cats):
        raise ValueError(f"pivot categories collide after sanitizing: {cats}")

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        cols = {k: batch[k] for k in key_cols}
        for c, name in out_cols.items():
            cols[name] = (batch[cat_col] == c).astype("int64")
        return pd.DataFrame(cols)

    return bucketed_groupby_agg(
        ds.map_batches(widen, batch_format="pandas"),
        keys=key_cols,
        aggs={name: (name, "sum") for name in out_cols.values()},
    )


def pivot_agg(
    ds,
    key_cols: list[str],
    cat_col: str,
    value_col: str,
    op: str = "min",
    categories: list | None = None,
    prefix: str | None = None,
):
    """Generalized pivot: one ``<prefix><category>`` column per category
    holding ``op`` (min/max/sum) of ``value_col`` over that category's rows
    — e.g. first-event timestamp per event type.  Rows outside a category
    contribute NULL to its column (pandas groupby reductions skip NaN/NaT,
    so the masked widening composes across batches exactly like the count
    pivot).  Keys with no rows in a category get NULL there.
    """
    if op not in ("min", "max", "sum"):
        raise ValueError(f"unsupported pivot op {op}")
    pre = prefix if prefix is not None else f"{op}_"
    cats = categories if categories is not None else distinct_values(ds, cat_col)
    out_cols = {c: _colname(pre, c) for c in cats}
    if len(set(out_cols.values())) != len(cats):
        raise ValueError(f"pivot categories collide after sanitizing: {cats}")

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        cols = {k: batch[k] for k in key_cols}
        for c, name in out_cols.items():
            cols[name] = batch[value_col].where(batch[cat_col] == c)
        return pd.DataFrame(cols)

    return bucketed_groupby_agg(
        ds.map_batches(widen, batch_format="pandas"),
        keys=key_cols,
        aggs={name: (name, op) for name in out_cols.values()},
    )


# rollup re-aggregation: how a level-N aggregate column combines into the
# coarser level — count partials re-combine by SUM, everything else by its
# own op (sum/min/max are idempotent-associative over partials)
_REAGG = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def rollup_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    all_token: str = "ALL",
):
    """SQL ``GROUP BY ROLLUP(keys...)``: aggregates at every key prefix —
    (k1..kn), (k1..kn-1), ..., ().  Rolled-away key columns carry
    ``all_token`` (the COALESCE'd form of SQL's NULL subtotal markers, so
    the output hashes identically across engines).

    Only the FINEST level scans the input; each coarser level re-aggregates
    the previous (already tiny) level's output — n levels cost one full
    pass + n-1 passes over group-count-sized tables.
    """
    import ray.data

    reaggs = {out: (out, _REAGG[op]) for out, (_, op) in aggs.items()}

    def stamp(batch: pd.DataFrame, kept: tuple) -> pd.DataFrame:
        out = batch.copy()
        for k in keys:
            if k not in kept:
                out[k] = all_token
            else:
                out[k] = out[k].astype(str)
        return out[keys + list(aggs)]

    levels = []
    # finest level: the ONE pass over the input.  Materialized because every
    # coarser level re-reads it — its size is the group count, not the input.
    cur = bucketed_groupby_agg(ds, keys=keys, aggs=aggs).materialize()
    levels.append(
        cur.map_batches(lambda b, _k=tuple(keys): stamp(b, _k), batch_format="pandas")
    )
    for depth in range(len(keys) - 1, 0, -1):
        kept = keys[:depth]
        cur = bucketed_groupby_agg(cur, keys=kept, aggs=reaggs).materialize()
        levels.append(
            cur.map_batches(lambda b, _k=tuple(kept): stamp(b, _k), batch_format="pandas")
        )
    # grand total: tiny driver-side reduce over the depth-1 table
    small = cur.to_pandas()
    row = {k: pd.Series([all_token], dtype=object) for k in keys}
    for out in aggs:
        row[out] = pd.Series([getattr(small[out], _REAGG[aggs[out][1]])()])
    levels.append(ray.data.from_pandas(pd.DataFrame(row)))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def cube_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    all_token: str = "ALL",
):
    """SQL ``GROUP BY CUBE(keys...)``: aggregates at EVERY subset of the
    key columns (2^n grouping sets); rolled-away keys carry ``all_token``
    like rollup_agg.

    Only the finest set scans the input — every other subset re-aggregates
    the materialized finest table, whose size is the fine group count, so
    n keys cost one full pass + (2^n - 2) group-count-sized passes + a
    driver-side grand-total fold over that same tiny table."""
    import itertools

    import ray.data

    reaggs = {out: (out, _REAGG[op]) for out, (_, op) in aggs.items()}

    def stamp(batch: pd.DataFrame, kept: tuple) -> pd.DataFrame:
        out = batch.copy()
        for k in keys:
            if k not in kept:
                out[k] = all_token
            else:
                out[k] = out[k].astype(str)
        return out[keys + list(aggs)]

    finest = bucketed_groupby_agg(ds, keys=keys, aggs=aggs).materialize()
    levels = [
        finest.map_batches(
            lambda b, _k=tuple(keys): stamp(b, _k), batch_format="pandas"
        )
    ]
    for r in range(len(keys) - 1, 0, -1):
        for kept in itertools.combinations(keys, r):
            lvl = bucketed_groupby_agg(finest, keys=list(kept), aggs=reaggs)
            levels.append(
                lvl.map_batches(
                    lambda b, _k=tuple(kept): stamp(b, _k),
                    batch_format="pandas",
                )
            )
    small = finest.to_pandas()  # fine-group-count rows, not input rows
    row = {k: pd.Series([all_token], dtype=object) for k in keys}
    for out in aggs:
        row[out] = pd.Series([getattr(small[out], _REAGG[aggs[out][1]])()])
    levels.append(ray.data.from_pandas(pd.DataFrame(row)))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def unpivot(ds, keys: list[str], value_cols: list[str],
            var_col: str = "variable", val_col: str = "value",
            drop_zero: bool = False, strip_prefix: str = ""):
    """Wide -> long melt — the inverse of :func:`pivot_counts`, completing
    the reshape pair: every input row explodes into one row per value
    column ``(keys..., var_col = column name, val_col = cell)``.
    ``strip_prefix`` trims a column-name prefix (e.g. the ``n_`` that
    pivot_counts adds); ``drop_zero`` omits empty cells (sparse long
    form).  Stateless vectorized map_batches — no shuffle, row count out
    = rows x |value_cols| (minus zeros)."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            cols = {k: b[k] for k in keys}
            cols[var_col] = pd.Series(dtype=object)
            cols[val_col] = pd.Series(dtype="int64")
            return pd.DataFrame(cols)
        out = b.melt(id_vars=keys, value_vars=value_cols,
                     var_name=var_col, value_name=val_col)
        if strip_prefix:
            out[var_col] = out[var_col].str.removeprefix(strip_prefix)
        if drop_zero:
            out = out[out[val_col] != 0]
        return out.reset_index(drop=True)

    return ds.map_batches(fn, batch_format="pandas")

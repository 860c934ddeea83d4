"""Exact-match memoization of expensive per-row calls — the reference's LLM
response cache as a dataflow operator (T2 llm.py:77-97: dict keyed
md5(str((model, messages))); A5 SURVEY §2.5: dedup of expensive calls).

In a single process the reference checks the cache before every call.  The
distributed equivalent: group rows by args-hash, evaluate the expensive
function ONCE per distinct key, then fan results back out to all rows via a
hash join.  Saves exactly what the reference's cache saves (duplicate chunks,
repeated prompts) without shared mutable state.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from .dedup import dedup_exact
from .join import bucketed_join


def args_hash_column(batch: pd.DataFrame, cols: list[str]) -> pd.Series:
    """md5(str(tuple)) as in reference base.py:100-101 compute_args_hash."""
    return batch[cols].apply(
        lambda row: hashlib.md5(str(tuple(row)).encode()).hexdigest(), axis=1
    )


def memoized_map(ds, arg_cols: list[str], expensive_batch_fn, out_cols: list[str]):
    """Apply `expensive_batch_fn` (pandas batch with `arg_cols` -> same batch
    plus `out_cols`) exactly once per distinct argument tuple; all duplicate
    rows receive the cached result through a hash join.

    Returns the input dataset with `_args_hash` + `out_cols` appended."""

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch.copy()
            out["_args_hash"] = pd.Series(dtype="object")
            return out
        out = batch.copy()
        out["_args_hash"] = args_hash_column(out, arg_cols)
        return out

    hashed = ds.map_batches(add_hash, batch_format="pandas").materialize()

    unique = dedup_exact(
        hashed.select_columns(["_args_hash"] + arg_cols),
        key="_args_hash",
        order_by=arg_cols,
    )
    results = unique.map_batches(expensive_batch_fn, batch_format="pandas").materialize()
    results_slim = results.select_columns(["_args_hash"] + out_cols)
    keyed = hashed.drop_columns(arg_cols) if set(arg_cols) & set(out_cols) else hashed
    return bucketed_join(keyed, results_slim, on="_args_hash")

"""Vectorized deterministic shuffle-routing buckets.

Every fused-shuffle operator in this repo routes rows with an internal
``_bucket = hash(key) % n_buckets`` column and then groups by the REAL
key inside the bucket, so the bucket id never reaches any output — the
only contract is that the hash is deterministic across processes and
that every branch feeding ONE shuffle computes it with the same function
on the same-typed column.  These helpers replace the per-row
``series.map(lambda v: zlib.crc32(str(v).encode()) % N)`` interpreter
loops (round-4 verdict item 2): integer keys take a pure-numpy
splitmix64 finalizer (no per-row str() allocation at all), string keys
take pandas' C-level siphash (``pd.util.hash_array``, fixed default
hash key, deterministic across runs and nodes).

Measured (1e6 rows, this host): int64 keys 277 ms -> 5.8 ms (~48x),
string keys 167 ms -> 66 ms (~2.5x, and no GIL-bound Python frames in
the actor hot loop).  See BASELINE.md "Round-5 kernel A/Bs" for the
pipeline-level effect.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["bucket_ints", "bucket_strs", "bucket_any"]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche (public domain
    constants; full 64-bit avalanche so ``% n_buckets`` is unbiased for
    the small n used for routing)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _as_ndarray(values) -> np.ndarray:
    if isinstance(values, pd.Series):
        return values.to_numpy()
    return np.asarray(values)


def bucket_ints(values, n_buckets: int) -> np.ndarray:
    """int32 routing buckets for an integer key column (Series/ndarray).

    Accepts float dtype too (pandas NaN-promotion of int columns) — the
    values themselves must be integral and NaN-free, same contract as
    the ``str(int(v))`` form this replaces.
    """
    a = _as_ndarray(values)
    if a.dtype.kind not in "iu":
        a = a.astype(np.int64)
    h = _mix64(a.astype(np.int64, copy=False).view(np.uint64))
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bucket_strs(values, n_buckets: int) -> np.ndarray:
    """int32 routing buckets for a string key column (Series/ndarray).

    ``categorize=False``: the factorize pass wins only on heavily
    repeated keys (25 vs 69 ms/1M) but loses 5x on unique keys (355 vs
    66 ms/1M); shuffle keys here are often unique per row (doc ids), so
    the flat path is the predictable default.
    """
    a = _as_ndarray(values)
    if a.dtype != object:
        a = a.astype(object)
    h = pd.util.hash_array(a, categorize=False)
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bucket_any(values, n_buckets: int) -> np.ndarray:
    """Dispatch on dtype: integer/float -> :func:`bucket_ints`, anything
    else -> stringified :func:`bucket_strs`.  For call sites whose key
    column is polymorphic across callers (e.g. generic window/group
    operators that take the key name as a parameter).  All branches of
    one shuffle see the same column dtype, so dispatch is consistent
    within a shuffle.
    """
    a = _as_ndarray(values)
    if a.dtype.kind in "iuf":
        return bucket_ints(a, n_buckets)
    if a.dtype != object:
        a = a.astype(str).astype(object)
    return bucket_strs(a, n_buckets)

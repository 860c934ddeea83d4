"""Z-order (Morton-curve) clustering keys for data-skipping output layout.

Writing 100 TB as Parquet partitioned by ONE column gives pruning on that
column only; interleaving the bits of two normalized columns gives a key
whose ranges are small rectangles in (x, y) space, so bucketing the output
by z-key ranges lets readers skip files for predicates on EITHER column
(the Delta/Iceberg `OPTIMIZE ZORDER BY` layout, computed as a plain
vectorized column here).

Pipeline shape: two cheap global aggregates (min/max per column — driver
scalars), then one vectorized map_batches pass that quantizes each column
to `bits` bits via exact integer scaling and interleaves.  No shuffle is
needed to COMPUTE the key; the optional clustered write is
``write_parquet(partition_cols=["zbucket"])`` downstream.

Integer-exact end to end: quantization is floor division over int64 and
the interleave is bit arithmetic, so the SQL mirror (unrolled shift/mask
terms) matches bit-for-bit.

No reference counterpart (the reference writes whole-graph files); this is
an engine-level extension for the Parquet sink path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _quantize_minmax(v: np.ndarray, lo: int, hi: int, bits: int) -> np.ndarray:
    """Exact integer scaling of v in [lo, hi] onto [0, 2^bits - 1]:
    q = (v - lo) * (2^bits - 1) // max(1, hi - lo)."""
    span = max(1, hi - lo)
    return (v.astype(np.int64) - lo) * ((1 << bits) - 1) // span


def interleave_bits(qx: np.ndarray, qy: np.ndarray, bits: int) -> np.ndarray:
    """Morton interleave: bit i of qx -> bit 2i, bit i of qy -> bit 2i+1."""
    z = np.zeros(len(qx), dtype=np.int64)
    for i in range(bits):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


def zorder_keys(
    ds,
    x_col: str,
    y_col: str,
    id_cols: list[str],
    bits: int = 16,
    n_buckets: int = 64,
):
    """-> Dataset(id_cols..., zkey, zbucket) — the Morton key over the two
    columns (each min/max-normalized to `bits` bits) and the output-file
    bucket (top log2(n_buckets) bits of the key).

    Values are truncated toward zero first (`astype(int64)`), matching the
    SQL mirror's CAST(trunc(col) AS BIGINT); n_buckets must be a power of
    two so the bucket is a pure bit shift."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = 2 * bits - int(n_buckets).bit_length() + 1

    # exact global min/max per column: driver scalars, ONE aggregate pass
    from ray.data.aggregate import Max, Min

    st = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    lo_x = int(np.floor(st[f"min({x_col})"]))
    hi_x = int(np.floor(st[f"max({x_col})"]))
    lo_y = int(np.floor(st[f"min({y_col})"]))
    hi_y = int(np.floor(st[f"max({y_col})"]))

    def add_keys(batch: pd.DataFrame) -> pd.DataFrame:
        qx = _quantize_minmax(
            batch[x_col].to_numpy().astype(np.int64), lo_x, hi_x, bits
        )
        qy = _quantize_minmax(
            batch[y_col].to_numpy().astype(np.int64), lo_y, hi_y, bits
        )
        z = interleave_bits(qx, qy, bits)
        out = batch[id_cols].copy()
        out["zkey"] = z
        out["zbucket"] = z >> shift
        return out

    return ds.map_batches(add_keys, batch_format="pandas")


def zorder_sql_expr(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The exact SQL mirror of quantize+interleave, unrolled — used by the
    oracle so there is ONE definition of the bit layout.  Expects a CTE
    named ``st`` in scope providing BIGINT bounds lox/hix/loy/hiy (the SQL
    analog of the driver-side aggregate), so the mirror is scale-portable.
    trunc-then-CAST matches numpy ``astype(int64)`` truncation (a bare
    CAST(double AS BIGINT) would ROUND in DuckDB)."""
    m = (1 << bits) - 1
    qx = (f"((CAST(trunc({x_expr}) AS BIGINT) - st.lox) * {m}"
          f" // greatest(1, st.hix - st.lox))")
    qy = (f"((CAST(trunc({y_expr}) AS BIGINT) - st.loy) * {m}"
          f" // greatest(1, st.hiy - st.loy))")
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"

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


PRUNE_ROOT = "/tmp/raykg_prune"
PRUNE_VERSION = 1


def ensure_partitioned_docs(sf_dir: str, n_parts: int = 8) -> str:
    """Deterministic range-partitioned copy of the documents table:
    part-<b>.parquet holds doc_id bucket b = doc_id * n_parts // (max+1),
    rows sorted by doc_id — the clustered layout (the 1-D cousin of the
    z-order keys above) that makes min/max footer stats selective.
    Idempotent (done marker); shared by the Ray planner AND the DuckDB
    mirror so both read identical footers."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(PRUNE_ROOT, f"{base}_p{n_parts}_v{PRUNE_VERSION}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "lang", "n_chars"])
    ids = t.column("doc_id").to_numpy()
    top = int(ids.max()) + 1
    bucket = ids * n_parts // top
    order = np.lexsort((ids, bucket))
    t = t.take(pa.array(order))
    bucket = bucket[order]
    for b in range(n_parts):
        part = t.filter(pa.array(bucket == b))
        pq.write_table(part, os.path.join(out, f"part-{b:02d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def parquet_prune_plan(paths: list[str], col: str, lo: int, hi: int):
    """Metadata-only scan planning — the manifest/footer pass every lake
    engine runs before touching data: for each (file, row group), read the
    parquet FOOTER's min/max stats for ``col`` and decide whether the
    predicate ``lo <= col <= hi`` can skip it.  No data pages are read
    anywhere; at 100 TB this pass touches kilobytes per file and is the
    difference between scanning a corpus and scanning a manifest.

    -> Dataset(file, row_group, n_rows, min_val, max_val, skipped):
    one row per row group; skipped = 1 iff max < lo or min > hi.

    Shape: the path list fans out as a Dataset (one footer open per task
    row — planning itself is distributed and scales with file count, the
    way a real manifest scan must)."""
    import os

    import ray.data

    def plan(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        files, rgs, nrows, mns, mxs, skips = [], [], [], [], [], []
        for p in batch["path"]:
            md = pq.ParquetFile(p).metadata
            ci = {md.schema.column(i).name: i
                  for i in range(md.num_columns)}[col]
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                st = g.column(ci).statistics
                mn, mx = int(st.min), int(st.max)
                files.append(os.path.basename(p))
                rgs.append(rg)
                nrows.append(g.num_rows)
                mns.append(mn)
                mxs.append(mx)
                skips.append(1 if (mx < lo or mn > hi) else 0)
        return pd.DataFrame({
            "file": pd.Series(files, dtype=object),
            "row_group": pd.Series(rgs, dtype="int64"),
            "n_rows": pd.Series(nrows, dtype="int64"),
            "min_val": pd.Series(mns, dtype="int64"),
            "max_val": pd.Series(mxs, dtype="int64"),
            "skipped": pd.Series(skips, dtype="int64"),
        })

    return ray.data.from_items(
        [{"path": p} for p in sorted(paths)]
    ).map_batches(plan, batch_format="pandas")


def compaction_plan(paths: list[str], target_bytes: int):
    """Small-file compaction planning — the table-maintenance pass every
    lake format (Iceberg/Delta/Hudi rewrite_data_files) schedules: from
    parquet FOOTER metadata only (no data pages), size each file by its
    total compressed bytes, then assign files in name order to merge
    bins by cumulative quota: bin(i) = (Σ bytes of earlier files) //
    target_bytes — the same deterministic prefix-sum keying
    pack_sequences uses, so the plan is reproducible and SQL-mirrorable
    as a windowed cumsum over the same footers.

    -> Dataset(file, n_rows, total_bytes, bin): one row per input file.

    Shape: footer stats fan out one file per task row (distributed
    planning, like parquet_prune_plan); the prefix sum folds over the
    file-count-sized stats table — bytes of state per FILE, not per row."""
    import os

    import ray.data

    def stat(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        files, rows, bts = [], [], []
        for p in batch["path"]:
            md = pq.ParquetFile(p).metadata
            b = sum(
                md.row_group(i).column(j).total_compressed_size
                for i in range(md.num_row_groups)
                for j in range(md.num_columns)
            )
            files.append(os.path.basename(p))
            rows.append(md.num_rows)
            bts.append(b)
        return pd.DataFrame({
            "file": pd.Series(files, dtype=object),
            "n_rows": pd.Series(rows, dtype="int64"),
            "total_bytes": pd.Series(bts, dtype="int64"),
        })

    stats = ray.data.from_items(
        [{"path": p} for p in sorted(paths)]
    ).map_batches(stat, batch_format="pandas")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("file", kind="mergesort").reset_index(drop=True)
        prev = b["total_bytes"].cumsum().shift(1, fill_value=0)
        b["bin"] = (prev // target_bytes).astype("int64")
        return b

    # the stats table is file-count-sized: one fold task assigns bins
    return stats.repartition(1).map_batches(assign, batch_format="pandas")


def range_partition_plan(ds, value_col: str, n_parts: int = 4,
                         quant=None):
    """Range-partitioner boundary planning — the sort-shuffle prequel
    every distributed engine runs before a range exchange: pick the
    n_parts-1 boundary values as EXACT discrete quantiles of the column
    (via groupagg.global_quantiles' histogram-refinement selection — no
    sample-and-hope, no global sort), then one classify pass reports how
    balanced the resulting partitions would be.

    Partition id = number of boundaries strictly below the value, so
    boundary ties land deterministically in the lower partition on both
    engines.  -> Dataset(part_id, n_rows, min_v, max_v), ints.
    """
    import numpy as np

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg, global_quantiles

    def q(col):
        if quant is not None:
            return quant(col)
        return col.astype("int64")

    vals = ds.map_batches(
        lambda b: strip_pd_metadata(pd.DataFrame({"v": q(b[value_col])}))
        if len(b) else pd.DataFrame({"v": pd.Series(dtype="int64")}),
        batch_format="pandas",
    ).materialize()
    qs = [i / n_parts for i in range(1, n_parts)]
    bounds = np.sort(
        global_quantiles(vals, "v", qs).to_pandas()["value"].to_numpy()
    )

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        v = b["v"].to_numpy()
        part = np.searchsorted(bounds, v, side="left").astype("int64")
        g = pd.DataFrame({"part_id": part, "v": v}).groupby(
            "part_id", sort=False)
        out = pd.DataFrame({
            "n_rows": g.size().astype("int64"),
            "min_v": g["v"].min().astype("int64"),
            "max_v": g["v"].max().astype("int64"),
        }).reset_index()
        return strip_pd_metadata(out) if len(out) else out

    return bucketed_groupby_agg(
        vals.map_batches(classify, batch_format="pandas"),
        keys=["part_id"],
        aggs={"n_rows": ("n_rows", "sum"),
              "min_v": ("min_v", "min"),
              "max_v": ("max_v", "max")},
    )

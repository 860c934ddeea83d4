"""Distributed sketches — approximate aggregates whose state is a few
bytes per group, the 100-TB alternative to exact distinct counts.

``hll_registers`` builds a HyperLogLog register table per group: the hash
is md5-derived (deterministic across engines), so the register table —
and therefore the estimate — is integer-exact and SQL-mirrorable, unlike
library HLLs with engine-private hashing.  The combiner keeps at most
``groups × m`` rows per batch regardless of input size, and register
merge is a plain max — associative, commutative, skew-immune (a hot
group still only ever has m register rows in flight).

``hll_estimate`` turns a register table into the cardinality estimate
(classic Flajolet HLL with the small-range linear-counting correction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..hashing import bucket_any

M = 64          # registers (b = 6 bits); relative error ~ 1.04/sqrt(M) = 13%
_W_BITS = 58    # hash bits left after the register index
N_BUCKETS = 16


def _hash64(values) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in values),
        dtype=np.uint64,
    )


def _rho(w: np.ndarray) -> np.ndarray:
    """Position of the leftmost 1-bit in the 58-bit remainder (1-based from
    the left); all-zero remainder caps at 59."""
    out = np.full(len(w), _W_BITS + 1, dtype=np.int64)
    nz = w != 0
    # bit_length via log2 is unsafe for >53-bit ints; use Python bit_length
    out[nz] = [_W_BITS + 1 - int(x).bit_length() for x in w[nz]]
    return out


def hll_registers(ds, group_col: str, value_col: str, n_buckets: int = N_BUCKETS):
    """-> Dataset(group_col, register, max_rho): the per-group HLL register
    table over distinct ``value_col`` values.  Two-layer shape shared with
    stages/groupagg.py: per-batch partial (dedup values, hash, per-register
    max) then a bucketed max-merge — the shuffle carries at most
    groups x 64 rows per batch."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        if len(batch) == 0:
            return pd.DataFrame(
                {
                    group_col: pd.Series(dtype=batch[group_col].dtype if group_col in batch else object),
                    "register": pd.Series(dtype="int64"),
                    "max_rho": pd.Series(dtype="int64"),
                    "_bucket": pd.Series(dtype="int32"),
                }
            )
        d = batch[[group_col, value_col]].drop_duplicates()
        h = _hash64(d[value_col].to_numpy())
        out = pd.DataFrame(
            {
                group_col: d[group_col].to_numpy(),
                "register": (h % M).astype("int64"),
                "max_rho": _rho(h // M),
            }
        )
        out = (
            out.groupby([group_col, "register"], sort=False)["max_rho"]
            .max()
            .reset_index()
        )
        out["_bucket"] = bucket_any(out[group_col], n_buckets)
        return strip_pd_metadata(out)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby([group_col, "register"], sort=False)["max_rho"]
            .max()
            .reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
        .repartition(4)
    )


CM_W = 256          # count-min width (columns per hash row)
CM_D = 4            # count-min depth (hash rows; the 4 md5 words again)


def md5_word_positions(values, k: int, modulus: int) -> np.ndarray:
    """k positions per value: the k leading 8-hex-char words of md5(str(v)),
    each mod ``modulus``.  THE shared bit/counter schedule of the sketch
    family (bloom k=4, count-min d=4) — cross-engine reproducible, and the
    SQL mirrors hard-code the same substr(md5(...), i*8+1, 8) words."""
    out = np.empty((len(values), k), dtype=np.int64)
    for i, v in enumerate(values):
        h = hashlib.md5(str(v).encode()).hexdigest()
        for j in range(k):
            out[i, j] = int(h[j * 8 : (j + 1) * 8], 16) % modulus
    return out


def cm_registers(ds, key_col: str, n_buckets: int = N_BUCKETS):
    """Count-min sketch register table over ``key_col`` occurrences:
    -> Dataset(row, col, cnt) with d x w = 4 x 256 counters.  Counter sums
    are integers, so the table is order-independent and SQL-exact.  The
    per-batch combiner reduces every batch to <= d*w rows; the final is a
    single tiny grouped sum — constant shuffle volume at any input size."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "row": pd.Series(dtype="int64"),
                    "col": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                    "_bucket": pd.Series(dtype="int32"),
                }
            )
        vc = batch[key_col].value_counts()
        pos = md5_word_positions(vc.index.to_numpy(), CM_D, CM_W)
        mat = np.zeros((CM_D, CM_W), dtype=np.int64)
        counts = vc.to_numpy()
        for j in range(CM_D):
            np.add.at(mat[j], pos[:, j], counts)
        rows, cols = np.nonzero(mat)
        out = pd.DataFrame(
            {"row": rows.astype("int64"), "col": cols.astype("int64"), "cnt": mat[rows, cols]}
        )
        out["_bucket"] = ((out["row"] * CM_W + out["col"]) % n_buckets).astype("int32")
        return strip_pd_metadata(out)

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        return (
            bucket.groupby(["row", "col"], sort=False)["cnt"].sum().reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
        .repartition(4)
    )


def cm_estimate(registers: pd.DataFrame, keys) -> pd.DataFrame:
    """Point-query the sketch: estimate = min over the d rows of the key's
    counters (the count-min upper-bound estimator)."""
    mat = np.zeros((CM_D, CM_W), dtype=np.int64)
    mat[registers["row"].to_numpy(), registers["col"].to_numpy()] = registers[
        "cnt"
    ].to_numpy()
    pos = md5_word_positions(list(keys), CM_D, CM_W)
    rows = [
        (k, int(min(mat[j, pos[i, j]] for j in range(CM_D))))
        for i, k in enumerate(keys)
    ]
    return pd.DataFrame(rows, columns=["key", "approx_count"])


BLOOM_M = 1 << 20   # bits; constant-size state regardless of build side
BLOOM_K = 4         # hash functions (4 x 8 hex chars of one md5)


def _bloom_positions(values) -> np.ndarray:
    """Bloom bit schedule: the shared md5-word positions with k=BLOOM_K,
    modulus=BLOOM_M."""
    return md5_word_positions(values, BLOOM_K, BLOOM_M)


def bloom_build(ds, key_col: str):
    """Build a Bloom filter over the distinct keys of ``ds`` and return the
    object-store ref of the packed bitmap.  Each batch reduces to ONE
    fixed-size packed bitmap row (m/8 = 128 KiB), so the driver combine is
    a constant-size OR per input block — no shuffle, state independent of
    build-side cardinality (the property that makes bloom pruning viable at
    100 TB where a broadcast key SET would not fit)."""
    import ray

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(BLOOM_M, dtype=bool)
        if len(batch):
            keys = batch[key_col].drop_duplicates().to_numpy()
            bits[_bloom_positions(keys).ravel()] = True
        return pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    packed = ds.map_batches(partial, batch_format="pandas").to_pandas()
    bits = np.zeros(BLOOM_M // 8, dtype=np.uint8)
    for b in packed["bitmap"]:
        bits |= np.frombuffer(b, dtype=np.uint8)
    return ray.put(np.unpackbits(bits).astype(bool))


def bloom_semi_join(probe_ds, bits_ref, key_col: str):
    """Keep probe rows whose key MIGHT be in the build side (all k bloom
    bits set) — a no-shuffle semi-join pre-filter with deterministic false
    positives (same md5 bit schedule as ``bloom_build``, so the surviving
    row set is exactly reproducible in SQL)."""
    import ray

    from ..arrowutil import df_to_table

    def filt(batch: pd.DataFrame):
        # typed-Arrow output even when the surviving slice is EMPTY:
        # raw pandas slices with string columns trip Ray's batch-size
        # estimator (np.vectorize on size-0 inputs) and let block schemas
        # drift (repo-wide hygiene rule; arrowutil.df_to_table)
        if len(batch) == 0:
            return df_to_table(batch)
        bits = ray.get(bits_ref)
        keys = batch[key_col].to_numpy()
        uniq, inv = np.unique(keys.astype(str), return_inverse=True)
        ok_uniq = bits[_bloom_positions(uniq)].all(axis=1)
        return df_to_table(batch[ok_uniq[inv]])

    return probe_ds.map_batches(filt, batch_format="pandas")


def hll_estimate(registers: pd.DataFrame, group_col: str) -> pd.DataFrame:
    """Register table (as from ``hll_registers``) -> per-group cardinality
    estimate.  alpha_64 * m^2 / sum(2^-M_j) with the linear-counting
    small-range correction (Flajolet et al. 2007); absent registers count
    as M_j = 0."""
    alpha = 0.709  # alpha_m for m = 64
    rows = []
    for g, grp in registers.groupby(group_col, sort=False):
        regs = np.zeros(M, dtype=np.int64)
        regs[grp["register"].to_numpy()] = grp["max_rho"].to_numpy()
        est = alpha * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if est <= 2.5 * M and zeros:
            est = M * np.log(M / zeros)
        rows.append((g, float(est)))
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


CHECKSUM_MOD = (1 << 61) - 1  # Mersenne prime: sum mod M is associative,
# and partial sums of 32-bit row hashes stay far from int64 overflow


def table_checksum(ds, cols: list[str]):
    """Order-independent content checksum of a projection: ``sum mod M`` of
    ``md5_u32('\\x1f'-joined stringified row)`` — the anti-entropy
    primitive for verifying two tables are equal (migration, resume,
    replica audit) WITHOUT any sort or shuffle.

    Commutative+associative, so each batch contributes one partial
    ``(row_count, checksum)`` row and the driver folds n_batches rows —
    constant state at any input size.  Integer-exact in SQL
    (hex-prefix md5 + HUGEINT sum + final modulus).

    Output: one row ``(n_rows, checksum)``.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"n_rows": pd.Series(dtype="int64"),
                 "checksum": pd.Series(dtype="int64")}
            )
        joined = batch[cols[0]].astype(str)
        for c in cols[1:]:
            joined = joined + "\x1f" + batch[c].astype(str)
        hs = joined.map(
            lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        )
        return pd.DataFrame(
            {"n_rows": [len(batch)],
             "checksum": [int(hs.sum()) % CHECKSUM_MOD]}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(
            {"n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64"),
             "checksum": pd.Series(
                 [int(parts["checksum"].sum()) % CHECKSUM_MOD], dtype="int64"
             )}
        )
    )


# --------------------------------------------------- heavy hitters (MG)

def _mg_partial(batch: pd.DataFrame, key_col: str, capacity: int) -> pd.DataFrame:
    """Misra-Gries summary of ONE batch: exact batch counts, compressed to
    the top-`capacity` keys by subtracting the (capacity+1)-th largest
    count.  Undercounts each surviving key by at most N_batch/(capacity+1)
    (there are capacity+1 counts >= the decrement).  `nb`/`dmax` carry the
    batch size and the decrement on the FIRST row only, so downstream
    sum(nb) = N and max(dmax) = 0 iff no batch ever evicted."""
    if not len(batch):
        return pd.DataFrame(
            {key_col: pd.Series(dtype=batch[key_col].dtype if key_col in batch else "object"),
             "est": pd.Series(dtype="int64"),
             "nb": pd.Series(dtype="int64"),
             "dmax": pd.Series(dtype="int64")}
        )
    counts = batch[key_col].value_counts()  # sorted desc
    dec = int(counts.iloc[capacity]) if len(counts) > capacity else 0
    kept = (counts - dec).iloc[:capacity]
    kept = kept[kept > 0]
    out = pd.DataFrame(
        {key_col: kept.index.to_numpy(),
         "est": kept.to_numpy().astype(np.int64),
         "nb": np.int64(0),
         "dmax": np.int64(0)}
    )
    out.iloc[0, out.columns.get_loc("nb")] = np.int64(len(batch))
    out.iloc[0, out.columns.get_loc("dmax")] = np.int64(dec)
    return out


def heavy_hitters_frame(ds, key_col: str, k: int, capacity: int = 256):
    """Exact global top-k frequent keys WITHOUT a full-key shuffle when the
    distribution allows it — (frame, certified, fallback_used).

    Pass 1 (sketch): per-batch Misra-Gries partials (<= capacity rows per
    batch ever leave a worker), bucketed sum per key, top-`capacity`
    candidates by estimated count.  MG merge bound: for every key,
    f - N/(capacity+1) <= est(f) <= f.

    Pass 2 (verify): exact counts of the candidate keys only (broadcast
    key set, combiner sum).  The result is CERTIFIED exact when either
    (a) no batch ever evicted (dmax == 0: est is already exact for every
    key, pass 2 is skipped), or (b) the k-th exact count strictly exceeds
    cand_min_est + N/(capacity+1) — any non-candidate key's true count is
    bounded by that sum, so the true top-k all made the candidate list.

    When certification fails (near-uniform data), falls back to the exact
    bucketed groupby + per-block top-k path — always correct, just pays
    the full-key shuffle the sketch exists to avoid.  At 100 TB the sketch
    path moves <= batches x capacity tiny rows instead of one row per
    distinct key."""
    from .groupagg import bucketed_groupby_agg

    partials = ds.map_batches(
        lambda b: _mg_partial(b, key_col, capacity), batch_format="pandas"
    ).materialize()
    n_total = int(partials.sum("nb") or 0)
    dmax = int(partials.max("dmax") or 0)
    est_tbl = bucketed_groupby_agg(
        partials.drop_columns(["nb", "dmax"]),
        keys=[key_col],
        aggs={"est": ("est", "sum")},
    )

    def block_top(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return b.sort_values(["est", key_col], ascending=[False, True],
                             kind="mergesort").head(capacity)

    cand = (
        est_tbl.map_batches(block_top, batch_format="pandas")
        .sort(["est", key_col], descending=[True, False])
        .limit(capacity)
        .to_pandas()
    )

    if dmax == 0:
        # no eviction anywhere -> est IS the exact count for every key
        top = cand.rename(columns={"est": "cnt"}).head(k)
        top = top.sort_values(["cnt", key_col], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        return top[[key_col, "cnt", "rank"]], True, False

    import ray as _ray

    keys_ref = _ray.put(frozenset(cand[key_col].tolist()))

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b[key_col].isin(_ray.get(keys_ref))]
        if not len(keep):
            return pd.DataFrame({key_col: pd.Series(dtype=b[key_col].dtype),
                                 "cnt": pd.Series(dtype="int64")})
        c = keep[key_col].value_counts()
        return pd.DataFrame({key_col: c.index.to_numpy(),
                             "cnt": c.to_numpy().astype(np.int64)})

    exact = bucketed_groupby_agg(
        ds.map_batches(exact_partial, batch_format="pandas"),
        keys=[key_col],
        aggs={"cnt": ("cnt", "sum")},
    ).to_pandas()
    exact = exact.sort_values(["cnt", key_col], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    top = exact.head(k).copy()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    cand_min_est = int(cand["est"].min()) if len(cand) == capacity else 0
    kth = int(top["cnt"].iloc[-1]) if len(top) else 0
    certified = len(top) == k and kth > cand_min_est + n_total // (capacity + 1)
    if certified:
        return top[[key_col, "cnt", "rank"]], True, False

    # fallback: exact full groupby count + top-k (always correct)
    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b[key_col].value_counts()
        return pd.DataFrame({key_col: c.index.to_numpy(),
                             "cnt": c.to_numpy().astype(np.int64)})

    full = bucketed_groupby_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        keys=[key_col],
        aggs={"cnt": ("cnt", "sum")},
    )

    def block_top2(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b
        return b.sort_values(["cnt", key_col], ascending=[False, True],
                             kind="mergesort").head(k)

    out = (
        full.map_batches(block_top2, batch_format="pandas")
        .sort(["cnt", key_col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[key_col, "cnt", "rank"]], False, True


def heavy_hitters(ds, key_col: str, k: int, capacity: int = 256):
    """Dataset wrapper over heavy_hitters_frame (the queries() surface)."""
    import ray.data

    frame, _, _ = heavy_hitters_frame(ds, key_col, k, capacity)
    return ray.data.from_pandas(frame)

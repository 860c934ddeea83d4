"""Generic bucketed grouped aggregation (count/sum/min/max).

Ray's built-in ``groupby(keys).aggregate(...)`` pays per-group overhead that
dominates once group counts reach ~1e5; this operator uses the same two-layer
pattern as the KG merges (stages/merge.py):

1. partial aggregate per batch (vectorized pandas groupby — the combiner),
2. shuffle only the partials, grouped by ``crc32(keys) % n_buckets``,
3. vectorized final combine per bucket.

All supported reductions are associative+commutative, so partials compose:
count -> sum of partial counts, sum -> sum, min -> min, max -> max.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import ray.data

from ..hashing import bucket_strs

N_BUCKETS = 64

_FINAL_OP = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def key_bucket(df: pd.DataFrame, keys: list[str], n_buckets: int) -> pd.Series:
    """THE routing bucket for multi-key grouped shuffles: vectorized hash
    (hashing.bucket_strs) of the '\\x1f'-joined stringified key tuple, mod
    n_buckets.  Shared by every operator that buckets on composite keys
    (groupagg, window.grouped_topk, window.group_quantiles) — the hash and
    separator must stay byte-identical across them for bucket
    compatibility."""
    key_str = df[keys[0]].astype(str)
    for k in keys[1:]:
        key_str = key_str + "\x1f" + df[k].astype(str)
    return pd.Series(bucket_strs(key_str, n_buckets), index=df.index)


def bucketed_groupby_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    n_buckets: int = N_BUCKETS,
):
    """aggs: {out_col: (in_col | None, op)} with op in count/sum/min/max
    (in_col ignored for count). Returns Dataset(keys..., out_cols...)."""
    for out, (_, op) in aggs.items():
        if op not in _FINAL_OP:
            raise ValueError(f"unsupported op {op} for {out}")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (col, op) in aggs.items():
            cols[out] = g.size() if op == "count" else g[col].agg(op)
        out_df = pd.DataFrame(cols).reset_index()
        out_df["_bucket"] = key_bucket(out_df, keys, n_buckets)
        # Arrow out: avoid pandas schema metadata in the shuffle (arrowutil)
        from ..arrowutil import strip_pd_metadata

        return strip_pd_metadata(out_df) if len(out_df) else out_df

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby(keys, sort=False, dropna=False)
        cols = {out: g[out].agg(_FINAL_OP[aggs[out][1]]) for out in aggs}
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby("_bucket").map_groups(final, batch_format="pandas")
    # coalesce WITHOUT empty-block padding (see arrowutil.compact_blocks)
    from ..arrowutil import compact_blocks
    return compact_blocks(out)


def _bin_index(v: "np.ndarray", lo: float, hi: float, n_bins: int) -> "np.ndarray":
    """The ONE binning formula, shared by the histogram pass and the
    candidate-fetch filter so a value lands in the same bin in both
    (identical float64 ops — no derived bin-boundary arithmetic)."""
    idx = ((v - lo) * n_bins / (hi - lo)).astype("int64")
    return np.clip(idx, 0, n_bins - 1)


def global_quantiles(
    ds,
    value_col: str,
    qs: list[float],
    n_bins: int = 1024,
    bin_cap: int = 100_000,
    max_rounds: int = 8,
    ranks: list[int] | None = None,
):
    """Exact GLOBAL discrete quantiles (type-1 ``sorted[ceil(q*n)-1]``,
    DuckDB ``quantile_disc`` semantics) over a column too large to sort or
    to shuffle to one group — the global counterpart of
    ``window.group_quantiles``.

    Iterative histogram refinement (the classic distributed selection):

    1. one streaming pass -> per-batch (min, max, non-null count) partials;
    2. per round, ONE streaming histogram pass over all active search
       ranges (<= len(qs) of them): value -> bin via :func:`_bin_index`,
       per-batch combiner emits <= ranges x n_bins count rows, a bucketed
       grouped sum reduces them — the driver only ever holds bin COUNTS
       (ranges x n_bins int64s), never values;
    3. the bin containing each target rank becomes the next round's range;
       a range resolves when its count <= ``bin_cap`` (fetch + select the
       order statistic from <= bin_cap actual elements) or its values are
       all identical (min == max short-circuit).

    Convergence: each round divides a range's population by ~n_bins, so
    rounds ~ log_{n_bins}(n / bin_cap) — 2 rounds cover 10^11 rows at the
    defaults.  The returned value is always an actual element of the
    column, so float columns stay bit-exact across engines.

    Output: one row per requested quantile —
    ``(q: 'pNN', value, rank, n)`` with ``rank`` the 1-based global rank
    selected and ``n`` the non-null population.
    """
    import math

    from ..arrowutil import strip_pd_metadata

    _STATS_EMPTY = {"mn": "float64", "mx": "float64", "cnt": "int64"}

    def mmc(batch: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(batch[value_col], errors="coerce").dropna()
        if not len(v):
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _STATS_EMPTY.items()})
        return pd.DataFrame(
            {"mn": [float(v.min())], "mx": [float(v.max())], "cnt": [int(len(v))]}
        )

    stats = ds.map_batches(mmc, batch_format="pandas").to_pandas()
    n = int(stats["cnt"].sum()) if len(stats) else 0
    if ranks is not None:
        # explicit 1-based order statistics instead of q-fractions (the
        # quantile_cont_micro path needs exact neighbor ranks lo/lo+1,
        # which ceil(q*n) cannot target reliably under float rounding)
        labels = [f"r{r}" for r in ranks]
    else:
        labels = [f"p{int(round(q * 100)):02d}" for q in qs]
    out_cols = ("q", "value", "rank", "n")
    if n == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {"q": pa.array([], pa.string()), "value": pa.array([], pa.float64()),
                 "rank": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        )
    lo0, hi0 = float(stats["mn"].min()), float(stats["mx"].max())

    # active search state per quantile: label -> (lo, hi, local_rank)
    # local_rank is 1-based within the rows falling in [lo, hi] under the
    # current bin lineage; initially the global rank within (min, max).
    if ranks is not None:
        active = {
            lab: (lo0, hi0, min(max(int(r), 1), n))
            for lab, r in zip(labels, ranks)
        }
    else:
        active = {
            lab: (lo0, hi0, min(max(math.ceil(q * n), 1), n))
            for lab, q in zip(labels, qs)
        }
    global_rank = {lab: active[lab][2] for lab in labels}
    resolved: dict[str, float] = {}

    def histogram_round(ranges: list[tuple[float, float]]):
        """ranges: per active-range (lo, hi). Returns the reduced
        (rid, bin) -> (cnt, vmin, vmax) table as a small DataFrame."""

        def hist(batch: pd.DataFrame) -> pd.DataFrame:
            v = pd.to_numeric(batch[value_col], errors="coerce").dropna().to_numpy()
            frames = []
            for rid, (rlo, rhi) in enumerate(ranges):
                if rlo == rhi:
                    inr = v[v == rlo]
                    bins = np.zeros(len(inr), dtype="int64")
                else:
                    inr = v[(v >= rlo) & (v <= rhi)]
                    bins = _bin_index(inr, rlo, rhi, n_bins)
                if not len(inr):
                    continue
                g = pd.DataFrame({"bin": bins, "v": inr}).groupby("bin", sort=False)
                part = pd.DataFrame(
                    {"cnt": g.size(), "vmin": g["v"].min(), "vmax": g["v"].max()}
                ).reset_index()
                part.insert(0, "rid", np.int64(rid))
                frames.append(part)
            if not frames:
                return pd.DataFrame(
                    {"rid": pd.Series(dtype="int64"), "bin": pd.Series(dtype="int64"),
                     "cnt": pd.Series(dtype="int64"), "vmin": pd.Series(dtype="float64"),
                     "vmax": pd.Series(dtype="float64")}
                )
            out = pd.concat(frames, ignore_index=True)
            return strip_pd_metadata(out)

        return bucketed_groupby_agg(
            ds.map_batches(hist, batch_format="pandas"),
            keys=["rid", "bin"],
            aggs={"cnt": ("cnt", "sum"), "vmin": ("vmin", "min"), "vmax": ("vmax", "max")},
        ).to_pandas()

    for _ in range(max_rounds):
        pending = [lab for lab in labels if lab not in resolved]
        if not pending:
            break
        ranges = [(active[lab][0], active[lab][1]) for lab in pending]
        hist_df = histogram_round(ranges)
        fetch: list[tuple[str, float, float, int, int, int]] = []
        for rid, lab in enumerate(pending):
            rlo, rhi, lrank = active[lab]
            h = hist_df[hist_df["rid"] == rid].sort_values("bin")
            csum = h["cnt"].cumsum()
            pos = int(np.searchsorted(csum.to_numpy(), lrank, side="left"))
            row = h.iloc[pos]
            before = int(csum.iloc[pos - 1]) if pos else 0
            new_rank = lrank - before
            bmin, bmax, bcnt = float(row["vmin"]), float(row["vmax"]), int(row["cnt"])
            if bmin == bmax:
                resolved[lab] = bmin
            elif bcnt <= bin_cap:
                fetch.append((lab, rlo, rhi, int(row["bin"]), new_rank, bcnt))
            else:
                # recurse into the bin: the new range is the bin's actual
                # value envelope (tighter than the formula's edges and
                # guaranteed to shrink since bmin < bmax)
                active[lab] = (bmin, bmax, new_rank)
        if fetch:
            specs = [(rlo, rhi, b) for (_, rlo, rhi, b, _, _) in fetch]

            def pick(batch: pd.DataFrame) -> pd.DataFrame:
                v = pd.to_numeric(batch[value_col], errors="coerce").dropna().to_numpy()
                frames = []
                for fid, (rlo, rhi, b) in enumerate(specs):
                    if rlo == rhi:
                        inb = v[v == rlo]
                    else:
                        inr = v[(v >= rlo) & (v <= rhi)]
                        inb = inr[_bin_index(inr, rlo, rhi, n_bins) == b]
                    if len(inb):
                        frames.append(pd.DataFrame({"fid": np.int64(fid), "v": inb}))
                if not frames:
                    return pd.DataFrame(
                        {"fid": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")}
                    )
                return strip_pd_metadata(pd.concat(frames, ignore_index=True))

            cand = ds.map_batches(pick, batch_format="pandas").to_pandas()
            for fid, (lab, _, _, _, frank, _) in enumerate(fetch):
                vals = np.sort(cand.loc[cand["fid"] == fid, "v"].to_numpy())
                resolved[lab] = float(vals[frank - 1])
    missing = [lab for lab in labels if lab not in resolved]
    if missing:
        raise RuntimeError(
            f"global_quantiles did not converge in {max_rounds} rounds for {missing}"
        )
    out = pd.DataFrame(
        {
            "q": pd.Series(labels, dtype=object),
            "value": pd.Series([resolved[lab] for lab in labels], dtype="float64"),
            "rank": pd.Series([global_rank[lab] for lab in labels], dtype="int64"),
            "n": pd.Series([n] * len(labels), dtype="int64"),
        }
    )
    return ray.data.from_pandas(out)


def quantile_cont_micro(
    ds,
    value_col: str,
    pcts: list[int],
    quant=None,
    **gq_kw,
):
    """Exact INTERPOLATED percentiles (``percentile_cont`` / numpy
    'linear' semantics) kept integer: at percentile ``p`` over n values,
    pos = (n-1)*p/100 sits between order statistics lo = floor(pos)+1 and
    hi = lo+1 (1-based), and the interpolated value in MICRO-units is

        value_micro = v_lo * 1_000_000 + (v_hi - v_lo) * rem * 10_000

    with rem = ((n-1)*p) mod 100 — every term an integer when the column
    is integer-valued (``quant`` maps raw values onto an int grid, default
    int64 truncation), so the result hash-matches SQL exactly where a
    float lerp never would.

    Scale shape: one streaming count pass (pruned single column), then
    :func:`global_quantiles` fetches ONLY the <= 2*len(pcts) needed order
    statistics via histogram refinement — no global sort, driver state =
    bin counts.

    -> Dataset(q, n, lo_rank, rem, v_lo, v_hi, value_micro), ints except
    the 'q' label.
    """
    from ..arrowutil import strip_pd_metadata

    def q(col):
        if quant is not None:
            return quant(col)
        return col.astype("int64")

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"v": q(batch[value_col])})
        return strip_pd_metadata(out) if len(out) else out

    vals = ds.map_batches(widen, batch_format="pandas").materialize()
    cnt = vals.map_batches(
        lambda b: pd.DataFrame({"n": [len(b)]}), batch_format="pandas"
    ).to_pandas()
    n = int(cnt["n"].sum()) if len(cnt) else 0
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "q": pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
            "lo_rank": pd.Series(dtype="int64"),
            "rem": pd.Series(dtype="int64"),
            "v_lo": pd.Series(dtype="int64"),
            "v_hi": pd.Series(dtype="int64"),
            "value_micro": pd.Series(dtype="int64"),
        }))
    spec = []
    need: set[int] = set()
    for p in pcts:
        pos = (n - 1) * int(p)
        lo = pos // 100 + 1
        rem = pos % 100
        hi = min(lo + 1, n) if rem else lo
        spec.append((f"p{int(p):02d}", lo, rem, hi))
        need.update((lo, hi))
    ranks = sorted(need)
    got = global_quantiles(
        vals, "v", qs=[], ranks=ranks, **gq_kw
    ).to_pandas()
    by_rank = dict(zip(got["rank"].astype(int), got["value"]))
    rows = []
    for lab, lo, rem, hi in spec:
        v_lo, v_hi = int(by_rank[lo]), int(by_rank[hi])
        rows.append((lab, n, lo, rem, v_lo, v_hi,
                     v_lo * 1_000_000 + (v_hi - v_lo) * rem * 10_000))
    out = pd.DataFrame(rows, columns=["q", "n", "lo_rank", "rem",
                                      "v_lo", "v_hi", "value_micro"])
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def grouped_corr_components(
    ds,
    keys: list[str],
    x_col: str,
    y_col: str,
    x_quant=None,
    y_quant=None,
    n_buckets: int = N_BUCKETS,
):
    """Per-group Pearson-correlation SUFFICIENT STATISTICS in ONE streaming
    pass: n, Σx, Σy, Σx², Σy², Σxy — the distributed-analytics workhorse
    behind corr/covar/linear-fit/feature-stats jobs (a 100-TB scan reduces
    to one tiny row per group; partials are associative so the combiner +
    bucketed-sum discipline of bucketed_groupby_agg applies unchanged).

    ``x_quant`` / ``y_quant`` map the raw columns to int64 so every sum is
    EXACT and hence cross-engine hashable (float Σx² would accumulate in
    whatever order the shuffle delivers and never match SQL bit-for-bit).
    Defaults truncate toward zero (``astype(int64)`` — the SQL mirror is
    CAST(trunc(col) AS BIGINT)).  Callers own overflow headroom: with
    |y| <= 2^21 (~2e6) the Σy² partials stay safe past 2^63 only beyond
    ~4e5 billion rows per group.

    -> Dataset(keys..., n, sx, sy, sxx, syy, sxy), all int64.
    """
    def q(col, fn):
        if fn is not None:
            return fn(col)
        return col.astype("int64")

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        x = q(batch[x_col], x_quant)
        y = q(batch[y_col], y_quant)
        out = batch[keys].copy()
        out["n"] = np.int64(1)
        out["sx"] = x
        out["sy"] = y
        out["sxx"] = x * x
        out["syy"] = y * y
        out["sxy"] = x * y
        return out

    return bucketed_groupby_agg(
        ds.map_batches(widen, batch_format="pandas"),
        keys=keys,
        aggs={
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxx": ("sxx", "sum"),
            "syy": ("syy", "sum"),
            "sxy": ("sxy", "sum"),
        },
        n_buckets=n_buckets,
    )


def grouped_robust_outliers(
    ds,
    keys: list[str],
    value_col: str,
    z: int = 3,
    n_buckets: int = N_BUCKETS,
):
    """Per-group robust outlier flags: |x − group_median| > z · group_MAD.

    The per-language length filter every corpus-quality pipeline runs —
    stddev-based z-scores are poisoned by the very outliers they hunt,
    median/MAD is not.  With an integer value column every quantity here
    (median, deviation, MAD, the comparison) is integer-exact, so the
    SQL mirror matches bit-for-bit.

    Two grouped exact-quantile passes (window.group_quantiles: one hash
    shuffle each) whose outputs are ONE ROW PER GROUP — broadcast back
    into the stream via ray.put, never a fact-side shuffle.  Assumes
    bounded group cardinality (languages, sources); for unbounded keys
    route the med/mad tables through bucketed_join instead.

    -> Dataset(input columns..., med, mad, is_outlier)."""
    from .join import broadcast_join
    from .window import group_quantiles

    med = (
        group_quantiles(ds, keys, value_col, [0.5], n_buckets=n_buckets)
        .to_pandas()[keys + ["p50"]]
        .rename(columns={"p50": "med"})
    )
    with_med = broadcast_join(ds, med, on=keys)

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys].copy()
        out["_dev"] = (batch[value_col] - batch["med"]).abs()
        return out

    mad = (
        group_quantiles(
            with_med.map_batches(dev, batch_format="pandas"),
            keys,
            "_dev",
            [0.5],
            n_buckets=n_buckets,
        )
        .to_pandas()[keys + ["p50"]]
        .rename(columns={"p50": "mad"})
    )

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["is_outlier"] = (batch[value_col] - batch["med"]).abs() > z * batch["mad"]
        return out

    return broadcast_join(with_med, mad, on=keys).map_batches(
        flag, batch_format="pandas"
    )


def global_mad(ds, value_col: str, **quantile_kw):
    """Global MEDIAN ABSOLUTE DEVIATION — the robust dispersion measure
    outlier detectors use where stddev is poisoned by the outliers
    themselves.  Two exact selection passes, no global sort:

    1. median = global_quantiles(col, [0.5])  (type-1, an actual element);
    2. mad    = global_quantiles(|x - median|, [0.5]).

    The deviation is a single IEEE subtract+abs of identical operands on
    both engines, so the result is bit-exact vs SQL's
    quantile_disc(abs(x - quantile_disc(x, .5)), .5).

    -> 1-row Dataset(median, mad, n)."""
    import ray.data

    med_rows = global_quantiles(ds, value_col, [0.5], **quantile_kw).take_all()
    med = float(med_rows[0]["value"])
    n = int(med_rows[0]["n"])

    def dev(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[value_col].dropna()
        return pd.DataFrame({"_dev": (x - med).abs()})

    devs = ds.map_batches(dev, batch_format="pandas")
    mad_rows = global_quantiles(devs, "_dev", [0.5], **quantile_kw).take_all()
    return ray.data.from_pandas(
        pd.DataFrame(
            {"median": pd.Series([med], dtype="float64"),
             "mad": pd.Series([float(mad_rows[0]["value"])], dtype="float64"),
             "n": pd.Series([n], dtype="int64")}
        )
    )


def grouped_exact_rank(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    step: int = 64,
    n_buckets: int = N_BUCKETS,
):
    """EXACT per-group rank + percent-rank of an integer value column —
    the per-language quality-percentile gate (FineWeb-style "drop the
    bottom X% per language") computed WITHOUT a global sort.

    Distributed rank by range prefix sums (same scheme as
    blocking.sorted_neighborhood_pairs, lifted to grouped form):

    1. stamp every row's range cell (group, value // step);
    2. one tiny grouped count per cell — the only driver-held state is
       one int per cell (#groups x #value-ranges, NOT #rows);
    3. driver: within-group cumsum over value-ordered cells -> each
       cell's global rank offset, broadcast via ray.put;
    4. one hash shuffle on the cell: local (value, id) sort + offset =
       the exact global row_number within the group.

    pct = (rank-1)/(n-1) (row_number semantics over the total
    (value, id) order — ties are broken, so the result is deterministic
    and bit-exact vs the SQL mirror: one integer subtract + one double
    divide on both engines).

    -> Dataset(id_col, group_col, value_col, rnk, pct)."""
    import ray as _ray

    from ..arrowutil import strip_pd_metadata

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, group_col, value_col]].copy()
        out["_rng"] = (out[value_col] // step).astype("int64")
        return strip_pd_metadata(out) if len(out) else out

    rows = ds.map_batches(stamp, batch_format="pandas").materialize()

    # cell counts: per-batch combiner (<= #cells rows each), summed on the
    # driver — the driver state is one int per (group, range) cell, and no
    # shuffle is spent on the count pass
    def cell_counts(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([group_col, "_rng"], sort=False).size()
        return g.rename("n").reset_index()

    counts = (
        rows.map_batches(cell_counts, batch_format="pandas")
        .to_pandas()
        .groupby([group_col, "_rng"], sort=False)["n"]
        .sum()
        .reset_index()
    )
    counts = counts.sort_values([group_col, "_rng"]).reset_index(drop=True)
    g = counts.groupby(group_col, sort=False)["n"]
    counts["_off"] = g.cumsum() - counts["n"]
    offsets = {
        (grp, rng): int(off)
        for grp, rng, off in zip(
            counts[group_col], counts["_rng"], counts["_off"]
        )
    }
    group_n = counts.groupby(group_col, sort=False)["n"].sum().to_dict()
    ref = _ray.put((offsets, group_n))

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["_bucket"] = key_bucket(out, [group_col, "_rng"], n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    def rank_cell(bucket: pd.DataFrame) -> pd.DataFrame:
        offs, ns = _ray.get(ref)
        outs = []
        for (grp, rng), cell in bucket.groupby(
            [group_col, "_rng"], sort=False
        ):
            c = cell.sort_values([value_col, id_col], kind="mergesort")
            rnk = (
                np.arange(len(c), dtype=np.int64) + offs[(grp, rng)] + 1
            )
            n = int(ns[grp])
            pct = (
                (rnk - 1).astype("float64") / float(n - 1)
                if n > 1
                else np.zeros(len(c), dtype="float64")
            )
            outs.append(
                pd.DataFrame(
                    {
                        id_col: c[id_col].to_numpy(),
                        group_col: c[group_col].to_numpy(),
                        value_col: c[value_col].to_numpy(),
                        "rnk": rnk,
                        "pct": pct,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    group_col: pd.Series(dtype="string"),
                    value_col: pd.Series(dtype="int64"),
                    "rnk": pd.Series(dtype="int64"),
                    "pct": pd.Series(dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from ..arrowutil import compact_blocks

    return compact_blocks(
        rows.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rank_cell, batch_format="pandas")
    )


def weighted_global_quantile(
    ds,
    value_col: str,
    weight_col: str,
    p: int = 50,
    n_bins: int = 1024,
    bin_cap: int = 100_000,
    max_rounds: int = 8,
):
    """Exact WEIGHTED global quantile of an integral-weighted column —
    e.g. the token-weighted median document length (the length half the
    corpus's TOKENS sit below, not half its docs).

    Weighted type-1 selection: the smallest value x with
    cumweight(values <= x) >= T where T = ceil(p% of total weight),
    computed as the INTEGER ``(W*p + 99) // 100`` — no float thresholds,
    so the SQL mirror (windowed cumulative weight) matches exactly.

    Same histogram-refinement scheme as :func:`global_quantiles`, with
    per-bin (row count, weight sum) partials: the driver only ever sees
    n_bins (cnt, wsum) pairs per round; a range resolves when its row
    count fits ``bin_cap`` (fetch, sort, integer cumsum, select).

    -> 1-row Dataset(value, threshold, total_weight, n)."""
    from ..arrowutil import strip_pd_metadata

    def mmw(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[[value_col, weight_col]].dropna()
        if not len(b):
            return pd.DataFrame(
                {"mn": pd.Series(dtype="float64"),
                 "mx": pd.Series(dtype="float64"),
                 "w": pd.Series(dtype="int64"),
                 "cnt": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"mn": [float(b[value_col].min())],
             "mx": [float(b[value_col].max())],
             "w": [int(b[weight_col].sum())],
             "cnt": [int(len(b))]}
        )

    stats = ds.map_batches(mmw, batch_format="pandas").to_pandas()
    n = int(stats["cnt"].sum()) if len(stats) else 0
    if n == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({"value": pa.array([], pa.float64()),
                      "threshold": pa.array([], pa.int64()),
                      "total_weight": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
        )
    total_w = int(stats["w"].sum())
    thresh = (total_w * p + 99) // 100
    lo, hi = float(stats["mn"].min()), float(stats["mx"].max())
    t_local = thresh  # weight rank remaining within [lo, hi]

    for _ in range(max_rounds):
        if lo == hi:
            break

        def hist(batch: pd.DataFrame, lo=lo, hi=hi) -> pd.DataFrame:
            b = batch[[value_col, weight_col]].dropna()
            v = b[value_col].to_numpy(dtype="float64")
            m = (v >= lo) & (v <= hi)
            if not m.any():
                return pd.DataFrame(
                    {"bin": pd.Series(dtype="int64"),
                     "cnt": pd.Series(dtype="int64"),
                     "wsum": pd.Series(dtype="int64"),
                     "vmin": pd.Series(dtype="float64"),
                     "vmax": pd.Series(dtype="float64")}
                )
            g = pd.DataFrame(
                {"bin": _bin_index(v[m], lo, hi, n_bins),
                 "v": v[m],
                 "w": b[weight_col].to_numpy()[m]}
            ).groupby("bin", sort=False)
            out = pd.DataFrame(
                {"cnt": g.size(), "wsum": g["w"].sum().astype("int64"),
                 "vmin": g["v"].min(), "vmax": g["v"].max()}
            ).reset_index()
            return strip_pd_metadata(out)

        bins = (
            bucketed_groupby_agg(
                ds.map_batches(hist, batch_format="pandas"),
                keys=["bin"],
                aggs={"cnt": ("cnt", "sum"), "wsum": ("wsum", "sum"),
                      "vmin": ("vmin", "min"), "vmax": ("vmax", "max")},
            )
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        cum = bins["wsum"].cumsum()
        hit = int((cum >= t_local).idxmax())
        t_local -= int(cum.iloc[hit - 1]) if hit > 0 else 0
        cnt_in = int(bins.loc[hit, "cnt"])
        # next range = the hit bin's ACTUAL element bounds (no derived
        # float boundary arithmetic — bins partition the value order, so
        # [vmin, vmax] inclusive is exactly the bin's population)
        lo, hi = float(bins.loc[hit, "vmin"]), float(bins.loc[hit, "vmax"])
        if cnt_in <= bin_cap:
            break

    def fetch(batch: pd.DataFrame, lo=lo, hi=hi) -> pd.DataFrame:
        b = batch[[value_col, weight_col]].dropna()
        v = b[value_col].to_numpy(dtype="float64")
        # same membership rule as the histogram: bin index within [lo, hi]
        m = (v >= lo) & (v <= hi)
        out = pd.DataFrame(
            {"v": v[m], "w": b[weight_col].to_numpy()[m]}
        )
        return strip_pd_metadata(out)

    cand = ds.map_batches(fetch, batch_format="pandas").to_pandas()
    cand = cand.groupby("v", sort=True)["w"].sum().reset_index()
    cw = cand["w"].cumsum()
    pick = float(cand.loc[int((cw >= t_local).idxmax()), "v"])
    return ray.data.from_pandas(
        pd.DataFrame(
            {"value": pd.Series([pick], dtype="float64"),
             "threshold": pd.Series([thresh], dtype="int64"),
             "total_weight": pd.Series([total_w], dtype="int64"),
             "n": pd.Series([n], dtype="int64")}
        )
    )


def bucketed_count_distinct(
    ds,
    keys: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    n_buckets: int = N_BUCKETS,
):
    """EXACT ``count(DISTINCT distinct_col)`` per key group — the aggregate
    Ray Data has no native operator for and the one every "daily active
    users per window" job needs.  Two-phase exact distinct:

    1. per-batch drop_duplicates over (keys, distinct_col) — the combiner;
       what shuffles is one row per distinct (key, value) PER BATCH, never
       raw events;
    2. shuffle on crc32(keys + value): every occurrence of the same
       (key, value) lands in ONE bucket, so an in-bucket drop_duplicates is
       globally exact and per-key partial counts from different buckets
       are disjoint;
    3. a second (tiny: <= n_buckets rows per key) bucketed sum of the
       partials per key.

    Distinct values of one key spread across MANY buckets, so a hot key's
    distinct set never has to fit one task — the skew story plain
    "groupby(key) then nunique" lacks.

    -> Dataset(keys..., out_col), out_col int64."""

    cols = keys + [distinct_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        from ..arrowutil import strip_pd_metadata

        out = batch[cols].drop_duplicates()
        out = out.assign(_dbucket=key_bucket(out, cols, n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def bucket_counts(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[cols].drop_duplicates()
        out = d.groupby(keys, sort=False).size().reset_index(name=out_col)
        out[out_col] = out[out_col].astype("int64")
        return out

    partial_counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_dbucket")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    return bucketed_groupby_agg(
        partial_counts, keys=keys, aggs={out_col: (out_col, "sum")},
        n_buckets=n_buckets,
    )

"""Deterministic sampling operators.

The consistent hash-threshold samplers live in ``pipelines/relational.py``
(pure filters); this module holds the ones that need a reduce.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..hashing import bucket_strs


def _hash_u32(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def weighted_topk_sample(ds, id_col: str, weight_col: str, k: int):
    """Deterministic weighted priority sample: keep the ``k`` rows with the
    smallest ``priority = md5_u32(id) // max(weight, 1)`` (ties by id).
    Heavier rows draw proportionally smaller priorities, so selection
    probability grows with weight — the hash-keyed analog of
    probability-proportional-to-size sampling (weights enter via integer
    division, so the whole chain is integer-exact across engines), with the
    same stability property as the hash-threshold samplers: membership is a
    pure function of (id, weight), reproducible across runs and engines.

    Scale shape: per-batch vectorized priority + LOCAL top-k (the
    combiner), then one tiny reduce over n_batches x k rows — no shuffle of
    the input, driver holds k rows.  Output: id, weight, priority.
    """

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 weight_col: pd.Series(dtype="int64"),
                 "priority": pd.Series(dtype="int64")}
            )
        h = batch[id_col].map(lambda i: _hash_u32(str(i))).astype("int64")
        w = np.maximum(batch[weight_col].to_numpy().astype("int64"), 1)
        out = pd.DataFrame(
            {id_col: batch[id_col].astype("int64"),
             weight_col: batch[weight_col].astype("int64"),
             "priority": (h.to_numpy() // w).astype("int64")}
        )
        return out.nsmallest(k, ["priority", id_col], keep="first")

    partials = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    top = partials.nsmallest(k, ["priority", id_col], keep="first")
    import ray.data

    return ray.data.from_pandas(top.reset_index(drop=True))


def mixture_allocate(ds, weights: dict[str, int], total: int,
                     id_col: str = "doc_id", src_col: str = "source"):
    """Deterministic training-data mixture builder: allocate ``total``
    output rows across sources by integer weights using the LARGEST-
    REMAINDER method (Hamilton apportionment), then take each source's
    quota as its smallest ``id_col`` rows — the whole chain is integer /
    order-deterministic, so the mix is reproducible across runs and
    engines (the float-proportions + RNG mixing loaders use cannot be
    value-checked).

    quota_i = floor(total * w_i / W) + 1 for the sources with the largest
    remainders (total * w_i mod W, ties by source name asc) until quotas
    sum to ``total``; a source with fewer rows than its quota yields what
    it has (NO redistribution — the shortfall is visible in the output
    size, by design).

    -> Dataset(id_col, src_col, rank, quota): selected rows with their
    within-source rank (1-based by id asc) and the source's quota.

    Scale shape: quotas are O(#sources) driver arithmetic; selection is
    the grouped-top-k combiner (per-batch top-quota per source, one
    bucketed reduce) — output-sized state only, no full shuffle."""
    from .window import grouped_topk

    W = sum(weights.values())
    if W <= 0 or total < 0:
        raise ValueError("need positive total weight and non-negative total")
    base = {s: total * w // W for s, w in weights.items()}
    rem = total - sum(base.values())
    order = sorted(weights, key=lambda s: (-(total * weights[s] % W), s))
    quota = {s: base[s] + (1 if i < rem else 0) for i, s in enumerate(order)}
    kmax = max(quota.values(), default=0)
    if kmax == 0:
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             src_col: pa.array([], pa.string()),
             "rank": pa.array([], pa.int64()),
             "quota": pa.array([], pa.int64())}))

    known = ds.map_batches(
        lambda b: b[b[src_col].isin(list(quota))][[id_col, src_col]],
        batch_format="pandas",
    )
    top = grouped_topk(
        known, keys=[src_col], order_col=id_col, k=kmax,
        descending=False,
    )

    def cut(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 src_col: pd.Series(dtype="string"),
                 "rank": pd.Series(dtype="int64"),
                 "quota": pd.Series(dtype="int64")})
        out = b.copy()
        out["quota"] = out[src_col].map(quota).astype("int64")
        out = out[out["rank"] <= out["quota"]]
        return out[[id_col, src_col, "rank", "quota"]]

    return top.map_batches(cut, batch_format="pandas")


def grouped_hash_sample(ds, keys: list[str], id_col: str, k: int = 3):
    """Deterministic k-per-group sample — the "show me 3 examples per
    language" debugging/inspection op: rank group members by md5(id) and
    keep the k smallest, so membership is a pure function of the id
    (stable across runs, engines and corpus growth — same property as
    consistent_sample, here per group).

    -> Dataset(keys..., id_col, rank).  Rides window.grouped_topk, so each
    batch contributes at most k rows per group to the shuffle."""
    import pandas as pd

    from .window import grouped_topk

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[keys + [id_col]].copy()
        out["_h"] = out[id_col].map(
            lambda v: hashlib.md5(str(v).encode()).hexdigest()
        )
        return out

    top = grouped_topk(
        ds.map_batches(add_key, batch_format="pandas"),
        keys=keys, order_col="_h", k=k, tie_cols=[id_col],
        descending=False,
    )
    return top.map_batches(
        lambda b: b[keys + [id_col, "rank"]], batch_format="pandas"
    )


def token_budget_select(
    ds,
    group_col: str,
    weight_col: str,
    budget: int,
    order_cols: list[str],
    descending: list[bool],
    n_buckets: int = 32,
):
    """Greedy per-group token-budget selection: rank each group's rows by
    ``order_cols`` (the curation order — quality, length, ...), take rows
    while the running ``weight_col`` total stays within ``budget``.  The
    per-source token-cap step of a training-mixture build (keep the best
    docs of every source until its token quota is filled).

    Exact and engine-portable when the weight is integral (the running
    sum is an int cumsum — no float association).  One hash shuffle on
    the group; ``order_cols`` must be made total with a unique id.
    Assumes one group's rows fit a reduce task (same contract as
    window.group_quantiles; for a monster group pre-filter or bucket by
    rank range first).

    -> Dataset(input columns..., cum_weight) — selected rows only.
    """
    import zlib

    from ..arrowutil import strip_pd_metadata

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bucket"] = bucket_strs(out[group_col].astype(str), n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    ascending = [not d for d in descending]

    def select(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.drop(columns=["_bucket"]).sort_values(
            [group_col] + order_cols,
            ascending=[True] + ascending,
            kind="mergesort",
        )
        cum = b.groupby(group_col, sort=False)[weight_col].cumsum()
        b = b.assign(cum_weight=cum.astype("int64"))
        return b[b["cum_weight"] <= budget]

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(select, batch_format="pandas")
        .repartition(8)
    )


def global_shuffle_order(ds, id_col: str, seed: int = 7, n_buckets: int = 64):
    """Deterministic global training-shuffle order: every row gets
    ``shuffle_key = md5(seed:id)`` and ``ord`` = its exact 1-based global
    rank in (shuffle_key, id) order — the reproducible corpus permutation
    a training run reads before sequence packing, computed WITHOUT a
    global sort.

    Distributed rank by prefix ranges (the groupagg.grouped_exact_rank
    scheme over hex keys): md5 keys are uniform, so the 256 two-hex-char
    prefixes are balanced ranges; one tiny count per range -> driver
    cumsum (256 ints) -> per-range local sort + offset.

    -> Dataset(id_col, shuffle_key, ord)."""
    import zlib

    import ray as _ray

    from ..arrowutil import strip_pd_metadata

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col]
        keys = ids.astype(str).map(
            lambda s: hashlib.md5(f"{seed}:{s}".encode()).hexdigest()
        )
        out = pd.DataFrame({id_col: ids, "shuffle_key": keys})
        out["_rng"] = keys.str[:2]
        return strip_pd_metadata(out)

    rows = ds.map_batches(stamp, batch_format="pandas").materialize()

    # range counts: per-batch combiner emits <= 256 rows, the driver sums
    # (256 ints total) — no shuffle spent on the count pass
    def rng_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["_rng"].value_counts()
        return pd.DataFrame(
            {"_rng": vc.index.astype(str), "n": vc.to_numpy().astype("int64")}
        )

    counts = (
        rows.map_batches(rng_counts, batch_format="pandas")
        .to_pandas()
        .groupby("_rng", sort=True)["n"]
        .sum()
        .reset_index()
    )
    offsets = dict(
        zip(counts["_rng"], (counts["n"].cumsum() - counts["n"]).astype(int))
    )
    ref = _ray.put(offsets)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_strs(b["_rng"], n_buckets)
        )
        return strip_pd_metadata(out) if len(out) else out

    def rank_range(bucket: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(ref)
        outs = []
        for rng, g in bucket.groupby("_rng", sort=False):
            g = g.sort_values(["shuffle_key", id_col], kind="mergesort")
            outs.append(
                pd.DataFrame(
                    {
                        id_col: g[id_col].to_numpy(),
                        "shuffle_key": g["shuffle_key"].to_numpy(),
                        "ord": np.arange(len(g), dtype="int64")
                        + int(offs[rng])
                        + 1,
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "shuffle_key": pd.Series(dtype="string"),
                    "ord": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return (
        rows.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rank_range, batch_format="pandas")
        .repartition(8)
    )

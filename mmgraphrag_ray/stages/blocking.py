"""Sorted-neighborhood blocking — the classic entity-resolution candidate
generator (Hernandez & Stolfo's merge/purge): order all records by a
blocking key and emit every pair within ``window`` positions of each other.
Complements the LSH/shingle blocking families in stages/dedup.py (hash
blocking finds lexically-similar content; sorted neighborhood finds
near-neighbors in KEY order — typos, prefixes, numbering) and the
chunk_window locality mode in stages/linking.py (reference fusion.py's
±1-chunk candidate windows are the same idea in chunk_order space).

The hard part at scale is the EXACT GLOBAL RANK without a full sort on one
node.  Same order-statistics shape as stages/pack.py's distributed prefix
sum, generalized to arbitrary string keys:

1. map: stamp each row with an ORDER-PRESERVING coarse range id (the
   key's first ``prefix_len`` code points — ranges partition the key
   space in key order);
2. one grouped count: rows per range (driver holds one int per range);
3. driver: cumulative sum -> each range's global rank offset;
4. per-range grouped sort: local (key, id) order + broadcast offset =
   exact global rank for every row — no all-to-all sort, no driver rows;
5. pair generation in RANK space: each ranked row routes to rank-block
   ``rank // block`` and, when ``rank % block < window``, also to the
   previous block (boundary overlap).  Pairs (i, j), i < j <= i + window
   are enumerated inside the block that owns rank i, so every pair is
   emitted exactly once.

Skew caveat (documented, by design): a single hot key prefix concentrates
one range's local sort on one worker — pick ``prefix_len`` so ranges stay
small (2 chars ~ alphabet² ranges); unlike hash bucketing the range id
cannot be salted without breaking rank exactness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import bucket_any


def sorted_neighborhood_pairs(
    ds,
    key_col: str,
    id_col: str,
    window: int = 3,
    prefix_len: int = 2,
    block: int | None = None,
):
    """-> Dataset(ka, ida, kb, idb, dist): all pairs within ``window``
    positions of the global (key, id) order, dist = rank difference
    (1..window), pair oriented by rank (a before b).  Keys and ids ride
    as strings (cast upstream) so the operator is schema-agnostic."""
    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg

    if window < 1:
        raise ValueError("window must be >= 1")
    block = block or max(64, 4 * window)
    if block <= window:
        raise ValueError("block must exceed window")

    def stamp_rng(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"k": b[key_col].astype(str), "i": b[id_col].astype(str)}
        )
        out["rng"] = out["k"].str[:prefix_len]
        return strip_pd_metadata(out) if len(out) else out

    rows = ds.map_batches(stamp_rng, batch_format="pandas").materialize()

    counts = bucketed_groupby_agg(
        rows.map_batches(lambda b: b[["rng"]], batch_format="pandas"),
        keys=["rng"],
        aggs={"n": (None, "count")},
    ).to_pandas()
    counts = counts.sort_values("rng").reset_index(drop=True)
    offsets = dict(
        zip(counts["rng"], counts["n"].cumsum().shift(fill_value=0))
    )

    import zlib

    def add_rng_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["rng"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def rank_range(bucket: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for rng, g in bucket.groupby("rng", sort=False):
            g = g.sort_values(["k", "i"], kind="mergesort").reset_index(drop=True)
            g["rank"] = np.arange(len(g), dtype=np.int64) + int(offsets[rng])
            outs.append(g[["k", "i", "rank"]])
        if not outs:
            return pd.DataFrame(
                {"k": pd.Series(dtype="string"),
                 "i": pd.Series(dtype="string"),
                 "rank": pd.Series(dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    ranked = (
        rows.map_batches(add_rng_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rank_range, batch_format="pandas")
        .repartition(8)
        .materialize()
    )

    def route_blocks(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"k": pd.Series(dtype="string"),
                 "i": pd.Series(dtype="string"),
                 "rank": pd.Series(dtype="int64"),
                 "blk": pd.Series(dtype="int64")}
            )
        own = b.assign(blk=(b["rank"] // block).astype("int64"))
        edge = b[(b["rank"] % block < window) & (b["rank"] // block > 0)]
        prev = edge.assign(blk=(edge["rank"] // block - 1).astype("int64"))
        return pd.concat([own, prev], ignore_index=True)

    def add_blk_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_bucket=(b["blk"] % 64).astype("int32"))
        return strip_pd_metadata(out) if len(out) else out

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        cols = ("ka", "ida", "kb", "idb", "dist")
        rows_out = []
        for blk, g in bucket.groupby("blk", sort=False):
            g = g.sort_values("rank", kind="mergesort")
            ranks = g["rank"].to_numpy()
            ks = g["k"].to_numpy()
            ids = g["i"].to_numpy()
            lo = int(blk) * block
            hi = lo + block
            for a in range(len(g)):
                ra = int(ranks[a])
                if not (lo <= ra < hi):
                    continue  # overlap copy: pairs owned by its own block
                for b2 in range(a + 1, len(g)):
                    d = int(ranks[b2]) - ra
                    if d > window:
                        break
                    rows_out.append((ks[a], ids[a], ks[b2], ids[b2], d))
        if not rows_out:
            return pd.DataFrame(
                {"ka": pd.Series(dtype="string"),
                 "ida": pd.Series(dtype="string"),
                 "kb": pd.Series(dtype="string"),
                 "idb": pd.Series(dtype="string"),
                 "dist": pd.Series(dtype="int64")}
            )
        out = pd.DataFrame(rows_out, columns=list(cols))
        out["dist"] = out["dist"].astype("int64")
        return out

    return (
        ranked.map_batches(route_blocks, batch_format="pandas")
        .map_batches(add_blk_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .repartition(8)
    )


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (insert/delete/substitute, unit costs) —
    matches DuckDB's levenshtein() exactly, so fuzzy-pair outputs
    value-compare across engines."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_key_pairs(
    ds,
    key_col: str,
    id_col: str,
    window: int = 3,
    max_edit: int = 2,
    prefix_len: int = 2,
    block: int | None = None,
):
    """Fuzzy-duplicate key pairs: sorted-neighborhood candidates verified
    by exact edit distance <= ``max_edit`` — the classic merge/purge
    pipeline (block in key order, verify with an exact metric), the ER
    step that catches typo'd / renamed entities hash blocking can't.

    -> Dataset(ka, ida, kb, idb, dist, edit): surviving pairs with their
    rank distance and edit distance (all-integer output).

    Scale shape: inherits sorted_neighborhood_pairs' plan; the verify is
    a pure per-batch map over candidate rows (O(window * n) candidates,
    each a short-string DP)."""

    cands = sorted_neighborhood_pairs(
        ds, key_col, id_col, window=window,
        prefix_len=prefix_len, block=block,
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            out = b.copy()
            out["edit"] = pd.Series(dtype="int64")
            return out
        ed = [levenshtein(x, y) for x, y in zip(b["ka"], b["kb"])]
        out = b.copy()
        out["edit"] = pd.array(ed, dtype="int64")
        return out[out["edit"] <= max_edit]

    return cands.map_batches(verify, batch_format="pandas")

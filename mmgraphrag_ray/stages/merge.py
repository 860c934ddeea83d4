"""Node/edge merge algebra as partial-aggregating groupby shuffles.

Reference semantics (text2graph.py:140-279), preserved exactly:

- node `entity_type`  = mode over mention types (Counter count-sort,
  text2graph.py:176-183). Tie-break: the reference's sort is stable on
  Counter insertion order, which is scheduling-dependent in a distributed
  run; we deterministically break ties by (count desc, type asc).
- node/edge `description` = "<SEP>".join(sorted(set(descs)))
  (text2graph.py:184-187, 250-253), then the >= 500-token summarization gate
  (text2graph.py:93-116, mmgraphrag.py:52); the sandbox LLM stand-in is a
  deterministic truncation to the gate size (decode(tokens[:gate]))
  applied through the same injectable seam the reference exposes.
- node/edge `source_id` = "<SEP>".join(set(ids)) (text2graph.py:188-191,
  254-257). The reference's Python-set order is unspecified; we sort for
  determinism (set-equal content).
- edge `weight` = sum, `order` = min with default 1 (text2graph.py:247-249);
  edge key is the undirected sorted pair (text2graph.py:441-443).
- UNKNOWN endpoint backfill (text2graph.py:258-268): a relationship endpoint
  with no entity mention becomes a node with entity_type '"UNKNOWN"' carrying
  the (pre-summarize) merged description/source_id of one incident edge. The
  reference takes whichever edge its event loop processed first; we take the
  edge with the smallest (src_id, tgt_id) key, deterministically.

Scale design — two layers, both vectorized:

1. PARTIAL aggregation inside map_batches: per batch, mention rows collapse
   to "tall" state rows — (key, kind, value, n) where kind 't' carries
   type-occurrence counts, 'd'/'s' carry the deduplicated description /
   source-id strings, and edge rows carry (weight-sum, order-min) numerics.
   All of it is pandas value_counts / drop_duplicates (C speed).  This is
   the combiner that keeps mega-entity hot keys (north_rule skew case) from
   shipping every raw mention through the all-to-all shuffle.
2. FINAL merge grouped by bucket = crc32(key) % N_BUCKETS, not by raw key:
   Ray's map_groups pays per-GROUP Python+Arrow overhead, prohibitive at
   millions of keys; a bucket groupby runs one vectorized pandas reduction
   over every key in the bucket at once.  Equal keys share a bucket, so the
   result is identical.  All reductions are associative+commutative
   (count sum, set union, float sum, int min) — proven safe by the
   permutation/partitioning invariance property test.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import df_to_table
from ..hashing import bucket_strs
from ..tokenizer import truncate_tokens
from .. import GRAPH_FIELD_SEP

# Internal composite-key separator (undirected edge pairs, backfill winner
# packing, the winner-payload join key).  CONTRACT — this comment is the
# single place it lives: entity names / source ids contain no control
# characters (< 0x20).  clean_str strips them at mention normalization
# (textutils.py), so \x1f can never occur in a key segment and string-min on
# packed keys equals tuple-min on the segments; NUL specifically is also
# dropped by Ray's hash shuffle (see memory: raykg-engine-gotchas), which is
# why the separator is 0x1f and not 0x00.
_KEY_SEP = "\x1f"

N_BUCKETS = 64


def _bucket_of(series: pd.Series, n_buckets: int = N_BUCKETS) -> pd.Series:
    return pd.Series(bucket_strs(series, n_buckets), index=series.index)


def summarize_description(description: str, gate_tokens: int) -> str:
    """Summarization seam (reference text2graph.py:93-116): identity below the
    token gate, deterministic truncation stand-in at/above it."""
    toks_text = truncate_tokens(description, gate_tokens)
    if toks_text == description:  # fewer than gate tokens -> unchanged
        return description
    return toks_text


def _summarize_series(desc: pd.Series, gate_tokens: int) -> pd.Series:
    """Vectorized gate: a description shorter than `gate_tokens` CHARS cannot
    reach `gate_tokens` tokens (every token is >=1 char), so only long rows
    pay the tokenizer."""
    out = desc.copy()
    maybe = desc.str.len() >= gate_tokens
    if maybe.any():
        out.loc[maybe] = [
            summarize_description(d, gate_tokens) for d in desc[maybe]
        ]
    return out


def _join_sorted(frame: pd.DataFrame, key: str, val: str) -> pd.Series:
    """Per-key sorted-set '<SEP>' join; input rows are already unique pairs."""
    frame = frame.drop_duplicates([key, val]).sort_values([key, val], kind="mergesort")
    return frame.groupby(key, sort=False)[val].agg(GRAPH_FIELD_SEP.join)


# ------------------------------------------------- arrow final kernels
#
# The reduce finals are the single biggest CPU sink of kg_full (measured
# 117 s CPU at 60k files as pandas sort_values + groupby.agg(str.join)).
# These kernels do the same algebra in Arrow C++: sort_indices for the
# ordering, neighbor-inequality for group boundaries, binary_join for the
# <SEP> concatenation.  Semantics are byte-identical to the pandas
# versions (same sorted-unique-set joins, same mode tie-breaks) — the
# pandas wrappers below delegate here, so every caller shares one code
# path and the SQL oracles keep passing unchanged.


def _as_array(col) -> pa.Array:
    """Table column (ChunkedArray or Array) -> single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # older pyarrow returns ChunkedArray
        col = col.chunk(0) if col.num_chunks else pa.array([], col.type)
    return col


def _group_starts(keys: pa.Array) -> np.ndarray:
    """Indices where a new key group begins in an already-sorted array."""
    n = len(keys)
    if n == 0:
        return np.array([], dtype=np.int64)
    neq = pc.not_equal(keys.slice(1, n - 1), keys.slice(0, n - 1))
    return np.concatenate(
        ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1)
    )


def _sorted_group_join_arrow(t: pa.Table, key: str, val: str):
    """(key,val) rows -> (sorted unique keys, sorted-unique-set <SEP> join
    per key), both pa.Array."""
    u = t.select([key, val]).group_by([key, val]).aggregate([])
    idx = pc.sort_indices(
        u, sort_keys=[(key, "ascending"), (val, "ascending")]
    )
    u = u.take(idx)
    if u.num_rows == 0:
        return pa.array([], pa.string()), pa.array([], pa.string())
    k = _as_array(u.column(key))
    starts = _group_starts(k)
    offsets = np.concatenate((starts, [u.num_rows])).astype(np.int64)
    vals = _as_array(u.column(val))
    lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
    joined = pc.binary_join(lists, GRAPH_FIELD_SEP)
    return k.take(pa.array(starts, pa.int64())), joined


def _mode_per_key_arrow(t: pa.Table, key: str, val: str, n: str):
    """A2 type-mode policy: per key, the value with the highest summed `n`;
    ties break lexicographically ascending."""
    c = t.select([key, val, n]).group_by([key, val]).aggregate([(n, "sum")])
    idx = pc.sort_indices(
        c,
        sort_keys=[(key, "ascending"), (f"{n}_sum", "descending"), (val, "ascending")],
    )
    c = c.take(idx)
    if c.num_rows == 0:
        return pa.array([], pa.string()), pa.array([], pa.string())
    k = _as_array(c.column(key))
    starts = pa.array(_group_starts(k), pa.int64())
    return k.take(starts), _as_array(c.column(val)).take(starts)


def _summarize_array(descs: pa.Array, gate_tokens: int) -> pa.Array:
    """Arrow port of _summarize_series: only rows with >= gate CHARS can
    reach the token gate; scatter-replace just those."""
    maybe = pc.greater_equal(pc.utf8_length(descs), gate_tokens)
    if not pc.any(maybe).as_py():
        return descs
    arr = descs.to_numpy(zero_copy_only=False)
    for i in np.flatnonzero(maybe.to_numpy(zero_copy_only=False)):
        arr[i] = summarize_description(arr[i], gate_tokens)
    return pa.array(arr, pa.string())


def _check_aligned(a: pa.Array, b: pa.Array, what: str) -> None:
    if len(a) != len(b) or (len(a) and not pc.all(pc.equal(a, b)).as_py()):
        raise ValueError(
            f"merge final: per-kind key sets diverged ({what}) — every "
            "partial producer must emit all kinds for every key"
        )


def _node_final_arrow(bucket: pa.Table, gate_tokens: int) -> pa.Table:
    kind = bucket.column("kind")
    tkeys, types = _mode_per_key_arrow(
        bucket.filter(pc.equal(kind, "t")), "entity_name", "value", "n"
    )
    dkeys, descs = _sorted_group_join_arrow(
        bucket.filter(pc.equal(kind, "d")), "entity_name", "value"
    )
    skeys, sids = _sorted_group_join_arrow(
        bucket.filter(pc.equal(kind, "s")), "entity_name", "value"
    )
    _check_aligned(tkeys, dkeys, "node t/d")
    _check_aligned(tkeys, skeys, "node t/s")
    return pa.table(
        {
            "entity_name": tkeys,
            "entity_type": types,
            "description": _summarize_array(descs, gate_tokens),
            "source_id": sids,
        }
    )


def _edge_final_arrow(bucket: pa.Table, gate_tokens: int) -> pa.Table:
    kind = bucket.column("kind")
    w = bucket.filter(pc.equal(kind, "w"))
    agg = w.select(["edge_key", "wsum", "omin"]).group_by("edge_key").aggregate(
        [("wsum", "sum"), ("omin", "min")]
    )
    agg = agg.take(
        pc.sort_indices(agg, sort_keys=[("edge_key", "ascending")])
    )
    dkeys, descs_full = _sorted_group_join_arrow(
        bucket.filter(pc.equal(kind, "d")), "edge_key", "value"
    )
    skeys, sids = _sorted_group_join_arrow(
        bucket.filter(pc.equal(kind, "s")), "edge_key", "value"
    )
    if agg.num_rows == 0:
        return pa.table(
            {
                "src_id": pa.array([], pa.string()),
                "tgt_id": pa.array([], pa.string()),
                "weight": pa.array([], pa.float64()),
                "description": pa.array([], pa.string()),
                "description_full": pa.array([], pa.string()),
                "source_id": pa.array([], pa.string()),
                "order": pa.array([], pa.int32()),
            }
        )
    keys = _as_array(agg.column("edge_key"))
    _check_aligned(keys, dkeys, "edge w/d")
    _check_aligned(keys, skeys, "edge w/s")
    split = pc.split_pattern(keys, pattern=_KEY_SEP, max_splits=1)
    return pa.table(
        {
            "src_id": pc.list_element(split, 0),
            "tgt_id": pc.list_element(split, 1),
            "weight": agg.column("wsum_sum"),
            "description": _summarize_array(descs_full, gate_tokens),
            "description_full": descs_full,
            "source_id": sids,
            "order": pc.cast(agg.column("omin_min"), pa.int32()),
        }
    )


# ---------------------------------------------------------------- node merge


_NODE_PARTIAL_COLS = ["entity_name", "kind", "value", "n", "bucket"]
_EDGE_PARTIAL_COLS = ["edge_key", "kind", "value", "wsum", "omin", "bucket"]
_ENDPOINT_COLS = [
    "entity_name", "kind", "src_id", "tgt_id", "description", "source_id", "bucket",
]


def _empty_frame(cols: list[str]) -> pd.DataFrame:
    typed = {
        "n": "int64", "wsum": "float64", "omin": "int64",
        "bucket": "int32", "weight": "float64", "order": "int32",
    }
    return pd.DataFrame({c: pd.Series(dtype=typed.get(c, "object")) for c in cols})


_PARTIAL_TYPES = {
    "n": pa.int64(), "wsum": pa.float64(), "omin": pa.int64(),
    "bucket": pa.int32(), "weight": pa.float64(), "order": pa.int32(),
}


def _partials_to_arrow(frame: pd.DataFrame) -> pa.Table:
    """Partial rows -> metadata-free Arrow before the shuffle (arrowutil):
    stable string/int64/float64 schema regardless of batch content."""
    return df_to_table(
        frame, **{c: t for c, t in _PARTIAL_TYPES.items() if c in frame.columns}
    )


def _node_partial_arrow(batch: pd.DataFrame) -> pa.Table:
    return _partials_to_arrow(_node_partial(batch))


def _edge_partial_arrow(batch: pd.DataFrame) -> pa.Table:
    return _partials_to_arrow(_edge_partial(batch))


def _node_partial(batch: pd.DataFrame) -> pd.DataFrame:
    if len(batch) == 0:
        return _empty_frame(_NODE_PARTIAL_COLS)
    t = (
        batch.groupby(["entity_name", "entity_type"], sort=False)
        .size()
        .reset_index(name="n")
        .rename(columns={"entity_type": "value"})
    )
    t["kind"] = "t"
    d = batch[["entity_name", "description"]].drop_duplicates().rename(
        columns={"description": "value"}
    )
    d["kind"], d["n"] = "d", 1
    s = batch[["entity_name", "source_id"]].drop_duplicates().rename(
        columns={"source_id": "value"}
    )
    s["kind"], s["n"] = "s", 1
    out = pd.concat([t, d, s], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["bucket"] = _bucket_of(out["entity_name"])
    return out[["entity_name", "kind", "value", "n", "bucket"]]


def _make_node_final(gate_tokens: int):
    def node_bucket_final(bucket: pd.DataFrame) -> pd.DataFrame:
        cols = ["entity_name", "kind", "value", "n"]
        t = df_to_table(bucket[cols], n=pa.int64())
        return _node_final_arrow(t, gate_tokens).to_pandas()

    return node_bucket_final


def _restrict_buckets(partials_ds, buckets):
    """Filter partial rows to a bucket subset (bucket-granular shuffle
    resume: reduce+write only the missing buckets; see lineage.bucketed_stage)."""
    if buckets is None:
        return partials_ds
    keep = frozenset(int(b) for b in buckets)

    def flt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t.column("bucket"), pa.array(sorted(keep), pa.int32())))

    return partials_ds.map_batches(flt, batch_format="pyarrow")


def _with_bucket_col(final_fn, emit: bool):
    if not emit:
        return final_fn

    def wrapped(bucket: pd.DataFrame) -> pd.DataFrame:
        out = final_fn(bucket)
        out["_rbucket"] = int(bucket["bucket"].iloc[0]) if len(bucket) else -1
        return out

    return wrapped


def merge_nodes(entity_mentions_ds, cfg=None, buckets=None, emit_bucket_col=False):
    """mentions(entity_name, entity_type, description, source_id) -> nodes.

    `buckets` restricts the reduce to a bucket subset and `emit_bucket_col`
    tags output rows with their reduce bucket — together they give the
    write path bucket-granular resume (lineage.bucketed_stage)."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = entity_mentions_ds.map_batches(_node_partial_arrow, batch_format="pandas")
    partials = _restrict_buckets(partials, buckets)
    merged = partials.groupby("bucket").map_groups(
        _with_bucket_col(_make_node_final(cfg.entity_summary_to_max_tokens), emit_bucket_col),
        batch_format="pandas",
    )
    # coalesce away the schema-less empty blocks hash-shuffle map_groups
    # emits for empty partitions (they crash any downstream shuffle)
    return merged.repartition(16)


# ---------------------------------------------------------------- edge merge


def _edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
    if len(batch) == 0:
        return _empty_frame(_EDGE_PARTIAL_COLS)
    batch = batch.assign(edge_key=batch["src_id"] + _KEY_SEP + batch["tgt_id"])
    batch["order"] = batch["order"].fillna(1).astype("int64")
    wo = batch.groupby("edge_key", as_index=False, sort=False).agg(
        wsum=("weight", "sum"), omin=("order", "min")
    )
    wo["kind"], wo["value"] = "w", ""
    d = batch[["edge_key", "description"]].drop_duplicates().rename(
        columns={"description": "value"}
    )
    d["kind"], d["wsum"], d["omin"] = "d", 0.0, 0
    s = batch[["edge_key", "source_id"]].drop_duplicates().rename(
        columns={"source_id": "value"}
    )
    s["kind"], s["wsum"], s["omin"] = "s", 0.0, 0
    out = pd.concat([wo, d, s], ignore_index=True)
    out["wsum"] = out["wsum"].astype("float64")
    out["omin"] = out["omin"].astype("int64")
    out["bucket"] = _bucket_of(out["edge_key"])
    return out[["edge_key", "kind", "value", "wsum", "omin", "bucket"]]


def _make_edge_final(gate_tokens: int):
    # public description gets the summarize gate; description_full (the
    # pre-summarize join) feeds UNKNOWN backfill — the reference inserts
    # endpoint nodes BEFORE summarizing (text2graph.py:258-271).
    def edge_bucket_final(bucket: pd.DataFrame) -> pd.DataFrame:
        cols = ["edge_key", "kind", "value", "wsum", "omin"]
        t = df_to_table(bucket[cols], wsum=pa.float64(), omin=pa.int64())
        return _edge_final_arrow(t, gate_tokens).to_pandas()

    return edge_bucket_final


def merge_edges(rel_mentions_ds, cfg=None, buckets=None, emit_bucket_col=False):
    """rel_mentions(src_id<=tgt_id, weight, description, source_id, order)
    -> edges (with internal description_full column).  `buckets` /
    `emit_bucket_col`: bucket-granular resume, see merge_nodes."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = rel_mentions_ds.map_batches(_edge_partial_arrow, batch_format="pandas")
    partials = _restrict_buckets(partials, buckets)
    merged = partials.groupby("bucket").map_groups(
        _with_bucket_col(_make_edge_final(cfg.entity_summary_to_max_tokens), emit_bucket_col),
        batch_format="pandas",
    )
    return merged.repartition(16)


# ------------------------------------------------- fused node+edge merge


def merge_graph(entity_mentions_ds=None, rel_mentions_ds=None, cfg=None,
                mentions_ds=None, backfill_candidates: bool = False):
    """Node AND edge merges through ONE shuffle: partial rows from both
    tables share a unified tall schema and a routing bucket
    crc32(table+key) % N; one groupby(bucket) runs both vectorized finals.
    Halves the all-to-all count of the merge phase (same algebra as
    merge_nodes/merge_edges — equality asserted by tests).

    Pass EITHER the pre-split (entity_mentions_ds, rel_mentions_ds) pair OR
    the unified ``mentions_ds``: the unified path computes both partials in
    ONE scan per batch (one task pool instead of two filtered re-scans of
    the mentions table — measured ~2-3 s at sf0.1/32 CPUs).

    ``backfill_candidates=True`` (unified path only) additionally threads
    the UNKNOWN-backfill WINNER SELECTION through the SAME shuffle: each
    rel batch emits per-batch-min key-only candidate rows (table='c',
    key=endpoint, value=src+US+tgt) bucketed by the NODE bucket function,
    so a candidate meets every node partial of its name in one group and
    the anti-join (reference text2graph.py:258-268) costs ZERO extra
    shuffle ops — backfill_unknown_nodes then only fetches payloads.

    Returns (nodes_ds, edges_ds[, winners_ds]) — lazy projections over the
    ONE materialized fused table (multiple consumers re-map, never
    re-shuffle)."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    gate = cfg.entity_summary_to_max_tokens

    UNI = ["table", "key", "kind", "value", "n", "wsum", "omin", "bucket"]

    def _empty_uni():
        return _partials_to_arrow(
            pd.DataFrame({c: pd.Series(dtype="object") for c in UNI})
        )

    def _node_uni_frame(batch: pd.DataFrame) -> pd.DataFrame | None:
        p = _node_partial(batch)
        if len(p) == 0:
            return None
        out = pd.DataFrame(
            {
                "table": "n",
                "key": p["entity_name"],
                "kind": p["kind"],
                "value": p["value"],
                "n": p["n"],
                "wsum": 0.0,
                "omin": 0,
            }
        )
        out["bucket"] = _bucket_of("n" + out["key"])
        return out

    def _edge_uni_frame(batch: pd.DataFrame) -> pd.DataFrame | None:
        p = _edge_partial(batch)
        if len(p) == 0:
            return None
        out = pd.DataFrame(
            {
                "table": "e",
                "key": p["edge_key"],
                "kind": p["kind"],
                "value": p["value"],
                "n": 0,
                "wsum": p["wsum"],
                "omin": p["omin"],
            }
        )
        out["bucket"] = _bucket_of("e" + out["key"])
        return out

    def _unify_node(batch: pd.DataFrame):
        f = _node_uni_frame(batch)
        return _partials_to_arrow(f) if f is not None else _empty_uni()

    def _unify_edge(batch: pd.DataFrame):
        f = _edge_uni_frame(batch)
        return _partials_to_arrow(f) if f is not None else _empty_uni()

    def _unify_both(batch: pd.DataFrame):
        parts = []
        ent = batch[batch["kind"] == "entity"]
        if len(ent):
            f = _node_uni_frame(ent)
            if f is not None:
                parts.append(f)
        rel = batch[batch["kind"] == "rel"]
        if len(rel):
            f = _edge_uni_frame(rel)
            if f is not None:
                parts.append(f)
            if backfill_candidates:
                # per-batch combiner: one candidate row per endpoint name,
                # min (src, tgt) tie-break packed as src+US+tgt (US=0x1f
                # sorts below every name char, so string min == tuple min)
                packed = rel["src_id"] + "\x1f" + rel["tgt_id"]
                cand = pd.DataFrame({
                    "key": pd.concat([rel["src_id"], rel["tgt_id"]],
                                     ignore_index=True),
                    "value": pd.concat([packed, packed], ignore_index=True),
                })
                cand = cand.sort_values(["key", "value"], kind="mergesort")
                cand = cand.drop_duplicates(subset=["key"], keep="first")
                cf = pd.DataFrame({
                    "table": "c", "key": cand["key"], "kind": "cand",
                    "value": cand["value"], "n": 0, "wsum": 0.0, "omin": 0,
                })
                # NODE bucket function: candidates must meet the node rows
                cf["bucket"] = _bucket_of("n" + cf["key"])
                parts.append(cf)
        if not parts:
            return _empty_uni()
        return _partials_to_arrow(pd.concat(parts, ignore_index=True))

    OUT_TYPES = {
        "table": pa.string(), "entity_name": pa.string(),
        "entity_type": pa.string(), "src_id": pa.string(),
        "tgt_id": pa.string(), "weight": pa.float64(),
        "description": pa.string(), "description_full": pa.string(),
        "source_id": pa.string(), "order": pa.int32(),
    }
    OUT_SCHEMA = pa.schema(list(OUT_TYPES.items()))

    def _pad(t: pa.Table, table_tag: str) -> pa.Table:
        n = t.num_rows
        cols = []
        for name, typ in OUT_TYPES.items():
            if name == "table":
                cols.append(pa.array([table_tag] * n, typ))
            elif name in t.column_names:
                cols.append(pc.cast(t.column(name), typ))
            else:
                cols.append(pa.nulls(n, typ))
        return pa.table(dict(zip(OUT_TYPES.keys(), cols)))

    def fused_final(bucket: pa.Table) -> pa.Table:
        tcol = bucket.column("table")
        parts = []
        nrows = bucket.filter(pc.equal(tcol, "n"))
        if nrows.num_rows:
            nf = _node_final_arrow(
                nrows.rename_columns(
                    [("entity_name" if c == "key" else c) for c in nrows.column_names]
                ),
                gate,
            )
            parts.append(_pad(nf, "n"))
        erows = bucket.filter(pc.equal(tcol, "e"))
        if erows.num_rows:
            ef = _edge_final_arrow(
                erows.rename_columns(
                    [("edge_key" if c == "key" else c) for c in erows.column_names]
                ),
                gate,
            )
            parts.append(_pad(ef, "e"))
        crows = bucket.filter(pc.equal(tcol, "c"))
        if crows.num_rows:
            # backfill winner selection IN the merge shuffle: min packed
            # (src,tgt) per endpoint, anti-joined against this bucket's
            # node names (complete: both sides bucket on crc32('n'+name))
            ct = (crows.select(["key", "value"]).group_by("key")
                  .aggregate([("value", "min")]))
            if nrows.num_rows:
                ct = ct.filter(pc.invert(pc.is_in(
                    ct.column("key"),
                    value_set=pc.unique(nrows.column("key")))))
            if ct.num_rows:
                pairs = [v.split("\x1f", 1) for v in ct.column("value_min").to_pylist()]
                w = pa.table({
                    "entity_name": ct.column("key"),
                    "src_id": pa.array([p[0] for p in pairs], pa.string()),
                    "tgt_id": pa.array([p[1] for p in pairs], pa.string()),
                })
                parts.append(_pad(w, "c"))
        if not parts:
            return OUT_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    if mentions_ds is not None:
        both = mentions_ds.map_batches(_unify_both, batch_format="pandas")
    else:
        both = entity_mentions_ds.map_batches(_unify_node, batch_format="pandas").union(
            rel_mentions_ds.map_batches(_unify_edge, batch_format="pandas")
        )
    from ..arrowutil import drop_empty_blocks
    from ..runtime import pin_dataset

    # No trailing repartition: the shuffle already emits one balanced
    # block per aggregate partition, so the old repartition(N_BUCKETS)
    # was a second all-to-all over the full merged table purely to split
    # blocks (measured 1.6 s at sf0.1, O(rows) at scale).  The only real
    # hazard — schema-less EMPTY partitions at tiny scale poisoning the
    # backfill union — is removed zero-copy by drop_empty_blocks.
    merged = pin_dataset(
        drop_empty_blocks(
            both.groupby("bucket")
            .map_groups(fused_final, batch_format="pyarrow")
        ),
        "merged_fused",
    )

    # LAZY projections: `merged` is the pinned table; re-deriving either
    # side is one cheap map over materialized blocks, so consuming nodes or
    # edges twice (backfill + sink) costs two map passes — strictly cheaper
    # than materializing both projections up front (measured: ~2 full-table
    # object-store copies saved at 60k files).
    _NODE_COLS = ["entity_name", "entity_type", "description", "source_id"]

    def _nodes_proj(b: pd.DataFrame):
        out = (b[b["table"] == "n"][_NODE_COLS]
               if len(b) else _empty_frame(_NODE_COLS))
        # Arrow out: the backfill union's other side is Arrow, and mixed
        # pandas/arrow union members trip the executor's schema check
        return df_to_table(out, **{c: pa.string() for c in _NODE_COLS})

    nodes = merged.map_batches(_nodes_proj, batch_format="pandas")
    edges = merged.map_batches(
        lambda b: b[b["table"] == "e"][
            ["src_id", "tgt_id", "weight", "description", "description_full", "source_id", "order"]
        ].astype({"weight": "float64", "order": "int32"})
        if len(b)
        else _empty_frame(
            ["src_id", "tgt_id", "weight", "description", "description_full", "source_id", "order"]
        ),
        batch_format="pandas",
    )
    if not backfill_candidates:
        return nodes, edges
    def _winners_proj(b: pd.DataFrame):
        cols = ["entity_name", "src_id", "tgt_id"]
        out = b[b["table"] == "c"][cols] if len(b) else _empty_frame(cols)
        return df_to_table(out, entity_name=pa.string(),
                           src_id=pa.string(), tgt_id=pa.string())

    winners = merged.map_batches(_winners_proj, batch_format="pandas")
    return nodes, edges, winners


# ------------------------------------------------------ UNKNOWN backfill


def _winner_rows_to_unknown(hit: pd.DataFrame) -> "pa.Table":
    return df_to_table(
        pd.DataFrame(
            {
                "entity_name": hit["entity_name"].astype(object),
                "entity_type": pd.Series(
                    ['"UNKNOWN"'] * len(hit), dtype="object"),
                "description": hit["description_full"].astype(object),
                "source_id": hit["source_id"].astype(object),
            }
        ),
        entity_name=pa.string(), entity_type=pa.string(),
        description=pa.string(), source_id=pa.string(),
    )


def _fetch_winner_payloads(winners, edges_ds):
    """Winner (entity_name, src_id, tgt_id) rows -> UNKNOWN node rows with
    the winning edge's merged description_full/source_id payload.

    Dual plan (the same bounded shape as linking._alias_applier / F6):

    - winners.count() <= ``RAYKG_BACKFILL_WINNERS_MAX`` (default 2M):
      broadcast — the winners frame is `ray.put` ONCE and the payload fetch
      is one map-side vectorized pandas merge over the merged edges
      (payloads never shuffle; the driver only concatenates winner blocks).
    - above the cap (pathological UNKNOWN rate — winners scale with graph
      size in the worst case, so a fixed driver pull would OOM at 100 TB):
      pack the composite edge key src\\x1ftgt on both sides and run the
      bucketed large-large join (join.bucketed_join) — no driver state,
      payloads shuffle exactly once.

    ``winners`` must be materialized (both callers do), so count() is free.
    The \\x1f packing inherits the _KEY_SEP invariant documented at the top
    of this module: entity/source ids contain no control characters."""
    import os

    import ray as _ray

    cap = int(os.environ.get("RAYKG_BACKFILL_WINNERS_MAX", "2000000"))
    if winners.count() <= cap:
        wdf = winners.to_pandas()
        if len(wdf) == 0:
            wdf = pd.DataFrame({"entity_name": pd.Series(dtype=object),
                                "src_id": pd.Series(dtype=object),
                                "tgt_id": pd.Series(dtype=object)})
        wref = _ray.put(wdf[["entity_name", "src_id", "tgt_id"]])

        def fetch_payloads(batch: pd.DataFrame) -> pd.DataFrame:
            w = _ray.get(wref)
            hit = batch[["src_id", "tgt_id", "description_full", "source_id"]].merge(
                w, on=["src_id", "tgt_id"], how="inner"
            )
            return _winner_rows_to_unknown(hit)

        return edges_ds.map_batches(
            fetch_payloads, batch_format="pandas").repartition(4)

    # join plan: winners never touch the driver
    from .join import bucketed_join

    def pack_winners(batch: pd.DataFrame):
        out = pd.DataFrame(
            {
                "_ekey": batch["src_id"].astype(str)
                + _KEY_SEP
                + batch["tgt_id"].astype(str),
                "entity_name": batch["entity_name"].astype(object),
            }
            if len(batch)
            else {"_ekey": pd.Series(dtype=object),
                  "entity_name": pd.Series(dtype=object)}
        )
        return df_to_table(out, _ekey=pa.string(), entity_name=pa.string())

    def pack_edges(batch: pd.DataFrame):
        out = pd.DataFrame(
            {
                "_ekey": batch["src_id"].astype(str)
                + _KEY_SEP
                + batch["tgt_id"].astype(str),
                "description_full": batch["description_full"].astype(object),
                "source_id": batch["source_id"].astype(object),
            }
            if len(batch)
            else {"_ekey": pd.Series(dtype=object),
                  "description_full": pd.Series(dtype=object),
                  "source_id": pd.Series(dtype=object)}
        )
        return df_to_table(out, _ekey=pa.string(),
                           description_full=pa.string(), source_id=pa.string())

    joined = bucketed_join(
        edges_ds.map_batches(pack_edges, batch_format="pandas"),
        winners.map_batches(pack_winners, batch_format="pandas"),
        on="_ekey",
        how="inner",
    )
    return joined.map_batches(
        _winner_rows_to_unknown, batch_format="pandas")


def backfill_unknown_nodes(nodes_ds, edges_ds, winners_ds=None):
    """Anti-join: edge endpoints absent from nodes become '"UNKNOWN"'-typed
    nodes (reference text2graph.py:258-268). Returns the union nodes dataset.

    ``winners_ds`` (entity_name, src_id, tgt_id), when provided by
    merge_graph(backfill_candidates=True), IS the anti-join result computed
    inside the fused merge shuffle — this function then only runs the
    payload fetch, removing the whole winners shuffle from the hot path.

    Small-side broadcast path (the broadcast-join-threshold pattern): node
    NAMES are a key-only column — below `RAYKG_BROADCAST_NAMES_MAX` distinct
    names they're ray.put once and the anti-join runs as a map-side filter
    over the edges, skipping a hash-shuffle op's fixed setup latency.  The
    few surviving endpoints reduce in one coalesced block.  Above the bound
    (billions of entities), the bucketed-groupby variant computes the
    identical result with no driver state."""
    import os

    import ray as _ray

    # 200k default: A/B at 60k files / ~770k names showed the bucketed
    # shuffle at parity-or-better with the broadcast probe while carrying no
    # driver-side name table and no serial reduce tail — broadcast only pays
    # off where it skips a shuffle op's fixed ~2.5 s setup on SMALL graphs
    max_names = int(os.environ.get("RAYKG_BROADCAST_NAMES_MAX", "200000"))
    if winners_ds is not None:
        # _fetch_winner_payloads is its own dual plan (broadcast under
        # RAYKG_BACKFILL_WINNERS_MAX, bucketed join above) — never fall back
        # to recomputing the anti-join the fused shuffle already produced.
        winners = winners_ds.materialize()
        return nodes_ds.union(_fetch_winner_payloads(winners, edges_ds))
    # nodes_ds is a cheap projection over the pinned merge output, so this
    # count is one map pass, not a recomputation of the merge shuffle.
    if nodes_ds.count() <= max_names:
        names_df = nodes_ds.map_batches(
            lambda b: df_to_table(
                b[["entity_name"]].drop_duplicates()
                if len(b)
                else _empty_frame(["entity_name"])),
            batch_format="pandas",
        ).to_pandas()
        # empty-graph guard: an all-empty Dataset's to_pandas() drops cols
        ref = _ray.put(frozenset(
            names_df["entity_name"] if "entity_name" in names_df else ()))

        def probe_endpoints(batch: pd.DataFrame) -> pd.DataFrame:
            # membership-test FIRST, explode/min-reduce only the survivors:
            # the full explode sorts 2x|edges| long-string rows per batch,
            # while unknown endpoints are typically a few percent.  Also
            # set-membership per value, NOT pd.isin(known): isin rehashes
            # the entire broadcast name set on EVERY batch (O(|names|) per
            # block — both measured dominant at ~1M names / 1.4M edges).
            known = _ray.get(ref)
            frames = []
            for endpoint_col in ("src_id", "tgt_id"):
                vals = batch[endpoint_col]
                miss = np.fromiter(
                    (v not in known for v in vals), dtype=bool, count=len(vals)
                )
                if miss.any():
                    sub = batch[miss]
                    frames.append(
                        pd.DataFrame(
                            {
                                "entity_name": sub[endpoint_col],
                                "kind": "cand",
                                "src_id": sub["src_id"],
                                "tgt_id": sub["tgt_id"],
                                "description": sub["description_full"],
                                "source_id": sub["source_id"],
                            }
                        )
                    )
            if not frames:
                return _empty_frame(_ENDPOINT_COLS[:-1])
            out = pd.concat(frames, ignore_index=True)
            out = out.sort_values(
                ["entity_name", "src_id", "tgt_id"], kind="mergesort"
            ).drop_duplicates(subset=["entity_name"], keep="first")
            return _partials_to_arrow(out) if len(out) else out

        survivors = edges_ds.map_batches(probe_endpoints, batch_format="pandas")

        def final_min(batch: pd.DataFrame):
            if len(batch) == 0:
                return df_to_table(_empty_frame(
                    ["entity_name", "entity_type", "description", "source_id"]
                ))
            best = batch.sort_values(
                ["entity_name", "src_id", "tgt_id"], kind="mergesort"
            ).drop_duplicates(subset=["entity_name"], keep="first")
            return df_to_table(pd.DataFrame(
                {
                    "entity_name": best["entity_name"],
                    "entity_type": '"UNKNOWN"',
                    "description": best["description"],
                    "source_id": best["source_id"],
                }
            ))

        def partial_min(batch: pd.DataFrame) -> pd.DataFrame:
            # min of per-block mins == global min, so intermediate levels
            # keep the full candidate row (incl. the (src,tgt) tie-break key)
            if len(batch) == 0:
                return _empty_frame(_ENDPOINT_COLS[:-1])
            out = batch.sort_values(
                ["entity_name", "src_id", "tgt_id"], kind="mergesort"
            ).drop_duplicates(subset=["entity_name"], keep="first")
            return _partials_to_arrow(out)

        # survivors are the rare UNKNOWN endpoints, already min-reduced per
        # probe block — tree reduce: an 8-way intermediate level in parallel,
        # then the global min-(src,tgt) pass over one small coalesced block
        # (no aggregator-actor shuffle; the serial tail sees only the
        # twice-reduced partials)
        unknown = (
            survivors.repartition(8)
            .map_batches(partial_min, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(final_min, batch_format="pandas", batch_size=None)
        )
        return nodes_ds.union(unknown)

    # Bucketed scale path — KEY-ONLY shuffle: candidates carry just
    # (endpoint, src, tgt), never the description payload (shuffled bytes
    # scale with key width, like every other shuffle in this engine).  The
    # winners' payloads are fetched afterwards by _fetch_winner_payloads'
    # dual plan (broadcast under RAYKG_BACKFILL_WINNERS_MAX, bucketed join
    # above — no driver pull at any winner rate).
    def _explode_keys(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frame(["entity_name", "kind", "src_id", "tgt_id", "bucket"])
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "entity_name": batch[c],
                        "kind": "cand",
                        "src_id": batch["src_id"],
                        "tgt_id": batch["tgt_id"],
                    }
                )
                for c in ("src_id", "tgt_id")
            ],
            ignore_index=True,
        )
        out = out.sort_values(
            ["entity_name", "src_id", "tgt_id"], kind="mergesort"
        ).drop_duplicates(subset=["entity_name"], keep="first")
        out["bucket"] = _bucket_of(out["entity_name"])
        return _partials_to_arrow(out)

    def _marker_keys(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frame(["entity_name", "kind", "src_id", "tgt_id", "bucket"])
        out = pd.DataFrame(
            {
                "entity_name": batch["entity_name"],
                "kind": "node",
                "src_id": None,
                "tgt_id": None,
            }
        )
        out["bucket"] = _bucket_of(out["entity_name"])
        return _partials_to_arrow(out)

    def _winners_from_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        known = set(bucket.loc[bucket["kind"] == "node", "entity_name"])
        cands_b = bucket[
            (bucket["kind"] == "cand") & ~bucket["entity_name"].isin(known)
        ]
        best = cands_b.sort_values(
            ["entity_name", "src_id", "tgt_id"], kind="mergesort"
        ).drop_duplicates(subset=["entity_name"], keep="first")
        return best[["entity_name", "src_id", "tgt_id"]]

    winners = (
        edges_ds.map_batches(_explode_keys, batch_format="pandas")
        .union(nodes_ds.map_batches(_marker_keys, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(_winners_from_bucket, batch_format="pandas")
        .repartition(8)
        .materialize()
    )
    return nodes_ds.union(_fetch_winner_payloads(winners, edges_ds))


_EDGE_PUBLIC_COLS = ["src_id", "tgt_id", "weight", "description", "source_id", "order"]


def finalize_edges(edges_ds):
    """Drop the internal pre-summarize column from the public edges table
    (guarded map so empty schema-less blocks pass through typed)."""

    def select_public(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frame(_EDGE_PUBLIC_COLS)
        return batch[_EDGE_PUBLIC_COLS]

    return edges_ds.map_batches(select_public, batch_format="pandas")


# --------------------------------------------------- incremental merge

def _nodes_as_partials(nodes_ds):
    """Existing nodes -> partial rows for the incremental merge
    (reference upsert-with-existing, text2graph.py:164-191): the existing
    entity_type counts ONCE; description and source_id split on <SEP> and
    set-union with the new mentions.

    DELIBERATE DEVIATION (documented like the tie-break deviations above):
    the reference appends the existing description as ONE atomic set element
    (only source_id is split, text2graph.py:168-173), which makes segment
    order depend on upsert history.  We split BOTH on <SEP> — the idempotent
    closure — so incremental results equal a from-scratch batch run whenever
    the algebra is history-free (asserted by test_incremental.py); the two
    policies contain identical segment SETS, they differ only in ordering
    and duplicate-segment collapse."""

    def to_partials(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frame(_NODE_PARTIAL_COLS)
        frames = []
        t = pd.DataFrame(
            {"entity_name": batch["entity_name"], "kind": "t",
             "value": batch["entity_type"], "n": 1}
        )
        frames.append(t)
        for kind, col in (("d", "description"), ("s", "source_id")):
            expl = batch[["entity_name", col]].copy()
            expl[col] = expl[col].str.split(GRAPH_FIELD_SEP)
            expl = expl.explode(col)
            frames.append(
                pd.DataFrame(
                    {"entity_name": expl["entity_name"], "kind": kind,
                     "value": expl[col], "n": 1}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        out["bucket"] = _bucket_of(out["entity_name"])
        return _partials_to_arrow(out[_NODE_PARTIAL_COLS])

    return nodes_ds.map_batches(to_partials, batch_format="pandas")


def _edges_as_partials(edges_ds):
    """Existing edges -> partial rows (text2graph.py:232-257: weight joins
    the sum, order joins the min, desc/source split-unioned)."""

    def to_partials(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return _empty_frame(_EDGE_PARTIAL_COLS)
        key = batch["src_id"] + _KEY_SEP + batch["tgt_id"]
        frames = [
            pd.DataFrame(
                {"edge_key": key, "kind": "w", "value": "",
                 "wsum": batch["weight"].astype("float64"),
                 "omin": batch["order"].astype("int64")}
            )
        ]
        for kind, col in (("d", "description"), ("s", "source_id")):
            expl = pd.DataFrame({"edge_key": key, col: batch[col].str.split(GRAPH_FIELD_SEP)})
            expl = expl.explode(col)
            frames.append(
                pd.DataFrame(
                    {"edge_key": expl["edge_key"], "kind": kind,
                     "value": expl[col], "wsum": 0.0, "omin": 0}
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["wsum"] = out["wsum"].astype("float64")
        out["omin"] = out["omin"].astype("int64")
        out["bucket"] = _bucket_of(out["edge_key"])
        return _partials_to_arrow(out[_EDGE_PARTIAL_COLS])

    return edges_ds.map_batches(to_partials, batch_format="pandas")


def merge_nodes_incremental(new_entity_mentions_ds, existing_nodes_ds, cfg=None):
    """Union of new-mention partials and existing-node partials through the
    same bucketed final — the distributed closure of the reference's
    upsert-with-existing path.  NOTE the summarize gate re-applies to the
    re-joined description, as it does on every reference upsert."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = new_entity_mentions_ds.map_batches(
        _node_partial_arrow, batch_format="pandas"
    ).union(_nodes_as_partials(existing_nodes_ds))
    merged = partials.groupby("bucket").map_groups(
        _make_node_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
    )
    return merged.repartition(N_BUCKETS)


def merge_edges_incremental(new_rel_mentions_ds, existing_edges_ds, cfg=None):
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = new_rel_mentions_ds.map_batches(
        _edge_partial_arrow, batch_format="pandas"
    ).union(_edges_as_partials(existing_edges_ds))
    merged = partials.groupby("bucket").map_groups(
        _make_edge_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
    )
    return merged.repartition(N_BUCKETS)

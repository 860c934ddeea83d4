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

Scale design: every reduction here is associative (Counter sum, set union,
float sum, int min), so each is computed as a per-batch PARTIAL aggregate
inside map_batches (one serialized state row per key per batch) followed by a
small groupby over partials — the combiner pattern that keeps mega-entity hot
keys (north_rule skew case) from shipping every raw mention through the
all-to-all shuffle.
"""

from __future__ import annotations

import json
from collections import Counter

import pandas as pd

from ..tokenizer import truncate_tokens
from .. import GRAPH_FIELD_SEP

_KEY_SEP = "\x1f"  # internal composite-key separator for the undirected pair


def summarize_description(description: str, gate_tokens: int) -> str:
    """Summarization seam (reference text2graph.py:93-116): identity below the
    token gate, deterministic truncation stand-in at/above it."""
    toks_text = truncate_tokens(description, gate_tokens)
    if toks_text == description:  # fewer than gate tokens -> unchanged
        return description
    return toks_text


# ---------------------------------------------------------------- node merge


def _node_partial(batch: pd.DataFrame) -> pd.DataFrame:
    rows = {"entity_name": [], "type_counts": [], "descs": [], "source_ids": []}
    for name, g in batch.groupby("entity_name", sort=False):
        rows["entity_name"].append(name)
        rows["type_counts"].append(json.dumps(dict(Counter(g["entity_type"]))))
        rows["descs"].append(json.dumps(sorted(set(g["description"]))))
        rows["source_ids"].append(json.dumps(sorted(set(g["source_id"]))))
    return pd.DataFrame(rows)


def _make_node_final(gate_tokens: int):
    def node_final(group: pd.DataFrame) -> pd.DataFrame:
        counts: Counter = Counter()
        descs: set = set()
        sids: set = set()
        for tc, d, s in zip(group["type_counts"], group["descs"], group["source_ids"]):
            counts.update(json.loads(tc))
            descs.update(json.loads(d))
            sids.update(json.loads(s))
        entity_type = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        description = summarize_description(
            GRAPH_FIELD_SEP.join(sorted(descs)), gate_tokens
        )
        return pd.DataFrame(
            {
                "entity_name": [group["entity_name"].iloc[0]],
                "entity_type": [entity_type],
                "description": [description],
                "source_id": [GRAPH_FIELD_SEP.join(sorted(sids))],
            }
        )

    return node_final


def merge_nodes(entity_mentions_ds, cfg=None):
    """mentions(entity_name, entity_type, description, source_id) -> nodes."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = entity_mentions_ds.map_batches(_node_partial, batch_format="pandas")
    return partials.groupby("entity_name").map_groups(
        _make_node_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
    )


# ---------------------------------------------------------------- edge merge


def _edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
    batch = batch.assign(edge_key=batch["src_id"] + _KEY_SEP + batch["tgt_id"])
    rows = {
        "edge_key": [],
        "weight_sum": [],
        "order_min": [],
        "descs": [],
        "source_ids": [],
    }
    for key, g in batch.groupby("edge_key", sort=False):
        rows["edge_key"].append(key)
        rows["weight_sum"].append(float(g["weight"].sum()))
        rows["order_min"].append(int(g["order"].fillna(1).min()))
        rows["descs"].append(json.dumps(sorted(set(g["description"]))))
        rows["source_ids"].append(json.dumps(sorted(set(g["source_id"]))))
    return pd.DataFrame(rows)


def _make_edge_final(gate_tokens: int):
    def edge_final(group: pd.DataFrame) -> pd.DataFrame:
        descs: set = set()
        sids: set = set()
        for d, s in zip(group["descs"], group["source_ids"]):
            descs.update(json.loads(d))
            sids.update(json.loads(s))
        src, tgt = group["edge_key"].iloc[0].split(_KEY_SEP)
        description_full = GRAPH_FIELD_SEP.join(sorted(descs))
        return pd.DataFrame(
            {
                "src_id": [src],
                "tgt_id": [tgt],
                "weight": [float(group["weight_sum"].sum())],
                "description": [summarize_description(description_full, gate_tokens)],
                # pre-summarize description, used by UNKNOWN backfill
                # (the reference inserts endpoint nodes BEFORE summarizing,
                # text2graph.py:258-271); dropped from the public edges table.
                "description_full": [description_full],
                "source_id": [GRAPH_FIELD_SEP.join(sorted(sids))],
                "order": [int(group["order_min"].min())],
            }
        )

    return edge_final


def merge_edges(rel_mentions_ds, cfg=None):
    """rel_mentions(src_id<=tgt_id, weight, description, source_id, order)
    -> edges (with internal description_full column)."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    partials = rel_mentions_ds.map_batches(_edge_partial, batch_format="pandas")
    return partials.groupby("edge_key").map_groups(
        _make_edge_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
    )


# ------------------------------------------------------ UNKNOWN backfill


def _explode_endpoints(batch: pd.DataFrame) -> pd.DataFrame:
    frames = []
    for endpoint_col in ("src_id", "tgt_id"):
        frames.append(
            pd.DataFrame(
                {
                    "entity_name": batch[endpoint_col],
                    "kind": "cand",
                    "src_id": batch["src_id"],
                    "tgt_id": batch["tgt_id"],
                    "description": batch["description_full"],
                    "source_id": batch["source_id"],
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def _node_marker(batch: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "entity_name": batch["entity_name"],
            "kind": "node",
            "src_id": None,
            "tgt_id": None,
            "description": None,
            "source_id": None,
        }
    )


def _unknown_from_group(group: pd.DataFrame) -> pd.DataFrame:
    if (group["kind"] == "node").any():
        return group.iloc[0:0][["entity_name"]].assign(
            entity_type=pd.Series(dtype=str),
            description=pd.Series(dtype=str),
            source_id=pd.Series(dtype=str),
        )[["entity_name", "entity_type", "description", "source_id"]]
    best = group.sort_values(["src_id", "tgt_id"], kind="mergesort").iloc[0]
    return pd.DataFrame(
        {
            "entity_name": [best["entity_name"]],
            "entity_type": ['"UNKNOWN"'],
            "description": [best["description"]],
            "source_id": [best["source_id"]],
        }
    )


def backfill_unknown_nodes(nodes_ds, edges_ds):
    """Distributed anti-join: edge endpoints absent from nodes become
    '"UNKNOWN"'-typed nodes (reference text2graph.py:258-268). Returns the
    union nodes dataset. No driver-side materialization: the membership test
    is a groupby over (endpoint candidates ∪ node-name markers)."""
    cands = edges_ds.map_batches(_explode_endpoints, batch_format="pandas")
    markers = nodes_ds.map_batches(_node_marker, batch_format="pandas")
    unknown = (
        cands.union(markers)
        .groupby("entity_name")
        .map_groups(_unknown_from_group, batch_format="pandas")
    )
    return nodes_ds.union(unknown)


def finalize_edges(edges_ds):
    """Drop the internal pre-summarize column from the public edges table."""
    return edges_ds.drop_columns(["description_full"])

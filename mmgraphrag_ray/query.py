"""Retrieval path — the reference's local_query context builder (§3.2,
query.py:354-469) over the Parquet-backed graph tables.

Semantics preserved:

- entity top-k by cosine with threshold (storage.py:298-323, threshold 0.2
  storage.py:235/248-250, k=10 parameter.py:19) over the entity_vecs table,
- node rank = degree (query.py:245-253; degree storage.py:451-455),
- related text units: per retrieved node, its source chunks (order = node
  index, first occurrence wins); relation_counts = how many of the node's
  edges lead to a one-hop neighbor whose source chunks contain that chunk;
  sort (order, -relation_counts); token-truncate at
  local_max_token_for_text_unit=4000 (query.py:63-153, parameter.py:20),
- related edges: all incident edges of retrieved nodes, undirected-deduped;
  rank = degree(src)+degree(tgt); sort (rank, weight) desc; token-truncate
  on description at local_max_token_for_local_context=6000
  (query.py:155-214, parameter.py:21),
- CSV context sections (query.py:264-296 via base.py:258-265).

Execution shape: the scans are Ray Data (vector top-k via broadcast-query
partial top-k; degree counts via bucketed groupby; node/edge/chunk fetches
via broadcast semi-join filters); only the <=top_k neighborhood's final
ranking/formatting happens driver-side, as in the reference's query path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import GRAPH_FIELD_SEP
from .stages.embed import HashEmbedder
from .stages.groupagg import bucketed_groupby_agg
from .stages.join import broadcast_semi_join
from .textutils import list_of_list_to_csv, truncate_list_by_token_size

_EMBEDDER = HashEmbedder()


@dataclass(frozen=True)
class QueryParam:
    """Reference parameter.py:15-22."""

    top_k: int = 10
    local_max_token_for_text_unit: int = 4000
    local_max_token_for_local_context: int = 6000
    cosine_threshold: float = 0.2
    number_of_mmentities: int = 3  # reference parameter.py:22


def entity_topk(entity_vecs_ds, query_text: str, param: QueryParam) -> pd.DataFrame:
    """Brute-force cosine top-k with threshold over the entity vector table
    (reference storage.py:298-323). Distributed partial top-k per batch, tiny
    final reduce."""
    qvec = _EMBEDDER.encode([query_text])[0].astype(np.float64)
    import ray

    qref = ray.put(qvec)
    per_batch_keep = max(50, param.top_k)  # partial top-k must cover top_k

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"entity_name": [], "distance": []})
        q = ray.get(qref)
        mat = np.array(batch["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ q) / norms  # q is already unit-norm
        out = pd.DataFrame(
            {"entity_name": batch["entity_name"], "distance": sims}
        )
        return out.nlargest(per_batch_keep, "distance")

    top = entity_vecs_ds.map_batches(partial, batch_format="pandas").to_pandas()
    top = top[top["distance"] >= param.cosine_threshold]
    return (
        top.sort_values(["distance", "entity_name"], ascending=[False, True], kind="mergesort")
        .head(param.top_k)
        .reset_index(drop=True)
    )


def node_degrees(edges_ds):
    """degree(node) = number of incident edges (reference storage.py:451-460)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"entity_name": pd.Series(dtype=str)})
        return pd.DataFrame(
            {"entity_name": pd.concat([batch["src_id"], batch["tgt_id"]])}
        )

    return bucketed_groupby_agg(
        edges_ds.map_batches(explode, batch_format="pandas"),
        keys=["entity_name"],
        aggs={"degree": (None, "count")},
    )


def remap_source_ids(source_id: str, remap: dict[str, str]) -> str:
    """J3 — the reference's img_path -> chunk_id source remap
    (query.py:44-61 img_path2chunk_id): every <SEP> segment that is NOT a
    chunk id is looked up in `remap` (media id / path -> chunk id); mapped
    values replace, unmapped non-chunk values are kept, and the set is
    deduplicated (the reference uses a set).  Sorted join for determinism."""
    out = set()
    for seg in source_id.split(GRAPH_FIELD_SEP):
        if not seg.startswith("chunk-") and seg in remap:
            out.add(remap[seg])
        else:
            out.add(seg)
    return GRAPH_FIELD_SEP.join(sorted(out))


def write_audit_row(audit_dir: str, query_text: str, ctx: dict) -> str:
    """S9 — the reference's context audit sink (query.py:392-397 appends the
    context to working_dir/context.csv).  Here: one parquet part per query
    under <audit_dir>/, named by content hash (idempotent re-runs overwrite
    the same part; a directory of parts IS the append log, and stays
    readable as one table)."""
    import hashlib
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(audit_dir, exist_ok=True)
    key = hashlib.md5(
        (query_text + "\x1f" + ctx["entities_csv"]).encode()
    ).hexdigest()
    path = os.path.join(audit_dir, f"part-{key}.parquet")
    tbl = pa.table(
        {
            "query": pa.array([query_text], pa.large_string()),
            "entities_csv": pa.array([ctx["entities_csv"]], pa.large_string()),
            "relations_csv": pa.array([ctx["relations_csv"]], pa.large_string()),
            "text_units_csv": pa.array([ctx["text_units_csv"]], pa.large_string()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def build_local_context(
    query_text: str,
    nodes_ds,
    edges_ds,
    chunks_ds,
    entity_vecs_ds,
    param: QueryParam = QueryParam(),
    source_remap: dict[str, str] | None = None,
    audit_dir: str | None = None,
) -> dict:
    """Returns {entities_csv, relations_csv, text_units_csv, ...tables} for a
    query — the reference's _build_local_query_context (query.py:215-311)
    minus the LLM answer step (sandbox has no model; the context string IS
    the deliverable of the data path).  `source_remap` applies the J3
    media-id -> chunk-id remap before text-unit retrieval; `audit_dir`
    persists the context as a parquet sidecar (S9)."""
    top = entity_topk(entity_vecs_ds, query_text, param)
    if len(top) == 0:
        # typed empty frames: a zero-hit query must still carry the context
        # schema (the driver's correctness gate compares schemas)
        empty_entities = pd.DataFrame(
            {c: pd.Series(dtype=str)
             for c in ("entity_name", "entity_type", "description", "source_id")}
        )
        empty_entities["rank"] = pd.Series(dtype="int64")
        ctx = {
            "entities_csv": "",
            "relations_csv": "",
            "text_units_csv": "",
            "entities": empty_entities,
            "relations": pd.DataFrame(),
            "text_units": pd.DataFrame(),
        }
        if audit_dir:
            write_audit_row(audit_dir, query_text, ctx)
        return ctx
    names = list(top["entity_name"])

    node_df = broadcast_semi_join(nodes_ds, names, "entity_name").to_pandas()
    if source_remap:
        node_df["source_id"] = node_df["source_id"].map(
            lambda s: remap_source_ids(s, source_remap)
        )
    # preserve retrieval (similarity) order, as the reference zips vdb
    # results with node fetches (query.py:245-253)
    order = {n: i for i, n in enumerate(names)}
    node_df = node_df.sort_values(
        "entity_name", key=lambda s: s.map(order), kind="mergesort"
    ).reset_index(drop=True)

    # incident edges of retrieved nodes
    def incident(batch: pd.DataFrame):
        from .arrowutil import df_to_table

        sel = set(names)
        return df_to_table(
            batch[batch["src_id"].isin(sel) | batch["tgt_id"].isin(sel)]
            if len(batch) else batch
        )

    inc_edges = edges_ds.map_batches(incident, batch_format="pandas").to_pandas()

    # degrees for rank (node rank + edge rank)
    needed_deg = set(names) | set(inc_edges["src_id"]) | set(inc_edges["tgt_id"])
    deg_df = broadcast_semi_join(
        node_degrees(edges_ds), needed_deg, "entity_name"
    ).to_pandas()
    degree = dict(zip(deg_df["entity_name"], deg_df["degree"]))

    node_df["rank"] = node_df["entity_name"].map(lambda n: int(degree.get(n, 0)))

    # ---- related text units (query.py:63-153)
    neighbors_of = {n: [] for n in names}
    for src, tgt in zip(inc_edges["src_id"], inc_edges["tgt_id"]):
        if src in neighbors_of:
            neighbors_of[src].append(tgt)
        if tgt in neighbors_of:
            neighbors_of[tgt].append(src)
    one_hop = sorted({m for ns in neighbors_of.values() for m in ns})
    hop_df = broadcast_semi_join(nodes_ds, one_hop, "entity_name").to_pandas()
    if source_remap:
        hop_df["source_id"] = hop_df["source_id"].map(
            lambda s: remap_source_ids(s, source_remap)
        )
    hop_chunks = {
        n: set(s.split(GRAPH_FIELD_SEP))
        for n, s in zip(hop_df["entity_name"], hop_df["source_id"])
    }

    text_units_lookup: dict[str, dict] = {}
    for index, row in node_df.iterrows():
        units = row["source_id"].split(GRAPH_FIELD_SEP)
        nbrs = neighbors_of.get(row["entity_name"], [])
        for c_id in units:
            if not c_id.startswith("chunk-") or c_id in text_units_lookup:
                continue
            relation_counts = sum(
                1 for m in nbrs if m in hop_chunks and c_id in hop_chunks[m]
            )
            text_units_lookup[c_id] = {
                "id": c_id,
                "order": index,
                "relation_counts": relation_counts,
            }

    chunk_df = broadcast_semi_join(
        chunks_ds, set(text_units_lookup), "chunk_id"
    ).to_pandas()
    content_of = dict(zip(chunk_df["chunk_id"], chunk_df["content"]))
    units = [
        {**v, "content": content_of[k]}
        for k, v in text_units_lookup.items()
        if k in content_of
    ]
    units.sort(key=lambda x: (x["order"], -x["relation_counts"]))
    units = truncate_list_by_token_size(
        units, key=lambda x: x["content"], max_token_size=param.local_max_token_for_text_unit
    )

    # ---- related edges (query.py:155-214)
    edges_data = inc_edges.copy()
    edges_data["rank"] = [
        int(degree.get(s, 0)) + int(degree.get(t, 0))
        for s, t in zip(edges_data["src_id"], edges_data["tgt_id"])
    ]
    edges_data = edges_data.sort_values(
        ["rank", "weight"], ascending=False, kind="mergesort"
    )
    edge_rows = truncate_list_by_token_size(
        edges_data.to_dict("records"),
        key=lambda x: x["description"],
        max_token_size=param.local_max_token_for_local_context,
    )

    # ---- CSV sections (query.py:264-296)
    entities_section = [["id", "entity", "type", "description", "rank"]] + [
        [i, n["entity_name"], n.get("entity_type", "UNKNOWN"),
         n.get("description", "UNKNOWN"), n["rank"]]
        for i, n in enumerate(node_df.to_dict("records"))
    ]
    relations_section = [["id", "source", "target", "description", "weight", "rank"]] + [
        [i, e["src_id"], e["tgt_id"], e["description"], e["weight"], e["rank"]]
        for i, e in enumerate(edge_rows)
    ]
    text_units_section = [["id", "content"]] + [
        [i, t["content"]] for i, t in enumerate(units)
    ]

    ctx = {
        "entities_csv": list_of_list_to_csv(entities_section),
        "relations_csv": list_of_list_to_csv(relations_section),
        "text_units_csv": list_of_list_to_csv(text_units_section),
        "entities": node_df,
        "relations": pd.DataFrame(edge_rows),
        "text_units": pd.DataFrame(units),
    }
    if audit_dir:
        write_audit_row(audit_dir, query_text, ctx)
    return ctx


def multimodal_answer_merge(
    query_text: str,
    ctx: dict,
    media_ds,
    answer_fn,
    mm_answer_fn,
    merge_fn=None,
    param: QueryParam = QueryParam(),
) -> dict:
    """The reference's ORI_IMG-triggered multimodal answer path
    (query.py:414-469) with the three model calls as injected seams — the
    data plane (entity selection, media KV lookup, base64 payload encode,
    per-image fan-out, ordered merge) is real; the sandbox has no model, so
    callers plug deterministic or real functions.

    Reference semantics preserved:
      - a text answer is produced first from the CSV context
        (query.py:406-410): ``answer_fn(query_text, context_csv)``;
      - multimodal entities = retrieved entities whose type is ORI_IMG, in
        RETRIEVAL order, lowercased, capped at param.number_of_mmentities
        (query.py:414-420);
      - entities missing from the media store are skipped, order kept
        (query.py:430 `if entity in image_data`);
      - per image: ``mm_answer_fn(query, payload_b64, "<caption>, <footnote>",
        context_csv)`` (query.py:439-454);
      - no multimodal entities -> the text answer IS the final answer
        (query.py:422-423);
      - else the mm responses merge, then merge with the text answer
        (query.py:457-469): ``merge_fn(query, mm_responses, text_answer)``;
        the default concatenates deterministically in response order.

    `media_ds` is the kv_store_image_data analog: a Dataset with columns
    (entity_name, payload: binary, caption, footnote).  The lookup is a
    broadcast semi-join (<= number_of_mmentities keys) — the media table
    never materializes beyond the matched rows.
    """
    import base64

    entities = ctx["entities"]
    mm_names = []
    if len(entities):
        ori = entities[entities["entity_type"].str.strip('"') == "ORI_IMG"]
        mm_names = [n.strip('"').lower() for n in ori["entity_name"]]
    mm_names = mm_names[: param.number_of_mmentities]

    text_answer = answer_fn(query_text, ctx["entities_csv"])
    if not mm_names:
        return {"answer": text_answer, "mm_responses": [], "mm_entities": []}

    rows = broadcast_semi_join(media_ds, set(mm_names), "entity_name").to_pandas()
    by_name = {r["entity_name"]: r for _, r in rows.iterrows()}
    mm_responses = []
    used = []
    for name in mm_names:  # retrieval order, skip missing (query.py:430)
        if name not in by_name:
            continue
        r = by_name[name]
        payload_b64 = base64.b64encode(bytes(r["payload"])).decode("utf-8")
        information = f"{r['caption']}, {r['footnote']}"
        mm_responses.append(
            mm_answer_fn(query_text, payload_b64, information, ctx["entities_csv"])
        )
        used.append(name)
    if merge_fn is None:
        merge_fn = lambda q, mms, ans: ans + "\n" + "\n".join(mms)  # noqa: E731
    return {
        "answer": merge_fn(query_text, mm_responses, text_answer),
        "mm_responses": mm_responses,
        "mm_entities": used,
    }

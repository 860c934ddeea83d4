"""Entity linking / canonicalization — the reference's fusion stage (F2-F8)
re-expressed as partitioned Ray Data stages.

Reference math preserved exactly (fusion.py:333-416, text variant):

- embed entity descriptions (HashEmbedder stand-in for MiniLM, T3),
- affinity A = cosine_similarity(E); for each relationship between two
  in-neighborhood entities, A[src,tgt] *= weight (symmetrized)
  (fusion.py:363-380),
- unnormalized Laplacian L = D - A, eigendecomposition, take the
  k = max(2, ceil(sqrt(n))) eigenvectors of the smallest eigenvalues,
  abs() against complex values (fusion.py:382-397),
- DBSCAN(eps=0.5, min_samples=max(1, ceil(n/10))) on those eigenvectors
  (fusion.py:399-404) — implemented here in numpy (no sklearn offline),
  with deterministic cluster numbering (points visited in index order).

Neighborhood partitioning: the reference clusters the entities of chunks
[i-1, i+1] around an image (fusion.py:156-202) — a locality window.  The
code-corpus analog used here: entities partition by the repo that first
mentioned them, then into lexicographic windows of <= `max_group` entities,
which bounds the O(n^3) eigendecomposition per group and keeps the mega-repo
partition from serializing (the "salted repartition" skew rule).

Alias decisions (F5's LLM judge, deterministically): every DBSCAN cluster
(label >= 0) with more than one member merges into its lexicographically
smallest member name.  Graph contraction (F8, fusion.py:870-997): members'
edges re-point to the canonical node and parallel edges re-merge with the
A3 algebra (weight sum / order min / sorted-set description+source joins) —
the reference's nx shallow-overwrite is scheduling-order-dependent; the
re-merge is its deterministic closure.  Self-loops produced by contraction
are kept (the reference does not remove them).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from ..hashing import bucket_any, bucket_strs

from .. import GRAPH_FIELD_SEP
from .embed import HashEmbedder
from .join import bucketed_join

N_BUCKETS = 64
_EMBEDDER = HashEmbedder()  # stateless/deterministic: shared per worker


def dbscan(points: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Deterministic DBSCAN (euclidean), labels compatible with sklearn's
    algorithm semantics: -1 = noise; clusters numbered by first-visited core
    point in index order."""
    n = len(points)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    d2 = np.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=2)
    neigh = d2 <= eps * eps  # includes self
    core = neigh.sum(axis=1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS from core point i
        labels[i] = cluster
        frontier = [i]
        while frontier:
            j = frontier.pop()
            if not core[j]:
                continue
            for m in np.flatnonzero(neigh[j]):
                if labels[m] == -1:
                    labels[m] = cluster
                    frontier.append(m)
        cluster += 1
    return labels


def spectral_cluster_group(
    names: list[str], descriptions: list[str], rels: list[tuple[str, str, float]]
) -> np.ndarray:
    """The reference's spectral+DBSCAN math for one neighborhood
    (fusion.py:333-416). `rels` entries whose endpoints are both in `names`
    scale the affinity; others are ignored (fusion.py:365-370)."""
    n = len(names)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    emb = _EMBEDDER.encode(descriptions).astype(np.float64)
    # cosine similarity of L2-normalized rows = dot product
    a = emb @ emb.T
    index = {name: i for i, name in enumerate(names)}
    for src, tgt, weight in sorted(rels, key=lambda r: -r[2]):
        si, ti = index.get(src), index.get(tgt)
        if si is None or ti is None:
            continue
        a[si, ti] *= weight
        a[ti, si] *= weight
    degree = np.diag(a.sum(axis=1))
    lap = degree - a
    eigvals, eigvecs = np.linalg.eig(lap)
    k = max(2, math.ceil(math.sqrt(n)))
    sel = np.abs(eigvecs[:, np.argsort(eigvals)[:k]])
    min_samples = max(1, math.ceil(n / 10))
    return dbscan(sel.real, eps=0.5, min_samples=min_samples)


# ------------------------------------------------------------ partitioning


def assign_partitions(ent_mentions_ds, mode: str = "repo", window: int = 3):
    """entity -> partition key.  Returns Dataset(entity_name, partition).

    mode='repo' (default): the repo that first mentions it (min for
    determinism) — bounded-size lexicographic windows downstream.

    mode='chunk_window': the J2 POSITIONAL-locality analog of the
    reference's chunk_order_index in [i-1, i+1] neighborhood windows
    (fusion.py:156-202): partition = (doc_id, chunk_order_index // window)
    of the entity's smallest (doc_id, chunk_order) mention, so entities
    mentioned in adjacent chunks of the same document co-cluster — tumbling
    rather than sliding (each entity belongs to exactly ONE window, keeping
    cluster labels single-valued; the reference anchors ±1 around an image
    chunk, which a per-entity partition cannot reproduce without duplicating
    entities across overlapping windows)."""
    import pandas as pd

    from .groupagg import bucketed_groupby_agg

    if mode == "repo":
        return bucketed_groupby_agg(
            ent_mentions_ds,
            keys=["entity_name"],
            aggs={"partition": ("repo", "min")},
        )
    if mode != "chunk_window":
        raise ValueError(f"unknown partition mode {mode!r}")

    def poskey(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"entity_name": pd.Series(dtype=str), "_pos": pd.Series(dtype=str)}
            )
        return pd.DataFrame(
            {
                "entity_name": b["entity_name"],
                # zero-padded so lexicographic min == numeric min
                "_pos": b["doc_id"] + "#" + b["chunk_order_index"].astype(int).map(
                    "{:06d}".format
                ),
            }
        )

    first = bucketed_groupby_agg(
        ent_mentions_ds.map_batches(poskey, batch_format="pandas"),
        keys=["entity_name"],
        aggs={"pos": ("_pos", "min")},
    )

    def to_window(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"entity_name": pd.Series(dtype=str), "partition": pd.Series(dtype=str)}
            )
        split = b["pos"].str.rsplit("#", n=1, expand=True)
        win = (split[1].astype(int) // window).astype(str)
        return pd.DataFrame(
            {"entity_name": b["entity_name"], "partition": split[0] + "#w" + win}
        )

    return first.map_batches(to_window, batch_format="pandas")


def _cluster_partition_factory(max_group: int):
    def cluster_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket holds several partitions; each partition's
        entities are windowed (sorted by name, groups of <= max_group) and
        clustered with the reference math."""
        out_names, out_descs, out_parts, out_groups, out_labels = [], [], [], [], []
        ent = bucket[bucket["_kind"] == "e"]
        rel = bucket[bucket["_kind"] == "r"]
        rels_by_part = {
            p: list(zip(g["src_id"], g["tgt_id"], g["weight"]))
            for p, g in rel.groupby("partition", sort=False)
        }
        for part, g in ent.groupby("partition", sort=False):
            g = g.sort_values("entity_name", kind="mergesort")
            part_rels = rels_by_part.get(part, [])
            n = len(g)
            for w0 in range(0, n, max_group):
                win = g.iloc[w0 : w0 + max_group]
                labels = spectral_cluster_group(
                    win["entity_name"].tolist(),
                    win["description"].tolist(),
                    part_rels,
                )
                gid = w0 // max_group
                out_names.extend(win["entity_name"])
                out_descs.extend(win["description"])
                out_parts.extend([part] * len(win))
                out_groups.extend([gid] * len(win))
                out_labels.extend(labels.tolist())
        return pd.DataFrame(
            {
                "entity_name": out_names,
                "description": out_descs,
                "partition": out_parts,
                "group_id": pd.Series(out_groups, dtype="int32"),
                "label": pd.Series(out_labels, dtype="int64"),
            }
        )

    return cluster_bucket


def cluster_entities(nodes_ds, edges_ds, ent_mentions_ds, max_group: int = 64,
                     partition_mode: str = "repo", window: int = 3):
    """F2: per-neighborhood spectral clustering.
    Returns Dataset(entity_name, partition, group_id, label)."""
    # Each bucketed_join and the final clustering groupby is an all-to-all;
    # chaining >2 hash-shuffle operators in ONE streaming DAG deadlocks Ray
    # 2.49's aggregator scheduling (observed), so the small join outputs are
    # pinned between shuffles (the write path checkpoints them to parquet).
    from ..runtime import pin_dataset

    parts = pin_dataset(
        assign_partitions(ent_mentions_ds, partition_mode, window), "link_parts"
    )
    ent = pin_dataset(
        bucketed_join(
            nodes_ds.select_columns(["entity_name", "description"]), parts,
            on="entity_name",
        ),
        "link_ent",
    )

    # edges join the partition of their src endpoint
    edge_side = edges_ds.select_columns(["src_id", "tgt_id", "weight"]).map_batches(
        lambda b: b.rename(columns={"src_id": "entity_name"}),
        batch_format="pandas",
    )
    rel = pin_dataset(
        bucketed_join(edge_side, parts, on="entity_name").map_batches(
            lambda b: b.rename(columns={"entity_name": "src_id"}),
            batch_format="pandas",
        ),
        "link_rel",
    )

    from ..arrowutil import df_to_table_aligned

    TAG_COLS = ["entity_name", "description", "partition", "src_id", "tgt_id",
                "weight", "_kind", "pbucket"]
    import pyarrow as pa

    TAG_TYPES = {c: pa.string() for c in TAG_COLS}
    TAG_TYPES["weight"], TAG_TYPES["pbucket"] = pa.float64(), pa.int32()

    def tag_e(b: pd.DataFrame):
        b = b.copy()
        b["_kind"] = "e"
        b["pbucket"] = (pd.Series(bucket_any(b["partition"], N_BUCKETS), index=b.index)
                        if len(b) else pd.Series(dtype="int32"))
        return df_to_table_aligned(b, TAG_COLS, TAG_TYPES)

    def tag_r(b: pd.DataFrame):
        b = b.copy()
        b["_kind"] = "r"
        b["pbucket"] = (pd.Series(bucket_any(b["partition"], N_BUCKETS), index=b.index)
                        if len(b) else pd.Series(dtype="int32"))
        return df_to_table_aligned(b, TAG_COLS, TAG_TYPES)

    both = ent.map_batches(tag_e, batch_format="pandas").union(
        rel.map_batches(tag_r, batch_format="pandas")
    )
    return (
        both.groupby("pbucket")
        .map_groups(_cluster_partition_factory(max_group), batch_format="pandas")
        .repartition(16)
    )


# ------------------------------------------------------------ alias + contraction


def build_alias_table(clusters_ds, judge_threshold: float = 0.9):
    """F5 (the reference's LLM alignment judge) with a deterministic stand-in:
    a DBSCAN cluster proposes candidate merges; a member is CONFIRMED into the
    cluster's lexicographically smallest member only when the cosine
    similarity of their descriptions is >= judge_threshold.  (The reference
    keeps only LLM-confirmed alignments with both sources non-empty,
    fusion.py:520-543; raw spectral clusters over-merge by design and the
    judge is the precision gate.)  Returns Dataset(member_name,
    canonical_name)."""

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        real = bucket[bucket["label"] >= 0]
        if len(real) == 0:
            return pd.DataFrame(
                {"member_name": pd.Series(dtype=str), "canonical_name": pd.Series(dtype=str)}
            )
        members, canons = [], []
        for _, g in real.groupby(["partition", "group_id", "label"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("entity_name", kind="mergesort")
            emb = _EMBEDDER.encode(g["description"].tolist()).astype(np.float64)
            sims = emb @ emb[0]  # cosine vs the canonical (first) member
            canon_name = g["entity_name"].iloc[0]
            for name, sim in zip(g["entity_name"].iloc[1:], sims[1:]):
                if sim >= judge_threshold:
                    members.append(name)
                    canons.append(canon_name)
        return pd.DataFrame({"member_name": members, "canonical_name": canons})

    def add_bucket(b: pd.DataFrame):
        import pyarrow as pa

        from ..arrowutil import df_to_table_aligned

        cols = ["entity_name", "description", "partition", "group_id", "label", "cbucket"]
        types = {"entity_name": pa.string(), "description": pa.string(),
                 "partition": pa.string(), "group_id": pa.int32(),
                 "label": pa.int64(), "cbucket": pa.int32()}
        b = b.copy()
        b["cbucket"] = (
            pd.Series(bucket_strs(
                b["partition"].astype(str) + "\x1f" + b["group_id"].astype(str),
                N_BUCKETS), index=b.index)
            if len(b) else pd.Series(dtype="int32")
        )
        return df_to_table_aligned(b, cols, types)

    return (
        clusters_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("cbucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


ALIAS_BROADCAST_LIMIT = 100_000


def _alias_applier(alias_ds, broadcast_limit: int = ALIAS_BROADCAST_LIMIT):
    """Returns a function (ds, cols) -> ds with each name column in `cols`
    re-pointed through the alias table.  Small alias tables broadcast
    (ray.put once, dict lookup per batch); big ones route through
    bucketed_join (how='left', coalesce) so the driver never materializes
    the alias set — the alias table grows with merge-rate x nodes and is
    unbounded at 100 TB."""
    import ray

    from .join import bucketed_join

    alias_ds = alias_ds.materialize()
    if alias_ds.count() <= broadcast_limit:
        alias_df = alias_ds.to_pandas()
        alias_ref = ray.put(
            dict(zip(alias_df["member_name"], alias_df["canonical_name"]))
        )

        def apply_broadcast(ds, cols):
            def fn(b: pd.DataFrame) -> pd.DataFrame:
                if len(b) == 0:
                    return b
                alias = ray.get(alias_ref)
                out = b.copy()
                for c in cols:
                    out[c] = out[c].map(lambda n: alias.get(n, n))
                return out

            return ds.map_batches(fn, batch_format="pandas")

        return apply_broadcast

    def apply_join(ds, cols):
        out = ds
        for c in cols:
            side = alias_ds.map_batches(
                lambda b, c=c: b.rename(
                    columns={"member_name": c, "canonical_name": f"_canon_{c}"}
                ),
                batch_format="pandas",
            )
            out = bucketed_join(out, side, on=c, how="left").map_batches(
                lambda b, c=c: b.assign(
                    **{c: b[f"_canon_{c}"].where(b[f"_canon_{c}"].notna(), b[c])}
                ).drop(columns=[f"_canon_{c}"]),
                batch_format="pandas",
            ).materialize()  # pin between join shuffles (>2-shuffle deadlock)
        return out

    return apply_join


def contract_graph(nodes_ds, edges_ds, alias_ds, cfg=None,
                   broadcast_limit: int = ALIAS_BROADCAST_LIMIT):
    """F8: re-point nodes/edges through the alias table and re-merge with
    the SAME vectorized partial/final machinery as the batch merges
    (stages/merge.py _nodes_as_partials / _edges_as_partials): descriptions
    and source ids re-join as sorted <SEP>-sets, edge weights sum, orders
    min — the deterministic closure of the reference's order-dependent nx
    attr overwrite (fusion.py:930-983).

    entity_type POLICY: the A2 mode over merged members' types (count desc,
    tie-break type asc) — each member contributes its type once.  This is
    the same algebra every other node merge in the engine uses (the r01
    code took lexicographic min while claiming canonical-wins; now the
    policy and the code agree and are shared with stages/merge.py)."""
    from ..config import DEFAULT_CONFIG
    from .merge import (
        _edges_as_partials,
        _make_edge_final,
        _make_node_final,
        _nodes_as_partials,
    )

    cfg = cfg or DEFAULT_CONFIG
    apply_alias = _alias_applier(alias_ds, broadcast_limit)

    repointed_nodes = apply_alias(nodes_ds, ["entity_name"])
    new_nodes = (
        _nodes_as_partials(repointed_nodes)
        .groupby("bucket")
        .map_groups(
            _make_node_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
        )
        .repartition(16)
    )

    def recanon(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        out = b.copy()
        src, tgt = out["src_id"], out["tgt_id"]
        out["src_id"], out["tgt_id"] = np.minimum(src, tgt), np.maximum(src, tgt)
        return out

    repointed_edges = apply_alias(edges_ds, ["src_id", "tgt_id"]).map_batches(
        recanon, batch_format="pandas"
    )
    EDGE_PUBLIC = ["src_id", "tgt_id", "weight", "description", "source_id", "order"]
    new_edges = (
        _edges_as_partials(repointed_edges)
        .groupby("bucket")
        .map_groups(
            _make_edge_final(cfg.entity_summary_to_max_tokens), batch_format="pandas"
        )
        .map_batches(
            lambda b: b[EDGE_PUBLIC] if len(b) else b, batch_format="pandas"
        )
        .repartition(16)
    )
    return new_nodes, new_edges


def enhance_unaligned_entities(
    nodes_ds,
    edges_ds,
    alias_ds,
    enhancer,
    entity_types: tuple = ('"UNKNOWN"',),
    cfg=None,
):
    """F6 — entity enhancement (reference fusion.py:636-727), deterministic
    analog: nodes of the target types that were NOT aligned by the judge
    (absent from the alias table as member or canonical) pass through the
    `enhancer` seam ``(entity_name, description) -> (new_name, new_desc) |
    None``.  Each returned rewrite becomes (a) a description update and (b)
    an old->new rename routed through the SAME contraction machinery F8 uses
    (the reference relabels the nx node and re-points its edges,
    fusion.py:683-727; re-merging parallel edges per A3 is the deterministic
    closure).  F7's whole-image-node alignment is this same data plane with
    the ORI_IMG-analog node as the rewrite subject.

    Returns (new_nodes, new_edges, rewrite_table).  The `enhancer` is the
    LLM seam; the reference prompts it with nearby chunks — callers embed
    that context in the closure.

    Scale shape (same dual plan as :func:`_alias_applier`): the alias table
    grows with merge-rate x nodes and is unbounded at 100 TB, so BOTH
    driver pulls here are bounded — the aligned-name anti-join broadcasts a
    frozenset only while ``alias_ds.count() <= broadcast_limit`` and
    otherwise runs as a distinct-names ``bucketed_join(how='left')`` +
    null-marker filter; the rewrite-description apply broadcasts a dict
    only while the rewrite table is under the limit and otherwise
    left-joins ``new_description`` in by name."""
    import ray

    from ..config import DEFAULT_CONFIG
    from .groupagg import bucketed_groupby_agg

    cfg = cfg or DEFAULT_CONFIG
    broadcast_limit = int(os.environ.get(
        "RAYKG_ALIAS_BROADCAST_MAX", str(ALIAS_BROADCAST_LIMIT)))
    if isinstance(alias_ds, pd.DataFrame):  # pandas convenience input
        import ray.data as _rd

        from ..arrowutil import df_to_table

        # arrow block, not a pandas one: an EMPTY alias frame's object
        # columns would trip the size estimator at every metadata fetch
        alias_ds = _rd.from_arrow(df_to_table(alias_ds))
    alias_ds = alias_ds.materialize()
    types = frozenset(entity_types)

    def _enhance_batch(target: pd.DataFrame):
        from ..arrowutil import df_to_table

        old, new, descs = [], [], []
        for name, desc in zip(target["entity_name"], target["description"]):
            out = enhancer(name, desc)
            if out is None:
                continue
            new_name, new_desc = out
            old.append(name)
            new.append(new_name)
            descs.append(new_desc)
        # typed Arrow even when every row filtered/declined: empty pandas
        # object columns trip Ray's size estimator
        return df_to_table(pd.DataFrame(
            {"member_name": pd.Series(old, dtype=object),
             "canonical_name": pd.Series(new, dtype=object),
             "new_description": pd.Series(descs, dtype=object)}
        ))

    _EMPTY_RW = {"member_name": pd.Series(dtype=object),
                 "canonical_name": pd.Series(dtype=object),
                 "new_description": pd.Series(dtype=object)}

    n_alias = alias_ds.count()
    if n_alias <= broadcast_limit:
        if n_alias == 0:
            # empty-Dataset to_pandas() drops columns; the set is just empty
            aligned_ref = ray.put(frozenset())
        else:
            alias_df = alias_ds.to_pandas()
            aligned_ref = ray.put(
                frozenset(alias_df["member_name"])
                | frozenset(alias_df["canonical_name"])
            )

        def rewrites(batch: pd.DataFrame):
            if len(batch) == 0:
                from ..arrowutil import df_to_table

                return df_to_table(pd.DataFrame(_EMPTY_RW))
            al = ray.get(aligned_ref)
            return _enhance_batch(batch[
                batch["entity_type"].isin(types)
                & ~batch["entity_name"].isin(al)
            ])

        rewrite_tbl = (
            nodes_ds.map_batches(rewrites, batch_format="pandas").materialize()
        )
    else:
        # Distinct aligned names (member ∪ canonical) as a keyed marker
        # table; unaligned nodes are the left-join rows with a null marker.
        def _names(col):
            def fn(b: pd.DataFrame):
                from ..arrowutil import df_to_table

                return df_to_table(pd.DataFrame(
                    {"entity_name": b[col].astype(object)
                     if len(b) else pd.Series(dtype=object)}))
            return fn

        aligned_names = bucketed_groupby_agg(
            alias_ds.map_batches(_names("member_name"), batch_format="pandas")
            .union(alias_ds.map_batches(_names("canonical_name"),
                                        batch_format="pandas")),
            keys=["entity_name"],
            aggs={"_aligned": (None, "count")},
        )
        probe = nodes_ds.map_batches(
            lambda b: b[["entity_name", "entity_type", "description"]],
            batch_format="pandas",
        )
        marked = bucketed_join(
            probe, aligned_names, on="entity_name", how="left"
        ).materialize()  # pin between join shuffles (>2-shuffle deadlock)

        def rewrites_join(batch: pd.DataFrame):
            if len(batch) == 0:
                from ..arrowutil import df_to_table

                return df_to_table(pd.DataFrame(_EMPTY_RW))
            return _enhance_batch(batch[
                batch["entity_type"].isin(types) & batch["_aligned"].isna()
            ])

        rewrite_tbl = (
            marked.map_batches(rewrites_join, batch_format="pandas")
            .materialize()
        )

    n_rewrites = rewrite_tbl.count()
    if n_rewrites == 0:
        return nodes_ds, edges_ds, rewrite_tbl

    if n_rewrites <= broadcast_limit:
        rw_df = rewrite_tbl.to_pandas()
        desc_ref = ray.put(
            dict(zip(rw_df["member_name"], rw_df["new_description"])))

        def apply_desc(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return batch
            dmap = ray.get(desc_ref)
            out = batch.copy()
            hit = out["entity_name"].isin(dmap)
            if hit.any():
                out.loc[hit, "description"] = out.loc[hit, "entity_name"].map(dmap)
            return out

        rewritten_nodes = nodes_ds.map_batches(apply_desc, batch_format="pandas")
    else:
        desc_side = rewrite_tbl.map_batches(
            lambda b: pd.DataFrame({
                "entity_name": b["member_name"].astype(object)
                if len(b) else pd.Series(dtype=object),
                "_new_desc": b["new_description"].astype(object)
                if len(b) else pd.Series(dtype=object)}),
            batch_format="pandas",
        )
        rewritten_nodes = bucketed_join(
            nodes_ds, desc_side, on="entity_name", how="left"
        ).map_batches(
            lambda b: b.assign(
                description=b["_new_desc"].where(
                    b["_new_desc"].notna(), b["description"])
            ).drop(columns=["_new_desc"]),
            batch_format="pandas",
        ).materialize()  # pin ahead of contract_graph's shuffles
    new_nodes, new_edges = contract_graph(
        rewritten_nodes,
        edges_ds,
        rewrite_tbl.drop_columns(["new_description"]),
        cfg,
    )
    return new_nodes, new_edges, rewrite_tbl


def canonicalize_graph(nodes_ds, edges_ds, ent_mentions_ds, cfg=None, max_group: int = 64,
                       partition_mode: str = "repo", window: int = 3):
    """Full F2-F8 pass: cluster -> alias table -> contraction.
    Returns (canonical_nodes, canonical_edges, alias_table, clusters)."""
    clusters = cluster_entities(
        nodes_ds, edges_ds, ent_mentions_ds, max_group, partition_mode, window
    ).materialize()
    alias = build_alias_table(clusters).materialize()
    new_nodes, new_edges = contract_graph(nodes_ds, edges_ds, alias, cfg)
    return new_nodes, new_edges, alias, clusters

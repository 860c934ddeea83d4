"""Similarity search over embedding columns.

Mirrors the reference's NanoVectorDB brute-force cosine top-k query
(storage.py:233-326: flat float32 vectors, cosine, top_k, threshold) as a
Ray-native pattern: the (small) query matrix is broadcast once via
``ray.put``; each batch computes a vectorized partial top-k against it
(numpy matmul); a final small groupby keeps the global top-k per query.
This is the baseline scale path; an LSH-bucketed variant lives in
stages/dedup.py for near-dup joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _partial_arrow(df: pd.DataFrame, id_type: pa.DataType) -> pa.Table:
    """Typed, metadata-free Arrow for the top-k partials feeding the final
    groupby (query and corpus ids share one id domain here)."""
    from ..arrowutil import df_to_table

    return df_to_table(
        df, query_vec_id=id_type, vec_id=id_type, sim=pa.float64()
    )


def brute_topk(
    corpus_ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
    query_labels: np.ndarray | None = None,
    label_col: str = "label",
):
    """Top-k cosine neighbors for each query vector.

    Returns Dataset(query_vec_id, rank, vec_id) — float similarity is kept
    internal so results are exactly comparable across engines (ordering ties
    broken by ascending id, mirroring `ORDER BY sim DESC, vec_id`).
    Self-pairs (query id == corpus id) are excluded.

    ``query_labels`` turns this into FILTERED vector search (the
    metadata-predicate ANN every vector store ships): query j only
    considers corpus rows whose ``label_col`` equals ``query_labels[j]``.
    The filter is applied per batch on the already-computed similarity
    matrix — same one-broadcast / partial-top-k / small-final-reduce
    plan, no extra pass and no per-label corpus copies.
    """
    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids)
    qlabels = None if query_labels is None else np.asarray(query_labels)
    id_type = (
        pa.from_numpy_dtype(qids.dtype) if qids.dtype != object else pa.string()
    )
    ref = ray.put((qids, qmat, qlabels))

    def partial_topk(batch: pa.Table):
        q_ids, q, q_lab = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        labs = (
            batch.column(label_col).to_numpy(zero_copy_only=False)
            if q_lab is not None else None
        )
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(vecs) == 0:
            return _partial_arrow(
                pd.DataFrame({"query_vec_id": [], "vec_id": [], "sim": []}), id_type
            )
        sims = _normalize(vecs) @ q.T  # (batch, nq)
        frames = []
        for j in range(q.shape[0]):
            col = sims[:, j]
            mask = ids != q_ids[j]
            if labs is not None:
                mask &= labs == q_lab[j]
            cand_ids, cand_sims = ids[mask], col[mask]
            if threshold is not None:
                keep = cand_sims >= threshold
                cand_ids, cand_sims = cand_ids[keep], cand_sims[keep]
            take = min(k, len(cand_ids))
            if take == 0:
                continue
            # partial top-k inside the batch: argpartition then exact sort
            part = np.argpartition(-cand_sims, take - 1)[:take]
            order = part[np.lexsort((cand_ids[part], -cand_sims[part]))]
            frames.append(
                pd.DataFrame(
                    {
                        "query_vec_id": q_ids[j],
                        "vec_id": cand_ids[order],
                        "sim": cand_sims[order],
                    }
                )
            )
        if not frames:
            return _partial_arrow(
                pd.DataFrame({"query_vec_id": [], "vec_id": [], "sim": []}), id_type
            )
        return _partial_arrow(pd.concat(frames, ignore_index=True), id_type)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_vec_id": g["query_vec_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
                "vec_id": g["vec_id"].astype("int64"),
            }
        )

    partials = corpus_ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.groupby("query_vec_id").map_groups(final_topk, batch_format="pandas")


def knn_label_transfer(corpus_ds, query_ids, query_vecs, labels_by_id: dict, k: int = 1):
    """k-NN label transfer (reference fusion.py:313-321, 423-428: image
    entity takes the cluster label of its nearest text entity).  Returns
    Dataset(query_vec_id, label): for k=1 the nearest neighbor's label; for
    k>1 the majority label among the k nearest, ties broken by (count desc,
    nearest-rank asc) so the result is deterministic."""
    topk = brute_topk(corpus_ds, query_ids, query_vecs, k=k)
    ref = ray.put(labels_by_id)

    def vote(group: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(ref)
        g = group.sort_values("rank", kind="mergesort")
        labels = [lab.get(int(v)) for v in g["vec_id"]]
        counts: dict = {}
        first_rank: dict = {}
        for r, l in enumerate(labels):
            counts[l] = counts.get(l, 0) + 1
            first_rank.setdefault(l, r)
        best = min(counts, key=lambda l: (-counts[l], first_rank[l]))
        return pd.DataFrame(
            {"query_vec_id": [g["query_vec_id"].iloc[0]], "label": [best]}
        )

    # the top-k table is tiny (n_queries x k); the per-query vote is a small
    # groupby, not a data-scale shuffle
    return topk.groupby("query_vec_id").map_groups(vote, batch_format="pandas")


# ----------------------------------------------------------------- IVF path

def _lloyd(sample: np.ndarray, n_centroids: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on a sample: init = evenly spaced sample
    rows (sample is taken in id order), fixed iteration count."""
    n = len(sample)
    idx = np.linspace(0, n - 1, num=min(n_centroids, n)).astype(int)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    corpus_ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-style approximate top-k — the scale path next to `brute_topk`:
    a coarse quantizer (deterministic Lloyd on an id-ordered sample) assigns
    every corpus vector to a centroid bucket; each query probes only its
    `nprobe` nearest buckets, so per-batch work drops to the probed fraction.
    Same output schema as brute_topk (query_vec_id, rank, vec_id)."""
    import pyarrow as pa

    # quantizer training sample: per-batch partial min-k by id (map-side
    # top-k, no shuffle), tiny driver concat — same rows as the former
    # sort(id).limit(N) (which all-to-all-shuffled the WHOLE corpus to take
    # 256 rows), at a scan's cost
    def partial_min_ids(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pd.DataFrame({id_col: [], vec_col: []})
        take = min(train_sample, len(ids))
        part = np.argpartition(ids, take - 1)[:take]
        part = part[np.argsort(ids[part], kind="stable")]
        vecs = batch.column(vec_col).to_pylist()
        return pd.DataFrame(
            {id_col: ids[part], vec_col: [vecs[i] for i in part]}
        )

    sample_df = (
        corpus_ds.map_batches(partial_min_ids, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col, kind="mergesort")
        .head(train_sample)
    )
    sample = np.array(sample_df[vec_col].tolist(), dtype=np.float64)
    cents = _lloyd(sample, n_centroids)

    qmat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qids = np.asarray(query_ids)
    id_type = (
        pa.from_numpy_dtype(qids.dtype) if qids.dtype != object else pa.string()
    )
    # probe set per query: nprobe nearest centroids (euclidean on raw vecs)
    qd = ((np.asarray(query_vecs, dtype=np.float64)[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]
    ref = ray.put((qids, qmat, cents, probes))

    def partial_topk(batch: pa.Table):
        q_ids, q, c, pr = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        raw = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if len(raw) == 0:
            return _partial_arrow(
                pd.DataFrame({"query_vec_id": [], "vec_id": [], "sim": []}), id_type
            )
        d = ((raw[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)
        vecs = _normalize(raw)
        frames = []
        for j in range(q.shape[0]):
            mask = np.isin(cell, pr[j]) & (ids != q_ids[j])
            if not mask.any():
                continue
            cand_ids = ids[mask]
            sims = vecs[mask] @ q[j]
            take = min(k, len(cand_ids))
            part = np.argpartition(-sims, take - 1)[:take]
            order = part[np.lexsort((cand_ids[part], -sims[part]))]
            frames.append(
                pd.DataFrame(
                    {"query_vec_id": q_ids[j], "vec_id": cand_ids[order], "sim": sims[order]}
                )
            )
        if not frames:
            return _partial_arrow(
                pd.DataFrame({"query_vec_id": [], "vec_id": [], "sim": []}), id_type
            )
        return _partial_arrow(pd.concat(frames, ignore_index=True), id_type)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_vec_id": g["query_vec_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
                "vec_id": g["vec_id"].astype("int64"),
            }
        )

    partials = corpus_ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.groupby("query_vec_id").map_groups(final_topk, batch_format="pandas")


def ann_recall(brute_ds, ivf_ds, qid_col: str = "query_vec_id",
               id_col: str = "vec_id"):
    """ANN index acceptance report: per query, how much of the EXACT
    (brute-force) top-k the approximate (IVF) index recovered — the
    recall@k eval every vector-store rollout gates on.

    -> Dataset(query_vec_id, n_brute, n_ivf, n_common); recall@k =
    n_common / n_brute downstream.

    Shape: two grouped combiner reduces over (query, id) membership flags
    — result sizes are (queries x k), never corpus-sized."""
    from .groupagg import bucketed_groupby_agg

    def tag(b_col: str, i_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = b[[qid_col, id_col]].copy()
            out["b"] = np.int64(1 if b_col == "b" else 0)
            out["i"] = np.int64(1 if b_col == "i" else 0)
            return out
        return fn

    both = brute_ds.map_batches(tag("b", ""), batch_format="pandas").union(
        ivf_ds.map_batches(tag("i", ""), batch_format="pandas")
    )
    flags = bucketed_groupby_agg(
        both, keys=[qid_col, id_col],
        aggs={"b": ("b", "max"), "i": ("i", "max")},
    )

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[qid_col]].copy()
        out["n_brute"] = b["b"].astype("int64")
        out["n_ivf"] = b["i"].astype("int64")
        out["n_common"] = (b["b"] * b["i"]).astype("int64")
        return out

    return bucketed_groupby_agg(
        flags.map_batches(widen, batch_format="pandas"),
        keys=[qid_col],
        aggs={"n_brute": ("n_brute", "sum"),
              "n_ivf": ("n_ivf", "sum"),
              "n_common": ("n_common", "sum")},
    )

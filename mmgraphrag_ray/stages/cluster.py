"""Distributed Lloyd k-means over an embedding column — integer-exact.

SemDeDup-style data curation (Abbas et al. 2023, arXiv:2303.09540) starts
with k-means over document embeddings at corpus scale.  The Ray-native
shape: centroids live on the driver (k x dim int64 — a few KB), every Lloyd
round is ONE streaming map_batches pass over the corpus emitting per-cluster
(sum_vec, n) partials, and the driver reduces k x n_batches partial rows.
No shuffle at any point; total cost is (rounds + 1) streaming passes, which
is exactly how a 100 TB run wants it (the corpus never materializes, the
reduce state is k rows).

Integer-exactness (why quantize): cross-engine float argmin is tie-fragile,
so vectors are quantized q = floor(x * scale) (int64) and every distance /
mean is integer math, bit-identical between numpy and the SQL oracle
(mean = floor(sum / n) via double division, exact below 2^53; distances
<= dim * (2*scale)^2 stay far inside int64).

No reference counterpart (the reference's only clustering is the spectral
fusion stage, fusion.py:229-306 — this is a training-data extension; the
sample-based Lloyd in stages/similarity.py trains the IVF quantizer on a
FIXED-SIZE sample, whereas this runs true distributed Lloyd over the full
corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def quantize(arr: np.ndarray, scale: int) -> np.ndarray:
    """floor(x * scale) in float64 -> int64; identical to DuckDB's
    CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT)."""
    return np.floor(arr.astype(np.float64) * scale).astype(np.int64)


def _check_range(q: np.ndarray) -> np.ndarray:
    """Enforce the integer-math precondition: squared L2 over `dim` dims of
    values bounded by `lim` must stay inside int64 (dim * (2*lim)^2 <= 2^62).
    numpy would WRAP silently on overflow where DuckDB raises — this guard
    makes both engines fail loudly instead of diverging."""
    dim = q.shape[-1] if q.ndim > 1 else len(q)
    lim = int(np.sqrt(2.0**62 / max(dim, 1)) / 2)
    amax = int(np.abs(q).max()) if q.size else 0
    if amax > lim:
        raise ValueError(
            f"quantized magnitude {amax} exceeds the int64-safe bound {lim} "
            f"for dim={dim}; lower `scale` or normalize the embeddings"
        )
    return q


def _batch_matrix(batch: pd.DataFrame, vec_col: str, scale: int) -> np.ndarray:
    return _check_range(quantize(np.stack(batch[vec_col].to_numpy()), scale))


def kmeans_centroids(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    refine_rounds: int = 1,
    scale: int = 1_000_000,
) -> np.ndarray:
    """Final centroids of distributed Lloyd over quantized embeddings
    (k x dim int64 on the driver).

    - init: centroids = quantized vectors of the `n_clusters` smallest ids,
      fetched via per-batch min-k partials (no sort of the corpus).
    - each refine round: one streaming pass computing per-cluster
      (sum_vec, n); new centroid = floor(sum / n) per dim (an empty cluster
      keeps its previous centroid).
    - assignment: argmin of integer squared L2; ties break to the smallest
      cluster id (numpy argmin-first == SQL ORDER BY dist, cid)."""
    import ray

    def init_candidates(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.nsmallest(n_clusters, id_col) if len(batch) else batch
        return b[[id_col, vec_col]]

    cand = emb_ds.map_batches(init_candidates, batch_format="pandas").take_all()
    cand.sort(key=lambda r: r[id_col])
    if len(cand) < n_clusters:
        raise ValueError(f"need >= {n_clusters} vectors, got {len(cand)}")
    cents = _check_range(np.stack(
        [quantize(np.asarray(r[vec_col]), scale) for r in cand[:n_clusters]]
    ))

    for _ in range(refine_rounds):
        ref = ray.put(cents)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame(columns=["cluster", "n", "sums"])
            c = ray.get(ref)
            q = _batch_matrix(batch, vec_col, scale)
            d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            rows = []
            for cid in range(n_clusters):
                m = q[a == cid]
                if len(m):
                    rows.append(
                        {"cluster": cid, "n": len(m),
                         "sums": m.sum(axis=0).tolist()}
                    )
            return pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        def combine_partials(batch: pd.DataFrame) -> pd.DataFrame:
            # tree-reduce level: collapse up to 4096 partial rows to <= k,
            # so the driver collects O(n_blocks/4096 * k) rows, not one row
            # per (input block, cluster) — the 100-TB driver-state guard
            if len(batch) == 0:
                return batch
            rows = []
            for cid, g in batch.groupby("cluster", sort=False):
                rows.append({
                    "cluster": int(cid),
                    "n": int(g["n"].sum()),
                    "sums": np.sum(
                        np.stack(g["sums"].map(np.asarray).to_numpy()), axis=0
                    ).astype(np.int64).tolist(),
                })
            return pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        reduced = (
            emb_ds.map_batches(partials, batch_format="pandas")
            .map_batches(combine_partials, batch_format="pandas",
                         batch_size=4096)
        )
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for r in reduced.take_all():
            cid = int(r["cluster"])
            counts[cid] = counts.get(cid, 0) + int(r["n"])
            vec = np.asarray(r["sums"], dtype=np.int64)
            sums[cid] = sums.get(cid, np.zeros_like(vec)) + vec
        nxt = cents.copy()
        for cid, n in counts.items():
            # exact below 2^53: |sum| <= scale * n_members
            nxt[cid] = np.floor(sums[cid].astype(np.float64) / n).astype(np.int64)
        cents = nxt

    return cents


def kmeans_assign(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    refine_rounds: int = 1,
    scale: int = 1_000_000,
):
    """Distributed Lloyd over quantized embeddings; returns one row per
    vector: (id_col, cluster, dist) under the final centroids (see
    kmeans_centroids for the update rule)."""
    import ray

    cents = kmeans_centroids(
        emb_ds, id_col, vec_col, n_clusters, refine_rounds, scale
    )
    final_ref = ray.put(cents)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            out = batch[[id_col]].copy()
            out["cluster"] = pd.Series(dtype="int64")
            out["dist"] = pd.Series(dtype="int64")
            return out
        c = ray.get(final_ref)
        q = _batch_matrix(batch, vec_col, scale)
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        out = batch[[id_col]].copy()
        out["cluster"] = a.astype(np.int64)
        out["dist"] = d[np.arange(len(a)), a].astype(np.int64)
        return out

    return emb_ds.map_batches(assign, batch_format="pandas")


def _assigned_with_qv(
    emb_ds,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    refine_rounds: int,
    scale: int,
):
    """Shared front half of the cluster-bucketed pairwise stages
    (semdedup / mutual_knn): k-means assignment where the quantized vector
    rides the cluster shuffle as Arrow fixed_size_list<int64> (columnar,
    never Python objects).  Returns (Dataset(id_col, cluster, qv), dim)."""
    import ray

    import pyarrow as pa

    cents = kmeans_centroids(
        emb_ds, id_col, vec_col, n_clusters, refine_rounds, scale
    )
    ref = ray.put(cents)
    dim = cents.shape[1]

    def assign_with_vec(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "qv": pa.array([], pa.list_(pa.int64())),
            })
        c = ray.get(ref)
        q = quantize(
            np.array(batch.column(vec_col).to_pylist(), dtype=np.float64),
            scale,
        )
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        qv = pa.FixedSizeListArray.from_arrays(
            pa.array(q.ravel(), pa.int64()), dim
        )
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(d.argmin(axis=1).astype(np.int64)),
            "qv": qv,
        })

    return emb_ds.map_batches(assign_with_vec, batch_format="pyarrow"), dim


def semdedup(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    refine_rounds: int = 1,
    scale: int = 1_000_000,
    tau: tuple = (2, 5),
):
    """SemDeDup back half (Abbas et al. 2023): within each k-means cluster,
    flag every vector whose cosine to an EARLIER (smaller-id) member of the
    same cluster reaches tau = tau[0]/tau[1].  Returns one row per vector:
    (id_col, cluster, n_dup_partners, is_dup).

    Integer-exact cosine test (no float ties): with quantized vectors,
    cos(u, v) >= num/den  <=>  dot >= 0 AND den^2*dot^2 >= num^2*|u|^2*|v|^2
    — evaluated in arbitrary-precision ints here and HUGEINT in the SQL
    oracle.  Pairwise work happens only INSIDE a cluster (one shuffle on the
    cluster id); at corpus scale SemDeDup keeps clusters small by growing k
    with n (k ~ n / target_cluster_size), which is the documented
    partitioning assumption of this stage."""
    import pyarrow as pa

    num2 = tau[0] * tau[0]
    den2 = tau[1] * tau[1]
    assigned, dim = _assigned_with_qv(
        emb_ds, id_col, vec_col, n_clusters, refine_rounds, scale
    )

    def per_cluster(group: pa.Table) -> pd.DataFrame:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        clusters = group.column("cluster").to_numpy(zero_copy_only=False)
        qv = group.column("qv")
        if isinstance(qv, pa.ChunkedArray):
            qv = qv.combine_chunks()
        q_all = np.asarray(qv.flatten()).reshape(-1, dim).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        g = pd.DataFrame({id_col: ids[order], "cluster": clusters[order]})
        q = q_all[order]
        dot = q @ q.T
        nn = np.einsum("ij,ij->i", q, q)
        # exact bigint comparison; object dtype keeps numpy vectorization
        lhs = dot.astype(object) ** 2 * den2
        rhs = nn.astype(object)[:, None] * nn.astype(object)[None, :] * num2
        cond = (dot >= 0) & (lhs >= rhs)
        np.fill_diagonal(cond, False)
        n_dup = np.tril(cond, -1).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "cluster": g["cluster"].to_numpy(),
                "n_dup_partners": n_dup,
                "is_dup": (n_dup > 0).astype(np.int64),
            }
        )

    return (
        assigned
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pyarrow")
        .repartition(8)
    )


def negative_samples(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    refine_rounds: int = 1,
    per_cluster: int = 4,
    k: int = 2,
    scale: int = 1_000_000,
):
    """Deterministic hard-negative mining for contrastive training: for
    every anchor vector, ``k`` negatives drawn from OTHER k-means clusters
    — the cluster-based negative-sampling recipe (same family as SemDeDup's
    use of the Lloyd assignment, but for pair construction instead of
    pruning).  RNG-free so the pair table is value-checkable: the candidate
    pool is each cluster's ``per_cluster`` smallest ids, and an anchor
    ranks its pool by ``md5(anchor_id || '|' || cand_id)`` — a keyed hash
    shuffle both engines compute identically.

    -> Dataset(vec_id, neg_id, rank), rank 1..k by (md5 asc, neg_id asc).

    Scale shape: the pool is n_clusters x per_cluster rows (grouped-top-k
    combiner -> driver broadcast, constant size); anchors stream once with
    a bounded per-row candidate loop; no shuffle beyond the assignment's."""
    from .window import grouped_topk

    assign = kmeans_assign(
        emb_ds, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters,
        refine_rounds=refine_rounds, scale=scale,
    ).materialize()

    pool_rows = grouped_topk(
        assign.map_batches(
            lambda b: b[["cluster", id_col]], batch_format="pandas"
        ),
        keys=["cluster"], order_col=id_col, k=per_cluster, descending=False,
    ).to_pandas()
    pool = {
        int(c): sorted(int(v) for v in g[id_col])
        for c, g in pool_rows.groupby("cluster")
    }

    def mine(b: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        rows = []
        for vid, cid in zip(b[id_col], b["cluster"]):
            cands = []
            for c, ids in pool.items():
                if c == int(cid):
                    continue
                for nid in ids:
                    h = hashlib.md5(f"{int(vid)}|{nid}".encode()).hexdigest()
                    cands.append((h, nid))
            cands.sort()
            for r, (_h, nid) in enumerate(cands[:k], 1):
                rows.append((int(vid), nid, r))
        out = pd.DataFrame(rows, columns=[id_col, "neg_id", "rank"])
        return out.astype({id_col: "int64", "neg_id": "int64",
                           "rank": "int64"})

    return assign.map_batches(mine, batch_format="pandas")


def pq_assign_error(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 2,
    n_clusters: int = 8,
    refine_rounds: int = 1,
    scale: int = 1_000_000,
):
    """Product quantization (PQ, Jegou et al. 2011) codes + reconstruction
    error: split each vector into ``n_subspaces`` contiguous dim blocks,
    run the SAME distributed integer Lloyd as ``kmeans_centroids`` per
    subspace, and emit each vector's per-subspace code and exact integer
    squared reconstruction error — the memory-vs-recall acceptance report
    for a PQ-compressed ANN index (the vector-store sibling of
    ``vecstats.scalar_quantize_error``).

    -> Dataset(vec_id, sub, cluster, err): one row per (vector, subspace);
    err = integer squared L2 to the assigned sub-centroid on the quantized
    grid.  Deterministic end to end (kmeans_centroids' id-seeded init,
    floor-mean updates, argmin-first ties), so the SQL mirror — one
    kmeans unroll with a subspace grouping column — is value-exact.

    Scale shape: per subspace, centroid training = kmeans_centroids'
    streaming combiner passes (driver state k x dim/S ints); the final
    pass streams the corpus once, assigning all subspaces per batch.
    Slicing happens inside map_batches (quantize-then-slice ==
    slice-then-quantize: the quantizer is elementwise)."""
    import ray

    dim_probe = emb_ds.take(1)[0][vec_col]
    dim = len(dim_probe)
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    w = dim // n_subspaces

    def slicer(lo: int, hi: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[[id_col]].copy()
            out[vec_col] = [np.asarray(v)[lo:hi] for v in batch[vec_col]]
            return out
        return fn

    cents = []  # per subspace: (k, w) int64
    for s in range(n_subspaces):
        sub_ds = emb_ds.map_batches(slicer(s * w, (s + 1) * w),
                                    batch_format="pandas")
        cents.append(kmeans_centroids(
            sub_ds, id_col, vec_col, n_clusters, refine_rounds, scale
        ))
    ref = ray.put(np.stack(cents))  # (S, k, w)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "sub": pd.Series(dtype="int64"),
                                 "cluster": pd.Series(dtype="int64"),
                                 "err": pd.Series(dtype="int64")})
        c = ray.get(ref)
        q = _batch_matrix(batch, vec_col, scale)
        ids, subs, cids, errs = [], [], [], []
        for s in range(n_subspaces):
            qs = q[:, s * w:(s + 1) * w]
            d = ((qs[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            ids.append(batch[id_col].astype("int64").to_numpy())
            subs.append(np.full(len(qs), s, dtype=np.int64))
            cids.append(a.astype(np.int64))
            errs.append(d[np.arange(len(a)), a].astype(np.int64))
        return pd.DataFrame({
            id_col: np.concatenate(ids),
            "sub": np.concatenate(subs),
            "cluster": np.concatenate(cids),
            "err": np.concatenate(errs),
        })

    return emb_ds.map_batches(assign, batch_format="pandas")


def mutual_knn(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    refine_rounds: int = 1,
    k: int = 3,
    scale: int = 1_000_000,
    score_scale: int = 1_000_000,
):
    """Cluster-bucketed mutual-kNN graph over an embedding column — the
    building block under SemDeDup-style pruning, kNN-graph clustering and
    diffusion label propagation.  For each vector, its top-``k`` cosine
    neighbors among its own k-means cluster co-members, plus a ``mutual``
    flag (1 iff the edge appears in BOTH directions' top-k lists).

    Integer-exact ranking (no float ties): neighbors are ordered by the
    signed squared-cosine surrogate
        score = sign(dot) * (dot^2 * score_scale) // (|u|^2 * |v|^2)
    over quantized vectors — monotone in |cos| with the sign restored, so
    the ordering equals the cosine ordering except inside a truncation tie,
    which both engines break identically by ascending neighbor id.  All
    products stay inside HUGEINT for the SQL mirror (dot <= dim*scale^2).

    Scale shape: candidates are CLUSTER CO-MEMBERS only — one shuffle on
    the k-means assignment (same as semdedup); at corpus scale k-means k
    grows with n so clusters stay bounded (the documented partitioning
    assumption).  The mutual flag is resolved inside the cluster group
    (both directions of any candidate edge live in the same group by
    construction), so no second shuffle.

    -> Dataset(id_col, rank, nbr_id, mutual); singleton clusters emit no
    rows, clusters with < k+1 members emit fewer than k rows per vector.
    """
    import pyarrow as pa

    assigned, dim = _assigned_with_qv(
        emb_ds, id_col, vec_col, n_clusters, refine_rounds, scale
    )

    def per_cluster(group: pa.Table) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int64"),
            "nbr_id": pd.Series(dtype="int64"),
            "mutual": pd.Series(dtype="int64"),
        })
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        m = len(ids)
        if m < 2:
            return empty
        qv = group.column("qv")
        if isinstance(qv, pa.ChunkedArray):
            qv = qv.combine_chunks()
        q_all = np.asarray(qv.flatten()).reshape(-1, dim).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        q = q_all[order]
        dot = q @ q.T  # exact: bounded by dim*scale^2 << 2^63
        nn = np.einsum("ij,ij->i", q, q)
        # arbitrary-precision score matrix (object dtype; clusters are
        # bounded, so the m^2 big-int work is a few thousand ops)
        dt = dot.astype(object)
        nno = nn.astype(object)
        mag = dt * dt * score_scale // (nno[:, None] * nno[None, :])
        score = np.where(dot >= 0, mag, -mag)
        knn: dict[int, list[int]] = {}
        for i in range(m):
            cand = sorted(
                (j for j in range(m) if j != i),
                key=lambda j: (-score[i, j], ids[j]),
            )
            knn[i] = cand[:k]
        nbr_sets = {i: set(js) for i, js in knn.items()}
        out_id, out_rank, out_nbr, out_mut = [], [], [], []
        for i in range(m):
            for r, j in enumerate(knn[i], start=1):
                out_id.append(ids[i])
                out_rank.append(r)
                out_nbr.append(ids[j])
                out_mut.append(1 if i in nbr_sets[j] else 0)
        return pd.DataFrame({
            id_col: np.asarray(out_id, dtype=np.int64),
            "rank": np.asarray(out_rank, dtype=np.int64),
            "nbr_id": np.asarray(out_nbr, dtype=np.int64),
            "mutual": np.asarray(out_mut, dtype=np.int64),
        })

    return (
        assigned
        .groupby("cluster")
        .map_groups(per_cluster, batch_format="pyarrow")
        .repartition(8)
    )


def pq_adc_topk(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 8,
    k: int = 5,
    n_subspaces: int = 2,
    n_clusters: int = 8,
    refine_rounds: int = 1,
    scale: int = 1_000_000,
):
    """PQ asymmetric-distance (ADC) top-k search (Jegou et al. 2011) —
    the compressed-index ANN variant completing the brute
    (similarity.brute_topk) and IVF (similarity.ivf_topk) pair: corpus
    vectors are represented ONLY by their per-subspace codes, a query
    scores a vector as  Σ_s lut[q, s, code_s]  with
    lut = exact integer squared L2 from the query's sub-vector to each
    sub-centroid, and ties break by ascending id.  Queries are the
    ``n_queries`` smallest-id vectors (the ann_topk convention);
    self-pairs are excluded.

    Scale shape: codebooks train with kmeans_centroids' streaming
    combiner per subspace (driver state S·k·(dim/S) ints); the LUT is
    n_queries·S·k ints broadcast once via ray.put; the search is ONE
    streaming pass (assign codes per batch, per-batch partial top-k per
    query, tiny final reduce) — the corpus never materializes and the
    shuffle moves <= n_queries·k rows per batch.

    -> Dataset(query_vec_id, rank, vec_id, adc_dist), all-integer so the
    SQL mirror (PQ unroll + LUT join) is value-exact.
    """
    import ray

    dim_probe = emb_ds.take(1)[0][vec_col]
    dim = len(dim_probe)
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces}")
    w = dim // n_subspaces

    def slicer(lo: int, hi: int):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[[id_col]].copy()
            out[vec_col] = [np.asarray(v)[lo:hi] for v in batch[vec_col]]
            return out
        return fn

    cents = []
    for s in range(n_subspaces):
        sub_ds = emb_ds.map_batches(slicer(s * w, (s + 1) * w),
                                    batch_format="pandas")
        cents.append(kmeans_centroids(
            sub_ds, id_col, vec_col, n_clusters, refine_rounds, scale
        ))
    c = np.stack(cents)  # (S, k, w) int64

    # queries: the n_queries smallest ids — per-batch min-k partials,
    # never a corpus sort (same plan as kmeans_centroids' init)
    qcand = emb_ds.map_batches(
        lambda b: b.nsmallest(n_queries, id_col)[[id_col, vec_col]]
        if len(b) else b[[id_col, vec_col]],
        batch_format="pandas",
    ).take_all()
    qcand.sort(key=lambda r: r[id_col])
    qrows = qcand[:n_queries]
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _check_range(quantize(
        np.stack([np.asarray(r[vec_col]) for r in qrows]), scale))

    # LUT[j, s, cid] = exact squared L2 of query j's subspace s to centroid
    lut = np.zeros((len(qids), n_subspaces, n_clusters), dtype=np.int64)
    for s in range(n_subspaces):
        qs = qmat[:, s * w:(s + 1) * w]
        lut[:, s, :] = ((qs[:, None, :] - c[s][None, :, :]) ** 2).sum(axis=2)
    ref = ray.put((qids, c, lut))

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "query_vec_id": pd.Series(dtype="int64"),
            "vec_id": pd.Series(dtype="int64"),
            "adc_dist": pd.Series(dtype="int64"),
        })
        if len(batch) == 0:
            return empty
        q_ids, cc, ll = ray.get(ref)
        ids = batch[id_col].astype("int64").to_numpy()
        qm = _check_range(quantize(np.stack(batch[vec_col].to_numpy()), scale))
        # codes per subspace, then ADC via LUT gather
        dist = np.zeros((len(ids), len(q_ids)), dtype=np.int64)
        for s in range(n_subspaces):
            qs = qm[:, s * w:(s + 1) * w]
            d = ((qs[:, None, :] - cc[s][None, :, :]) ** 2).sum(axis=2)
            codes = d.argmin(axis=1)
            dist += ll[:, s, :][:, codes].T  # (batch, nq)
        frames = []
        for j in range(len(q_ids)):
            mask = ids != q_ids[j]
            cand_ids, cand_d = ids[mask], dist[mask, j]
            take = min(k, len(cand_ids))
            if take == 0:
                continue
            # Tie-aware truncation: ADC distances tie structurally (co-cell
            # vectors share codes), so the per-batch cut must honor the
            # ascending-vec_id tie-break or the global top-k depends on the
            # block layout. Full lexsort over the batch's candidates is cheap
            # (batch-sized) and deterministic.
            order = np.lexsort((cand_ids, cand_d))[:take]
            frames.append(pd.DataFrame({
                "query_vec_id": np.full(take, q_ids[j], dtype=np.int64),
                "vec_id": cand_ids[order],
                "adc_dist": cand_d[order],
            }))
        return pd.concat(frames, ignore_index=True) if frames else empty

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc_dist", "vec_id"],
                              kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "rank", "vec_id", "adc_dist"]]

    return (
        emb_ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("query_vec_id")
        .map_groups(final_topk, batch_format="pandas")
        .repartition(8)
    )

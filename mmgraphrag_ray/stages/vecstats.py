"""Exact covariance / Gram sufficient statistics over an embedding column.

PCA whitening, feature decorrelation and embedding-drift monitoring all
start from the same object: the d x d second-moment matrix of the corpus
embeddings plus the per-dimension sums.  At 100 TB the only viable shape is
the streaming sufficient-statistics pass: each batch contributes one
upper-triangle partial (d*(d+1)/2 rows — 2,080 for dim 64), a bucketed sum
folds the partials, and the full covariance is recovered downstream as
cov[d,e] = (s_de - s_d*s_e/n) / n from a table that is O(dim^2) regardless
of corpus size.  No shuffle ever sees a vector; the corpus streams once.

Integer-exactness: vectors are quantized q = floor(x * scale) (int64, the
same `quantize` contract as stages/cluster.py), so every sum is associative
integer math and the SQL oracle matches bit-for-bit — float dot products
would accumulate in shuffle-delivery order and never hash-match.  Callers
own overflow headroom: with |q| <= 4e6 (scale 1e6, |x| <= 4) the pairwise
products are <= 1.6e13, so int64 partial sums stay safe past 5e5 rows per
batch and the GLOBAL sums past ~575 billion rows; raise `scale` only with
bounded inputs.  `_check_range` (cluster.py) fails loudly before numpy
would wrap.

No reference counterpart (the reference's only embedding math is cosine
top-k, storage.py:298-323); this is a training-data-pipeline extension in
the same family as stages/cluster.py k-means.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .cluster import _batch_matrix
from .groupagg import N_BUCKETS, bucketed_groupby_agg

_PARTIAL_COLS = ["d", "e", "n", "s_d", "s_e", "s_de"]


def embedding_covariance_components(
    emb_ds,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    n_buckets: int = N_BUCKETS,
):
    """One streaming pass -> Dataset(d, e, n, s_d, s_e, s_de), all int64,
    one row per upper-triangle dimension pair (1-based, d <= e).

    n is the total row count (replicated per pair so each output row is a
    self-contained covariance cell: cov = (s_de - s_d*s_e/n)/n).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in _PARTIAL_COLS}
            )
        q = _batch_matrix(batch, vec_col, scale)
        gram = q.T @ q
        lin = q.sum(axis=0)
        d_idx, e_idx = np.triu_indices(q.shape[1])
        return pd.DataFrame(
            {
                "d": (d_idx + 1).astype(np.int64),
                "e": (e_idx + 1).astype(np.int64),
                "n": np.full(len(d_idx), len(batch), dtype=np.int64),
                "s_d": lin[d_idx],
                "s_e": lin[e_idx],
                "s_de": gram[d_idx, e_idx],
            }
        )

    return bucketed_groupby_agg(
        emb_ds.map_batches(partial, batch_format="pandas"),
        keys=["d", "e"],
        aggs={
            "n": ("n", "sum"),
            "s_d": ("s_d", "sum"),
            "s_e": ("s_e", "sum"),
            "s_de": ("s_de", "sum"),
        },
        n_buckets=n_buckets,
    )


def _trunc_div_norm(w: list[int], target: int) -> list[int]:
    """Sign-split truncating normalization: v = sign(w) * (|w| * target //
    max|w|).  Truncating (not flooring) division on non-negative operands
    is the ONE integer-division semantics numpy/Python and DuckDB BIGINT
    agree on, so the mirror is exact."""
    mx = max((abs(x) for x in w), default=0) or 1
    return [(abs(x) * target // mx) * (1 if x >= 0 else -1) for x in w]


def pca_power_component(
    emb_ds,
    vec_col: str = "embedding",
    scale: int = 100,
):
    """Leading principal component direction via TWO integer power-iteration
    rounds over the covariance sufficient statistics — the PCA/whitening
    follow-up to `embedding_covariance_components`.

    Scale shape: the corpus reduces to the O(dim^2) integer component table
    (one streaming pass); the power iteration itself is driver-side exact
    big-int math over a dim x dim matrix — O(dim^2) work INDEPENDENT of
    corpus size, which is the correct place for it (shipping a 64x64 fold
    to the cluster would be pure overhead).

    Integer-exactness: the centered scatter matrix M = n*s_de - s_d*s_e is
    integer; each round renormalizes with sign-split TRUNCATING division
    (see `_trunc_div_norm`) so every intermediate matches the SQL mirror
    bit-for-bit.  scale=100 keeps every intermediate inside int64 for
    |x| <= ~4, dim 64, n <= ~2e5 (the guard below fails loudly first).
    Sign is pinned by starting from the all-ones vector — both engines run
    the identical deterministic sequence.

    -> Dataset(d, component): d 1-based, component on a ~1e6 integer scale.
    """
    import ray.data

    comp = embedding_covariance_components(
        emb_ds, vec_col=vec_col, scale=scale
    ).to_pandas()
    dim = int(comp["e"].max())
    n = int(comp["n"].iloc[0]) if len(comp) else 0
    m = [[0] * dim for _ in range(dim)]  # Python ints: exact at any size
    for row in comp.itertuples(index=False):
        d, e = int(row.d) - 1, int(row.e) - 1
        val = int(row.n) * int(row.s_de) - int(row.s_d) * int(row.s_e)
        m[d][e] = val
        m[e][d] = val
    mmax = max((abs(v) for r in m for v in r), default=0)
    if mmax * 1_000_000 * dim >= 2**63:
        raise ValueError(
            f"scatter magnitude {mmax} too large for the int64-safe mirror "
            f"(dim={dim}, n={n}); lower `scale`"
        )
    v = [1] * dim
    w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
    v = _trunc_div_norm(w, 1_000_000)
    w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
    mx = max((abs(x) for x in w), default=0)
    denom = max(1, mx // 1_000_000)
    v = [(abs(x) // denom) * (1 if x >= 0 else -1) for x in w]
    return ray.data.from_pandas(
        pd.DataFrame(
            {"d": np.arange(1, dim + 1, dtype=np.int64),
             "component": np.asarray(v, dtype=np.int64)}
        )
    )


def scalar_quantize_error(
    emb_ds,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    levels: int = 256,
):
    """Per-vector reconstruction error of GLOBAL per-dimension scalar
    quantization (the int8 embedding-compression every vector store offers
    — faiss SQ8, pgvector halfvec-style): each dimension maps to
    ``levels`` uniform codes between its corpus-wide min and max, and the
    report is the exact per-vector quantization error — the acceptance
    gate before swapping an ANN index to compressed storage.

    ALL-INTEGER discipline (module contract): x -> q = floor(x*scale)
    int64 first, then code = (q - mn) * (levels-1) // (mx - mn) and
    recon = mn + code * (mx - mn) // (levels-1) — every division has
    non-negative operands, where truncation == floor in numpy, Python
    and DuckDB alike.

    -> Dataset(vec_id, err_sum, err_max, n_dims): summed and max absolute
    per-dim error on the `scale` grid, all int64.

    Scale shape: pass 1 reduces the corpus to per-dim (min, max) partials
    (one row per dim per batch -> tiny bucketed reduce -> driver-side
    dim-sized table broadcast in the task closure); pass 2 streams the
    corpus once more, vectorized numpy per batch, emitting one row per
    vector.  No shuffle ever carries a vector."""
    import ray

    def mm_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("d", "mn", "mx")})
        q = _batch_matrix(batch, vec_col, scale)
        return pd.DataFrame({
            "d": np.arange(1, q.shape[1] + 1, dtype=np.int64),
            "mn": q.min(axis=0),
            "mx": q.max(axis=0),
        })

    bounds = bucketed_groupby_agg(
        emb_ds.map_batches(mm_partial, batch_format="pandas"),
        keys=["d"],
        aggs={"mn": ("mn", "min"), "mx": ("mx", "max")},
    ).to_pandas().sort_values("d")
    mn = bounds["mn"].to_numpy(np.int64)
    mx = bounds["mx"].to_numpy(np.int64)
    span = mx - mn
    safe_span = np.where(span > 0, span, 1)
    ref = ray.put((mn, span, safe_span))

    def err(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "err_sum": pd.Series(dtype="int64"),
                                 "err_max": pd.Series(dtype="int64"),
                                 "n_dims": pd.Series(dtype="int64")})
        mn_, span_, safe_ = ray.get(ref)
        q = _batch_matrix(batch, vec_col, scale)
        code = (q - mn_) * (levels - 1) // safe_
        code = np.where(span_ > 0, code, 0)
        recon = mn_ + code * span_ // (levels - 1)
        e = np.abs(q - recon)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64").to_numpy(),
            "err_sum": e.sum(axis=1).astype("int64"),
            "err_max": e.max(axis=1).astype("int64"),
            "n_dims": np.full(len(batch), q.shape[1], dtype=np.int64),
        })

    return emb_ds.map_batches(err, batch_format="pandas")


def matryoshka_error(
    emb_ds,
    prefixes: tuple = (8, 16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
):
    """Matryoshka (MRL) prefix-truncation acceptance report: for each
    prefix length m, the exact squared norm kept by the first m
    dimensions vs dropped by the rest, plus the retained-energy share in
    integer ppm — the dimensionality-vs-recall dial behind serving MRL
    embeddings at reduced width (Kusupati et al. 2022).

    ALL-INTEGER: x -> q = floor(x·scale) int64 first; kept/dropped are
    exact Σq², retain_ppm = kept·1e6 // (kept+dropped) (0 for the zero
    vector).  -> Dataset(vec_id, m, kept_sq, dropped_sq, retain_ppm).

    Scale shape: ONE streaming pass, vectorized numpy per batch (prefix
    cumulative sums), len(prefixes) short rows per vector, no shuffle."""
    def err(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "m": pd.Series(dtype="int64"),
                "kept_sq": pd.Series(dtype="int64"),
                "dropped_sq": pd.Series(dtype="int64"),
                "retain_ppm": pd.Series(dtype="int64"),
            })
        q = _batch_matrix(batch, vec_col, scale)
        sq = q * q
        total = sq.sum(axis=1)
        ids = batch[id_col].to_numpy(np.int64)
        frames = []
        for m in prefixes:
            kept = sq[:, :m].sum(axis=1)
            dropped = total - kept
            safe = np.where(total > 0, total, 1)
            frames.append(pd.DataFrame({
                id_col: ids,
                "m": np.int64(m),
                "kept_sq": kept,
                "dropped_sq": dropped,
                "retain_ppm": kept * 1_000_000 // safe,
            }))
        return pd.concat(frames, ignore_index=True)

    return emb_ds.map_batches(err, batch_format="pandas")


def label_scatter(
    emb_ds,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000,
):
    """Within-class scatter per label — the class-compactness half of a
    Fisher-style separability report over a labeled embedding table
    (ANN-index sanity / classifier-feasibility check):

        scatter_num(label) = Σ_d ( n·Σv_d² − (Σv_d)² )   (= n²·tr Σ̂)

    computed ALL-INTEGER on the floor(x·scale) grid (scale = 1e3 keeps
    n·Σq² inside int64 at corpus scale; the SQL mirror runs the same
    sums through HUGEINT).  -> Dataset(label, n, scatter_num).

    Shape: one streaming pass emits per-(label, dim) sufficient-stat
    partials (labels × dims rows per batch, vocabulary-bounded); one
    bucketed reduce; the label-sized finish folds on the driver."""
    import ray

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({
                "label": pd.Series(dtype="int64"),
                "d": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "ss": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
            })
        q = _batch_matrix(batch, vec_col, scale)
        labels = batch[label_col].to_numpy(np.int64)
        frames = []
        for lab in np.unique(labels):
            m = q[labels == lab]
            frames.append(pd.DataFrame({
                "label": np.int64(lab),
                "d": np.arange(1, q.shape[1] + 1, dtype=np.int64),
                "s": m.sum(axis=0),
                "ss": (m * m).sum(axis=0),
                "n": np.int64(len(m)),
            }))
        return pd.concat(frames, ignore_index=True)

    from .groupagg import bucketed_groupby_agg

    agg = bucketed_groupby_agg(
        emb_ds.map_batches(partial, batch_format="pandas"),
        keys=["label", "d"],
        aggs={"s": ("s", "sum"), "ss": ("ss", "sum"), "n": ("n", "sum")},
    ).to_pandas()  # labels × dims rows — vocabulary-bounded

    out = []
    for lab, g in agg.groupby("label"):
        n = int(g["n"].iloc[0])  # same count replicated per dim
        num = sum(n * int(ss) - int(s) * int(s)
                  for s, ss in zip(g["s"], g["ss"]))
        out.append({"label": int(lab), "n": n, "scatter_num": num})
    return ray.data.from_items(
        sorted(out, key=lambda r: r["label"])
    )

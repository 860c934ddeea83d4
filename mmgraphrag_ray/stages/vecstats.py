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

"""embedding_covariance_components: exact sufficient statistics."""

import sys

import numpy as np
import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.stages.vecstats import embedding_covariance_components


def _ds(vectors):
    return ray.data.from_pandas(
        pd.DataFrame({"embedding": [np.asarray(v, dtype=np.float32) for v in vectors]})
    )


def test_covariance_components_match_numpy():
    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 5).astype(np.float32)
    out = (
        embedding_covariance_components(_ds(list(vecs)), scale=1000)
        .to_pandas()
        .sort_values(["d", "e"])
        .reset_index(drop=True)
    )
    q = np.floor(vecs.astype(np.float64) * 1000).astype(np.int64)
    gram = q.T @ q
    lin = q.sum(axis=0)
    assert len(out) == 5 * 6 // 2
    assert (out["n"] == 50).all()
    for _, r in out.iterrows():
        d, e = int(r["d"]) - 1, int(r["e"]) - 1
        assert d <= e
        assert r["s_d"] == lin[d]
        assert r["s_e"] == lin[e]
        assert r["s_de"] == gram[d, e]


def test_covariance_partials_associative_across_blocks():
    # splitting the input into many blocks must not change the result
    rng = np.random.RandomState(11)
    vecs = rng.randn(64, 4).astype(np.float32)
    one = (
        embedding_covariance_components(_ds(list(vecs)), scale=1000)
        .to_pandas().sort_values(["d", "e"]).reset_index(drop=True)
    )
    many = (
        embedding_covariance_components(
            _ds(list(vecs)).repartition(16), scale=1000
        )
        .to_pandas().sort_values(["d", "e"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many, check_dtype=False)


def test_covariance_cell_recovers_float_covariance():
    # the documented downstream recovery formula is numerically sane
    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 3).astype(np.float32)
    out = embedding_covariance_components(_ds(list(vecs)), scale=1_000_000).to_pandas()
    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    for _, r in out.iterrows():
        d, e = int(r["d"]) - 1, int(r["e"]) - 1
        cov = (r["s_de"] - r["s_d"] * r["s_e"] / r["n"]) / r["n"] / 1_000_000**2
        expect = np.cov(q[:, d], q[:, e], bias=True)[0, 1] / 1_000_000**2
        assert abs(cov - expect) < 1e-9

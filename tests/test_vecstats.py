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


def test_pca_power_component_tracks_numpy_eigvector():
    # the integer 2-round power iteration must point (up to sign and
    # truncation noise) along the true leading eigenvector
    from mmgraphrag_ray.stages.vecstats import pca_power_component

    rng = np.random.RandomState(5)
    base = rng.randn(300, 6)
    base[:, 2] *= 8.0  # dominant variance direction = dim 2
    out = (
        pca_power_component(_ds(list(base.astype(np.float32))), scale=100)
        .to_pandas().sort_values("d").reset_index(drop=True)
    )
    assert len(out) == 6
    comp = out["component"].to_numpy().astype(np.float64)
    comp = comp / np.linalg.norm(comp)
    q = np.floor(base * 100).astype(np.int64).astype(np.float64)
    cov = np.cov(q.T, bias=True)
    eigval, eigvec = np.linalg.eigh(cov)
    lead = eigvec[:, -1]
    assert abs(abs(comp @ lead) - 1.0) < 0.05
    assert np.argmax(np.abs(comp)) == 2


def test_pca_power_component_deterministic():
    from mmgraphrag_ray.stages.vecstats import pca_power_component

    rng = np.random.RandomState(9)
    vecs = list(rng.randn(80, 4).astype(np.float32))
    a = pca_power_component(_ds(vecs), scale=100).to_pandas()
    b = pca_power_component(_ds(vecs).repartition(7), scale=100).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("d").reset_index(drop=True),
        b.sort_values("d").reset_index(drop=True),
    )


def test_scalar_quantize_error_bounded_and_exact_on_constants():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.vecstats import scalar_quantize_error

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8).astype(np.float32)
    vecs[:, 0] = 0.5  # constant dim -> zero error by the span-0 guard
    df = pd.DataFrame({"vec_id": np.arange(60, dtype="int64"),
                       "embedding": list(vecs)})
    out = scalar_quantize_error(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 60 and (out["n_dims"] == 8).all()
    # per-dim error is bounded by the quantization step ceil(span/255)
    q = np.floor(vecs.astype(np.float64) * 1_000_000).astype(np.int64)
    step = int(np.ceil((q.max(axis=0) - q.min(axis=0)).max() / 255))
    assert (out["err_max"] <= step).all()
    const_only = np.abs(q[:, 0] - q[:, 0])  # constant dim contributes 0
    assert (out["err_sum"] >= 0).all() and const_only.sum() == 0

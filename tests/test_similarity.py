"""Similarity search: brute top-k vs IVF recall, label transfer."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray.stages.similarity import brute_topk, ivf_topk, knn_label_transfer


@pytest.fixture(scope="module")
def emb():
    rng = np.random.default_rng(11)
    n, d = 300, 16
    vecs = rng.standard_normal((n, d))
    df = pd.DataFrame(
        {"vec_id": range(n), "embedding": [v.tolist() for v in vecs],
         "label": (np.arange(n) % 4).astype("int32")}
    )
    return ray.data.from_pandas(df).materialize(), df


def test_brute_topk_matches_numpy(emb):
    ds, df = emb
    vecs = np.array(df["embedding"].tolist())
    q = vecs[:3]
    out = brute_topk(ds, np.arange(3), q, k=4).to_pandas()
    # ground truth for query 0
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = v @ (q[0] / np.linalg.norm(q[0]))
    sims[0] = -np.inf  # exclude self
    expect = list(np.argsort(-sims)[:4])
    got = list(out[out.query_vec_id == 0].sort_values("rank")["vec_id"])
    assert got == expect


def test_ivf_recall_reasonable(emb):
    ds, df = emb
    vecs = np.array(df["embedding"].tolist())
    qids = np.arange(8)
    q = vecs[:8]
    brute = brute_topk(ds, qids, q, k=5).to_pandas()
    ivf = ivf_topk(ds, qids, q, k=5, n_centroids=8, nprobe=4).to_pandas()
    recall = 0.0
    for qi in qids:
        b = set(brute[brute.query_vec_id == qi]["vec_id"])
        a = set(ivf[ivf.query_vec_id == qi]["vec_id"])
        recall += len(a & b) / len(b)
    recall /= len(qids)
    assert recall >= 0.5, recall  # nprobe=4 of 8 cells


def test_ivf_nprobe_full_equals_brute(emb):
    ds, df = emb
    vecs = np.array(df["embedding"].tolist())
    qids = np.arange(4)
    q = vecs[:4]
    brute = brute_topk(ds, qids, q, k=5).to_pandas().sort_values(
        ["query_vec_id", "rank"]).reset_index(drop=True)
    ivf = ivf_topk(ds, qids, q, k=5, n_centroids=8, nprobe=8).to_pandas().sort_values(
        ["query_vec_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(brute, ivf)


def test_knn_label_transfer(emb):
    ds, df = emb
    vecs = np.array(df["embedding"].tolist())
    labels_by_id = dict(zip(df["vec_id"], df["label"].astype(int)))
    out = knn_label_transfer(ds, np.arange(2), vecs[:2], labels_by_id, k=1).to_pandas()
    assert len(out) == 2
    assert set(out["label"]) <= {0, 1, 2, 3}


def test_ivf_recall_vs_brute(ray_session):
    """IVF with nprobe=4/16 must keep recall@5 >= 0.6 vs exact brute force
    on the synthetic embeddings (tested invariant in lieu of a SQL oracle:
    the probe math is approximate by design)."""
    import numpy as np
    import ray.data

    from mmgraphrag_ray.stages.similarity import brute_topk, ivf_topk

    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet").materialize()
    qdf = emb.filter(expr="vec_id < 8").to_pandas()
    qids = qdf["vec_id"].to_numpy()
    qvecs = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    exact = brute_topk(emb, qids, qvecs, k=5).to_pandas()
    approx = ivf_topk(emb, qids, qvecs, k=5, n_centroids=16, nprobe=4).to_pandas()
    exact_sets = exact.groupby("query_vec_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_vec_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert np.mean(recalls) >= 0.6, recalls


def test_ann_recall_counts_overlap():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.similarity import ann_recall

    brute = pd.DataFrame({"query_vec_id": [1, 1, 1, 2, 2],
                          "vec_id": [10, 11, 12, 20, 21]})
    ivf = pd.DataFrame({"query_vec_id": [1, 1, 1, 2, 2],
                        "vec_id": [10, 12, 99, 77, 78]})
    out = (
        ann_recall(ray.data.from_pandas(brute), ray.data.from_pandas(ivf))
        .to_pandas().set_index("query_vec_id").sort_index()
    )
    assert out.loc[1, "n_common"] == 2 and out.loc[1, "n_brute"] == 3
    assert out.loc[2, "n_common"] == 0 and out.loc[2, "n_ivf"] == 2

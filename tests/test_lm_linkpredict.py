"""bigram-LM fluency scores + common-neighbor link prediction."""

import sys

import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.stages.graphalgo import link_prediction_scores
from mmgraphrag_ray.stages.index import bigram_lm_scores


def test_bigram_lm_hand_computed():
    # corpus bigrams: 'a b'x3 (docs 1,1,2), 'b a'x1, 'b c'x1
    # c1: a=3 (left contexts), b=2 -> p(a b)=1e6, p(b a)=p(b c)=500000
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["a b a b c", "a b", "x"]}
        )
    ).repartition(2)
    out = (
        bigram_lm_scores(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 3 has one token -> no bigram positions -> absent
    assert list(out["doc_id"]) == [1, 2]
    d1 = out[out["doc_id"] == 1].iloc[0]
    assert d1["n_bigrams"] == 4
    assert d1["lm_score"] == 2 * 1_000_000 + 500_000 + 500_000
    d2 = out[out["doc_id"] == 2].iloc[0]
    assert d2["n_bigrams"] == 1 and d2["lm_score"] == 1_000_000


def test_bigram_lm_split_invariant():
    texts = ["the cat sat on the mat", "the cat ran", "a cat sat",
             "on the mat the cat sat", "zz yy zz"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    one = (
        bigram_lm_scores(ray.data.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        bigram_lm_scores(ray.data.from_pandas(df).repartition(5))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def _edges(pairs):
    return ray.data.from_pandas(
        pd.DataFrame(pairs, columns=["src_id", "tgt_id"])
    ).repartition(2)


def test_link_prediction_hand_computed():
    # a-b a-c b-c a-d: open pairs are (b,d) and (c,d), both via z=a (deg 3)
    edges = _edges([("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")])
    out = (
        link_prediction_scores(edges, k=10, deg_cap=64)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert len(out) == 2
    assert list(out["ea"]) == ["b", "c"]            # ra tie -> ea asc
    assert list(out["eb"]) == ["d", "d"]
    assert list(out["cn"]) == [1, 1]
    assert list(out["ra"]) == [1_000_000 // 3] * 2  # scale // deg(a)
    assert list(out["rank"]) == [1, 2]


def test_link_prediction_deg_cap_excludes_hub():
    # with deg_cap=2 the hub a (deg 3) contributes nothing; remaining
    # wedges only re-propose existing edges -> empty proposal set
    edges = _edges([("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")])
    out = link_prediction_scores(edges, k=10, deg_cap=2).to_pandas()
    assert len(out) == 0


from mmgraphrag_ray.stages.graphalgo import random_walks


def test_random_walks_deg1_exact():
    # single edge a-b: both endpoints have deg 1, so walks oscillate
    edges = _edges([("a", "b")])
    out = (
        random_walks(edges, length=3)
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    assert list(out[out["walk_id"] == "a"]["node"]) == ["a", "b", "a", "b"]
    assert list(out[out["walk_id"] == "b"]["node"]) == ["b", "a", "b", "a"]


def test_random_walks_moves_along_edges():
    edges = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")])
    out = random_walks(edges, length=3).to_pandas()
    # one row per (node, step)
    assert len(out) == 4 * 4
    edge_set = {("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")}
    edge_set |= {(b, a) for a, b in edge_set}
    w = out.sort_values(["walk_id", "step"])
    for _, g in w.groupby("walk_id"):
        nodes = list(g["node"])
        for prev, nxt in zip(nodes, nodes[1:]):
            assert (prev, nxt) in edge_set


def test_random_walks_partition_invariant():
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d")]
    one = (
        random_walks(_edges(pairs), length=2)
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    many = (
        random_walks(
            ray.data.from_pandas(
                pd.DataFrame(pairs, columns=["src_id", "tgt_id"])
            ).repartition(5),
            length=2,
        )
        .to_pandas().sort_values(["walk_id", "step"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


from mmgraphrag_ray.stages.dedup import keep_best_representative


def test_keep_best_representative_argmax_and_ties():
    labels = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "label": [1, 1, 1, 4, 4]}
    )).repartition(2)
    # component 1: max score 9 held by ids 2 and 3 -> tie keeps id 2
    scores = ray.data.from_pandas(pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "score": [7, 9, 9, 3, 1]}
    )).repartition(3)
    out = (
        keep_best_representative(labels, scores)
        .to_pandas().sort_values("label").reset_index(drop=True)
    )
    assert list(out["label"]) == [1, 4]
    assert list(out["keep_id"]) == [2, 4]
    assert list(out["score"]) == [9, 3]
    assert list(out["n_members"]) == [3, 2]


from mmgraphrag_ray.stages.profile import fk_orphan_audit


def test_fk_orphan_audit_counts_orphans():
    fact = ray.data.from_pandas(pd.DataFrame(
        {"fk": [1, 1, 2, 3, 3, 3, None]}
    )).repartition(2)
    dim = ray.data.from_pandas(pd.DataFrame({"pk": [1, 2, 9]})).repartition(2)
    out = fk_orphan_audit([("f->d", fact, "fk", dim, "pk")]).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # null fk excluded; key 3 dangles with 3 rows
    assert r["relation"] == "f->d"
    assert r["n_rows"] == 6
    assert r["n_distinct_fk"] == 3
    assert r["n_orphan_keys"] == 1
    assert r["n_orphan_rows"] == 3


from mmgraphrag_ray.stages.graphalgo import modularity_int


def test_modularity_two_cliques():
    # two triangles joined by one bridge: m = 7
    # label prop (4 rounds) labels everything min node 'a' -> ONE community
    # e_c = 7, d_c = 14 -> q_num = 4*7*7 - 196 = 0 (trivial partition Q=0
    # ... minus nothing: sum = 196 - 196 = 0)
    edges = _edges([("a", "b"), ("a", "c"), ("b", "c"),
                    ("d", "e"), ("d", "f"), ("e", "f"), ("c", "d")])
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": list("abcdef")}
    ))
    out = modularity_int(nodes, edges, rounds=4).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["m_edges"] == 7
    assert out.iloc[0]["q_num"] == 4 * 7 * 7 - 14 * 14  # = 0


def test_modularity_disconnected_cliques():
    # two disjoint triangles: labels 'a' and 'd', each e_c=3, d_c=6
    # q_num = 2 * (4*6*3 - 36) = 2 * 36 = 72; Q = 72/(4*36) = 0.5
    edges = _edges([("a", "b"), ("a", "c"), ("b", "c"),
                    ("d", "e"), ("d", "f"), ("e", "f")])
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": list("abcdef")}
    ))
    out = modularity_int(nodes, edges, rounds=4).to_pandas()
    assert out.iloc[0]["m_edges"] == 6
    assert out.iloc[0]["q_num"] == 72


def test_basket_part_pairs_support_and_cap(tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa_

    # orders: 1 {10,20,30}; 2 {10,20}; 3 {10,20} dup rows; 4 singleton
    li = pd.DataFrame(
        {"l_orderkey": [1, 1, 1, 2, 2, 3, 3, 3, 4],
         "l_partkey": [10, 20, 30, 10, 20, 10, 20, 20, 99]}
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa_.Table.from_pandas(li), str(sf / "lineitem.parquet"))
    from mmgraphrag_ray.pipelines.relational import basket_part_pairs

    out = (
        basket_part_pairs(str(sf), k=10)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert list(out.itertuples(index=False, name=None)) == [
        (10, 20, 3, 1), (10, 30, 1, 2), (20, 30, 1, 3),
    ]


def test_quality_buckets_partitions_and_totals():
    from mmgraphrag_ray.stages.select import lm_quality_buckets

    # 10 scored docs with distinct fluency levels: repetitive docs score
    # high (their bigrams dominate the corpus LM), unique ones low
    texts = (["a b " * 20] * 3           # very fluent (common bigrams)
             + ["a b c d " * 5] * 4      # mixed
             + ["q w e r t y u i", "m n o p s t u v", "z x c v b n m k"])
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        lm_quality_buckets(ray.data.from_pandas(df).repartition(3))
        .to_pandas().set_index("bucket").sort_index()
    )
    # every scored doc lands in exactly one bucket
    assert out["n_docs"].sum() == len(texts)
    assert set(out.index) <= {"head", "middle", "tail"}
    # ordering invariant: every head doc's mean_p >= every middle's
    # >= every tail's (bucket ranges must not overlap)
    if {"head", "middle"} <= set(out.index):
        assert out.loc["head", "min_mean_p"] >= out.loc["middle", "max_mean_p"]
    if {"middle", "tail"} <= set(out.index):
        assert out.loc["middle", "min_mean_p"] > out.loc["tail", "max_mean_p"]
    # the repetitive docs are fluent -> head bucket is non-empty
    assert "head" in out.index and out.loc["head", "n_docs"] >= 1


def test_quality_buckets_all_equal_scores_single_bucket():
    from mmgraphrag_ray.stages.select import lm_quality_buckets

    # identical docs -> identical mean_p -> lo == hi == the value ->
    # everything is 'head' (mean_p >= hi), no middle/tail rows
    df = pd.DataFrame({"doc_id": range(6), "text": ["a b c"] * 6})
    out = lm_quality_buckets(ray.data.from_pandas(df)).to_pandas()
    assert list(out["bucket"]) == ["head"] and out.iloc[0]["n_docs"] == 6

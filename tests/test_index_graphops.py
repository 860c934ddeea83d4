"""Unit tests for the inverted-index/tf-idf stages (stages/index.py), the
repetition signals (textstats.RepetitionStage), and the round-bounded label
propagation + degree-ordered triangle counting (stages/graphalgo.py)."""

import pandas as pd
import pyarrow as pa
import ray.data

from mmgraphrag_ray.stages.graphalgo import min_label_rounds, triangle_counts
from mmgraphrag_ray.stages.index import doc_tfidf_topk, token_postings
from mmgraphrag_ray.stages.textstats import doc_repetition_stats


def _docs(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(3)


def test_token_postings_df_and_caps():
    docs = _docs(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "beta alpha"), (4, "delta")]
    )
    out = token_postings(docs, max_postings=2).to_pandas()
    got = {r.token: (r.df, r.postings) for r in out.itertuples()}
    assert got["beta"] == (3, "1,2")  # df counts ALL docs, postings capped at 2
    assert got["alpha"] == (2, "1,3")
    assert got["gamma"] == (1, "2")
    assert got["delta"] == (1, "4")


def test_token_postings_partial_caps_compose():
    # 9 docs of one token split across 3 blocks: the global smallest 4 ids
    # must survive capped partials regardless of which block they were in
    docs = _docs([(i, "tok") for i in (9, 1, 5, 3, 8, 2, 7, 4, 6)])
    out = token_postings(docs, max_postings=4).to_pandas()
    assert out.loc[0, "df"] == 9
    assert out.loc[0, "postings"] == "1,2,3,4"


def test_tfidf_rank_and_integer_score():
    # "rare" appears in 1 doc, "common" in all 3 -> rare outranks common
    docs = _docs(
        [(1, "common rare rare"), (2, "common common"), (3, "common")]
    )
    out = doc_tfidf_topk(docs, k=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert list(d1.token) == ["rare", "common"]
    assert d1.iloc[0].score == 2 * 1_000_000 // 1
    assert d1.iloc[1].score == 1 * 1_000_000 // 3


def test_repetition_stats_lines_and_bigram():
    text = "a b a b\n\nsame line\nsame line\n  \nother"
    ds = _docs([(1, text)])
    r = doc_repetition_stats(ds).to_pandas().iloc[0]
    # non-empty lines: 'a b a b', 'same line' x2, 'other' -> 4 lines, 1 dup
    assert r.n_lines == 4 and r.n_dup_lines == 1
    # bigrams of [a b a b same line same line other]: 'a b' x2 is the top
    assert r.top_bigram == "a b" and r.top_bigram_cnt == 2
    assert r.n_bigrams == 8


def test_repetition_stats_empty_doc():
    r = doc_repetition_stats(_docs([(1, "")])).to_pandas().iloc[0]
    assert (r.n_lines, r.n_dup_lines, r.n_bigrams, r.top_bigram_cnt) == (0, 0, 0, 0)
    assert r.top_bigram == ""


def _graph(nodes, edges):
    nds = ray.data.from_pandas(
        pd.DataFrame({"entity_name": nodes})
    ).repartition(2)
    eds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src_id", "tgt_id"])
    ).repartition(2)
    return nds, eds


def test_min_label_rounds_bounded_propagation():
    # path a-b-c-d-e: after 2 rounds, 'a' reaches c (2 hops) but not e
    nodes, edges = _graph(
        ["a", "b", "c", "d", "e"],
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
    )
    out = min_label_rounds(nodes, edges, rounds=2).to_pandas()
    got = dict(zip(out.node, out.label))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "b", "e": "c"}
    # 4 rounds >= diameter: full component collapse
    out4 = min_label_rounds(nodes, edges, rounds=4).to_pandas()
    assert set(out4.label) == {"a"}


def test_min_label_rounds_isolated_node():
    nodes, edges = _graph(["x", "y", "z"], [("y", "z")])
    out = min_label_rounds(nodes, edges, rounds=3).to_pandas()
    got = dict(zip(out.node, out.label))
    assert got == {"x": "x", "y": "y", "z": "y"}


def test_triangle_counts_basic():
    # triangle a-b-c plus a pendant edge c-d; one shared-edge second
    # triangle b-c-e => b,c in 2 triangles, a,e in 1, d in none
    nodes, edges = _graph(
        ["a", "b", "c", "d", "e"],
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("b", "e"), ("c", "e")],
    )
    out = triangle_counts(nodes, edges).to_pandas()
    got = dict(zip(out.node, out.n_triangles))
    assert got == {"a": 1, "b": 2, "c": 2, "e": 1}


def test_triangle_counts_hub_star_has_none():
    # star graph: hub connected to 6 leaves, no triangles; degree
    # orientation points every edge leaf -> hub, so wedge enumeration at
    # the hub is empty (out-degree 0) — the hub-safety property
    leaves = [f"l{i}" for i in range(6)]
    nodes, edges = _graph(["hub"] + leaves, [(l, "hub") for l in leaves])
    out = triangle_counts(nodes, edges).to_pandas()
    assert len(out) == 0


def test_triangle_counts_clique4():
    # K4 has 4 triangles; every node participates in C(3,2)=3
    ns = ["a", "b", "c", "d"]
    edges = [(u, v) for i, u in enumerate(ns) for v in ns[i + 1:]]
    nodes, eds = _graph(ns, edges)
    out = triangle_counts(nodes, eds).to_pandas()
    got = dict(zip(out.node, out.n_triangles))
    assert got == {n: 3 for n in ns}

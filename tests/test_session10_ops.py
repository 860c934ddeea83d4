"""Edge-case unit tests for the session-10 operators (the oracle gate
covers corpus-scale parity; these pin the corner semantics)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

TOY = "/tmp/raykg_s10_toy"


def _write(table: dict, name: str) -> str:
    os.makedirs(TOY, exist_ok=True)
    pq.write_table(pa.table(table), os.path.join(TOY, f"{name}.parquet"))
    return TOY


def test_typed_wedge_census_toy_star():
    from mmgraphrag_ray.stages.graphalgo import typed_wedge_census

    nodes = ray.data.from_pandas(pd.DataFrame({
        "entity_name": ["X", "A1", "A2", "B1"],
        "entity_type": ["X", "A", "A", "B"],
    }))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["X", "X", "X"],
        "tgt_id": ["A1", "A2", "B1"],
    }))
    out = typed_wedge_census(nodes, edges).to_pandas()
    got = {
        (r.center_type, r.type_a, r.type_b): r.n_wedges
        for r in out.itertuples()
    }
    # center X: neighbors {A:2, B:1} -> (A,A)=C(2,2)=1, (A,B)=2*1=2;
    # leaf centers have 1 neighbor each -> no wedges
    assert got == {("X", "A", "A"): 1, ("X", "A", "B"): 2}


def test_k_hop_path_counts_diamond():
    from mmgraphrag_ray.stages.graphalgo import k_hop_path_counts

    seeds = ray.data.from_pandas(pd.DataFrame({"entity_name": ["s"]}))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["s", "s", "a", "b"],
        "tgt_id": ["a", "b", "t", "t"],
    }))
    out = k_hop_path_counts(seeds, edges, k=2).to_pandas()
    sig = dict(zip(out["entity_name"], zip(out["hop"], out["sigma"])))
    assert sig["s"] == (0, 1)
    assert sig["a"] == (1, 1) and sig["b"] == (1, 1)
    assert sig["t"] == (2, 2)  # two shortest paths s-a-t / s-b-t


def test_dependency_depth_chain():
    from mmgraphrag_ray.stages.codegraph import dependency_depth

    files = ray.data.from_pandas(pd.DataFrame({
        "content": [
            "# module: a\nimport b\n",
            "# module: b\nimport c\n",
            "# module: c\n",  # no imports -> depth 0 (absent from edges)
        ],
    }))
    out = dependency_depth(files, rounds=4).to_pandas()
    depth = dict(zip(out["module"], out["depth"]))
    assert depth == {"a": 2, "b": 1, "c": 0}


def test_mmr_returns_all_when_fewer_than_k():
    from mmgraphrag_ray.stages.retrieval import mmr_topk

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta", "alpha gamma"],
    }))
    out = mmr_topk(docs, {"q": "alpha"}, k=5, n_candidates=20).to_pandas()
    assert sorted(out["mmr_rank"]) == [1, 2]
    assert set(out["doc_id"]) == {1, 2}


def test_events_user_span_single_event_user():
    from mmgraphrag_ray.pipelines.relational import events_user_span

    d = _write({
        "user_id": pa.array([7, 7, 9], pa.int64()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                            "2024-01-02 12:00:00"]).astype("datetime64[us]"),
            pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "c"], pa.string()),
    }, "events")
    out = events_user_span(TOY).to_pandas().set_index("user_id")
    assert out.loc[9, "span_us"] == 0
    assert out.loc[9, "first_type"] == out.loc[9, "last_type"] == "c"
    assert out.loc[7, "first_type"] == "a"
    assert out.loc[7, "last_type"] == "b"
    assert out.loc[7, "span_us"] == 3_600_000_000


def test_vocab_setops_verdicts():
    from mmgraphrag_ray.stages.textstats import vocab_setops

    docs = ray.data.from_pandas(pd.DataFrame({
        "source": ["s1", "s2", "s3"],
        "text": ["cat dog", "dog emu", "ignored words"],
    }))
    out = vocab_setops(docs, source_a="s1", source_b="s2").to_pandas()
    got = dict(zip(out["token"], out["status"]))
    assert got == {"cat": "a_only", "dog": "both", "emu": "b_only"}


def test_matryoshka_zero_vector_retention():
    from mmgraphrag_ray.stages.vecstats import matryoshka_error

    emb = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [[0.0] * 16, [1.0] * 16],
    }))
    out = matryoshka_error(emb, prefixes=(8,)).to_pandas().set_index("vec_id")
    assert out.loc[0, "retain_ppm"] == 0  # zero vector -> guarded division
    assert out.loc[1, "retain_ppm"] == 500_000  # half the energy in 8/16

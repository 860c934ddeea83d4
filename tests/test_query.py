"""Retrieval path (local query context) + GraphML round-trip."""

import os

import pandas as pd
import pytest
import ray.data

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.graphml import graphml_to_tables, tables_to_graphml
from mmgraphrag_ray.query import QueryParam, build_local_context, entity_topk, node_degrees
from mmgraphrag_ray.stages.embed import build_entity_vecs
from mmgraphrag_ray.textutils import list_of_list_to_csv, truncate_list_by_token_size


@pytest.fixture(scope="module")
def graph_tables():
    nodes = pd.DataFrame(
        {
            "entity_name": ['"PARSE_CONFIG"', '"LOAD_JSON"', '"ZEBRA"'],
            "entity_type": ['"FUNCTION"', '"FUNCTION"', '"ANIMAL"'],
            "description": [
                '"Function parse_config reads configuration."',
                '"Function load_json loads json files."',
                '"A striped animal."',
            ],
            "source_id": [f"chunk-aa{SEP}chunk-bb", "chunk-bb", "chunk-cc"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"LOAD_JSON"'],
            "tgt_id": ['"PARSE_CONFIG"'],
            "weight": [8.0],
            "description": ['"parse_config calls load_json."'],
            "source_id": ["chunk-bb"],
            "order": [1],
        }
    )
    chunks = pd.DataFrame(
        {
            "chunk_id": ["chunk-aa", "chunk-bb", "chunk-cc"],
            "content": ["config parsing code", "json loading code", "zebra text"],
        }
    )
    return (
        ray.data.from_pandas(nodes),
        ray.data.from_pandas(edges),
        ray.data.from_pandas(chunks),
    )


def test_entity_topk_threshold_and_order(graph_tables):
    nodes, edges, chunks = graph_tables
    vecs = build_entity_vecs(nodes).materialize()
    top = entity_topk(vecs, "parse the configuration function", QueryParam(top_k=2))
    assert list(top["entity_name"])[0] == '"PARSE_CONFIG"'
    assert (top["distance"] >= 0.2).all()


def test_node_degrees(graph_tables):
    _, edges, _ = graph_tables
    deg = node_degrees(edges).to_pandas()
    d = dict(zip(deg["entity_name"], deg["degree"]))
    assert d == {'"LOAD_JSON"': 1, '"PARSE_CONFIG"': 1}


def test_build_local_context(graph_tables):
    nodes, edges, chunks = graph_tables
    vecs = build_entity_vecs(nodes).materialize()
    ctx = build_local_context(
        "parse the configuration function", nodes, edges, chunks, vecs
    )
    assert '"PARSE_CONFIG"' in ctx["entities_csv"]
    assert "parse_config calls load_json." in ctx["relations_csv"]
    # retrieved nodes' chunks surface as text units
    assert "config parsing code" in ctx["text_units_csv"]
    # csv formatter: header row + quoting
    assert ctx["entities_csv"].splitlines()[0].startswith('"id",\t"entity"')


def test_truncate_list_by_token_size():
    items = ["a b c", "d e f", "g h i"]
    out = truncate_list_by_token_size(items, key=lambda x: x, max_token_size=7)
    assert out == ["a b c", "d e f"]  # 3 + 3 tokens fit; 9 > 7
    assert truncate_list_by_token_size(items, key=lambda x: x, max_token_size=0) == []


def test_list_of_list_to_csv_quoting():
    out = list_of_list_to_csv([["id", "x"], [0, '"QUOTED"']])
    assert out == '"id",\t"x"\n0,\t"QUOTED"'


def test_graphml_roundtrip(tmp_path, graph_tables):
    nodes, edges, _ = graph_tables
    nd, ed = nodes.to_pandas(), edges.to_pandas()
    path = os.path.join(tmp_path, "g.graphml")
    tables_to_graphml(nd, ed, path)
    nd2, ed2 = graphml_to_tables(path)
    assert sorted(nd2.entity_name) == sorted(nd.entity_name)
    pd.testing.assert_frame_equal(
        ed.sort_values(["src_id", "tgt_id"]).reset_index(drop=True), ed2
    )


def test_remap_source_ids_j3():
    """J3: non-chunk source segments remap to chunk ids, mapped+unmapped
    dedup as a set (reference query.py:44-61 img_path2chunk_id)."""
    from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
    from mmgraphrag_ray.query import remap_source_ids

    remap = {"media-1": "chunk-aaa", "media-2": "chunk-bbb"}
    src = SEP.join(["chunk-aaa", "media-1", "media-2", "media-unmapped"])
    out = remap_source_ids(src, remap)
    # media-1 collapses into the already-present chunk-aaa (set semantics)
    assert out == SEP.join(sorted({"chunk-aaa", "chunk-bbb", "media-unmapped"}))


def test_audit_sidecar_written(ray_session, tmp_path):
    """S9: build_local_context persists the context as a parquet sidecar."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from mmgraphrag_ray.pipelines.kg import build_chunks, build_graph
    from mmgraphrag_ray.corpus import ensure_corpus
    from mmgraphrag_ray.query import build_local_context
    from mmgraphrag_ray.stages.embed import build_entity_vecs

    corpus = ensure_corpus("/root/testdata/sf0.001")
    nodes, edges = build_graph(corpus)
    nodes, edges = nodes.materialize(), edges.materialize()
    chunks = build_chunks(corpus).materialize()
    vecs = build_entity_vecs(nodes).materialize()
    audit = str(tmp_path / "audit")
    q = "which module defines the shared helpers"
    ctx = build_local_context(q, nodes, edges, chunks, vecs, audit_dir=audit)
    t = pq.read_table(audit)
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["query"] == q
    assert row["entities_csv"] == ctx["entities_csv"]
    # idempotent: same query+context -> same part file, still one row
    build_local_context(q, nodes, edges, chunks, vecs, audit_dir=audit)
    assert pq.read_table(audit).num_rows == 1


def test_multimodal_answer_merge():
    """ORI_IMG answer path (reference query.py:414-469): entity selection in
    retrieval order, media KV lookup with missing-entity skip, cap at
    number_of_mmentities, base64 payload encode, deterministic merge."""
    import base64

    from mmgraphrag_ray.query import multimodal_answer_merge

    entities = pd.DataFrame(
        {
            "entity_name": ['"IMG_B"', '"FN_X"', '"IMG_A"', '"IMG_GONE"', '"IMG_C"'],
            "entity_type": ['"ORI_IMG"', '"FUNCTION"', '"ORI_IMG"', '"ORI_IMG"', '"ORI_IMG"'],
        }
    )
    ctx = {"entities": entities, "entities_csv": "CSVCTX"}
    media = ray.data.from_pandas(
        pd.DataFrame(
            {
                "entity_name": ["img_a", "img_b", "img_c", "img_z"],
                "payload": [b"A-bytes", b"B-bytes", b"C-bytes", b"Z-bytes"],
                "caption": ["cap a", "cap b", "cap c", "cap z"],
                "footnote": ["fn a", "fn b", "fn c", "fn z"],
            }
        )
    )
    calls = []

    def mm_fn(q, payload_b64, information, context):
        calls.append((q, base64.b64decode(payload_b64), information, context))
        return f"mm:{information}"

    out = multimodal_answer_merge(
        "the query", ctx, media, answer_fn=lambda q, c: f"text:{q}|{c}", mm_answer_fn=mm_fn
    )
    # retrieval order (B, A, GONE, C), GONE skipped, cap=3 applied BEFORE the
    # lookup (reference slices first: B, A, GONE -> B, A survive)
    assert out["mm_entities"] == ["img_b", "img_a"]
    assert out["mm_responses"] == ["mm:cap b, fn b", "mm:cap a, fn a"]
    assert calls[0][1] == b"B-bytes" and calls[1][1] == b"A-bytes"
    assert calls[0][3] == "CSVCTX"
    assert out["answer"] == "text:the query|CSVCTX\nmm:cap b, fn b\nmm:cap a, fn a"

    # no ORI_IMG entities -> text answer only (reference query.py:422-423)
    out2 = multimodal_answer_merge(
        "q2",
        {"entities": entities[entities.entity_type == '"FUNCTION"'], "entities_csv": ""},
        media,
        answer_fn=lambda q, c: "plain",
        mm_answer_fn=mm_fn,
    )
    assert out2 == {"answer": "plain", "mm_responses": [], "mm_entities": []}

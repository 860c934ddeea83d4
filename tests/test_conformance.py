"""End-to-end triple P/R >= 0.95 vs reference semantics (FIXTURES.md F7).

The reference's LLM seam is injectable (model_func mmgraphrag.py:58,
text_entity_extraction_func text2graph.py:466-468).  This test re-implements
the reference's single-process extraction+merge semantics from the SURVEY
spec (NOT imported/copied from /root/reference — it needs tiktoken/asyncio
plumbing that doesn't run here), drives it with the SAME deterministic
extractor wire output, and compares (subj, pred-description-set, obj) triples
and node sets against the Ray pipeline.  Gate: P and R >= 0.95 (expected 1.0).
"""

from collections import Counter, defaultdict

import ray

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.config import KGConfig
from mmgraphrag_ray.corpus import ensure_corpus
from mmgraphrag_ray.pipelines.kg import build_graph
from mmgraphrag_ray.stages.chunk import make_chunker
from mmgraphrag_ray.stages.extract import parse_wire, render_wire
from mmgraphrag_ray.stages.merge import summarize_description
from mmgraphrag_ray.textutils import md5_hex, sha256_hex

CFG = KGConfig()


def reference_semantics(files_rows):
    """Single-process mirror of the reference index() path:
    dedup docs by md5 (preprocessing.py:107-118) -> chunk (:126-150) ->
    extract per chunk -> accumulate (text2graph.py:375-443) ->
    merge nodes then edges (:140-279)."""
    # exact dedup, deterministic survivor (min repo/path/commit)
    by_hash = {}
    for row in sorted(files_rows, key=lambda r: (r["repo"], r["path"], r["commit"])):
        by_hash.setdefault(md5_hex(row["content"]), row)

    chunker = make_chunker_py(CFG.chunk_token_size, CFG.chunk_overlap_token_size)
    # chunk-level dedup by chunk_id (kv store keyed by id)
    chunks = {}
    for row in by_hash.values():
        for ch in chunker(row["content"]):
            chunks["chunk-" + md5_hex(ch)] = ch

    maybe_nodes = defaultdict(list)
    maybe_edges = defaultdict(list)
    for chunk_key, content in chunks.items():
        ents, rels = parse_wire(render_wire(content))
        for e in ents:
            e = dict(e, source_id=chunk_key)
            maybe_nodes[e["entity_name"]].append(e)
        for r in rels:
            r = dict(r, source_id=chunk_key)
            maybe_edges[(r["src_id"], r["tgt_id"])].append(r)

    nodes = {}
    for name, data in maybe_nodes.items():
        counts = Counter(d["entity_type"] for d in data)
        etype = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        desc = summarize_description(
            SEP.join(sorted({d["description"] for d in data})),
            CFG.entity_summary_to_max_tokens,
        )
        nodes[name] = {"entity_type": etype, "description": desc}

    edges = {}
    # process in sorted key order: the reference inserts a missing endpoint
    # from whichever incident edge its event loop handles first; both the
    # pipeline and this mirror deterministically use the smallest (src, tgt).
    for (src, tgt), data in sorted(maybe_edges.items()):
        desc_full = SEP.join(sorted({d["description"] for d in data}))
        for endpoint in (src, tgt):
            if endpoint not in nodes:
                nodes[endpoint] = {
                    "entity_type": '"UNKNOWN"',
                    "description": desc_full,
                }
        edges[(src, tgt)] = {
            "weight": sum(d["weight"] for d in data),
            "order": min(d["order"] for d in data),
            "description": summarize_description(
                desc_full, CFG.entity_summary_to_max_tokens
            ),
        }
    return nodes, edges


def make_chunker_py(size, overlap):
    from mmgraphrag_ray.tokenizer import encode

    def fn(content):
        toks = encode(content)
        return [
            "".join(toks[s : s + size]).strip()
            for s in range(0, len(toks), size - overlap)
        ]

    return fn


def _pr(ours: set, ref: set):
    if not ours or not ref:
        return 0.0, 0.0
    inter = len(ours & ref)
    return inter / len(ours), inter / len(ref)


def test_triple_pr_vs_reference_semantics():
    path = ensure_corpus("/root/testdata/sf0.001")
    import pyarrow.parquet as pq

    files_rows = pq.read_table(path).to_pylist()
    ref_nodes, ref_edges = reference_semantics(files_rows)

    nodes_ds, edges_ds = build_graph(path, CFG)
    nd = nodes_ds.to_pandas()
    ed = edges_ds.to_pandas()

    ours_nodes = set(zip(nd.entity_name, nd.entity_type, nd.description))
    ref_nodes_set = {
        (k, v["entity_type"], v["description"]) for k, v in ref_nodes.items()
    }
    p, r = _pr(ours_nodes, ref_nodes_set)
    assert p >= 0.95 and r >= 0.95, (p, r)

    ours_edges = set(zip(ed.src_id, ed.tgt_id, ed.description, ed.weight, ed["order"]))
    ref_edges_set = {
        (s, t, v["description"], v["weight"], v["order"])
        for (s, t), v in ref_edges.items()
    }
    p, r = _pr(ours_edges, ref_edges_set)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_sha256_lineage_preserved():
    """north_rule per-row invariant: every chunk carries the sha256 of its
    source file content, equal to recomputing it from the input."""
    path = ensure_corpus("/root/testdata/sf0.001")
    import pyarrow.parquet as pq

    from mmgraphrag_ray.pipelines.kg import build_chunks

    truth = {
        sha256_hex(r["content"])
        for r in pq.read_table(path).to_pylist()
    }
    chunks = build_chunks(path, CFG).to_pandas()
    assert set(chunks.content_sha256) <= truth
    assert chunks.content_sha256.notna().all()

"""End-to-end SEAM COMPOSITION gate (round-2 verdict item 3): one fixture
run chained through ALL THREE model seams at once —

    gleaning (WireExtractor, >=1 glean round producing extra mentions;
              reference text2graph.py:329-369)
 -> judge alignment (cluster_entities + build_alias_table, the F5 judge;
              reference fusion.py:520-543)
 -> F6 enhancement + contraction (enhance_unaligned_entities;
              reference fusion.py:636-727, chained like fusion.py:1000-1022)

compared against a single-process mirror of the reference semantics
extended with the SAME deterministic seams (NOT imported from
/root/reference — re-implemented from the SURVEY spec like
test_conformance.py).  Gate: node-triple and edge-tuple P = R = 1.0.

Seam contracts the mirror relies on (each pinned individually elsewhere):
- glean rounds accumulate parsed records per chunk (extract.py seam tests);
- same-partition entities with IDENTICAL descriptions co-cluster and pass
  the >=0.9 judge, canonical = lexicographically smallest member
  (linking.py build_alias_table docstring);
- contraction re-merges with the A2/A3 algebra: desc/source sorted
  <SEP>-sets, weight sum, order min, type mode (linking.py contract_graph).
"""

from collections import Counter, defaultdict

import pandas as pd
import pyarrow as pa
import ray.data

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.config import KGConfig
from mmgraphrag_ray.stages.extract import (
    COMPLETION_DELIM,
    RECORD_DELIM,
    TUPLE_DELIM,
    WireExtractor,
    parse_wire,
)
from mmgraphrag_ray.stages.merge import summarize_description

CFG = KGConfig()

D_ALPHA = '"Service alpha core."'
D_OTHER = '"A completely different widget for parsing yaml files."'
D_GLEAN = '"Helper discovered on the second pass."'
D_ENH = '"Enhanced: unresolved reference."'


def _ent(name, etype, desc):
    return f'("entity"{TUPLE_DELIM}{name}{TUPLE_DELIM}{etype}{TUPLE_DELIM}{desc})'


def _rel(src, tgt, desc, w):
    return (f'("relationship"{TUPLE_DELIM}{src}{TUPLE_DELIM}{tgt}'
            f'{TUPLE_DELIM}{desc}{TUPLE_DELIM}{w})')


def _wire(records):
    return (RECORD_DELIM + "\n").join(records) + RECORD_DELIM + "\n" + COMPLETION_DELIM


WIRE_C1 = _wire([
    _ent('"SVC_ALPHA"', '"MODULE"', D_ALPHA),
    _ent('"SVC_ALPHA_V2"', '"MODULE"', D_ALPHA),          # identical desc -> alias
    _ent('"OTHER_THING"', '"CLASS"', D_OTHER),
    _rel('"OTHER_THING"', '"SVC_ALPHA"', '"Other uses alpha."', 2.0),
    _rel('"OTHER_THING"', '"SVC_ALPHA_V2"', '"Other uses alpha v2."', 3.0),
])
WIRE_C1_GLEAN = _wire([
    _ent('"GLEANED_HELPER"', '"UNKNOWN"', D_GLEAN),
    _rel('"GLEANED_HELPER"', '"SVC_ALPHA"', '"Helper helps alpha."', 1.0),
])
WIRE_C2 = _wire([
    _ent('"SVC_ALPHA"', '"MODULE"', D_ALPHA),
    # no entity record for ZZ_CALLEE -> exercises UNKNOWN backfill
    _rel('"SVC_ALPHA"', '"ZZ_CALLEE"', '"Alpha calls zz."', 2.0),
])


def make_model_fn():
    # defined via a factory so the test can build a closure INSIDE the test
    # body too (Ray workers cannot import this test module by name, so any
    # callable shipped to them must be serialized by value)
    wire_c1, wire_c1_glean, wire_c2 = WIRE_C1, WIRE_C1_GLEAN, WIRE_C2
    completion = COMPLETION_DELIM

    def model_fn(content, history):
        if not history:  # extraction round
            return wire_c1 if "C1" in content else wire_c2
        if "C1" in content:  # glean round adds records for chunk 1 only
            return wire_c1_glean
        return completion

    return model_fn


def make_enhancer():
    d_enh = D_ENH

    def enhancer(name, desc):
        return name[:-1] + '_R"', d_enh

    return enhancer


def _chunks_table():
    rows = [("chunk-c1", "C1 body"), ("chunk-c2", "C2 body")]
    return pa.table({
        "chunk_id": pa.array([r[0] for r in rows], pa.string()),
        "content": pa.array([r[1] for r in rows], pa.string()),
        "doc_id": pa.array(["d1", "d1"], pa.string()),
        "repo": pa.array(["r1", "r1"], pa.string()),
        "path": pa.array(["a.py", "b.py"], pa.string()),
        "content_sha256": pa.array(["s1", "s2"], pa.string()),
        "chunk_order_index": pa.array([0, 1], pa.int32()),
    })


# ---------------------------------------------------------------- mirror


def _type_mode(types):
    counts = Counter(types)
    return sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]


def _joinset(vals):
    return SEP.join(sorted(set(vals)))


def mirror(model_fn, enhancer):
    """Single-process reference-semantics run with the same three seams."""
    gate = CFG.entity_summary_to_max_tokens
    maybe_nodes = defaultdict(list)
    maybe_edges = defaultdict(list)
    for chunk_id, content in (("chunk-c1", "C1 body"), ("chunk-c2", "C2 body")):
        ents, rels = parse_wire(model_fn(content, []))
        e2, r2 = parse_wire(model_fn(content, [("extract", "…")]))
        for e in ents + e2:
            maybe_nodes[e["entity_name"]].append(e)
        for r in rels + r2:
            maybe_edges[(r["src_id"], r["tgt_id"])].append(r)

    nodes, edges = {}, {}
    for name, data in maybe_nodes.items():
        nodes[name] = {
            "entity_type": _type_mode(d["entity_type"] for d in data),
            "description": summarize_description(
                _joinset(d["description"] for d in data), gate),
        }
    for (src, tgt), data in sorted(maybe_edges.items()):
        desc_full = _joinset(d["description"] for d in data)
        for endpoint in (src, tgt):
            if endpoint not in nodes:
                nodes[endpoint] = {"entity_type": '"UNKNOWN"',
                                   "description": desc_full}
        edges[(src, tgt)] = {
            "weight": sum(d["weight"] for d in data),
            "order": 1,
            "description": summarize_description(desc_full, gate),
        }

    def contract(alias):
        new_nodes = defaultdict(list)
        for name, v in nodes.items():
            new_nodes[alias.get(name, name)].append(v)
        out_nodes = {
            name: {
                "entity_type": _type_mode(m["entity_type"] for m in members),
                "description": summarize_description(_joinset(
                    p for m in members
                    for p in m["description"].split(SEP)), gate),
            }
            for name, members in new_nodes.items()
        }
        new_edges = defaultdict(list)
        for (src, tgt), v in edges.items():
            s, t = alias.get(src, src), alias.get(tgt, tgt)
            new_edges[(min(s, t), max(s, t))].append(v)
        out_edges = {
            k: {
                "weight": sum(m["weight"] for m in members),
                "order": min(m["order"] for m in members),
                "description": summarize_description(_joinset(
                    p for m in members
                    for p in m["description"].split(SEP)), gate),
            }
            for k, members in new_edges.items()
        }
        return out_nodes, out_edges

    # judge: same-partition (single repo here) identical-description
    # entities align to the lexicographically smallest member
    by_desc = defaultdict(list)
    for name, v in nodes.items():
        by_desc[v["description"]].append(name)
    alias = {}
    for names in by_desc.values():
        if len(names) > 1:
            canon = min(names)
            for n in sorted(names)[1:]:
                alias[n] = canon
    nodes, edges = contract(alias)

    # F6: rename+redescribe unaligned UNKNOWN nodes, then contract again
    aligned = set(alias) | set(alias.values())
    rewrites = {}
    for name, v in sorted(nodes.items()):
        if v["entity_type"] == '"UNKNOWN"' and name not in aligned:
            new_name, new_desc = enhancer(name, v["description"])
            rewrites[name] = new_name
            v["description"] = new_desc
    nodes, edges = contract(rewrites)
    return nodes, edges, alias, rewrites


def test_glean_judge_enhance_contract_composition(ray_session):
    from mmgraphrag_ray.pipelines.kg import finalize_edges
    from mmgraphrag_ray.stages.linking import (
        canonicalize_graph,
        enhance_unaligned_entities,
    )
    from mmgraphrag_ray.stages.merge import backfill_unknown_nodes, merge_graph

    model_fn, enhancer = make_model_fn(), make_enhancer()
    chunks = ray.data.from_arrow(_chunks_table())
    mentions = chunks.map_batches(
        WireExtractor(model_fn=model_fn, max_gleaning=1),
        batch_format="pyarrow",
    ).materialize()

    nodes, edges = merge_graph(cfg=CFG, mentions_ds=mentions)
    nodes = backfill_unknown_nodes(nodes, edges)
    edges = finalize_edges(edges)

    ent_mentions = mentions.filter(expr="kind == 'entity'").materialize()
    cnodes, cedges, alias_ds, _clusters = canonicalize_graph(
        nodes, edges, ent_mentions, CFG
    )
    fnodes, fedges, rewrites_ds = enhance_unaligned_entities(
        cnodes, cedges, alias_ds, enhancer
    )

    nd, ed = fnodes.to_pandas(), fedges.to_pandas()
    alias_df = alias_ds.to_pandas()
    rw_df = rewrites_ds.to_pandas()

    exp_nodes, exp_edges, exp_alias, exp_rewrites = mirror(model_fn, enhancer)

    # seam-by-seam sanity: glean contributed, judge aligned exactly the
    # identical-description pair, F6 rewrote exactly the unaligned UNKNOWNs
    assert exp_alias == {'"SVC_ALPHA_V2"': '"SVC_ALPHA"'}
    assert dict(zip(alias_df.member_name, alias_df.canonical_name)) == exp_alias
    assert exp_rewrites == {'"GLEANED_HELPER"': '"GLEANED_HELPER_R"',
                            '"ZZ_CALLEE"': '"ZZ_CALLEE_R"'}
    assert dict(zip(rw_df.member_name, rw_df.canonical_name)) == exp_rewrites

    ours_nodes = set(zip(nd.entity_name, nd.entity_type, nd.description))
    ref_nodes = {(k, v["entity_type"], v["description"])
                 for k, v in exp_nodes.items()}
    assert ours_nodes == ref_nodes  # P = R = 1.0

    ours_edges = set(zip(ed.src_id, ed.tgt_id, ed.description,
                         ed.weight, ed["order"]))
    ref_edges = {(s, t, v["description"], v["weight"], v["order"])
                 for (s, t), v in exp_edges.items()}
    assert ours_edges == ref_edges  # P = R = 1.0

    # the gleaned entity exists ONLY via the glean round and must survive
    # the whole chain under its enhanced name
    assert '"GLEANED_HELPER_R"' in set(nd.entity_name)

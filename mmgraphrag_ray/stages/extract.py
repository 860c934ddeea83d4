"""Deterministic code-aware triple extraction — the LLM stand-in stage.

The reference extracts entities/relationships per chunk with an LLM behind an
injectable seam (`model_func` mmgraphrag.py:58, `text_entity_extraction_func`
text2graph.py:466-468), emitting the record wire format of prompt.py:189-192:

    ("entity"<|>"NAME"<|>"TYPE"<|>"description")##
    ("relationship"<|>"SRC"<|>"TGT"<|>"description"<|>WEIGHT)##
    <|COMPLETE|>

This module plugs a deterministic, regex-based code extractor into that seam:
it renders the SAME wire format from source code and then parses it with the
SAME grammar the reference uses (split on record/completion delimiters,
``\\((.*)\\)`` per record, split on ``<|>``, validators at text2graph.py:34-71
and :118-138, clean_str+upper normalization, float-regex weight with 1.0
fallback, undirected edge canonicalization text2graph.py:441-443).  Because
both render and parse live here, tests can drive the parser with adversarial
wire strings (FIXTURES.md F3) independently of the renderer.

Extraction rules over chunk content (corpus grammar, corpus.py):
  module   := first ``# module: X``        -> entity (MODULE)
  import X                                  -> entity (MODULE) + rel module->X  (w=7.0, "imports")
  class C                                   -> entity (CLASS)  + rel module->C  (w=9.0, "defines class")
  def f(                                    -> entity (FUNCTION) + rel module->f (w=9.0, "defines function")
  lhs = g(...)                              -> rel module->g (w=2.0, "calls"); NO entity record,
                                               so never-defined callees exercise the reference's
                                               UNKNOWN-endpoint backfill (text2graph.py:258-268).
A chunk with no module marker yields no records (deterministic, mirrored by
the SQL oracle).  Runs as an actor pool: regexes compile once per actor.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..textutils import clean_str, is_float_str, split_by_markers

TUPLE_DELIM = "<|>"
RECORD_DELIM = "##"
COMPLETION_DELIM = "<|COMPLETE|>"

# lineage columns carried from chunks into mentions
LINEAGE_COLS = ["doc_id", "repo", "path", "content_sha256", "chunk_order_index"]

_MODULE_RE = re.compile(r"# module: ([A-Za-z_][A-Za-z0-9_.]*)")
_IMPORT_RE = re.compile(r"(?m)^import +([A-Za-z_][A-Za-z0-9_.]*)")
_CLASS_RE = re.compile(r"(?m)^ *class +([A-Za-z_][A-Za-z0-9_]*)")
_DEF_RE = re.compile(r"(?m)^ *def +([A-Za-z_][A-Za-z0-9_]*) *\(")
_CALL_RE = re.compile(r"= *([A-Za-z_][A-Za-z0-9_]*)\(")
_RECORD_RE = re.compile(r"\((.*)\)")


def _q(s: str) -> str:
    return f'"{s}"'


def render_wire(content: str) -> str:
    """Chunk content -> extraction output in the reference wire format."""
    m = _MODULE_RE.search(content)
    if m is None:
        return COMPLETION_DELIM
    module = m.group(1)
    mod_u = _q(module.upper())
    recs: list[str] = [
        f'("entity"{TUPLE_DELIM}{mod_u}{TUPLE_DELIM}"MODULE"{TUPLE_DELIM}"Module {module}.")'
    ]
    for imp in _IMPORT_RE.findall(content):
        recs.append(
            f'("entity"{TUPLE_DELIM}{_q(imp.upper())}{TUPLE_DELIM}"MODULE"{TUPLE_DELIM}"Module {imp}.")'
        )
        recs.append(
            f'("relationship"{TUPLE_DELIM}{mod_u}{TUPLE_DELIM}{_q(imp.upper())}{TUPLE_DELIM}'
            f'"Module {module} imports {imp}."{TUPLE_DELIM}7.0)'
        )
    for cls in _CLASS_RE.findall(content):
        recs.append(
            f'("entity"{TUPLE_DELIM}{_q(cls.upper())}{TUPLE_DELIM}"CLASS"{TUPLE_DELIM}'
            f'"Class {cls} in module {module}.")'
        )
        recs.append(
            f'("relationship"{TUPLE_DELIM}{mod_u}{TUPLE_DELIM}{_q(cls.upper())}{TUPLE_DELIM}'
            f'"Module {module} defines class {cls}."{TUPLE_DELIM}9.0)'
        )
    for fn in _DEF_RE.findall(content):
        recs.append(
            f'("entity"{TUPLE_DELIM}{_q(fn.upper())}{TUPLE_DELIM}"FUNCTION"{TUPLE_DELIM}'
            f'"Function {fn} in module {module}.")'
        )
        recs.append(
            f'("relationship"{TUPLE_DELIM}{mod_u}{TUPLE_DELIM}{_q(fn.upper())}{TUPLE_DELIM}'
            f'"Module {module} defines function {fn}."{TUPLE_DELIM}9.0)'
        )
    for callee in _CALL_RE.findall(content):
        recs.append(
            f'("relationship"{TUPLE_DELIM}{mod_u}{TUPLE_DELIM}{_q(callee.upper())}{TUPLE_DELIM}'
            f'"Module {module} calls {callee}."{TUPLE_DELIM}2.0)'
        )
    return (RECORD_DELIM + "\n").join(recs) + RECORD_DELIM + "\n" + COMPLETION_DELIM


def parse_entity_record(attrs: list[str]) -> dict | None:
    """Reference text2graph.py:34-71: >=4 fields, attrs[0]=='"entity"',
    name/type clean_str(upper), drop blank names."""
    if len(attrs) < 4 or attrs[0] != '"entity"':
        return None
    name = clean_str(attrs[1].upper())
    if not name.strip():
        return None
    return {
        "entity_name": name,
        "entity_type": clean_str(attrs[2].upper()),
        "description": clean_str(attrs[3]),
    }


def parse_relationship_record(attrs: list[str]) -> dict | None:
    """Reference text2graph.py:118-138: >=5 fields, attrs[0]=='"relationship"',
    weight=float(last) if float-like else 1.0."""
    if len(attrs) < 5 or attrs[0] != '"relationship"':
        return None
    return {
        "src_id": clean_str(attrs[1].upper()),
        "tgt_id": clean_str(attrs[2].upper()),
        "description": clean_str(attrs[3]),
        "weight": float(attrs[-1]) if is_float_str(attrs[-1]) else 1.0,
    }


def parse_wire(wire: str) -> tuple[list[dict], list[dict]]:
    """Wire text -> (entity mentions, relationship mentions).

    Grammar per reference text2graph.py:370-412; relationship endpoints are
    canonicalized to the undirected sorted pair (text2graph.py:441-443)."""
    entities: list[dict] = []
    rels: list[dict] = []
    for record in split_by_markers(wire, [RECORD_DELIM, COMPLETION_DELIM]):
        m = _RECORD_RE.search(record)
        if m is None:
            continue
        attrs = split_by_markers(m.group(1), [TUPLE_DELIM])
        ent = parse_entity_record(attrs)
        if ent is not None:
            entities.append(ent)
            continue
        rel = parse_relationship_record(attrs)
        if rel is not None:
            src, tgt = sorted((rel["src_id"], rel["tgt_id"]))
            rel["src_id"], rel["tgt_id"] = src, tgt
            rel["order"] = 1
            rels.append(rel)
    return entities, rels


class CodeExtractor:
    """Actor-pool extraction stage: chunks -> unified mention rows.

    Output has kind='entity' or 'rel' plus the superset of mention columns;
    split downstream with `split_mentions`.  State (compiled regexes via the
    module) is per-actor; __call__ is per batch (T1/T3 pattern, SURVEY §2.3).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_mentions_table(LINEAGE_COLS)
        contents = batch.column("content").to_pylist()
        chunk_ids = batch.column("chunk_id").to_pylist()
        lineage = {c: batch.column(c).to_pylist() for c in LINEAGE_COLS if c in batch.column_names}
        out = {
            "kind": [],
            "entity_name": [],
            "entity_type": [],
            "src_id": [],
            "tgt_id": [],
            "weight": [],
            "order": [],
            "description": [],
            "source_id": [],
            **{c: [] for c in lineage},
        }

        def _push(kind, row, chunk_key, row_idx):
            out["kind"].append(kind)
            out["entity_name"].append(row.get("entity_name"))
            out["entity_type"].append(row.get("entity_type"))
            out["src_id"].append(row.get("src_id"))
            out["tgt_id"].append(row.get("tgt_id"))
            out["weight"].append(row.get("weight"))
            out["order"].append(row.get("order"))
            out["description"].append(row["description"])
            out["source_id"].append(chunk_key)
            for c in lineage:
                out[c].append(lineage[c][row_idx])

        for i, content in enumerate(contents):
            ents, rels = parse_wire(render_wire(content))
            for e in ents:
                _push("entity", e, chunk_ids[i], i)
            for r in rels:
                _push("rel", r, chunk_ids[i], i)

        return pa.table(
            {
                "kind": pa.array(out["kind"], pa.string()),
                "entity_name": pa.array(out["entity_name"], pa.string()),
                "entity_type": pa.array(out["entity_type"], pa.string()),
                "src_id": pa.array(out["src_id"], pa.string()),
                "tgt_id": pa.array(out["tgt_id"], pa.string()),
                "weight": pa.array(out["weight"], pa.float64()),
                "order": pa.array(out["order"], pa.int32()),
                "description": pa.array(out["description"], pa.large_string()),
                "source_id": pa.array(out["source_id"], pa.string()),
                **{
                    c: pa.array(out[c], pa.int32() if c == "chunk_order_index" else pa.string())
                    for c in lineage
                },
            }
        )


def _empty_mentions_table(lineage_cols) -> pa.Table:
    return pa.table(
        {
            "kind": pa.array([], pa.string()),
            "entity_name": pa.array([], pa.string()),
            "entity_type": pa.array([], pa.string()),
            "src_id": pa.array([], pa.string()),
            "tgt_id": pa.array([], pa.string()),
            "weight": pa.array([], pa.float64()),
            "order": pa.array([], pa.int32()),
            "description": pa.array([], pa.large_string()),
            "source_id": pa.array([], pa.string()),
            **{
                c: pa.array([], pa.int32() if c == "chunk_order_index" else pa.string())
                for c in lineage_cols
            },
        }
    )


_EXTRACTOR = CodeExtractor()  # module-level: regexes compiled once per worker


def extract_mentions(chunks_ds, cfg=None):
    """chunks Dataset -> unified mentions Dataset (entity + rel rows).

    The deterministic regex extractor is STATELESS (module-level compiled
    patterns), so it runs as a task pool on already-warm workers — measured
    ~2x faster end-to-end than an actor pool, whose per-process cold import
    dominated at bench scale.  A real model-backed extractor (the reference's
    LLM seam, with per-actor model state) should set
    cfg.extract_actor_pool=True to get the actor-pool path."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    if getattr(cfg, "extract_actor_pool", False):
        return chunks_ds.map_batches(
            CodeExtractor,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extract_concurrency,
        )
    return chunks_ds.map_batches(_EXTRACTOR, batch_format="pyarrow")


def split_mentions(mentions_ds):
    """Unified mentions -> (entity mentions, relationship mentions)."""
    ent = mentions_ds.filter(expr="kind == 'entity'").drop_columns(
        ["kind", "src_id", "tgt_id", "weight", "order"]
    )
    rel = mentions_ds.filter(expr="kind == 'rel'").drop_columns(
        ["kind", "entity_name", "entity_type"]
    )
    return ent, rel

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

import numpy as np
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


# description templates per match kind: (entity_type, entity desc, rel desc,
# rel weight); None entity_type = relationship only (the UNKNOWN-backfill
# callee case, reference text2graph.py:258-268)
_KINDS = (
    ("import", _IMPORT_RE, '"MODULE"',
     '"Module {s}."', '"Module {m} imports {s}."', 7.0),
    ("class", _CLASS_RE, '"CLASS"',
     '"Class {s} in module {m}."', '"Module {m} defines class {s}."', 9.0),
    ("def", _DEF_RE, '"FUNCTION"',
     '"Function {s} in module {m}."', '"Module {m} defines function {s}."', 9.0),
    ("call", _CALL_RE, None, None, '"Module {m} calls {s}."', 2.0),
)


def _batch_extract(contents: list[str]):
    """Single-pass batch extraction: ONE finditer per pattern over the
    concatenated batch text (separator \\x00 is unmatchable by every
    pattern, so matches never span chunks), match positions mapped back to
    chunk index with searchsorted.  Emits the SAME mention rows as
    parse_wire(render_wire(content)) per chunk — parity is asserted by
    tests/test_extract.py — without the per-row render->parse round trip.

    Returns (ent_rows, rel_rows):
      ent_rows: (chunk_idx, entity_name, entity_type, description)
      rel_rows: (chunk_idx, src_id, tgt_id, description, weight)
    """
    n = len(contents)
    joined = "\n\x00\n".join(contents)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        lens = np.fromiter((len(c) + 3 for c in contents), dtype=np.int64, count=n)
        starts[1:] = np.cumsum(lens[:-1])

    def chunk_of(pos: int) -> int:
        return int(np.searchsorted(starts, pos, side="right") - 1)

    # first `# module:` marker per chunk (render_wire: ALL records of a chunk
    # attach to its first module, chunks without one emit nothing)
    module: list[str | None] = [None] * n
    for m in _MODULE_RE.finditer(joined):
        i = chunk_of(m.start())
        if module[i] is None:
            module[i] = m.group(1)

    ent_rows: list[tuple] = [[] for _ in range(n)]
    rel_rows: list[tuple] = [[] for _ in range(n)]
    for i in range(n):
        mod = module[i]
        if mod is not None:
            ent_rows[i].append(
                (i, f'"{mod.upper()}"', '"MODULE"', f'"Module {mod}."')
            )

    for _name, pat, etype, edesc, rdesc, weight in _KINDS:
        for m in pat.finditer(joined):
            i = chunk_of(m.start())
            mod = module[i]
            if mod is None:
                continue
            sym = m.group(1)
            mod_u, sym_u = f'"{mod.upper()}"', f'"{sym.upper()}"'
            if etype is not None:
                ent_rows[i].append(
                    (i, sym_u, etype, edesc.format(s=sym, m=mod))
                )
            src, tgt = (mod_u, sym_u) if mod_u <= sym_u else (sym_u, mod_u)
            rel_rows[i].append(
                (i, src, tgt, rdesc.format(s=sym, m=mod), weight)
            )
    return (
        [r for rows in ent_rows for r in rows],
        [r for rows in rel_rows for r in rows],
    )


class CodeExtractor:
    """Extraction stage: chunks -> unified mention rows (batch-vectorized).

    Output has kind='entity' or 'rel' plus the superset of mention columns;
    split downstream with `split_mentions`.  State (compiled regexes via the
    module) is per-actor/worker; __call__ is per batch (T1/T3 pattern,
    SURVEY §2.3).  The hot path is `_batch_extract` (one regex pass per
    pattern per batch); the wire render/parse pair below it remains the
    parser-conformance contract and the gleaning-seam transport.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_mentions_table(LINEAGE_COLS)
        contents = batch.column("content").to_pylist()
        chunk_ids = batch.column("chunk_id").to_pylist()
        lineage = {c: batch.column(c).to_pylist() for c in LINEAGE_COLS if c in batch.column_names}
        ents, rels = _batch_extract(contents)
        return _mentions_to_table(ents, rels, chunk_ids, lineage)


def _mentions_to_table(
    ents: list[tuple], rels: list[tuple], chunk_ids: list, lineage: dict
) -> pa.Table:
    """(chunk-indexed entity/rel rows) -> the unified mentions Arrow table."""
    n_e, n_r = len(ents), len(rels)
    kind = ["entity"] * n_e + ["rel"] * n_r
    idx = [r[0] for r in ents] + [r[0] for r in rels]
    entity_name = [r[1] for r in ents] + [None] * n_r
    entity_type = [r[2] for r in ents] + [None] * n_r
    src_id = [None] * n_e + [r[1] for r in rels]
    tgt_id = [None] * n_e + [r[2] for r in rels]
    description = [r[3] for r in ents] + [r[3] for r in rels]
    weight = [None] * n_e + [r[4] for r in rels]
    order = [None] * n_e + [1] * n_r
    source_id = [chunk_ids[i] for i in idx]
    return pa.table(
        {
            "kind": pa.array(kind, pa.string()),
            "entity_name": pa.array(entity_name, pa.string()),
            "entity_type": pa.array(entity_type, pa.string()),
            "src_id": pa.array(src_id, pa.string()),
            "tgt_id": pa.array(tgt_id, pa.string()),
            "weight": pa.array(weight, pa.float64()),
            "order": pa.array(order, pa.int32()),
            "description": pa.array(description, pa.large_string()),
            "source_id": pa.array(source_id, pa.string()),
            **{
                c: pa.array(
                    [lineage[c][i] for i in idx],
                    pa.int32() if c == "chunk_order_index" else pa.string(),
                )
                for c in lineage
            },
        }
    )


# ------------------------------------------------------------- gleaning seam


def default_model_fn(content: str, history: list[tuple[str, str]]) -> str:
    """The deterministic stand-in for the reference's LLM seam
    (text2graph.py:466-468 `text_entity_extraction_func`): round 0 renders
    the full wire; glean rounds (history non-empty, reference
    text2graph.py:329-351 `continue_prompt` re-ask) have nothing to add."""
    if history:
        return COMPLETION_DELIM
    return render_wire(content)


class WireExtractor:
    """Actor-pool extractor with the reference's GLEANING loop
    (text2graph.py:329-369): per chunk, call the model seam, then re-ask up
    to `max_gleaning` times carrying the chat history, parsing and
    accumulating each round's records; an optional `loop_fn` (the reference's
    if_loop yes/no check, text2graph.py:352-360) can stop early.

    model_fn(content, history) -> wire string, where history is the list of
    (prompt_kind, response) pairs so far — the per-chunk chat history a real
    model-backed extractor needs.  With the default deterministic seam and
    any max_gleaning, output equals CodeExtractor exactly (glean rounds
    return only the completion delimiter).
    """

    def __init__(self, model_fn=None, max_gleaning: int = 0, loop_fn=None):
        self.model_fn = model_fn or default_model_fn
        self.max_gleaning = max_gleaning
        self.loop_fn = loop_fn

    def extract_chunk(self, content: str) -> tuple[list[dict], list[dict]]:
        wire = self.model_fn(content, [])
        history: list[tuple[str, str]] = [("extract", wire)]
        ents, rels = parse_wire(wire)
        for _ in range(self.max_gleaning):
            glean_wire = self.model_fn(content, history)
            history.append(("glean", glean_wire))
            e2, r2 = parse_wire(glean_wire)
            ents.extend(e2)
            rels.extend(r2)
            # loop check: continue only if the seam says more records remain
            if self.loop_fn is not None and not self.loop_fn(content, history):
                break
        return ents, rels

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_mentions_table(LINEAGE_COLS)
        contents = batch.column("content").to_pylist()
        chunk_ids = batch.column("chunk_id").to_pylist()
        lineage = {
            c: batch.column(c).to_pylist()
            for c in LINEAGE_COLS
            if c in batch.column_names
        }
        ent_rows: list[tuple] = []
        rel_rows: list[tuple] = []
        for i, content in enumerate(contents):
            ents, rels = self.extract_chunk(content)
            ent_rows.extend(
                (i, e["entity_name"], e["entity_type"], e["description"])
                for e in ents
            )
            rel_rows.extend(
                (i, r["src_id"], r["tgt_id"], r["description"], r["weight"])
                for r in rels
            )
        return _mentions_to_table(ent_rows, rel_rows, chunk_ids, lineage)


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


def extract_mentions(chunks_ds, cfg=None, extractor=None):
    """chunks Dataset -> unified mentions Dataset (entity + rel rows).

    Three paths:
    - default: the deterministic batch-vectorized extractor, STATELESS
      (module-level compiled patterns), as a task pool on already-warm
      workers — measured ~2x faster end-to-end than an actor pool, whose
      per-process cold import dominated at bench scale;
    - `extractor=` a WireExtractor (or compatible callable class instance):
      runs as an ACTOR pool (per-actor state in __init__, the T1/T3
      pattern) — the seam for model-backed extraction with gleaning;
    - cfg.entity_extract_max_gleaning > 0 or cfg.extract_actor_pool: actor
      pool of WireExtractor over the wire seam."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    gleaning = getattr(cfg, "entity_extract_max_gleaning", 0)
    if extractor is None and (gleaning > 0 or getattr(cfg, "extract_actor_pool", False)):
        extractor = WireExtractor(max_gleaning=gleaning)
    if extractor is not None:
        inst = extractor

        class _Pool:  # actor class wrapping the (possibly stateful) instance
            def __init__(self):
                self.inst = inst

            def __call__(self, batch: pa.Table) -> pa.Table:
                return self.inst(batch)

        return chunks_ds.map_batches(
            _Pool,
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

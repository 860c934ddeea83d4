"""Symbol-reference -> defining-chunk resolution — the code-corpus analog of
the reference's image->chunk fuzzy join (J1, preprocessing.py:178-206:
score every (image context, chunk) pair by count of context words contained
in the chunk, argmax wins; None when no words match).

Here the "context" is a call site (caller module calls SYMBOL) and the
candidate set is the chunks that DEFINE that symbol.  The score mirrors J1:
count of the caller-module's identifier words contained in the defining
chunk's content (locality — a definition in the same package scores higher);
ties break deterministically by smallest chunk_id.  Expressed as a bucketed
hash join on the symbol name: no N x M cross product — candidates only meet
call sites that share a symbol.
"""

from __future__ import annotations

import re

import pandas as pd

from ..hashing import bucket_any

N_BUCKETS = 64
_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _score(context_words: list[str], chunk_content: str) -> int:
    return sum(1 for w in context_words if w in chunk_content)


def resolve_symbol_refs(rel_mentions_ds, ent_mentions_ds, chunks_ds):
    """calls (src/tgt rel mentions with 'calls' descriptions) x defining
    chunks (FUNCTION/CLASS entity mentions) -> Dataset(caller_module,
    symbol, def_chunk_id, score).

    Plan: tag call rows and definition rows with bucket = hash(symbol);
    definitions carry their chunk content (joined from chunks on source_id
    first); one bucketed groupby resolves every call site."""

    defs = ent_mentions_ds.map_batches(
        lambda b: b[b["entity_type"].isin(['"FUNCTION"', '"CLASS"'])][
            ["entity_name", "source_id"]
        ]
        if len(b)
        else pd.DataFrame(
            {"entity_name": pd.Series(dtype=str), "source_id": pd.Series(dtype=str)}
        ),
        batch_format="pandas",
    )

    # attach chunk content to definitions (hash join on chunk id)
    from .join import bucketed_join

    chunk_content = chunks_ds.map_batches(
        lambda b: pd.DataFrame({"source_id": b["chunk_id"], "content": b["content"]})
        if len(b)
        else pd.DataFrame(
            {"source_id": pd.Series(dtype=str), "content": pd.Series(dtype=str)}
        ),
        batch_format="pandas",
    )
    defs_with_content = bucketed_join(defs, chunk_content, on="source_id").materialize()

    calls = rel_mentions_ds.map_batches(
        lambda b: _extract_calls(b), batch_format="pandas"
    )

    SUPER = ["caller_module", "symbol", "source_id", "content", "_side", "_bucket"]

    def tag(side):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({c: pd.Series(dtype="object") for c in SUPER})
            out = b.copy()
            for c in ("caller_module", "source_id", "content"):
                if c not in out.columns:
                    out[c] = None
            out["_side"] = side
            out["_bucket"] = bucket_any(out["symbol"], N_BUCKETS)
            return out[SUPER]

        return fn

    defs_tagged = defs_with_content.map_batches(
        lambda b: b.rename(columns={"entity_name": "symbol"}), batch_format="pandas"
    ).map_batches(tag("d"), batch_format="pandas")
    calls_tagged = calls.map_batches(tag("c"), batch_format="pandas")

    def resolve_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        d = bucket[bucket["_side"] == "d"]
        c = bucket[bucket["_side"] == "c"].drop_duplicates(["caller_module", "symbol"])
        rows = []
        defs_by_symbol = {
            s: sorted(zip(g["source_id"], g["content"]))
            for s, g in d.groupby("symbol", sort=False)
        }
        for caller, symbol in zip(c["caller_module"], c["symbol"]):
            cands = defs_by_symbol.get(symbol)
            if not cands:
                continue
            words = _WORD_RE.findall(str(caller))
            best_chunk, best_score = None, -1
            for chunk_id, content in cands:  # sorted -> min chunk_id on ties
                s = _score(words, content)
                if s > best_score:
                    best_chunk, best_score = chunk_id, s
            rows.append((caller, symbol, best_chunk, best_score))
        return pd.DataFrame(
            rows, columns=["caller_module", "symbol", "def_chunk_id", "score"]
        )

    both = defs_tagged.union(calls_tagged)
    return (
        both.groupby("_bucket")
        .map_groups(resolve_bucket, batch_format="pandas")
        .repartition(8)
    )


def _extract_calls(batch: pd.DataFrame) -> pd.DataFrame:
    """rel mentions -> (caller_module, symbol) for 'calls' relationships.
    The call's direction survives in the description ('Module M calls s.')
    because edge keys are undirected (text2graph.py:441-443)."""
    if len(batch) == 0:
        return pd.DataFrame(
            {"caller_module": pd.Series(dtype=str), "symbol": pd.Series(dtype=str)}
        )
    pat = re.compile(r'^"Module ([A-Za-z_][A-Za-z0-9_.]*) calls ([A-Za-z_][A-Za-z0-9_]*)\."$')
    callers, symbols = [], []
    for desc in batch["description"]:
        m = pat.match(desc)
        if m:
            callers.append(m.group(1))
            symbols.append('"' + m.group(2).upper() + '"')
    return pd.DataFrame({"caller_module": callers, "symbol": symbols})

"""Token-window chunking as a vectorized map_batches stage.

Semantics preserved from the reference `chunking_by_token_size`
(preprocessing.py:30-69, sizes :76-78 — window=1200 tokens, overlap=100,
stride=1100; per-chunk ``tokens = min(window, n_tokens - start)``; content is
the decoded window, ``.strip()``-ed; `chunk_order_index` = window index;
``chunk_id = "chunk-" + md5(stripped content)`` per preprocessing.py:126-138
and base.py:105-106). Tokenizer is the deterministic regex stand-in for
tiktoken (tokenizer.py). One input file row expands to N chunk rows
(flat-map shape, expressed as map_batches over Arrow for batch efficiency).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..tokenizer import encode

CARRY_COLS = ["doc_id", "repo", "path", "lang", "content_sha256"]


def make_chunker(chunk_token_size: int = 1200, chunk_overlap_token_size: int = 100):
    stride = chunk_token_size - chunk_overlap_token_size
    if stride <= 0:
        raise ValueError("chunk_token_size must exceed overlap")

    def chunk_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # hash-shuffle map_groups emits schema-less empty blocks for
            # empty partitions; emit a correctly-typed empty chunk table.
            return pa.table(
                {
                    "chunk_id": pa.array([], pa.string()),
                    **{c: pa.array([], pa.string()) for c in CARRY_COLS},
                    "tokens": pa.array([], pa.int32()),
                    "content": pa.array([], pa.large_string()),
                    "chunk_order_index": pa.array([], pa.int32()),
                }
            )
        contents = batch.column("content").to_pylist()
        carried = {c: batch.column(c).to_pylist() for c in CARRY_COLS if c in batch.column_names}
        out: dict[str, list] = {
            "chunk_id": [],
            "tokens": [],
            "content": [],
            "chunk_order_index": [],
            **{c: [] for c in carried},
        }
        for row_idx, text in enumerate(contents):
            toks = encode(text)
            n = len(toks)
            for index, start in enumerate(range(0, n, stride)):
                piece = "".join(toks[start : start + chunk_token_size]).strip()
                out["chunk_id"].append("chunk-" + hashlib.md5(piece.encode()).hexdigest())
                out["tokens"].append(min(chunk_token_size, n - start))
                out["content"].append(piece)
                out["chunk_order_index"].append(index)
                for c in carried:
                    out[c].append(carried[c][row_idx])
        return pa.table(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                **{c: pa.array(out[c], pa.string()) for c in carried},
                "tokens": pa.array(out["tokens"], pa.int32()),
                "content": pa.array(out["content"], pa.large_string()),
                "chunk_order_index": pa.array(out["chunk_order_index"], pa.int32()),
            }
        )

    return chunk_batch


def chunk_files(files_ds, cfg=None):
    """files Dataset (with doc_id/content_sha256 stamped) -> chunks Dataset."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    fn = make_chunker(cfg.chunk_token_size, cfg.chunk_overlap_token_size)
    return files_ds.map_batches(fn, batch_format="pyarrow")

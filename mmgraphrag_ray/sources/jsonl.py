"""JSONL (newline-delimited JSON) sink + source.

Interchange-format coverage beyond Parquet: JSONL is the lingua franca of
LLM training corpora (every open-data release ships it), so an engine that
can't round-trip it can't ingest half the ecosystem.  Both directions are
streaming and partitioned:

- `write_jsonl` fans blocks out as one ``.jsonl`` file per block via Ray's
  native `Dataset.write_json` — no driver materialization, resumable at
  file granularity like every other partitioned sink here.
- `read_jsonl` is `ray.data.read_json` over the directory — per-file read
  tasks, column pruning pushed down after parse.

Fidelity is the contract: a Parquet table written to JSONL and read back
must checksum-match the original (`documents_jsonl_roundtrip` pins this
against the DuckDB oracle computed on the ORIGINAL table — any encoding,
escaping, type-coercion or row-loss bug breaks the match).

The reference's analogous surface is the JsonKVStorage store
(storage.py:179-230) — a whole-table JSON rewrite on every flush; here the
JSON path is a partitioned streaming format, not a mutable store.
"""

from __future__ import annotations

import os
import shutil

import ray.data


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> str:
    """Write `ds` as partitioned JSONL (one file per block) into `out_dir`,
    replacing any previous contents (stale part-files from an earlier run
    would otherwise be re-read alongside the new ones)."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str, **kwargs) -> ray.data.Dataset:
    """Directory (or single file) of newline-delimited JSON -> Dataset."""
    return ray.data.read_json(path, **kwargs)

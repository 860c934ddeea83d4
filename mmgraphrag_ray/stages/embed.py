"""Embedding stage — the reference's sentence-transformers seam (T3).

The reference loads all-MiniLM-L6-v2 (384-dim, CPU) once per process
(parameter.py:29-37, llm.py:58-64) and encodes batches of 32
(storage.py:279-295).  Offline stand-in: a deterministic feature-hashing
embedder — tokens hash (crc32) to coordinates, signs from a second hash,
L2-normalized — with the same interface/shape, run as an actor POOL
(model state built once per actor in __init__, batches in __call__),
which is the canonical pattern for any real model scorer.

Also builds the entity vector table (reference A6, fusion.py:100-153 +
storage.py:271-295): one row per graph node,
``entity_id = "ent-" + md5(name)``, content = name + description.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

from ..textutils import md5_hex

EMBED_DIM = 384


class HashEmbedder:
    """Deterministic 384-dim feature-hash embedder (MiniLM stand-in)."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self.token_re = re.compile(r"[A-Za-z_]+|[0-9]+")

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            for tok in self.token_re.findall(text.lower()):
                h = zlib.crc32(tok.encode())
                idx = h % self.dim
                sign = 1.0 if (h >> 16) & 1 else -1.0
                out[i, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "content" not in batch.column_names:
            return pa.table(
                {
                    "entity_id": pa.array([], pa.string()),
                    "entity_name": pa.array([], pa.string()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                }
            )
        texts = batch.column("content").to_pylist()
        vecs = self.encode(texts)
        return pa.table(
            {
                "entity_id": batch.column("entity_id"),
                "entity_name": batch.column("entity_name"),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
            }
        )


def _vdb_content(batch: pa.Table) -> pa.Table:
    """nodes -> rows to embed (reference fusion.py:133-141: content is
    entity_name + description, id is ent-<md5(name)>)."""
    if batch.num_rows == 0 or "entity_name" not in batch.column_names:
        return pa.table(
            {
                "entity_id": pa.array([], pa.string()),
                "entity_name": pa.array([], pa.string()),
                "content": pa.array([], pa.large_string()),
            }
        )
    names = batch.column("entity_name").to_pylist()
    descs = batch.column("description").to_pylist()
    return pa.table(
        {
            "entity_id": pa.array(["ent-" + md5_hex(n) for n in names], pa.string()),
            "entity_name": pa.array(names, pa.string()),
            "content": pa.array([n + d for n, d in zip(names, descs)], pa.large_string()),
        }
    )


def build_entity_vecs(nodes_ds, cfg=None):
    """nodes Dataset -> entity_vecs(entity_id, entity_name, embedding[384]).
    Embedder is an actor pool: per-actor state in __init__, work per batch."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    content = nodes_ds.map_batches(_vdb_content, batch_format="pyarrow")
    return content.map_batches(
        HashEmbedder,
        batch_format="pyarrow",
        batch_size=cfg.embedding_batch_size,
        concurrency=cfg.embed_concurrency,
    )

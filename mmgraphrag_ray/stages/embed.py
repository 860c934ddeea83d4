"""Embedding stage — the reference's sentence-transformers seam (T3).

The reference loads all-MiniLM-L6-v2 (384-dim, CPU) once per process
(parameter.py:29-37, llm.py:58-64) and encodes batches of 32
(storage.py:279-295).  Offline stand-in: a deterministic feature-hashing
embedder — tokens hash to coordinates, signs from a second hash bit,
L2-normalized — with the same interface/shape, run as an actor POOL
(model state built once per actor in __init__, batches in __call__),
which is the canonical pattern for any real model scorer.

Token hashes are md5-derived (first 8 hex chars as uint32), the engine's
SQL-mirrorable hash family (stages/dedup.py:157): coordinate = h % 384,
sign = bit 16 of h.  That makes the pre-normalization components exactly
expressible in DuckDB (see entity_vec_components + the
kg_entity_vec_components oracle in __ray_entry__.py); per-token md5 cost
is amortized by a per-embedder token memo (code corpora repeat tokens
heavily).

Also builds the entity vector table (reference A6, fusion.py:100-153 +
storage.py:271-295): one row per graph node,
``entity_id = "ent-" + md5(name)``, content = name + description.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from ..textutils import md5_hex

EMBED_DIM = 384


def _tok_h32(tok: str) -> int:
    """First 8 hex chars of md5 as uint32 — SQL mirror:
    ('0x' || substr(md5(tok),1,8))::UBIGINT."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


class HashEmbedder:
    """Deterministic 384-dim feature-hash embedder (MiniLM stand-in)."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim
        self.token_re = re.compile(r"[A-Za-z_]+|[0-9]+")
        # token -> (coordinate, sign); per-actor state, built lazily
        self._memo: dict[str, tuple[int, float]] = {}

    def _coord(self, tok: str) -> tuple[int, float]:
        c = self._memo.get(tok)
        if c is None:
            h = _tok_h32(tok)
            c = (h % self.dim, 1.0 if (h >> 16) & 1 else -1.0)
            self._memo[tok] = c
        return c

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, text in enumerate(texts):
            for tok in self.token_re.findall(text.lower()):
                idx, sign = self._coord(tok)
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


_COMP_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_name", pa.string()),
        ("dim_idx", pa.int64()),
        ("component", pa.int64()),
    ]
)


class _VecComponents:
    """Actor-pool stage: nodes -> sparse PRE-normalization feature-hash
    components, one row per (entity, touched coordinate).  This is the
    integer-exact sparse form of what HashEmbedder normalizes — every
    coordinate a token hashed to appears, including sign-cancelled zeros,
    so a SQL GROUP BY over token hashes reproduces it bit-for-bit (the
    value oracle for the T3/A6 embedding seam; floats never compare)."""

    def __init__(self):
        self.emb = HashEmbedder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = _vdb_content(batch)
        ids, names, comps, idxs = [], [], [], []
        for eid, name, text in zip(
            t.column("entity_id").to_pylist(),
            t.column("entity_name").to_pylist(),
            t.column("content").to_pylist(),
        ):
            acc: dict[int, int] = {}
            for tok in self.emb.token_re.findall(text.lower()):
                idx, sign = self.emb._coord(tok)
                acc[idx] = acc.get(idx, 0) + int(sign)
            for idx in sorted(acc):
                ids.append(eid)
                names.append(name)
                idxs.append(idx)
                comps.append(acc[idx])
        return pa.table(
            {
                "entity_id": pa.array(ids, pa.string()),
                "entity_name": pa.array(names, pa.string()),
                "dim_idx": pa.array(idxs, pa.int64()),
                "component": pa.array(comps, pa.int64()),
            }
        )


def embed_pool_concurrency() -> tuple:
    """Actor-pool sizing for the embedding stages — env/CPU-derived
    (multimodal.media_concurrency's pattern) instead of a hard-coded cap:
    (1, N) with N = RAYKG_EMBED_ACTORS or half the node's CPUs.  The
    min=1 lower bound keeps the pool from reserving every CPU and
    starving upstream stages (config.KGConfig note)."""
    import os

    n = int(os.environ.get("RAYKG_EMBED_ACTORS", "0"))
    if n <= 0:
        n = max(4, (os.cpu_count() or 8) // 2)
    return (1, n)


def entity_vec_components(nodes_ds, concurrency=None):
    """nodes Dataset -> (entity_id, entity_name, dim_idx, component)."""
    return nodes_ds.map_batches(
        _VecComponents, batch_format="pyarrow",
        concurrency=concurrency or embed_pool_concurrency(),
    )


def vec_component_invariants(vecs_ds, comps_ds, id_col: str,
                             vec_col: str = "embedding",
                             dim_col: str = "dim_idx",
                             comp_col: str = "component",
                             ppm_tol: int = 100):
    """ONE-row integer invariant summary tying a float L2-normalized vector
    table to its value-oracled integer pre-normalization components — the
    oracle for outputs whose float values can never hash-compare across
    engines (kg_entity_vecs / media_feature_vecs, the last two rows-only
    driver outputs):

    - n_vecs / n_unit_norm / n_zero_vecs: every vector with any nonzero
      integer component must be unit-norm within ``ppm_tol`` ppm of
      sum(v^2)=1 (measured 0 ppm for float32 at dims 64/384); all-cancelled
      or token-free vectors are exactly zero.
    - n_nonzero_dims (vec side) vs n_comp_nonzero (component side): the
      float vector is nonzero EXACTLY where the integer component is.
    - n_sign_mismatch: sign(v[dim]) == sign(component) for every component
      row (normalization preserves signs) — must be 0.

    Scale shape: vector-side stats reduce to one partial row per batch;
    the sign check joins component rows to exploded nonzero vector entries
    through the capped bucketed_join on the packed id|dim key — rows moved
    are the sparse nonzero entries, never the dense vectors."""
    import pandas as pd

    from ..arrowutil import df_to_table
    from .join import bucketed_join

    COLS = ["n_vecs", "n_unit_norm", "n_zero_vecs", "n_nonzero_dims"]

    def vec_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in COLS})
        emb = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        ppm = np.rint((emb * emb).sum(axis=1) * 1e6)
        return pa.table({
            "n_vecs": pa.array([batch.num_rows], pa.int64()),
            "n_unit_norm": pa.array(
                [int((np.abs(ppm - 1e6) <= ppm_tol).sum())], pa.int64()),
            "n_zero_vecs": pa.array([int((ppm == 0).sum())], pa.int64()),
            "n_nonzero_dims": pa.array([int((emb != 0).sum())], pa.int64()),
        })

    vstats = vecs_ds.map_batches(
        vec_partial, batch_format="pyarrow").to_pandas().sum()

    def vec_sign_rows(batch: pa.Table) -> pa.Table:
        ks, vs = [], []
        if batch.num_rows:
            ids = batch.column(id_col).to_pylist()
            emb = np.asarray(batch.column(vec_col).to_pylist(),
                             dtype=np.float64)
            for rid, row in zip(ids, emb):
                for d in np.nonzero(row)[0]:
                    ks.append(f"{rid}|{d}")
                    vs.append(1 if row[d] > 0 else -1)
        return pa.table({"_k": pa.array(ks, pa.string()),
                         "vsign": pa.array(vs, pa.int64())})

    def comp_keyed(b: pd.DataFrame):
        out = pd.DataFrame({
            "_k": b[id_col].astype(str) + "|" + b[dim_col].astype(str),
            "csign": np.sign(b[comp_col]).astype("int64"),
        } if len(b) else {"_k": pd.Series(dtype=object),
                          "csign": pd.Series(dtype="int64")})
        return df_to_table(out, _k=pa.string(), csign=pa.int64())

    joined = bucketed_join(
        comps_ds.map_batches(comp_keyed, batch_format="pandas"),
        vecs_ds.map_batches(vec_sign_rows, batch_format="pyarrow"),
        on="_k", how="left",
    )

    def join_partial(b: pd.DataFrame):
        vs = b["vsign"].fillna(0).astype("int64") if len(b) else b["vsign"]
        return df_to_table(pd.DataFrame({
            "n_comp_rows": pd.array([len(b)], dtype="int64"),
            "n_comp_nonzero": pd.array(
                [int((b["csign"] != 0).sum())] if len(b) else [0],
                dtype="int64"),
            "n_sign_mismatch": pd.array(
                [int((b["csign"] != vs).sum())] if len(b) else [0],
                dtype="int64"),
        }))

    jstats = joined.map_batches(
        join_partial, batch_format="pandas").to_pandas().sum()

    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "n_vecs": pd.array([int(vstats["n_vecs"])], dtype="int64"),
        "n_unit_norm": pd.array([int(vstats["n_unit_norm"])], dtype="int64"),
        "n_zero_vecs": pd.array([int(vstats["n_zero_vecs"])], dtype="int64"),
        "n_nonzero_dims": pd.array(
            [int(vstats["n_nonzero_dims"])], dtype="int64"),
        "n_comp_rows": pd.array([int(jstats["n_comp_rows"])], dtype="int64"),
        "n_comp_nonzero": pd.array(
            [int(jstats["n_comp_nonzero"])], dtype="int64"),
        "n_sign_mismatch": pd.array(
            [int(jstats["n_sign_mismatch"])], dtype="int64"),
    }))

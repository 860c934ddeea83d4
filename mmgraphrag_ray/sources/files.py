"""Ingest of the `files` corpus table as a streaming Dataset.

Replaces the reference's document readers + JsonKVStorage full_docs store
(preprocessing.py:107-118, storage.py:179-230): the Dataset IS the store.
Stamps `content_sha256` (the per-row invariant, north_rule) and
`doc_id = "doc-" + md5(content)` (reference base.py:105-106,
preprocessing.py:107-110) in one vectorized map_batches pass.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data


def _stamp_ids(batch: pa.Table) -> pa.Table:
    contents = batch.column("content").to_pylist()
    sha = [hashlib.sha256(c.encode()).hexdigest() for c in contents]
    doc_id = ["doc-" + hashlib.md5(c.encode()).hexdigest() for c in contents]
    return batch.append_column("content_sha256", pa.array(sha, pa.string())).append_column(
        "doc_id", pa.array(doc_id, pa.string())
    )


def read_files(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """files.parquet -> Dataset with doc_id + content_sha256 stamped."""
    ds = ray.data.read_parquet(path, columns=columns)
    return ds.map_batches(_stamp_ids, batch_format="pyarrow")

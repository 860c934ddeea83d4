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


def read_files(
    path: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """files.parquet -> Dataset with doc_id + content_sha256 stamped.

    `override_num_blocks` bounds the block count for small/medium inputs:
    Ray's default read parallelism (~200 blocks) makes every downstream
    stage schedule hundreds of tiny tasks, which dominates wall time until
    inputs reach many GB. At real scale leave it None (let Ray size blocks
    by target_max_block_size)."""
    ds = ray.data.read_parquet(path, columns=columns, override_num_blocks=override_num_blocks)
    return ds.map_batches(_stamp_ids, batch_format="pyarrow")

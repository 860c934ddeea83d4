"""Pipeline configuration (the reference's global_config dataclass fields,
mmgraphrag.py:42-90, minus LLM endpoints). Plain dataclass passed explicitly —
no CSV round-trip (reference mmgraphrag.py:94-102 / base.py:204-212)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KGConfig:
    # chunking (reference preprocessing.py:76-78, mmgraphrag.py:65)
    chunk_token_size: int = 1200
    chunk_overlap_token_size: int = 100
    # merge-time description summarization gate (reference mmgraphrag.py:52,
    # text2graph.py:93-116): descriptions with >= this many tokens are
    # summarized; sandbox stand-in = deterministic truncation to this size.
    entity_summary_to_max_tokens: int = 500
    # embedding (reference parameter.py:29-37: 384-dim MiniLM; sandbox
    # stand-in = deterministic feature-hash embedder, same dim)
    embedding_dim: int = 384
    embedding_batch_size: int = 256
    # gleaning rounds for the extraction seam (reference
    # `entity_extract_max_gleaning`, text2graph.py:329-369: re-ask the model
    # with chat history up to N times).  0 keeps the deterministic extractor
    # on its fast single-pass path; >0 routes through the WireExtractor
    # actor pool which carries per-chunk history.
    entity_extract_max_gleaning: int = 0
    # extraction wire format (reference prompt.py:189-192)
    tuple_delimiter: str = "<|>"
    record_delimiter: str = "##"
    completion_delimiter: str = "<|COMPLETE|>"
    # execution knobs. Actor-pool sizes are (min, max) autoscaling tuples
    # with min=1 so a pool can never reserve every CPU and starve the
    # upstream read/sort stages (observed deadlock when a fixed pool equals
    # the cluster CPU count).
    extract_concurrency: tuple = (1, 24)
    extract_batch_size: int = 64
    # use an actor pool for extraction (required for model-backed extractors
    # with warm per-actor state; the deterministic regex extractor is faster
    # as stateless tasks)
    extract_actor_pool: bool = False
    embed_concurrency: tuple = (1, 16)
    merge_num_partitions: int = 0  # 0 = let Ray pick
    # block budget for the initial read (None = Ray default sizing; a small
    # fixed count keeps tiny bench inputs from exploding into hundreds of
    # per-stage tasks). See sources/files.py.
    read_num_blocks: int | None = 64


DEFAULT_CONFIG = KGConfig()

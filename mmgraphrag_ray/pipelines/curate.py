"""Corpus-curation pipeline: the doc_curation hygiene verdict applied end
to end, producing a curated documents table on disk.

Two lineage-manifested stages (skip-if-complete, atomic tmp+rename,
config-hash + input-fingerprint invalidation — same resume contract as
run_kg):

- ``curation_flags``: one row per document with per-dimension keep flags
  (exact-dup survivorship, language allowlist, integer quality gates,
  benchmark decontamination) and the final verdict.
- ``curated_docs``: the surviving documents (full payload), selected via a
  bucketed semi-join on doc_id — the text column only moves for survivors.
"""

from __future__ import annotations

import os

import ray.data


def run_curation(sf_dir: str, out_dir: str) -> dict:
    """Run (or resume) the curation pipeline; returns per-stage row counts."""
    from ..config import DEFAULT_CONFIG
    from ..state import lineage
    from ..stages.join import bucketed_join
    from .relational import doc_curation

    docs_path = os.path.join(sf_dir, "documents.parquet")
    fps = [lineage.input_fingerprint(docs_path)]

    sig_flags = lineage.stage_signature("curation_flags", 1, DEFAULT_CONFIG, fps)
    if not lineage.is_complete(out_dir, "curation_flags", sig_flags):
        lineage.write_stage(
            doc_curation(sf_dir), out_dir, "curation_flags", sig_flags
        )

    sig_docs = lineage.stage_signature("curated_docs", 1, DEFAULT_CONFIG, fps)
    if not lineage.is_complete(out_dir, "curated_docs", sig_docs):
        flags = lineage.read_stage(out_dir, "curation_flags")
        # pin: bucketed_join's broadcast path calls count() then
        # to_arrow_refs(), which re-executes a LAZY plan twice
        kept_ids = flags.map_batches(
            lambda b: b[b["keep"] == 1][["doc_id"]], batch_format="pandas"
        ).materialize()
        docs = ray.data.read_parquet(docs_path)
        kept = bucketed_join(docs, kept_ids, on="doc_id", small_side="right")
        lineage.write_stage(kept, out_dir, "curated_docs", sig_docs)

    return {
        "flags_rows": lineage.read_manifest(out_dir, "curation_flags")["rows"],
        "curated_rows": lineage.read_manifest(out_dir, "curated_docs")["rows"],
    }

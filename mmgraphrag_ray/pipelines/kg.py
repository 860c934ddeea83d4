"""End-to-end KG construction pipeline (the reference's index() path,
mmgraphrag.py:141-184, re-expressed as one streaming Dataset flow):

    read files -> stamp ids/sha -> exact-dedup by content -> chunk ->
    extract mentions (actor pool) -> split ->
    node merge + edge merge (partial-agg groupbys) -> UNKNOWN backfill ->
    nodes/edges tables [-> canonicalization/fusion, see stages/linking.py]

Each stage returns a lazy Dataset; materialization happens only at the sinks
(write_parquet) or in small test consumers.
"""

from __future__ import annotations

import os

import ray.data

from ..config import DEFAULT_CONFIG, KGConfig
from ..sources.files import read_files
from ..stages.chunk import chunk_files
from ..stages.dedup import dedup_exact, dedup_exact_broadcast  # noqa: F401
from ..stages.extract import extract_mentions, split_mentions  # noqa: F401
from ..stages.merge import (
    backfill_unknown_nodes,
    finalize_edges,
    merge_edges,
    merge_graph,
    merge_nodes,
)


def _auto_spill_env(files_path: str) -> None:
    """Auto-enable the parquet-checkpoint pin mode for large corpora.

    The plain ``materialize()`` barriers hold every pinned intermediate
    (chunk payloads, mentions, merged graph) in the object store as raw
    Arrow; at ~1M files that exceeds plasma and spills uncompressed until
    the scratch disk fills (measured: OutOfDiskError at 1M files /
    37.6 GiB plasma / 78 GB scratch).  Above ``RAYKG_PIN_PARQUET_OVER``
    input bytes (default 512 MiB of source parquet, ~500k files) the
    pins checkpoint to compressed parquet instead — same barrier, ~10x
    less scratch (1M-file soak: 0 object spills, 4.5 GB checkpoints).
    Explicit ``RAYKG_SPILL_DIR`` always wins; the auto path just fills
    it in for every pin_dataset in this process."""
    if os.environ.get("RAYKG_SPILL_DIR"):
        return
    try:
        if os.path.isdir(files_path):
            size = sum(
                os.path.getsize(os.path.join(files_path, f))
                for f in os.listdir(files_path)
            )
        else:
            size = os.path.getsize(files_path)
    except OSError:
        return
    cap = int(os.environ.get("RAYKG_PIN_PARQUET_OVER", str(512 * 2**20)))
    if size > cap:
        d = os.environ.get("RAYKG_SPILL_DIR_AUTO", "/tmp/raykg_spill_auto")
        os.makedirs(d, exist_ok=True)
        os.environ["RAYKG_SPILL_DIR"] = d


def build_chunks(files_path: str, cfg: KGConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    from ..runtime import configure, pin_dataset

    configure()
    _auto_spill_env(files_path)
    files = read_files(files_path, override_num_blocks=cfg.read_num_blocks)
    # Pinned once: consumed by the key-only dedup pass and the filter pass.
    # pin_dataset honors RAYKG_SPILL_DIR (million-file soak: chunk payloads
    # checkpoint to compressed parquet instead of holding plasma quota
    # across the downstream shuffles — raw-Arrow spill of every barrier
    # filled the disk at 1M files).
    chunks = pin_dataset(chunk_files(files, cfg), "chunks")
    # ONE dedup covers both reference dedups: the doc-level content-hash
    # anti-join (preprocessing.py:107-118) is subsumed by the chunk-level
    # keyed insert (preprocessing.py:126-150) because duplicate files share
    # doc_id = md5(content) and produce identical chunk windows; the
    # min-(doc_id, repo, path) survivor equals the two-stage result
    # (deviation only for identical content at identical repo+path with
    # different commits, which the id scheme cannot distinguish anyway).
    # Broadcast variant: only the 5 short key columns take the shuffle —
    # chunk payloads never move (falls back to the payload shuffle above a
    # duplicate-count guard).
    return dedup_exact_broadcast(
        chunks, key="chunk_id", order_by=["doc_id", "repo", "path", "chunk_order_index"]
    )


def build_mentions(files_path: str, cfg: KGConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    return extract_mentions(build_chunks(files_path, cfg), cfg)


def build_graph(
    files_path: str,
    cfg: KGConfig = DEFAULT_CONFIG,
    mentions_ds: ray.data.Dataset | None = None,
):
    """Returns (nodes_ds, edges_ds). If mentions_ds is given (e.g. a
    checkpointed parquet re-read), extraction is skipped."""
    if mentions_ds is None:
        # Materialize mentions before the fused shuffle.  A/B measured:
        # streaming them straight into the shuffle's map side leaves T16
        # unchanged (16.9 -> 16.3 s, within noise) but costs ~18% at 4
        # CPUs (55.4 -> 65.4 s) — extraction tasks and shuffle aggregator
        # actors thrash when parallelism is scarce, so the barrier is the
        # better plan at every scale that matters.  pin_dataset keeps the
        # barrier but checkpoints it to parquet under RAYKG_SPILL_DIR
        # (the million-file/100-TB path).
        from ..runtime import pin_dataset

        mentions_ds = pin_dataset(build_mentions(files_path, cfg), "mentions")
    # fused single-shuffle node+edge merge over the UNIFIED mentions table
    # (one scan computes both partials); outputs are pinned (each is
    # consumed twice: backfill + sink). The write path (state/lineage.py)
    # checkpoints them to parquet instead.  backfill_candidates=True
    # threads the UNKNOWN-endpoint anti-join through the SAME shuffle, so
    # the backfill phase is payload-fetch only (one map over the edges).
    nodes, edges, winners = merge_graph(
        cfg=cfg, mentions_ds=mentions_ds, backfill_candidates=True
    )
    nodes = backfill_unknown_nodes(nodes, edges, winners_ds=winners)
    return nodes, finalize_edges(edges)


def update_graph(
    new_files_path: str,
    existing_nodes_ds: ray.data.Dataset,
    existing_edges_ds: ray.data.Dataset,
    cfg: KGConfig = DEFAULT_CONFIG,
):
    """Incremental indexing — the reference's actual operating mode: new
    documents merge into an existing graph via the upsert-with-existing
    branches of the node/edge merges (text2graph.py:164-191, 232-257); docs
    already indexed are dropped upstream by the content-hash anti-join
    (J7, storage.py:223-224 — callers pass new files, or pre-filter with
    stages/join.broadcast_semi_join(anti=True) on content_sha256).

    NOTE (shared with the reference): incremental results can differ from a
    from-scratch batch run where its semantics are history-dependent — an
    existing entity_type counts once regardless of how many mentions built
    it, and a previously summarized (truncated) description contributes its
    truncated form.  Weights/source ids/descriptions below the summarize
    gate are exactly additive."""
    from ..stages.merge import merge_edges_incremental, merge_nodes_incremental

    mentions = build_mentions(new_files_path, cfg).materialize()
    ent, rel = split_mentions(mentions)
    nodes = merge_nodes_incremental(ent, existing_nodes_ds, cfg).materialize()
    edges = merge_edges_incremental(rel, existing_edges_ds, cfg).materialize()
    nodes = backfill_unknown_nodes(nodes, edges)
    return nodes, finalize_edges(edges)


def run_kg(
    files_path: str,
    out_dir: str,
    cfg: KGConfig = DEFAULT_CONFIG,
    canonicalize: bool = True,
) -> dict:
    """Resumable write path: every stage checkpoints to partitioned parquet
    with a lineage manifest (state/lineage.py); a rerun recomputes only
    stages whose inputs/config changed or whose checkpoint is missing.
    Returns {stage: directory}.
    """
    from ..state import lineage as ln

    os.makedirs(out_dir, exist_ok=True)
    fp_in = ln.input_fingerprint(files_path)
    done: dict[str, str] = {}

    def ensure(stage: str, version: int, upstream: list[str], build):
        sig = ln.stage_signature(
            stage, version, cfg, [fp_in] + [{"stage": u, "sig": sigs[u]} for u in upstream]
        )
        sigs[stage] = sig
        if not ln.is_complete(out_dir, stage, sig):
            ln.write_stage(build(), out_dir, stage, sig)
        done[stage] = ln.stage_dir(out_dir, stage)
        return ln.read_stage(out_dir, stage)

    sigs: dict[str, str] = {}

    # PARTITION-level checkpoint for the embarrassingly parallel map phase:
    # one chunks partition per input shard; a killed run resumes at the
    # first incomplete shard (north_rule per-partition lineage).  The
    # downstream stages start at shuffles, whose in-flight state is not
    # resumable — they checkpoint at stage granularity.
    ln.partitioned_stage(
        out_dir,
        "chunks",
        ln.list_shards(files_path),
        lambda shard: chunk_files(
            read_files(shard, override_num_blocks=4), cfg
        ),
        cfg,
    )
    # stage signature = the set of partition signatures (stable across a
    # partition REBUILD with identical inputs, so downstream stages are not
    # invalidated by a resume that reproduced the same data)
    import glob
    import json as _json

    part_sigs = []
    for mpath in sorted(
        glob.glob(os.path.join(ln.stage_dir(out_dir, "chunks"), "part=*", ln.MANIFEST))
    ):
        with open(mpath) as f:
            part_sigs.append(_json.load(f)["signature"])
    sigs["chunks"] = ln.stage_signature("chunks", 1, cfg, [{"parts": part_sigs}])
    done["chunks"] = ln.stage_dir(out_dir, "chunks")

    def _mentions_from_chunks():
        chunks = ln.read_stage(out_dir, "chunks")
        deduped = dedup_exact(
            chunks, key="chunk_id",
            order_by=["doc_id", "repo", "path", "chunk_order_index"],
        )
        return extract_mentions(deduped, cfg)

    mentions = ensure("mentions", 2, ["chunks"], _mentions_from_chunks)
    ent, rel = split_mentions(mentions)

    # BUCKET-granular resume for the merge shuffles: one manifest per reduce
    # bucket; a kill mid-merge recomputes only the missing buckets on rerun
    from ..stages.merge import N_BUCKETS as MERGE_BUCKETS

    merge_upstream = [fp_in, {"stage": "mentions", "sig": sigs["mentions"]}]
    ln.bucketed_stage(
        out_dir, "nodes_merged", MERGE_BUCKETS,
        lambda missing: merge_nodes(ent, cfg, buckets=missing, emit_bucket_col=True),
        cfg, merge_upstream,
    )
    sigs["nodes_merged"] = ln.bucketed_stage_signature(out_dir, "nodes_merged", cfg, MERGE_BUCKETS)
    done["nodes_merged"] = ln.stage_dir(out_dir, "nodes_merged")
    ln.bucketed_stage(
        out_dir, "edges_merged", MERGE_BUCKETS,
        lambda missing: merge_edges(rel, cfg, buckets=missing, emit_bucket_col=True),
        cfg, merge_upstream,
    )
    sigs["edges_merged"] = ln.bucketed_stage_signature(out_dir, "edges_merged", cfg, MERGE_BUCKETS)
    done["edges_merged"] = ln.stage_dir(out_dir, "edges_merged")
    nodes_merged = ln.read_stage(out_dir, "nodes_merged")
    edges_merged = ln.read_stage(out_dir, "edges_merged")

    nodes = ensure(
        "nodes", 1, ["nodes_merged", "edges_merged"],
        lambda: backfill_unknown_nodes(nodes_merged, edges_merged),
    )
    edges = ensure(
        "edges", 1, ["edges_merged"], lambda: finalize_edges(edges_merged)
    )

    if canonicalize:
        from ..stages.embed import build_entity_vecs
        from ..stages.linking import canonicalize_graph

        def build_canonical():
            cn, ce, alias, clusters = canonicalize_graph(nodes, edges, ent, cfg)
            _cache["ce"], _cache["alias"] = ce, alias
            return cn

        _cache: dict = {}
        ensure("canonical_nodes", 1, ["nodes", "edges", "mentions"], build_canonical)
        if "ce" in _cache:  # canonical_nodes was rebuilt this run
            ensure("canonical_edges", 1, ["canonical_nodes"], lambda: _cache["ce"])
            ensure("alias", 1, ["canonical_nodes"], lambda: _cache["alias"])
        else:  # resumed: rebuild dependents only if their checkpoints are stale
            ensure(
                "canonical_edges", 1, ["canonical_nodes"],
                lambda: canonicalize_graph(nodes, edges, ent, cfg)[1],
            )
            ensure(
                "alias", 1, ["canonical_nodes"],
                lambda: canonicalize_graph(nodes, edges, ent, cfg)[2],
            )
        ensure(
            "entity_vecs", 1, ["canonical_nodes"],
            lambda: build_entity_vecs(ln.read_stage(out_dir, "canonical_nodes"), cfg),
        )

    return done


def extraction_coverage(files_path: str, cfg: KGConfig = DEFAULT_CONFIG):
    """Extraction-quality audit: per repo, how many chunks produced at
    least one entity mention — the recall dashboard a KG owner reads
    before blaming the merge ("is the extractor silent on whole repos?").

    Plan: chunks (repo, chunk_id) LEFT JOIN per-chunk mention counts
    (combiner groupby on source_id), then a per-repo reduce — the only
    all-to-all moves one fixed-width row per chunk.  -> Dataset(repo,
    n_chunks, n_covered, n_mentions)."""
    import pandas as pd

    from ..stages.extract import split_mentions
    from ..stages.groupagg import bucketed_groupby_agg
    from ..stages.join import bucketed_join

    chunks = build_chunks(files_path, cfg).map_batches(
        lambda b: b[["chunk_id", "repo"]], batch_format="pandas"
    ).materialize()
    ent, _ = split_mentions(extract_mentions(
        build_chunks(files_path, cfg), cfg))
    per_chunk = bucketed_groupby_agg(
        ent.map_batches(
            lambda b: b[["source_id"]].rename(
                columns={"source_id": "chunk_id"}),
            batch_format="pandas",
        ),
        keys=["chunk_id"],
        aggs={"n_mentions": (None, "count")},
    ).materialize()
    joined = bucketed_join(chunks, per_chunk, on="chunk_id", how="left")
    stamped = joined.map_batches(
        lambda b: pd.DataFrame({
            "repo": b["repo"],
            "covered": (b["n_mentions"].notna()).astype("int64"),
            "n_mentions": b["n_mentions"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    )
    return bucketed_groupby_agg(
        stamped, keys=["repo"],
        aggs={
            "n_chunks": (None, "count"),
            "n_covered": ("covered", "sum"),
            "n_mentions": ("n_mentions", "sum"),
        },
    )

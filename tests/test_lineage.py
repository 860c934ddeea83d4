"""Checkpoint/lineage/resume (north_rule: killed job resumes without
recomputing completed partitions; deterministic outputs)."""

import json
import os
import shutil

import pandas as pd
import pytest

from mmgraphrag_ray.corpus import ensure_corpus
from mmgraphrag_ray.pipelines.kg import run_kg
from mmgraphrag_ray.state import lineage as ln

OUT = "/tmp/raykg_test_lineage"


@pytest.fixture(scope="module")
def first_run():
    shutil.rmtree(OUT, ignore_errors=True)
    path = ensure_corpus("/root/testdata/sf0.001")
    stages = run_kg(path, OUT, canonicalize=True)
    return path, stages


def _stage_mtimes():
    out = {}
    for stage in os.listdir(OUT):
        d = os.path.join(OUT, stage)
        out[stage] = max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
    return out


def _read_sorted(stage):
    import ray.data

    df = ln.read_stage(OUT, stage).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_all_stages_written_with_manifests(first_run):
    _, stages = first_run
    expected = {
        "mentions", "nodes_merged", "edges_merged", "nodes", "edges",
        "canonical_nodes", "canonical_edges", "alias", "entity_vecs",
    }
    assert expected <= set(stages)
    for s in expected:
        m = ln.read_manifest(OUT, s)
        assert m["rows"] > 0 and m["signature"] and m["wall_sec"] >= 0
    # chunks stage is partition-level: one manifest per input shard
    parts = [p for p in os.listdir(os.path.join(OUT, "chunks")) if p.startswith("part=")]
    assert len(parts) >= 2
    for p in parts:
        assert os.path.exists(os.path.join(OUT, "chunks", p, ln.MANIFEST))


def test_partition_level_resume(first_run):
    path, _ = first_run
    parts_dir = os.path.join(OUT, "chunks")
    parts = sorted(p for p in os.listdir(parts_dir) if p.startswith("part="))
    victim, survivor = parts[0], parts[1]
    surv_mtime = os.path.getmtime(os.path.join(parts_dir, survivor, ln.MANIFEST))
    mentions_mtime = os.path.getmtime(os.path.join(OUT, "mentions", ln.MANIFEST))
    shutil.rmtree(os.path.join(parts_dir, victim))
    run_kg(path, OUT, canonicalize=False)
    # victim rebuilt, survivor untouched
    assert os.path.exists(os.path.join(parts_dir, victim, ln.MANIFEST))
    assert os.path.getmtime(os.path.join(parts_dir, survivor, ln.MANIFEST)) == surv_mtime
    # identical rebuilt partition -> stable stage signature -> downstream
    # stages (mentions onward) were NOT recomputed
    assert os.path.getmtime(os.path.join(OUT, "mentions", ln.MANIFEST)) == mentions_mtime


def test_rerun_skips_completed_stages(first_run):
    path, _ = first_run
    before = _stage_mtimes()
    run_kg(path, OUT, canonicalize=True)
    after = _stage_mtimes()
    assert before == after  # nothing recomputed


def test_kill_resume_recomputes_only_missing_and_is_deterministic(first_run):
    path, _ = first_run
    nodes_before = _read_sorted("nodes")
    edges_before = _read_sorted("edges")
    before = _stage_mtimes()
    # simulate a kill that lost the nodes checkpoint
    shutil.rmtree(os.path.join(OUT, "nodes"))
    run_kg(path, OUT, canonicalize=False)
    after = _stage_mtimes()
    # upstream stages untouched
    for s in ("mentions", "nodes_merged", "edges_merged", "edges"):
        assert before[s] == after[s], s
    # recomputed nodes stage is value-identical
    pd.testing.assert_frame_equal(nodes_before, _read_sorted("nodes"))
    pd.testing.assert_frame_equal(edges_before, _read_sorted("edges"))


def test_config_change_invalidates(first_run):
    path, _ = first_run
    from mmgraphrag_ray.config import KGConfig

    before = _stage_mtimes()
    cfg2 = KGConfig(chunk_token_size=600, chunk_overlap_token_size=50)
    out2 = OUT + "_cfg2"
    shutil.rmtree(out2, ignore_errors=True)
    run_kg(path, out2, cfg2, canonicalize=False)
    # different config in a fresh dir produces a different signature
    assert (
        ln.read_manifest(OUT, "mentions")["signature"]
        != ln.read_manifest(out2, "mentions")["signature"]
    )
    assert before == _stage_mtimes()  # original untouched


def test_corrupt_manifest_triggers_recompute(first_run):
    path, _ = first_run
    mpath = os.path.join(OUT, "edges", ln.MANIFEST)
    with open(mpath, "w") as f:
        f.write("{not json")
    run_kg(path, OUT, canonicalize=False)
    # stage rebuilt with a valid manifest
    m = ln.read_manifest(OUT, "edges")
    assert m["rows"] > 0 and m["signature"]


def test_bucket_granular_merge_resume(first_run):
    """Deleting individual merge-shuffle bucket checkpoints recomputes ONLY
    those buckets on rerun (key-range manifests for the wide stages);
    untouched buckets keep their files and the final table is unchanged."""
    path, _ = first_run
    before = _read_sorted("nodes_merged")

    base = os.path.join(OUT, "nodes_merged")
    victims = ["bucket_3", "bucket_17"]
    for v in victims:
        shutil.rmtree(os.path.join(base, v))
    survivor = os.path.join(base, "bucket_5", ln.MANIFEST)
    survivor_mtime = os.path.getmtime(survivor)

    run_kg(path, OUT, canonicalize=False)

    # victims restored, survivor untouched (not rewritten)
    for v in victims:
        assert os.path.exists(os.path.join(base, v, ln.MANIFEST)), v
    assert os.path.getmtime(survivor) == survivor_mtime
    after = _read_sorted("nodes_merged")
    pd.testing.assert_frame_equal(before, after)


def test_bucketed_stage_signature_stable_across_rebuild(first_run):
    """A bucket rebuild that reproduces identical data must not invalidate
    downstream stages: the stage-level signature is the set of bucket
    signatures, which depend only on inputs+config."""
    path, _ = first_run
    from mmgraphrag_ray.config import DEFAULT_CONFIG
    from mmgraphrag_ray.stages.merge import N_BUCKETS

    sig1 = ln.bucketed_stage_signature(OUT, "edges_merged", DEFAULT_CONFIG, N_BUCKETS)
    shutil.rmtree(os.path.join(OUT, "edges_merged", "bucket_9"))
    run_kg(path, OUT, canonicalize=False)
    sig2 = ln.bucketed_stage_signature(OUT, "edges_merged", DEFAULT_CONFIG, N_BUCKETS)
    assert sig1 == sig2

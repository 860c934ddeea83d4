"""Per-stage checkpointing with lineage manifests + resume.

The reference's resume machinery is file-existence idempotence: skip
preprocess if the image-data store is non-empty (mmgraphrag.py:150-163), skip
MinerU if the .md exists (pdf2md_preprocessing.py:321-331), content-hash
anti-joins for docs/chunks (preprocessing.py:112-150), skip a fused image if
its merged GraphML exists (fusion.py:1006-1010).  North_rule upgrades this to
"per-partition lineage + metrics so a killed ray job resumes without
recomputing completed partitions".

Design: each pipeline stage writes its Dataset to ``<out>/<stage>/`` via a
TEMP directory + atomic rename, then drops a ``_MANIFEST.json`` recording
the lineage signature (input fingerprint + config hash + stage version),
row count, schema and wall time.  On rerun, a stage whose manifest matches
the current signature is NOT recomputed — its parquet is re-read and fed to
the next stage.  A kill between stages therefore loses at most the stage in
flight (its temp dir is orphaned and ignored).  Within a stage, the parquet
is a directory of part files, so a future finer-grained resume can skip
completed key ranges; stage granularity is what the pipeline graph needs
because every stage boundary here is an all-to-all shuffle (a half-finished
shuffle has no resumable partial state anyway).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict

import ray.data

MANIFEST = "_MANIFEST.json"


def input_fingerprint(path: str) -> dict:
    """Cheap content fingerprint of an input file/dir (size+mtime per file)."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            _dirs.sort()  # os.walk order is fs-dependent; sort so the
            # fingerprint (hence every stage signature) is order-independent
            for f in sorted(files):
                if f.startswith("_"):
                    continue
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append((os.path.relpath(p, path), st.st_size, int(st.st_mtime)))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, int(st.st_mtime)))
    return {"path": os.path.abspath(path), "files": entries}


def stage_signature(stage: str, version: int, cfg, input_fps: list[dict]) -> str:
    payload = {
        "stage": stage,
        "version": version,
        "config": asdict(cfg) if hasattr(cfg, "__dataclass_fields__") else cfg,
        "inputs": input_fps,
    }
    return hashlib.md5(json.dumps(payload, sort_keys=True, default=str).encode()).hexdigest()


def stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def is_complete(out_dir: str, stage: str, signature: str) -> bool:
    mpath = os.path.join(stage_dir(out_dir, stage), MANIFEST)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return manifest.get("signature") == signature


def write_stage(ds: ray.data.Dataset, out_dir: str, stage: str, signature: str) -> str:
    """Write Dataset -> <out>/<stage>/ atomically with a lineage manifest.
    Returns the stage directory path."""
    final = stage_dir(out_dir, stage)
    tmp = final + f"._tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.time()
    ds.write_parquet(tmp)
    rows = ray.data.read_parquet(tmp).count()
    wall = time.time() - t0
    manifest = {
        "stage": stage,
        "signature": signature,
        "rows": rows,
        "schema": [str(f) for f in ray.data.read_parquet(tmp).schema().base_schema],
        "wall_sec": round(wall, 3),
        "parts": sorted(os.listdir(tmp)),
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return final


def read_stage(out_dir: str, stage: str) -> ray.data.Dataset:
    return ray.data.read_parquet(stage_dir(out_dir, stage))


def read_manifest(out_dir: str, stage: str) -> dict:
    with open(os.path.join(stage_dir(out_dir, stage), MANIFEST)) as f:
        return json.load(f)


# ----------------------------------------------- partition-level checkpoints


def partitioned_stage(
    out_dir: str,
    stage: str,
    input_shards: list[str],
    build_one,
    cfg,
    version: int = 1,
) -> str:
    """Per-PARTITION checkpointing for an embarrassingly parallel stage:
    one output partition (+ manifest) per input shard; a rerun recomputes
    only shards whose checkpoint is missing or stale (north_rule: a killed
    job resumes without recomputing completed partitions).  `build_one`
    maps one input shard path -> Dataset.  Returns the stage directory;
    read it back with read_stage (pyarrow ignores the manifests)."""
    base = stage_dir(out_dir, stage)
    os.makedirs(base, exist_ok=True)
    for shard_path in input_shards:
        pname = "part=" + os.path.splitext(os.path.basename(shard_path))[0]
        pdir = os.path.join(base, pname)
        sig = stage_signature(
            f"{stage}/{pname}", version, cfg, [input_fingerprint(shard_path)]
        )
        mpath = os.path.join(pdir, MANIFEST)
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    if json.load(f).get("signature") == sig:
                        continue  # partition complete and current
            except (OSError, json.JSONDecodeError):
                pass
        tmp = pdir + f"._tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        t0 = time.time()
        build_one(shard_path).write_parquet(tmp)
        rows = ray.data.read_parquet(tmp).count()
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "partition": pname,
                    "input": shard_path,
                    "signature": sig,
                    "rows": rows,
                    "wall_sec": round(time.time() - t0, 3),
                },
                f,
                indent=2,
            )
        shutil.rmtree(pdir, ignore_errors=True)
        os.replace(tmp, pdir)
    return base


def bucketed_stage(
    out_dir: str,
    stage: str,
    n_buckets: int,
    build_missing,
    cfg,
    upstream: list,
    version: int = 1,
    bucket_col: str = "_rbucket",
) -> str:
    """KEY-RANGE (hash-bucket) checkpointing for a SHUFFLE stage: the stage
    output is partitioned by its reduce bucket (crc32(key) % n_buckets — the
    same bucket the merge shuffle already groups by), one manifest per
    bucket.  A rerun recomputes ONLY the missing/stale buckets: the map side
    re-scans its input (a half-finished shuffle has no resumable map state),
    but reduce + write are restricted to the missing bucket set, and
    completed buckets are never rewritten.  This upgrades the merge shuffles
    from stage-granular to bucket-granular resume (north_rule per-partition
    lineage for the wide stages).

    ``build_missing(missing: list[int]) -> Dataset`` must return the stage
    output restricted to those buckets, carrying `bucket_col`.  Bucket dirs
    are named ``bucket_<b>`` (NOT hive ``key=value``) so re-reading the
    stage does not invent a partition column."""
    base = stage_dir(out_dir, stage)
    os.makedirs(base, exist_ok=True)

    def bucket_sig(b: int) -> str:
        return stage_signature(f"{stage}/bucket_{b}", version, cfg, upstream)

    def write_stage_manifest() -> None:
        # stage-level summary over the bucket manifests (observability +
        # the same read_manifest surface every other stage has)
        rows, sigs = 0, []
        for b in range(n_buckets):
            try:
                with open(os.path.join(base, f"bucket_{b}", MANIFEST)) as f:
                    m = json.load(f)
                rows += int(m.get("rows", 0))
                sigs.append(m.get("signature"))
            except (OSError, json.JSONDecodeError):
                sigs.append(None)
        payload = {
            "stage": stage,
            "granularity": "bucket",
            "n_buckets": n_buckets,
            "signature": stage_signature(stage, 1, cfg, [{"buckets": sigs}]),
            "rows": rows,
            "wall_sec": 0,  # per-bucket manifests carry the real timings
        }
        mpath = os.path.join(base, MANIFEST)
        try:  # no-op rerun must not touch the file (mtime = resume evidence)
            with open(mpath) as f:
                if json.load(f) == payload:
                    return
        except (OSError, json.JSONDecodeError):
            pass
        with open(mpath, "w") as f:
            json.dump(payload, f, indent=2)

    missing = []
    for b in range(n_buckets):
        mpath = os.path.join(base, f"bucket_{b}", MANIFEST)
        try:
            with open(mpath) as f:
                if json.load(f).get("signature") == bucket_sig(b):
                    continue
        except (OSError, json.JSONDecodeError):
            pass
        missing.append(b)
    if not missing:
        write_stage_manifest()
        return base

    tmp = base + f"._tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    t0 = time.time()
    ds = build_missing(missing)
    ds.write_parquet(tmp, partition_cols=[bucket_col])
    wall = time.time() - t0
    for b in missing:
        src = os.path.join(tmp, f"{bucket_col}={b}")
        dst = os.path.join(base, f"bucket_{b}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.exists(src):
            rows = ray.data.read_parquet(src).count()
            os.replace(src, dst)
        else:  # empty bucket: stamp a manifest so reruns skip it
            rows = 0
            os.makedirs(dst, exist_ok=True)
        with open(os.path.join(dst, MANIFEST), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "bucket": b,
                    "signature": bucket_sig(b),
                    "rows": rows,
                    "wall_sec": round(wall, 3),
                },
                f,
                indent=2,
            )
    shutil.rmtree(tmp, ignore_errors=True)
    write_stage_manifest()
    return base


def bucketed_stage_signature(out_dir: str, stage: str, cfg, n_buckets: int) -> str:
    """Stage-level signature = the set of bucket signatures (stable across a
    bucket REBUILD with identical inputs, so downstream stages are not
    invalidated by a resume that reproduced the same data)."""
    sigs = []
    for b in range(n_buckets):
        mpath = os.path.join(stage_dir(out_dir, stage), f"bucket_{b}", MANIFEST)
        try:
            with open(mpath) as f:
                sigs.append(json.load(f)["signature"])
        except (OSError, json.JSONDecodeError, KeyError):
            sigs.append(None)
    return stage_signature(stage, 1, cfg, [{"buckets": sigs}])


def list_shards(corpus_dir: str) -> list[str]:
    if os.path.isdir(corpus_dir):
        return sorted(
            os.path.join(corpus_dir, f)
            for f in os.listdir(corpus_dir)
            if f.endswith(".parquet")
        )
    return [corpus_dir]

"""Deterministic synthetic source-code corpus (the `files` input table).

Shape per BASELINE.json input_hint: ``files(repo, path, commit, lang,
content)``; FIXTURES.md F1.  Fully seeded + ASCII-only so tokenization is
identical between Python `re` and DuckDB RE2 (see tokenizer.py).  Built-in
properties that exercise the pipeline:

- one mega-repo holding ~30% of files (shuffle/skew, FIXTURES.md F1),
- a hot symbol ``log_event`` called from almost every file (hot entity key
  in the edge merge — the skew case north_rule calls out),
- exact duplicate contents every 37th file (exact-dedup path, reference
  preprocessing.py:107-150),
- a size mix where ~25% of files span more than one 1200-token chunk window.

Content grammar (what the deterministic extractor recognizes — see
stages/extract.py): a ``# module: <name>`` marker before the header and each
def block, ``import <module>`` lines, ``def <name>(...)`` / ``class <Name>``
definitions, and call sites shaped ``<lhs> = <callee>(<args>)``.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

CORPUS_VERSION = 5  # v5: 16 shard files — Ray parallelizes reads per FILE
N_SHARDS = 16
SEED = 42
LANGS = ["python", "python", "python", "python", "go", "js"]
HOT_FUNCS = ["log_event", "get_config", "to_json"]


def _module_name(pkg: int, mod: int) -> str:
    return f"pkg_{pkg}.mod_{mod}"


def _gen_file(i: int, n_files: int, seed: int) -> dict:
    rng = random.Random(f"corpus:{seed}:{i}")
    # mega-repo skew: ~30% of files in org0/repo0
    if rng.random() < 0.30:
        repo = "org0/repo0"
    else:
        n_repos = max(4, n_files // 40)
        repo = f"org{1 + i % 7}/repo{1 + rng.randrange(n_repos)}"
    pkg, mod = i % 23, i
    module = _module_name(pkg, mod)
    lang = LANGS[rng.randrange(len(LANGS))]
    path = f"src/pkg_{pkg}/mod_{mod}." + {"python": "py", "go": "go", "js": "js"}[lang]
    commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()

    # size mix: small / medium (multi-chunk) / large
    r = rng.random()
    n_defs = rng.randrange(3, 7) if r < 0.70 else (rng.randrange(10, 18) if r < 0.95 else rng.randrange(30, 45))

    lines = [f"# module: {module}", f'"""Module {module} in {repo} ({lang})."""']
    for _ in range(rng.randrange(2, 5)):
        tgt = _module_name(rng.randrange(23), rng.randrange(n_files))
        lines.append(f"import {tgt}")
    lines.append("")

    for d in range(n_defs):
        lines.append(f"# module: {module}")
        if rng.random() < 0.2:
            cname = f"Handler_{mod}_{d}"
            lines.append(f"class {cname}:")
            lines.append(f'    """Class {cname}."""')
            indent = "    "
        else:
            indent = ""
        fname = f"fn_{mod}_{d}" if rng.random() < 0.8 else f"shared_fn_{d % 9}"
        lines.append(f"{indent}def {fname}(a, b):")
        lines.append(f'{indent}    """Does step {d} of {module}."""')
        # call sites: locality-biased callees + a hot global symbol
        for c in range(rng.randrange(1, 4)):
            if rng.random() < 0.55:
                callee = HOT_FUNCS[rng.randrange(len(HOT_FUNCS))] if rng.random() < 0.6 else f"shared_fn_{rng.randrange(9)}"
            else:
                near = max(0, min(n_files - 1, mod + rng.randrange(-5, 6)))
                callee = f"fn_{near}_{rng.randrange(5)}"
            lines.append(f"{indent}    x{c} = {callee}(a + {rng.randrange(1000)})")
        for p in range(rng.randrange(2, 8)):
            lines.append(f"{indent}    v{p} = {rng.randrange(100000)} * {rng.randrange(97)} + {p}")
        lines.append(f"{indent}    return x0 if a > {rng.randrange(50)} else b")
        lines.append("")

    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": "\n".join(lines),
    }


def generate_files_table(n_files: int, seed: int = SEED) -> pa.Table:
    rows = [_gen_file(i, n_files, seed) for i in range(n_files)]
    # exact duplicate contents (different repo/path) every 37th file
    for i in range(17, n_files, 37):
        rows[i]["content"] = rows[i - 17]["content"]
    return pa.table(
        {
            "repo": pa.array([r["repo"] for r in rows], pa.string()),
            "path": pa.array([r["path"] for r in rows], pa.string()),
            "commit": pa.array([r["commit"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "content": pa.array([r["content"] for r in rows], pa.large_string()),
        }
    )


def n_files_for_sf(sf_dir: str) -> int:
    """Map a /root/testdata/sf<X> dir to a corpus size (sf0.01 -> 800)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    sf = float(base.replace("sf", "")) if base.startswith("sf") else 0.01
    return max(40, int(round(80000 * sf)))


def corpus_path(sf_dir: str, root: str = "/tmp/raykg_corpus") -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(root, f"{base}_v{CORPUS_VERSION}", "files.parquet")


def ensure_corpus_n(n_files: int, tag: str, root: str = "/tmp/raykg_corpus") -> str:
    """Generate (once, atomically) a deterministic corpus of `n_files`;
    returns the parquet DIRECTORY path (N_SHARDS part files — Ray's read
    parallelism is per file, a single file reads serially; measured 3.9 s of
    serial wall at 20k files). Safe to call from several processes."""
    out = os.path.join(root, f"{tag}_v{CORPUS_VERSION}", "files.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    table = generate_files_table(n_files)
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    shard = max(1, (table.num_rows + N_SHARDS - 1) // N_SHARDS)
    for i in range(0, table.num_rows, shard):
        pq.write_table(
            table.slice(i, shard),
            os.path.join(tmp, f"part-{i // shard:04d}.parquet"),
            row_group_size=500,
        )
    os.replace(tmp, out)  # atomic on same fs
    return out


def ensure_corpus(sf_dir: str, root: str = "/tmp/raykg_corpus") -> str:
    """Corpus for an sf dir (sf0.01 -> 800 files)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return ensure_corpus_n(n_files_for_sf(sf_dir), base, root)

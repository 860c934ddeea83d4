"""Import-dependency graph over the source-code corpus.

Repo-level context assembly (StarCoder-style) and corpus curation both
need the module dependency graph: which modules are imported most (keep
their docs, order files topologically, weight training mixtures).  The
reference's KG is built from extracted entity mentions; this is the
static-analysis analog over the same files corpus — a pure text scan,
no parser needed for the corpus's import grammar.

Shape: one vectorized extraction pass over `content` (compiled regexes,
pandas .str kernels — no per-row Python), one hash shuffle bucketed on
the DESTINATION module so global edge dedup and in-degree counting
happen in the same reduce task, then a tiny sort+limit on the
module-level aggregate (rows = #modules, not #files).  At 100 TB the
only all-to-all moves (src, dst) string pairs already deduped per batch.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

from ..arrowutil import strip_pd_metadata

# first `# module: X` header names the file's own module; every
# line-anchored `import X` names a dependency (the corpus grammar is the
# same for py/go/js shards)
MODULE_RE = re.compile(r"(?m)^# module: ([\w.]+)")
IMPORT_RE = re.compile(r"(?m)^import ([\w.]+)")


def _extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    src = batch["content"].str.extract(MODULE_RE, expand=False)
    dst = batch["content"].str.findall(IMPORT_RE)
    df = pd.DataFrame({"src_module": src, "dst_module": dst}).explode(
        "dst_module"
    )
    df = df.dropna()
    df = df[df["src_module"] != ""]
    # local dedup: a module re-imported across the repo's files collapses
    # here, so the shuffle moves near-distinct pairs
    return df.drop_duplicates(ignore_index=True)


def import_edges(files_ds, n_buckets: int = 32):
    """DISTINCT (src_module, dst_module) import edges from the corpus.

    Bucketed on dst_module so downstream in-degree counting can reuse
    the same partitioning without a second shuffle.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = _extract_batch(batch)
        df["_bucket"] = (
            df["dst_module"]
            .map(lambda s: zlib.crc32(s.encode()) % n_buckets)
            .astype("int32")
        )
        return strip_pd_metadata(df) if len(df) else df

    def dedup(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["src_module", "dst_module"])[
            ["src_module", "dst_module"]
        ]

    return (
        files_ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
    )


def import_indegree_topk(files_ds, k: int = 20, n_buckets: int = 32):
    """Top-k modules by in-degree (distinct importing modules).

    Fused with the edge shuffle: all edges of a dst land in one bucket,
    so dedup + count happen in the same reduce task; only the
    per-module aggregate (#modules rows) reaches the final sort+limit.
    -> Dataset(module, in_degree) ordered by (in_degree desc, module).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = _extract_batch(batch)
        df["_bucket"] = (
            df["dst_module"]
            .map(lambda s: zlib.crc32(s.encode()) % n_buckets)
            .astype("int32")
        )
        return strip_pd_metadata(df) if len(df) else df

    def count(bucket: pd.DataFrame) -> pd.DataFrame:
        e = bucket.drop_duplicates(["src_module", "dst_module"])
        vc = e["dst_module"].value_counts()
        return pd.DataFrame(
            {
                "module": vc.index.astype(str),
                "in_degree": vc.to_numpy().astype("int64"),
            }
        )

    deg = (
        files_ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(count, batch_format="pandas")
    )
    return deg.sort(
        ["in_degree", "module"], descending=[True, False]
    ).limit(k)

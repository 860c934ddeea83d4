"""Sequence packing — the pretraining-data op that concatenates a document
stream into fixed-size token windows (one training sequence = ``window``
tokens, documents packed back to back in doc_id order).

The core primitive is a DISTRIBUTED PREFIX SUM (exclusive scan) over an
ordered corpus, done without a global sort:

1. map: per-doc token counts, stamped with a deterministic RANGE id
   (``doc_id // range_size`` — the corpus's natural ordered partitioning);
2. one tiny grouped sum: total tokens per range (rows = number of ranges,
   NOT number of docs — this is the only thing the driver ever holds);
3. driver: cumulative sum over the range totals -> per-range start offset,
   broadcast via the task closure (bytes ~ #ranges);
4. map side again: per-range local cumsum in doc_id order + the range's
   broadcast offset = every doc's exact global token offset.

At 100 TB the driver state is one int per range (e.g. 1e5 ranges for 1e12
docs at range_size=1e7) — the scan never materializes per-doc data outside
the workers.  Output rows are per-doc spans: which packed sequences the doc
lands in.  All-integer, so the table is bit-exact against the SQL mirror
(a single ``sum() OVER (ORDER BY doc_id)`` window).
"""

from __future__ import annotations

import re

import pandas as pd

from ..hashing import bucket_ints, bucket_strs
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"


class _TokenCountStage:
    def __init__(self, id_col: str, text_col: str, range_size: int):
        self.word = re.compile(TOKEN_RE)
        self.id_col, self.text_col = id_col, text_col
        self.range_size = range_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        counts = [len(self.word.findall(t.lower())) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
                "rng": pa.array(
                    [i // self.range_size for i in ids], pa.int64()
                ),
            }
        )


def pack_sequences(
    documents_ds,
    window: int = 512,
    range_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(doc_id, n_tokens, start_off, end_off, first_seq, last_seq)

    ``start_off`` is the doc's exclusive-prefix-sum token offset in doc_id
    order; sequence ``s`` covers tokens [s*window, (s+1)*window); a doc
    spans sequences first_seq..last_seq (empty docs occupy zero tokens and
    report the sequence their offset falls into)."""
    import zlib

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg

    counts = documents_ds.map_batches(
        _TokenCountStage(id_col, text_col, range_size), batch_format="pyarrow"
    ).materialize()

    # tiny table: one row per range — the ONLY data the driver touches
    range_sums = bucketed_groupby_agg(
        counts.map_batches(lambda b: b[["rng", "n_tokens"]], batch_format="pandas"),
        keys=["rng"],
        aggs={"rsum": ("n_tokens", "sum")},
    ).to_pandas().sort_values("rng", kind="mergesort")
    csum = range_sums["rsum"].cumsum()
    offsets = dict(
        zip(range_sums["rng"], (csum - range_sums["rsum"]).astype("int64"))
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_ints(b["rng"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def scan_range(bucket: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for rng, g in bucket.groupby("rng", sort=False):
            g = g.sort_values("doc_id", kind="mergesort")
            local = g["n_tokens"].cumsum() - g["n_tokens"]
            start = (local + offsets[int(rng)]).astype("int64")
            end = start + g["n_tokens"]
            last_pos = end.where(g["n_tokens"] == 0, end - 1)
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": g["doc_id"],
                        "n_tokens": g["n_tokens"],
                        "start_off": start,
                        "end_off": end,
                        "first_seq": start // window,
                        "last_seq": (last_pos // window).astype("int64"),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64")
                 for c in ("doc_id", "n_tokens", "start_off", "end_off",
                           "first_seq", "last_seq")}
            )
        return pd.concat(frames, ignore_index=True)

    return (
        counts.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(scan_range, batch_format="pandas")
        .repartition(8)
    )


def pack_manifest(spans_ds, window: int):
    """Expand the per-doc spans from :func:`pack_sequences` into the
    training-sequence manifest: one row per (sequence, doc) intersection
    with the doc's token range WITHIN that sequence —
    ``(seq_id, doc_id, tok_start, tok_end)``, ``tok_*`` in [0, window].

    Pure vectorized flat-map (np.repeat + cumcount), no shuffle: a doc
    spanning s sequences emits s rows.  Zero-token docs occupy no window
    and are dropped."""
    import numpy as np

    _EMPTY = ("seq_id", "doc_id", "tok_start", "tok_end")

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_tokens"] > 0]
        if not len(b):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in _EMPTY})
        reps = (b["last_seq"] - b["first_seq"] + 1).to_numpy()
        idx = np.repeat(np.arange(len(b)), reps)
        within = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        seq = b["first_seq"].to_numpy()[idx] + within
        start_off = b["start_off"].to_numpy()[idx]
        end_off = b["end_off"].to_numpy()[idx]
        return pd.DataFrame(
            {
                "seq_id": seq.astype("int64"),
                "doc_id": b["doc_id"].to_numpy()[idx],
                "tok_start": np.maximum(start_off, seq * window) - seq * window,
                "tok_end": np.minimum(end_off, (seq + 1) * window) - seq * window,
            }
        )

    return spans_ds.map_batches(expand, batch_format="pandas")


def repo_context_pack(files_ds, n_buckets: int = 32):
    """Repo-level context assembly (StarCoder-style repo packing): every
    repo's files concatenated in path order behind '<<<path>>>' headers,
    reduced to (repo, n_files, total_chars, packed_md5) — the md5 stands
    in for shipping the packed blob through the driver, so the oracle
    value-checks the exact concatenation without moving it.

    One hash shuffle on repo; a repo's files meet in one reduce task
    (repos are human-sized — the packing unit is bounded by construction;
    monster repos would be split by path prefix upstream).  The packed
    payload itself would be written straight to parquet from the reduce
    task at scale, never collected.
    """
    import hashlib
    import zlib

    from ..arrowutil import strip_pd_metadata

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["repo", "path", "content"]].copy()
        out["_bucket"] = bucket_strs(out["repo"], n_buckets)
        return strip_pd_metadata(out) if len(out) else out

    def pack(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for repo, g in bucket.groupby("repo", sort=False):
            g = g.sort_values("path", kind="mergesort")
            blob = "\n".join(
                "<<<" + p + ">>>\n" + c
                for p, c in zip(g["path"], g["content"])
            )
            rows.append(
                (
                    repo,
                    len(g),
                    int(g["content"].str.len().sum()),
                    hashlib.md5(blob.encode()).hexdigest(),
                )
            )
        return pd.DataFrame(
            rows, columns=["repo", "n_files", "total_chars", "packed_md5"]
        ).astype({"n_files": "int64", "total_chars": "int64"})

    return (
        files_ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pack, batch_format="pandas")
        .repartition(8)
    )

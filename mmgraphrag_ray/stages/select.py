"""Data selection via importance resampling (DSIR) over `documents`.

The published DSIR recipe (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") scores every raw document by the
log-likelihood ratio of a hashed n-gram bag-of-features model fit on a
small TARGET corpus vs one fit on the RAW corpus, then resamples by the
weights.  It is the canonical "pick the 5% of 100 TB that looks like the
eval domain" curation pass — squarely in this repo's training-data-ops
family next to decontamination (`stages/dedup.decontaminate`) and quality
gates (`pipelines/relational.doc_curation`).  The reference engine has no
data-selection stage at all (SURVEY §2.8's extension surface).

This implementation is the hashed-UNIGRAM variant with two documented,
deterministic surrogates so the whole chain is integer-exact and hence
SQL-mirrorable (same discipline as tf-idf's ``tf*1e6//df``):

- the per-bucket score is the SCALED LIKELIHOOD RATIO
  ``lr(b) = ((ct_t(b)+1) * SCALE * (R+B)) // ((ct_r(b)+1) * (T+B))``
  (add-one smoothing; T/R = total target/raw token counts, B = n_buckets)
  and a document's weight is the count-weighted SUM of ratios
  ``w(d) = sum_b c_d(b) * lr(b)`` — a monotone surrogate of the paper's
  sum of log ratios (log would be float and hash-diverge across engines);
- selection is deterministic top-k by weight (the paper adds Gumbel noise
  for sampling-without-replacement; the no-noise limit is rank-by-weight).

Scale shape: pass 1 is a per-batch combiner emitting at most ``n_buckets``
partial rows per batch (feature space is CONSTANT-size by construction —
that is the point of hashed features), reduced with one tiny bucketed
groupby; the lr table (n_buckets ints) is broadcast once via ``ray.put``;
pass 2 is a stateless map over the docs.  Nothing shuffles per-token rows
and driver state is O(n_buckets), independent of corpus size.

Target-corpus convention shared with ``decontaminate``: the deterministic
slice ``doc_id % target_mod == 0`` stands in for the small external eval
set a real run would load.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

TOKEN_RE = r"[a-z]+"
SCALE = 1_000_000
N_FEATURE_BUCKETS = 256


def _tok_bucket(tok: str, n_buckets: int) -> int:
    """md5-derived feature hash — SQL mirror:
    ('0x' || substr(md5(tok),1,8))::UBIGINT % n_buckets."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


class _FeatureCountStage:
    """Per-batch combiner: hashed-unigram bucket counts for the raw corpus
    and the target slice — at most n_buckets rows out per batch."""

    def __init__(self, id_col, text_col, n_buckets, target_mod):
        self.word = re.compile(TOKEN_RE)
        self.id_col, self.text_col = id_col, text_col
        self.n_buckets, self.target_mod = n_buckets, target_mod
        self._bcache: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        b = self._bcache.get(tok)
        if b is None:
            b = self._bcache[tok] = _tok_bucket(tok, self.n_buckets)
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = np.zeros(self.n_buckets, dtype=np.int64)
        tgt = np.zeros(self.n_buckets, dtype=np.int64)
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        for doc_id, text in zip(ids, texts):
            is_t = doc_id % self.target_mod == 0
            for tok in self.word.findall(text.lower()):
                b = self._bucket(tok)
                raw[b] += 1
                if is_t:
                    tgt[b] += 1
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "b": pa.array(nz, pa.int64()),
                "t_c": pa.array(tgt[nz], pa.int64()),
                "r_c": pa.array(raw[nz], pa.int64()),
            }
        )


class _WeightStage:
    """Pass 2: per-doc hashed counts x the broadcast lr table."""

    def __init__(self, id_col, text_col, n_buckets, target_mod, lr_ref):
        self.word = re.compile(TOKEN_RE)
        self.id_col, self.text_col = id_col, text_col
        self.n_buckets, self.target_mod = n_buckets, target_mod
        self.lr = np.asarray(ray.get(lr_ref), dtype=np.int64)
        self._bcache: dict[str, int] = {}

    def _bucket(self, tok: str) -> int:
        b = self._bcache.get(tok)
        if b is None:
            b = self._bcache[tok] = _tok_bucket(tok, self.n_buckets)
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        n_toks, weights, is_tgt = [], [], []
        counts = np.zeros(self.n_buckets, dtype=np.int64)
        for doc_id, text in zip(ids, texts):
            counts[:] = 0
            n = 0
            for tok in self.word.findall(text.lower()):
                counts[self._bucket(tok)] += 1
                n += 1
            n_toks.append(n)
            weights.append(int(counts @ self.lr))
            is_tgt.append(int(doc_id % self.target_mod == 0))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "is_target": pa.array(is_tgt, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "weight": pa.array(weights, pa.int64()),
            }
        )


def dsir_weights(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_FEATURE_BUCKETS,
    target_mod: int = 97,
    scale: int = SCALE,
):
    """-> Dataset(id_col, is_target, n_tokens, weight) for EVERY document
    (token-less docs get weight 0), weight = the integer DSIR importance
    surrogate described in the module docstring."""
    from .groupagg import bucketed_groupby_agg

    parts = docs_ds.map_batches(
        _FeatureCountStage(id_col, text_col, n_buckets, target_mod),
        batch_format="pyarrow",
    )
    counts = bucketed_groupby_agg(
        parts, keys=["b"], aggs={"ct": ("t_c", "sum"), "cr": ("r_c", "sum")}
    )
    rows = counts.take_all()  # <= n_buckets rows by construction
    t_tot = sum(r["ct"] for r in rows)
    r_tot = sum(r["cr"] for r in rows)
    lr = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        # exact Python-int arithmetic; result bounded by scale * (R+B)/(T+B)
        lr[r["b"]] = ((r["ct"] + 1) * scale * (r_tot + n_buckets)) // (
            (r["cr"] + 1) * (t_tot + n_buckets)
        )
    lr_ref = ray.put(lr)
    return docs_ds.map_batches(
        _WeightStage(id_col, text_col, n_buckets, target_mod, lr_ref),
        batch_format="pyarrow",
    )


def dsir_topk(docs_ds, k: int = 50, **kw):
    """The resampling step in its deterministic no-noise limit: the k
    NON-TARGET documents with the highest importance weight (rank by
    weight desc, doc_id asc).  -> Dataset(doc_id, n_tokens, weight, rank)."""
    from .window import grouped_topk

    id_col = kw.get("id_col", "doc_id")
    w = dsir_weights(docs_ds, **kw)
    cand = w.map_batches(
        lambda b: b[b["is_target"] == 0].assign(_g=np.int64(0))[
            ["_g", id_col, "n_tokens", "weight"]
        ],
        batch_format="pandas",
    )
    top = grouped_topk(cand, keys=["_g"], order_col="weight", k=k,
                       tie_cols=[id_col])
    return top.map_batches(
        lambda b: b[[id_col, "n_tokens", "weight", "rank"]],
        batch_format="pandas",
    )


def pareto_skyline(ds, x_col: str, y_col: str, keep_cols: list[str]):
    """2-D Pareto skyline (maximize both axes): every row NOT dominated by
    another row — dominated means the other is >= on both axes and > on at
    least one (duplicate points survive together).  The multi-objective
    "best quality at every cost level" selection query.

    Scale shape: the skyline operator is a PERFECT combiner — any point
    dominated within one batch is dominated globally, so skyline(S) is a
    subset of the union of per-batch skylines.  Each batch reduces to its
    local frontier (vectorized sort + prefix-max sweep), the survivors
    (output-sized, not input-sized) gather on one partition, and the same
    sweep runs once more.  No shuffle ever carries a dominated row.

    -> Dataset(keep_cols..., x_col, y_col)."""
    cols = list(dict.fromkeys(keep_cols + [x_col, y_col]))

    def local_skyline(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch[cols] if set(cols) <= set(batch.columns) else \
                pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
        b = batch[cols].sort_values([x_col, y_col], ascending=False,
                                    kind="mergesort").reset_index(drop=True)
        x = b[x_col].to_numpy()
        y = b[y_col].to_numpy()
        # prefix max of y over STRICTLY-greater x (group boundaries), and
        # the max y within each equal-x group
        new_x = np.concatenate([[True], x[1:] != x[:-1]])
        gid = np.cumsum(new_x) - 1
        # max y per x-group = first y in the group (sorted y desc in group)
        grp_max = y[new_x][gid]
        # prev_max[i] = max grp_max over groups strictly before gid[i]
        grp_heads = grp_max[new_x]  # one per group, in x-desc order
        prev = np.concatenate([[np.iinfo(np.int64).min],
                               np.maximum.accumulate(grp_heads)[:-1]])
        prev_max = prev[gid]
        keep = (y > prev_max) & (y == grp_max)
        return b[keep]

    pruned = ds.map_batches(local_skyline, batch_format="pandas")
    return (
        pruned.repartition(1)
        .map_batches(local_skyline, batch_format="pandas")
    )


def maxcover_select(docs_ds, k: int = 4, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Greedy max-coverage data selection — pick the k documents that
    together cover the most distinct word BIGRAMS (the classic Nemhauser
    greedy with its (1 - 1/e) guarantee; in training-data curation this is
    the "smallest seed set that spans the corpus" pass used to pick
    few-shot/eval anchors or bootstrap corpora).  Bigrams, not unigrams:
    the coverage universe must be larger than one document's footprint for
    greedy selection to discriminate (the synthetic corpus has a 31-word
    vocabulary — any doc covers it — but 916 distinct bigrams).  The
    reference engine has no data-selection stage (SURVEY §2.8 extension
    surface) — this sits next to dsir_topk/token_budget_select in the
    selection family.

    Exact greedy is inherently sequential in k, so each of the k rounds is
    ONE distributed pass: filter the exploded (doc, token) pairs against
    the broadcast covered-token set (bounded by k x max-doc-vocab — tiny,
    shipped once per round via ray.put), fold per-doc gains with the
    combiner groupby, take the global argmax with grouped_topk (gain desc,
    doc_id asc).  Driver state is the k winners + covered set, O(k·|doc|)
    — independent of corpus size.  The exploded pair table is materialized
    ONCE and re-read k+1 times (multi-consumer pin; at petabyte scale this
    would be a checkpoint-to-parquet instead).

    -> Dataset(round, doc_id, gain, covered_total), one row per round:
    the winner, its marginal gain, and the running distinct-token total.
    """
    import ray.data

    from ..arrowutil import df_to_table, strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    WORD = r"([A-Za-z]+)"

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # Arrow empty block (not pandas) so Ray's pandas batch-size
        # estimator never sees an empty string column (np.vectorize
        # size-0 log noise in pandas_block.py)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "tok": pa.array([], pa.string())})
        if len(b) == 0:
            return empty
        ex = b[text_col].reset_index(drop=True).str.extractall(WORD)
        df = ex.reset_index()  # level_0 = row, match = token seq in row
        if len(df) == 0:
            return empty
        # bigram = token + next token of the SAME row (extractall emits
        # matches row-major, so a single shift + same-row mask suffices)
        same_row = df["level_0"].shift(-1).to_numpy() == df["level_0"].to_numpy()
        bg = df[0] + " " + df[0].shift(-1)
        out = pd.DataFrame({
            "doc_id": b[id_col].to_numpy()[df.loc[same_row, "level_0"].to_numpy()],
            "tok": bg[same_row],
        }).drop_duplicates().reset_index(drop=True)
        return strip_pd_metadata(out) if len(out) else empty

    pairs = docs_ds.map_batches(explode, batch_format="pandas").materialize()

    covered: set = set()
    selected: list = []
    rows = []
    for rnd in range(1, k + 1):
        cov_ref = ray.put(covered)
        sel = set(selected)

        def gains_of(b: pd.DataFrame, cov_ref=cov_ref, sel=sel) -> pd.DataFrame:
            cov = ray.get(cov_ref)
            m = ~b["tok"].isin(cov)
            if sel:
                m &= ~b["doc_id"].isin(sel)
            out = b.loc[m, ["doc_id"]].reset_index(drop=True)
            return strip_pd_metadata(out) if len(out) else out

        gains = bucketed_groupby_agg(
            pairs.map_batches(gains_of, batch_format="pandas"),
            keys=["doc_id"],
            aggs={"gain": (None, "count")},
        ).map_batches(
            lambda b: strip_pd_metadata(b.assign(_g=np.int64(0)))
            if len(b) else b.assign(_g=pd.Series(dtype="int64")),
            batch_format="pandas",
        )
        top = grouped_topk(
            gains, keys=["_g"], order_col="gain", k=1, tie_cols=["doc_id"]
        ).take_all()
        if not top:
            break
        win_id = top[0]["doc_id"]
        win_gain = int(top[0]["gain"])
        selected.append(win_id)
        wtoks = pairs.map_batches(
            lambda b, w=win_id: df_to_table(b[b["doc_id"] == w][["tok"]]),
            batch_format="pandas",
        ).take_all()
        covered |= {r["tok"] for r in wtoks}
        rows.append({"round": rnd, "doc_id": win_id, "gain": win_gain,
                     "covered_total": len(covered)})

    out = pd.DataFrame(rows, columns=["round", "doc_id", "gain",
                                      "covered_total"])
    for c in ["round", "gain", "covered_total"]:
        out[c] = out[c].astype("int64")
    return ray.data.from_pandas(out)


def lm_quality_buckets(
    docs_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_lo: float = 0.3,
    q_hi: float = 0.7,
):
    """CCNet-style quality partition (Wenzek et al. 2020): score every doc
    with the corpus-trained integer bigram LM (index.bigram_lm_scores),
    reduce each doc to mean_p = lm_score // n_bigrams (fixed-point mean
    next-token probability), pick the exact type-1 ``q_lo``/``q_hi``
    boundaries of mean_p with the rank-targeted histogram selector (no
    global sort), then bucket: head (mean_p >= hi boundary), middle
    (lo <= mean_p < hi), tail (< lo) — the head/middle/tail split CCNet
    feeds to its per-bucket sampler.

    -> Dataset(bucket, n_docs, n_bigrams, min_mean_p, max_mean_p); a
    bucket emptied by boundary ties is absent (same in the SQL mirror).
    Docs with < 2 tokens have no LM score and are outside every bucket.

    Scale shape: LM scoring is bigram_lm_scores' documented streaming
    plan; the per-doc (id, 3 ints) score table is materialized once and
    consumed twice (boundary selection + classification) — a bounded pin,
    ~32 B/doc, that a 100 TB run would swap for a parquet checkpoint; the
    selector holds bin counts only; classification streams against two
    broadcast ints; the final reduce is a 3-group fold.
    """
    from .groupagg import bucketed_groupby_agg, global_quantiles
    from .index import bigram_lm_scores

    def add_mean(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            b = b.copy()
            b["mean_p"] = pd.Series(dtype="int64")
            return b
        b = b.copy()
        b["mean_p"] = (b["lm_score"] // b["n_bigrams"]).astype("int64")
        return b

    scored = (
        bigram_lm_scores(docs_ds, id_col=id_col, text_col=text_col)
        .map_batches(add_mean, batch_format="pandas")
        .materialize()
    )
    bounds = {
        r["q"]: int(r["value"])
        for r in global_quantiles(scored, "mean_p", qs=[q_lo, q_hi]).take_all()
    }
    # Same label format as global_quantiles (zero-padded): q=0.05 -> "p05".
    lo = bounds[f"p{int(round(q_lo * 100)):02d}"]
    hi = bounds[f"p{int(round(q_hi * 100)):02d}"]

    def classify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "bucket": pd.Series(dtype=object),
                "n_bigrams": pd.Series(dtype="int64"),
                "mean_p": pd.Series(dtype="int64"),
            })
        m = b["mean_p"].to_numpy()
        bucket = np.where(m >= hi, "head", np.where(m < lo, "tail", "middle"))
        return pd.DataFrame({
            "bucket": bucket,
            "n_bigrams": b["n_bigrams"].to_numpy(),
            "mean_p": m,
        })

    return bucketed_groupby_agg(
        scored.map_batches(classify, batch_format="pandas"),
        keys=["bucket"],
        aggs={
            "n_docs": (None, "count"),
            "n_bigrams": ("n_bigrams", "sum"),
            "min_mean_p": ("mean_p", "min"),
            "max_mean_p": ("mean_p", "max"),
        },
    )


def leakage_safe_split(labels_ds, val_pct: int = 10,
                       id_col: str = "id", label_col: str = "label"):
    """Leakage-safe train/val assignment: the split key is the NEAR-DUP
    COMPONENT label (e.g. dedup_minhash output), not the document id, so
    near-duplicate documents always land on the same side — the guard
    every eval split over web-scale corpora needs (a val doc's near-twin
    in train is silent contamination).  Deterministic md5 bucketing (the
    engine's SQL-mirrorable hash family): split = 'val' iff
    int(md5(str(label))[:8], 16) % 100 < val_pct.

    -> Dataset(id, label, split); pure map over the labels table (the
    component computation upstream carries all the shuffle cost)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from ..arrowutil import dataset_arrow_types, df_to_table

    # empty-batch schema derives from the INPUT dataset's declared types
    # (id/label are caller parameters — string ids must not float-promote
    # into an int64 empty schema; ADVICE r3)
    in_types = dataset_arrow_types(labels_ds)

    def assign(b: pd.DataFrame):
        if len(b) == 0:
            return pa.schema(
                [(id_col, in_types.get(id_col, pa.int64())),
                 (label_col, in_types.get(label_col, pa.int64())),
                 ("split", pa.string())]).empty_table()
        pct = b[label_col].map(
            lambda v: int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100
        )
        return df_to_table(pd.DataFrame({
            id_col: b[id_col],
            label_col: b[label_col],
            "split": (pct < val_pct).map({True: "val", False: "train"}),
        }))

    return labels_ds.map_batches(assign, batch_format="pandas")


def stratified_sample(ds, stratum_col: str, id_col: str = "id",
                      pct: int = 10):
    """EXACT per-stratum consistent sample: within every stratum keep the
    ``ceil(pct/100 * n)`` rows with the smallest md5-derived hash of the id
    — stratified holdout selection with the reproducibility of
    hash-threshold sampling (membership is a pure function of the id and
    the per-stratum quantile, so strata keep their exact proportions even
    under skewed stratum sizes, where a global ``md5 % 100 < pct`` filter
    drifts on small strata).

    Scale shape: one pass computes (stratum, h); the per-stratum threshold
    is window.group_quantiles' exact type-1 selection (one hash shuffle of
    fixed-width rows, DuckDB quantile_disc semantics, so the SQL mirror is
    ``h <= quantile_disc(h, pct/100) OVER (PARTITION BY stratum)``); the
    thresholds table (one row per stratum) attaches back through the
    capped dual plan and the keep filter is a vectorized map.

    -> Dataset(id_col, stratum_col) of the sampled rows."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    from ..arrowutil import df_to_table
    from .join import attach_dim
    from .window import group_quantiles

    def hashed(b: pd.DataFrame):
        out = pd.DataFrame({
            id_col: b[id_col],
            stratum_col: b[stratum_col],
            "_h": b[id_col].map(
                lambda v: int(hashlib.md5(
                    str(v).encode()).hexdigest()[:8], 16)
            ).astype("int64"),
        } if len(b) else {
            id_col: pd.Series(dtype="int64"),
            stratum_col: pd.Series(dtype=object),
            "_h": pd.Series(dtype="int64"),
        })
        return df_to_table(out)

    hds = ds.map_batches(hashed, batch_format="pandas").materialize()
    qcol = f"p{int(round(pct)):02d}"
    thr = group_quantiles(
        hds.map_batches(
            lambda b: b[[stratum_col, "_h"]], batch_format="pandas"),
        keys=[stratum_col], value_col="_h", qs=[pct / 100.0],
    ).map_batches(
        lambda b: df_to_table(pd.DataFrame({
            stratum_col: b[stratum_col],
            "_thr": b[qcol].astype("int64"),
        } if len(b) else {stratum_col: pd.Series(dtype=object),
                          "_thr": pd.Series(dtype="int64")})),
        batch_format="pandas",
    )

    kept = attach_dim(hds, thr, on=stratum_col)

    def keep(b: pd.DataFrame):
        return df_to_table(
            b.loc[b["_h"] <= b["_thr"], [id_col, stratum_col]]
            if len(b) else b[[id_col, stratum_col]])

    return kept.map_batches(keep, batch_format="pandas")

"""Inverted-index construction + TF-IDF term scoring over `documents`.

The classic retrieval-side operators a large-scale training/eval pipeline
needs next to dedup and quality filtering (the reference's retrieval is
vector-only — NanoVectorDB, storage.py:236-290; these are the lexical
complements, built the same Ray-Data-first way):

- ``token_postings``: token -> document frequency + a capped, sorted
  posting list.  Per-batch combiner emits one row per distinct token per
  batch (never per-occurrence rows), so the shuffle moves a vocabulary
  table bounded by batches x vocab, not token occurrences.  Because every
  doc's rows live in exactly one input batch, per-batch distinct (token,
  doc) pairs are globally distinct and partial df counts sum exactly.
- ``doc_tfidf_topk``: top-k terms per document by an ALL-INTEGER tf-idf
  surrogate ``score = tf * SCORE_SCALE // df`` (floor division — rarer
  tokens score higher, ties break on the token string), so the ranking is
  bit-deterministic under any shuffle order and exactly SQL-mirrorable
  (float idf = ln(N/df) would hash-diverge across engines).

Both use the md5-free lowercase ``[a-z]+`` word inventory shared with the
textstats oracles.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..hashing import bucket_strs
import pyarrow as pa

TOKEN_RE = r"[a-z]+"
SCORE_SCALE = 1_000_000
MAX_POSTINGS = 16


class _DocTokenStage:
    """Per-batch combiner: distinct (token, doc) pairs -> one partial row
    per token with (partial df, capped ascending doc-id list)."""

    def __init__(self, id_col: str, text_col: str, max_postings: int):
        self.word = re.compile(TOKEN_RE)
        self.id_col, self.text_col = id_col, text_col
        self.max_postings = max_postings

    def __call__(self, batch: pa.Table) -> pa.Table:
        per_tok: dict[str, list[int]] = {}
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        for doc_id, text in zip(ids, texts):
            for tok in set(self.word.findall(text.lower())):
                per_tok.setdefault(tok, []).append(doc_id)
        toks, dfs, posts = [], [], []
        for tok, doc_ids in per_tok.items():
            doc_ids.sort()
            toks.append(tok)
            dfs.append(len(doc_ids))
            posts.append(doc_ids[: self.max_postings])
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "post": pa.array(posts, pa.list_(pa.int64())),
            }
        )


def token_postings(
    documents_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = MAX_POSTINGS,
    min_df: int = 1,
):
    """-> Dataset(token, df, postings) — document frequency plus the first
    ``max_postings`` doc ids (ascending, comma-joined string).  Capped
    partials compose exactly: each partial keeps its smallest ids, so the
    global smallest ``max_postings`` ids are always within the union of
    partial lists."""
    import zlib

    from ..arrowutil import strip_pd_metadata

    partials = documents_ds.map_batches(
        _DocTokenStage(id_col, text_col, max_postings), batch_format="pyarrow"
    )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_strs(b["token"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def final(bucket: pd.DataFrame) -> pd.DataFrame:
        toks, dfs, posts = [], [], []
        for tok, g in bucket.groupby("token", sort=False):
            df_total = int(g["df"].sum())
            if df_total < min_df:
                continue
            merged: list[int] = []
            for lst in g["post"]:
                merged.extend(int(x) for x in lst)
            merged.sort()
            toks.append(tok)
            dfs.append(df_total)
            posts.append(",".join(str(x) for x in merged[:max_postings]))
        return pd.DataFrame({"token": toks, "df": dfs, "postings": posts})

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
        .repartition(8)
    )


class _TermFreqStage:
    """Exact per-document term frequencies: (doc_id, token, tf) rows."""

    def __init__(self, id_col: str, text_col: str):
        self.word = re.compile(TOKEN_RE)
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids_out, toks, tfs = [], [], []
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        for doc_id, text in zip(ids, texts):
            for tok, tf in Counter(self.word.findall(text.lower())).items():
                ids_out.append(doc_id)
                toks.append(tok)
                tfs.append(tf)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )


def doc_tfidf_topk(
    documents_ds,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k terms per document by integer tf-idf surrogate.

    -> Dataset(doc_id, token, tf, df, score, rank) with
    ``score = tf * SCORE_SCALE // df`` and rank 1..k per doc ordered by
    (score desc, token asc).  Plan: tf rows (map-side, exact) ⋈ df table
    (token-bucketed join — both sides shuffled by token, no broadcast of
    the vocabulary), then the combiner-based grouped top-k."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join
    from .window import grouped_topk

    documents_ds = documents_ds.materialize()
    tf_rows = documents_ds.map_batches(
        _TermFreqStage(id_col, text_col), batch_format="pyarrow"
    ).materialize()
    # df = number of docs containing the token = count of tf rows per token
    df_tbl = bucketed_groupby_agg(
        tf_rows.map_batches(lambda b: b[["token"]], batch_format="pandas"),
        keys=["token"],
        aggs={"df": (None, "count")},
    )
    joined = bucketed_join(tf_rows, df_tbl, on="token", small_side="right")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "token": pd.Series(dtype="string"),
                    "tf": pd.Series(dtype="int64"),
                    "df": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="int64"),
                }
            )
        out = b[["doc_id", "token", "tf", "df"]].copy()
        out["score"] = out["tf"] * SCORE_SCALE // out["df"]
        return out

    scored = joined.map_batches(score, batch_format="pandas")
    return grouped_topk(
        scored, keys=["doc_id"], order_col="score", k=k, tie_cols=["token"]
    )


class _SkipgramStage:
    """Per-batch combiner: windowed ORDERED token-pair counts — one row per
    distinct (left, right) pair per batch (vocabulary²-bounded, never
    per-occurrence), the word2vec/GloVe co-occurrence map side."""

    def __init__(self, text_col: str, window: int):
        self.word = re.compile(TOKEN_RE)
        self.text_col, self.window = text_col, window

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text in batch.column(self.text_col).to_pylist():
            toks = self.word.findall(text.lower())
            for d in range(1, self.window + 1):
                counts.update(zip(toks[:-d] if d else toks, toks[d:]))
        ls, rs, ns = [], [], []
        for (l, r), n in counts.items():
            ls.append(l)
            rs.append(r)
            ns.append(n)
        return pa.table(
            {
                "l": pa.array(ls, pa.string()),
                "r": pa.array(rs, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )


def skipgram_topk(
    documents_ds,
    window: int = 3,
    k: int = 30,
    min_count: int = 2,
    text_col: str = "text",
):
    """Corpus-wide skip-gram co-occurrence: ORDERED pairs (left, right) of
    tokens at position distance 1..window within a document, counted over
    the whole corpus — the co-occurrence-matrix construction step of
    word2vec/GloVe-style embedding training, here as a streaming Ray Data
    operator (the reference has no lexical statistics at all; same
    extension family as token_postings/tf-idf above).

    -> Dataset(l, r, n, rank): top-k pairs with n >= min_count, rank by
    (n desc, l, r).

    Scale shape: per-batch Counter combiner bounds shuffle rows by
    distinct-pairs-per-batch (vocab-bounded), one bucketed grouped sum,
    then the combiner top-k — identical discipline to token_postings."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    parts = documents_ds.map_batches(
        _SkipgramStage(text_col, window), batch_format="pyarrow"
    )
    sums = bucketed_groupby_agg(
        parts, keys=["l", "r"], aggs={"n": ("n", "sum")}
    ).map_batches(
        lambda b: b[b["n"] >= min_count], batch_format="pandas"
    ).map_batches(
        lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
    )
    top = grouped_topk(sums, keys=["_g"], order_col="n", k=k,
                       tie_cols=["l", "r"])
    return top.map_batches(
        lambda b: b[["l", "r", "n", "rank"]], batch_format="pandas"
    )


def doc_commonness(documents_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document token-commonness score: over each doc's DISTINCT
    lowercase ``[a-z]+`` tokens, the count and the sum of global document
    frequencies — sum_df/n is the "how boilerplate is this doc" quality
    signal (high mean df = made of ubiquitous tokens; low = rare/technical
    vocabulary).  Kept as the integer pair (n_distinct_tokens, sum_df) so
    the result is bit-exact vs SQL; the consumer divides.

    Scale shape: pass A builds the df table with the same per-batch
    combiner discipline as token_postings (one row per distinct token per
    batch); pass B re-emits distinct (doc, token) pairs, joins df on the
    token-bucketed `bucketed_join`, and folds per doc — two bounded
    shuffles, no driver state, no per-occurrence rows.

    -> Dataset(doc_id, n_distinct_tokens, sum_df).
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    word = re.compile(TOKEN_RE)

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        per_tok: dict[str, int] = {}
        for text in batch[text_col]:
            for tok in set(word.findall(text.lower())):
                per_tok[tok] = per_tok.get(tok, 0) + 1
        return pd.DataFrame(
            {"token": pd.array(list(per_tok.keys()), dtype="string"),
             "df": np.fromiter(per_tok.values(), dtype=np.int64,
                               count=len(per_tok))}
        )

    df_tbl = bucketed_groupby_agg(
        documents_ds.map_batches(df_partial, batch_format="pandas"),
        keys=["token"],
        aggs={"df": ("df", "sum")},
    )

    def pair_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, toks = [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            for tok in set(word.findall(text.lower())):
                ids.append(doc_id)
                toks.append(tok)
        return pd.DataFrame(
            {id_col: np.asarray(ids, dtype=np.int64),
             "token": pd.array(toks, dtype="string")}
        )

    pairs = documents_ds.map_batches(pair_rows, batch_format="pandas")
    joined = bucketed_join(pairs, df_tbl, on="token", how="inner")
    return bucketed_groupby_agg(
        joined,
        keys=[id_col],
        aggs={"n_distinct_tokens": (None, "count"), "sum_df": ("df", "sum")},
    )


def bigram_lm_scores(documents_ds, id_col: str = "doc_id",
                     text_col: str = "text", scale: int = 1_000_000):
    """Per-document bigram-LM fluency score — the CCNet/KenLM
    perplexity-filter analog re-expressed integer-exact: train a bigram
    model ON THE CORPUS ITSELF (count tables, no smoothing needed because
    every scored bigram was observed), then score each doc by the sum over
    its bigram positions of  p = floor(scale * c2(a,b) / c1(a))  — the
    fixed-point conditional probability of each next token.  High mean
    p (= lm_score / n_bigrams, consumer divides) = predictable/fluent
    text; low = rare constructions or noise.  Log-free so the score is
    bit-deterministic and exactly SQL-mirrorable (float log-perplexity
    would hash-diverge).

    -> Dataset(doc_id, n_bigrams, lm_score); docs with < 2 tokens have no
    bigram positions and are absent (same in the SQL mirror).

    Scale shape: pass A folds per-batch bigram-count partials through one
    bucketed reduce (rows bounded by distinct bigrams per batch, not
    positions); the context table c1 derives from c2 by a second grouped
    sum over the COUNT table, never the corpus.  Pass B re-emits per-doc
    distinct-bigram rows with multiplicity k (positions with equal bigrams
    collapse: k * p), joins c2 then c1 via token-bucketed `bucketed_join`
    (vocabulary-sized tables — never broadcast), folds per doc.  Driver
    state: none.  Integer bound: scale * max-bigram-count must fit int64 —
    with scale=1e6, valid to ~9e12 total corpus bigram occurrences; drop
    scale at larger corpora (the SQL mirror computes the product in
    HUGEINT so the CONTRACT, not the mirror, is the bound).
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    word = re.compile(TOKEN_RE)

    def bigram_count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        per_bg: dict[str, int] = {}
        for text in batch[text_col]:
            toks = word.findall(text.lower())
            for a, b in zip(toks, toks[1:]):
                key = a + " " + b
                per_bg[key] = per_bg.get(key, 0) + 1
        bgs = list(per_bg.keys())
        return pd.DataFrame(
            {"bigram": pd.array(bgs, dtype="string"),
             "lft": pd.array([s.split(" ", 1)[0] for s in bgs],
                             dtype="string"),
             "n2": np.fromiter(per_bg.values(), dtype=np.int64,
                               count=len(per_bg))}
        )

    c2 = bucketed_groupby_agg(
        documents_ds.map_batches(bigram_count_partial, batch_format="pandas"),
        keys=["bigram"],
        aggs={"lft": ("lft", "min"), "n2": ("n2", "sum")},
    )
    c1 = bucketed_groupby_agg(
        c2.map_batches(lambda b: b[["lft", "n2"]], batch_format="pandas"),
        keys=["lft"],
        aggs={"n1": ("n2", "sum")},
    )

    def doc_bigram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids, bgs, ks = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            toks = word.findall(text.lower())
            per_bg: dict[str, int] = {}
            for a, b in zip(toks, toks[1:]):
                key = a + " " + b
                per_bg[key] = per_bg.get(key, 0) + 1
            for key, k in per_bg.items():
                ids.append(doc_id)
                bgs.append(key)
                ks.append(k)
        return pd.DataFrame(
            {id_col: np.asarray(ids, dtype=np.int64),
             "bigram": pd.array(bgs, dtype="string"),
             "k": np.asarray(ks, dtype=np.int64)}
        )

    rows = documents_ds.map_batches(doc_bigram_rows, batch_format="pandas")
    j2 = bucketed_join(rows, c2, on="bigram", how="inner")
    j1 = bucketed_join(
        j2.map_batches(lambda b: b[[id_col, "lft", "k", "n2"]],
                       batch_format="pandas"),
        c1, on="lft", how="inner",
    )

    def contrib(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"),
                 "k": pd.Series(dtype="int64"),
                 "c": pd.Series(dtype="int64")}
            )
        n2 = b["n2"].to_numpy(dtype=np.int64)
        n1 = b["n1"].to_numpy(dtype=np.int64)
        k = b["k"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {id_col: b[id_col].to_numpy(dtype=np.int64),
             "k": k,
             "c": k * ((scale * n2) // n1)}
        )

    return bucketed_groupby_agg(
        j1.map_batches(contrib, batch_format="pandas"),
        keys=[id_col],
        aggs={"n_bigrams": ("k", "sum"), "lm_score": ("c", "sum")},
    )

"""Lexical retrieval: BM25 top-k and reciprocal-rank fusion.

The reference's retrieval is vector-only (NanoVectorDB cosine top-k,
storage.py:236-290 / query.py:63-76); these are the lexical complements a
training-data pipeline runs next to it (mining eval sets, hard-negative
selection, corpus search).  Built the same Ray-Data-first way as
stages/index.py and with the same ALL-INTEGER scoring discipline so every
ranking is bit-deterministic under any shuffle order and exactly
SQL-mirrorable:

- ``bm25_topk``: Okapi BM25 with k1 = 6/5 and b = 3/4 kept as RATIONALS.
  The per-term score is one integer expression (S = ``IDF_SCALE``)::

      idf_s      = (N * S) // df                      # rarity surrogate
      num        = 44 * tf * L                        # = 20L * tf*(k1+1)
      den        = 20*L*tf + 6*L + 18*dl*N            # = 20L * (tf + k1*(1-b) + k1*b*dl/avgdl)
      term_score = (idf_s * num) // den

  i.e. the standard tf-saturation/length-normalization shape with avgdl =
  L/N cleared of all division except the final floor (float BM25 — ln idf,
  float avgdl — would hash-diverge across engines; this surrogate is
  monotone in the same variables).  The intermediate product exceeds int64
  at corpus scale, so the scoring kernel runs on Python ints (object
  dtype) over the CANDIDATE rows only — candidates are docs containing a
  query term, never the corpus — and the SQL mirror casts through HUGEINT.

- ``rrf_fuse``: reciprocal-rank fusion of any rank tables,
  ``contribution = RRF_SCALE // (rrf_k + rank)`` (integer floor; Cormack &
  Clarke's 1/(60+r) scaled exact), summed per (query, doc).

Scale shape: the query vocabulary is tiny by definition and rides in the
task closure; corpus stats (N, L) and per-term df are O(#batches) /
O(#terms) combiner partials reduced on the driver (bounded state); the
only shuffles are a bucketed sum over candidate (qid, doc) pairs and the
combiner-based grouped top-k.  The full corpus is scanned exactly twice
(stats pass + candidate pass), both streaming.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-z]+"
IDF_SCALE = 100_000
RRF_SCALE = 1_000_000
RRF_K = 60


def _normalize_queries(queries: dict[str, str | list[str]]) -> dict[str, list[str]]:
    """Query text -> sorted distinct lowercase [a-z]+ terms."""
    word = re.compile(TOKEN_RE)
    out = {}
    for qid, q in queries.items():
        toks = q if isinstance(q, list) else word.findall(q.lower())
        out[qid] = sorted({t.lower() for t in toks})
    return out


class _CandidateStage:
    """Per-batch: (doc_id, term, tf, dl) rows for query-vocab terms only,
    where dl = the doc's TOTAL token count (all terms, not just matches)."""

    def __init__(self, vocab: frozenset[str], id_col: str, text_col: str):
        self.word = re.compile(TOKEN_RE)
        self.vocab = vocab
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids_out, terms, tfs, dls = [], [], [], []
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        for doc_id, text in zip(ids, texts):
            toks = self.word.findall(text.lower())
            counts = Counter(toks)
            dl = len(toks)
            for term in self.vocab:
                tf = counts.get(term, 0)
                if tf:
                    ids_out.append(doc_id)
                    terms.append(term)
                    tfs.append(tf)
                    dls.append(dl)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
            }
        )


def _corpus_stats(documents_ds, text_col: str) -> tuple[int, int]:
    """(N docs, L total tokens) via per-batch combiner partials — one tiny
    row per input batch crosses to the driver, never document rows."""
    word_pat = TOKEN_RE

    def partial(batch: pa.Table) -> pa.Table:
        word = re.compile(word_pat)
        texts = batch.column(text_col).to_pylist()
        total = sum(len(word.findall(t.lower())) for t in texts)
        return pa.table(
            {"n": pa.array([len(texts)], pa.int64()),
             "toks": pa.array([total], pa.int64())}
        )

    parts = documents_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()), int(parts["toks"].sum())


def bm25_topk(
    documents_ds,
    queries: dict[str, str | list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """-> Dataset(qid, doc_id, score, rank): top-k documents per query by
    the integer BM25 surrogate (module docstring), rank 1..k ordered by
    (score desc, doc_id asc).  Multi-term scores are integer sums, so the
    result is shuffle-order-independent."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    qterms = _normalize_queries(queries)
    vocab = frozenset(t for ts in qterms.values() for t in ts)
    if not vocab:
        raise ValueError("queries contain no [a-z]+ terms")

    documents_ds = documents_ds.materialize()
    n_docs, total_len = _corpus_stats(documents_ds, text_col)

    cands = documents_ds.map_batches(
        _CandidateStage(vocab, id_col, text_col), batch_format="pyarrow"
    ).materialize()

    # df per term: combiner partial counts -> O(#terms) rows on the driver
    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"term": pd.Series(dtype="string"),
                 "c": pd.Series(dtype="int64")}
            )
        out = b.groupby("term", sort=False).size().rename("c").reset_index()
        out["term"] = out["term"].astype("string")
        out["c"] = out["c"].astype("int64")
        return out

    df_parts = cands.map_batches(df_partial, batch_format="pandas").to_pandas()
    df_by_term = (
        df_parts.groupby("term")["c"].sum().astype(int).to_dict()
        if len(df_parts)
        else {}
    )
    idf_by_term = {
        t: (n_docs * IDF_SCALE) // df for t, df in df_by_term.items()
    }

    N, L = n_docs, total_len

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out_qid, out_doc, out_sc = [], [], []
        terms = batch["term"].to_numpy()
        docs = batch["doc_id"].to_numpy()
        tfs = batch["tf"].to_numpy()
        dls = batch["dl"].to_numpy()
        for term, doc, tf, dl in zip(terms, docs, tfs, dls):
            idf = idf_by_term.get(term)
            if idf is None:
                continue
            # Python ints: the product idf*num exceeds int64 at scale
            tf_i, dl_i = int(tf), int(dl)
            num = 44 * tf_i * L
            den = 20 * L * tf_i + 6 * L + 18 * dl_i * N
            s = (idf * num) // den
            for qid, ts in qterms.items():
                if term in ts:
                    out_qid.append(qid)
                    out_doc.append(int(doc))
                    out_sc.append(s)
        return pd.DataFrame(
            {
                "qid": pd.array(out_qid, dtype="string"),
                "doc_id": np.asarray(out_doc, dtype=np.int64),
                "score": np.asarray(out_sc, dtype=np.int64),
            }
        )

    scored = cands.map_batches(score, batch_format="pandas")
    sums = bucketed_groupby_agg(
        scored, keys=["qid", "doc_id"], aggs={"score": ("score", "sum")}
    )
    return grouped_topk(
        sums, keys=["qid"], order_col="score", k=k, tie_cols=["doc_id"]
    )


def tf_topk(
    documents_ds,
    queries: dict[str, str | list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Plain term-frequency ranking (sum of query-term tf per doc), the
    classic weak baseline BM25 improves on — here mainly the second system
    for ``rrf_fuse``.  -> Dataset(qid, doc_id, score, rank), score = total
    tf, rank by (score desc, doc_id asc)."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    qterms = _normalize_queries(queries)
    vocab = frozenset(t for ts in qterms.values() for t in ts)
    if not vocab:
        raise ValueError("queries contain no [a-z]+ terms")

    cands = documents_ds.map_batches(
        _CandidateStage(vocab, id_col, text_col), batch_format="pyarrow"
    )

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        out_qid, out_doc, out_tf = [], [], []
        for term, doc, tf in zip(batch["term"], batch["doc_id"], batch["tf"]):
            for qid, ts in qterms.items():
                if term in ts:
                    out_qid.append(qid)
                    out_doc.append(int(doc))
                    out_tf.append(int(tf))
        return pd.DataFrame(
            {
                "qid": pd.array(out_qid, dtype="string"),
                "doc_id": np.asarray(out_doc, dtype=np.int64),
                "score": np.asarray(out_tf, dtype=np.int64),
            }
        )

    sums = bucketed_groupby_agg(
        cands.map_batches(expand, batch_format="pandas"),
        keys=["qid", "doc_id"],
        aggs={"score": ("score", "sum")},
    )
    return grouped_topk(
        sums, keys=["qid"], order_col="score", k=k, tie_cols=["doc_id"]
    )


def rrf_fuse(rank_tables, k: int = 10, rrf_k: int = RRF_K):
    """Reciprocal-rank fusion of rank tables (qid, doc_id, rank, ...):
    rrf = sum over systems of RRF_SCALE // (rrf_k + rank) — all-integer,
    so fused ties and ordering are engine-exact.  A doc absent from a
    system's list contributes 0 from it (standard RRF over top-k lists).
    -> Dataset(qid, doc_id, rrf, rank), rank by (rrf desc, doc_id asc)."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    def contrib(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame(
                {
                    "qid": pd.Series(dtype="string"),
                    "doc_id": pd.Series(dtype="int64"),
                    "rrf": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "qid": batch["qid"].astype("string"),
                "doc_id": batch["doc_id"].astype("int64"),
                "rrf": (RRF_SCALE // (rrf_k + batch["rank"])).astype("int64"),
            }
        )

    import functools

    parts = [
        t.map_batches(contrib, batch_format="pandas") for t in rank_tables
    ]
    unioned = functools.reduce(lambda a, b: a.union(b), parts)
    sums = bucketed_groupby_agg(
        unioned, keys=["qid", "doc_id"], aggs={"rrf": ("rrf", "sum")}
    )
    return grouped_topk(
        sums, keys=["qid"], order_col="rrf", k=k, tie_cols=["doc_id"]
    )


def prf_expansion_terms(
    documents_ds,
    queries: dict[str, str | list[str]],
    k_fb: int = 5,
    m_terms: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """RM3-style pseudo-relevance feedback, expansion half: run BM25,
    take each query's top ``k_fb`` documents as (pseudo-)relevant, and
    pick the ``m_terms`` terms with the highest summed term frequency
    across the feedback docs, excluding the query's own terms — the
    classic unsupervised query-expansion signal (Lavrenko/Croft relevance
    models; weights kept as raw integer tf sums rather than the smoothed
    float RM3 mixture so the table is bit-exact in SQL).

    -> Dataset(qid, term, w, rank), rank 1..m by (w desc, term asc).

    Scale shape: feedback sets are k_fb rows per query — broadcast-joined
    against the corpus (map-side filter; the corpus text never shuffles),
    per-batch tf partials fold through the bucketed reduce, one combiner
    top-m out."""
    import ray

    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    qterms = _normalize_queries(queries)
    documents_ds = documents_ds.materialize()
    fb = bm25_topk(documents_ds, queries, k=k_fb,
                   id_col=id_col, text_col=text_col)
    fb_df = fb.to_pandas()  # k_fb x #queries rows — driver-sized by contract
    fb_map: dict[int, list[str]] = {}
    for doc, qid in zip(fb_df["doc_id"], fb_df["qid"]):
        fb_map.setdefault(int(doc), []).append(str(qid))
    fb_ref = ray.put(fb_map)
    word = re.compile(TOKEN_RE)

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        fbm = ray.get(fb_ref)
        out_qid, out_term, out_w = [], [], []
        for doc, text in zip(batch[id_col], batch[text_col]):
            qids = fbm.get(int(doc))
            if not qids:
                continue
            tf: dict[str, int] = {}
            for t in word.findall(str(text).lower()):
                tf[t] = tf.get(t, 0) + 1
            for qid in qids:
                own = set(qterms[qid])
                for t, n in tf.items():
                    if t not in own:
                        out_qid.append(qid)
                        out_term.append(t)
                        out_w.append(n)
        from ..arrowutil import df_to_table

        return df_to_table(pd.DataFrame(
            {"qid": pd.array(out_qid, dtype="string"),
             "term": pd.array(out_term, dtype="string"),
             "w": np.asarray(out_w, dtype=np.int64)}
        ))

    sums = bucketed_groupby_agg(
        documents_ds.map_batches(tf_partial, batch_format="pandas"),
        keys=["qid", "term"],
        aggs={"w": ("w", "sum")},
    )
    top = grouped_topk(
        sums, keys=["qid"], order_col="w", k=m_terms, tie_cols=["term"]
    )
    return top.map_batches(
        lambda b: b[["qid", "term", "w", "rank"]], batch_format="pandas"
    )


def prf_topk(
    documents_ds,
    queries: dict[str, str | list[str]],
    k: int = 10,
    k_fb: int = 5,
    m_terms: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """RM3-style PRF, rerank half: expand each query with its
    ``prf_expansion_terms`` (unweighted union — the integer-exact
    simplification of the RM3 mixture) and re-run BM25 with the expanded
    term sets.  -> Dataset(qid, doc_id, score, rank) like bm25_topk.

    The expansion table is m_terms x #queries rows — a driver-sized
    round-trip by contract (queries themselves are driver inputs), same
    family as bm25_topk's per-term idf fold."""
    documents_ds = documents_ds.materialize()
    qterms = _normalize_queries(queries)
    terms = prf_expansion_terms(
        documents_ds, queries, k_fb=k_fb, m_terms=m_terms,
        id_col=id_col, text_col=text_col,
    ).to_pandas()
    expanded = {qid: sorted(ts) for qid, ts in qterms.items()}
    for qid, term in zip(terms["qid"], terms["term"]):
        if term not in expanded[str(qid)]:
            expanded[str(qid)].append(str(term))
    return bm25_topk(documents_ds, expanded, k=k,
                     id_col=id_col, text_col=text_col)


def boolean_and_retrieval(
    documents_ds,
    queries: dict[str, str | list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Conjunctive boolean retrieval (posting-list intersection): for each
    query, every document containing ALL of the query's distinct terms —
    the set-semantics complement of the ranked ``bm25_topk`` (filter-first
    retrieval, eval-set mining, "docs mentioning X AND Y" audits).

    -> Dataset(qid, doc_id, n_terms): one row per (query, matching doc),
    with the query's term count along for downstream confidence cuts.

    Scale shape: the query vocabulary rides in the task closure (tiny by
    definition); the corpus streams ONCE through the shared
    ``_CandidateStage`` (rows emitted only for docs containing >= 1 query
    term); matched-distinct-term counting is one bucketed grouped count
    over candidate (qid, doc) pairs — intersection via counting, no
    per-posting-list state anywhere."""
    from .groupagg import bucketed_groupby_agg

    qterms = _normalize_queries(queries)
    vocab = frozenset(t for ts in qterms.values() for t in ts)
    # (qid, term) pairs + required term count per qid, in the closure
    need = {qid: len(ts) for qid, ts in qterms.items()}
    term_to_qids: dict[str, list[str]] = {}
    for qid, ts in qterms.items():
        for t in ts:
            term_to_qids.setdefault(t, []).append(qid)

    cand = documents_ds.map_batches(
        _CandidateStage(vocab, id_col, text_col), batch_format="pyarrow"
    )

    def expand(batch: pd.DataFrame):
        # typed Arrow out even when empty: a plain pandas frame with an
        # object-dtype empty qid column trips Ray's batch-size estimator
        # (np.vectorize on size-0 input; ADVICE r4 / memory gotchas)
        from ..arrowutil import df_to_table

        if len(batch) == 0:
            return df_to_table(pd.DataFrame(
                {"qid": pd.Series(dtype=object),
                 "doc_id": pd.Series(dtype="int64")}))
        qids, dids = [], []
        for doc_id, term in zip(batch["doc_id"], batch["term"]):
            for qid in term_to_qids[term]:
                qids.append(qid)
                dids.append(doc_id)
        return df_to_table(pd.DataFrame(
            {"qid": pd.Series(qids, dtype=object),
             "doc_id": np.asarray(dids, dtype=np.int64)}))

    matched = bucketed_groupby_agg(
        cand.map_batches(expand, batch_format="pandas"),
        keys=["qid", "doc_id"],
        aggs={"n_matched": (None, "count")},
    )

    def keep_full(batch: pd.DataFrame):
        from ..arrowutil import df_to_table

        if len(batch) == 0:
            return df_to_table(pd.DataFrame(
                {"qid": pd.Series(dtype=object),
                 "doc_id": pd.Series(dtype="int64"),
                 "n_terms": pd.Series(dtype="int64")}))
        req = batch["qid"].map(need).astype("int64")
        out = batch[batch["n_matched"] == req]
        return df_to_table(pd.DataFrame(
            {"qid": pd.Series(out["qid"].to_numpy(), dtype=object),
             "doc_id": out["doc_id"].astype("int64").to_numpy(),
             "n_terms": req[batch["n_matched"] == req].to_numpy()}))

    return matched.map_batches(keep_full, batch_format="pandas")


def phrase_match(
    documents_ds,
    phrases: dict[str, tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Positional phrase retrieval: docs where the two words of a phrase
    query occur as ADJACENT tokens — the positional-index primitive plain
    bag-of-words retrieval (bm25_topk / boolean_and_retrieval) cannot
    express.  Token model is the module's `[a-z]+` runs; adjacency means
    no other token between the two (equivalently: w1 as a full token,
    one non-letter gap, w2 as a full token — the SQL mirror's boundary
    regex, exactly this predicate because tokens are maximal [a-z]+ runs).

    -> Dataset(qid, doc_id, n_hits): one row per (phrase, matching doc)
    with the exact adjacent-occurrence count.

    Shape: stateless single scan, one tokenizer pass per doc shared by
    all phrases (the phrase table rides the closure); output is
    match-sized.  No shuffle."""
    word = re.compile(TOKEN_RE)
    plist = sorted(phrases.items())

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        qids, dids, hits = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            toks = word.findall(str(text).lower())
            if len(toks) < 2:
                continue
            for qid, (w1, w2) in plist:
                n = sum(
                    1 for i in range(len(toks) - 1)
                    if toks[i] == w1 and toks[i + 1] == w2
                )
                if n:
                    qids.append(qid)
                    dids.append(doc_id)
                    hits.append(n)
        return pd.DataFrame({
            "qid": pd.Series(qids, dtype=object),
            "doc_id": pd.Series(dids, dtype="int64"),
            "n_hits": pd.Series(hits, dtype="int64"),
        })

    return documents_ds.map_batches(scan, batch_format="pandas")


MMR_PENALTY = 50_000  # integer λ trade-off: score − PEN·(shared terms)


def mmr_topk(
    documents_ds,
    queries: dict[str, str | list[str]],
    k: int = 5,
    n_candidates: int = 20,
    penalty: int = MMR_PENALTY,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    1998) — the result-diversification pass a training-data pipeline runs
    over retrieval output before human review or few-shot selection, so
    the k picks aren't k near-duplicates.

    All-integer MMR: relevance = the integer BM25 surrogate (bm25_topk);
    redundancy(a, b) = count of shared DISTINCT [a-z]+ tokens between the
    two docs; greedy round i picks, per query,
    ``argmax(score − penalty · max_sim_to_selected)`` with ties broken by
    doc_id asc (round 1 = plain argmax(score)).  Bit-deterministic under
    any shuffle order, so the DuckDB mirror unrolls the k greedy rounds.

    Scale shape: candidates are capped at ``n_candidates`` per query by
    bm25_topk (combiner top-k, no global sort), so the quadratic part —
    pairwise shared-term counts and the greedy itself — touches only
    O(q·n²) bounded work: candidate token sets ride ONE broadcast
    semi-join of the corpus (distinct terms per candidate doc), pair
    counts group by (qid, term) with ≤ n docs per group, and the greedy
    runs inside per-qid map_groups.  The corpus is never shuffled.

    -> Dataset(qid, doc_id, mmr_rank, mmr_score)."""
    import ray

    from .join import broadcast_semi_join

    cands = bm25_topk(
        documents_ds, queries, k=n_candidates, id_col=id_col,
        text_col=text_col,
    ).materialize()
    cand_df = cands.to_pandas()  # ≤ q·n rows by construction
    cand_ids = frozenset(int(x) for x in cand_df["doc_id"])
    qid_by_doc: dict[int, list[str]] = {}
    for qid, doc in zip(cand_df["qid"], cand_df["doc_id"]):
        qid_by_doc.setdefault(int(doc), []).append(str(qid))
    qmap_ref = ray.put(qid_by_doc)

    word = re.compile(TOKEN_RE)

    def cand_terms(batch: pd.DataFrame) -> pd.DataFrame:
        qmap = ray.get(qmap_ref)
        qids, docs, terms = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            for term in sorted(set(word.findall(text.lower()))):
                for qid in qmap[int(doc_id)]:
                    qids.append(qid)
                    docs.append(int(doc_id))
                    terms.append(term)
        return pd.DataFrame({
            "qid": pd.array(qids, dtype="string"),
            "doc_id": np.asarray(docs, dtype=np.int64),
            "term": pd.array(terms, dtype="string"),
        })

    toks = broadcast_semi_join(
        documents_ds, cand_ids, col=id_col
    ).map_batches(cand_terms, batch_format="pandas")

    def pair_counts(group: pd.DataFrame) -> pd.DataFrame:
        # one group = one (qid, term): ≤ n_candidates docs -> bounded pairs
        if len(group) < 2:
            return pd.DataFrame({
                "qid": pd.Series(dtype="string"),
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "shared": pd.Series(dtype="int64"),
            })
        out = []
        for (qid, _), g in group.groupby(["qid", "term"], sort=False):
            docs = np.sort(g["doc_id"].to_numpy())
            ia, ib = np.triu_indices(len(docs), k=1)
            out.append(pd.DataFrame({
                "qid": qid, "doc_a": docs[ia], "doc_b": docs[ib],
                "shared": np.ones(len(ia), dtype=np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    from .groupagg import bucketed_groupby_agg

    # pin: groupby(term) -> bucketed agg -> final groupby(qid) is 3 hash
    # shuffles (merge.py deadlock mitigation for this Ray build)
    pairs = bucketed_groupby_agg(
        toks.groupby("term").map_groups(pair_counts, batch_format="pandas"),
        keys=["qid", "doc_a", "doc_b"],
        aggs={"shared": ("shared", "sum")},
    ).materialize()

    # per-qid greedy: candidates + their pair sims in one group
    cand_rows = cands.map_batches(
        lambda b: b[["qid", "doc_id", "score"]].assign(
            _kind=np.int64(0), doc_a=np.int64(-1), doc_b=np.int64(-1),
            shared=np.int64(0)),
        batch_format="pandas",
    )
    pair_rows = pairs.map_batches(
        lambda b: b.assign(_kind=np.int64(1), doc_id=np.int64(-1),
                           score=np.int64(0))[
            ["qid", "doc_id", "score", "_kind", "doc_a", "doc_b", "shared"]
        ],
        batch_format="pandas",
    )

    def greedy(group: pd.DataFrame) -> pd.DataFrame:
        out_qid, out_doc, out_rank, out_score = [], [], [], []
        for qid, g in group.groupby("qid", sort=False):
            cand = g[g["_kind"] == 0]
            rel = dict(zip(cand["doc_id"].astype(int),
                           cand["score"].astype(int)))
            sim: dict[tuple[int, int], int] = {}
            for a, b, s in zip(g.loc[g["_kind"] == 1, "doc_a"].astype(int),
                               g.loc[g["_kind"] == 1, "doc_b"].astype(int),
                               g.loc[g["_kind"] == 1, "shared"].astype(int)):
                sim[(a, b)] = s
                sim[(b, a)] = s
            remaining = sorted(rel)  # doc_id asc = tie order
            selected: list[int] = []
            for rank in range(1, min(k, len(remaining) + len(selected)) + 1):
                best_doc, best_score = None, None
                for d in remaining:
                    ms = max((sim.get((d, s), 0) for s in selected),
                             default=0)
                    mmr = rel[d] - penalty * ms
                    if best_score is None or mmr > best_score:
                        best_doc, best_score = d, mmr
                out_qid.append(qid)
                out_doc.append(best_doc)
                out_rank.append(rank)
                out_score.append(best_score)
                selected.append(best_doc)
                remaining.remove(best_doc)
        return pd.DataFrame({
            # object dtype: this frame IS the query output (no Arrow
            # roundtrip downstream), and the oracle df carries object
            "qid": pd.Series(out_qid, dtype=object),
            "doc_id": np.asarray(out_doc, dtype=np.int64),
            "mmr_rank": np.asarray(out_rank, dtype=np.int64),
            "mmr_score": np.asarray(out_score, dtype=np.int64),
        })

    out = (
        cand_rows.union(pair_rows)
        .groupby("qid")
        .map_groups(greedy, batch_format="pandas")
    )
    # coalesce away schema-less empty blocks from empty hash partitions
    return out.repartition(4)

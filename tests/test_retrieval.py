"""stages/retrieval.py — BM25 integer surrogate, tf ranking, RRF fusion.

Serial-parity strategy: a pure-Python BM25 with the identical integer
formula over the same docs must match the distributed result exactly,
including under block splits (shuffle-order independence of integer sums).
"""

import re
from collections import Counter

import pandas as pd
import ray.data

from mmgraphrag_ray.stages.retrieval import (
    IDF_SCALE,
    RRF_SCALE,
    bm25_topk,
    rrf_fuse,
    tf_topk,
)

DOCS = [
    "hash join hash join batch merge",
    "window stream window spark spark spark",
    "vector filter scan scan",
    "hash batch batch batch window",
    "the quick brown fox",  # no query terms
    "join join join join join join join join",
    "",  # empty doc
    "spark",
]
QUERIES = {"qa": "hash join batch", "qb": "window stream spark"}


def _serial_bm25(docs, queries, k):
    word = re.compile(r"[a-z]+")
    toks = [word.findall(t.lower()) for t in docs]
    n, l_tot = len(docs), sum(len(t) for t in toks)
    qterms = {q: sorted(set(word.findall(s.lower()))) for q, s in queries.items()}
    vocab = {t for ts in qterms.values() for t in ts}
    tf = [{t: c for t, c in Counter(ts).items() if t in vocab} for ts in toks]
    df = Counter(t for d in tf for t in d)
    rows = []
    for qid, ts in qterms.items():
        scores = {}
        for doc_id, d in enumerate(tf):
            s = 0
            for t in ts:
                if t not in d:
                    continue
                idf = (n * IDF_SCALE) // df[t]
                num = 44 * d[t] * l_tot
                den = 20 * l_tot * d[t] + 6 * l_tot + 18 * len(toks[doc_id]) * n
                s += (idf * num) // den
            if s:
                scores[doc_id] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (doc_id, s) in enumerate(ranked, 1):
            rows.append((qid, doc_id, s, r))
    return pd.DataFrame(rows, columns=["qid", "doc_id", "score", "rank"])


def _docs_ds(n_blocks=3):
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    df["doc_id"] = df["doc_id"].astype("int64")
    return ray.data.from_pandas(df).repartition(n_blocks)


def _norm(df):
    df = df[["qid", "doc_id"] + [c for c in ("score", "rrf") if c in df]
            + ["rank"]].copy()
    for c in df.columns:
        if c != "qid":
            df[c] = df[c].astype("int64")
    df["qid"] = df["qid"].astype(str)
    return df.sort_values(["qid", "rank"]).reset_index(drop=True)


def test_bm25_matches_serial_reference():
    got = _norm(bm25_topk(_docs_ds(), QUERIES, k=5).to_pandas())
    want = _norm(_serial_bm25(DOCS, QUERIES, 5))
    pd.testing.assert_frame_equal(got, want)


def test_bm25_block_split_invariance():
    one = _norm(bm25_topk(_docs_ds(1), QUERIES, k=5).to_pandas())
    many = _norm(bm25_topk(_docs_ds(5), QUERIES, k=5).to_pandas())
    pd.testing.assert_frame_equal(one, many)


def test_bm25_length_normalization_prefers_short_doc():
    # doc 0 (6 tokens, tf=2 'join') vs doc 5 (8 tokens, tf=8 'join'):
    # saturation + length norm keep doc 5 ahead but bounded; both rank
    got = bm25_topk(_docs_ds(), {"q": "join"}, k=3).to_pandas()
    assert list(got.sort_values("rank")["doc_id"]) == [5, 0, 1][: len(got)]


def test_tf_topk_is_plain_tf_sum():
    got = _norm(tf_topk(_docs_ds(), {"qa": "hash join batch"}, k=3).to_pandas())
    # doc 5: 8 joins; doc 0: 2+2+1 = 5; doc 3: 1+3 = 4
    assert list(got["doc_id"]) == [5, 0, 3]
    assert list(got["score"]) == [8, 5, 4]


def test_rrf_fuse_integer_contributions():
    a = ray.data.from_pandas(pd.DataFrame(
        {"qid": ["q", "q"], "doc_id": [1, 2], "rank": [1, 2]}))
    b = ray.data.from_pandas(pd.DataFrame(
        {"qid": ["q", "q"], "doc_id": [2, 3], "rank": [1, 2]}))
    got = _norm(rrf_fuse([a, b], k=10).to_pandas())
    c1, c2 = RRF_SCALE // 61, RRF_SCALE // 62
    want = pd.DataFrame(
        {"qid": ["q", "q", "q"], "doc_id": [2, 1, 3],
         "rrf": [c1 + c2, c1, c2], "rank": [1, 2, 3]})
    pd.testing.assert_frame_equal(got, _norm(want))


def test_skipgram_topk_hand_counts_and_split_invariance():
    from mmgraphrag_ray.stages.index import skipgram_topk

    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1], dtype="int64"),
        "text": ["a b a b", "a b c"],
    })
    # window=2 ordered pairs: doc0: d1 (a,b)(b,a)(a,b); d2 (a,a)(b,b)
    #                         doc1: d1 (a,b)(b,c); d2 (a,c)
    # totals: (a,b)=3 (b,a)=1 (a,a)=1 (b,b)=1 (b,c)=1 (a,c)=1
    for blocks in (1, 3):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        got = skipgram_topk(ds, window=2, k=10, min_count=1).to_pandas()
        got = got.sort_values("rank").reset_index(drop=True)
        assert (got.iloc[0]["l"], got.iloc[0]["r"], got.iloc[0]["n"]) == \
            ("a", "b", 3)
        assert len(got) == 6
        # min_count filter drops the singletons
        got2 = skipgram_topk(ds, window=2, k=10, min_count=2).to_pandas()
        assert len(got2) == 1


def test_doc_commonness_integer_pairs():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.index import doc_commonness

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the cat sat", "the dog", "THE the zebra!"],
        }
    )
    out = (
        doc_commonness(ray.data.from_pandas(docs).repartition(3))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # df: the=3, cat=1, sat=1, dog=1, zebra=1
    assert out.loc[1, "n_distinct_tokens"] == 3 and out.loc[1, "sum_df"] == 5
    assert out.loc[2, "n_distinct_tokens"] == 2 and out.loc[2, "sum_df"] == 4
    # doc 3: tokens {the, zebra} (case-folded, distinct)
    assert out.loc[3, "n_distinct_tokens"] == 2 and out.loc[3, "sum_df"] == 4


def test_prf_expansion_excludes_query_terms_and_ranks_by_tf():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.retrieval import prf_expansion_terms, prf_topk

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta beta gamma",      # fb for 'alpha'
                 "alpha delta",                 # fb for 'alpha'
                 "zebra zebra zebra"],          # irrelevant
    })).repartition(2)
    out = (
        prf_expansion_terms(docs, {"qa": "alpha"}, k_fb=2, m_terms=3)
        .to_pandas().sort_values("rank").reset_index(drop=True)
    )
    # query term 'alpha' excluded; beta tf=2 > gamma=delta=1 (tie: term asc)
    assert list(out["term"]) == ["beta", "delta", "gamma"]
    assert list(out["w"]) == [2, 1, 1]
    assert list(out["rank"]) == [1, 2, 3]

    # the rerank must now also retrieve doc 3 if zebra enters... it can't
    # (zebra not in fb docs); doc 2 ranks via delta+alpha
    top = prf_topk(docs, {"qa": "alpha"}, k=3, k_fb=2, m_terms=3).to_pandas()
    assert set(top["doc_id"]) == {1, 2}


def test_boolean_and_requires_all_terms():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.retrieval import boolean_and_retrieval

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma", "alpha beta", "beta gamma",
                 "alpha beta gamma delta"],
    })
    out = (
        boolean_and_retrieval(ray.data.from_pandas(docs),
                              {"q": "alpha gamma"})
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 4]
    assert set(out["n_terms"]) == {2}


def test_phrase_match_positional_semantics():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.retrieval import phrase_match

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "hash join now",             # 1 hit
            "hash x join",               # broken by a token between
            "hash join, hash-join!",     # 2 hits (punct gaps still adjacent)
            "smash join",                # 'smash' is not the token 'hash'
        ],
    })
    out = (
        phrase_match(ray.data.from_pandas(docs),
                     {"p": ("hash", "join")})
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 3]
    assert list(out["n_hits"]) == [1, 2]

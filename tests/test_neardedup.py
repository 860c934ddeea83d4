"""Near-dedup family: MinHash-LSH, SimHash, Jaccard verify, connected
components, embedding near-dup."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.dedup import (
    connected_components,
    dedup_minhash,
    dedup_simhash,
    embedding_near_dup,
    hamming64,
    minhash_signature,
    shingle_set,
    simhash32_pair,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong coffee in the ancient tower near the river bend "
    "and the merchants trade silk spices and silver under the autumn moon"
)
NEAR = BASE.replace("silver", "gold")
FAR = (
    "completely different content about numerical linear algebra sparse "
    "matrices eigenvalue decompositions and distributed shuffle execution "
    "engines with backpressure and spilling to object storage"
)


def test_minhash_signature_similarity():
    sa, sb = minhash_signature(BASE), minhash_signature(NEAR)
    sc = minhash_signature(FAR)
    agree_near = float(np.mean(sa == sb))
    agree_far = float(np.mean(sa == sc))
    assert agree_near > 0.7 > agree_far


def test_dedup_minhash_clusters_near_duplicates():
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, NEAR, FAR]})
    labels = dedup_minhash(ray.data.from_pandas(docs), threshold=0.7).to_pandas()
    lab = dict(zip(labels["id"], labels["label"]))
    assert lab[1] == lab[2] == 1
    assert lab[3] == 3


def test_simhash_distance_property():
    assert hamming64(*simhash32_pair(BASE), *simhash32_pair(NEAR)) <= 6
    assert hamming64(*simhash32_pair(BASE), *simhash32_pair(FAR)) > 10


def test_dedup_simhash_finds_near_pairs():
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, NEAR, FAR]})
    pairs = dedup_simhash(ray.data.from_pandas(docs), max_hamming=6).to_pandas()
    assert {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)} == {(1, 2)}


def test_connected_components_chain():
    pairs = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    ids = pd.DataFrame({"doc_id": [1, 2, 3, 9]})
    labels = connected_components(
        ray.data.from_pandas(pairs), ray.data.from_pandas(ids), "doc_id"
    ).to_pandas()
    lab = dict(zip(labels["id"], labels["label"]))
    assert lab == {1: 1, 2: 1, 3: 1, 9: 9}


def test_embedding_near_dup():
    v = np.random.default_rng(3).standard_normal(16)
    emb = pd.DataFrame(
        {
            "vec_id": [10, 11, 12],
            "embedding": [v.tolist(), (v * 2.0).tolist(),
                          np.random.default_rng(4).standard_normal(16).tolist()],
        }
    )
    pairs = embedding_near_dup(
        ray.data.from_pandas(emb), threshold=0.99
    ).to_pandas()
    assert {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)} == {(10, 11)}


def test_shingle_set_short_text():
    assert shingle_set("one two", 3) == {"one two"}
    assert shingle_set("", 3) == set()


def test_minhash_hot_bucket_capped_star_pairs():
    """A degenerate bucket (many identical docs) must not enumerate O(n^2)
    pairs: above max_bucket the stage emits a star, and connectivity still
    collapses the whole clique into ONE component."""
    n = 40
    docs = pd.DataFrame({"doc_id": list(range(1, n + 1)), "text": [BASE] * n})
    ds = ray.data.from_pandas(docs)
    from mmgraphrag_ray.stages.dedup import minhash_candidate_pairs

    pairs = minhash_candidate_pairs(ds, max_bucket=8).to_pandas()
    # star topology: O(n) pairs, not n*(n-1)/2
    assert len(pairs) <= 2 * n
    labels = connected_components(
        ray.data.from_pandas(pairs), ds, "doc_id"
    ).to_pandas()
    assert set(labels["label"]) == {1}


def test_connected_components_no_driver_label_broadcast(monkeypatch):
    """Multi-hop chain converges via pure shuffle iterations (diameter 3 —
    needs >1 propagation round, bounded to keep the gate fast).  Forces the
    distributed path (RAYKG_CC_LOCAL_MAX=0) so the scale code stays covered
    even though small inputs normally take the union-find fast path."""
    monkeypatch.setenv("RAYKG_CC_LOCAL_MAX", "0")
    pairs = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [2, 3, 4]})
    ids = pd.DataFrame({"doc_id": [1, 2, 3, 4, 7]})
    labels = connected_components(
        ray.data.from_pandas(pairs), ray.data.from_pandas(ids), "doc_id"
    ).to_pandas()
    lab = dict(zip(labels["id"], labels["label"]))
    assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7}


def test_dedup_jaccard_clusters_near_duplicates():
    from mmgraphrag_ray.stages.dedup import dedup_jaccard

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, NEAR, FAR]})
    labels = dedup_jaccard(ray.data.from_pandas(docs), threshold=0.7).to_pandas()
    lab = dict(zip(labels["id"], labels["label"]))
    assert lab[1] == lab[2] == 1
    assert lab[3] == 3


def test_jaccard_hot_shingle_skipped():
    from mmgraphrag_ray.stages.dedup import jaccard_candidate_pairs

    # every doc shares one hot shingle; with max_df below the corpus size the
    # hot shingle is skipped, so only the docs that also share a RARE
    # shingle pair up
    common = "alpha beta gamma"
    docs = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "text": [f"{common} unique{i} filler{i} tail{i}" for i in range(8)]
            + [f"{common} shared rare trigram one", f"{common} shared rare trigram two"],
        }
    )
    pairs = jaccard_candidate_pairs(
        ray.data.from_pandas(docs), max_df=5
    ).to_pandas()
    assert set(zip(pairs.id_a, pairs.id_b)) == {(8, 9)}


def test_minhash_cross_pairs_only_cross_side():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.dedup import minhash_cross_pairs

    base_a = ("the quick brown fox jumps over the lazy dog and then "
              "runs far away into the deep dark woods tonight")
    base_b = ("streaming shuffles move blocks between workers while the "
              "object store spills cold data onto local disk quietly")
    # (0,1) near-dup across sides; (2,4) near-dup WITHIN the new side so
    # it must not pair; 3 is an unrelated old singleton
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
        "text": [base_a, base_a + " extra", base_b,
                 "completely other unrelated content here", base_b + " extra"],
    })
    new = ray.data.from_pandas(docs[docs.doc_id % 2 == 0])
    old = ray.data.from_pandas(docs[docs.doc_id % 2 == 1])
    got = minhash_cross_pairs(new, old, threshold=0.85).to_pandas()
    got = got.sort_values(["new_id", "old_id"]).reset_index(drop=True)
    # cross pairs only: (0,1); (2,4) is same-side and must be absent
    assert list(zip(got["new_id"], got["old_id"])) == [(0, 1)]
    assert (got["n_shared"] > 0).all()


def test_dup_passages_counts_and_zero_short_docs():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.dedup import dup_passages

    shared = "one two three four"  # 4 tokens
    docs = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
        "text": [shared + " alpha beta", shared + " gamma delta",
                 "totally different words here now", "tiny"],
    })
    for blocks in (1, 3):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        got = (dup_passages(ds, win=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        # docs 0,1: 3 windows each (6 tokens, win 4); window[0] is shared
        assert list(got["n_windows"]) == [3, 3, 2, 0]
        assert list(got["n_dup_positions"]) == [1, 1, 0, 0]
        assert list(got["n_dup_distinct"]) == [1, 1, 0, 0]


def test_containment_catches_subset_jaccard_misses():
    from mmgraphrag_ray.stages.dedup import containment_pairs

    big = " ".join(f"w{i}" for i in range(60))
    small = " ".join(f"w{i}" for i in range(10))  # fully contained prefix
    other = " ".join(f"z{i}" for i in range(30))
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [big, small, other],
    }))
    out = containment_pairs(docs, threshold_ppm=900_000).to_pandas()
    # the (big, small) pair survives: small's shingles all appear in big
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    # small has 8 shingles (10 words, k=3), all contained -> ppm = 1e6
    assert row["n_b"] == 8 and row["n_common"] == 8
    assert row["cont_ba_ppm"] == 1_000_000
    # the big side's containment is far below threshold (58 shingles)
    assert row["cont_ab_ppm"] == 8 * 1_000_000 // 58
    # symmetric Jaccard would be 8/58 ~ 0.14 -> this is the case the
    # asymmetric measure exists for


def test_lsh_recall_pairs_flags_and_union():
    from mmgraphrag_ray.stages.dedup import lsh_recall_pairs

    # two exact copies (caught by both paths) + one unrelated doc
    t = " ".join(f"tok{i}" for i in range(30))
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [t, t, " ".join(f"zz{i}" for i in range(30))],
    }))
    out = lsh_recall_pairs(docs, threshold=0.8).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    # an identical pair shares every shingle AND every band
    assert row["in_exact"] == 1 and row["in_lsh"] == 1


def test_connected_components_pointer_jumping_long_chain(monkeypatch):
    """Label doubling: a 60-doc chain (diameter 59) must converge in
    O(log D) shuffle rounds, not O(D).  max_iters=8 with RAYKG_CC_STRICT=1
    would raise on non-convergence, so passing proves the pointer-jumping
    shortcut works; labels must equal the min id of the chain."""
    monkeypatch.setenv("RAYKG_CC_LOCAL_MAX", "0")  # force the shuffle path
    monkeypatch.setenv("RAYKG_CC_STRICT", "1")     # non-convergence -> raise
    n = 60
    pairs = pd.DataFrame({"id_a": list(range(1, n)),
                          "id_b": list(range(2, n + 1))})
    ids = pd.DataFrame({"doc_id": list(range(1, n + 1)) + [99]})
    labels = connected_components(
        ray.data.from_pandas(pairs), ray.data.from_pandas(ids), "doc_id",
        max_iters=8,
    ).to_pandas()
    lab = dict(zip(labels["id"], labels["label"]))
    assert all(lab[i] == 1 for i in range(1, n + 1))
    assert lab[99] == 99


def test_cut_dup_spans_exactsubstr_cut():
    """ExactSubstr-style span removal: the shared 8-token passage is cut
    from BOTH docs (maximal span), unique docs pass through untouched, and
    clean_md5 verifies the actual cleaned text, not just counts."""
    import hashlib

    from mmgraphrag_ray.stages.dedup import cut_dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"one two {shared} three four",
                 f"{shared} five six seven eight nine ten",
                 "totally unique words only here nothing shared at all ok"],
    })
    out = (cut_dup_spans(ray.data.from_pandas(docs), win=8)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "n_tokens"] == 12
    assert out.loc[1, "n_spans"] == 1 and out.loc[1, "n_cut_tokens"] == 8
    assert out.loc[1, "clean_md5"] == hashlib.md5(
        b"one two three four").hexdigest()
    assert out.loc[2, "n_spans"] == 1 and out.loc[2, "n_cut_tokens"] == 8
    assert out.loc[3, "n_cut_tokens"] == 0 and out.loc[3, "n_spans"] == 0
    assert out.loc[3, "clean_md5"] == hashlib.md5(
        b"totally unique words only here nothing shared at all ok").hexdigest()


def test_cut_dup_spans_property_matches_bruteforce():
    """Property: on random small-vocab corpora (forced window collisions),
    cut_dup_spans equals a brute-force single-process implementation."""
    import hashlib
    import random

    from mmgraphrag_ray.stages.dedup import cut_dup_spans

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd"]
    win = 3
    for trial in range(3):
        docs = pd.DataFrame({
            "doc_id": list(range(1, 7)),
            "text": [" ".join(rng.choice(vocab)
                              for _ in range(rng.randint(0, 12)))
                     for _ in range(6)],
        })
        out = (cut_dup_spans(ray.data.from_pandas(docs), win=win)
               .to_pandas().set_index("doc_id").sort_index())

        # brute force
        toks = {r.doc_id: r.text.split() if r.text else []
                for r in docs.itertuples()}
        wh = {d: [hashlib.md5(" ".join(t[i:i + win]).encode()).hexdigest()[:16]
                  for i in range(len(t) - win + 1)]
              for d, t in toks.items()}
        from collections import Counter
        df = Counter(h for d in wh for h in set(wh[d]))
        for d in toks:
            cut = [False] * len(toks[d])
            for i, h in enumerate(wh[d]):
                if df[h] >= 2:
                    for j in range(i, i + win):
                        cut[j] = True
            kept = [t for t, c in zip(toks[d], cut) if not c]
            spans = sum(1 for i, c in enumerate(cut)
                        if c and (i == 0 or not cut[i - 1]))
            assert out.loc[d, "n_tokens"] == len(toks[d]), (trial, d)
            assert out.loc[d, "n_cut_tokens"] == sum(cut), (trial, d)
            assert out.loc[d, "n_spans"] == spans, (trial, d)
            assert out.loc[d, "clean_md5"] == hashlib.md5(
                " ".join(kept).encode()).hexdigest(), (trial, d)


def test_connected_components_property_random_graphs(monkeypatch):
    """Property: pointer-jumping distributed CC equals a driver union-find
    on random graphs (shuffle path forced, strict convergence)."""
    import random

    monkeypatch.setenv("RAYKG_CC_LOCAL_MAX", "0")
    monkeypatch.setenv("RAYKG_CC_STRICT", "1")
    rng = random.Random(5)
    n = 30
    edges = sorted({tuple(sorted(rng.sample(range(1, n + 1), 2)))
                    for _ in range(20)})
    pairs = pd.DataFrame({"id_a": [a for a, b in edges],
                          "id_b": [b for a, b in edges]})
    ids = pd.DataFrame({"doc_id": list(range(1, n + 1))})
    labels = connected_components(
        ray.data.from_pandas(pairs), ray.data.from_pandas(ids), "doc_id",
        max_iters=8,
    ).to_pandas()
    got = dict(zip(labels["id"], labels["label"]))

    parent = {i: i for i in range(1, n + 1)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component
    comp_min = {}
    for i in range(1, n + 1):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(1, n + 1)}
    assert got == want

"""stages/select.py — DSIR importance weights + deterministic top-k."""

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.select import dsir_topk, dsir_weights


def _docs():
    # target docs (id % 7 == 0 here) are ml-flavored; raw corpus is mixed;
    # one token-less doc and one empty doc exercise the weight-0 path
    rows = []
    for i in range(40):
        if i % 7 == 0:
            rows.append((i, f"gradient descent trains the model epoch {i}"))
        elif i % 3 == 0:
            rows.append((i, f"gradient update improves the model loss {i}"))
        else:
            rows.append((i, f"invoice shipping order warehouse pallet {i}"))
    rows.append((100, "12345 67890"))  # no [a-z]+ tokens
    rows.append((101, ""))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _serial_weights(df, n_buckets=256, target_mod=7, scale=1_000_000):
    word = re.compile(r"[a-z]+")

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets

    raw = np.zeros(n_buckets, dtype=object)
    tgt = np.zeros(n_buckets, dtype=object)
    for _, r in df.iterrows():
        for tok in word.findall(r.text.lower()):
            raw[bucket(tok)] += 1
            if r.doc_id % target_mod == 0:
                tgt[bucket(tok)] += 1
    t_tot, r_tot = int(tgt.sum()), int(raw.sum())
    lr = [
        ((int(tgt[b]) + 1) * scale * (r_tot + n_buckets))
        // ((int(raw[b]) + 1) * (t_tot + n_buckets))
        for b in range(n_buckets)
    ]
    out = []
    for _, r in df.iterrows():
        toks = word.findall(r.text.lower())
        w = sum(lr[bucket(t)] for t in toks)
        out.append((r.doc_id, int(r.doc_id % target_mod == 0), len(toks), w))
    return pd.DataFrame(out, columns=["doc_id", "is_target", "n_tokens", "weight"])


def _run(df, nblocks, target_mod=7):
    return (
        dsir_weights(ray.data.from_pandas(df).repartition(nblocks),
                     target_mod=target_mod)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )


def test_dsir_weights_serial_parity_and_split_invariance():
    df = _docs()
    expected = _serial_weights(df).astype("int64")
    a = _run(df, 1)
    b = _run(df, 7)
    pd.testing.assert_frame_equal(a, expected)
    pd.testing.assert_frame_equal(a, b)
    # token-less docs weigh zero and are non-target
    z = a[a.doc_id >= 100]
    assert (z.weight == 0).all() and (z.n_tokens == 0).all()


def test_dsir_ranks_target_like_docs_higher():
    df = _docs()
    w = _run(df, 3)
    nt = w[w.is_target == 0]
    ml = nt[nt.doc_id % 3 == 0]["weight"]  # ml-flavored non-target docs
    other = nt[nt.doc_id % 3 != 0]
    other = other[other.n_tokens > 0]["weight"]
    assert ml.min() > other.max()


def test_dsir_topk_excludes_targets_and_ranks_by_weight():
    df = _docs()
    top = (
        dsir_topk(ray.data.from_pandas(df).repartition(4), k=5, target_mod=7)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(top) == 5
    assert (top.doc_id % 7 != 0).all()
    assert list(top["rank"]) == [1, 2, 3, 4, 5]
    assert (top.weight.diff().dropna() <= 0).all()
    # the selected set is exactly the 5 heaviest non-targets
    w = _run(df, 1)
    nt = w[w.is_target == 0].sort_values(
        ["weight", "doc_id"], ascending=[False, True]
    )
    assert list(top.doc_id) == list(nt.doc_id.head(5))


def test_pareto_skyline_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.select import pareto_skyline

    rng = np.random.RandomState(4)
    df = pd.DataFrame({"id": np.arange(300, dtype="int64"),
                       "x": rng.randint(0, 15, 300).astype("int64"),
                       "y": rng.randint(0, 15, 300).astype("int64")})
    got = (
        pareto_skyline(ray.data.from_pandas(df).repartition(6),
                       x_col="x", y_col="y", keep_cols=["id"])
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    keep = []
    for _, r in df.iterrows():
        dom = ((df.x >= r.x) & (df.y >= r.y) &
               ((df.x > r.x) | (df.y > r.y))).any()
        if not dom:
            keep.append(int(r.id))
    assert sorted(got["id"].tolist()) == sorted(keep)
    # duplicates of a frontier point all survive
    dup = pd.concat([df, df[df.id.isin(keep)].assign(id=lambda d: d.id + 1000)])
    got2 = (
        pareto_skyline(ray.data.from_pandas(dup.reset_index(drop=True)),
                       x_col="x", y_col="y", keep_cols=["id"])
        .to_pandas()
    )
    assert len(got2) == 2 * len(keep)


def test_maxcover_select_hand_computed():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.select import maxcover_select

    # bigram universes: d0 {a b, b c} (gain 2, ties d3 -> smaller id
    # wins round 1); d1 {a b} fully covered after that (absent); d3
    # {c d, d f} wins round 2 (gain 2); d2 {d e} -> round 3 (gain 1)
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c", "a b", "d e", "c d f"],
        }
    )
    out = (
        maxcover_select(ray.data.from_pandas(docs).repartition(2), k=3)
        .to_pandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 3, 2]
    assert list(out["gain"]) == [2, 2, 1]
    assert list(out["covered_total"]) == [2, 4, 5]


def test_maxcover_select_tie_break_and_exhaustion():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.select import maxcover_select

    # both docs cover the single bigram {x y} -> smaller doc_id wins
    # round 1; round 2 the other doc covers nothing new and selected
    # docs are excluded, so the gains table is empty -> early stop
    docs = pd.DataFrame({"doc_id": [7, 3], "text": ["x y", "x y"]})
    out = (
        maxcover_select(ray.data.from_pandas(docs), k=4)
        .to_pandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [3]
    assert list(out["gain"]) == [1]
    assert list(out["covered_total"]) == [1]


def test_leakage_safe_split_coassigns_near_dups(ray_session):
    """Near-duplicate docs (same component label) must land on the SAME
    split side; the assignment is the deterministic md5 bucket of the
    label."""
    import hashlib

    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.select import leakage_safe_split

    labels = pd.DataFrame({"id": [1, 2, 3, 9], "label": [1, 1, 3, 9]})
    out = leakage_safe_split(
        ray.data.from_pandas(labels), val_pct=50
    ).to_pandas().set_index("id")
    # component members agree
    assert out.loc[1, "split"] == out.loc[2, "split"]
    for lab, row in zip(labels["label"], labels["id"]):
        want = "val" if int(hashlib.md5(
            str(lab).encode()).hexdigest()[:8], 16) % 100 < 50 else "train"
        assert out.loc[row, "split"] == want


def test_stratified_sample_exact_quota_vs_brute_force(ray_session):
    """Per stratum, stratified_sample must keep EXACTLY the ceil(pct/100*n)
    smallest-md5(id) rows (type-1 quantile semantics) — checked against a
    brute-force pandas computation on a skewed synthetic stratum layout."""
    import hashlib
    import math

    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.select import stratified_sample

    rows = []
    # skewed strata: 400/37/8/1 rows (the regime where a rate-threshold
    # sample drifts but the quota sample must stay exact)
    for stratum, n in [("big", 400), ("mid", 37), ("small", 8), ("one", 1)]:
        base = {"big": 0, "mid": 10000, "small": 20000, "one": 30000}[stratum]
        rows += [{"id": base + i, "s": stratum} for i in range(n)]
    df = pd.DataFrame(rows)

    out = stratified_sample(
        ray.data.from_pandas(df).repartition(7), stratum_col="s",
        id_col="id", pct=10,
    ).to_pandas()

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    for stratum, g in df.groupby("s"):
        want_n = math.ceil(0.1 * len(g))
        want = set(sorted(g["id"], key=h)[:want_n])
        got = set(out.loc[out["s"] == stratum, "id"])
        assert got == want, (stratum, len(got), want_n)

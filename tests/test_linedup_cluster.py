"""dedup_lines (corpus-wide duplicate-line strip), decontaminate
(benchmark n-gram hygiene) and kmeans_assign (distributed integer Lloyd)."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.cluster import kmeans_assign, quantize
from mmgraphrag_ray.stages.dedup import decontaminate, dedup_lines


def _files():
    # "BOILER" appears in 3 files, "RARE" in 1; empty lines everywhere
    rows = []
    for i in range(3):
        rows.append(
            {"repo": "r", "path": f"a{i}", "content": f"BOILER\nunique {i}\n\nRARE\n" if i == 0 else f"BOILER\nunique {i}\n"}
        )
    rows.append({"repo": "r", "path": "empty", "content": ""})
    rows.append({"repo": "r", "path": "alldup", "content": "BOILER\nBOILER"})
    return pd.DataFrame(rows)


def test_dedup_lines_strips_common_lines_keeps_empty():
    out = (
        dedup_lines(ray.data.from_pandas(_files()), key_cols=("repo", "path"),
                    min_files=2)
        .to_pandas().set_index("path").sort_index()
    )
    # BOILER is in 4 files (> 2) -> removed everywhere; empties kept
    a0 = out.loc["a0"]
    assert a0["n_lines"] == 5 and a0["n_removed"] == 1
    assert a0["clean_md5"] == hashlib.md5(b"unique 0\n\nRARE\n").hexdigest()
    # file whose every line is a duplicate -> md5 of empty text, still a row
    ad = out.loc["alldup"]
    assert ad["n_kept"] == 0 and ad["clean_md5"] == hashlib.md5(b"").hexdigest()
    # empty file = one empty line, kept
    em = out.loc["empty"]
    assert em["n_lines"] == 1 and em["n_kept"] == 1
    assert em["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_dedup_lines_join_plan_matches_broadcast_plan():
    df = _files()
    bro = dedup_lines(ray.data.from_pandas(df), min_files=2).to_pandas()
    join = dedup_lines(
        ray.data.from_pandas(df), min_files=2, broadcast_max=0
    ).to_pandas()
    cols = sorted(bro.columns)
    assert sorted(join.columns) == cols
    b = bro[cols].sort_values(cols).reset_index(drop=True)
    j = join[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, j)


def test_dedup_lines_threshold_is_strictly_greater():
    df = _files()
    # BOILER in 4 files: min_files=4 keeps it (nf > 4 required)
    out = dedup_lines(ray.data.from_pandas(df), min_files=4).to_pandas()
    assert out["n_removed"].sum() == 0


def test_decontaminate_flags_shared_shingles():
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 97],
            "text": [
                "alpha beta gamma delta epsilon",     # benchmark (0 % 97)
                "zzz alpha beta gamma delta yyy",     # shares a 4-gram
                "totally different words here now",   # clean
                "alpha beta gamma delta",             # benchmark (97 % 97)
            ],
        }
    )
    out = (
        decontaminate(ray.data.from_pandas(docs), k=4, bench_mod=97)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "is_benchmark"] == 1 and out.loc[0, "contaminated"] == 0
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hits"] >= 1
    assert out.loc[2, "contaminated"] == 0 and out.loc[2, "n_hits"] == 0
    # benchmark docs are never flagged contaminated, even when they overlap
    assert out.loc[97, "is_benchmark"] == 1 and out.loc[97, "contaminated"] == 0


def test_decontaminate_short_doc_single_shingle():
    docs = pd.DataFrame(
        {"doc_id": [0, 5], "text": ["tiny doc", "also tiny doc stuff longer"]}
    )
    out = (
        decontaminate(ray.data.from_pandas(docs), k=4, bench_mod=97)
        .to_pandas().set_index("doc_id")
    )
    # doc 0 (<4 words) collapses to the single shingle "tiny doc", which is
    # not a 4-gram of doc 5 -> no hit
    assert out.loc[5, "n_hits"] == 0


def test_kmeans_assign_separated_clusters_and_determinism():
    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.01, (20, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0.0, 0.01, (20, 4)) + np.array([-1, 0, 0, 0])
    vecs = np.vstack([a, b]).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(40), "embedding": [v for v in vecs]}
    )
    out = (
        kmeans_assign(ray.data.from_pandas(df), n_clusters=2, refine_rounds=1)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # ids 0..19 (cluster around +1) all together, 20..39 all together
    first, second = out["cluster"][:20], out["cluster"][20:]
    assert first.nunique() == 1 and second.nunique() == 1
    assert first.iloc[0] != second.iloc[0]
    # deterministic across runs
    out2 = (
        kmeans_assign(ray.data.from_pandas(df), n_clusters=2, refine_rounds=1)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_kmeans_matches_serial_lloyd():
    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 0.3, (30, 5)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(30), "embedding": [v for v in vecs]})
    out = (
        kmeans_assign(ray.data.from_pandas(df), n_clusters=3, refine_rounds=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    # serial reference: same quantization, same update rule
    q = quantize(vecs.astype(np.float64), 1_000_000)
    c = q[:3].copy()
    for _ in range(2):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        nxt = c.copy()
        for cid in range(3):
            m = q[assign == cid]
            if len(m):
                nxt[cid] = np.floor(
                    m.sum(axis=0).astype(np.float64) / len(m)
                ).astype(np.int64)
        c = nxt
    d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    expect_assign = d.argmin(axis=1)
    expect_dist = d[np.arange(30), expect_assign]
    assert (out["cluster"].to_numpy() == expect_assign).all()
    assert (out["dist"].to_numpy() == expect_dist).all()


def test_semdedup_flags_near_identical_later_ids():
    from mmgraphrag_ray.stages.cluster import semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(0, 0.3, (20, 6)).astype(np.float32)
    # vec 20 is a near-copy of vec 3; vec 21 is its own thing
    near = base[3] * 1.0001 + 1e-6
    far = rng.normal(0, 0.3, 6)
    vecs = np.vstack([base, near, far]).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(22), "embedding": [v for v in vecs]}
    )
    out = (
        semdedup(ray.data.from_pandas(df), n_clusters=2, refine_rounds=1,
                 tau=(9, 10))
        .to_pandas().set_index("vec_id").sort_index()
    )
    assert out.loc[20, "is_dup"] == 1 and out.loc[20, "n_dup_partners"] >= 1
    # the EARLIER twin is not flagged (only later ids defer to earlier ones)
    assert out.loc[3, "is_dup"] == 0
    assert len(out) == 22 and set(out["is_dup"].unique()) <= {0, 1}


def test_run_curation_writes_stages_and_resumes(tmp_path):
    from mmgraphrag_ray.pipelines.curate import run_curation
    from mmgraphrag_ray.state import lineage

    out = str(tmp_path / "cur")
    stats = run_curation("/root/testdata/sf0.001", out)
    assert stats["flags_rows"] > 0
    assert 0 < stats["curated_rows"] < stats["flags_rows"]
    # curated rows = flags with keep == 1
    flags = lineage.read_stage(out, "curation_flags").to_pandas()
    assert stats["curated_rows"] == int((flags["keep"] == 1).sum())
    # second invocation resumes from manifests (no rewrite): same counts,
    # manifest mtimes untouched
    import os

    m1 = os.path.getmtime(
        os.path.join(out, "curated_docs", "_MANIFEST.json")
    )
    stats2 = run_curation("/root/testdata/sf0.001", out)
    m2 = os.path.getmtime(
        os.path.join(out, "curated_docs", "_MANIFEST.json")
    )
    assert stats2 == stats and m1 == m2


def test_kmeans_requires_enough_vectors():
    import pytest

    df = pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [np.zeros(4, np.float32)] * 2}
    )
    with pytest.raises(ValueError, match="need >= 8"):
        kmeans_assign(ray.data.from_pandas(df), n_clusters=8)


def test_decontaminate_empty_benchmark_set():
    # no doc_id % 97 == 0 rows -> empty benchmark -> nothing contaminated
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b c d e"] * 3})
    out = decontaminate(ray.data.from_pandas(docs), k=4).to_pandas()
    assert out["contaminated"].sum() == 0 and out["n_hits"].sum() == 0


def test_dedup_lines_randomized_serial_parity():
    # 60 files over a tiny line vocabulary so cross-file duplicates are
    # plentiful; expected result computed serially with the same rule
    rng = np.random.default_rng(17)
    vocab = [f"line {i}" for i in range(12)] + [""]
    rows = []
    for f in range(60):
        n = rng.integers(1, 9)
        rows.append({
            "repo": f"r{f % 3}", "path": f"p{f}",
            "content": "\n".join(rng.choice(vocab, n)),
        })
    df = pd.DataFrame(rows)
    min_files = 5

    # serial reference
    from collections import defaultdict
    seen = defaultdict(set)
    for _, r in df.iterrows():
        for line in r["content"].split("\n"):
            if line != "":
                seen[line].add((r["repo"], r["path"]))
    dup = {l for l, fs in seen.items() if len(fs) > min_files}
    exp = []
    for _, r in df.iterrows():
        lines = r["content"].split("\n")
        kept = [l for l in lines if l == "" or l not in dup]
        exp.append({
            "repo": r["repo"], "path": r["path"],
            "n_lines": len(lines), "n_kept": len(kept),
            "n_removed": len(lines) - len(kept),
            "clean_md5": hashlib.md5("\n".join(kept).encode()).hexdigest(),
        })
    exp_df = pd.DataFrame(exp).sort_values(["repo", "path"]).reset_index(drop=True)

    got = (
        dedup_lines(ray.data.from_pandas(df), min_files=min_files)
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp_df.columns].astype({"n_lines": "int64", "n_kept": "int64",
                                    "n_removed": "int64"}),
        exp_df.astype({"n_lines": "int64", "n_kept": "int64",
                       "n_removed": "int64"}),
    )


def test_decontaminate_join_plan_matches_broadcast_plan():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(9)]
    docs = pd.DataFrame({
        "doc_id": np.arange(120),
        "text": [" ".join(rng.choice(vocab, rng.integers(2, 12)))
                 for _ in range(120)],
    })
    a = decontaminate(ray.data.from_pandas(docs), k=3, bench_mod=20).to_pandas()
    b = decontaminate(ray.data.from_pandas(docs), k=3, bench_mod=20,
                      broadcast_max=0).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values("doc_id").reset_index(drop=True),
        b[cols].sort_values("doc_id").reset_index(drop=True),
    )
    assert a["contaminated"].sum() > 0  # positively exercised


def test_negative_samples_cross_cluster_only_and_deterministic():
    import hashlib

    from mmgraphrag_ray.stages.cluster import kmeans_assign, negative_samples

    rng = np.random.RandomState(3)
    # two tight blobs -> 2 clusters
    vecs = np.vstack([rng.rand(10, 4) * 0.01,
                      rng.rand(10, 4) * 0.01 + 5.0])
    df = pd.DataFrame({
        "vec_id": pd.array(range(20), dtype="int64"),
        "embedding": list(vecs),
    })
    ds = ray.data.from_pandas(df)
    got = negative_samples(ds, n_clusters=2, refine_rounds=1,
                           per_cluster=3, k=2).to_pandas()
    assign = kmeans_assign(ds, n_clusters=2, refine_rounds=1).to_pandas()
    cl = dict(zip(assign["vec_id"], assign["cluster"]))
    assert len(got) == 40  # 2 per anchor
    for vid, nid in zip(got["vec_id"], got["neg_id"]):
        assert cl[vid] != cl[nid]  # negatives always cross-cluster
    # rank-1 negative reproduces the md5 order by hand for one anchor
    one = got[got["vec_id"] == 0].sort_values("rank")
    pool = sorted(assign[assign["cluster"] != cl[0]]["vec_id"])[:3]
    want = sorted((hashlib.md5(f"0|{n}".encode()).hexdigest(), n)
                  for n in pool)[:2]
    assert list(one["neg_id"]) == [n for _h, n in want]


def test_pq_assign_error_duplicates_hit_zero_error():
    from mmgraphrag_ray.stages.cluster import pq_assign_error

    rng = np.random.RandomState(9)
    patterns = rng.randn(8, 16)
    # 8 seed patterns (ids 0-7) + an exact copy of each (ids 8-15):
    # seeds ARE the patterns, means stay the patterns, copies land at 0
    vecs = np.concatenate([patterns, patterns]).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(16, dtype="int64"),
                       "embedding": list(vecs)})
    out = (
        pq_assign_error(ray.data.from_pandas(df), n_subspaces=2,
                        n_clusters=8, refine_rounds=1)
        .to_pandas().sort_values(["vec_id", "sub"]).reset_index(drop=True)
    )
    assert len(out) == 32
    assert set(out["sub"]) == {0, 1}
    assert (out["err"] == 0).all()
    # copy i+8 shares its pattern's code in every subspace
    for s in (0, 1):
        a = out[(out["sub"] == s)].set_index("vec_id")["cluster"]
        for i in range(8):
            assert a[i] == a[i + 8]


def test_pq_rejects_indivisible_dim():
    from mmgraphrag_ray.stages.cluster import pq_assign_error

    df = pd.DataFrame({"vec_id": [0], "embedding": [np.zeros(5)]})
    try:
        pq_assign_error(ray.data.from_pandas(df), n_subspaces=2)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_mutual_knn_ranks_and_mutual_flags():
    from mmgraphrag_ray.stages.cluster import mutual_knn

    rng = np.random.default_rng(11)
    base = rng.normal(0, 0.3, (12, 6)).astype(np.float32)
    # vec 12 is a near-copy of vec 3 -> they should be each other's rank-1
    # neighbors (mutual edge) inside whatever cluster they land in together
    near = base[3] * 1.0002 + 1e-6
    vecs = np.vstack([base, near]).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(13), "embedding": [v for v in vecs]}
    )
    out = (
        mutual_knn(ray.data.from_pandas(df), n_clusters=2, refine_rounds=1,
                   k=3)
        .to_pandas()
    )
    # per-vector ranks are 1..k without gaps
    for vid, g in out.groupby("vec_id"):
        assert list(g.sort_values("rank")["rank"]) == list(
            range(1, len(g) + 1)
        )
        assert vid not in set(g["nbr_id"])  # no self edges
    # the twin pair is mutual at rank 1 in both directions
    r1 = out[(out["vec_id"] == 12) & (out["rank"] == 1)].iloc[0]
    assert r1["nbr_id"] == 3 and r1["mutual"] == 1
    r2 = out[(out["vec_id"] == 3) & (out["rank"] == 1)].iloc[0]
    assert r2["nbr_id"] == 12 and r2["mutual"] == 1
    # mutual flag is symmetric: every (a, b, mutual=1) has (b, a, mutual=1)
    m = out[out["mutual"] == 1]
    pairs = set(zip(m["vec_id"], m["nbr_id"]))
    assert all((b, a) in pairs for a, b in pairs)


def test_pq_adc_topk_self_excluded_and_ranks_dense():
    from mmgraphrag_ray.stages.cluster import pq_adc_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.4, (24, 4)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(24), "embedding": list(vecs)})
    out = (
        pq_adc_topk(ray.data.from_pandas(df).repartition(3),
                    n_queries=3, k=4, n_subspaces=2, n_clusters=4)
        .to_pandas()
    )
    assert set(out["query_vec_id"]) == {0, 1, 2}
    for qid, g in out.groupby("query_vec_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == [1, 2, 3, 4]
        assert qid not in set(g["vec_id"])          # self excluded
        assert g["adc_dist"].is_monotonic_increasing  # dist asc
        # ties broken by ascending vec_id within equal dist
        for _, grp in g.groupby("adc_dist"):
            assert grp["vec_id"].is_monotonic_increasing


def test_pq_adc_topk_block_layout_invariant_under_ties():
    """ADC distances tie structurally (co-cell vectors share codes); the
    per-batch truncation must be tie-aware or the global top-k depends on
    how Ray happens to split blocks.  Duplicated vectors force tie groups
    straddling the top-k boundary; 1-block and 6-block layouts must agree
    exactly."""
    from mmgraphrag_ray.stages.cluster import pq_adc_topk

    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.4, (4, 4)).astype(np.float32)
    vecs = np.repeat(base, 6, axis=0)  # 24 vectors, 4 distinct -> heavy ties
    df = pd.DataFrame({"vec_id": np.arange(24), "embedding": list(vecs)})

    def run(nparts):
        return (
            pq_adc_topk(ray.data.from_pandas(df).repartition(nparts),
                        n_queries=3, k=5, n_subspaces=2, n_clusters=4)
            .to_pandas()
            .sort_values(["query_vec_id", "rank"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(6)
    pd.testing.assert_frame_equal(a, b)
    # tie-break is ascending vec_id within equal dist
    for _, g in a.groupby("query_vec_id"):
        for _, grp in g.groupby("adc_dist"):
            assert grp["vec_id"].is_monotonic_increasing

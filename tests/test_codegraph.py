import pandas as pd
import ray.data

from mmgraphrag_ray.stages.codegraph import import_edges, import_indegree_topk


def _files():
    # a imports b twice (dedup), b imports c, c imports b+a, one file
    # without a module header (dropped), a second file of module a
    # re-importing b (still one distinct edge)
    rows = [
        "# module: a\nimport b\nimport b\nimport c\n",
        "# module: b\nimport c\n",
        "# module: c\nimport b\nimport a\n",
        "no header here\nimport b\n",
        "# module: a\nimport b\n",
    ]
    return ray.data.from_pandas(
        pd.DataFrame({"content": rows})
    ).repartition(3)


def test_import_edges_distinct():
    out = (
        import_edges(_files(), n_buckets=4)
        .to_pandas()
        .sort_values(["src_module", "dst_module"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "src_module": ["a", "a", "b", "c", "c"],
            "dst_module": ["b", "c", "c", "a", "b"],
        }
    )
    pd.testing.assert_frame_equal(out, exp)


def test_import_indegree_topk_order_and_ties():
    out = import_indegree_topk(_files(), k=10, n_buckets=4).to_pandas()
    # b imported by {a, c} -> 2; a by {c} -> 1; c by {a, b} -> 2
    exp = pd.DataFrame(
        {"module": ["b", "c", "a"], "in_degree": [2, 2, 1]}
    ).astype({"in_degree": "int64"})
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_complexity_scores_counts_branches_and_defs():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.codegraph import complexity_scores

    src = "def f(a):\n    if a and a > 1:\n        return a\n    " \
          "for i in range(3):\n        pass\n\ndef g():\n    return 0\n"
    # notify: 'if', 'and', 'for' = 3 branches; 2 defs
    df = pd.DataFrame({"repo": ["r"], "path": ["p.py"], "content": [src]})
    out = complexity_scores(ray.data.from_pandas(df)).to_pandas()
    assert out.loc[0, "n_funcs"] == 2
    assert out.loc[0, "n_branches"] == 3
    assert out.loc[0, "complexity"] == 5


def test_function_clones_abstracts_numeric_literals():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.codegraph import function_clones

    fa = "# head\ndef f(a):\n    v = 111 * 2\n    return v\n"
    fb = "# head\ndef f(a):\n    v = 999 * 7\n    return v\n"
    fc = "# head\ndef g(a, b):\n    return a - b\n"
    df = pd.DataFrame({"repo": ["r1", "r2", "r3"],
                       "path": ["a.py", "b.py", "c.py"],
                       "content": [fa, fb, fc]})
    out = function_clones(ray.data.from_pandas(df), min_files=2).to_pandas()
    # fa and fb differ only in numbers -> one clone group across 2 files
    assert len(out) == 1
    assert out["n_files"].iloc[0] == 2 and out["n_occurrences"].iloc[0] == 2


def test_hits_scores_rank_hub_vs_authority():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.codegraph import hits_scores

    # star: m_hub imports a, b, c (hub); a, b, c import nothing; d imports a
    def mod(name, imports):
        return f"# module: {name}\n" + "".join(f"import {i}\n" for i in imports)

    files = pd.DataFrame({"content": [
        mod("hub", ["a", "b", "c"]),
        mod("d", ["a"]),
        mod("a", []), mod("b", []), mod("c", []),
    ]})
    out = hits_scores(ray.data.from_pandas(files), rounds=2).to_pandas() \
        .set_index("module")
    # 'hub' is the max hub; 'a' (imported by 2) is the max authority
    assert out["hub"].idxmax() == "hub" and out.loc["hub", "hub"] == 1_000_000
    assert out["auth"].idxmax() == "a" and out.loc["a", "auth"] == 1_000_000
    assert out.loc["a", "hub"] == 0  # imports nothing
    assert out.loc["hub", "auth"] == 0  # imported by nobody


def _call_files():
    # call graph after unambiguous resolution:
    #   a: defines fa, calls fb (unique in b) and shared (ambiguous: in a+d)
    #   b: defines fb + shared?, calls fc
    #   c: defines fc, calls fa  -> 3-cycle a->b->c->a
    #   d: defines fd + shared, fd calls itself -> self-loop (cycle len 1)
    #   e: defines fe, calls fb  -> on NO cycle (nothing calls back into e)
    rows = [
        "# module: a\ndef fa(x):\n    y = fb(1)\n    z = shared(2)\n",
        "# module: b\ndef fb(x):\ndef shared(x):\n    y = fc(1)\n",
        "# module: c\ndef fc(x):\n    y = fa(1)\n",
        "# module: d\ndef fd(x):\ndef shared(x):\n    y = fd(1)\n",
        "# module: e\ndef fe(x):\n    y = fb(1)\n",
    ]
    return ray.data.from_pandas(
        pd.DataFrame({"content": rows})
    ).repartition(3)


def test_resolved_call_edges_drops_ambiguous_symbols():
    from mmgraphrag_ray.stages.codegraph import resolved_call_edges

    out = (
        resolved_call_edges(_call_files(), n_buckets=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    # shared is defined in both b and d -> every `= shared(...)` call
    # site resolves to nothing; fd's self-call keeps the self-loop
    exp = pd.DataFrame(
        {
            "src": ["a", "b", "c", "d", "e"],
            "dst": ["b", "c", "a", "d", "b"],
        }
    )
    pd.testing.assert_frame_equal(out, exp)


def test_call_cycles_min_length_and_non_cycle_exclusion():
    from mmgraphrag_ray.stages.codegraph import call_cycles

    out = (
        call_cycles(_call_files(), max_len=6, n_buckets=4)
        .to_pandas()
        .sort_values("module")
        .reset_index(drop=True)
    )
    # a,b,c sit on the 3-cycle; d self-recurses (len 1); e is acyclic
    exp = pd.DataFrame(
        {"module": ["a", "b", "c", "d"], "min_cycle_len": [3, 3, 3, 1]}
    ).astype({"min_cycle_len": "int64"})
    pd.testing.assert_frame_equal(out, exp)


def test_call_cycles_meet_in_middle_exact_for_len_six():
    from mmgraphrag_ray.stages.codegraph import call_cycles

    # pure 6-cycle m0 -> m1 -> ... -> m5 -> m0: needs the off-diagonal
    # C3(u,v)+C3(v,u) pairing (diagonal alone only sees cycles <= 3)
    rows = [
        f"# module: m{i}\ndef f{i}(x):\n    y = f{(i + 1) % 6}(1)\n"
        for i in range(6)
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"content": rows})).repartition(2)
    out = (
        call_cycles(ds, max_len=6, n_buckets=4)
        .to_pandas()
        .sort_values("module")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"module": [f"m{i}" for i in range(6)],
         "min_cycle_len": [6] * 6}
    ).astype({"min_cycle_len": "int64"})
    pd.testing.assert_frame_equal(out, exp)


def test_vendored_files_cross_repo_detection():
    from mmgraphrag_ray.stages.codegraph import vendored_files

    # sha X: 3 copies across 2 repos (vendored); sha Y: 2 copies in ONE
    # repo (internal duplicate, excluded); sha Z: unique (excluded)
    rows = pd.DataFrame(
        {
            "content_sha256": ["X", "X", "X", "Y", "Y", "Z"],
            "repo": ["r2", "r1", "r1", "r1", "r1", "r3"],
            "path": ["b.py", "z.py", "a.py", "u.py", "v.py", "w.py"],
            "commit": ["c9", "c1", "c2", "c1", "c1", "c1"],
        }
    )
    out = (
        vendored_files(ray.data.from_pandas(rows).repartition(3), min_repos=2)
        .to_pandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert r["content_sha256"] == "X"
    assert r["n_copies"] == 3 and r["n_repos"] == 2
    # canonical first location: lexicographic min of (repo, path, commit)
    # -> ('r1', 'a.py', 'c2')
    assert r["first_repo"] == "r1" and r["first_path"] == "a.py"


def test_vendored_files_split_invariant():
    from mmgraphrag_ray.stages.codegraph import vendored_files

    rows = pd.DataFrame(
        {
            "content_sha256": [f"s{i % 4}" for i in range(16)],
            "repo": [f"r{i % 3}" for i in range(16)],
            "path": [f"p{i}.py" for i in range(16)],
            "commit": ["c0"] * 16,
        }
    )

    def run(nparts):
        return (
            vendored_files(ray.data.from_pandas(rows).repartition(nparts))
            .to_pandas()
            .sort_values("content_sha256")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(5))


def test_unused_defs_counts_and_self_recursion_is_a_use():
    from mmgraphrag_ray.stages.codegraph import unused_defs

    files = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r1", "r1", "r2"],
        "content": [
            # helper() used cross-file; dead() never called; rec() only
            # calls itself -> a USE under the documented rule
            "def helper(a):\n    return a\n\ndef dead(x):\n    return x\n",
            "def main():\n    return helper(1)\n\ndef rec(n):\n    return rec(n - 1)\n",
            "def lonely():\n    pass\n",
        ],
    }))
    out = unused_defs(files).to_pandas().set_index("repo")
    assert out.loc["r1", "n_defs"] == 4
    # dead() is the only unused def in r1 (helper used, main... main is
    # never called -> also unused!)  expected unused: dead, main
    assert out.loc["r1", "n_unused"] == 2
    assert out.loc["r1", "first_unused"] == "dead"
    assert out.loc["r2", "n_defs"] == 1 and out.loc["r2", "n_unused"] == 1
    assert out.loc["r2", "first_unused"] == "lonely"

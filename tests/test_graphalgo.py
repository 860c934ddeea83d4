"""stages/graphalgo.py — integer PageRank."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.graphalgo import SCALE, pagerank_int


def _graph():
    nodes = pd.DataFrame({"entity_name": [f"n{i}" for i in range(6)]})
    edges = pd.DataFrame(
        {
            "src_id": ["n0", "n0", "n1", "n2", "n3"],
            "tgt_id": ["n1", "n2", "n2", "n3", "n0"],
        }
    )
    return nodes, edges


def _reference(nodes: pd.DataFrame, edges: pd.DataFrame, iterations: int) -> dict:
    names = list(nodes["entity_name"])
    n = len(names)
    bid = list(zip(edges["src_id"], edges["tgt_id"])) + list(
        zip(edges["tgt_id"], edges["src_id"])
    )
    deg: dict = {}
    for u, _ in bid:
        deg[u] = deg.get(u, 0) + 1
    r = {v: SCALE // n for v in names}
    teleport = ((SCALE * 15) // 100) // n
    for _ in range(iterations):
        nxt = {v: teleport for v in names}
        for u, v in bid:
            nxt[v] += (85 * r[u] // 100) // deg[u]
        r = nxt
    return r


def test_pagerank_matches_pure_reference():
    nodes, edges = _graph()
    got = (
        pagerank_int(
            ray.data.from_pandas(nodes), ray.data.from_pandas(edges), iterations=3
        )
        .to_pandas()
        .set_index("node")["r"]
        .to_dict()
    )
    assert got == _reference(nodes, edges, 3)


def test_pagerank_block_split_invariant_and_mass_bounded():
    rng = np.random.RandomState(31)
    names = [f"v{i}" for i in range(80)]
    nodes = pd.DataFrame({"entity_name": names})
    edges = pd.DataFrame(
        {
            "src_id": rng.choice(names, 300),
            "tgt_id": rng.choice(names, 300),
        }
    )
    edges = edges[edges["src_id"] != edges["tgt_id"]].drop_duplicates()

    def run(nblocks):
        return (
            pagerank_int(
                ray.data.from_pandas(nodes).repartition(nblocks),
                ray.data.from_pandas(edges).repartition(nblocks),
                iterations=2,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    # total mass: never exceeds SCALE; floor losses only shrink it
    assert a["r"].sum() <= SCALE
    assert (a["r"] >= ((SCALE * 15) // 100) // len(names)).all()
    # an isolated node keeps exactly the teleport share
    isolated = set(names) - set(edges["src_id"]) - set(edges["tgt_id"])
    if isolated:
        v = next(iter(isolated))
        assert int(a.set_index("node").loc[v, "r"]) == ((SCALE * 15) // 100) // len(names)


def test_k_hop_distances_path_graph():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import k_hop_distances

    # path a-b-c-d-e, seed {a}: hops 0,1,2; d,e unreached at k=2
    edges = pd.DataFrame(
        {"src_id": ["a", "b", "c", "d"], "tgt_id": ["b", "c", "d", "e"]}
    )
    seeds = pd.DataFrame({"entity_name": ["a"]})
    out = (
        k_hop_distances(
            ray.data.from_pandas(seeds), ray.data.from_pandas(edges), k=2
        )
        .to_pandas().set_index("entity_name")["hop"].to_dict()
    )
    assert out == {"a": 0, "b": 1, "c": 2}


def test_k_hop_distances_min_hop_wins_on_cycle():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import k_hop_distances

    # triangle a-b, b-c, c-a with seed a: b and c both hop 1 (not 2)
    edges = pd.DataFrame(
        {"src_id": ["a", "b", "c"], "tgt_id": ["b", "c", "a"]}
    )
    seeds = pd.DataFrame({"entity_name": ["a"]})
    out = (
        k_hop_distances(
            ray.data.from_pandas(seeds), ray.data.from_pandas(edges), k=2
        )
        .to_pandas().set_index("entity_name")["hop"].to_dict()
    )
    assert out == {"a": 0, "b": 1, "c": 1}


def test_entity_pmi_hand_case_and_split_invariance():
    from mmgraphrag_ray.stages.graphalgo import PMI_SCALE, entity_cooccurrence_pmi

    # chunks: c1={A,B}, c2={A,B}, c3={A,C}, c4={B}, c5={C} -> n_chunks=5
    # n_A=3 n_B=3 n_C=2; pairs: (A,B) n_xy=2, (A,C) n_xy=1 (below min)
    rows = [("A", "c1"), ("B", "c1"), ("A", "c2"), ("B", "c2"),
            ("A", "c3"), ("C", "c3"), ("B", "c4"), ("C", "c5"),
            ("A", "c1")]  # duplicate mention must not inflate n_xy
    df = pd.DataFrame(rows, columns=["entity_name", "source_id"])
    for blocks in (1, 4):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = entity_cooccurrence_pmi(ds, k=5, min_pairs=2).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["ea"], r["eb"], r["n_xy"], r["n_x"], r["n_y"]) == \
            ("A", "B", 2, 3, 3)
        assert r["pmi"] == (2 * 5 * PMI_SCALE) // (3 * 3)
        assert r["rank"] == 1


def test_k_core_peel_drops_pendants_keeps_triangle():
    from mmgraphrag_ray.stages.graphalgo import k_core_peel

    # triangle A-B-C, pendant chain D-A, E-D: peel k=2 removes E then D
    edges = pd.DataFrame(
        {"src_id": ["A", "B", "C", "D", "E"],
         "tgt_id": ["B", "C", "A", "A", "D"]}
    )
    for blocks in (1, 3):
        ds = ray.data.from_pandas(edges).repartition(blocks)
        got = (k_core_peel(ds, k=2, rounds=3).to_pandas()
               .sort_values("node").reset_index(drop=True))
        assert list(got["node"]) == ["A", "B", "C"]
        assert list(got["deg"]) == [2, 2, 2]


def test_k_core_peel_empty_core():
    from mmgraphrag_ray.stages.graphalgo import k_core_peel

    # pure path graph has no 2-core
    edges = pd.DataFrame({"src_id": ["A", "B"], "tgt_id": ["B", "C"]})
    got = k_core_peel(ray.data.from_pandas(edges), k=2, rounds=3).to_pandas()
    assert len(got) == 0


def test_community_stats_two_components():
    from mmgraphrag_ray.stages.graphalgo import community_stats

    # component 1: triangle A-B-C (+1 chord-free), component 2: path X-Y
    nodes = pd.DataFrame({"entity_name": ["A", "B", "C", "X", "Y"]})
    edges = pd.DataFrame(
        {"src_id": ["A", "B", "C", "X"], "tgt_id": ["B", "C", "A", "Y"]}
    )
    for blocks in (1, 3):
        got = (
            community_stats(
                ray.data.from_pandas(nodes).repartition(blocks),
                ray.data.from_pandas(edges).repartition(blocks),
                rounds=4,
            )
            .to_pandas()
            .sort_values("label")
            .reset_index(drop=True)
        )
        assert list(got.label) == ["A", "X"]
        assert list(got.n_nodes) == [3, 2]
        assert list(got.internal_edges) == [3, 1]
        assert list(got.degree_sum) == [6, 2]


def test_wl_hashes_distinguish_environments():
    import hashlib

    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import wl_neighborhood_hashes

    nodes = pd.DataFrame({
        "entity_name": ["a", "b", "c", "iso"],
        "entity_type": ["T1", "T2", "T1", "T1"],
    })
    edges = pd.DataFrame({"src_id": ["a", "b"], "tgt_id": ["b", "c"]})
    out = (
        wl_neighborhood_hashes(ray.data.from_pandas(nodes),
                               ray.data.from_pandas(edges))
        .to_pandas().set_index("entity_name")
    )
    # a (T1 with one T2 neighbor) vs c (same environment) -> equal hashes
    assert out.loc["a", "wl1"] == out.loc["c", "wl1"]
    # iso: same own type, empty environment -> different hash
    assert out.loc["iso", "wl1"] != out.loc["a", "wl1"]
    assert out.loc["iso", "wl1"] == hashlib.md5(b"T1|").hexdigest()[:16]
    assert out.loc["b", "n_neighbors"] == 2


def test_type_pair_edge_stats_unordered_pairs():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import type_pair_edge_stats

    nodes = pd.DataFrame({
        "entity_name": ["a", "b", "c"],
        "entity_type": ["T2", "T1", "T1"],
    })
    # a-b (T2,T1) and b-a-direction pair c-a (T1,T2): same unordered key
    edges = pd.DataFrame({"src_id": ["a", "c", "b"],
                          "tgt_id": ["b", "a", "c"],
                          "weight": [2.0, 3.0, 5.0]})
    out = (
        type_pair_edge_stats(ray.data.from_pandas(nodes),
                             ray.data.from_pandas(edges))
        .to_pandas().sort_values(["type_a", "type_b"]).reset_index(drop=True)
    )
    t12 = out[(out["type_a"] == "T1") & (out["type_b"] == "T2")]
    assert t12["n_edges"].iloc[0] == 2 and t12["weight_sum"].iloc[0] == 5
    t11 = out[(out["type_a"] == "T1") & (out["type_b"] == "T1")]
    assert t11["n_edges"].iloc[0] == 1 and t11["weight_sum"].iloc[0] == 5


def test_degree_assortativity_components_tiny_graph():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import (
        degree_assortativity_components,
    )

    # path a-b-c: degrees a=1, b=2, c=1; directed instances:
    # (1,2),(2,1),(2,1),(1,2) -> n=4, sx=sy=6, sxx=syy=10, sxy=8
    edges = pd.DataFrame({"src_id": ["a", "b"], "tgt_id": ["b", "c"]})
    out = degree_assortativity_components(
        ray.data.from_pandas(edges)
    ).to_pandas()
    assert out["n"].iloc[0] == 4
    assert out["sx"].iloc[0] == 6 and out["sy"].iloc[0] == 6
    assert out["sxx"].iloc[0] == 10 and out["syy"].iloc[0] == 10
    assert out["sxy"].iloc[0] == 8


def test_square_census_hand_computed():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import square_census

    # 4-cycle a-b-c-d-a: diagonals (a,c) and (b,d) each see cn=2 common
    # neighbors -> squares = C(2,2) = 1 per diagonal; rank by
    # (squares desc, ea, eb) -> (a,c) then (b,d)
    edges = pd.DataFrame(
        {"src_id": ["a", "b", "c", "d"], "tgt_id": ["b", "c", "d", "a"]}
    )
    out = (
        square_census(ray.data.from_pandas(edges).repartition(2), k=10)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(zip(out["ea"], out["eb"])) == [("a", "c"), ("b", "d")]
    assert list(out["cn"]) == [2, 2]
    assert list(out["squares"]) == [1, 1]
    assert list(out["rank"]) == [1, 2]


def test_square_census_deg_cap_excludes_hub():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.graphalgo import square_census

    # hub h with 4 neighbors would anchor C(4,2)=6 candidate pairs, but
    # deg_cap=3 excludes it from mediation; the remaining square
    # x0-m1-x1-m2-x0 survives (diagonals (m1,m2) via {x0,x1} and
    # (x0,x1) via {m1,m2}... m1,m2 also neighbor h but h is capped)
    e = [("h", f"x{i}") for i in range(4)]
    e += [("x0", "m1"), ("m1", "x1"), ("x1", "m2"), ("m2", "x0")]
    edges = pd.DataFrame(e, columns=["src_id", "tgt_id"])
    out = (
        square_census(ray.data.from_pandas(edges).repartition(3),
                      k=10, deg_cap=3)
        .to_pandas()
    )
    pairs = set(zip(out["ea"], out["eb"]))
    # no pair mediated ONLY by h appears; the two true diagonals do
    assert ("m1", "m2") in pairs and ("x0", "x1") in pairs
    for ea, eb in pairs:
        assert not (ea.startswith("x") and eb.startswith("x")
                    and {ea, eb} != {"x0", "x1"})


def test_betweenness_ppm_diamond_floor_division():
    from mmgraphrag_ray.stages.graphalgo import betweenness_ppm

    # diamond: a - b - d, a - c - d  (seed {a})
    # sigma: a=1 (hop0), b=c=1 (hop1), d=2 (hop2)
    # delta(b) = delta(c) = (1 * (1e6 + 0)) // 2 = 500000  (floor over sigma_v=2)
    # delta(a) = (1*(1e6+500000))//1 + (1*(1e6+500000))//1 = 3000000
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "a", "b", "c"],
        "tgt_id": ["b", "c", "d", "d"],
    }))
    seeds = ray.data.from_pandas(pd.DataFrame({"entity_name": ["a"]}))
    out = (
        betweenness_ppm(seeds, edges, k=2)
        .to_pandas().set_index("entity_name").sort_index()
    )
    assert out.loc["d", ["hop", "sigma", "delta_ppm"]].tolist() == [2, 2, 0]
    assert out.loc["b", ["hop", "sigma", "delta_ppm"]].tolist() == [1, 1, 500000]
    assert out.loc["c", "delta_ppm"] == 500000
    assert out.loc["a", ["hop", "sigma", "delta_ppm"]].tolist() == [0, 1, 3000000]


def test_betweenness_ppm_path_chain():
    from mmgraphrag_ray.stages.graphalgo import betweenness_ppm

    # chain a - b - c, seed {a}: delta(b) = 1e6, delta(a) = 2e6
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["a", "b"], "tgt_id": ["b", "c"],
    }))
    seeds = ray.data.from_pandas(pd.DataFrame({"entity_name": ["a"]}))
    out = (
        betweenness_ppm(seeds, edges, k=2)
        .to_pandas().set_index("entity_name")
    )
    assert out.loc["b", "delta_ppm"] == 1_000_000
    assert out.loc["a", "delta_ppm"] == 2_000_000
    assert out.loc["c", "delta_ppm"] == 0


def test_hyperball_monotone_and_star_merges_all():
    import hashlib

    from mmgraphrag_ray.stages.graphalgo import hyperball_registers

    # star: hub h connected to a,b,c — after 1 round the hub holds the
    # max-merge of all four singleton sketches; after 2 rounds the leaves
    # do too (leaf -> hub -> leaf)
    edges = ray.data.from_pandas(pd.DataFrame({
        "src_id": ["h", "h", "h"], "tgt_id": ["a", "b", "c"],
    }))
    nodes = ray.data.from_pandas(pd.DataFrame(
        {"entity_name": ["h", "a", "b", "c"]}))

    def singleton(name):
        hv = int(hashlib.md5(name.encode()).hexdigest()[:16], 16)
        rest = hv // 64
        return (hv % 64, 59 if rest == 0 else 59 - rest.bit_length())

    merged = {}
    for n in ["h", "a", "b", "c"]:
        reg, rho = singleton(n)
        merged[reg] = max(merged.get(reg, -1), rho)

    out2 = (
        hyperball_registers(nodes, edges, rounds=2)
        .to_pandas().set_index("entity_name")
    )
    # all four nodes see the full 2-hop ball = the whole star
    for n in ["h", "a", "b", "c"]:
        assert out2.loc[n, "n_registers"] == len(merged)
        assert out2.loc[n, "sum_rho"] == sum(merged.values())

    out1 = (
        hyperball_registers(nodes, edges, rounds=1)
        .to_pandas().set_index("entity_name")
    )
    # after 1 round the hub already holds everything; a leaf holds only
    # its own + the hub's registers (monotone: never more than round 2)
    assert out1.loc["h", "n_registers"] == len(merged)
    for n in ["a", "b", "c"]:
        assert out1.loc[n, "n_registers"] <= out2.loc[n, "n_registers"]

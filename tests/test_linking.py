"""Fusion/linking stage: DBSCAN determinism, spectral math, alias +
contraction semantics (FIXTURES.md F6; reference fusion.py:333-416, 870-997)."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.stages.linking import (
    build_alias_table,
    canonicalize_graph,
    contract_graph,
    dbscan,
    spectral_cluster_group,
)


def test_dbscan_two_blobs():
    pts = np.array([[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [5.0, 5.0], [5.1, 5.0]])
    labels = dbscan(pts, eps=0.5, min_samples=2)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]


def test_dbscan_noise():
    pts = np.array([[0.0, 0.0], [10.0, 10.0], [20.0, 0.0]])
    labels = dbscan(pts, eps=0.5, min_samples=2)
    assert (labels == -1).all()


def test_dbscan_deterministic_numbering():
    pts = np.array([[5.0, 5.0], [5.1, 5.0], [0.0, 0.0], [0.1, 0.0]])
    labels = dbscan(pts, eps=0.5, min_samples=2)
    # first-visited core point (index 0) gets cluster 0
    assert labels[0] == 0 and labels[2] == 1


def test_spectral_identical_descriptions_cluster_together():
    names = ['"A"', '"B"', '"C"']
    descs = ["same words here", "same words here", "totally different payload xyz"]
    labels = spectral_cluster_group(names, descs, [])
    assert labels[0] == labels[1]


def test_spectral_single_entity():
    assert spectral_cluster_group(['"A"'], ["x"], []).tolist() == [0]


def test_alias_table_smallest_member_wins():
    clusters = pd.DataFrame(
        {
            "entity_name": ['"B"', '"A"', '"C"', '"D"'],
            "description": ["same desc text", "same desc text", "other", "noise"],
            "partition": ["p"] * 4,
            "group_id": [0, 0, 0, 0],
            "label": [0, 0, 1, -1],  # A,B cluster; C alone; D noise
        }
    )
    alias = build_alias_table(ray.data.from_pandas(clusters)).to_pandas()
    assert len(alias) == 1
    assert alias.iloc[0].member_name == '"B"' and alias.iloc[0].canonical_name == '"A"'


def test_alias_judge_rejects_dissimilar_cluster_members():
    clusters = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"'],
            "description": ["parse the config file", "zebra quantum banana stripes"],
            "partition": ["p", "p"],
            "group_id": [0, 0],
            "label": [0, 0],  # clustered together, but the judge disagrees
        }
    )
    alias = build_alias_table(ray.data.from_pandas(clusters)).to_pandas()
    assert len(alias) == 0


def test_contract_graph_repoints_and_remerges():
    nodes = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"', '"X"'],
            "entity_type": ['"T1"', '"T2"', '"T3"'],
            "description": ['"da"', '"db"', '"dx"'],
            "source_id": ["c1", "c2", "c3"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"A"', '"B"'],
            "tgt_id": ['"X"', '"X"'],
            "weight": [2.0, 3.0],
            "description": ['"ax"', '"bx"'],
            "source_id": ["c1", "c2"],
            "order": [1, 2],
        }
    )
    alias = pd.DataFrame({"member_name": ['"B"'], "canonical_name": ['"A"']})
    nn, ne = contract_graph(
        ray.data.from_pandas(nodes), ray.data.from_pandas(edges), ray.data.from_pandas(alias)
    )
    nn, ne = nn.to_pandas(), ne.to_pandas()
    assert sorted(nn.entity_name) == ['"A"', '"X"']
    merged = nn[nn.entity_name == '"A"'].iloc[0]
    assert merged.description == f'"da"{SEP}"db"'
    assert merged.source_id == f"c1{SEP}c2"
    # both edges collapse onto ("A","X"): weight sum, order min, desc union
    assert len(ne) == 1
    e = ne.iloc[0]
    assert (e.src_id, e.tgt_id) == ('"A"', '"X"')
    assert e.weight == 5.0 and e["order"] == 1
    assert e.description == f'"ax"{SEP}"bx"'


def test_canonicalize_end_to_end_smoke():
    from mmgraphrag_ray.corpus import ensure_corpus
    from mmgraphrag_ray.pipelines.kg import build_graph, build_mentions
    from mmgraphrag_ray.stages.extract import split_mentions

    path = ensure_corpus("/root/testdata/sf0.001")
    mentions = build_mentions(path).materialize()
    ent, _ = split_mentions(mentions)
    nodes, edges = build_graph(path, mentions_ds=mentions)
    cn, ce, alias, clusters = canonicalize_graph(nodes, edges, ent)
    cn_df, alias_df = cn.to_pandas(), alias.to_pandas()
    n_nodes = nodes.count()
    # contraction removed exactly the aliased members
    assert len(cn_df) == n_nodes - len(alias_df)
    assert len(alias_df) > 0  # duplicates exist in the corpus by construction
    # no aliased member survives in the canonical node set
    assert not set(alias_df.member_name) & set(cn_df.entity_name)


def test_iterative_contraction_equals_single_pass():
    """SURVEY §7 hard part (a): the reference folds per-image fused-graph
    iterations (F9) into one alias table + one contraction; prove the
    equivalence on composed aliases (round 1: B->A, round 2: A->Z gives the
    composed single-pass map {B->Z, A->Z})."""
    nodes = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"', '"Z"', '"X"'],
            "entity_type": ['"T"'] * 4,
            "description": ['"da"', '"db"', '"dz"', '"dx"'],
            "source_id": ["c1", "c2", "c3", "c4"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"B"', '"A"'],
            "tgt_id": ['"X"', '"X"'],
            "weight": [1.0, 2.0],
            "description": ['"bx"', '"ax"'],
            "source_id": ["c2", "c1"],
            "order": [1, 1],
        }
    )
    a1 = pd.DataFrame({"member_name": ['"B"'], "canonical_name": ['"A"']})
    a2 = pd.DataFrame({"member_name": ['"A"'], "canonical_name": ['"Z"']})

    # iterative: contract with a1, then with a2
    n1, e1 = contract_graph(ray.data.from_pandas(nodes), ray.data.from_pandas(edges),
                            ray.data.from_pandas(a1))
    n2, e2 = contract_graph(n1.materialize(), e1.materialize(), ray.data.from_pandas(a2))

    # single pass with the composed alias map
    comp = pd.DataFrame(
        {"member_name": ['"B"', '"A"'], "canonical_name": ['"Z"', '"Z"']}
    )
    ns, es = contract_graph(ray.data.from_pandas(nodes), ray.data.from_pandas(edges),
                            ray.data.from_pandas(comp))

    def srt(df):
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(srt(n2.to_pandas()), srt(ns.to_pandas()))
    pd.testing.assert_frame_equal(srt(e2.to_pandas()), srt(es.to_pandas()), check_dtype=False)


def test_contract_graph_join_path_equals_broadcast_path(ray_session):
    """Above the broadcast limit the alias table routes through
    bucketed_join; results must be identical to the broadcast path."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.linking import contract_graph

    nodes = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"', '"C"'],
            "entity_type": ['"T1"', '"T2"', '"T1"'],
            "description": ['"a."', '"b."', '"c."'],
            "source_id": ["c1", "c2", "c3"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"A"', '"B"'],
            "tgt_id": ['"C"', '"C"'],
            "weight": [2.0, 3.0],
            "description": ['"ac."', '"bc."'],
            "source_id": ["c1", "c2"],
            "order": [1, 1],
        }
    )
    alias = pd.DataFrame({"member_name": ['"B"'], "canonical_name": ['"A"']})

    def run(limit):
        n, ed = contract_graph(
            ray.data.from_pandas(nodes),
            ray.data.from_pandas(edges),
            ray.data.from_pandas(alias),
            broadcast_limit=limit,
        )
        nd = n.to_pandas().sort_values("entity_name").reset_index(drop=True)
        edd = ed.to_pandas().sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
        return nd, edd

    n_b, e_b = run(100)   # broadcast path
    n_j, e_j = run(0)     # join path
    pd.testing.assert_frame_equal(n_b, n_j)
    pd.testing.assert_frame_equal(
        e_b.astype({"weight": "float64", "order": "int64"}),
        e_j.astype({"weight": "float64", "order": "int64"}),
    )
    # B merged into A: the parallel edges (A,C) re-merge with summed weight
    merged = e_b[(e_b.src_id == '"A"') & (e_b.tgt_id == '"C"')]
    assert len(merged) == 1 and float(merged.weight.iloc[0]) == 5.0
    assert set(n_b.entity_name) == {'"A"', '"C"'}


def test_enhance_unaligned_entities_f6(ray_session):
    """F6: an UNKNOWN entity missing from the alias table is renamed and
    description-rewritten through the enhancer seam; its edges re-point to
    the new name and re-merge per A3 (reference fusion.py:636-727)."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.linking import enhance_unaligned_entities

    nodes = pd.DataFrame(
        {
            "entity_name": ['"HELPER"', '"M1"', '"ALIGNED_X"'],
            "entity_type": ['"UNKNOWN"', '"MODULE"', '"UNKNOWN"'],
            "description": ['"Module m1 calls helper."', '"Module m1."', '"x."'],
            "source_id": ["c1", "c1", "c2"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"HELPER"', '"HELPER"'],
            "tgt_id": ['"M1"', '"M1"'],
            "weight": [2.0, 2.0],
            "description": ['"Module m1 calls helper."', '"second call site."'],
            "source_id": ["c1", "c3"],
            "order": [1, 1],
        }
    )
    # ALIGNED_X is already in the alias table -> must NOT be enhanced
    alias = pd.DataFrame(
        {"member_name": ['"ALIGNED_X"'], "canonical_name": ['"X"']}
    )

    def enhancer(name, desc):
        return name.strip('"').join(['"', '_RESOLVED"']), f'"[enhanced] {desc}"'

    new_nodes, new_edges, rewrites = enhance_unaligned_entities(
        ray.data.from_pandas(nodes),
        ray.data.from_pandas(edges),
        ray.data.from_pandas(alias),
        enhancer,
    )
    nd = new_nodes.to_pandas()
    names = set(nd.entity_name)
    assert '"HELPER_RESOLVED"' in names and '"HELPER"' not in names
    assert '"ALIGNED_X"' in names  # aligned entity untouched
    row = nd[nd.entity_name == '"HELPER_RESOLVED"'].iloc[0]
    assert row["description"].startswith('"[enhanced]')
    ed = new_edges.to_pandas()
    # both parallel edges re-pointed to the new name and re-merged (A3)
    merged = ed[(ed.src_id == '"HELPER_RESOLVED"') & (ed.tgt_id == '"M1"')]
    assert len(merged) == 1
    assert float(merged.weight.iloc[0]) == 4.0
    assert '"second call site."' in merged.description.iloc[0]
    rw = rewrites.to_pandas()
    assert set(rw.member_name) == {'"HELPER"'}


def test_chunk_window_partitioning_j2(ray_session):
    """J2: chunk_window mode co-partitions entities mentioned in adjacent
    chunks of one document (positional locality, reference fusion.py:156-202)
    and separates distant ones."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.linking import assign_partitions

    mentions = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"', '"C"', '"A"'],
            "doc_id": ["d1", "d1", "d1", "d2"],
            "repo": ["r1", "r1", "r1", "r2"],
            "chunk_order_index": [0, 1, 9, 5],
        }
    )
    parts = assign_partitions(
        ray.data.from_pandas(mentions), mode="chunk_window", window=3
    ).to_pandas()
    p = dict(zip(parts["entity_name"], parts["partition"]))
    # A (chunk 0, first mention wins) and B (chunk 1) share the d1 window 0
    assert p['"A"'] == p['"B"'] == "d1#w0"
    # C is 8 chunks away -> different window
    assert p['"C"'] == "d1#w3"


def test_enhance_unaligned_entities_plan_parity(ray_session, monkeypatch):
    """The F6 dual plan: forcing the bucketed_join path (broadcast limit 0)
    must produce row-identical nodes/edges/rewrites to the default
    broadcast plan — the same parity contract _alias_applier carries."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.linking import enhance_unaligned_entities

    nodes = pd.DataFrame(
        {
            "entity_name": ['"HELPER"', '"M1"', '"ALIGNED_X"', '"LONER"'],
            "entity_type": ['"UNKNOWN"', '"MODULE"', '"UNKNOWN"', '"UNKNOWN"'],
            "description": ['"calls helper."', '"Module m1."', '"x."', '"l."'],
            "source_id": ["c1", "c1", "c2", "c4"],
        }
    )
    edges = pd.DataFrame(
        {
            "src_id": ['"HELPER"', '"HELPER"', '"LONER"'],
            "tgt_id": ['"M1"', '"M1"', '"M1"'],
            "weight": [2.0, 2.0, 1.0],
            "description": ['"call a."', '"call b."', '"l edge."'],
            "source_id": ["c1", "c3", "c4"],
            "order": [1, 1, 1],
        }
    )
    alias = pd.DataFrame(
        {"member_name": ['"ALIGNED_X"'], "canonical_name": ['"X"']}
    )

    def enhancer(name, desc):
        return name.strip('"').join(['"', '_RESOLVED"']), f'"[enhanced] {desc}"'

    def run():
        n, e, rw = enhance_unaligned_entities(
            ray.data.from_pandas(nodes),
            ray.data.from_pandas(edges),
            ray.data.from_pandas(alias),
            enhancer,
        )

        def norm(ds, keys):
            df = ds.to_pandas()
            return (df[sorted(df.columns)]
                    .sort_values(keys, kind="mergesort")
                    .reset_index(drop=True))

        return (norm(n, ["entity_name"]), norm(e, ["src_id", "tgt_id"]),
                norm(rw, ["member_name"]))

    nb, eb, rb = run()  # broadcast plan (default limit)
    monkeypatch.setenv("RAYKG_ALIAS_BROADCAST_MAX", "0")
    nj, ej, rj = run()  # join plan for both the anti-join and desc apply

    pd.testing.assert_frame_equal(nb, nj)
    pd.testing.assert_frame_equal(eb, ej)
    pd.testing.assert_frame_equal(rb, rj)
    assert '"HELPER_RESOLVED"' in set(nb.entity_name)
    assert set(rb.member_name) == {'"HELPER"', '"LONER"'}

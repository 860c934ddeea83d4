"""Merge algebra goldens + permutation invariance (FIXTURES.md F5;
reference text2graph.py:140-279)."""

import pandas as pd
import ray.data

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.config import KGConfig
from mmgraphrag_ray.stages.merge import (
    backfill_unknown_nodes,
    finalize_edges,
    merge_edges,
    merge_nodes,
    summarize_description,
)

CFG = KGConfig()


def _ent_mentions():
    return pd.DataFrame(
        {
            "entity_name": ['"A"', '"A"', '"A"', '"B"'],
            "entity_type": ['"FUNCTION"', '"CLASS"', '"FUNCTION"', '"MODULE"'],
            "description": ['"d2"', '"d1"', '"d1"', '"db"'],
            "source_id": ["c1", "c2", "c1", "c3"],
        }
    )


def _rel_mentions():
    return pd.DataFrame(
        {
            "src_id": ['"A"', '"A"', '"A"'],
            "tgt_id": ['"B"', '"B"', '"C"'],
            "weight": [2.0, 3.5, 1.0],
            "description": ['"r2"', '"r1"', '"rc"'],
            "source_id": ["c1", "c2", "c1"],
            "order": [2, 1, 1],
        }
    )


def test_node_merge_golden():
    nodes = merge_nodes(ray.data.from_pandas(_ent_mentions()), CFG).to_pandas()
    nodes = nodes.sort_values("entity_name").reset_index(drop=True)
    a = nodes[nodes.entity_name == '"A"'].iloc[0]
    assert a.entity_type == '"FUNCTION"'  # mode: 2x FUNCTION vs 1x CLASS
    assert a.description == f'"d1"{SEP}"d2"'  # sorted set join
    assert a.source_id == f"c1{SEP}c2"
    b = nodes[nodes.entity_name == '"B"'].iloc[0]
    assert b.entity_type == '"MODULE"' and b.description == '"db"'


def test_node_type_mode_tie_breaks_lexicographically():
    df = pd.DataFrame(
        {
            "entity_name": ['"X"', '"X"'],
            "entity_type": ['"B_TYPE"', '"A_TYPE"'],
            "description": ['"d"', '"d"'],
            "source_id": ["c1", "c2"],
        }
    )
    nodes = merge_nodes(ray.data.from_pandas(df), CFG).to_pandas()
    assert nodes.iloc[0].entity_type == '"A_TYPE"'


def test_edge_merge_golden():
    edges = finalize_edges(merge_edges(ray.data.from_pandas(_rel_mentions()), CFG)).to_pandas()
    edges = edges.sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
    ab = edges[(edges.src_id == '"A"') & (edges.tgt_id == '"B"')].iloc[0]
    assert ab.weight == 5.5  # sum
    assert ab["order"] == 1  # min
    assert ab.description == f'"r1"{SEP}"r2"'
    assert ab.source_id == f"c1{SEP}c2"
    ac = edges[(edges.tgt_id == '"C"')].iloc[0]
    assert ac.weight == 1.0


def test_permutation_and_partitioning_invariance():
    """Shuffled row order + different block splits give identical results
    (partial aggregation is safe: associative+commutative)."""
    base = _ent_mentions()
    perm = base.sample(frac=1.0, random_state=7).reset_index(drop=True)
    split_blocks = [perm.iloc[:1], perm.iloc[1:2], perm.iloc[2:]]
    r1 = merge_nodes(ray.data.from_pandas(base), CFG).to_pandas()
    r2 = merge_nodes(ray.data.from_pandas(split_blocks), CFG).to_pandas()
    key = ["entity_name", "entity_type", "description", "source_id"]
    assert (
        r1.sort_values("entity_name")[key].reset_index(drop=True).equals(
            r2.sort_values("entity_name")[key].reset_index(drop=True)
        )
    )


def test_unknown_backfill():
    nodes = merge_nodes(ray.data.from_pandas(_ent_mentions()), CFG).materialize()
    edges = merge_edges(ray.data.from_pandas(_rel_mentions()), CFG).materialize()
    all_nodes = backfill_unknown_nodes(nodes, edges).to_pandas()
    c = all_nodes[all_nodes.entity_name == '"C"']
    assert len(c) == 1
    row = c.iloc[0]
    assert row.entity_type == '"UNKNOWN"'
    # attrs come from the (pre-summarize) merged A-C edge
    assert row.description == '"rc"' and row.source_id == "c1"
    # existing nodes not duplicated
    assert (all_nodes.entity_name == '"A"').sum() == 1


def test_unknown_backfill_bucketed_path_matches(monkeypatch):
    """The bucketed-shuffle anti-join (scale path, taken above the name-count
    cap) must produce the same rows as the broadcast probe."""
    nodes = merge_nodes(ray.data.from_pandas(_ent_mentions()), CFG).materialize()
    edges = merge_edges(ray.data.from_pandas(_rel_mentions()), CFG).materialize()
    broadcast = backfill_unknown_nodes(nodes, edges).to_pandas()
    monkeypatch.setenv("RAYKG_BROADCAST_NAMES_MAX", "0")
    bucketed = backfill_unknown_nodes(nodes, edges).to_pandas()
    key = ["entity_name", "entity_type", "description", "source_id"]
    assert (
        broadcast.sort_values("entity_name")[key]
        .reset_index(drop=True)
        .equals(bucketed.sort_values("entity_name")[key].reset_index(drop=True))
    )


def test_summarize_gate_truncates_at_threshold():
    short = "w " * 10
    assert summarize_description(short, 500) == short
    long = "word " * 600  # 1200 tokens
    out = summarize_description(long, 500)
    from mmgraphrag_ray.tokenizer import encode

    assert len(encode(out)) == 500


def test_description_over_gate_truncated_in_merge():
    # one entity with 600 distinct single-token descriptions -> joined desc
    # far over the 500-token gate -> truncated to exactly 500 tokens
    n = 600
    df = pd.DataFrame(
        {
            "entity_name": ['"BIG"'] * n,
            "entity_type": ['"T"'] * n,
            "description": [f'"d{i:04d}"' for i in range(n)],
            "source_id": [f"c{i}" for i in range(n)],
        }
    )
    nodes = merge_nodes(ray.data.from_pandas(df), CFG).to_pandas()
    from mmgraphrag_ray.tokenizer import encode

    assert len(encode(nodes.iloc[0].description)) == 500


def test_fused_merge_equals_separate_merges():
    """merge_graph (single fused shuffle) must equal merge_nodes+merge_edges."""
    import ray.data

    from mmgraphrag_ray.stages.merge import finalize_edges, merge_graph

    ent = ray.data.from_pandas(_ent_mentions())
    rel = ray.data.from_pandas(_rel_mentions())
    n1 = merge_nodes(ent, CFG).to_pandas()
    e1 = finalize_edges(merge_edges(rel, CFG)).to_pandas()
    n2, e2 = merge_graph(ent, rel, CFG)
    n2, e2 = n2.to_pandas(), finalize_edges(e2).to_pandas()

    def srt(df):
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(srt(n1), srt(n2))
    pd.testing.assert_frame_equal(srt(e1), srt(e2), check_dtype=False)


def test_hot_key_combiner_bounds_shuffle_rows():
    """Skew guard (north_rule): a mega-hot entity mentioned in every batch
    must NOT ship every raw mention through the shuffle — the per-batch
    combiner emits one state row per (key, kind, distinct value) per batch."""
    from mmgraphrag_ray.stages.merge import _node_partial

    n = 5000
    hot = pd.DataFrame(
        {
            "entity_name": ['"HOT"'] * n,
            "entity_type": ['"FUNCTION"'] * n,
            "description": ['"same desc"'] * n,  # one distinct desc
            "source_id": [f"c{i % 7}" for i in range(n)],  # 7 distinct chunks
        }
    )
    partial = _node_partial(hot)
    # 1 type row + 1 desc row + 7 source rows, NOT 5000 rows
    assert len(partial) == 9
    t = partial[partial["kind"] == "t"]
    assert int(t["n"].iloc[0]) == n  # multiplicity preserved for type mode


def test_fused_merge_unified_mentions_path():
    """merge_graph(mentions_ds=...) — ONE scan computing both partials —
    must equal the pre-split two-scan path."""
    import numpy as np
    import ray.data

    from mmgraphrag_ray.stages.merge import finalize_edges, merge_graph

    ent, rel = _ent_mentions(), _rel_mentions()
    uni = pd.concat(
        [
            ent.assign(kind="entity", src_id=None, tgt_id=None,
                       weight=np.nan, order=pd.Series(dtype="float64")),
            rel.assign(kind="rel", entity_name=None, entity_type=None),
        ],
        ignore_index=True,
    )
    n1, e1 = merge_graph(ray.data.from_pandas(ent), ray.data.from_pandas(rel), CFG)
    n2, e2 = merge_graph(cfg=CFG, mentions_ds=ray.data.from_pandas(uni))
    n1, e1 = n1.to_pandas(), finalize_edges(e1).to_pandas()
    n2, e2 = n2.to_pandas(), finalize_edges(e2).to_pandas()

    def srt(df):
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(srt(n1), srt(n2))
    pd.testing.assert_frame_equal(srt(e1), srt(e2), check_dtype=False)


def test_pin_dataset_spill_path_parity(tmp_path, monkeypatch):
    """RAYKG_SPILL_DIR routes multi-consumer pins through parquet
    checkpoints instead of object-store materialize — identical rows."""
    import ray.data

    from mmgraphrag_ray.stages.merge import finalize_edges, merge_graph

    ent = ray.data.from_pandas(_ent_mentions())
    rel = ray.data.from_pandas(_rel_mentions())
    n1, e1 = merge_graph(ent, rel, CFG)
    n1, e1 = n1.to_pandas(), finalize_edges(e1).to_pandas()

    monkeypatch.setenv("RAYKG_SPILL_DIR", str(tmp_path))
    n2, e2 = merge_graph(ent, rel, CFG)
    n2, e2 = n2.to_pandas(), finalize_edges(e2).to_pandas()
    assert (tmp_path / "merged_fused").is_dir()  # checkpoint actually used

    def srt(df):
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(srt(n1), srt(n2), check_dtype=False)
    pd.testing.assert_frame_equal(srt(e1), srt(e2), check_dtype=False)


def test_fused_backfill_winners_parity(ray_session):
    """merge_graph(backfill_candidates=True) computes the UNKNOWN-endpoint
    anti-join inside the fused shuffle; the resulting nodes table must be
    row-identical to the self-contained backfill plans (both the broadcast
    probe and the bucketed shuffle, forced via env caps)."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.merge import backfill_unknown_nodes, merge_graph

    mentions = pd.DataFrame({
        "kind": ["entity", "rel", "rel", "rel"],
        "entity_name": ['"A"', None, None, None],
        "entity_type": ['"MODULE"', None, None, None],
        "src_id": [None, '"A"', '"A"', '"B"'],
        "tgt_id": [None, '"B"', '"C"', '"C"'],
        "weight": [None, 2.0, 1.0, 1.0],
        "order": [None, 1, 1, 1],
        "description": ['"a."', '"ab."', '"ac."', '"bc."'],
        "source_id": ["c1", "c1", "c2", "c2"],
    })

    def norm(nodes_ds):
        df = nodes_ds.to_pandas()
        return (df[sorted(df.columns)]
                .sort_values("entity_name", kind="mergesort")
                .reset_index(drop=True))

    ds = ray.data.from_pandas(mentions)
    n_f, e_f, w_f = merge_graph(mentions_ds=ds, backfill_candidates=True)
    fused = norm(backfill_unknown_nodes(n_f, e_f, winners_ds=w_f))

    n_b, e_b = merge_graph(mentions_ds=ds)
    plain = norm(backfill_unknown_nodes(n_b, e_b))

    pd.testing.assert_frame_equal(fused, plain)
    # B and C are backfilled; B's winning payload is min-(src,tgt) edge (A,B)
    assert set(fused.entity_name) == {'"A"', '"B"', '"C"'}
    row_b = fused[fused.entity_name == '"B"'].iloc[0]
    assert row_b.entity_type == '"UNKNOWN"' and '"ab."' in row_b.description


def test_fused_backfill_winner_payload_plan_parity(ray_session, monkeypatch):
    """_fetch_winner_payloads dual plan: forcing the bucketed-join path
    (RAYKG_BACKFILL_WINNERS_MAX=0, the pathological-winner-rate plan that
    never pulls the winners frame to the driver) must produce a nodes table
    row-identical — payloads included — to the default broadcast plan."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.merge import backfill_unknown_nodes, merge_graph

    mentions = pd.DataFrame({
        "kind": ["entity", "rel", "rel", "rel"],
        "entity_name": ['"A"', None, None, None],
        "entity_type": ['"MODULE"', None, None, None],
        "src_id": [None, '"A"', '"A"', '"B"'],
        "tgt_id": [None, '"B"', '"C"', '"C"'],
        "weight": [None, 2.0, 1.0, 1.0],
        "order": [None, 1, 1, 1],
        "description": ['"a."', '"ab."', '"ac."', '"bc."'],
        "source_id": ["c1", "c1", "c2", "c2"],
    })
    ds = ray.data.from_pandas(mentions)
    n, e, w = merge_graph(mentions_ds=ds, backfill_candidates=True)

    def norm(nodes_ds):
        df = nodes_ds.to_pandas()
        return (df[sorted(df.columns)]
                .sort_values("entity_name", kind="mergesort")
                .reset_index(drop=True))

    broadcast = norm(backfill_unknown_nodes(n, e, winners_ds=w))
    monkeypatch.setenv("RAYKG_BACKFILL_WINNERS_MAX", "0")
    joined = norm(backfill_unknown_nodes(n, e, winners_ds=w))

    pd.testing.assert_frame_equal(broadcast, joined)
    assert set(broadcast.entity_name) == {'"A"', '"B"', '"C"'}
    row_b = broadcast[broadcast.entity_name == '"B"'].iloc[0]
    assert row_b.entity_type == '"UNKNOWN"' and '"ab."' in row_b.description

"""Hypothesis property tests: the merge algebra is invariant to row order
and block partitioning (FIXTURES.md F5 property fixtures) — the proof that
partial (combiner) aggregation is safe on any scheduler interleaving."""

import pandas as pd
import ray.data
from hypothesis import HealthCheck, given, settings, strategies as st

from mmgraphrag_ray.config import KGConfig
from mmgraphrag_ray.stages.merge import merge_edges, merge_nodes

CFG = KGConfig()

names = st.sampled_from(['"A"', '"B"', '"C"'])
types = st.sampled_from(['"T1"', '"T2"', '"T3"'])
descs = st.sampled_from(['"d1"', '"d2"', '"d3"', '"d4"'])
chunks = st.sampled_from(["c1", "c2", "c3"])


@st.composite
def mention_frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return pd.DataFrame(
        {
            "entity_name": [draw(names) for _ in range(n)],
            "entity_type": [draw(types) for _ in range(n)],
            "description": [draw(descs) for _ in range(n)],
            "source_id": [draw(chunks) for _ in range(n)],
        }
    )


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@given(mention_frames(), st.randoms(use_true_random=False))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_node_merge_partitioning_invariance(df, rnd):
    perm = df.sample(frac=1.0, random_state=rnd.randrange(1 << 16)).reset_index(drop=True)
    cut = rnd.randrange(len(perm)) or 1
    blocks = [perm.iloc[:cut], perm.iloc[cut:]]
    blocks = [b for b in blocks if len(b)]
    a = merge_nodes(ray.data.from_pandas(df), CFG).to_pandas()
    b = merge_nodes(ray.data.from_pandas(blocks), CFG).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


@st.composite
def rel_frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    pairs = [tuple(sorted((draw(names), draw(names)))) for _ in range(n)]
    return pd.DataFrame(
        {
            "src_id": [p[0] for p in pairs],
            "tgt_id": [p[1] for p in pairs],
            "weight": [float(draw(st.integers(1, 9))) for _ in range(n)],
            "description": [draw(descs) for _ in range(n)],
            "source_id": [draw(chunks) for _ in range(n)],
            "order": [draw(st.integers(1, 3)) for _ in range(n)],
        }
    )


@given(rel_frames(), st.randoms(use_true_random=False))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_edge_merge_partitioning_invariance(df, rnd):
    perm = df.sample(frac=1.0, random_state=rnd.randrange(1 << 16)).reset_index(drop=True)
    cut = rnd.randrange(len(perm)) or 1
    blocks = [b for b in (perm.iloc[:cut], perm.iloc[cut:]) if len(b)]
    a = merge_edges(ray.data.from_pandas(df), CFG).to_pandas()
    b = merge_edges(ray.data.from_pandas(blocks), CFG).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))

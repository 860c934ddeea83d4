"""Hash embedder + entity VDB build (reference T3/A6 seams)."""

import numpy as np
import pandas as pd
import ray.data

from mmgraphrag_ray.stages.embed import EMBED_DIM, HashEmbedder, build_entity_vecs
from mmgraphrag_ray.textutils import md5_hex


def test_embedder_deterministic_and_normalized():
    e = HashEmbedder()
    v1 = e.encode(["def parse_config(a): pass", "other text"])
    v2 = e.encode(["def parse_config(a): pass", "other text"])
    assert v1.shape == (2, EMBED_DIM)
    assert np.array_equal(v1, v2)
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0)


def test_similar_texts_closer_than_different():
    e = HashEmbedder()
    v = e.encode(
        ["parse config file loader", "parse config file reader", "zebra quantum banana"]
    )
    sim_close = float(v[0] @ v[1])
    sim_far = float(v[0] @ v[2])
    assert sim_close > sim_far


def test_build_entity_vecs():
    nodes = pd.DataFrame(
        {
            "entity_name": ['"A"', '"B"'],
            "entity_type": ['"T"', '"T"'],
            "description": ['"da"', '"db"'],
            "source_id": ["c1", "c2"],
        }
    )
    vecs = build_entity_vecs(ray.data.from_pandas(nodes)).to_pandas()
    assert len(vecs) == 2
    assert vecs.iloc[0].entity_id == "ent-" + md5_hex(vecs.iloc[0].entity_name)
    assert len(vecs.iloc[0].embedding) == EMBED_DIM


def test_vec_components_consistent_with_embedding(ray_session):
    """Sparse integer components, normalized, must equal the dense embedding
    (the value-oracle form and the float form are the same math)."""
    from mmgraphrag_ray.stages.embed import entity_vec_components

    nodes = pd.DataFrame(
        {
            "entity_name": ['"PARSE_CONFIG"', '"LOAD_FILE"'],
            "entity_type": ['"T"', '"T"'],
            "description": ['"parses the config file."', '"loads a file from disk."'],
            "source_id": ["c1", "c2"],
        }
    )
    ds = ray.data.from_pandas(nodes)
    comp = entity_vec_components(ds).to_pandas()
    vecs = build_entity_vecs(ds).to_pandas()
    for _, vrow in vecs.iterrows():
        sparse = comp[comp.entity_id == vrow.entity_id]
        dense = np.zeros(EMBED_DIM, dtype=np.float32)
        dense[sparse.dim_idx.to_numpy()] = sparse.component.to_numpy()
        n = np.linalg.norm(dense)
        if n:
            dense = dense / n
        assert np.allclose(dense, np.array(vrow.embedding), atol=1e-6)


def test_no_hardcoded_concurrency_caps():
    """Starvation-knob guard (the (1,4)/(1,8) cap class removed in rounds
    2-4): no literal `concurrency=(a, b)` tuple at any call site in the
    package — pool sizing must come from cfg or the env/CPU-derived
    helpers (embed_pool_concurrency, media_concurrency)."""
    import pathlib
    import re

    import mmgraphrag_ray

    root = pathlib.Path(mmgraphrag_ray.__file__).parent
    pat = re.compile(r"concurrency\s*=\s*\(\s*\d+\s*,\s*\d+\s*\)")
    offenders = [
        f"{p.name}:{i}"
        for p in root.rglob("*.py")
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pat.search(line)
    ]
    assert not offenders, f"hard-coded actor-pool caps: {offenders}"

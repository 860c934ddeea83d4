"""Incremental indexing: new docs merged into an existing graph
(reference upsert-with-existing branches, text2graph.py:164-191, 232-257)."""

import os

import pyarrow.parquet as pq
import pytest

from mmgraphrag_ray import GRAPH_FIELD_SEP as SEP
from mmgraphrag_ray.corpus import generate_files_table
from mmgraphrag_ray.pipelines.kg import build_graph, update_graph
from mmgraphrag_ray.tokenizer import num_tokens

BASE_DIR = "/tmp/raykg_incr/base"
NEW_DIR = "/tmp/raykg_incr/new"
ALL_DIR = "/tmp/raykg_incr/all"


@pytest.fixture(scope="module")
def split_corpora():
    table = generate_files_table(48)
    for d, t in ((BASE_DIR, table.slice(0, 36)), (NEW_DIR, table.slice(36)), (ALL_DIR, table)):
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "files.parquet"), row_group_size=500)
    return BASE_DIR, NEW_DIR, ALL_DIR


def test_incremental_equals_batch_where_history_free(split_corpora):
    base_dir, new_dir, all_dir = split_corpora
    base_nodes, base_edges = build_graph(base_dir)
    base_nodes = base_nodes.materialize()
    base_nd = base_nodes.to_pandas()

    inc_nodes, inc_edges = update_graph(new_dir, base_nodes, base_edges.materialize())
    full_nodes, full_edges = build_graph(all_dir)

    inc_nd, full_nd = inc_nodes.to_pandas(), full_nodes.to_pandas()
    inc_ed, full_ed = inc_edges.to_pandas(), full_edges.to_pandas()

    # node name sets identical
    assert set(inc_nd.entity_name) == set(full_nd.entity_name)
    # edge keys identical and weights exactly additive
    inc_w = dict(zip(zip(inc_ed.src_id, inc_ed.tgt_id), inc_ed.weight))
    full_w = dict(zip(zip(full_ed.src_id, full_ed.tgt_id), full_ed.weight))
    assert inc_w == full_w

    # for nodes with history-free semantics (not UNKNOWN in the base graph,
    # base description below the summarize gate), incremental == batch
    base_info = {
        r.entity_name: (r.entity_type, num_tokens(r.description))
        for r in base_nd.itertuples()
    }
    full_by_name = full_nd.set_index("entity_name")
    inc_by_name = inc_nd.set_index("entity_name")
    checked = 0
    for name, (btype, btoks) in base_info.items():
        if btype == '"UNKNOWN"' or btoks >= 500:
            continue
        assert inc_by_name.loc[name, "description"] == full_by_name.loc[name, "description"], name
        assert inc_by_name.loc[name, "source_id"] == full_by_name.loc[name, "source_id"], name
        checked += 1
    assert checked > 0.8 * len(base_info)

    # brand-new entities (only in the new files) match the batch run exactly
    new_only = set(full_nd.entity_name) - set(base_nd.entity_name)
    for name in new_only:
        assert inc_by_name.loc[name, "description"] == full_by_name.loc[name, "description"]

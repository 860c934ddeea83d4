"""GraphML export/import for the nodes/edges tables (reference S5:
storage.py:331-342, 404-429 writes the KG via networkx with stable ordering
storage.py:344-402).  Intended for small/filtered graphs — the parquet tables
are the scale-path representation; GraphML is the interchange format a
reference user expects to be able to produce.
"""

from __future__ import annotations

import html

import networkx as nx
import pandas as pd


def tables_to_graphml(nodes_df: pd.DataFrame, edges_df: pd.DataFrame, path: str) -> None:
    """Write nodes/edges to GraphML with the reference's deterministic
    ordering (_stabilize_graph storage.py:344-402: nodes sorted by id, edges
    canonicalized src<=tgt and sorted)."""
    g = nx.Graph()
    for row in nodes_df.sort_values("entity_name", kind="mergesort").itertuples():
        g.add_node(
            row.entity_name,
            entity_type=row.entity_type,
            description=row.description,
            source_id=row.source_id,
        )
    edges_sorted = edges_df.sort_values(["src_id", "tgt_id"], kind="mergesort")
    for row in edges_sorted.itertuples():
        g.add_edge(
            row.src_id,
            row.tgt_id,
            weight=float(row.weight),
            description=row.description,
            source_id=row.source_id,
            order=int(row.order),
        )
    nx.write_graphml(g, path)


def graphml_to_tables(path: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Read a GraphML graph back into nodes/edges DataFrames (node relabel
    html.unescape as in reference storage.py:359)."""
    g = nx.read_graphml(path)
    g = nx.relabel_nodes(g, {n: html.unescape(n) for n in g.nodes()})
    nodes = pd.DataFrame(
        [
            {
                "entity_name": n,
                "entity_type": d.get("entity_type", ""),
                "description": d.get("description", ""),
                "source_id": d.get("source_id", ""),
            }
            for n, d in sorted(g.nodes(data=True))
        ]
    )
    edges = pd.DataFrame(
        [
            {
                "src_id": min(u, v),
                "tgt_id": max(u, v),
                "weight": float(d.get("weight", 1.0)),
                "description": d.get("description", ""),
                "source_id": d.get("source_id", ""),
                "order": int(d.get("order", 1)),
            }
            for u, v, d in g.edges(data=True)
        ]
    ).sort_values(["src_id", "tgt_id"], kind="mergesort").reset_index(drop=True)
    return nodes, edges

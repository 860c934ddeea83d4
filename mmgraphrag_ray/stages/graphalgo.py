"""Iterative graph algorithms over the constructed KG tables.

``pagerank_int`` runs power iteration in INTEGER arithmetic: ranks are
scaled to ``SCALE`` and every per-edge contribution is
``(85 * rank // 100) // degree`` (floor division, damping 0.85).  Integer
sums are associative/commutative regardless of shuffle order, so —
unlike float PageRank, whose summation order varies run to run — the
result is bit-deterministic and exactly reproducible in SQL (the mass
lost to flooring simply decays; both engines lose identical amounts).

Scale shape: each iteration is ONE key-partitioned join (rank+degree
broadcast under the join cap, bucketed shuffle above it) and ONE grouped
sum with a per-batch combiner; the rank table is re-materialized per
iteration (bounded state: one int64 per node).
"""

from __future__ import annotations

import pandas as pd

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_int(nodes_ds, edges_ds, iterations: int = 3,
                 node_col: str = "entity_name",
                 src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """-> Dataset(node, rank) after ``iterations`` integer power steps over
    the undirected graph (each edge contributes in both directions).
    Teleport share = ((SCALE * 15) // 100) // N per node per step."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    n_nodes = nodes_ds.count()
    teleport = ((SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN) // n_nodes

    nodes = nodes_ds.map_batches(
        lambda b: b[[node_col]].rename(columns={node_col: "node"}),
        batch_format="pandas",
    ).materialize()

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        fwd = b[[src_col, tgt_col]].rename(columns={src_col: "u", tgt_col: "v"})
        rev = b[[tgt_col, src_col]].rename(columns={tgt_col: "u", src_col: "v"})
        return pd.concat([fwd, rev], ignore_index=True)

    bid = edges_ds.map_batches(bidir, batch_format="pandas").materialize()
    deg = bucketed_groupby_agg(
        bid.map_batches(lambda b: b[["u"]], batch_format="pandas"),
        keys=["u"],
        aggs={"d": (None, "count")},
    ).materialize()

    ranks = nodes.map_batches(
        lambda b: b.assign(r=SCALE // n_nodes), batch_format="pandas"
    ).materialize()

    for _ in range(iterations):
        # rank + degree per source node (ranks/deg are node-sized tables —
        # small next to edges — so the join claims the broadcast plan)
        # materialize small sides: bucketed_join's broadcast path calls
        # count() then to_arrow_refs(), which re-executes a LAZY plan twice
        rd = bucketed_join(
            ranks.map_batches(
                lambda b: b.rename(columns={"node": "u"}), batch_format="pandas"
            ),
            deg,
            on="u",
            small_side="right",
        ).materialize()
        contrib_src = bucketed_join(bid, rd, on="u", small_side="right")

        def per_edge(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"v": pd.Series(dtype=object), "c": pd.Series(dtype="int64")}
                )
            c = (DAMP_NUM * b["r"] // DAMP_DEN) // b["d"]
            return pd.DataFrame({"v": b["v"], "c": c.astype("int64")})

        sums = bucketed_groupby_agg(
            contrib_src.map_batches(per_edge, batch_format="pandas"),
            keys=["v"],
            aggs={"s": ("c", "sum")},
        ).materialize()
        joined = bucketed_join(
            nodes, sums.map_batches(
                lambda b: b.rename(columns={"v": "node"}), batch_format="pandas"
            ),
            on="node",
            how="left",
            small_side="right",
        )

        def add_teleport(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"node": pd.Series(dtype=object), "r": pd.Series(dtype="int64")}
                )
            s = b["s"].fillna(0).astype("int64")
            return pd.DataFrame({"node": b["node"], "r": teleport + s})

        ranks = joined.map_batches(add_teleport, batch_format="pandas").materialize()

    return ranks

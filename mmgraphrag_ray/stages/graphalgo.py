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

import numpy as np
import pandas as pd
import ray.data

from ..arrowutil import sever_lineage
from ..hashing import bucket_any

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100
N_BUCKETS = 64


def _edge_bucket_refs(edges_tagged, bucket_col: str, n_buckets: int,
                      keep_cols: list[str]):
    """One-time per-bucket object-store split of a STATIC edge relation.

    The fused Pregel loops below shuffle per-round state (node markers +
    contributions) grouped by a routing bucket; before round 5 the
    unchanged edge rows were unioned into that shuffle every round —
    O(|E|) redundant serialize+transfer per round.  This helper pays ONE
    hash shuffle to co-locate each bucket's edges, then splits every
    resulting block into per-bucket Arrow tables via a multi-return Ray
    task, so the pieces are plain driver-owned object-store entries.

    Each round's reduce task fetches its bucket's pieces with ray.get —
    zero-copy plasma reads, cached node-local after the first round on a
    real cluster — and the per-round shuffle carries only rows that are
    genuinely new.  Returns {bucket: [ObjectRef[pa.Table]]}; the caller
    must keep the dict referenced for the loop's lifetime (the refs own
    the blocks)."""
    import pyarrow as pa
    import ray as _ray

    blocks = (
        edges_tagged.groupby(bucket_col)
        .map_groups(lambda g: g, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    # all Pregel edge relations are (node-name string, node-name string);
    # empty shuffle partitions yield SCHEMA-LESS blocks (memory: raykg
    # gotchas), so split needs the piece schema explicitly
    piece_schema = pa.schema([pa.field(c, pa.string()) for c in keep_cols])

    @_ray.remote
    def split(tbl, n=n_buckets, col=bucket_col, cols=tuple(keep_cols),
              schema=piece_schema):
        import pyarrow.compute as pc
        if tbl.num_rows == 0 or col not in tbl.schema.names:
            empty = schema.empty_table()
            return tuple(empty for _ in range(n))
        b = tbl.column(col)
        return tuple(
            tbl.filter(pc.equal(b, i)).select(list(cols)).cast(schema)
            for i in range(n)
        )

    mapping: dict[int, list] = {i: [] for i in range(n_buckets)}
    for blk in blocks:
        for i, ref in enumerate(
            split.options(num_returns=n_buckets).remote(blk)
        ):
            mapping[i].append(ref)
    return mapping


def _fetch_bucket_edges(mapping: dict, bucket_id: int,
                        keep_cols: list[str]) -> pd.DataFrame:
    """Concatenate one bucket's static edge pieces (see
    :func:`_edge_bucket_refs`) into a pandas frame; empty-safe."""
    import pyarrow as pa

    refs = mapping.get(bucket_id, [])
    if not refs:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in keep_cols})
    tbls = ray.get(list(refs))
    return pa.concat_tables(tbls).to_pandas()


def min_label_rounds(nodes_ds, edges_ds, rounds: int = 4,
                     node_col: str = "entity_name",
                     src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """K rounds of min-label propagation over the undirected KG — the
    building block of distributed connected components (stages/dedup.py
    connected_components iterates this same step to convergence; here the
    round count is FIXED so the intermediate state is value-comparable
    across engines via K unrolled SQL iterations).

    label_0(v) = v; label_{t+1}(v) = min(label_t(v), min over neighbors u
    of label_t(u)).  Labels are the node-name strings; min is bytewise
    (ASCII/UTF-8 code-point order — identical in pandas and DuckDB's
    binary collation).

    Fused Pregel loop (round 4), static edges pinned (round 5): each
    round is ONE node-bucketed shuffle — a bucket min-merges the label
    proposals shipped by the previous round into its node markers (the
    label rides the marker row since min is cumulative) and immediately
    ships the merged label over the bucket's edges, which it reads from
    the one-time per-bucket object-store split
    (:func:`_edge_bucket_refs`) instead of re-shuffling them every
    round.  rounds+1 shuffles total carrying only markers+proposals, no
    per-round broadcast collects.

    -> Dataset(node, label)."""

    from ..arrowutil import df_to_table as _d2t

    N_PB = 64

    def _nb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_any(s, N_PB), index=s.index)

    def edge_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": pd.concat([b[src_col], b[tgt_col]], ignore_index=True)
            .astype(object),
            "v": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)
            .astype(object),
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object), "v": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    def seed_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": b[node_col].astype(object),
            "lbl": b[node_col].astype(object),
            "kind": "n",
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object),
            "lbl": pd.Series(dtype=object),
            "kind": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    edge_parts = _edge_bucket_refs(
        edges_ds.map_batches(edge_rows, batch_format="pandas"),
        "_pbucket", N_PB, ["u", "v"])
    state = nodes_ds.map_batches(
        seed_rows, batch_format="pandas").materialize()

    def make_step(first: bool, last: bool):
        def step(g: pd.DataFrame):
            marks = g[g["kind"] == "n"]
            if first:
                cur = marks.set_index("u")["lbl"]
                changed = cur  # initial labels count as changed: ship all
            else:
                p = (g[g["kind"] == "c"]
                     .groupby("u", sort=False)["lbl"].min())
                own = marks.set_index("u")["lbl"]
                nbr = p.reindex(own.index)
                cur = own.where(nbr.isna() | (own <= nbr), nbr)
                # delta propagation (min is cumulative): a label that did
                # not improve this round was shipped the round it last
                # changed, so neighbors already min-merged it — ship only
                # strict improvements (most nodes converge in 1-2 rounds)
                changed = cur[cur < own]
            if last:
                return _d2t(pd.DataFrame({
                    "node": cur.index.to_numpy(dtype=object),
                    "label": cur.to_numpy(dtype=object),
                }))
            e = _fetch_bucket_edges(
                edge_parts, int(g["_pbucket"].iloc[0]), ["u", "v"])
            l_e = e["u"].map(changed)
            live = l_e.notna()
            ship = pd.DataFrame({
                "u": e.loc[live, "v"],
                "lbl": l_e[live].astype(object),
            })
            # map-side combiner: pre-min per destination in this bucket
            ship = ship.groupby("u", sort=False, as_index=False)[
                "lbl"].min()
            ship["kind"] = "c"
            markers = pd.DataFrame({
                "u": cur.index.to_numpy(dtype=object),
                "lbl": cur.to_numpy(dtype=object), "kind": "n",
            })
            out = pd.concat([markers, ship], ignore_index=True)
            out["_pbucket"] = _nb(out["u"])
            return _d2t(out)

        return step

    for i in range(rounds + 1):
        first, last = i == 0, i == rounds
        state = sever_lineage(
            state.groupby("_pbucket").map_groups(
                make_step(first, last), batch_format="pandas"))
    return state


def _triangle_rows(edges_ds,
                   src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Degree-ordered triangle ENUMERATION over the undirected edge set —
    the shared core of triangle_counts / clustering coefficients / k-truss:
    orient every edge from the (degree, name)-smaller endpoint to the
    larger (out-degree O(sqrt(m)), so wedge enumeration never explodes on
    hub nodes), enumerate wedges per source inside a bucketed groupby,
    close them with one bucketed join against the oriented edges.

    -> Dataset(w_u, w_v, w_w) with ONE row per distinct triangle (corners
    in orientation-key order), or None for a triangle-free graph."""

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

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

    # orientation key: zero-padded degree then name — a total order whose
    # string comparison is identical in pandas and SQL
    def okey_frame(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["okey"] = out["d"].map(lambda d: f"{int(d):09d}") + "|" + out["u"].astype(str)
        return out[["u", "okey"]]

    okeys = deg.map_batches(okey_frame, batch_format="pandas").materialize()

    # stamp both endpoints with their orientation keys (okeys is node-sized
    # — the designated small side of both joins)
    e1 = bucketed_join(bid, okeys, on="u", small_side="right").materialize()

    def rn_v(b: pd.DataFrame) -> pd.DataFrame:
        return b.rename(columns={"okey": "ukey", "v": "_v"}).rename(
            columns={"_v": "u", "u": "v"}
        )  # swap so the second join keys on the other endpoint

    e2 = bucketed_join(
        e1.map_batches(rn_v, batch_format="pandas"), okeys, on="u",
        small_side="right",
    )

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        # rows now: u=original v endpoint, v=original u endpoint,
        # ukey=key(original u), okey=key(original v); keep each undirected
        # edge once, oriented smaller-key -> larger-key
        if len(b) == 0:
            return pd.DataFrame({
                "src": pd.Series(dtype=object), "skey": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object), "dkey": pd.Series(dtype=object),
            })
        keep = b[b["ukey"] < b["okey"]]
        return pd.DataFrame({
            "src": keep["v"], "skey": keep["ukey"],
            "dst": keep["u"], "dkey": keep["okey"],
        })

    oriented = e2.map_batches(orient, batch_format="pandas").materialize()

    def add_src_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["src"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def wedges(bucket: pd.DataFrame):
        import pyarrow as pa

        rows = []
        for u, g in bucket.groupby("src", sort=False):
            nb = sorted(zip(g["dkey"], g["dst"]))  # orientation-key order
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    rows.append((u, nb[i][1], nb[j][1]))
        cols = ("w_u", "w_v", "w_w", "vw")
        if not rows:  # typed Arrow empty: no pandas size-estimator trip
            return pa.schema([(c, pa.string()) for c in cols]).empty_table()
        out = pd.DataFrame(rows, columns=["w_u", "w_v", "w_w"])
        out["vw"] = out["w_v"].astype(str) + "\x1f" + out["w_w"].astype(str)
        from ..arrowutil import df_to_table

        return df_to_table(out)

    wedge_ds = (
        oriented.map_batches(add_src_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(wedges, batch_format="pandas")
        .repartition(8)
        .materialize()
    )
    if wedge_ds.count() == 0:  # triangle-free graph (e.g. pure star/tree)
        return None

    closing = oriented.map_batches(
        lambda b: pd.DataFrame({
            "vw": b["src"].astype(str) + "\x1f" + b["dst"].astype(str)
        }) if len(b) else pd.DataFrame({"vw": pd.Series(dtype=object)}),
        batch_format="pandas",
    )
    return bucketed_join(wedge_ds, closing, on="vw", small_side="right")


def triangle_counts(nodes_ds, edges_ds,
                    node_col: str = "entity_name",
                    src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Per-node triangle participation counts over the undirected KG (see
    :func:`_triangle_rows` for the degree-ordered plan) — each triangle
    credits all three corners via one grouped count.

    -> Dataset(node, n_triangles) for nodes in >= 1 triangle."""
    from .groupagg import bucketed_groupby_agg

    tris = _triangle_rows(edges_ds, src_col=src_col, tgt_col=tgt_col)
    if tris is None:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()),
                      "n_triangles": pa.array([], pa.int64())})
        )

    def corners(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=object)})
        return pd.DataFrame(
            {"node": pd.concat([b["w_u"], b["w_v"], b["w_w"]], ignore_index=True)}
        )

    return bucketed_groupby_agg(
        tris.map_batches(corners, batch_format="pandas"),
        keys=["node"],
        aggs={"n_triangles": (None, "count")},
    )


def pagerank_int(nodes_ds, edges_ds, iterations: int = 3,
                 node_col: str = "entity_name",
                 src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """-> Dataset(node, rank) after ``iterations`` integer power steps over
    the undirected graph (each edge contributes in both directions).
    Teleport share = ((SCALE * 15) // 100) // N per node per step.

    Fused Pregel loop (round 4), static edges pinned (round 5): the
    contribution GATHER of step k and the SHIP of step k+1 both key on
    the same node id, so each step is ONE node-bucketed shuffle —
    buckets sum incoming contributions + teleport into the node's new
    rank, derive the node's out-degree from its bucket's edges (read
    from the one-time :func:`_edge_bucket_refs` object-store split, not
    re-shuffled per round), and immediately emit the next step's
    per-edge contributions keyed by neighbor; node marker rows re-seed
    their own (stable) bucket.  iterations+1 shuffles total carrying
    only markers+contributions, no per-step driver collects."""

    from ..arrowutil import df_to_table as _d2t

    n_nodes = nodes_ds.count()
    teleport = ((SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN) // n_nodes

    N_PB = 64

    def _nb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_any(s, N_PB), index=s.index)

    # state row schema (u, val, kind): 'n' node marker carrying the
    # current rank in val, 'c' contribution to u; edges live in the
    # per-bucket object-store split, outside the shuffle
    def edge_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": pd.concat([b[src_col], b[tgt_col]], ignore_index=True)
            .astype(object),
            "v": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)
            .astype(object),
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object), "v": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    def seed_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": b[node_col].astype(object),
            "val": np.int64(SCALE // n_nodes),
            "kind": "n",
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object),
            "val": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    edge_parts = _edge_bucket_refs(
        edges_ds.map_batches(edge_rows, batch_format="pandas"),
        "_pbucket", N_PB, ["u", "v"])
    state = nodes_ds.map_batches(
        seed_rows, batch_format="pandas").materialize()

    def make_step(first: bool, last: bool):
        def step(g: pd.DataFrame):
            marks = g[g["kind"] == "n"]
            if first:
                r_cur = marks.set_index("u")["val"]
            else:
                c = (g[g["kind"] == "c"]
                     .groupby("u", sort=False)["val"].sum())
                r_cur = (c.reindex(marks["u"]).fillna(0).astype("int64")
                         + teleport)
                r_cur.index = marks["u"]
            if last:
                return _d2t(pd.DataFrame({
                    "node": r_cur.index.to_numpy(dtype=object),
                    "r": r_cur.to_numpy().astype("int64"),
                }))
            e = _fetch_bucket_edges(
                edge_parts, int(g["_pbucket"].iloc[0]), ["u", "v"])
            d = e.groupby("u", sort=False)["v"].transform("size")
            r_e = e["u"].map(r_cur)
            live = r_e.notna()
            contrib = pd.DataFrame({
                "u": e.loc[live, "v"],
                "val": ((DAMP_NUM * r_e[live].astype("int64") // DAMP_DEN)
                        // d[live]).astype("int64"),
            })
            # map-side combiner: pre-sum per destination inside this
            # bucket (integer sums are associative) — ships <= distinct
            # destinations instead of one row per edge
            contrib = contrib.groupby("u", sort=False, as_index=False)[
                "val"].sum()
            contrib["kind"] = "c"
            markers = pd.DataFrame({
                "u": marks["u"],
                "val": np.int64(0), "kind": "n",
            })
            out = pd.concat([markers, contrib], ignore_index=True)
            out["_pbucket"] = _nb(out["u"])
            return _d2t(out)

        return step

    for i in range(iterations + 1):
        first, last = i == 0, i == iterations
        state = sever_lineage(
            state.groupby("_pbucket").map_groups(
                make_step(first, last), batch_format="pandas"))
    return state


def k_hop_distances(seeds_ds, edges_ds, k: int = 2,
                    node_col: str = "entity_name",
                    src: str = "src_id", tgt: str = "tgt_id"):
    """BFS hop distances from a seed set over the undirected edge table:
    Dataset(node_col, hop) with hop = min distance <= k (unreached nodes are
    absent).  Each round is ONE bucketed frontier⋈edges join + ONE bucketed
    distinct + ONE anti-join against the visited set, so the frontier is a
    true BFS LEVEL SET (nodes first discovered this round) and per-round
    cost is |frontier-adjacent edges| — without the anti-join every round
    would re-expand the whole h-hop ball (each seed is a neighbor of its
    own neighbors on an undirected graph), approaching |E| redundant rows
    per round on hub-heavy graphs like this KG's log_event component.
    BFS guarantees first discovery == min distance, so the accumulated
    visited set IS the answer (no final re-min).  The k-hop subgraph fetch
    is the query-side neighborhood primitive (reference query.py builds
    1-hop context; this generalizes it)."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": pd.concat([b[src], b[tgt]], ignore_index=True),
                "v": pd.concat([b[tgt], b[src]], ignore_index=True),
            }
        )
        return out.drop_duplicates()

    edges_bi = edges_ds.map_batches(bidir, batch_format="pandas").materialize()

    def as_frontier(hop):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = b[[node_col]].rename(columns={node_col: "u"})
            out["hop"] = np.int64(hop)
            return out.drop_duplicates()

        return fn

    frontier = seeds_ds.map_batches(
        as_frontier(0), batch_format="pandas"
    ).materialize()
    visited = frontier
    for hop in range(1, k + 1):
        nbrs = bucketed_join(
            frontier.map_batches(
                lambda b: b[["u"]].drop_duplicates(), batch_format="pandas"
            ),
            edges_bi,
            on="u",
        ).map_batches(
            lambda b, h=hop: pd.DataFrame(
                {"u": b["v"].drop_duplicates(), "hop": np.int64(h)}
            ),
            batch_format="pandas",
        )
        # distinct candidate set: one bucketed reduce
        cand = bucketed_groupby_agg(nbrs, ["u"], {"hop": ("hop", "min")})
        # anti-join visited: only first-time discoveries stay in the frontier
        seen = visited.map_batches(
            lambda b: pd.DataFrame({"u": b["u"], "_seen": np.int64(1)}),
            batch_format="pandas",
        )
        frontier = sever_lineage(
            bucketed_join(cand, seen, on="u", how="left").map_batches(
                lambda b: b[b["_seen"].isna()][["u", "hop"]],
                batch_format="pandas",
            ))
        if frontier.count() == 0:
            break
        visited = sever_lineage(visited.union(frontier))

    return visited.map_batches(
        lambda b: b.rename(columns={"u": node_col}), batch_format="pandas"
    )


PMI_SCALE = 10**6


def entity_cooccurrence_pmi(ent_mentions_ds, k: int = 20, min_pairs: int = 2,
                            entity_col: str = "entity_name",
                            chunk_col: str = "source_id"):
    """Top-k entity pairs by a pointwise-mutual-information surrogate over
    chunk co-occurrence — the standard first-order signal for relation
    discovery / alias candidates the reference's LLM alignment judge
    implicitly exploits (fusion.py prompts carry co-mentioned entities;
    here the statistic itself is a first-class operator).

    pmi_s = (n_xy * n_chunks * PMI_SCALE) // (n_x * n_y)   [all integers]

    i.e. p(x,y)/(p(x)p(y)) over the universe of chunks with >= 1 entity
    mention, scaled and floored once — log-free so the ranking is
    bit-deterministic and exactly SQL-mirrorable (float log PMI would
    hash-diverge).  Monotone in true PMI for fixed n_chunks.

    -> Dataset(ea, eb, n_xy, n_x, n_y, pmi, rank), ea < eb, n_xy >=
    min_pairs, rank 1..k by (pmi desc, ea, eb).

    Scale shape: distinct (entity, chunk) via one bucketed reduce; pair
    enumeration inside a chunk-bucketed groupby — per-chunk entity counts
    are bounded by the chunk token budget (1200 tokens), so unlike an LSH
    bucket this quadratic is inherently capped; n_x stamped onto pairs by
    two bucketed joins (entity tables can be vocabulary-sized — never
    broadcast); one final combiner top-k.  Driver state: the n_chunks
    scalar."""

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join
    from .window import grouped_topk

    # distinct (entity, chunk)
    em = bucketed_groupby_agg(
        ent_mentions_ds.map_batches(
            lambda b: b[[entity_col, chunk_col]].rename(
                columns={entity_col: "e", chunk_col: "c"}
            ),
            batch_format="pandas",
        ),
        keys=["e", "c"],
        aggs={"_n": (None, "count")},
    ).map_batches(lambda b: b[["e", "c"]], batch_format="pandas").materialize()

    n_x = bucketed_groupby_agg(em, keys=["e"], aggs={"nx": (None, "count")})
    n_chunks = bucketed_groupby_agg(
        em.map_batches(lambda b: b[["c"]], batch_format="pandas"),
        keys=["c"], aggs={"_n": (None, "count")},
    ).count()

    def add_chunk_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["c"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, g in bucket.groupby("c", sort=False):
            ents = sorted(set(g["e"]))
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    rows.append((ents[i], ents[j]))
        if not rows:
            return pd.DataFrame(
                {c: pd.Series(dtype="string") for c in ("ea", "eb")}
            )
        return pd.DataFrame(rows, columns=["ea", "eb"])

    pair_counts = bucketed_groupby_agg(
        em.map_batches(add_chunk_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .repartition(8),
        keys=["ea", "eb"],
        aggs={"n_xy": (None, "count")},
    ).map_batches(
        lambda b: b[b["n_xy"] >= min_pairs], batch_format="pandas"
    )

    witha = bucketed_join(
        pair_counts,
        n_x.map_batches(
            lambda b: b.rename(columns={"e": "ea", "nx": "n_x"}),
            batch_format="pandas",
        ),
        on="ea",
    )
    withb = bucketed_join(
        witha,
        n_x.map_batches(
            lambda b: b.rename(columns={"e": "eb", "nx": "n_y"}),
            batch_format="pandas",
        ),
        on="eb",
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        cols = ["ea", "eb", "n_xy", "n_x", "n_y"]
        if len(b) == 0:
            out = pd.DataFrame(
                {"ea": pd.Series(dtype="string"),
                 "eb": pd.Series(dtype="string"),
                 "n_xy": pd.Series(dtype="int64"),
                 "n_x": pd.Series(dtype="int64"),
                 "n_y": pd.Series(dtype="int64"),
                 "pmi": pd.Series(dtype="int64")}
            )
            return out
        out = b[cols].copy()
        # Python ints: n_xy * n_chunks * SCALE exceeds int64 at corpus scale
        out["pmi"] = [
            (int(nxy) * n_chunks * PMI_SCALE) // (int(nx) * int(ny))
            for nxy, nx, ny in zip(out["n_xy"], out["n_x"], out["n_y"])
        ]
        out["pmi"] = out["pmi"].astype("int64")
        for c in ("n_xy", "n_x", "n_y"):
            out[c] = out[c].astype("int64")
        return out

    scored = withb.map_batches(score, batch_format="pandas").map_batches(
        lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
    )
    top = grouped_topk(
        scored, keys=["_g"], order_col="pmi", k=k, tie_cols=["ea", "eb"]
    )
    return top.map_batches(
        lambda b: b[["ea", "eb", "n_xy", "n_x", "n_y", "pmi", "rank"]],
        batch_format="pandas",
    )


def k_core_peel(edges_ds, k: int = 2, rounds: int = 3,
                src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Fixed-round k-core peeling over the undirected KG: each round drops
    every node with current degree < k and all its incident edges; after
    ``rounds`` rounds the surviving nodes with their residual degrees are
    the (approximate-from-above) k-core — exact when the peel has converged,
    which a fixed round count makes SQL-mirrorable as unrolled CTEs (true
    convergence looping would need recursion the value oracle can't pin
    deterministically).  The dense-core extraction is the standard
    graph-curation primitive (hub/boilerplate detection over the KG; the
    reference has no graph analytics beyond degree — query.py:84 — so this
    is extension surface, same family as pagerank_int/triangle_counts).

    -> Dataset(node, deg): nodes still standing after ``rounds`` peels,
    with their degree in the surviving subgraph.

    Scale shape: per round ONE bucketed grouped count (degrees, combiner)
    + TWO bucketed semi-joins (edges x kept-on-u, edges x kept-on-v) — the
    keep set is node-sized so it is never broadcast; state between rounds
    is the current edge Dataset, re-materialized once per round."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        fwd = b[[src_col, tgt_col]].rename(columns={src_col: "u", tgt_col: "v"})
        rev = b[[tgt_col, src_col]].rename(columns={tgt_col: "u", src_col: "v"})
        return pd.concat([fwd, rev], ignore_index=True)

    cur = edges_ds.map_batches(bidir, batch_format="pandas").materialize()

    for _ in range(rounds):
        deg = bucketed_groupby_agg(cur, keys=["u"], aggs={"deg": (None, "count")})
        keep = deg.map_batches(
            lambda b: b[b["deg"] >= k][["u"]], batch_format="pandas"
        ).materialize()
        half = bucketed_join(cur, keep, on="u")
        cur = bucketed_join(
            half.map_batches(
                lambda b: b.rename(columns={"u": "_w", "v": "u"}),
                batch_format="pandas",
            ),
            keep,
            on="u",
        ).map_batches(
            lambda b: b.rename(columns={"u": "v", "_w": "u"})[["u", "v"]],
            batch_format="pandas",
        )
        cur = sever_lineage(cur)
        if cur.count() == 0:
            # typed empty out: an empty edge Dataset has no schema to
            # carry through the grouped count's hash shuffle
            import pyarrow as pa

            return ray.data.from_arrow(
                pa.table({"node": pa.array([], pa.string()),
                          "deg": pa.array([], pa.int64())})
            )

    return bucketed_groupby_agg(
        cur, keys=["u"], aggs={"deg": (None, "count")}
    ).map_batches(
        lambda b: b.rename(columns={"u": "node"}), batch_format="pandas"
    )


def community_stats(nodes_ds, edges_ds, rounds: int = 4,
                    node_col: str = "entity_name",
                    src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Per-community sufficient statistics over the min_label_rounds
    partition — what a modularity/quality report needs, kept ALL-INTEGER
    so the whole chain stays value-comparable in SQL (float modularity
    Q = Σ(e_c/m - (d_c/2m)²) is one driver-side division away from these):

    -> Dataset(label, n_nodes, internal_edges, degree_sum): community
    size, edges with BOTH endpoints inside, and the summed degree of the
    community's members.

    Shape: the label table (one short row per node) joins the edge list
    twice — src side then tgt side — via the broadcast-or-bucketed plan,
    then three combiner groupbys; edge payloads never move."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    labels = min_label_rounds(
        nodes_ds, edges_ds, rounds=rounds,
        node_col=node_col, src_col=src_col, tgt_col=tgt_col,
    ).materialize()

    n_nodes = bucketed_groupby_agg(
        labels, keys=["label"], aggs={"n_nodes": (None, "count")}
    )

    e = edges_ds.map_batches(
        lambda b: b[[src_col, tgt_col]].rename(
            columns={src_col: "u", tgt_col: "v"}
        ),
        batch_format="pandas",
    )
    lu = labels.map_batches(
        lambda b: b.rename(columns={"node": "u", "label": "lu"}),
        batch_format="pandas",
    )
    lv = labels.map_batches(
        lambda b: b.rename(columns={"node": "v", "label": "lv"}),
        batch_format="pandas",
    )
    tagged = bucketed_join(
        bucketed_join(e, lu, on="u", small_side="right"),
        lv, on="v", small_side="right",
    )
    internal = bucketed_groupby_agg(
        tagged.map_batches(
            lambda b: b[b["lu"] == b["lv"]][["lu"]].rename(
                columns={"lu": "label"}
            ),
            batch_format="pandas",
        ),
        keys=["label"],
        aggs={"internal_edges": (None, "count")},
    )
    # degree_sum: every edge endpoint contributes 1 to its node's label
    deg = bucketed_groupby_agg(
        tagged.map_batches(
            lambda b: pd.DataFrame(
                {"label": pd.concat([b["lu"], b["lv"]], ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        keys=["label"],
        aggs={"degree_sum": (None, "count")},
    )

    out = bucketed_join(
        bucketed_join(n_nodes, internal, on="label", how="left",
                      small_side="right"),
        deg, on="label", how="left", small_side="right",
    )

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        for c in ("internal_edges", "degree_sum"):
            out[c] = out[c].fillna(0).astype("int64")
        out["n_nodes"] = out["n_nodes"].astype("int64")
        return out[["label", "n_nodes", "internal_edges", "degree_sum"]]

    return out.map_batches(fill, batch_format="pandas")


LP_SCALE = 10**6


def link_prediction_scores(edges_ds, k: int = 20, deg_cap: int = 64,
                           scale: int = LP_SCALE,
                           src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Common-neighbor link prediction over the constructed KG — the
    standard KG-completion primitive (propose missing edges): for every
    non-adjacent node pair (a, b) sharing >= 1 neighbor, score by the
    resource-allocation index  ra = sum_z floor(scale / deg(z))  over
    common neighbors z (Zhou/Lu/Zhang 2009), integer-floored once per z so
    the ranking is bit-deterministic and exactly SQL-mirrorable; ``cn``
    (common-neighbor count) rides along.  Mirrors the alias-candidate role
    the reference's fusion prompts play (entities that share many low-degree
    neighbors are merge/relate candidates) as a first-class graph operator.

    -> Dataset(ea, eb, cn, ra, rank), ea < eb, pair not an existing edge,
    rank 1..k by (ra desc, ea, eb).

    Scale shape: ONE z-bucketed shuffle enumerates neighbor pairs with the
    per-hub quadratic bounded by ``deg_cap`` (hubs above the cap are
    excluded from the statistic by definition — same filter in the SQL
    mirror, so it is semantics, not truncation); the existing-edge
    anti-join rides the SAME (ea, eb) grouped reduce as the score fold
    (edge rows carry ex=1, candidate rows ex=0 — no second shuffle, no
    driver key set); one combiner top-k out.  Driver state: none.
    """

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"z": pd.concat([b[src_col], b[tgt_col]], ignore_index=True),
             "x": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)}
        )
        out["z"] = out["z"].astype("string")
        out["x"] = out["x"].astype("string")
        return strip_pd_metadata(out) if len(out) else out

    def add_z_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["z"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def _empty_cand() -> pd.DataFrame:
        return pd.DataFrame(
            {"ea": pd.Series(dtype="string"),
             "eb": pd.Series(dtype="string"),
             "cn": pd.Series(dtype="int64"),
             "ra": pd.Series(dtype="int64"),
             "ex": pd.Series(dtype="int64")}
        )

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        ea, eb, ra = [], [], []
        for _, g in bucket.groupby("z", sort=False):
            nbrs = sorted(set(g["x"]))
            d = len(nbrs)
            if d < 2 or d > deg_cap:
                continue
            contrib = scale // d
            for i in range(d):
                for j in range(i + 1, d):
                    ea.append(nbrs[i])
                    eb.append(nbrs[j])
                    ra.append(contrib)
        if not ea:
            return _empty_cand()
        return pd.DataFrame(
            {"ea": pd.array(ea, dtype="string"),
             "eb": pd.array(eb, dtype="string"),
             "cn": np.ones(len(ea), dtype=np.int64),
             "ra": np.asarray(ra, dtype=np.int64),
             "ex": np.zeros(len(ea), dtype=np.int64)}
        )

    def edge_flags(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"ea": b[src_col].astype("string"),
             "eb": b[tgt_col].astype("string"),
             "cn": np.zeros(len(b), dtype=np.int64),
             "ra": np.zeros(len(b), dtype=np.int64),
             "ex": np.ones(len(b), dtype=np.int64)}
        )
        return strip_pd_metadata(out) if len(out) else _empty_cand()

    cand = (
        edges_ds.map_batches(bidir, batch_format="pandas")
        .map_batches(add_z_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .repartition(8)
    )
    tagged = cand.union(edges_ds.map_batches(edge_flags, batch_format="pandas"))
    agg = bucketed_groupby_agg(
        tagged,
        keys=["ea", "eb"],
        aggs={"cn": ("cn", "sum"), "ra": ("ra", "sum"), "ex": ("ex", "sum")},
    ).map_batches(
        lambda b: b[(b["ex"] == 0) & (b["cn"] > 0)][["ea", "eb", "cn", "ra"]],
        batch_format="pandas",
    )
    scored = agg.map_batches(
        lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
    )
    top = grouped_topk(
        scored, keys=["_g"], order_col="ra", k=k, tie_cols=["ea", "eb"]
    )
    return top.map_batches(
        lambda b: b[["ea", "eb", "cn", "ra", "rank"]], batch_format="pandas"
    )


def random_walks(edges_ds, length: int = 3,
                 src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Deterministic 'random' walks over the KG — the DeepWalk/node2vec
    corpus-generation step (walk sequences feed skip-gram embedding
    training; see skipgram_topk for the downstream counts).  One walk
    starts at EVERY node; at step t the walk at ``walk_id`` standing on
    node u moves to u's neighbor with 1-based rank
    ``1 + md5int(walk_id '#' t) % deg(u)`` among neighbors sorted
    ascending — a pure function of (walk_id, t, adjacency), so the walks
    are bit-identical across runs/engines/partitionings and exactly
    SQL-mirrorable (row_number + the shared md5-prefix hash), unlike
    PRNG-seeded walks.

    -> Dataset(walk_id, step, node), step 0..length; every node of the
    edge set emits exactly one row per step (undirected graph: no dead
    ends — every endpoint has >= 1 neighbor).

    Scale shape: the ranked adjacency is ONE u-bucketed shuffle
    (vectorized in-bucket sort + cumcount); each step is two bucketed
    joins moving only (walk_id, node)-width rows — frontier->degree to
    compute the neighbor index, then an EXACT-key join on 'u#rank'
    (never a join on u alone, which would fan out deg(u) rows per walk
    at every hub).  Walk state never touches the driver."""
    import hashlib

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"u": pd.concat([b[src_col], b[tgt_col]], ignore_index=True),
             "v": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)}
        )
        out["u"] = out["u"].astype("string")
        out["v"] = out["v"].astype("string")
        return strip_pd_metadata(out) if len(out) else out

    def add_u_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["u"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def ranked(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame(
                {"jkey": pd.Series(dtype="string"),
                 "v": pd.Series(dtype="string")}
            )
        f = bucket[["u", "v"]].sort_values(["u", "v"], kind="mergesort")
        rnk = f.groupby("u", sort=False).cumcount() + 1
        return pd.DataFrame(
            {"jkey": (f["u"] + "#" + rnk.astype(str)).astype("string"),
             "v": f["v"].astype("string")}
        )

    adj = edges_ds.map_batches(bidir, batch_format="pandas")
    adj_ranked = (
        adj.map_batches(add_u_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(ranked, batch_format="pandas")
        .repartition(8)
    )
    deg = bucketed_groupby_agg(adj, keys=["u"], aggs={"deg": (None, "count")})

    def md5_idx(walk_ids: pd.Series, step: int, degs: pd.Series) -> pd.Series:
        return pd.Series(
            [1 + int(hashlib.md5(f"{w}#{step}".encode()).hexdigest()[:8], 16)
             % int(d)
             for w, d in zip(walk_ids, degs)],
            index=walk_ids.index,
        )

    # step 0: one walk per node
    frontier = deg.map_batches(
        lambda b: pd.DataFrame(
            {"walk_id": b["u"].astype("string"),
             "node": b["u"].astype("string")}
        ),
        batch_format="pandas",
    ).materialize()
    outs = [frontier.map_batches(
        lambda b: b.assign(step=np.int64(0)), batch_format="pandas"
    )]

    for t in range(1, length + 1):
        with_deg = bucketed_join(
            frontier,
            deg.map_batches(lambda b: b.rename(columns={"u": "node"}),
                            batch_format="pandas"),
            on="node",
        )

        def to_jkey(b: pd.DataFrame, _t: int = t) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"walk_id": pd.Series(dtype="string"),
                     "jkey": pd.Series(dtype="string")}
                )
            idx = md5_idx(b["walk_id"], _t, b["deg"])
            return pd.DataFrame(
                {"walk_id": b["walk_id"].astype("string"),
                 "jkey": (b["node"].astype(str) + "#"
                          + idx.astype(str)).astype("string")}
            )

        stepped = bucketed_join(
            with_deg.map_batches(to_jkey, batch_format="pandas"),
            adj_ranked, on="jkey",
        )
        frontier = stepped.map_batches(
            lambda b: pd.DataFrame(
                {"walk_id": b["walk_id"].astype("string"),
                 "node": b["v"].astype("string")}
            ),
            batch_format="pandas",
        ).materialize()
        outs.append(frontier.map_batches(
            lambda b, _t=t: b.assign(step=np.int64(_t)),
            batch_format="pandas",
        ))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.map_batches(
        lambda b: b[["walk_id", "step", "node"]].astype(
            {"walk_id": object, "node": object}
        ),
        batch_format="pandas",
    )


def modularity_int(nodes_ds, edges_ds, rounds: int = 4,
                   node_col: str = "entity_name",
                   src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Newman modularity of the min-label partition, kept RATIONAL so the
    value is bit-deterministic and SQL-mirrorable: with m = |edges| and
    per-community internal edges e_c / degree sum d_c,

        Q = q_num / (4 m^2),   q_num = sum_c (4 m e_c - d_c^2)

    -> Dataset(q_num, m_edges): ONE row; the consumer divides.  The
    community table (one row per community) is the only thing reduced
    after community_stats; per-row products use Python ints (4 m e_c
    exceeds int64 when m e_c > 2^61 — at that scale lower the partition
    rounds' granularity or shift to per-community output), mirroring the
    HUGEINT product in SQL."""
    from .groupagg import bucketed_groupby_agg

    stats = community_stats(
        nodes_ds, edges_ds, rounds=rounds,
        node_col=node_col, src_col=src_col, tgt_col=tgt_col,
    )
    m = edges_ds.count()

    def q_part(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"_g": pd.Series(dtype="int64"),
                 "q_part": pd.Series(dtype="int64")}
            )
        parts = [
            4 * m * int(e) - int(d) * int(d)
            for e, d in zip(b["internal_edges"], b["degree_sum"])
        ]
        return pd.DataFrame(
            {"_g": np.zeros(len(b), dtype=np.int64),
             "q_part": np.asarray(parts, dtype=np.int64)}
        )

    folded = bucketed_groupby_agg(
        stats.map_batches(q_part, batch_format="pandas"),
        keys=["_g"],
        aggs={"q_num": ("q_part", "sum")},
    )
    return folded.map_batches(
        lambda b: pd.DataFrame(
            {"q_num": b["q_num"].astype("int64"),
             "m_edges": np.full(len(b), m, dtype=np.int64)}
        ),
        batch_format="pandas",
    )


def wl_neighborhood_hashes(nodes_ds, edges_ds,
                           node_col: str = "entity_name",
                           type_col: str = "entity_type",
                           src_col: str = "src_id", tgt_col: str = "tgt_id",
                           n_buckets: int = N_BUCKETS):
    """ONE round of Weisfeiler-Lehman label refinement over the undirected
    KG — the canonical graph-feature/graph-isomorphism primitive (WL graph
    kernels, GNN expressivity tests): each node's refined label is the md5
    of its own type plus the SORTED MULTISET of its neighbors' types.
    Nodes whose 1-hop type environment differs get different hashes; two
    graphs' WL histograms diverge iff 1-WL can tell them apart.

    -> Dataset(entity_name, entity_type, n_neighbors, wl1) with wl1 =
    md5(own_type || '|' || ','.join(sorted neighbor types))[:16]
    (isolated nodes hash their own type over an empty environment).

    Shape: ONE bucketed join stamps neighbor types onto the bidirected
    edge list (label table is node-sized -> broadcast plan under the join
    cap), one key-bucketed grouped reduce builds each node's sorted
    signature (a node's environment lands in one task; degree-bounded),
    one left join restores isolated nodes.  Signature strings are
    vocabulary-bounded (entity types), so reduce rows stay short."""
    import hashlib

    from .join import bucketed_join

    types = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]].rename(
            columns={node_col: "v", type_col: "nbr_type"}),
        batch_format="pandas",
    )

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        fwd = b[[src_col, tgt_col]].rename(columns={src_col: "u", tgt_col: "v"})
        rev = b[[tgt_col, src_col]].rename(columns={tgt_col: "u", src_col: "v"})
        return pd.concat([fwd, rev], ignore_index=True)

    bid = edges_ds.map_batches(bidir, batch_format="pandas")
    stamped = bucketed_join(bid, types, on="v", small_side="right",
                            n_buckets=n_buckets)

    def add_ubucket(b: pd.DataFrame) -> pd.DataFrame:

        from ..arrowutil import strip_pd_metadata

        out = b.assign(_ubucket=bucket_any(b["u"], n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def signatures(bucket: pd.DataFrame) -> pd.DataFrame:
        if len(bucket) == 0:
            return pd.DataFrame({"u": pd.Series(dtype=object),
                                 "sig": pd.Series(dtype=object),
                                 "n_neighbors": pd.Series(dtype="int64")})
        b = bucket.sort_values(["u", "nbr_type"], kind="mergesort")
        g = b.groupby("u", sort=False)["nbr_type"]
        agg = g.agg(",".join).rename("sig").reset_index()
        agg["n_neighbors"] = g.size().to_numpy()
        return agg

    sigs = (
        stamped.map_batches(add_ubucket, batch_format="pandas")
        .groupby("_ubucket")
        .map_groups(signatures, batch_format="pandas")
        .repartition(8)
    )
    sigs = sigs.map_batches(
        lambda b: b.rename(columns={"u": node_col}), batch_format="pandas"
    )

    base = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]], batch_format="pandas"
    )
    joined = bucketed_join(base, sigs, on=node_col, how="left",
                           small_side="right", n_buckets=n_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({node_col: pd.Series(dtype=object),
                                 type_col: pd.Series(dtype=object),
                                 "n_neighbors": pd.Series(dtype="int64"),
                                 "wl1": pd.Series(dtype=object)})
        sig = b["sig"].fillna("")
        out = b[[node_col, type_col]].copy()
        out["n_neighbors"] = b["n_neighbors"].fillna(0).astype("int64")
        out["wl1"] = [
            hashlib.md5(f"{t}|{s}".encode()).hexdigest()[:16]
            for t, s in zip(b[type_col], sig)
        ]
        return out

    return joined.map_batches(finish, batch_format="pandas")


def type_pair_edge_stats(nodes_ds, edges_ds,
                         node_col: str = "entity_name",
                         type_col: str = "entity_type",
                         src_col: str = "src_id", tgt_col: str = "tgt_id",
                         weight_col: str = "weight",
                         n_buckets: int = N_BUCKETS):
    """Ontology profile of the KG: edge counts and total weight per
    UNORDERED entity-type pair — the schema-level summary ("how do
    FUNCTIONs relate to CLASSes") a KG owner reads before writing
    traversal queries or fixing the extraction prompt.

    -> Dataset(type_a, type_b, n_edges, weight_sum) with
    type_a <= type_b (bytewise) and integer weight sums.

    Shape: two bucketed joins stamp endpoint types onto the edge list
    (node-type table is node-sized -> broadcast plan under the join cap),
    then one combiner-backed grouped reduce over the vocabulary-bounded
    type-pair key space."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    types_src = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]].rename(
            columns={node_col: src_col, type_col: "type_src"}),
        batch_format="pandas",
    )
    types_tgt = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]].rename(
            columns={node_col: tgt_col, type_col: "type_tgt"}),
        batch_format="pandas",
    )
    e = edges_ds.map_batches(
        lambda b: b[[src_col, tgt_col, weight_col]], batch_format="pandas"
    )
    j1 = bucketed_join(e, types_src, on=src_col, small_side="right",
                       n_buckets=n_buckets).materialize()
    j2 = bucketed_join(j1, types_tgt, on=tgt_col, small_side="right",
                       n_buckets=n_buckets)

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"type_a": pd.Series(dtype=object),
                                 "type_b": pd.Series(dtype=object),
                                 "w": pd.Series(dtype="int64")})
        lo = np.minimum(b["type_src"], b["type_tgt"])
        hi = np.maximum(b["type_src"], b["type_tgt"])
        return pd.DataFrame({
            "type_a": lo, "type_b": hi,
            "w": b[weight_col].to_numpy().astype("int64"),
        })

    return bucketed_groupby_agg(
        j2.map_batches(widen, batch_format="pandas"),
        keys=["type_a", "type_b"],
        aggs={"n_edges": (None, "count"), "weight_sum": ("w", "sum")},
        n_buckets=n_buckets,
    )


def degree_assortativity_components(edges_ds,
                                    src_col: str = "src_id",
                                    tgt_col: str = "tgt_id",
                                    n_buckets: int = N_BUCKETS):
    """Degree-assortativity SUFFICIENT STATISTICS of the undirected KG —
    the one-row graph-level health metric ("do hubs link to hubs?")
    behind Newman's assortativity coefficient: over every directed edge
    instance (both orientations), the Pearson components of (deg(u),
    deg(v)): n, Σx, Σy, Σx², Σy², Σxy, all exact int64.  r = (nΣxy −
    ΣxΣy) / sqrt((nΣx² − Σx²)(nΣy² − Σy²)) downstream — float only at
    the last step, outside the engine-comparable surface.

    Shape: ONE grouped degree count, two bucketed joins stamping endpoint
    degrees onto the bidirected edge list, then the module's standard
    combiner sum — a graph-sized input reduces to ONE row."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        fwd = b[[src_col, tgt_col]].rename(columns={src_col: "u", tgt_col: "v"})
        rev = b[[tgt_col, src_col]].rename(columns={tgt_col: "u", src_col: "v"})
        return pd.concat([fwd, rev], ignore_index=True)

    bid = edges_ds.map_batches(bidir, batch_format="pandas").materialize()
    deg = bucketed_groupby_agg(
        bid.map_batches(lambda b: b[["u"]], batch_format="pandas"),
        keys=["u"], aggs={"deg": (None, "count")}, n_buckets=n_buckets,
    )
    du = deg.map_batches(
        lambda b: b.rename(columns={"deg": "du"}), batch_format="pandas"
    )
    dv = deg.map_batches(
        lambda b: b.rename(columns={"u": "v", "deg": "dv"}),
        batch_format="pandas",
    )
    j1 = bucketed_join(bid, du, on="u", small_side="right",
                       n_buckets=n_buckets).materialize()
    j2 = bucketed_join(j1, dv, on="v", small_side="right",
                       n_buckets=n_buckets)

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        x = b["du"].astype("int64")
        y = b["dv"].astype("int64")
        return pd.DataFrame({
            "_one": np.int64(0),
            "n": np.int64(1),
            "sx": x, "sy": y,
            "sxx": x * x, "syy": y * y, "sxy": x * y,
        })

    out = bucketed_groupby_agg(
        j2.map_batches(widen, batch_format="pandas"),
        keys=["_one"],
        aggs={c: (c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")},
        n_buckets=n_buckets,
    )
    return out.map_batches(
        lambda b: b.drop(columns=["_one"]), batch_format="pandas"
    )


def k_hop_path_counts(seeds_ds, edges_ds, k: int = 2,
                      node_col: str = "entity_name",
                      src: str = "src_id", tgt: str = "tgt_id"):
    """BFS shortest-path COUNTING from a seed set (Brandes' σ values — the
    forward half of betweenness centrality): Dataset(node_col, hop, sigma)
    where hop = min distance <= k and sigma = the exact number of distinct
    shortest paths from the seed set (σ(v) = Σ σ(u) over hop−1
    predecessors u; seeds carry σ = 1).  All-integer, so bit-identical
    under any shuffle order and SQL-mirrorable as k unrolled join+sum
    rounds.

    Scale shape: identical to k_hop_distances — per round ONE bucketed
    frontier⋈edges join, ONE bucketed grouped SUM (the σ accumulation),
    ONE anti-join against the visited set; per-round cost is
    |frontier-adjacent edges|, never the whole graph.  Parallel edges
    collapse first (σ is over the simple graph)."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": pd.concat([b[src], b[tgt]], ignore_index=True),
                "v": pd.concat([b[tgt], b[src]], ignore_index=True),
            }
        )
        return out.drop_duplicates()

    edges_bi = edges_ds.map_batches(bidir, batch_format="pandas").materialize()

    frontier = seeds_ds.map_batches(
        lambda b: pd.DataFrame(
            {"u": b[node_col].drop_duplicates(),
             "hop": np.int64(0), "sigma": np.int64(1)}
        ),
        batch_format="pandas",
    ).materialize()
    visited = frontier
    for hop in range(1, k + 1):
        nbrs = bucketed_join(
            frontier.map_batches(
                lambda b: b[["u", "sigma"]], batch_format="pandas"
            ),
            edges_bi,
            on="u",
        ).map_batches(
            lambda b, h=hop: pd.DataFrame(
                {"u": b["v"], "hop": np.int64(h), "sigma": b["sigma"]}
            ),
            batch_format="pandas",
        )
        # σ(v, h) = Σ σ(predecessors at h−1): one bucketed grouped sum
        # (pinned: join -> agg -> left join is 3 hash shuffles, merge.py
        # deadlock mitigation)
        cand = bucketed_groupby_agg(
            nbrs, ["u"], {"hop": ("hop", "min"), "sigma": ("sigma", "sum")}
        ).materialize()
        seen = visited.map_batches(
            lambda b: pd.DataFrame({"u": b["u"], "_seen": np.int64(1)}),
            batch_format="pandas",
        )
        frontier = sever_lineage(
            bucketed_join(cand, seen, on="u", how="left").map_batches(
                lambda b: b[b["_seen"].isna()][["u", "hop", "sigma"]],
                batch_format="pandas",
            ))
        if frontier.count() == 0:
            break
        visited = sever_lineage(visited.union(frontier))

    return visited.map_batches(
        lambda b: b.rename(columns={"u": node_col}), batch_format="pandas"
    )


def clustering_coefficients(nodes_ds, edges_ds,
                            node_col: str = "entity_name"):
    """Local clustering coefficient per node in integer ppm — the
    community-tightness signal on top of triangle_counts:

        cc_ppm(v) = 2 · triangles(v) · 1e6 // (deg(v) · (deg(v) − 1))

    over all nodes with degree >= 2 (triangles(v) = 0 when v closes no
    wedge).  Degree counts incident edge rows exactly like
    query.node_degrees (reference storage.py:451-460), so the three
    definitions (degree, triangles, cc) stay mutually consistent and the
    SQL mirror composes textually from the triangle mirror.

    Scale shape: triangle_counts' degree-ordered plan + one grouped
    degree count + ONE bucketed left join; no new all-to-all beyond what
    triangle counting already pays.  -> Dataset(entity_name, degree,
    n_triangles, cc_ppm)."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    tri = triangle_counts(nodes_ds, edges_ds, node_col=node_col).materialize()
    deg = bucketed_groupby_agg(
        edges_ds.map_batches(
            lambda b: pd.DataFrame(
                {"node": pd.concat([b["src_id"], b["tgt_id"]],
                                    ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        keys=["node"],
        aggs={"degree": (None, "count")},
    ).map_batches(lambda b: b[b["degree"] >= 2], batch_format="pandas"
    ).materialize()
    joined = bucketed_join(deg, tri, on="node", how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        d = b["degree"].astype("int64")
        t = b["n_triangles"].fillna(0).astype("int64")
        return pd.DataFrame({
            node_col: b["node"],
            "degree": d,
            "n_triangles": t,
            "cc_ppm": (2 * t * 1_000_000) // (d * (d - 1)),
        })

    return joined.map_batches(finish, batch_format="pandas")


def degree_distribution(edges_ds):
    """Log2-bucketed degree distribution of the KG — the first graph
    diagnostic anyone plots (is this power-law? where do the hubs sit?):
    per bucket b = bit_length(degree) (i.e. floor(log2)+1), the node
    count and exact min/max degree — integer-exact on both engines
    (DuckDB: length(bin(degree))).

    Shape: one grouped degree count + one tiny bucket reduce (<= 64
    rows).  -> Dataset(bucket, n_nodes, min_degree, max_degree)."""
    from .groupagg import bucketed_groupby_agg

    deg = bucketed_groupby_agg(
        edges_ds.map_batches(
            lambda b: pd.DataFrame(
                {"node": pd.concat([b["src_id"], b["tgt_id"]],
                                    ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        keys=["node"],
        aggs={"degree": (None, "count")},
    ).materialize()

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        d = b["degree"].astype("int64")
        return pd.DataFrame({
            "bucket": d.map(lambda x: int(x).bit_length()).astype("int64"),
            "degree": d,
        })

    return bucketed_groupby_agg(
        deg.map_batches(bucketize, batch_format="pandas"),
        keys=["bucket"],
        aggs={
            "n_nodes": (None, "count"),
            "min_degree": ("degree", "min"),
            "max_degree": ("degree", "max"),
        },
    )


def type_degree_profile(nodes_ds, edges_ds):
    """Node-side ontology profile: per entity_type, the node count, total
    degree, and max degree — the companion of type_pair_edge_stats (which
    profiles the edge side).  ONE bucketed degree reduce + ONE bucketed
    type-stamp join + a type-vocabulary reduce; nodes with no edges count
    with degree 0 via a left join.  -> Dataset(entity_type, n_nodes,
    total_degree, max_degree)."""
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    deg = bucketed_groupby_agg(
        edges_ds.map_batches(
            lambda b: pd.DataFrame(
                {"entity_name": pd.concat([b["src_id"], b["tgt_id"]],
                                           ignore_index=True)}
            ),
            batch_format="pandas",
        ),
        keys=["entity_name"],
        aggs={"degree": (None, "count")},
    ).materialize()
    typed = bucketed_join(
        nodes_ds.map_batches(
            lambda b: b[["entity_name", "entity_type"]],
            batch_format="pandas",
        ),
        deg, on="entity_name", how="left",
    ).map_batches(
        lambda b: pd.DataFrame({
            "entity_type": b["entity_type"],
            "degree": b["degree"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    ).materialize()
    return bucketed_groupby_agg(
        typed, keys=["entity_type"],
        aggs={
            "n_nodes": (None, "count"),
            "total_degree": ("degree", "sum"),
            "max_degree": ("degree", "max"),
        },
    )


def typed_wedge_census(nodes_ds, edges_ds,
                       node_col: str = "entity_name",
                       type_col: str = "entity_type",
                       src_col: str = "src_id", tgt_col: str = "tgt_id",
                       n_buckets: int = N_BUCKETS):
    """Typed 2-path (wedge) census: for every (center type, endpoint type
    pair) the exact number of length-2 paths a–z–c with distinct
    endpoints — the open-motif companion of triangle counting and the
    input to schema-level path-query planning ("how many
    FUNCTION–MODULE–FUNCTION hops exist").

    The scale-critical trick: wedges are COUNTED, never enumerated — per
    center the neighbor-type tally (n_t rows, type-vocabulary-bounded)
    yields wedges(t1, t2) = n_t1·n_t2 for t1 < t2 and C(n_t, 2) for
    t1 = t2, so a hub with a million neighbors costs |types| rows
    instead of 10^12 pairs (same reason the spike/HITS ops stay
    polynomial).  Parallel edges collapse first (a wedge is over the
    simple graph).

    Shape: bidirected distinct edges -> two bucketed type-stamp joins ->
    one grouped (center, center_type, nbr_type) count -> per-center
    vocabulary-bounded pair products inside a center-bucketed pass ->
    one tiny (ct, t1, t2) reduce.  -> Dataset(center_type, type_a,
    type_b, n_wedges), type_a <= type_b."""

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"center": pd.concat([b[src_col], b[tgt_col]],
                                  ignore_index=True),
             "nbr": pd.concat([b[tgt_col], b[src_col]],
                               ignore_index=True)}
        )
        return out.drop_duplicates()

    eb = edges_ds.map_batches(bidir, batch_format="pandas")
    tc = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]].rename(
            columns={node_col: "center", type_col: "ct"}),
        batch_format="pandas",
    )
    tn = nodes_ds.map_batches(
        lambda b: b[[node_col, type_col]].rename(
            columns={node_col: "nbr", type_col: "nt"}),
        batch_format="pandas",
    )
    j1 = bucketed_join(eb, tc, on="center", small_side="right",
                       n_buckets=n_buckets).materialize()
    j2 = bucketed_join(j1, tn, on="nbr", small_side="right",
                       n_buckets=n_buckets).materialize()
    cnt = bucketed_groupby_agg(
        j2.map_batches(lambda b: b[["center", "ct", "nt"]],
                       batch_format="pandas"),
        keys=["center", "ct", "nt"],
        aggs={"n": (None, "count")},
        n_buckets=n_buckets,
    ).materialize()

    def add_cbucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_cbucket=bucket_any(b["center"], n_buckets))
        return strip_pd_metadata(out) if len(out) else out

    def per_center(bucket: pd.DataFrame) -> pd.DataFrame:
        cts, tas, tbs, ws = [], [], [], []
        for (_, ct), g in bucket.groupby(["center", "ct"], sort=False):
            rows = sorted(zip(g["nt"], g["n"].astype(int)))
            for i, (t1, n1) in enumerate(rows):
                cts.append(ct); tas.append(t1); tbs.append(t1)
                ws.append(n1 * (n1 - 1) // 2)
                for t2, n2 in rows[i + 1:]:
                    cts.append(ct); tas.append(t1); tbs.append(t2)
                    ws.append(n1 * n2)
        return pd.DataFrame({
            "center_type": pd.array(cts, dtype="string"),
            "type_a": pd.array(tas, dtype="string"),
            "type_b": pd.array(tbs, dtype="string"),
            "w": np.asarray(ws, dtype=np.int64),
        })

    per = (
        cnt.map_batches(add_cbucket, batch_format="pandas")
        .groupby("_cbucket")
        .map_groups(per_center, batch_format="pandas")
    )
    out = bucketed_groupby_agg(
        per, keys=["center_type", "type_a", "type_b"],
        aggs={"n_wedges": ("w", "sum")},
        n_buckets=n_buckets,
    )
    from ..arrowutil import df_to_table

    return out.map_batches(
        lambda b: df_to_table(b[b["n_wedges"] > 0]), batch_format="pandas"
    )


def ktruss_edges(edges_ds, k: int = 3, rounds: int = 2,
                 src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Fixed-round k-truss peel over the undirected KG — the edge-side
    companion of :func:`kcore_nodes`' node-degree peel: an edge survives a
    round iff its triangle SUPPORT (number of triangles containing it) is
    >= k-2, and each round recomputes support over the survivors.
    ``rounds`` bounds the peel exactly like code_dep_depth bounds its
    relaxation sweeps (exact fixpoint for graphs whose peel converges
    within ``rounds``; k >= 3).

    Scale shape: each round is one :func:`_triangle_rows` enumeration
    (degree-ordered, hub-safe) + a flat edge-credit projection + one
    bucketed grouped count + one bucketed join back to the canonical edge
    set — fixed-width (a, b, support) rows only after enumeration; no
    driver state.  -> Dataset(a, b, support) of edges alive after
    ``rounds`` peels with their last-round support (a < b).
    """
    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    if k < 3:
        raise ValueError("k-truss requires k >= 3")

    def _empty_out():
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "support": pa.array([], pa.int64())})
        )

    def canon(b: pd.DataFrame) -> pd.DataFrame:
        aa = b[src_col].astype(str)
        bb = b[tgt_col].astype(str)
        lo = aa.where(aa < bb, bb)
        hi = bb.where(aa < bb, aa)
        out = pd.DataFrame({"a": lo, "b": hi})
        out = out[out["a"] != out["b"]]
        return strip_pd_metadata(out) if len(out) else out

    cur = bucketed_groupby_agg(
        edges_ds.map_batches(canon, batch_format="pandas"),
        keys=["a", "b"],
        aggs={"_n": (None, "count")},
    ).map_batches(
        lambda b: b[["a", "b"]], batch_format="pandas"
    ).materialize()

    min_support = k - 2
    out = None
    for _ in range(rounds):
        tris = _triangle_rows(cur, src_col="a", tgt_col="b")
        if tris is None:
            return _empty_out()

        def edge_credits(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"ek": pd.Series(dtype=object)})
            frames = []
            for ca, cb in (("w_u", "w_v"), ("w_u", "w_w"), ("w_v", "w_w")):
                x = b[ca].astype(str)
                y = b[cb].astype(str)
                lo = x.where(x < y, y)
                hi = y.where(x < y, x)
                frames.append(lo + "\x1f" + hi)
            return strip_pd_metadata(pd.DataFrame({
                "ek": pd.concat(frames, ignore_index=True)
            }))

        support = bucketed_groupby_agg(
            tris.map_batches(edge_credits, batch_format="pandas"),
            keys=["ek"],
            aggs={"support": (None, "count")},
        ).materialize()
        keyed = cur.map_batches(
            lambda b: strip_pd_metadata(
                b.assign(ek=b["a"].astype(str) + "\x1f" + b["b"].astype(str))
            ) if len(b) else b.assign(ek=pd.Series(dtype=object)),
            batch_format="pandas",
        )
        joined = bucketed_join(keyed, support, on="ek", how="inner",
                               small_side="right")
        out = sever_lineage(joined.map_batches(
            lambda b: b[b["support"] >= min_support][["a", "b", "support"]],
            batch_format="pandas",
        ))
        if out.count() == 0:
            return _empty_out()
        cur = sever_lineage(out.map_batches(
            lambda b: b[["a", "b"]], batch_format="pandas"
        ))
    return out.map_batches(
        lambda b: b.assign(support=b["support"].astype("int64")),
        batch_format="pandas",
    )


def ppr_int(nodes_ds, edges_ds, seeds_ds, iterations: int = 3,
            node_col: str = "entity_name",
            src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Personalized PageRank (integer, ``iterations`` unrolled power
    steps) — the seed-biased random walk behind GraphRAG-style retrieval
    (rank the KG by relevance to a query's seed entities): identical to
    :func:`pagerank_int` except ALL teleport mass returns to the seed
    set, so scores concentrate around the seeds instead of spreading to
    the global stationary distribution.

    Seed sets are query-sized (broadcast as a frozenset — tiny by
    definition; the graph side stays fully distributed).  Initial mass
    SCALE//n_seeds on each seed, 0 elsewhere; per step a seed receives
    teleport ((SCALE*15)//100)//n_seeds on top of the damped inflow.

    -> Dataset(node, rank) — every node, integer rank.

    Fused Pregel loop, static edges pinned: identical shuffle structure
    to :func:`pagerank_int` (1 node-bucketed shuffle per step carrying
    only markers+contributions; edges read from the one-time
    :func:`_edge_bucket_refs` split; no per-step driver collects); only
    the teleport rule differs — seeds (broadcast frozenset, query-sized
    by definition) receive ((SCALE*15)//100)//n_seeds, everyone else
    0."""

    from ..arrowutil import df_to_table as _d2t

    seed_names = frozenset(
        seeds_ds.map_batches(
            lambda b: b[[node_col]], batch_format="pandas"
        ).to_pandas()[node_col].astype(str)
    )
    n_seeds = len(seed_names)
    if n_seeds == 0:
        raise ValueError("ppr_int needs a non-empty seed set")
    seed_ref = ray.put(seed_names)
    tel = ((SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN) // n_seeds
    init = SCALE // n_seeds

    N_PB = 64

    def _nb(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_any(s, N_PB), index=s.index)

    def edge_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": pd.concat([b[src_col], b[tgt_col]], ignore_index=True)
            .astype(object),
            "v": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)
            .astype(object),
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object), "v": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    def seed_rows(b: pd.DataFrame):
        isin = b[node_col].astype(str).isin(ray.get(seed_ref))
        out = pd.DataFrame({
            "u": b[node_col].astype(object),
            "val": isin.map(lambda t: init if t else 0).astype("int64"),
            "kind": "n",
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object),
            "val": pd.Series(dtype="int64"),
            "kind": pd.Series(dtype=object),
        })
        out["_pbucket"] = _nb(out["u"])
        return _d2t(out)

    edge_parts = _edge_bucket_refs(
        edges_ds.map_batches(edge_rows, batch_format="pandas"),
        "_pbucket", N_PB, ["u", "v"])
    state = nodes_ds.map_batches(
        seed_rows, batch_format="pandas").materialize()

    def make_step(first: bool, last: bool):
        def step(g: pd.DataFrame):
            marks = g[g["kind"] == "n"]
            if first:
                r_cur = marks.set_index("u")["val"]
            else:
                seed_tel = (marks["u"].astype(str).isin(ray.get(seed_ref))
                            .map(lambda t: tel if t else 0).astype("int64"))
                c = (g[g["kind"] == "c"]
                     .groupby("u", sort=False)["val"].sum())
                r_cur = (c.reindex(marks["u"]).fillna(0).astype("int64")
                         + seed_tel.to_numpy())
                r_cur.index = marks["u"]
            if last:
                return _d2t(pd.DataFrame({
                    "node": r_cur.index.to_numpy(dtype=object),
                    "r": r_cur.to_numpy().astype("int64"),
                }))
            e = _fetch_bucket_edges(
                edge_parts, int(g["_pbucket"].iloc[0]), ["u", "v"])
            d = e.groupby("u", sort=False)["v"].transform("size")
            r_e = e["u"].map(r_cur)
            live = r_e.notna()
            contrib = pd.DataFrame({
                "u": e.loc[live, "v"],
                "val": ((DAMP_NUM * r_e[live].astype("int64") // DAMP_DEN)
                        // d[live]).astype("int64"),
            })
            # map-side combiner: pre-sum per destination inside this
            # bucket (integer sums are associative) — ships <= distinct
            # destinations instead of one row per edge
            contrib = contrib.groupby("u", sort=False, as_index=False)[
                "val"].sum()
            contrib["kind"] = "c"
            markers = pd.DataFrame({
                "u": marks["u"],
                "val": np.int64(0), "kind": "n",
            })
            out = pd.concat([markers, contrib], ignore_index=True)
            out["_pbucket"] = _nb(out["u"])
            return _d2t(out)

        return step

    for i in range(iterations + 1):
        first, last = i == 0, i == iterations
        state = sever_lineage(
            state.groupby("_pbucket").map_groups(
                make_step(first, last), batch_format="pandas"))
    return state


def conductance_int(nodes_ds, edges_ds, rounds: int = 4,
                    node_col: str = "entity_name",
                    src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """Per-community conductance of the min-label partition, kept integer:
    cut_c = degree_sum_c - 2*internal_c (edges leaving the community) and

        conductance_ppm = cut_c * 1e6 // min(vol_c, 2m - vol_c)

    with vol_c = degree_sum_c — the cut-quality score that complements
    modularity_int (low conductance = well-separated community; the
    partition-health report GraphRAG community summarizers gate on).

    Shape: composes on community_stats' three grouped reduces — the only
    extra work is one vectorized pass over the community-count-sized
    table plus the scalar edge count.
    -> Dataset(label, n_nodes, cut_edges, degree_sum, conductance_ppm).
    """
    stats = community_stats(
        nodes_ds, edges_ds, rounds=rounds,
        node_col=node_col, src_col=src_col, tgt_col=tgt_col,
    )
    m = edges_ds.count()

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "label": pd.Series(dtype=object),
                "n_nodes": pd.Series(dtype="int64"),
                "cut_edges": pd.Series(dtype="int64"),
                "degree_sum": pd.Series(dtype="int64"),
                "conductance_ppm": pd.Series(dtype="int64"),
            })
        vol = b["degree_sum"].astype("int64")
        cut = (vol - 2 * b["internal_edges"].astype("int64")).astype("int64")
        denom = np.minimum(vol, 2 * m - vol)
        cond = np.where(denom > 0,
                        cut * 1_000_000 // np.maximum(denom, 1),
                        np.int64(0)).astype("int64")
        return pd.DataFrame({
            "label": b["label"], "n_nodes": b["n_nodes"].astype("int64"),
            "cut_edges": cut, "degree_sum": vol,
            "conductance_ppm": cond,
        })

    return stats.map_batches(score, batch_format="pandas")


def square_census(edges_ds, k: int = 20, deg_cap: int = 64,
                  src_col: str = "src_id", tgt_col: str = "tgt_id"):
    """4-cycle (square) census over the constructed KG — the bipartite-ish
    motif complement to the triangle census (two entities repeatedly
    co-mediated by pairs of shared neighbors signal near-duplicate or
    strongly-coupled concepts even when triangles are absent; squares are
    the dominant motif in def/call KGs where same-layer nodes never link
    directly).  For every unordered node pair (ea, eb), p = number of
    common neighbors z with 2 <= deg(z) <= ``deg_cap``; the pair anchors
    ``squares = p*(p-1)/2`` 4-cycles as opposite corners (each actual
    4-cycle is counted once from each of its two diagonals — reported
    per-diagonal, the standard opposite-corner census).  Hubs above
    ``deg_cap`` are excluded from mediation by definition (same filter in
    the SQL mirror — semantics, not truncation), which is also what bounds
    the per-z pair fan-out at scale.

    Scale shape: ONE z-bucketed shuffle enumerates the bounded per-z
    neighbor pairs (identical plan to link_prediction_scores), one grouped
    sum folds p per pair, one combiner top-k out.  Driver state: none.
    -> Dataset(ea, eb, cn, squares, rank), rank 1..k by
    (squares desc, ea, eb).
    """

    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"z": pd.concat([b[src_col], b[tgt_col]], ignore_index=True),
             "x": pd.concat([b[tgt_col], b[src_col]], ignore_index=True)}
        )
        out["z"] = out["z"].astype("string")
        out["x"] = out["x"].astype("string")
        return strip_pd_metadata(out) if len(out) else out

    def add_z_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(
            _bucket=bucket_any(b["z"], 64)
        )
        return strip_pd_metadata(out) if len(out) else out

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"ea": pd.Series(dtype="string"),
             "eb": pd.Series(dtype="string"),
             "cn": pd.Series(dtype="int64")}
        )

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        ea, eb = [], []
        for _, g in bucket.groupby("z", sort=False):
            nbrs = sorted(set(g["x"]))
            d = len(nbrs)
            if d < 2 or d > deg_cap:
                continue
            for i in range(d):
                for j in range(i + 1, d):
                    ea.append(nbrs[i])
                    eb.append(nbrs[j])
        if not ea:
            return _empty()
        return pd.DataFrame(
            {"ea": pd.array(ea, dtype="string"),
             "eb": pd.array(eb, dtype="string"),
             "cn": np.ones(len(ea), dtype=np.int64)}
        )

    counted = bucketed_groupby_agg(
        edges_ds.map_batches(bidir, batch_format="pandas")
        .map_batches(add_z_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .repartition(8),
        keys=["ea", "eb"],
        aggs={"cn": ("cn", "sum")},
    )

    def score(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["cn"] >= 2]
        out = b.assign(
            squares=(b["cn"] * (b["cn"] - 1) // 2).astype("int64"),
            _g=np.int64(0),
        ).reset_index(drop=True)
        return strip_pd_metadata(out) if len(out) else out.assign(
            squares=pd.Series(dtype="int64"), _g=pd.Series(dtype="int64")
        )

    top = grouped_topk(
        counted.map_batches(score, batch_format="pandas"),
        keys=["_g"], order_col="squares", k=k, tie_cols=["ea", "eb"],
    )
    return top.map_batches(
        lambda b: b[["ea", "eb", "cn", "squares", "rank"]],
        batch_format="pandas",
    )


def betweenness_ppm(seeds_ds, edges_ds, k: int = 2, scale: int = 1_000_000,
                    node_col: str = "entity_name",
                    src: str = "src_id", tgt: str = "tgt_id"):
    """Brandes betweenness dependency accumulation from a seed set, in
    fixed-point ppm — the backward half completing k_hop_path_counts' σ:

        δ_ppm(u) = Σ_{v ∈ succ(u)}  (σ(u) · (scale + δ_ppm(v))) // σ(v)

    with succ(u) = BFS-DAG successors (neighbors v at hop(u)+1), each
    term floored INDEPENDENTLY so the sum is order-independent and hence
    bit-deterministic under any shuffle — exact Brandes sums rationals;
    this surrogate deviates by < |succ(u)|/scale from it, which is the
    price of a SQL-mirrorable (k unrolled rounds, HUGEINT) value oracle.

    Scale shape: the forward half is k_hop_path_counts' plan with the
    per-hop layers kept (per round: one bucketed frontier⋈edges join, one
    grouped σ sum, one anti-join); the DAG table is built with two
    bucketed joins and reused by every backward round; each backward
    round h is ONE bucketed join (successor δ lookup) + ONE grouped sum
    over the layer-h DAG edges only.  k is a small constant, so the
    whole pass is O(k) shuffles of frontier-adjacent edges.

    -> Dataset(node_col, hop, sigma, delta_ppm) over all reached nodes
    (leaves and the deepest layer carry δ = 0).
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": pd.concat([b[src], b[tgt]], ignore_index=True),
                "v": pd.concat([b[tgt], b[src]], ignore_index=True),
            }
        )
        return out.drop_duplicates()

    edges_bi = edges_ds.map_batches(bidir, batch_format="pandas").materialize()

    # ---- forward: σ per hop, layers kept ------------------------------
    frontier = seeds_ds.map_batches(
        lambda b: pd.DataFrame(
            {"u": b[node_col].drop_duplicates(),
             "hop": np.int64(0), "sigma": np.int64(1)}
        ),
        batch_format="pandas",
    ).materialize()
    layers = [frontier]
    visited = frontier
    for hop in range(1, k + 1):
        nbrs = bucketed_join(
            frontier.map_batches(
                lambda b: b[["u", "sigma"]], batch_format="pandas"
            ),
            edges_bi,
            on="u",
        ).map_batches(
            lambda b, h=hop: pd.DataFrame(
                {"u": b["v"], "hop": np.int64(h), "sigma": b["sigma"]}
            ),
            batch_format="pandas",
        )
        cand = bucketed_groupby_agg(
            nbrs, ["u"], {"hop": ("hop", "min"), "sigma": ("sigma", "sum")}
        ).materialize()
        seen = visited.map_batches(
            lambda b: pd.DataFrame({"u": b["u"], "_seen": np.int64(1)}),
            batch_format="pandas",
        )
        frontier = bucketed_join(cand, seen, on="u", how="left").map_batches(
            lambda b: b[b["_seen"].isna()][["u", "hop", "sigma"]],
            batch_format="pandas",
        ).materialize()
        if frontier.count() == 0:
            break
        layers.append(frontier)
        visited = visited.union(frontier).materialize()

    # ---- DAG: u (hop h) -> v (hop h+1) --------------------------------
    vis_u = visited.map_batches(
        lambda b: b.rename(columns={"hop": "hop_u", "sigma": "sigma_u"}),
        batch_format="pandas",
    )
    half = bucketed_join(vis_u, edges_bi, on="u").map_batches(
        lambda b: b.rename(columns={"u": "u_src", "v": "u"}),
        batch_format="pandas",
    )
    vis_v = visited.map_batches(
        lambda b: pd.DataFrame({"u": b["u"], "hop_v": b["hop"],
                                "sigma_v": b["sigma"]}),
        batch_format="pandas",
    )
    dag = bucketed_join(half, vis_v, on="u").map_batches(
        lambda b: b[b["hop_v"] == b["hop_u"] + 1].rename(
            columns={"u": "v", "u_src": "u"}
        )[["u", "hop_u", "sigma_u", "v", "sigma_v"]],
        batch_format="pandas",
    ).materialize()

    # ---- backward: δ per layer, deepest first -------------------------
    max_hop = len(layers) - 1
    delta_by_hop: dict[int, object] = {}
    for h in range(max_hop - 1, -1, -1):
        dag_h = dag.map_batches(
            lambda b, hh=h: b[b["hop_u"] == hh].rename(
                columns={"v": "u", "u": "u_src"}
            )[["u", "u_src", "sigma_u", "sigma_v"]],
            batch_format="pandas",
        )
        dnext = delta_by_hop.get(h + 1)
        if dnext is not None:
            dag_h = bucketed_join(dag_h, dnext, on="u", how="left")
        else:
            dag_h = dag_h.map_batches(
                lambda b: b.assign(delta=np.int64(0)), batch_format="pandas"
            )

        def terms(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"u": pd.Series(dtype=object),
                                     "t": pd.Series(dtype="int64")})
            su = b["sigma_u"].astype(object).to_numpy()
            sv = b["sigma_v"].astype(object).to_numpy()
            dv = b["delta"].fillna(0).astype("int64").astype(object).to_numpy()
            # big-int exact per-term floor, then int64 (bounded: δ stays
            # within scale · Σ σ ratios, far below 2^63 at any sane k)
            t = np.array(
                [int(a * (scale + c) // d) for a, c, d in zip(su, dv, sv)],
                dtype=np.int64,
            )
            return pd.DataFrame({"u": b["u_src"].to_numpy(), "t": t})

        dsum = bucketed_groupby_agg(
            dag_h.map_batches(terms, batch_format="pandas"),
            keys=["u"],
            aggs={"delta": ("t", "sum")},
        ).materialize()
        delta_by_hop[h] = dsum

    deltas = None
    for h, dset in delta_by_hop.items():
        deltas = dset if deltas is None else deltas.union(dset)

    if deltas is None:
        return visited.map_batches(
            lambda b: b.assign(delta_ppm=np.int64(0)).rename(
                columns={"u": node_col}
            ),
            batch_format="pandas",
        )

    out = bucketed_join(visited, deltas.materialize(), on="u", how="left")
    return out.map_batches(
        lambda b: pd.DataFrame({
            node_col: b["u"],
            "hop": b["hop"].astype("int64"),
            "sigma": b["sigma"].astype("int64"),
            "delta_ppm": b["delta"].fillna(0).astype("int64"),
        }),
        batch_format="pandas",
    )


def hyperball_registers(nodes_ds, edges_ds, rounds: int = 2,
                        node_col: str = "entity_name",
                        n_registers: int = 64):
    """HyperBall (Boldi & Vigna 2013): per-node neighborhood-size SKETCH —
    each node starts with the HyperLogLog registers of {itself} (the same
    md5-derived register/rho rule as sketch.hll_registers, so the SQL
    mirror is exact), and each round register-max-merges every neighbor's
    sketch; after ``rounds`` rounds, node v's registers sketch its
    <= rounds-hop ball.  The per-node output is the sketch's INTEGER
    sufficient stats (n_registers set, sum of max-rho) — the float
    harmonic HLL estimate is the consumer's one-liner, kept out of the
    table so the value oracle stays bit-exact (same discipline as the
    corr/OLS sufficient-stat ops).

    Why a sketch when k_hop_distances is exact: the exact ball needs
    per-node SETS (quadratic blow-up on dense graphs); HyperBall's state
    is a constant 64 registers per node — THE neighborhood-function
    algorithm at web scale.  Each round is one bucketed join (ship
    registers over edges) + one grouped max — O(|E| · registers) rows
    shuffled, driver state zero.

    -> Dataset(node_col, n_registers, sum_rho).
    """
    import hashlib

    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def bidir(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "u": pd.concat([b["src_id"], b["tgt_id"]], ignore_index=True),
                "v": pd.concat([b["tgt_id"], b["src_id"]], ignore_index=True),
            }
        )
        return out.drop_duplicates()

    edges_bi = edges_ds.map_batches(bidir, batch_format="pandas").materialize()

    def seed(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            from ..arrowutil import df_to_table as _d2t

            return _d2t(pd.DataFrame({"u": pd.Series(dtype=object),
                                      "register": pd.Series(dtype="int64"),
                                      "rho": pd.Series(dtype="int64")}))
        names = b[node_col].drop_duplicates()
        regs, rhos = [], []
        for name in names:
            hv = int(hashlib.md5(str(name).encode()).hexdigest()[:16], 16)
            rest = hv // n_registers
            regs.append(hv % n_registers)
            rhos.append(59 if rest == 0 else 59 - rest.bit_length())
        from ..arrowutil import df_to_table as _d2t

        return _d2t(pd.DataFrame({"u": names.to_numpy(),
                                  "register": np.asarray(regs, dtype=np.int64),
                                  "rho": np.asarray(rhos, dtype=np.int64)}))

    # Fused Pregel loop (round 4), static edges pinned (round 5): the
    # register MERGE of round k and the neighbor SHIP of round k+1 both
    # key on the same node id, so each round is ONE node-bucketed
    # shuffle whose buckets merge registers (groupby max) and
    # immediately ship the merged sketch over the bucket's edges, read
    # from the one-time _edge_bucket_refs object-store split instead of
    # re-shuffling them every round; the final merge + sufficient-stat
    # widen fuse into one more shuffle.  rounds+1 shuffles total
    # carrying only sketch rows (was 2/round + 1, then +|E| rows/round).

    from ..arrowutil import df_to_table as _d2t

    N_HB = 64

    def _ub(s: pd.Series) -> pd.Series:
        return pd.Series(bucket_any(s, N_HB), index=s.index)

    def edge_rows(b: pd.DataFrame):
        out = pd.DataFrame({
            "u": b["u"].astype(object),
            "v": b["v"].astype(object),
        }) if len(b) else pd.DataFrame({
            "u": pd.Series(dtype=object), "v": pd.Series(dtype=object),
        })
        out["_hbucket"] = _ub(out["u"])
        return _d2t(out)

    edge_parts = _edge_bucket_refs(
        edges_bi.map_batches(edge_rows, batch_format="pandas"),
        "_hbucket", N_HB, ["u", "v"])

    def seed_rows(b: pd.DataFrame):
        t = seed(b).to_pandas()
        # k=1: the initial sketch counts as "changed", so round 1 ships it
        t["k"] = np.int64(1)
        t["_hbucket"] = _ub(t["u"])
        return _d2t(t[["u", "register", "rho", "k", "_hbucket"]])

    state = nodes_ds.map_batches(
        seed_rows, batch_format="pandas").materialize()

    def step(g: pd.DataFrame):
        # Delta propagation (Boldi & Vigna's "modified counters"): ship
        # only registers that IMPROVED this round — an unimproved
        # register was already shipped the round it last changed, and
        # neighbor merges are cumulative maxes, so the result is
        # identical while rounds >= 2 ship a fraction of the sketch.
        e = _fetch_bucket_edges(
            edge_parts, int(g["_hbucket"].iloc[0]), ["u", "v"])
        own = g[g["k"] == 0]
        merged = g.groupby(["u", "register"], sort=False,
                           as_index=False)["rho"].max()
        if len(own):
            m = merged.merge(
                own[["u", "register", "rho"]].rename(
                    columns={"rho": "rho_own"}),
                on=["u", "register"], how="left")
            changed = m.loc[
                m["rho_own"].isna() | (m["rho"] > m["rho_own"]),
                ["u", "register", "rho"]]
        else:
            changed = merged
        ship = changed.merge(e, on="u", how="inner")
        # map-side combiner: several bucket-local sources can ship the
        # same (dest, register) — pre-max before the shuffle
        shipped = (
            pd.DataFrame({"u": ship["v"], "register": ship["register"],
                          "rho": ship["rho"]})
            .groupby(["u", "register"], sort=False, as_index=False)["rho"]
            .max()
        )
        shipped["k"] = np.int64(1)
        out = pd.concat(
            [merged.assign(k=np.int64(0)), shipped],
            ignore_index=True,
        ) if len(merged) else merged.assign(k=np.int64(0))
        out = out[["u", "register", "rho", "k"]]
        out["_hbucket"] = _ub(out["u"])
        return _d2t(out)

    for _ in range(rounds):
        state = sever_lineage(
            state
            .groupby("_hbucket")
            .map_groups(step, batch_format="pandas")
        )

    def final_merge(g: pd.DataFrame):
        merged = g.groupby(["u", "register"], sort=False,
                           as_index=False)["rho"].max()
        per_u = merged.groupby("u", sort=False).agg(
            n_registers=("register", "size"),
            sum_rho=("rho", "sum")).reset_index()
        per_u["n_registers"] = per_u["n_registers"].astype("int64")
        per_u["sum_rho"] = per_u["sum_rho"].astype("int64")
        return _d2t(per_u.rename(columns={"u": node_col}))

    return state.groupby("_hbucket").map_groups(
        final_merge, batch_format="pandas")

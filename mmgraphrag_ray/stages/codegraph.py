"""Import-dependency graph over the source-code corpus.

Repo-level context assembly (StarCoder-style) and corpus curation both
need the module dependency graph: which modules are imported most (keep
their docs, order files topologically, weight training mixtures).  The
reference's KG is built from extracted entity mentions; this is the
static-analysis analog over the same files corpus — a pure text scan,
no parser needed for the corpus's import grammar.

Shape: one vectorized extraction pass over `content` (compiled regexes,
pandas .str kernels — no per-row Python), one hash shuffle bucketed on
the DESTINATION module so global edge dedup and in-degree counting
happen in the same reduce task, then a tiny sort+limit on the
module-level aggregate (rows = #modules, not #files).  At 100 TB the
only all-to-all moves (src, dst) string pairs already deduped per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..hashing import bucket_strs

from ..arrowutil import strip_pd_metadata

# first `# module: X` header names the file's own module; every
# line-anchored `import X` names a dependency (the corpus grammar is the
# same for py/go/js shards)
MODULE_RE = re.compile(r"(?m)^# module: ([\w.]+)")
IMPORT_RE = re.compile(r"(?m)^import ([\w.]+)")


def _extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    src = batch["content"].str.extract(MODULE_RE, expand=False)
    dst = batch["content"].str.findall(IMPORT_RE)
    df = pd.DataFrame({"src_module": src, "dst_module": dst}).explode(
        "dst_module"
    )
    df = df.dropna()
    df = df[df["src_module"] != ""]
    # local dedup: a module re-imported across the repo's files collapses
    # here, so the shuffle moves near-distinct pairs
    return df.drop_duplicates(ignore_index=True)


def import_edges(files_ds, n_buckets: int = 32):
    """DISTINCT (src_module, dst_module) import edges from the corpus.

    Bucketed on dst_module so downstream in-degree counting can reuse
    the same partitioning without a second shuffle.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = _extract_batch(batch)
        df["_bucket"] = bucket_strs(df["dst_module"], n_buckets)
        return strip_pd_metadata(df) if len(df) else df

    def dedup(bucket: pd.DataFrame) -> pd.DataFrame:
        return bucket.drop_duplicates(["src_module", "dst_module"])[
            ["src_module", "dst_module"]
        ]

    return (
        files_ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
    )


def import_indegree_topk(files_ds, k: int = 20, n_buckets: int = 32):
    """Top-k modules by in-degree (distinct importing modules).

    Fused with the edge shuffle: all edges of a dst land in one bucket,
    so dedup + count happen in the same reduce task; only the
    per-module aggregate (#modules rows) reaches the final sort+limit.
    -> Dataset(module, in_degree) ordered by (in_degree desc, module).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = _extract_batch(batch)
        df["_bucket"] = bucket_strs(df["dst_module"], n_buckets)
        return strip_pd_metadata(df) if len(df) else df

    def count(bucket: pd.DataFrame) -> pd.DataFrame:
        e = bucket.drop_duplicates(["src_module", "dst_module"])
        vc = e["dst_module"].value_counts()
        return pd.DataFrame(
            {
                "module": vc.index.astype(str),
                "in_degree": vc.to_numpy().astype("int64"),
            }
        )

    deg = (
        files_ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(count, batch_format="pandas")
    )
    return deg.sort(
        ["in_degree", "module"], descending=[True, False]
    ).limit(k)


# shared with the SQL mirror verbatim — RE2 and Python `re` agree on \b
# word boundaries and non-overlapping scans for these disjoint keywords
BRANCH_RE = r"\b(?:if|elif|else|for|while|and|or|except)\b"
DEF_RE = r"(?m)^def "


def complexity_scores(files_ds, key_cols: tuple = ("repo", "path"),
                      text_col: str = "content"):
    """Cyclomatic-complexity PROXY per source file — the static-analysis
    screen a code-corpus curation pass runs next to secret scanning and
    import-graph extraction: branch-keyword occurrences plus top-level
    function count (each function body is +1 decision path).

    -> Dataset(key_cols..., n_funcs, n_branches, complexity) with
    complexity = n_funcs + n_branches (int64).

    Shape: stateless vectorized map (pandas str.count with compiled
    regexes — one pass per batch, no shuffle at all); the output is one
    short row per file."""
    branch = re.compile(BRANCH_RE)
    defs = re.compile(DEF_RE)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[list(key_cols)].copy()
        nb = batch[text_col].str.count(branch).astype("int64")
        nf = batch[text_col].str.count(defs).astype("int64")
        out["n_funcs"] = nf
        out["n_branches"] = nb
        out["complexity"] = (nf + nb).astype("int64")
        return out

    return files_ds.map_batches(score, batch_format="pandas")


def function_clones(files_ds, key_cols: tuple = ("repo", "path"),
                    text_col: str = "content", min_files: int = 2,
                    n_buckets: int = 32):
    """Type-2 code-clone detection (parameterized clones): split each file
    into function segments on '\\ndef ', abstract away numeric literals
    ([0-9]+ -> '#'), md5 the normalized body, and report every normalized
    body occurring in >= ``min_files`` distinct files — the clone-group
    report a code-corpus dedup pass runs where LINE-level dedup
    (dedup_lines) misses renamed-constant copies.  The '\\ndef ' split is
    shared verbatim with the SQL mirror (RE2 has no lookahead, so a
    function-block REGEX could not be mirrored; a plain split can).

    -> Dataset(clone_hash, n_occurrences, n_files), n_files >= min_files.

    Shape: one stateless pass emits (hash16, filekey) rows — never bodies;
    one hash-bucketed grouped reduce computes total + distinct-file counts
    per clone hash (a boilerplate clone group concentrates in one bucket;
    its reduce state is the group's (hash, filekey) distinct rows, bounded
    by corpus file count, not occurrences)."""
    import hashlib

    digits = re.compile(r"[0-9]+")

    def to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        hs, fks = [], []
        for idx in range(len(batch)):
            fkey = "/".join(str(batch[c].iloc[idx]) for c in key_cols)
            segs = str(batch[text_col].iloc[idx]).split("\ndef ")
            for seg in segs[1:]:
                norm = digits.sub("#", seg)
                hs.append(hashlib.md5(norm.encode()).hexdigest()[:16])
                fks.append(fkey)
        out = pd.DataFrame({"ch": pd.Series(hs, dtype=object),
                            "fkey": pd.Series(fks, dtype=object)})
        if len(out):
            out["_bucket"] = bucket_strs(out["ch"], n_buckets)
        else:
            out["_bucket"] = pd.Series(dtype="int32")
        return strip_pd_metadata(out) if len(out) else out

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        g = bucket.groupby("ch", sort=False)
        out = pd.DataFrame({
            "n_occurrences": g.size().astype("int64"),
            "n_files": g["fkey"].nunique().astype("int64"),
        }).reset_index(names="clone_hash")
        return out[out["n_files"] >= min_files]

    return (
        files_ds.map_batches(to_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(8)
    )


HITS_SCALE = 1_000_000


def hits_scores(files_ds, rounds: int = 2, n_buckets: int = 32):
    """Integer HITS (Kleinberg hubs & authorities) over the DIRECTED
    module-import graph — "which modules aggregate the ecosystem (hubs)
    and which are the load-bearing dependencies (authorities)": per round,
    auth(v) = Σ hub(u) over importers u->v, then hub(u) = Σ auth(v) over
    its imports, each renormalized to max = HITS_SCALE by integer floor
    division (max is order-insensitive, so — like pagerank_int — the whole
    iteration is bit-deterministic under any shuffle order and exactly
    SQL-mirrorable; float HITS with an L2 norm would not be).

    -> Dataset(module, hub, auth): every node appearing as src or dst;
    scores on the HITS_SCALE grid after ``rounds`` full rounds.

    Shape: per round ONE join + grouped sum per direction (score tables
    are node-sized -> broadcast plan under the join cap); the global max
    for renormalization is a driver scalar."""
    import numpy as np

    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    edges = import_edges(files_ds, n_buckets).materialize()
    nodes = bucketed_groupby_agg(
        edges.map_batches(
            lambda b: pd.DataFrame({"module": pd.concat(
                [b["src_module"], b["dst_module"]], ignore_index=True)}),
            batch_format="pandas",
        ),
        keys=["module"], aggs={"_n": (None, "count")},
    ).drop_columns(["_n"]).materialize()

    def renorm(ds, col):
        mx = ds.max(col)
        mx = int(mx) if mx else 1

        def fn(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out[col] = (out[col] * HITS_SCALE // mx).astype("int64")
            return out

        return ds.map_batches(fn, batch_format="pandas").materialize()

    hub = nodes.map_batches(
        lambda b: b.assign(hub=np.int64(HITS_SCALE)), batch_format="pandas"
    ).materialize()

    auth = None
    for _ in range(rounds):
        # auth(v) = sum of hub over in-edges; nodes with no importers -> 0
        contrib = bucketed_join(
            edges.map_batches(
                lambda b: b.rename(columns={"src_module": "module"}),
                batch_format="pandas",
            ),
            hub, on="module", small_side="right", n_buckets=n_buckets,
        ).map_batches(
            lambda b: pd.DataFrame({"module": b["dst_module"],
                                    "auth": b["hub"].astype("int64")}),
            batch_format="pandas",
        )
        sums = bucketed_groupby_agg(
            contrib, keys=["module"], aggs={"auth": ("auth", "sum")},
            n_buckets=n_buckets,
        )
        auth = bucketed_join(nodes, sums, on="module", how="left",
                             n_buckets=n_buckets).map_batches(
            lambda b: b.assign(
                auth=b["auth"].fillna(0).astype("int64")),
            batch_format="pandas",
        ).materialize()
        auth = renorm(auth, "auth")

        # hub(u) = sum of auth over out-edges
        contrib = bucketed_join(
            edges.map_batches(
                lambda b: b.rename(columns={"dst_module": "module"}),
                batch_format="pandas",
            ),
            auth, on="module", small_side="right", n_buckets=n_buckets,
        ).map_batches(
            lambda b: pd.DataFrame({"module": b["src_module"],
                                    "hub": b["auth"].astype("int64")}),
            batch_format="pandas",
        )
        sums = bucketed_groupby_agg(
            contrib, keys=["module"], aggs={"hub": ("hub", "sum")},
            n_buckets=n_buckets,
        )
        hub = bucketed_join(nodes, sums, on="module", how="left",
                            n_buckets=n_buckets).map_batches(
            lambda b: b.assign(hub=b["hub"].fillna(0).astype("int64")),
            batch_format="pandas",
        ).materialize()
        hub = renorm(hub, "hub")

    out = bucketed_join(hub, auth, on="module", n_buckets=n_buckets)
    return out.map_batches(
        lambda b: b[["module", "hub", "auth"]], batch_format="pandas"
    )


def dependency_depth(files_ds, rounds: int = 4, n_buckets: int = 32):
    """Topological dependency depth over the import DAG — the parallel
    build-order layer number: depth(m) = 0 for modules that import
    nothing, else 1 + max(depth of its imports).  Modules only ever
    imported (never defined with out-edges) sit at depth 0.  Computed as
    ``rounds`` relaxation sweeps — exact once rounds >= the longest
    import chain (this corpus: 3), and bit-identical on both engines at
    any fixed round count, so the DuckDB mirror is the same unroll.

    Build scheduling / incremental-rebuild batching runs off exactly
    this layering (every module in layer d can compile once layers < d
    are done).

    Scale shape: per round ONE bucketed edges⋈depth join on the imported
    module + ONE bucketed grouped max per importer + ONE left join back
    to the module universe (modules without out-edges keep depth 0).
    Depth state is one int per module; edges move once per round.
    -> Dataset(module, depth)."""
    import numpy as np

    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    edges = import_edges(files_ds, n_buckets=n_buckets).materialize()
    universe = (
        edges.map_batches(
            lambda b: pd.DataFrame({
                "module": pd.concat([b["src_module"], b["dst_module"]],
                                     ignore_index=True).drop_duplicates()
            }),
            batch_format="pandas",
        )
    )
    universe = bucketed_groupby_agg(
        universe.map_batches(
            lambda b: b.assign(_one=np.int64(1)), batch_format="pandas"
        ),
        keys=["module"], aggs={"_one": ("_one", "min")},
    ).map_batches(lambda b: b[["module"]], batch_format="pandas").materialize()

    depth = universe.map_batches(
        lambda b: b.assign(depth=np.int64(0)), batch_format="pandas"
    ).materialize()
    for _ in range(rounds):
        dep = edges.map_batches(
            lambda b: b.rename(columns={"dst_module": "module"}),
            batch_format="pandas",
        )
        joined = bucketed_join(dep, depth, on="module",
                               n_buckets=n_buckets)
        # pin: join -> agg -> join is 3 hash shuffles (merge.py deadlock
        # mitigation for this Ray build)
        relaxed = bucketed_groupby_agg(
            joined.map_batches(
                lambda b: pd.DataFrame({
                    "module": b["src_module"],
                    "d": b["depth"].astype("int64") + 1,
                }),
                batch_format="pandas",
            ),
            keys=["module"], aggs={"d": ("d", "max")},
        ).materialize()
        depth = bucketed_join(
            universe, relaxed, on="module", how="left", n_buckets=n_buckets
        ).map_batches(
            lambda b: pd.DataFrame({
                "module": b["module"],
                "depth": b["d"].fillna(0).astype("int64"),
            }),
            batch_format="pandas",
        ).materialize()
    return depth


IDENT_RE = re.compile(r"[a-z_][a-z0-9_]*")


def identifier_vocab(files_ds, n_buckets: int = 64):
    """Per-repo identifier-subtoken vocabulary profile — the tokenizer-
    prep / naming-convention signal over a code corpus: lowercase
    identifiers split on '_' into subtokens, then per repo the total
    subtoken occurrences, distinct-subtoken vocabulary size, dominant
    subtoken (ties -> lexicographic min) and its ppm share.

    Shape: one vectorized extraction pass (pandas .str kernels) explodes
    (repo, subtoken) occurrence rows per batch; everything after is
    profile.grouped_dominance's combiner-backed shuffle — partial counts
    move, never occurrence rows.  -> Dataset(repo, n_rows, n_cats,
    top_cat, top_ppm)."""
    from .profile import grouped_dominance

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        idents = batch["content"].str.findall(IDENT_RE)
        df = pd.DataFrame({"repo": batch["repo"], "sub": idents}).explode(
            "sub"
        ).dropna()
        df["sub"] = df["sub"].str.split("_")
        df = df.explode("sub")
        df = df[df["sub"] != ""]
        return df.reset_index(drop=True)

    rows = files_ds.map_batches(explode, batch_format="pandas")
    return grouped_dominance(rows, keys=["repo"], cat_col="sub",
                             n_buckets=n_buckets)


def api_surface(files_ds, n_buckets: int = 64):
    """Per-(repo, lang) API-surface profile — the "what does this repo
    export" inventory behind docs generation and API-churn tracking:
    counts of function (``def <name>(``) and class (``class <Name>``)
    definitions plus the DISTINCT function-name vocabulary size
    (overloads/duplicates collapse).

    Shape: one vectorized regex pass emits (repo, lang, def_name) rows
    and a per-batch (repo, lang, n_defs, n_classes) counter partial; the
    distinct reduce dedups names via one bucketed grouped pass keyed on
    (repo, lang, name), the counters fold via a second small grouped
    sum joined back bucketed — fixed-width rows only after extraction.
    -> Dataset(repo, lang, n_defs, n_classes, n_distinct_defs)."""
    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    DEF_RE = r"(?m)^[ \t]*def[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("
    CLASS_RE = r"(?m)^[ \t]*class[ \t]+([A-Za-z_][A-Za-z0-9_]*)"

    def names(batch: pd.DataFrame) -> pd.DataFrame:
        defs = batch["content"].str.findall(DEF_RE)
        df = pd.DataFrame({
            "repo": batch["repo"], "lang": batch["lang"], "name": defs,
        }).explode("name").dropna()
        out = df.reset_index(drop=True)
        return strip_pd_metadata(out) if len(out) else pd.DataFrame({
            "repo": pd.Series(dtype=object),
            "lang": pd.Series(dtype=object),
            "name": pd.Series(dtype=object),
        })

    def counters(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "repo": batch["repo"],
            "lang": batch["lang"],
            "n_defs": batch["content"].str.count(DEF_RE).astype("int64"),
            "n_classes": batch["content"].str.count(CLASS_RE).astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    # pins between the hash shuffles (stages/merge.py note)
    distinct_names = bucketed_groupby_agg(
        files_ds.map_batches(names, batch_format="pandas"),
        keys=["repo", "lang", "name"],
        aggs={"n_occ": (None, "count")},
    ).materialize()
    vocab = bucketed_groupby_agg(
        distinct_names.map_batches(
            lambda b: b[["repo", "lang"]], batch_format="pandas"
        ),
        keys=["repo", "lang"],
        aggs={"n_distinct_defs": (None, "count")},
    ).materialize()
    totals = bucketed_groupby_agg(
        files_ds.map_batches(counters, batch_format="pandas"),
        keys=["repo", "lang"],
        aggs={"n_defs": ("n_defs", "sum"),
              "n_classes": ("n_classes", "sum")},
    ).materialize()

    def key(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(_k=b["repo"].astype(str) + "\x1f" + b["lang"].astype(str))
        return strip_pd_metadata(out) if len(out) else out

    joined = bucketed_join(
        totals.map_batches(key, batch_format="pandas"),
        vocab.map_batches(key, batch_format="pandas").map_batches(
            lambda b: b[["_k", "n_distinct_defs"]], batch_format="pandas"
        ),
        on="_k", how="left",
    )
    return joined.map_batches(
        lambda b: b.assign(
            n_distinct_defs=b["n_distinct_defs"].fillna(0).astype("int64")
        )[["repo", "lang", "n_defs", "n_classes", "n_distinct_defs"]],
        batch_format="pandas",
    )


# call-site and def-name grammars shared by the call-graph builder and its
# DuckDB oracle (__ray_entry__) — ASCII classes so Python re == DuckDB RE2
CALLSITE_RE = r"= *([A-Za-z_][A-Za-z0-9_]*)\("
DEF_NAME_RE = r"(?m)^[ \t]*def[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("


def _module_sym_rows(batch: pd.DataFrame, sym_re: str) -> pd.DataFrame:
    """(module, sym) rows from one batch: the file's own module header
    paired with every regex hit, locally deduped before the shuffle."""
    mod = batch["content"].str.extract(MODULE_RE, expand=False)
    syms = batch["content"].str.findall(sym_re)
    df = pd.DataFrame({"module": mod, "sym": syms}).explode("sym").dropna()
    df = df[df["module"] != ""]
    out = df.drop_duplicates(ignore_index=True)
    if len(out) == 0:
        return pd.DataFrame({"module": pd.Series(dtype=object),
                             "sym": pd.Series(dtype=object)})
    return strip_pd_metadata(out)


def resolved_call_edges(files_ds, n_buckets: int = 32):
    """Module-level call graph via UNAMBIGUOUS symbol resolution — the
    static-analysis step real call-graph builders (pycg, stack-graphs)
    run corpus-wide: a call site `x = f(...)` becomes an edge
    caller_module -> defining_module only when `f` is defined in exactly
    ONE module; ambiguous symbols (the corpus's shared_fn_* helpers,
    defined in dozens of modules) are dropped rather than guessed, which
    also keeps hub fan-out out of the graph.

    Shape: two vectorized extraction passes (defs, call sites) with
    per-batch local dedup, a grouped distinct + HAVING n_modules == 1
    reduce on the symbol key, one bucketed join calls><defs on the same
    key, and a final (src, dst) distinct.  All shuffled rows are short
    (module, symbol) string pairs — at 100 TB only deduped pairs move.
    -> Dataset(src, dst) distinct; self-loops kept (recursion).
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    defs = files_ds.map_batches(
        lambda b: _module_sym_rows(b, DEF_NAME_RE), batch_format="pandas"
    )
    def_pairs = bucketed_groupby_agg(
        defs, keys=["sym", "module"], aggs={"n_occ": (None, "count")},
        n_buckets=n_buckets,
    ).materialize()
    uds = bucketed_groupby_agg(
        def_pairs.map_batches(lambda b: b[["sym", "module"]],
                              batch_format="pandas"),
        keys=["sym"],
        aggs={"n_mods": (None, "count"), "dst": ("module", "min")},
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: b[b["n_mods"] == 1][["sym", "dst"]], batch_format="pandas"
    ).materialize()

    calls = files_ds.map_batches(
        lambda b: _module_sym_rows(b, CALLSITE_RE), batch_format="pandas"
    ).map_batches(lambda b: b.rename(columns={"module": "src"}),
                  batch_format="pandas")
    call_pairs = bucketed_groupby_agg(
        calls, keys=["src", "sym"], aggs={"n_occ": (None, "count")},
        n_buckets=n_buckets,
    ).map_batches(lambda b: b[["src", "sym"]], batch_format="pandas"
                  ).materialize()

    hits = bucketed_join(call_pairs, uds, on="sym", small_side="right",
                         n_buckets=n_buckets)
    return bucketed_groupby_agg(
        hits.map_batches(lambda b: b[["src", "dst"]], batch_format="pandas"),
        keys=["src", "dst"], aggs={"n_occ": (None, "count")},
        n_buckets=n_buckets,
    ).map_batches(lambda b: b[["src", "dst"]], batch_format="pandas")


def call_cycles(files_ds, max_len: int = 6, n_buckets: int = 32):
    """Minimum call-cycle length per module (recursion/circular-call
    detection), exact for cycles of length <= `max_len` — the bounded
    analog of SCC condensation that code-health dashboards report.

    Math: min closed-walk length from u equals the min simple-cycle
    length through u (cutting a repeated intermediate vertex only
    shortens the walk).  Meet-in-the-middle: with H = max_len // 2
    min-plus rounds giving C_H(u, v) = exact min path length <= H, the
    min cycle through u (<= 2H) is min(diag C_H(u, u), min over v of
    C_H(u, v) + C_H(v, u)) — a cycle of length L <= 2H has a vertex at
    forward distance <= H whose return distance is also <= H.

    Shape: H - 1 rounds of (bucketed join reach><edges, grouped min per
    (src, dst)) — Bellman-Ford layering, NOT path doubling, so the
    per-round intermediate stays |reach| x avg-out-degree — then ONE
    composite-key self-join pairs (u, v) with (v, u), and a final
    grouped min per module.  Bounded closure: |reach| <= n x (nodes
    within H hops); exact and cheap on the sparse, locality-clustered
    call graphs real corpora produce (documented bound, same contract as
    dependency_depth's fixed sweeps).  materialize() pins between hash
    shuffles per stages/merge.py's >2-shuffle note.
    -> Dataset(module, min_cycle_len) for modules with a cycle <= max_len.
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    half = max(1, max_len // 2)
    edges = resolved_call_edges(files_ds, n_buckets=n_buckets).materialize()
    hop = edges.map_batches(
        lambda b: b.rename(columns={"src": "via"}), batch_format="pandas"
    ).materialize()

    def with_len(b: pd.DataFrame) -> pd.DataFrame:
        out = b.assign(plen=np.int64(1))
        return strip_pd_metadata(out) if len(out) else out

    reach = edges.map_batches(with_len, batch_format="pandas").materialize()
    for _ in range(half - 1):
        stepped = bucketed_join(
            reach.map_batches(
                lambda b: b.rename(columns={"dst": "via"}),
                batch_format="pandas"),
            hop, on="via", n_buckets=n_buckets,
        ).map_batches(
            lambda b: b.assign(plen=(b["plen"] + 1).astype("int64"))[
                ["src", "dst", "plen"]],
            batch_format="pandas",
        )
        reach = bucketed_groupby_agg(
            reach.union(stepped), keys=["src", "dst"],
            aggs={"plen": ("plen", "min")}, n_buckets=n_buckets,
        ).materialize()

    def fwd_key(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "pkey": b["src"].astype(str) + "\x1f" + b["dst"].astype(str),
            "module": b["src"], "plen": b["plen"].astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    def rev_key(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "pkey": b["dst"].astype(str) + "\x1f" + b["src"].astype(str),
            "plen_back": b["plen"].astype("int64"),
        })
        return strip_pd_metadata(out) if len(out) else out

    paired = bucketed_join(
        reach.map_batches(fwd_key, batch_format="pandas"),
        reach.map_batches(rev_key, batch_format="pandas"),
        on="pkey", n_buckets=n_buckets,
    ).map_batches(
        lambda b: pd.DataFrame({
            "module": b["module"],
            "l": (b["plen"] + b["plen_back"]).astype("int64")}),
        batch_format="pandas",
    )
    def diag_rows(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[b["src"] == b["dst"]]
        out = pd.DataFrame({"module": sel["src"],
                            "l": sel["plen"].astype("int64")}
                           ).reset_index(drop=True)
        if len(out) == 0:
            return pd.DataFrame({"module": pd.Series(dtype=object),
                                 "l": pd.Series(dtype="int64")})
        return strip_pd_metadata(out)

    diag = reach.map_batches(diag_rows, batch_format="pandas")
    best = bucketed_groupby_agg(
        paired.union(diag), keys=["module"],
        aggs={"min_cycle_len": ("l", "min")}, n_buckets=n_buckets,
    )
    return best.map_batches(
        lambda b: b[b["min_cycle_len"] <= max_len].reset_index(drop=True),
        batch_format="pandas",
    )


def vendored_files(files_ds, min_repos: int = 2):
    """Cross-repo vendored-code detection — the "same bytes checked into
    N repos" report a training-data pipeline needs before per-repo
    weighting (a file vendored into 40 repos is 40x over-represented
    unless collapsed; the reference dedups only within its ingest batch,
    preprocessing.py:107-150 — this is the corpus-wide complement).

    Groups files by ``content_sha256`` and keeps hashes seen in >=
    ``min_repos`` DISTINCT repos; reports copy count, distinct-repo count
    and the canonical first location (lexicographic min (repo, path,
    commit) — same representative rule as dedup_exact).

    Scale shape: two combiner-first grouped passes (copies fold counts +
    lexicographic-min location per sha; repo fan-out dedups (sha, repo)
    pairs then counts) and ONE sha-bucketed join — no driver state, no
    per-occurrence rows past the first combiner.
    -> Dataset(content_sha256, n_copies, n_repos, first_repo, first_path).
    """
    from ..arrowutil import strip_pd_metadata
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    SEP = "\x1f"

    def loc_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "content_sha256": b["content_sha256"],
            "_loc": b["repo"].astype(str) + SEP + b["path"].astype(str)
                    + SEP + b["commit"].astype(str),
        })
        return strip_pd_metadata(out) if len(out) else out

    copies = bucketed_groupby_agg(
        files_ds.map_batches(loc_rows, batch_format="pandas"),
        keys=["content_sha256"],
        aggs={"n_copies": (None, "count"), "_first": ("_loc", "min")},
    )
    repo_pairs = bucketed_groupby_agg(
        files_ds.map_batches(
            lambda b: strip_pd_metadata(
                b[["content_sha256", "repo"]].copy()
            ) if len(b) else b[["content_sha256", "repo"]],
            batch_format="pandas",
        ),
        keys=["content_sha256", "repo"],
        aggs={"_n": (None, "count")},
    ).materialize()  # pin between hash shuffles (stages/merge.py note)
    repo_counts = bucketed_groupby_agg(
        repo_pairs.map_batches(
            lambda b: b[["content_sha256"]], batch_format="pandas"
        ),
        keys=["content_sha256"],
        aggs={"n_repos": (None, "count")},
    ).materialize()

    joined = bucketed_join(copies, repo_counts, on="content_sha256")

    def finish(b: pd.DataFrame):
        from ..arrowutil import df_to_table

        b = b[b["n_repos"] >= min_repos]
        parts = b["_first"].str.split(SEP, expand=True)
        out = pd.DataFrame({
            "content_sha256": b["content_sha256"],
            "n_copies": b["n_copies"].astype("int64"),
            "n_repos": b["n_repos"].astype("int64"),
            "first_repo": parts[0] if len(b) else pd.Series(dtype=object),
            "first_path": parts[1] if len(b) else pd.Series(dtype=object),
        }).reset_index(drop=True)
        # typed Arrow: the min_repos filter empties most blocks
        return df_to_table(out)

    return joined.map_batches(finish, batch_format="pandas")


UNUSED_DEF_RE = r"(?m)^[ \t]*def[ \t]+([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("
ANY_CALLSITE_RE = r"([A-Za-z_][A-Za-z0-9_]*)[ \t]*\("


def unused_defs(files_ds, n_buckets: int = 64):
    """Dead-symbol scan per repo — the static-analysis pipeline every
    monorepo runs before a deletion sweep: a function is UNUSED when its
    only call-shaped appearances (``name(``) in its repo are its own
    ``def`` lines, i.e. n_callsites == n_defs (each def line is itself a
    callsite match, so equality means zero references; a self-recursive
    call counts as a reference by this rule, documented).

    Ray shape: one vectorized extractall pass emits per-batch (repo,
    name) def/callsite combiner counts; one bucketed grouped sum per
    table; defs LEFT JOIN callsites inside the same bucketed join; the
    final fold is per-repo.  -> Dataset(repo, n_defs, n_unused,
    first_unused) with n_defs = distinct def names, first_unused = the
    lexicographically smallest unused name ('' when none).
    """
    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    def counts(pattern: str, out_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"k": pd.Series(dtype=object),
                                  out_col: pd.Series(dtype="int64")})
            if len(b) == 0:
                return empty
            ex = b["content"].reset_index(drop=True).str.extractall(pattern)
            if len(ex) == 0:
                return empty
            df = ex.reset_index()
            df["repo"] = b["repo"].to_numpy()[df["level_0"].to_numpy()]
            g = df.groupby(["repo", 0], sort=False).size()
            out = g.reset_index(name=out_col)
            out["k"] = out["repo"].astype(str) + "|" + out[0].astype(str)
            return out[["k", out_col]]
        return fn

    defs = bucketed_groupby_agg(
        files_ds.map_batches(counts(UNUSED_DEF_RE, "n_def"),
                             batch_format="pandas"),
        keys=["k"], aggs={"n_def": ("n_def", "sum")},
    ).materialize()
    calls = bucketed_groupby_agg(
        files_ds.map_batches(counts(ANY_CALLSITE_RE, "n_call"),
                             batch_format="pandas"),
        keys=["k"], aggs={"n_call": ("n_call", "sum")},
    ).materialize()
    flagged = bucketed_join(defs, calls, on="k", how="left")

    def widen(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "repo": pd.Series(dtype=object),
                "one": pd.Series(dtype="int64"),
                "unused": pd.Series(dtype="int64"),
                "uname": pd.Series(dtype=object),
            })
        parts = b["k"].str.split("|", n=1, expand=True)
        n_call = b["n_call"].fillna(0).astype("int64")
        unused = (n_call == b["n_def"].astype("int64")).astype("int64")
        return pd.DataFrame({
            "repo": parts[0],
            "one": np.int64(1),
            "unused": unused,
            # sentinel sorts after every identifier so min() lands on a
            # real unused name whenever one exists
            "uname": np.where(unused == 1, parts[1], "\x7f"),
        })

    agg = bucketed_groupby_agg(
        flagged.map_batches(widen, batch_format="pandas"),
        keys=["repo"],
        aggs={"n_defs": ("one", "sum"), "n_unused": ("unused", "sum"),
              "first_unused": ("uname", "min")},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        out = b.copy()
        out["first_unused"] = out["first_unused"].where(
            out["n_unused"] > 0, "")
        out.loc[out["first_unused"] == "\x7f", "first_unused"] = ""
        return out

    return agg.map_batches(finish, batch_format="pandas")

"""Driver contract for the graft builder (Ray Data target).

`queries()` exposes each implemented operator/pipeline from SURVEY.md §2 as a
callable over an sf dir; `oracle_sql()` gives the DuckDB-equivalent SQL. The
KG-construction queries run over the deterministic synthetic source-code
corpus (BASELINE.json input_hint shape), generated idempotently under
/tmp/raykg_corpus — the SQL oracles read the same parquet file, so the whole
chain (tokenize -> window -> extract -> merge -> backfill) is verified
value-for-value against an independent SQL implementation.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.01"

# --------------------------------------------------------------------------
# SQL oracle fragments (kept in lockstep with the Python implementations —
# the tokenizer pattern is shared verbatim, tests/test_tokenizer.py proves
# Python re and DuckDB RE2 agree on it).
# --------------------------------------------------------------------------


def _kg_cte(corpus: str) -> str:
    from mmgraphrag_ray.config import DEFAULT_CONFIG as C
    from mmgraphrag_ray.tokenizer import TOKEN_PATTERN

    size, stride = C.chunk_token_size, C.chunk_token_size - C.chunk_overlap_token_size
    pat = TOKEN_PATTERN
    ws = "concat(' ', chr(9), chr(10), chr(13), chr(11), chr(12))"
    return f"""
WITH files0 AS (
  SELECT repo, path, commit, lang, content,
         sha256(content) AS content_sha256,
         'doc-' || md5(content) AS doc_id
  FROM read_parquet('{corpus}/*.parquet')
),
files AS (
  SELECT repo, path, commit, lang, content, content_sha256, doc_id FROM (
    SELECT *, row_number() OVER (PARTITION BY content_sha256 ORDER BY repo, path, commit) AS rn
    FROM files0
  ) WHERE rn = 1
),
toks AS (
  SELECT doc_id, repo, path, lang, content_sha256,
         regexp_extract_all(content, '{pat}') AS t
  FROM files
),
wins AS (
  SELECT doc_id, repo, path, lang, content_sha256, t,
         unnest(generate_series(0, len(t) - 1, {stride})) AS start
  FROM toks
),
chunks0 AS (
  SELECT doc_id, repo, path, lang, content_sha256,
         trim(array_to_string(list_slice(t, start + 1, start + {size}), ''), {ws}) AS content,
         CAST(least({size}, len(t) - start) AS INTEGER) AS tokens,
         CAST(start // {stride} AS INTEGER) AS chunk_order_index
  FROM wins
),
chunks AS (
  SELECT chunk_id, doc_id, repo, path, lang, content_sha256, tokens, content, chunk_order_index FROM (
    SELECT 'chunk-' || md5(content) AS chunk_id, *,
           row_number() OVER (PARTITION BY md5(content) ORDER BY doc_id, repo, path, chunk_order_index) AS rn2
    FROM chunks0
  ) WHERE rn2 = 1
),
modc AS (
  SELECT * FROM (
    SELECT chunk_id, doc_id, repo, path, content_sha256, chunk_order_index, content,
           regexp_extract(content, '# module: ([A-Za-z_][A-Za-z0-9_.]*)', 1) AS module
    FROM chunks
  ) WHERE module <> ''
),
imps AS (SELECT *, unnest(regexp_extract_all(content, '(?m)^import +([A-Za-z_][A-Za-z0-9_.]*)', 1)) AS sym FROM modc),
clss AS (SELECT *, unnest(regexp_extract_all(content, '(?m)^ *class +([A-Za-z_][A-Za-z0-9_]*)', 1)) AS sym FROM modc),
defs AS (SELECT *, unnest(regexp_extract_all(content, '(?m)^ *def +([A-Za-z_][A-Za-z0-9_]*) *\\(', 1)) AS sym FROM modc),
calls AS (SELECT *, unnest(regexp_extract_all(content, '= *([A-Za-z_][A-Za-z0-9_]*)\\(', 1)) AS sym FROM modc),
ent_mentions AS (
  SELECT '"' || upper(module) || '"' AS entity_name, '"MODULE"' AS entity_type,
         '"Module ' || module || '."' AS description, chunk_id AS source_id,
         doc_id, repo, path, content_sha256, chunk_order_index
  FROM modc
  UNION ALL
  SELECT '"' || upper(sym) || '"', '"MODULE"', '"Module ' || sym || '."', chunk_id,
         doc_id, repo, path, content_sha256, chunk_order_index FROM imps
  UNION ALL
  SELECT '"' || upper(sym) || '"', '"CLASS"', '"Class ' || sym || ' in module ' || module || '."', chunk_id,
         doc_id, repo, path, content_sha256, chunk_order_index FROM clss
  UNION ALL
  SELECT '"' || upper(sym) || '"', '"FUNCTION"', '"Function ' || sym || ' in module ' || module || '."', chunk_id,
         doc_id, repo, path, content_sha256, chunk_order_index FROM defs
),
rel0 AS (
  SELECT module, sym, 7.0 AS weight, '"Module ' || module || ' imports ' || sym || '."' AS description,
         chunk_id, doc_id, repo, path, content_sha256, chunk_order_index FROM imps
  UNION ALL
  SELECT module, sym, 9.0, '"Module ' || module || ' defines class ' || sym || '."',
         chunk_id, doc_id, repo, path, content_sha256, chunk_order_index FROM clss
  UNION ALL
  SELECT module, sym, 9.0, '"Module ' || module || ' defines function ' || sym || '."',
         chunk_id, doc_id, repo, path, content_sha256, chunk_order_index FROM defs
  UNION ALL
  SELECT module, sym, 2.0, '"Module ' || module || ' calls ' || sym || '."',
         chunk_id, doc_id, repo, path, content_sha256, chunk_order_index FROM calls
),
rel_mentions AS (
  SELECT least('"' || upper(module) || '"', '"' || upper(sym) || '"') AS src_id,
         greatest('"' || upper(module) || '"', '"' || upper(sym) || '"') AS tgt_id,
         weight, description, chunk_id AS source_id, CAST(1 AS INTEGER) AS "order",
         doc_id, repo, path, content_sha256, chunk_order_index
  FROM rel0
)"""


def _trunc(expr: str) -> str:
    """SQL mirror of stages/merge.py summarize_description (truncation
    stand-in for the >=500-token summarize gate)."""
    from mmgraphrag_ray.config import DEFAULT_CONFIG as C
    from mmgraphrag_ray.tokenizer import TOKEN_PATTERN

    g, pat = C.entity_summary_to_max_tokens, TOKEN_PATTERN
    return (
        f"CASE WHEN len(regexp_extract_all({expr}, '{pat}')) >= {g} "
        f"THEN array_to_string(list_slice(regexp_extract_all({expr}, '{pat}'), 1, {g}), '') "
        f"ELSE {expr} END"
    )


def _kg_merge_cte() -> str:
    sep = "<SEP>"
    return f""",
type_counts AS (SELECT entity_name, entity_type, count(*) AS c FROM ent_mentions GROUP BY 1, 2),
type_mode AS (
  SELECT entity_name, entity_type FROM (
    SELECT *, row_number() OVER (PARTITION BY entity_name ORDER BY c DESC, entity_type ASC) AS rn
    FROM type_counts
  ) WHERE rn = 1
),
node_agg AS (
  SELECT entity_name,
         string_agg(DISTINCT description, '{sep}' ORDER BY description) AS description,
         string_agg(DISTINCT source_id, '{sep}' ORDER BY source_id) AS source_id
  FROM ent_mentions GROUP BY entity_name
),
nodes_known AS (
  SELECT n.entity_name, t.entity_type, {_trunc('n.description')} AS description, n.source_id
  FROM node_agg n JOIN type_mode t ON n.entity_name = t.entity_name
),
edge_agg AS (
  SELECT src_id, tgt_id, sum(weight) AS weight, min("order") AS "order",
         string_agg(DISTINCT description, '{sep}' ORDER BY description) AS description_full,
         string_agg(DISTINCT source_id, '{sep}' ORDER BY source_id) AS source_id
  FROM rel_mentions GROUP BY 1, 2
),
endpoints AS (
  SELECT src_id AS entity_name, src_id, tgt_id, description_full, source_id FROM edge_agg
  UNION ALL
  SELECT tgt_id AS entity_name, src_id, tgt_id, description_full, source_id FROM edge_agg
),
unknown_nodes AS (
  SELECT entity_name, '"UNKNOWN"' AS entity_type, description_full AS description, source_id FROM (
    SELECT e.*, row_number() OVER (PARTITION BY e.entity_name ORDER BY e.src_id, e.tgt_id) AS rn
    FROM endpoints e
    WHERE e.entity_name NOT IN (SELECT entity_name FROM nodes_known)
  ) WHERE rn = 1
),
nodes AS (SELECT * FROM nodes_known UNION ALL SELECT * FROM unknown_nodes),
edges AS (
  SELECT src_id, tgt_id, weight, {_trunc('description_full')} AS description, source_id, "order"
  FROM edge_agg
)"""


def _lang_id_sql() -> str:
    """Exact SQL mirror of stages/textstats.py LangIdStage over `documents`:
    ASCII word tokens lowered per-token (NOT lower(text) — keeps non-ASCII
    lowercasing out, matching the Python [A-Za-z]+-then-lower order), per-
    language stopword hit counts, argmax; zero hits or a top-2 tie -> unknown."""
    from mmgraphrag_ray.stages.textstats import _LANG_STOPWORDS

    langs = sorted(_LANG_STOPWORDS)
    count_cols = ",\n    ".join(
        "len(list_filter(ws, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[lang]))
        + f"], x))) AS c_{lang}"
        for lang in langs
    )
    maxexpr = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    n_at_max = " + ".join(f"CASE WHEN c_{lang} = m THEN 1 ELSE 0 END" for lang in langs)
    pick = " ".join(f"WHEN c_{lang} = m THEN '{lang}'" for lang in langs)
    return f"""
WITH w AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> lower(x)) AS ws
  FROM documents
),
c AS (
  SELECT doc_id,
    {count_cols}
  FROM w
),
m AS (SELECT *, {maxexpr} AS m FROM c)
SELECT doc_id,
       CASE WHEN m = 0 OR ({n_at_max}) > 1 THEN 'unknown'
            ELSE CASE {pick} END END AS lang_pred
FROM m
"""


def _resolve_refs_sql() -> str:
    """Exact SQL mirror of stages/resolve.py resolve_symbol_refs (appended to
    the kg CTE): FUNCTION/CLASS mentions joined to their defining chunk are
    the candidates; 'Module M calls s.' rel mentions are the call sites;
    score = count of caller-module [A-Za-z0-9]+ words (duplicates counted)
    contained as substrings in the candidate chunk; argmax, ties -> min
    chunk_id; call sites with no candidate are dropped (inner join)."""
    call_re = r'^"Module ([A-Za-z_][A-Za-z0-9_.]*) calls ([A-Za-z_][A-Za-z0-9_]*)\."$'
    return f""",
rdefs AS (
  SELECT DISTINCT e.entity_name AS symbol, e.source_id AS chunk_id, c.content
  FROM ent_mentions e JOIN chunks c ON c.chunk_id = e.source_id
  WHERE e.entity_type IN ('"FUNCTION"', '"CLASS"')
),
rcalls AS (
  SELECT DISTINCT
    regexp_extract(description, '{call_re}', 1) AS caller_module,
    '"' || upper(regexp_extract(description, '{call_re}', 2)) || '"' AS symbol
  FROM rel_mentions
  WHERE regexp_matches(description, '{call_re}')
),
rscored AS (
  SELECT c.caller_module, c.symbol, d.chunk_id,
         len(list_filter(regexp_extract_all(c.caller_module, '[A-Za-z0-9]+'),
                         w -> contains(d.content, w))) AS score
  FROM rcalls c JOIN rdefs d ON d.symbol = c.symbol
)
SELECT caller_module, symbol, chunk_id AS def_chunk_id, CAST(score AS BIGINT) AS score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY caller_module, symbol ORDER BY score DESC, chunk_id ASC) AS rn
  FROM rscored
) WHERE rn = 1
"""


def _maxcover_sql(k: int = 4) -> str:
    """Unrolled greedy max-coverage mirror of stages/select.maxcover_select:
    per round, per-doc count of still-uncovered word BIGRAMS (left-anti vs
    the running covered set), argmax by (gain desc, doc_id asc), covered
    set grows by the winner's bigrams."""
    parts = ["""WITH tsel AS (
  SELECT DISTINCT doc_id, b AS tok FROM (
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
    FROM (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS toks
          FROM documents),
         unnest(generate_series(1, len(toks) - 1)) AS u(i)
  )
),
g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM tsel GROUP BY 1),
w1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
c1 AS (SELECT DISTINCT tok FROM tsel JOIN w1 USING (doc_id))"""]
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT doc_id FROM w{i}" for i in range(1, r)
        )
        parts.append(f""",
g{r} AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM tsel t LEFT JOIN c{r - 1} c ON t.tok = c.tok
  WHERE c.tok IS NULL AND t.doc_id NOT IN ({prev})
  GROUP BY 1),
w{r} AS (SELECT doc_id, gain FROM g{r} ORDER BY gain DESC, doc_id LIMIT 1),
c{r} AS (SELECT tok FROM c{r - 1}
         UNION SELECT tok FROM tsel JOIN w{r} USING (doc_id))""")
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, doc_id, gain,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM c{r}) AS covered_total"
        f" FROM w{r}"
        for r in range(1, k + 1)
    )
    return "".join(parts) + "\n" + sel


def _pagerank_sql(iterations: int = 3) -> str:
    """Unrolled integer power iteration over the merge CTE's nodes/edges —
    the exact mirror of stages/graphalgo.pagerank_int (SCALE=1e12,
    damping 85/100, undirected contributions)."""
    scale = 10**12
    parts = [
        """,
pr_bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id AS u, src_id AS v FROM edges
),
pr_deg AS (SELECT u, count(*) AS d FROM pr_bid GROUP BY 1),
pr_n AS (SELECT count(*) AS n FROM nodes),
pr_r0 AS (
  SELECT entity_name AS node,
         CAST(%d // (SELECT n FROM pr_n) AS BIGINT) AS r
  FROM nodes
)""" % scale
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
pr_c{i} AS (
  SELECT b.v AS node, SUM((85 * pr_r{i - 1}.r // 100) // pr_deg.d) AS s
  FROM pr_bid b
  JOIN pr_r{i - 1} ON pr_r{i - 1}.node = b.u
  JOIN pr_deg ON pr_deg.u = b.u
  GROUP BY 1
),
pr_r{i} AS (
  SELECT nd.entity_name AS node,
         CAST((({scale} * 15 // 100) // (SELECT n FROM pr_n))
              + COALESCE(pr_c{i}.s, 0) AS BIGINT) AS r
  FROM nodes nd LEFT JOIN pr_c{i} ON pr_c{i}.node = nd.entity_name
)"""
        )
    parts.append(f"\nSELECT node, r AS rank FROM pr_r{iterations}")
    return "".join(parts)


def _ppr_sql(iterations: int = 3) -> str:
    """Unrolled integer personalized PageRank over the merge CTE's
    nodes/edges — exact mirror of stages/graphalgo.ppr_int with seeds =
    the CLASS-typed nodes (all teleport mass returns to the seed set)."""
    scale = 10**12
    parts = [
        """,
ppr_seeds AS MATERIALIZED (
  SELECT entity_name AS node FROM nodes WHERE entity_type = '"CLASS"'
),
ppr_ns AS (SELECT count(*) AS n FROM ppr_seeds),
ppr_bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id AS u, src_id AS v FROM edges
),
ppr_deg AS (SELECT u, count(*) AS d FROM ppr_bid GROUP BY 1),
ppr_r0 AS (
  SELECT nd.entity_name AS node,
         CAST(CASE WHEN s.node IS NULL THEN 0
              ELSE %d // (SELECT n FROM ppr_ns) END AS BIGINT) AS r
  FROM nodes nd LEFT JOIN ppr_seeds s ON s.node = nd.entity_name
)""" % scale
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
ppr_c{i} AS (
  SELECT b.v AS node, SUM((85 * ppr_r{i - 1}.r // 100) // ppr_deg.d) AS s
  FROM ppr_bid b
  JOIN ppr_r{i - 1} ON ppr_r{i - 1}.node = b.u
  JOIN ppr_deg ON ppr_deg.u = b.u
  GROUP BY 1
),
ppr_r{i} AS (
  SELECT nd.entity_name AS node,
         CAST(CASE WHEN s.node IS NULL THEN 0
              ELSE ({scale} * 15 // 100) // (SELECT n FROM ppr_ns) END
              + COALESCE(ppr_c{i}.s, 0) AS BIGINT) AS r
  FROM nodes nd
  LEFT JOIN ppr_seeds s ON s.node = nd.entity_name
  LEFT JOIN ppr_c{i} ON ppr_c{i}.node = nd.entity_name
)"""
        )
    parts.append(f"\nSELECT node, r AS rank FROM ppr_r{iterations}")
    return "".join(parts)


def _label_prop_sql(rounds: int = 4, final: bool = True) -> str:
    """Unrolled min-label propagation over the merge CTE's nodes/edges —
    the exact mirror of stages/graphalgo.min_label_rounds (labels are node
    names; min is binary-collation string min on both engines).  With
    ``final=False`` the chain stays open as CTEs (lp_r{rounds} is the
    label table) for composition (kg_community_stats)."""
    parts = [
        """,
lp_bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id AS u, src_id AS v FROM edges
),
lp_r0 AS (SELECT entity_name AS node, entity_name AS label FROM nodes)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
lp_n{i} AS (
  SELECT b.v AS node, min(r.label) AS nbr
  FROM lp_bid b JOIN lp_r{i - 1} r ON r.node = b.u GROUP BY 1
),
lp_r{i} AS (
  SELECT r.node,
         CASE WHEN n.nbr IS NULL OR r.label <= n.nbr THEN r.label
              ELSE n.nbr END AS label
  FROM lp_r{i - 1} r LEFT JOIN lp_n{i} n ON n.node = r.node
)"""
        )
    if final:
        parts.append(f"\nSELECT node, label FROM lp_r{rounds}")
    return "".join(parts)


def _triangles_sql() -> str:
    """Degree-ordered triangle counting over the merge CTE's edges — the
    exact mirror of stages/graphalgo.triangle_counts (orientation key =
    zero-padded degree || '|' || name; each triangle found once from its
    minimum-key corner, credited to all three)."""
    return """,
tr_bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id AS u, src_id AS v FROM edges
),
tr_deg AS (SELECT u, count(*) AS d FROM tr_bid GROUP BY 1),
tr_key AS (SELECT u, printf('%09d', d) || '|' || u AS okey FROM tr_deg),
tr_or AS (
  SELECT e.src_id AS src, ks.okey AS skey, e.tgt_id AS dst, kt.okey AS dkey
  FROM edges e
  JOIN tr_key ks ON ks.u = e.src_id JOIN tr_key kt ON kt.u = e.tgt_id
  WHERE ks.okey < kt.okey
  UNION ALL
  SELECT e.tgt_id, kt.okey, e.src_id, ks.okey
  FROM edges e
  JOIN tr_key ks ON ks.u = e.src_id JOIN tr_key kt ON kt.u = e.tgt_id
  WHERE kt.okey < ks.okey
),
tr_tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM tr_or e1
  JOIN tr_or e2 ON e2.src = e1.src AND e1.dkey < e2.dkey
  JOIN tr_or e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
tr_corners AS (
  SELECT a AS node FROM tr_tri
  UNION ALL SELECT b FROM tr_tri
  UNION ALL SELECT c FROM tr_tri
)
SELECT node, count(*) AS n_triangles FROM tr_corners GROUP BY 1"""


def _ivf_sql(k: int = 5, n_centroids: int = 16, nprobe: int = 4,
             train_sample: int = 256) -> str:
    """Exact SQL mirror of stages/similarity.py ivf_topk over `embeddings`
    (queries = vec_id < 8, matching the driver query).  The quantizer is
    deterministic given the table: the training sample (train_sample smallest
    vec_ids) and Lloyd iterations run HERE at oracle-build time through the
    SAME `_lloyd` code the Ray path uses, and the resulting centroids + per-
    query probe sets are embedded as literals; SQL then reproduces the data-
    plane half — nearest-centroid cell assignment (euclidean, ties -> lowest
    centroid index, matching np.argmin) and cosine top-k over probed cells."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from mmgraphrag_ray.stages.similarity import _lloyd

    # centroid/probe literals must come from the SAME table the oracle's
    # views will read; the driver contract is sf0.01, checkers at another
    # sf set RAYKG_ORACLE_SF so the mirror stays scale-portable
    sf_dir = os.environ.get("RAYKG_ORACLE_SF", SF001)
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    vecs = tbl.column("embedding").to_pylist()
    order = np.argsort(ids, kind="stable")[:train_sample]
    sample = np.array([vecs[i] for i in order], dtype=np.float64)
    cents = _lloyd(sample, n_centroids)
    qpos = np.flatnonzero(ids < 8)
    qids = ids[qpos]
    qv = np.array([vecs[i] for i in qpos], dtype=np.float64)
    qd = ((qv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd, axis=1)[:, :nprobe]

    cent_rows = ",\n    ".join(
        f"({cid}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for cid, c in enumerate(cents)
    )
    probe_rows = ",\n    ".join(
        f"({int(q)}, {int(cell)})" for q, row in zip(qids, probes) for cell in row
    )
    return f"""
WITH cents(cid, c) AS (VALUES
    {cent_rows}
),
probes(query_vec_id, cell) AS (VALUES
    {probe_rows}
),
emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
assign AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c.c) ASC, c.cid ASC) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
),
cand AS (
  SELECT p.query_vec_id, a.vec_id
  FROM probes p JOIN assign a ON a.cell = p.cell
  WHERE a.vec_id <> p.query_vec_id
),
pairs AS (
  SELECT c.query_vec_id, c.vec_id, list_cosine_similarity(q.v, e.v) AS sim
  FROM cand c
  JOIN emb e ON e.vec_id = c.vec_id
  JOIN emb q ON q.vec_id = c.query_vec_id
),
ranked AS (
  SELECT query_vec_id, vec_id,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY sim DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT CAST(query_vec_id AS BIGINT) AS query_vec_id,
       CAST(rank AS BIGINT) AS rank, vec_id
FROM ranked WHERE rank <= {k}
"""


def _minhash_cc_sql(threshold: float = 0.8) -> str:
    """Exact SQL mirror of stages/dedup.py dedup_minhash over `documents`:
    md5-derived shingle hashes, the same 128 (a,b) permutation constants
    (embedded as literals), banding, candidate pairs, float Jaccard verify,
    and connected components as a recursive transitive closure."""
    from mmgraphrag_ray.stages.dedup import _MERSENNE, _PERM_A, _PERM_B

    perm_rows = ",\n    ".join(
        f"({i}, {int(a)}::UBIGINT, {int(b)}::UBIGINT)"
        for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    return f"""
WITH RECURSIVE perms(pidx, a, b) AS (VALUES
    {perm_rows}
),
words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
shing AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(list_slice(ws, s, s + 2), ' ') AS shingle
    FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(s)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') FROM words WHERE len(ws) BETWEEN 1 AND 2
  )
),
hashes AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS UBIGINT) AS h FROM shing
),
mh AS (
  SELECT doc_id, pidx, min((a * h + b) % {_MERSENNE}) AS v
  FROM hashes CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, pidx // 8 AS band_id,
         substr(md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY pidx)), 1, 16) AS band_hash
  FROM mh GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
counts AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shing sa ON sa.doc_id = c.id_a
  JOIN shing sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN counts ca ON ca.doc_id = c.id_a
  JOIN counts cb ON cb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(i.i, 0)) >= {threshold}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
)
SELECT id, min(r) AS label FROM reach GROUP BY id
"""


def _lsh_recall_sql(threshold: float = 0.8, max_df: int = 64) -> str:
    """Mirror of stages/dedup.py lsh_recall_pairs: the union of the
    df-capped exhaustive candidates (in_exact) and the MinHash-LSH band
    candidates (in_lsh), exact-Jaccard verified at `threshold`."""
    from mmgraphrag_ray.stages.dedup import _MERSENNE, _PERM_A, _PERM_B

    perm_rows = ",\n    ".join(
        f"({i}, {int(a)}::UBIGINT, {int(b)}::UBIGINT)"
        for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    return f"""
WITH perms(pidx, a, b) AS (VALUES
    {perm_rows}
),
words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
shing AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(list_slice(ws, s, s + 2), ' ') AS shingle
    FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(s)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') FROM words WHERE len(ws) BETWEEN 1 AND 2
  )
),
hashes AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS UBIGINT) AS h FROM shing
),
mh AS (
  SELECT doc_id, pidx, min((a * h + b) % {_MERSENNE}) AS v
  FROM hashes CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, pidx // 8 AS band_id,
         substr(md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY pidx)), 1, 16) AS band_hash
  FROM mh GROUP BY 1, 2
),
candl AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
shx AS (SELECT doc_id, substr(md5(shingle), 1, 16) AS sh FROM shing),
dfx AS (SELECT sh, count(DISTINCT doc_id) AS n FROM shx GROUP BY 1),
candx AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM shx a
  JOIN dfx ON dfx.sh = a.sh AND dfx.n <= {max_df}
  JOIN shx b ON b.sh = a.sh AND a.doc_id < b.doc_id
),
cand AS (
  SELECT id_a, id_b,
         max(e) AS in_exact, max(l) AS in_lsh
  FROM (
    SELECT id_a, id_b, 1 AS e, 0 AS l FROM candx
    UNION ALL SELECT id_a, id_b, 0, 1 FROM candl
  ) GROUP BY 1, 2
),
counts AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shing sa ON sa.doc_id = c.id_a
  JOIN shing sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       CAST(c.in_exact AS BIGINT) AS in_exact,
       CAST(c.in_lsh AS BIGINT) AS in_lsh
FROM cand c
JOIN counts ca ON ca.doc_id = c.id_a
JOIN counts cb ON cb.doc_id = c.id_b
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(i.i, 0)) >= {threshold}
"""


def _minhash_cross_sql(threshold: float = 0.8) -> str:
    """Exact SQL mirror of stages/dedup.py minhash_cross_pairs with the
    query's side split (new = doc_id % 5 == 0): same md5 shingle hashes /
    permutation literals / banding as _minhash_cc_sql, candidates
    restricted to new x old, integer shared/total shingle counts out."""
    from mmgraphrag_ray.stages.dedup import _MERSENNE, _PERM_A, _PERM_B

    perm_rows = ",\n    ".join(
        f"({i}, {int(a)}::UBIGINT, {int(b)}::UBIGINT)"
        for i, (a, b) in enumerate(zip(_PERM_A, _PERM_B))
    )
    return f"""
WITH perms(pidx, a, b) AS (VALUES
    {perm_rows}
),
words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
shing AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(list_slice(ws, s, s + 2), ' ') AS shingle
    FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(s)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') FROM words WHERE len(ws) BETWEEN 1 AND 2
  )
),
hashes AS (
  SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 8)) AS UBIGINT) AS h FROM shing
),
mh AS (
  SELECT doc_id, pidx, min((a * h + b) % {_MERSENNE}) AS v
  FROM hashes CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, pidx // 8 AS band_id,
         substr(md5(string_agg(CAST(v AS VARCHAR), '-' ORDER BY pidx)), 1, 16) AS band_hash
  FROM mh GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
  WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
),
counts AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
inter AS (
  SELECT c.new_id, c.old_id, count(*) AS i
  FROM cand c
  JOIN shing sa ON sa.doc_id = c.new_id
  JOIN shing sb ON sb.doc_id = c.old_id AND sa.shingle = sb.shingle
  GROUP BY 1, 2
)
SELECT c.new_id, c.old_id,
       COALESCE(i.i, 0) AS n_shared, ca.n AS n_new, cb.n AS n_old
FROM cand c
JOIN counts ca ON ca.doc_id = c.new_id
JOIN counts cb ON cb.doc_id = c.old_id
LEFT JOIN inter i ON i.new_id = c.new_id AND i.old_id = c.old_id
WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(i.i, 0)) >= {threshold}
"""


def _jaccard_cc_sql(threshold: float = 0.8, max_df: int = 64,
                    final: bool = True) -> str:
    """Exact SQL mirror of stages/dedup.py dedup_jaccard over `documents`:
    shared-shingle blocking (16-hex md5 of the shingle, document-frequency
    cap mirrored from JACCARD_MAX_DF), exact Jaccard verify, recursive-CTE
    connected components.  final=False ends with a ``labels`` CTE instead
    of the final SELECT so downstream mirrors (dedup_keep_best) compose."""
    return f"""
WITH RECURSIVE words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
shing AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(list_slice(ws, s, s + 2), ' ') AS shingle
    FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(s)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') FROM words WHERE len(ws) BETWEEN 1 AND 2
  )
),
sh AS (SELECT doc_id, substr(md5(shingle), 1, 16) AS sh FROM shing),
df AS (SELECT sh, count(DISTINCT doc_id) AS n FROM sh GROUP BY 1),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a
  JOIN df ON df.sh = a.sh AND df.n <= {max_df}
  JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shing sa ON sa.doc_id = c.id_a
  JOIN shing sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN counts ca ON ca.doc_id = c.id_a
  JOIN counts cb ON cb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / (ca.n + cb.n - COALESCE(i.i, 0)) >= {threshold}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION ALL SELECT id_b, id_a FROM verified
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.id
)
""" + (
        "SELECT id, min(r) AS label FROM reach GROUP BY id\n"
        if final
        else ",\nlabels AS (SELECT id, min(r) AS label FROM reach GROUP BY id)\n"
    )


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Exact SQL mirror of stages/dedup.py dedup_simhash: two md5-derived
    32-bit halves, sign-of-sum bits, 4x16-bit chunk candidate buckets, exact
    Hamming verify."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9]+')) AS tok
  FROM documents
),
th AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hi,
         CAST(('0x' || substr(md5(tok || '#'), 1, 8)) AS BIGINT) AS lo
  FROM toks
),
bits AS (
  SELECT doc_id, b,
         sum((CASE WHEN b < 32 THEN (lo >> b) & 1 ELSE (hi >> (b - 32)) & 1 END) * 2 - 1) AS acc
  FROM th CROSS JOIN unnest(generate_series(0, 63)) AS t(b)
  GROUP BY 1, 2
),
sims0 AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 AND b >= 32 THEN 1::BIGINT << (b - 32) ELSE 0 END) AS sim_hi,
         sum(CASE WHEN acc > 0 AND b < 32 THEN 1::BIGINT << b ELSE 0 END) AS sim_lo
  FROM bits GROUP BY 1
),
sims AS (
  SELECT d.doc_id, COALESCE(s.sim_hi, 0) AS sim_hi, COALESCE(s.sim_lo, 0) AS sim_lo
  FROM documents d LEFT JOIN sims0 s USING (doc_id)
),
chunks AS (
  SELECT doc_id, sim_hi, sim_lo, c,
         CASE WHEN c < 2 THEN (sim_lo >> (16 * c)) & 65535
              ELSE (sim_hi >> (16 * (c - 2))) & 65535 END AS chunk_val
  FROM sims CROSS JOIN unnest(generate_series(0, 3)) AS t(c)
)
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       CAST(bit_count(xor(x.sim_hi, y.sim_hi)) + bit_count(xor(x.sim_lo, y.sim_lo)) AS BIGINT) AS hamming
FROM chunks x JOIN chunks y
  ON x.c = y.c AND x.chunk_val = y.chunk_val AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.sim_hi, y.sim_hi)) + bit_count(xor(x.sim_lo, y.sim_lo)) <= {max_hamming}
"""


def _doc_quality_sql() -> str:
    """Mirror of stages/textstats.py QualityScoreStage — identical integer
    counts, identical IEEE expression shape."""
    from mmgraphrag_ray.stages.textstats import _QUALITY_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in _QUALITY_STOPWORDS)
    return f"""
WITH w AS (
  SELECT doc_id, text, regexp_extract_all(text, '[A-Za-z]+') AS ws FROM documents
),
c AS (
  SELECT doc_id,
         len(ws) AS nw,
         len(list_filter(ws, x -> list_contains([{stops}], lower(x)))) AS ns,
         COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS wl,
         len(regexp_extract_all(text, '[A-Za-z0-9]')) AS na,
         length(text) AS nc
  FROM w
),
r AS (
  SELECT doc_id,
         CASE WHEN nw > 0 THEN CAST(ns AS DOUBLE) / nw ELSE 0.0 END AS stopword_ratio,
         CASE WHEN nw > 0 THEN CAST(wl AS DOUBLE) / nw ELSE 0.0 END AS mean_word_len,
         CASE WHEN nc > 0 THEN CAST(na AS DOUBLE) / nc ELSE 0.0 END AS alnum_ratio
  FROM c
)
SELECT doc_id, stopword_ratio, mean_word_len, alnum_ratio,
       stopword_ratio * 0.5 + least(mean_word_len / 10.0, 1.0) * 0.3
         + alnum_ratio * 0.2 AS quality_score
FROM r
"""


def _query_context_sql(query_text: str, top_k: int = 10) -> str:
    """Entities section of build_local_context (query.py:147-206) in exact
    integer arithmetic: the hash embedder's pre-normalization components are
    integers (see kg_entity_vec_components), so the cosine threshold
    cos >= 0.2 becomes dot > 0 AND 25*dot^2 >= e2*q2 and the ranking key
    cos^2 = dot^2/e2 (q-norm constant) — no float embedding math in SQL.
    The query vector's components are computed here (pure Python, no Ray)
    and inlined as a VALUES list."""
    from collections import Counter

    from mmgraphrag_ray.stages.embed import EMBED_DIM, HashEmbedder, _tok_h32

    emb = HashEmbedder()
    comps: Counter = Counter()
    for tok in emb.token_re.findall(query_text.lower()):
        h = _tok_h32(tok)
        comps[h % EMBED_DIM] += 1 if (h >> 16) & 1 else -1
    comps = {d: c for d, c in comps.items() if c != 0}
    q2 = sum(c * c for c in comps.values())
    values = ", ".join(f"({d}, {c})" for d, c in sorted(comps.items()))
    return f""",
qc(dim_idx, qcomp) AS (VALUES {values}),
vtok AS (
  SELECT entity_name,
         unnest(regexp_extract_all(lower(entity_name || description),
                                   '[a-z_]+|[0-9]+')) AS tok
  FROM nodes
),
ec AS (
  SELECT entity_name, CAST(hv % {EMBED_DIM} AS BIGINT) AS dim_idx,
         SUM(CASE WHEN (hv // 65536) % 2 = 1 THEN 1 ELSE -1 END) AS component
  FROM (SELECT entity_name,
               CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS hv
        FROM vtok)
  GROUP BY 1, 2
),
enorm AS (SELECT entity_name, SUM(component * component) AS e2 FROM ec GROUP BY 1),
dotp AS (
  SELECT ec.entity_name, SUM(ec.component * qc.qcomp) AS dot
  FROM ec JOIN qc ON ec.dim_idx = qc.dim_idx GROUP BY 1
),
kept AS (
  SELECT d.entity_name
  FROM dotp d JOIN enorm e ON d.entity_name = e.entity_name
  WHERE d.dot > 0 AND 25 * d.dot * d.dot >= e.e2 * {q2}
  ORDER BY CAST(d.dot * d.dot AS DOUBLE) / e.e2 DESC, d.entity_name ASC
  LIMIT {top_k}
),
deg AS (
  SELECT entity_name, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT src_id AS entity_name FROM edges
    UNION ALL SELECT tgt_id FROM edges
  ) GROUP BY 1
)
SELECT n.entity_name, n.entity_type, n.description, n.source_id,
       COALESCE(deg.degree, 0) AS "rank"
FROM kept k
JOIN nodes n ON n.entity_name = k.entity_name
LEFT JOIN deg ON deg.entity_name = n.entity_name
"""


def _corpus(sf_dir: str) -> str:
    from mmgraphrag_ray.corpus import ensure_corpus

    return ensure_corpus(sf_dir)


def _sf_of(sf_dir: str) -> float:
    import os

    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


# --------------------------------------------------------------------------
# driver API
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: KG construction over the sf0.001 corpus; returns nodes."""
    from mmgraphrag_ray.runtime import configure

    configure()
    nodes, _edges = _build_graph_cached("/root/testdata/sf0.001")
    return nodes


_GRAPH_CACHE: dict = {}


def _mentions_cached(sf_dir: str):
    """Materialized mentions per sf_dir — the expensive upstream shared by
    every kg_* query the driver runs in one session."""
    key = ("mentions", sf_dir)
    if key not in _GRAPH_CACHE:
        from mmgraphrag_ray.pipelines.kg import build_mentions

        _GRAPH_CACHE[key] = build_mentions(_corpus(sf_dir)).materialize()
    return _GRAPH_CACHE[key]


def _build_graph_cached(sf_dir: str):
    key = ("graph", sf_dir)
    if key not in _GRAPH_CACHE:
        from mmgraphrag_ray.pipelines.kg import build_graph

        nodes, edges = build_graph(_corpus(sf_dir), mentions_ds=_mentions_cached(sf_dir))
        _GRAPH_CACHE[key] = (nodes.materialize(), edges.materialize())
    return _GRAPH_CACHE[key]


def queries() -> dict[str, Callable[[str], Any]]:
    import numpy as np
    import ray.data

    from mmgraphrag_ray.arrowutil import df_to_table as _dtt
    from mmgraphrag_ray.runtime import configure

    configure()

    from mmgraphrag_ray.pipelines import relational
    from mmgraphrag_ray.pipelines.kg import build_chunks, build_mentions
    from mmgraphrag_ray.sources.files import read_files
    from mmgraphrag_ray.stages.dedup import dedup_exact
    from mmgraphrag_ray.stages.extract import split_mentions
    from mmgraphrag_ray.stages.similarity import brute_topk
    from mmgraphrag_ray.stages.textstats import doc_fingerprints, doc_text_stats

    def kg_files(sf_dir):
        files = read_files(_corpus(sf_dir))
        return dedup_exact(
            files, key="content_sha256", order_by=["repo", "path", "commit"]
        )

    def kg_chunks(sf_dir):
        return build_chunks(_corpus(sf_dir))

    def kg_mentions(sf_dir):
        ent, _ = split_mentions(_mentions_cached(sf_dir))
        return ent

    def kg_rel_mentions(sf_dir):
        _, rel = split_mentions(_mentions_cached(sf_dir))
        return rel

    def kg_nodes(sf_dir):
        nodes, _ = _build_graph_cached(sf_dir)
        return nodes

    def _canonical(sf_dir):
        from mmgraphrag_ray.stages.linking import canonicalize_graph

        key = ("canonical", sf_dir)
        if key not in _GRAPH_CACHE:
            ent, _ = split_mentions(_mentions_cached(sf_dir))
            nodes, edges = _build_graph_cached(sf_dir)
            _GRAPH_CACHE[key] = canonicalize_graph(nodes, edges, ent)
        return _GRAPH_CACHE[key]

    def kg_canonical_nodes(sf_dir):
        # fusion math (eigendecomposition + DBSCAN) is not SQL-expressible:
        # rows-only check; semantics covered by tests/test_linking.py
        return _canonical(sf_dir)[0]

    def kg_alias_table(sf_dir):
        return _canonical(sf_dir)[2]

    def kg_canonicalization_invariants(sf_dir):
        # VALUE oracle for the two rows-only fusion outputs: the spectral+
        # DBSCAN math is not SQL-expressible, but its STRUCTURAL contract
        # is — every violation count below must be exactly 0, and the SQL
        # mirror asserts those constants, so the driver sample can no
        # longer silently regress kg_canonical_nodes / kg_alias_table.
        #   members_not_in_nodes  — alias members ⊆ original node names
        #   canonicals_not_in_nodes — canonicals are real nodes too
        #   canonical_in_members  — a canonical never appears as a member
        #   members_in_canonical  — members are contracted away
        #   size_mismatch         — |canonical| = |nodes| − |distinct members|
        import pandas as pd

        from mmgraphrag_ray.stages.join import bucketed_join

        nodes, _ = _build_graph_cached(sf_dir)
        cnodes, _ce, alias, _cl = _canonical(sf_dir)
        alias = alias.materialize()

        def names_of(ds, col):
            return ds.map_batches(
                lambda b, c=col: pd.DataFrame(
                    {"name": b[c].astype(object)} if len(b)
                    else {"name": pd.Series(dtype=object)}),
                batch_format="pandas",
            )

        def mark(ds, colname):
            return ds.map_batches(
                lambda b, c=colname: (
                    b.assign(**{c: pd.Series([1] * len(b), dtype="int64",
                                             index=b.index)})
                    if len(b) else b.assign(**{c: pd.Series(dtype="int64")})),
                batch_format="pandas",
            )

        def n_missing(probe, target_marked, marker):
            j = bucketed_join(probe, target_marked, on="name", how="left")
            return int(j.map_batches(
                lambda b, m=marker: pd.DataFrame(
                    {"miss": [int(b[m].isna().sum())]}),
                batch_format="pandas",
            ).sum("miss") or 0)

        node_names = mark(names_of(nodes, "entity_name")
                          .groupby("name").count()
                          .drop_columns(["count()"]), "_in_nodes").materialize()
        cnode_names = mark(names_of(cnodes, "entity_name")
                           .groupby("name").count()
                           .drop_columns(["count()"]), "_in_cn").materialize()
        members = names_of(alias, "member_name").materialize()
        canons = (names_of(alias, "canonical_name")
                  .groupby("name").count().drop_columns(["count()"])
                  .materialize())

        members_not_in_nodes = n_missing(members, node_names, "_in_nodes")
        canonicals_not_in_nodes = n_missing(canons, node_names, "_in_nodes")
        # canonical ∩ member = rows of canons NOT missing from members set
        member_marked = mark(
            members.groupby("name").count().drop_columns(["count()"]),
            "_in_m").materialize()
        canonical_in_members = canons.count() - n_missing(
            canons, member_marked, "_in_m")
        members_in_canonical = members.count() - n_missing(
            members, cnode_names, "_in_cn")
        n_distinct_members = member_marked.count()
        size_mismatch = abs(
            cnodes.count() - (nodes.count() - n_distinct_members))

        return pd.DataFrame({
            "invariant": ["members_not_in_nodes", "canonicals_not_in_nodes",
                          "canonical_in_members", "members_in_canonical",
                          "size_mismatch"],
            "violations": pd.Series(
                [members_not_in_nodes, canonicals_not_in_nodes,
                 canonical_in_members, members_in_canonical, size_mismatch],
                dtype="int64"),
        })

    def kg_entity_vecs(sf_dir):
        from mmgraphrag_ray.stages.embed import build_entity_vecs

        nodes, _ = _build_graph_cached(sf_dir)
        return build_entity_vecs(nodes)

    def kg_entity_vec_components(sf_dir):
        # integer-exact sparse pre-norm form of kg_entity_vecs (T3/A6):
        # the float list column can't value-compare, these components can
        from mmgraphrag_ray.stages.embed import entity_vec_components

        nodes, _ = _build_graph_cached(sf_dir)
        return entity_vec_components(nodes)

    def kg_entity_vecs_invariants(sf_dir):
        # structural value oracle for the FLOAT kg_entity_vecs table (the
        # rows-only driver output): unit-norm within 100 ppm wherever any
        # integer component is nonzero, exact zero/nonzero pattern match,
        # and sign(v[dim]) == sign(component) for every component row —
        # all integer counts the DuckDB mirror recomputes from the
        # kg_entity_vec_components SQL
        from mmgraphrag_ray.stages.embed import (
            build_entity_vecs,
            entity_vec_components,
            vec_component_invariants,
        )

        nodes, _ = _build_graph_cached(sf_dir)
        return vec_component_invariants(
            build_entity_vecs(nodes), entity_vec_components(nodes),
            "entity_id",
        )

    def kg_edges(sf_dir):
        _, edges = _build_graph_cached(sf_dir)
        return edges

    def dedup_exact_documents(sf_dir):
        import hashlib

        import pyarrow as pa

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")

        def add_hash(batch: pa.Table) -> pa.Table:
            md5s = [
                hashlib.md5(t.encode()).hexdigest()
                for t in batch.column("text").to_pylist()
            ]
            return batch.append_column("text_md5", pa.array(md5s, pa.string()))

        hashed = docs.map_batches(add_hash, batch_format="pyarrow")
        # broadcast variant: only (text_md5, doc_id) shuffles/collects, the
        # document payload never moves (same survivor rule as dedup_exact)
        from mmgraphrag_ray.stages.dedup import dedup_exact_broadcast

        return dedup_exact_broadcast(
            hashed.materialize(), key="text_md5", order_by=["doc_id"]
        )

    def dedup_minhash_cluster_sizes(sf_dir):
        # near-dup component-size histogram on top of the MinHash labels:
        # how much of the corpus sits in how-big duplicate clusters (the
        # dedup-savings report a curation run starts from)
        from mmgraphrag_ray.stages.dedup import dedup_minhash
        from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        labels = dedup_minhash(docs, threshold=0.8)
        sizes = bucketed_groupby_agg(
            labels, keys=["label"], aggs={"sz": (None, "count")}
        ).materialize()
        return bucketed_groupby_agg(
            sizes, keys=["sz"], aggs={"n_clusters": (None, "count")}
        ).map_batches(
            lambda b: b.rename(columns={"sz": "cluster_size"}),
            batch_format="pandas",
        )

    def dedup_minhash_documents(sf_dir):
        from mmgraphrag_ray.stages.dedup import dedup_minhash

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dedup_minhash(docs, threshold=0.8)

    def doc_leakage_safe_split(sf_dir):
        # leakage-safe train/val split: the split key is the minhash
        # near-dup COMPONENT label, so near-duplicates co-assign; md5
        # bucketing keeps the assignment SQL-mirrorable end to end
        from mmgraphrag_ray.stages.dedup import dedup_minhash
        from mmgraphrag_ray.stages.select import leakage_safe_split

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return leakage_safe_split(dedup_minhash(docs, threshold=0.8))

    def dedup_jaccard_documents(sf_dir):
        from mmgraphrag_ray.stages.dedup import dedup_jaccard

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dedup_jaccard(docs, threshold=0.8)

    def dedup_minhash_recall_q(sf_dir):
        # LSH acceptance eval: exact-verified near-dup pairs from the
        # exhaustive blocking vs the MinHash band candidates — in_lsh=0
        # rows are banding false negatives
        from mmgraphrag_ray.stages.dedup import lsh_recall_pairs

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return lsh_recall_pairs(docs, threshold=0.8)

    def code_unused_defs_q(sf_dir):
        # dead-symbol scan: per repo, def names whose only call-shaped
        # appearances are their own def lines (n_callsites == n_defs)
        from mmgraphrag_ray.stages.codegraph import unused_defs

        files = ray.data.read_parquet(_corpus(sf_dir),
                                      columns=["repo", "content"])
        return unused_defs(files)

    def doc_containment_q(sf_dir):
        # Broder containment (asymmetric |A∩B|/|A| in integer ppm): the
        # sub/superset near-dup detector Jaccard misses; same shingle
        # blocking + join-based text fetch, both directions scored
        from mmgraphrag_ray.stages.dedup import containment_pairs

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return containment_pairs(docs, threshold_ppm=800_000)

    def dedup_simhash_documents(sf_dir):
        from mmgraphrag_ray.stages.dedup import dedup_simhash

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dedup_simhash(docs, max_hamming=3)

    def embedding_near_dup_pairs(sf_dir):
        # the synthetic embeddings have max true cosine ~0.51, so the raw
        # table yields zero pairs at 0.95 (verified).  To positively
        # exercise the operator, plant deterministic near-dups: scaled
        # copies of vec_id < 8 (cosine is scale-invariant -> exact pairs
        # (i, i+1_000_000) must come back).
        import pyarrow as pa

        from mmgraphrag_ray.stages.dedup import embedding_near_dup

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

        def planted(batch: pa.Table) -> pa.Table:
            import numpy as np

            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            keep = ids < 8
            vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)[keep]
            return pa.table(
                {
                    "vec_id": pa.array((ids[keep] + 1_000_000).tolist(), pa.int64()),
                    "embedding": pa.array((vecs * 1.5).tolist(), pa.list_(pa.float32())),
                    "label": pa.array([-1] * int(keep.sum()), pa.int32()),
                }
            )

        dup = emb.map_batches(planted, batch_format="pyarrow")
        # drop the float similarity so the value-hash compare vs the SQL
        # oracle is engine-exact (pair identity is the contract; numpy and
        # DuckDB sum float dot-products in different orders)
        return embedding_near_dup(emb.union(dup), threshold=0.95).drop_columns(
            ["cosine"]
        )

    def distinct_lang_source(sf_dir):
        # distinct-values operator (ds.unique analog) via the bucketed
        # groupby pattern: shuffle only the key columns
        from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source"]
        )
        return bucketed_groupby_agg(
            docs, keys=["lang", "source"], aggs={"n_docs": (None, "count")}
        )

    def doc_stats(sf_dir):
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_text_stats(docs)

    def token_count_by_lang(sf_dir):
        import pyarrow as pa

        from mmgraphrag_ray.tokenizer import encode

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )

        def toks(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": batch.column("lang"),
                    "n_tokens": pa.array(
                        [len(encode(t)) for t in batch.column("text").to_pylist()],
                        pa.int64(),
                    ),
                }
            )

        from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg

        return bucketed_groupby_agg(
            docs.map_batches(toks, batch_format="pyarrow"),
            keys=["lang"],
            aggs={"total_tokens": ("n_tokens", "sum"), "n_docs": (None, "count")},
        )

    def doc_quality(sf_dir):
        from mmgraphrag_ray.stages.textstats import doc_quality_scores

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_quality_scores(docs)

    def doc_fingerprint(sf_dir):
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_fingerprints(docs)

    def doc_topk_ngrams(sf_dir):
        from mmgraphrag_ray.stages.textstats import doc_topk_ngrams as topk

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text"]
        )
        return topk(docs, n=2, k=20)

    def doc_lang_id_q(sf_dir):
        from mmgraphrag_ray.stages.textstats import doc_lang_id

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_lang_id(docs)

    # media fixture size is sf-independent (synthetic corpus, no external
    # data): the decode/feature oracles mirror the generator formulas over
    # range(300) so the same SQL holds at every sf
    MEDIA_N = 300

    def media_decode(sf_dir):
        from mmgraphrag_ray.stages.multimodal import decode_media, synth_media_table

        return decode_media(ray.data.from_arrow(synth_media_table(MEDIA_N)))

    def media_frame_sample(sf_dir):
        # frame-sample flat-map layout (multimodal.py sample_frames): videos
        # emit every-4th frame, images/audio pass through as frame 0 — the
        # payload header is decoded on the Ray side, the oracle mirrors the
        # generator formula, so the roundtrip is value-checked
        from mmgraphrag_ray.stages.multimodal import sample_frames, synth_media_table

        return sample_frames(ray.data.from_arrow(synth_media_table(MEDIA_N)))

    def media_resize(sf_dir):
        # actor-pool resize seam: halved dims + checksum of the 2x-strided
        # body (hex-md5 so the DuckDB mirror hashes the same string)
        from mmgraphrag_ray.stages.multimodal import resize_media, synth_media_table

        return resize_media(ray.data.from_arrow(synth_media_table(MEDIA_N)))

    def media_feature_vecs(sf_dir):
        from mmgraphrag_ray.stages.multimodal import media_features, synth_media_table

        return media_features(ray.data.from_arrow(synth_media_table(MEDIA_N)))

    def media_feature_components(sf_dir):
        from mmgraphrag_ray.stages.multimodal import (
            media_feature_components as mfc,
            synth_media_table,
        )

        return mfc(ray.data.from_arrow(synth_media_table(MEDIA_N)))

    def media_feature_vecs_invariants(sf_dir):
        # structural value oracle for the FLOAT media_feature_vecs table
        # (same contract as kg_entity_vecs_invariants, over the
        # media_feature_components integer mirror)
        from mmgraphrag_ray.stages.embed import vec_component_invariants
        from mmgraphrag_ray.stages.multimodal import (
            media_feature_components as mfc,
            media_features,
            synth_media_table,
        )

        media = ray.data.from_arrow(synth_media_table(MEDIA_N))
        return vec_component_invariants(
            media_features(media), mfc(media), "media_id", vec_col="feature",
        )

    def dedup_cut_spans(sf_dir):
        # ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2021): cut
        # every token covered by an 8-token window occurring in >= 2 docs;
        # the oracle recomputes the cut AND the cleaned-text md5 in SQL, so
        # the span semantics (not just counts) are value-verified
        from mmgraphrag_ray.stages.dedup import cut_dup_spans

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return cut_dup_spans(docs, win=8)

    def media_ppm_resize(sf_dir):
        # REAL image decode + resize (T4 image half): binary PPM header
        # parse + 2x2 box-filter downsample over real pixel buffers; the
        # oracle reconstructs the downsampled bytes and their md5 purely
        # from the generator pixel formula
        from mmgraphrag_ray.stages.multimodal import resize_ppm_media, synth_ppm_table

        return resize_ppm_media(ray.data.from_arrow(synth_ppm_table(MEDIA_N)))

    def media_wav_decode(sf_dir):
        # REAL RIFF/WAVE decode (T4 upgrade): genuine container chunk walk
        # + fmt unpack + PCM extraction over synthesized real WAV files
        # (multimodal.py make_wav_payload; cross-checked against the stdlib
        # `wave` module in tests).  The oracle reproduces every field AND
        # the PCM md5 purely from the generator formulas, so a green check
        # proves the decoder parsed the container rather than echoing
        # stored metadata.
        from mmgraphrag_ray.stages.multimodal import decode_wav_media, synth_wav_table

        return decode_wav_media(ray.data.from_arrow(synth_wav_table(MEDIA_N)))

    def media_png_decode(sf_dir):
        # REAL PNG decode (the last reachable half of the T4 boundary):
        # chunk walk with CRC-32 verification, multi-IDAT zlib inflate, and
        # per-scanline filter reconstruction (rows cycle through all five
        # PNG filter types incl. Paeth — multimodal.py make_png_payload).
        # The oracle recomputes the DECODED pixels and their md5 purely
        # from the generator pixel formula, while the wire bytes are
        # filtered + deflated — a green check proves inflate + unfilter
        # actually ran.
        from mmgraphrag_ray.stages.multimodal import decode_png_media, synth_png_table

        return decode_png_media(ray.data.from_arrow(synth_png_table(MEDIA_N)))

    def media_jpeg_decode(sf_dir):
        # REAL baseline-JPEG decode (T4 complete): marker walk (DQT/DHT/
        # SOF0/DRI/SOS), canonical Huffman entropy decode with byte
        # un-stuffing and restart-marker predictor resets, dequantize +
        # dezigzag + float 2-D IDCT + YCbCr->RGB (multimodal.py
        # decode_jpeg; reference preprocessing.py:265-297 handles real
        # JPEGs).  The corpus uses per-8x8-block constant colors, so with
        # q_DC = 8 the quantize->IDCT chain is integer-exact and the
        # oracle recomputes the DECODED pixels from the block formula
        # while the wire bytes are Huffman-coded DC differentials.
        from mmgraphrag_ray.stages.multimodal import (
            decode_jpeg_media,
            synth_jpeg_table,
        )

        return decode_jpeg_media(ray.data.from_arrow(synth_jpeg_table(MEDIA_N)))

    def media_jpeg_resize(sf_dir):
        # REAL decode->transform chain for JPEG: full baseline decode then
        # the 2x2 box-filter downsample (floor mean; the PPM resizer's
        # kernel).  The corpus' constant 8x8 blocks make every 2x2 box
        # single-valued, so the oracle mirrors the resized pixels from the
        # block formula at halved resolution.
        from mmgraphrag_ray.stages.multimodal import (
            resize_jpeg_media,
            synth_jpeg_table,
        )

        return resize_jpeg_media(ray.data.from_arrow(synth_jpeg_table(MEDIA_N)))

    def kg_mm_answer(sf_dir):
        # ORI_IMG multimodal answer path (reference query.py:414-469) with
        # deterministic model seams over a media KV derived from documents
        # (payload = utf-8 text bytes, so the base64/md5 chain has an exact
        # SQL mirror).  "Retrieval" = the 3 smallest doc_ids, standing in
        # for similarity order.
        import hashlib

        import pandas as pd
        import pyarrow as pa

        from mmgraphrag_ray.query import multimodal_answer_merge

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

        def to_media(batch: pa.Table) -> pa.Table:
            ids = [str(i) for i in batch.column("doc_id").to_pylist()]
            texts = batch.column("text").to_pylist()
            return pa.table(
                {
                    "entity_name": pa.array(ids, pa.string()),
                    "payload": pa.array([t.encode() for t in texts], pa.binary()),
                    "caption": pa.array([f"cap {i}" for i in ids], pa.string()),
                    "footnote": pa.array([f"fn {i}" for i in ids], pa.string()),
                }
            )

        media = docs.map_batches(to_media, batch_format="pyarrow")
        # distributed partial min-k per batch, tiny driver reduce (same
        # pattern as entity_topk — no sort of the corpus)
        def min3(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            idx = pc.array_sort_indices(batch.column("doc_id"))[:3]
            return batch.take(idx)

        sel = [
            str(i)
            for i in sorted(
                docs.select_columns(["doc_id"])
                .map_batches(min3, batch_format="pyarrow")
                .to_pandas()["doc_id"]
            )[:3]
        ]
        entities = pd.DataFrame(
            {"entity_name": sel, "entity_type": ['"ORI_IMG"'] * len(sel)}
        )
        ctx = {"entities": entities, "entities_csv": "ctx"}

        def mm_fn(q, payload_b64, information, context):
            return "mm:" + hashlib.md5(payload_b64.encode()).hexdigest()

        out = multimodal_answer_merge(
            "which module defines the shared helper functions",
            ctx,
            media,
            answer_fn=lambda q, c: "text-answer",
            mm_answer_fn=mm_fn,
        )
        return pd.DataFrame(
            {"mm_entity": out["mm_entities"], "mm_response": out["mm_responses"]}
        )

    def kg_query_context(sf_dir):
        from mmgraphrag_ray.pipelines.kg import build_chunks
        from mmgraphrag_ray.query import build_local_context
        from mmgraphrag_ray.stages.embed import build_entity_vecs

        nodes, edges = _build_graph_cached(sf_dir)
        chunks = build_chunks(_corpus(sf_dir)).materialize()
        vecs = build_entity_vecs(nodes).materialize()
        ctx = build_local_context(
            "parse function for the config module", nodes, edges, chunks, vecs
        )
        return ctx["entities"]

    def kg_enhanced_nodes(sf_dir):
        # F6 entity enhancement with a DETERMINISTIC enhancer over an empty
        # alias table: every '"UNKNOWN"' node (the unaligned-entity analog)
        # is renamed <NAME>_R with a fixed rewritten description, then the
        # graph re-merges through the contraction — fully SQL-mirrorable
        import pandas as pd

        from mmgraphrag_ray.stages.linking import enhance_unaligned_entities

        nodes, edges = _build_graph_cached(sf_dir)
        empty_alias = pd.DataFrame(
            {"member_name": pd.Series(dtype=str), "canonical_name": pd.Series(dtype=str)}
        )

        def enhancer(name, desc):
            return name[:-1] + '_R"', '"Enhanced: unresolved reference."'

        n2, _e2, _rw = enhance_unaligned_entities(nodes, edges, empty_alias, enhancer)
        return n2

    def kg_node_degrees(sf_dir):
        # the degree table that ranks entities/edges in the local-query
        # context (reference storage.py:451-460) — value-oracled on its own
        # since the cosine top-k half of the query path is not
        # SQL-expressible (feature-hash embedder)
        from mmgraphrag_ray.query import node_degrees

        _, edges = _build_graph_cached(sf_dir)
        return node_degrees(edges)

    def kg_pagerank(sf_dir):
        # iterative graph algorithm over the constructed KG: 3 integer
        # power-iteration steps (stages/graphalgo.py) — integer sums are
        # shuffle-order-independent, so the ranks are bit-deterministic
        # and exactly SQL-mirrorable (unrolled iterations in the oracle)
        from mmgraphrag_ray.stages.graphalgo import pagerank_int

        nodes, edges = _build_graph_cached(sf_dir)
        ranks = pagerank_int(nodes, edges, iterations=3)
        return ranks.map_batches(
            lambda b: b.rename(columns={"r": "rank"}), batch_format="pandas"
        )

    def kg_label_prop(sf_dir):
        # K=4 rounds of min-label propagation over the KG — the fixed-round
        # form of distributed connected components; labels are node-name
        # strings (bytewise min, identical in pandas + DuckDB binary
        # collation), oracled via 4 unrolled SQL iterations
        from mmgraphrag_ray.stages.graphalgo import min_label_rounds

        nodes, edges = _build_graph_cached(sf_dir)
        return min_label_rounds(nodes, edges, rounds=4)

    def kg_community_stats(sf_dir):
        # per-community size / internal edges / degree sum over the
        # 4-round label-prop partition (all-integer modularity inputs)
        from mmgraphrag_ray.stages.graphalgo import community_stats

        nodes, edges = _build_graph_cached(sf_dir)
        return community_stats(nodes, edges, rounds=4)

    def kg_conductance_q(sf_dir):
        # per-community cut quality (integer ppm) over the same 4-round
        # label-prop partition — composes on community_stats' reduces
        from mmgraphrag_ray.stages.graphalgo import conductance_int

        nodes, edges = _build_graph_cached(sf_dir)
        return conductance_int(nodes, edges, rounds=4)

    def kg_incremental_edges_q(sf_dir):
        # incremental == batch, VALUE-checked: build the graph on the
        # first 3/4 of the corpus, upsert the rest via update_graph
        # (the reference's operating mode), and emit the exactly-additive
        # edge columns (src, tgt, weight, order).  The oracle is the
        # one-shot batch mirror's edges projection — the merge algebra's
        # additivity makes the two runs bit-equal on these columns
        # (pipelines/kg.update_graph docstring; cross-slice duplicate
        # docs are pre-filtered by content, the anti-join J7 the caller
        # owns — stages/join.broadcast_semi_join(anti=True) at scale).
        import os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from mmgraphrag_ray.corpus import (CORPUS_VERSION,
                                           generate_files_table,
                                           n_files_for_sf)
        from mmgraphrag_ray.pipelines.kg import build_graph, update_graph

        sfname = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/raykg_incr_gate/{sfname}_v{CORPUS_VERSION}"
        base_dir, new_dir = f"{root}/base", f"{root}/new"
        marker = f"{root}/.complete"
        if not os.path.exists(marker):
            table = generate_files_table(n_files_for_sf(sf_dir))
            cut = (table.num_rows * 3) // 4
            base_t = table.slice(0, cut)
            new_t = table.slice(cut)
            seen = set(base_t.column("content").to_pylist())
            keep = [i for i, c in enumerate(new_t.column("content").to_pylist())
                    if c not in seen]
            new_t = new_t.take(_pa.array(keep, _pa.int64()))
            for d, t in ((base_dir, base_t), (new_dir, new_t)):
                os.makedirs(d, exist_ok=True)
                _pq.write_table(t, os.path.join(d, "files.parquet"),
                                row_group_size=2000)
            with open(marker, "w") as f:
                f.write("ok")
        base_nodes, base_edges = build_graph(base_dir)
        _, inc_edges = update_graph(
            new_dir, base_nodes.materialize(), base_edges.materialize())
        return inc_edges.map_batches(
            lambda b: b[["src_id", "tgt_id", "weight", "order"]],
            batch_format="pandas",
        )

    def kg_triangles(sf_dir):
        # per-node triangle participation via degree-ordered orientation
        # (hub-safe wedge enumeration; stages/graphalgo.py)
        from mmgraphrag_ray.stages.graphalgo import triangle_counts

        nodes, edges = _build_graph_cached(sf_dir)
        return triangle_counts(nodes, edges)

    def dedup_incremental_minhash_q(sf_dir):
        # ingest gate: new shard (doc_id %% 5 == 0) vs indexed corpus —
        # verified cross-side MinHash pairs with integer shingle counts
        from mmgraphrag_ray.stages.dedup import minhash_cross_pairs

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        new = docs.map_batches(lambda b: b[b["doc_id"] % 5 == 0],
                               batch_format="pandas")
        old = docs.map_batches(lambda b: b[b["doc_id"] % 5 != 0],
                               batch_format="pandas")
        return minhash_cross_pairs(new, old, threshold=0.8)

    def doc_dup_passages_q(sf_dir):
        # token-window exact substring dedup signal (Lee et al.): per-doc
        # duplicated 8-token-window counts (stages/dedup.py dup_passages)
        from mmgraphrag_ray.stages.dedup import dup_passages

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return dup_passages(docs, win=8)

    def doc_skipgrams_q(sf_dir):
        # word2vec/GloVe co-occurrence build: top-30 ordered token pairs
        # at position distance 1..3 (stages/index.py skipgram_topk)
        from mmgraphrag_ray.stages.index import skipgram_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return skipgram_topk(docs, window=3, k=30, min_count=2)

    def doc_mixture_q(sf_dir):
        # largest-remainder mixture: 100 rows across sources weighted
        # (suffix % 5) + 1, each source's quota = its smallest doc_ids
        import re as _re

        from mmgraphrag_ray.stages.sample import mixture_allocate

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "source"])
        srcs = sorted({
            r["source"]
            for r in docs.map_batches(
                lambda b: b[["source"]].drop_duplicates(),
                batch_format="pandas",
            ).take_all()
        })
        weights = {
            s: (int(_re.search(r"[0-9]+", s).group()) % 5) + 1 for s in srcs
        }
        return mixture_allocate(docs, weights, total=100)

    def kg_kcore(sf_dir):
        # 3-round k=2 core peel over the KG (fixed rounds -> SQL-unrollable)
        from mmgraphrag_ray.stages.graphalgo import k_core_peel

        _, edges = _build_graph_cached(sf_dir)
        return k_core_peel(edges, k=2, rounds=3)

    def kg_sorted_neighborhood(sf_dir):
        # ER blocking: candidate entity pairs within 3 positions of the
        # global entity_name order (stages/blocking.py)
        from mmgraphrag_ray.stages.blocking import sorted_neighborhood_pairs

        nodes, _ = _build_graph_cached(sf_dir)
        return sorted_neighborhood_pairs(
            nodes, key_col="entity_name", id_col="entity_name", window=3
        )

    def kg_fuzzy_name_pairs(sf_dir):
        # merge/purge: sorted-neighborhood candidates verified by exact
        # edit distance <= 2 (stages/blocking.py fuzzy_key_pairs)
        from mmgraphrag_ray.stages.blocking import fuzzy_key_pairs

        nodes, _ = _build_graph_cached(sf_dir)
        return fuzzy_key_pairs(
            nodes, key_col="entity_name", id_col="entity_name",
            window=3, max_edit=2,
        )

    def kg_entity_resolution(sf_dir):
        # end-to-end ER composition: sorted-neighborhood blocking ->
        # Levenshtein-verified pairs -> distributed min-label connected
        # components -> canonical clusters (rep = min member name);
        # singleton entities drop (they resolved to themselves)
        from mmgraphrag_ray.stages.blocking import fuzzy_key_pairs
        from mmgraphrag_ray.stages.dedup import connected_components
        from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg

        nodes, _ = _build_graph_cached(sf_dir)
        pairs = fuzzy_key_pairs(
            nodes, key_col="entity_name", id_col="entity_name",
            window=3, max_edit=2,
        ).map_batches(
            lambda b: b[["ida", "idb"]].rename(
                columns={"ida": "id_a", "idb": "id_b"}),
            batch_format="pandas",
        )
        labels = connected_components(pairs, nodes, id_col="entity_name")
        clusters = bucketed_groupby_agg(
            labels, keys=["label"],
            aggs={"n_members": (None, "count"),
                  "max_member": ("id", "max")},
        )
        return clusters.map_batches(
            lambda b: b[b["n_members"] >= 2].rename(
                columns={"label": "rep"}),
            batch_format="pandas",
        )

    def kg_entity_pmi(sf_dir):
        # top-20 co-occurring entity pairs by the integer PMI surrogate
        # (log-free p(x,y)/(p(x)p(y)) over mention chunks; graphalgo.py)
        from mmgraphrag_ray.stages.graphalgo import entity_cooccurrence_pmi

        ent, _ = split_mentions(_mentions_cached(sf_dir))
        return entity_cooccurrence_pmi(ent, k=20, min_pairs=2)

    def token_postings_q(sf_dir):
        # inverted-index build: token -> df + capped sorted posting list
        from mmgraphrag_ray.stages.index import token_postings

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return token_postings(docs, min_df=2)

    def doc_tfidf_topk_q(sf_dir):
        # top-3 terms per doc by integer tf-idf surrogate tf*1e6//df
        from mmgraphrag_ray.stages.index import doc_tfidf_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return doc_tfidf_topk(docs, k=3)

    # shared by doc_bm25_topk / doc_rrf_fusion and their SQL oracles
    BM25_QUERIES = {
        "q_hash": "hash join batch",
        "q_stream": "window stream spark",
        "q_vec": "vector filter",
    }

    def doc_bm25_topk_q(sf_dir):
        # Okapi BM25 (k1=6/5, b=3/4 as rationals) integer surrogate,
        # top-10 docs per query — see stages/retrieval.py docstring
        from mmgraphrag_ray.stages.retrieval import bm25_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return bm25_topk(docs, BM25_QUERIES, k=10)

    def doc_curated_bm25_q(sf_dir):
        # search-the-clean-corpus composition: curation verdict gates the
        # document set, BM25 ranks only survivors (one bucketed semi-join)
        from mmgraphrag_ray.stages.join import bucketed_join
        from mmgraphrag_ray.stages.retrieval import bm25_topk

        flags = relational.doc_curation(sf_dir)
        kept_ids = flags.map_batches(
            lambda b: b[b["keep"] == 1][["doc_id"]], batch_format="pandas"
        ).materialize()
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        kept = bucketed_join(docs, kept_ids, on="doc_id",
                             small_side="right")
        return bm25_topk(kept, BM25_QUERIES, k=10)

    def doc_mmr_topk_q(sf_dir):
        # Maximal Marginal Relevance diversified top-5 per query: greedy
        # argmax(bm25 − 50000·max shared-distinct-terms with selected),
        # bounded O(q·n²) work over the top-20 BM25 candidate set
        from mmgraphrag_ray.stages.retrieval import mmr_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return mmr_topk(docs, BM25_QUERIES, k=5, n_candidates=20)

    def doc_lang_confusion_q(sf_dir):
        # classifier-eval confusion matrix: labeled vs predicted lang
        from mmgraphrag_ray.stages.textstats import lang_confusion

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "lang", "text"])
        return lang_confusion(docs)

    def kg_extraction_coverage_q(sf_dir):
        # extraction recall audit: per repo, chunks with >= 1 mention
        from mmgraphrag_ray.pipelines.kg import extraction_coverage

        return extraction_coverage(_corpus(sf_dir))

    def doc_vocab_setops_q(sf_dir):
        # distributed INTERSECT/EXCEPT: token vocabularies of two corpus
        # slices reduced to membership flags + set-op verdict per token
        from mmgraphrag_ray.stages.textstats import vocab_setops

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["source", "text"])
        return vocab_setops(docs, source_a="src6", source_b="src14")

    def doc_entropy_q(sf_dir):
        # integer token-entropy surrogate H' = S·ilog2(S) − Σ tf·ilog2(tf)
        from mmgraphrag_ray.stages.textstats import doc_token_entropy

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return doc_token_entropy(docs)

    def doc_prf_terms_q(sf_dir):
        # RM3-style pseudo-relevance feedback, expansion half: top-5
        # expansion terms per query by summed tf over the BM25 top-5
        # feedback docs, query's own terms excluded
        from mmgraphrag_ray.stages.retrieval import prf_expansion_terms

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return prf_expansion_terms(docs, BM25_QUERIES, k_fb=5, m_terms=5)

    def doc_prf_topk_q(sf_dir):
        # PRF rerank half: BM25 re-run with the expanded term sets
        from mmgraphrag_ray.stages.retrieval import prf_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return prf_topk(docs, BM25_QUERIES, k=10, k_fb=5, m_terms=5)

    def doc_rrf_fusion_q(sf_dir):
        # reciprocal-rank fusion (1/(60+r) scaled integer) of the BM25
        # ranking with the plain tf-sum ranking, top-10 per query
        from mmgraphrag_ray.stages.retrieval import bm25_topk, rrf_fuse, tf_topk

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        a = bm25_topk(docs, BM25_QUERIES, k=10)
        b = tf_topk(docs, BM25_QUERIES, k=10)
        return rrf_fuse(
            [a.select_columns(["qid", "doc_id", "rank"]),
             b.select_columns(["qid", "doc_id", "rank"])],
            k=10,
        )

    def doc_repetition(sf_dir):
        from mmgraphrag_ray.stages.textstats import doc_repetition_stats

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return doc_repetition_stats(docs)

    def doc_pack_sequences(sf_dir):
        # sequence packing: distributed prefix sum over doc_id order ->
        # per-doc token spans in fixed 512-token training windows
        from mmgraphrag_ray.stages.pack import pack_sequences

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return pack_sequences(docs, window=512, range_size=100)

    def curated_pack_sequences(sf_dir):
        # composition: the curation verdict gates which docs enter the
        # packed token stream (curate -> semi-join -> distributed prefix sum)
        from mmgraphrag_ray.stages.join import bucketed_join
        from mmgraphrag_ray.stages.pack import pack_sequences

        flags = relational.doc_curation(sf_dir)
        kept = flags.map_batches(
            lambda b: b[b["keep"] == 1][["doc_id"]], batch_format="pandas"
        )
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        curated = bucketed_join(docs, kept, on="doc_id")
        return pack_sequences(curated, window=512, range_size=100)

    def doc_pack_manifest(sf_dir):
        # the training-sequence manifest: (seq, doc) intersections with
        # within-sequence token ranges, flat-mapped from the pack spans
        from mmgraphrag_ray.stages.pack import pack_manifest, pack_sequences

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return pack_manifest(pack_sequences(docs, window=512, range_size=100),
                             window=512)

    def ann_topk(sf_dir):
        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        qdf = emb.filter(expr="vec_id < 8").to_pandas()
        qids = qdf["vec_id"].to_numpy()
        qvecs = np.array(qdf["embedding"].tolist(), dtype=np.float64)
        return brute_topk(emb, qids, qvecs, k=5)

    def ann_filtered_topk(sf_dir):
        # filtered vector search: query j only ranks corpus rows sharing
        # its label (the metadata-predicate ANN every vector store ships)
        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        qdf = emb.filter(expr="vec_id < 8").to_pandas()
        return brute_topk(
            emb,
            qdf["vec_id"].to_numpy(),
            np.array(qdf["embedding"].tolist(), dtype=np.float64),
            k=5,
            query_labels=qdf["label"].to_numpy(),
        )

    def code_api_surface_q(sf_dir):
        # per-(repo, lang) def/class counts + distinct def-name vocabulary
        from mmgraphrag_ray.stages.codegraph import api_surface

        files = ray.data.read_parquet(
            _corpus(sf_dir), columns=["repo", "lang", "content"]
        )
        return api_surface(files)

    def ann_pq_topk_q(sf_dir):
        # PQ asymmetric-distance search (codes-only corpus + per-query
        # integer LUT): the compressed-index ANN variant next to brute
        # and IVF; one streaming pass, partial top-k per batch
        from mmgraphrag_ray.stages.cluster import pq_adc_topk

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"])
        return pq_adc_topk(emb, n_queries=8, k=5, n_subspaces=2,
                           n_clusters=8, refine_rounds=1)

    def ann_ivf_topk(sf_dir):
        from mmgraphrag_ray.stages.similarity import ivf_topk

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
        qdf = emb.filter(expr="vec_id < 8").to_pandas()
        return ivf_topk(
            emb,
            qdf["vec_id"].to_numpy(),
            np.array(qdf["embedding"].tolist(), dtype=np.float64),
            k=5,
            n_centroids=16,
            nprobe=4,
        )

    def knn_label(sf_dir):
        from mmgraphrag_ray.stages.similarity import knn_label_transfer

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
        full = emb.to_pandas()
        qdf = full[full["vec_id"] < 8]
        labels_by_id = dict(zip(full["vec_id"].astype(int), full["label"].astype(int)))
        out = knn_label_transfer(
            emb,
            qdf["vec_id"].to_numpy(),
            np.array(qdf["embedding"].tolist(), dtype=np.float64),
            labels_by_id,
            k=1,
        )
        import pandas as pd

        return out.map_batches(
            lambda b: b.assign(label=b["label"].astype("int64"))
            if len(b)
            else pd.DataFrame(
                {"query_vec_id": pd.Series(dtype="int64"), "label": pd.Series(dtype="int64")}
            ),
            batch_format="pandas",
        )

    def kg_resolve_refs(sf_dir):
        from mmgraphrag_ray.pipelines.kg import build_chunks
        from mmgraphrag_ray.stages.resolve import resolve_symbol_refs

        ent, rel = split_mentions(_mentions_cached(sf_dir))
        chunks = build_chunks(_corpus(sf_dir))
        return resolve_symbol_refs(rel, ent, chunks)

    def code_strip_comments(sf_dir):
        import pyarrow as pa

        from mmgraphrag_ray.textutils import strip_code_comments

        files = ray.data.read_parquet(_corpus(sf_dir), columns=["repo", "path", "content"])

        def strip(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "repo": batch.column("repo"),
                    "path": batch.column("path"),
                    "stripped": pa.array(
                        [strip_code_comments(c) for c in batch.column("content").to_pylist()],
                        pa.large_string(),
                    ),
                }
            )

        return files.map_batches(strip, batch_format="pyarrow")

    def code_import_indegree_q(sf_dir):
        # module dependency graph: top-20 most-imported modules
        # (distinct importing modules) from the corpus import lines
        from mmgraphrag_ray.stages.codegraph import import_indegree_topk

        files = ray.data.read_parquet(_corpus(sf_dir), columns=["content"])
        return import_indegree_topk(files, k=20)

    def code_repo_pack_q(sf_dir):
        # StarCoder-style repo-level context assembly: path-ordered
        # concat per repo, verified by md5 of the packed blob
        from mmgraphrag_ray.stages.pack import repo_context_pack

        files = ray.data.read_parquet(
            _corpus(sf_dir), columns=["repo", "path", "content"]
        )
        return repo_context_pack(files)

    def code_dedup_lines(sf_dir):
        # corpus-wide duplicate-line strip (RefinedWeb-style boilerplate
        # removal) over the source-code corpus
        from mmgraphrag_ray.stages.dedup import dedup_lines

        files = ray.data.read_parquet(
            _corpus(sf_dir), columns=["repo", "path", "content"]
        )
        return dedup_lines(
            files, text_col="content", key_cols=("repo", "path"), min_files=4
        )

    def doc_decontaminate(sf_dir):
        # benchmark n-gram decontamination: bench set = doc_id % 97 == 0
        from mmgraphrag_ray.stages.dedup import decontaminate

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return decontaminate(docs, k=4, bench_mod=97)

    def doc_dsir_weights_q(sf_dir):
        # DSIR importance weights (hashed-unigram variant): integer
        # likelihood-ratio surrogate vs the doc_id%97==0 target slice
        from mmgraphrag_ray.stages.select import dsir_weights

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dsir_weights(docs)

    def doc_dsir_topk_q(sf_dir):
        # DSIR selection step (deterministic no-noise limit): top-50
        # non-target docs by importance weight
        from mmgraphrag_ray.stages.select import dsir_topk

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return dsir_topk(docs, k=50)

    def events_path_trigrams_q(sf_dir):
        # clickstream path mining: global top-20 per-user event-type
        # trigrams in (ts, event_id) order — one hash shuffle on user,
        # vectorized shift-and-mask n-gram build, combiner counts
        from mmgraphrag_ray.stages.window import grouped_sequence_ngrams

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return grouped_sequence_ngrams(
            ev, keys=["user_id"], order_cols=["ts", "event_id"],
            val_col="event_type", n=3, k=20,
        )

    def join_size_events_customer_q(sf_dir):
        # exact join-cardinality planning pass: output rows + hottest
        # key product WITHOUT running the join
        from mmgraphrag_ray.stages.join import join_size_estimate

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id"]
        )
        cust = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        )
        # events->customer is the skewed pair in this corpus
        return join_size_estimate(ev, cust, "user_id", "c_custkey")

    def doc_split_assign_q(sf_dir):
        # deterministic 90/5/5 train/val/test assignment: a pure
        # function of doc_id (stable under corpus growth/reorder —
        # the property a training split must have), stratified
        # implicitly by the uniform md5 hash
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )

        def assign(batch: pd.DataFrame) -> pd.DataFrame:
            import hashlib

            h = batch["doc_id"].astype(str).map(
                lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100
            )
            out = batch[["doc_id", "lang"]].copy()
            out["split"] = np.where(
                h < 90, "train", np.where(h < 95, "val", "test")
            )
            return out

        return docs.map_batches(assign, batch_format="pandas")

    def doc_weighted_median_len_q(sf_dir):
        # token-weighted median length: the length half the corpus's
        # TOKENS sit below (budget planning), integer-exact threshold
        import pyarrow as pa

        from mmgraphrag_ray.stages.groupagg import weighted_global_quantile
        from mmgraphrag_ray.tokenizer import encode

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["n_chars", "text"]
        )

        def toks(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "n_chars": batch.column("n_chars"),
                    "w": pa.array(
                        [len(encode(t)) for t in batch.column("text").to_pylist()],
                        pa.int64(),
                    ),
                }
            )

        return weighted_global_quantile(
            docs.map_batches(toks, batch_format="pyarrow"), "n_chars", "w", p=50
        )

    def doc_shuffle_order_q(sf_dir):
        # reproducible pre-training corpus permutation: md5 shuffle key
        # + exact global rank, no global sort
        from mmgraphrag_ray.stages.sample import global_shuffle_order

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        )
        return global_shuffle_order(docs, "doc_id", seed=7)

    def doc_length_pct_rank_q(sf_dir):
        # per-language exact length percentile (FineWeb-style "drop the
        # bottom X% per lang" gate) — distributed rank, no global sort
        from mmgraphrag_ray.stages.groupagg import grouped_exact_rank

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        return grouped_exact_rank(docs, "lang", "n_chars", "doc_id", step=64)

    def doc_token_budget_q(sf_dir):
        # training-mixture quota fill: per source, keep the longest docs
        # (n_chars desc, doc_id tie-break) until 800 tokens are spent
        import pyarrow as pa

        from mmgraphrag_ray.stages.sample import token_budget_select
        from mmgraphrag_ray.tokenizer import encode

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text", "n_chars"],
        )

        def toks(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "source": batch.column("source"),
                    "n_chars": batch.column("n_chars"),
                    "n_tokens": pa.array(
                        [len(encode(t)) for t in batch.column("text").to_pylist()],
                        pa.int64(),
                    ),
                }
            )

        return token_budget_select(
            docs.map_batches(toks, batch_format="pyarrow"),
            group_col="source",
            weight_col="n_tokens",
            budget=800,
            order_cols=["n_chars", "doc_id"],
            descending=[True, False],
        )

    def doc_robust_outliers_q(sf_dir):
        # per-language robust length filter: |len - median| > 3*MAD,
        # all-integer so the flag is bit-exact vs SQL
        from mmgraphrag_ray.stages.groupagg import grouped_robust_outliers

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        )
        return grouped_robust_outliers(docs, ["lang"], "n_chars", z=3)

    def lineitem_price_mad_q(sf_dir):
        # robust dispersion: exact global median + median absolute
        # deviation via two histogram-refinement selection passes
        from mmgraphrag_ray.stages.groupagg import global_mad

        li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                   columns=["l_extendedprice"])
        return global_mad(li, "l_extendedprice")

    def lineitem_salted_part_join_q(sf_dir):
        # skew-mitigating salted fact⋈dim join (salt=8): hot part keys
        # spread over 8 reduce buckets; grouped to brand totals
        from mmgraphrag_ray.stages.groupagg import bucketed_groupby_agg
        from mmgraphrag_ray.stages.join import salted_join

        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        part = ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ).map_batches(
            lambda b: b.rename(columns={"p_partkey": "l_partkey"}),
            batch_format="pandas",
        )
        joined = salted_join(li, part, on="l_partkey", salt=8)

        def widen(b):
            out = b[["p_brand"]].copy()
            out["n"] = 1
            out["sum_qty"] = b["l_quantity"].astype("int64")
            out["sum_price_floor"] = b["l_extendedprice"].astype("int64")
            return out

        return bucketed_groupby_agg(
            joined.map_batches(widen, batch_format="pandas"),
            keys=["p_brand"],
            aggs={"n": ("n", "sum"), "sum_qty": ("sum_qty", "sum"),
                  "sum_price_floor": ("sum_price_floor", "sum")},
        )

    def events_gap_stats_q(sf_dir):
        # per-user inter-event cadence profile: consecutive-gap
        # min/max/sum/count in integer microseconds
        from mmgraphrag_ray.stages.window import grouped_gap_stats

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id"],
        )
        return grouped_gap_stats(ev, keys=["user_id"], ts_col="ts",
                                 id_col="event_id")

    def doc_sample_per_lang_q(sf_dir):
        # deterministic k-per-group inspection sample: 3 docs per lang by
        # md5(doc_id) order (stable across runs/engines/corpus growth)
        from mmgraphrag_ray.stages.sample import grouped_hash_sample

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["lang", "doc_id"])
        return grouped_hash_sample(docs, keys=["lang"], id_col="doc_id", k=3)

    def doc_stratified_sample_q(sf_dir):
        # EXACT per-stratum 10% sample: per lang keep the ceil(n/10)
        # smallest-md5(doc_id) docs — the per-stratum quantile threshold
        # comes from group_quantiles (quantile_disc semantics), so the SQL
        # mirror is h <= quantile_disc(h, .1) OVER (PARTITION BY lang)
        from mmgraphrag_ray.stages.select import stratified_sample

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "lang"])
        return stratified_sample(docs, stratum_col="lang",
                                 id_col="doc_id", pct=10)

    def events_funnel_q(sf_dir):
        # ordered view->click->purchase funnel: per step, users with an
        # event of that type strictly after their previous-step min time
        from mmgraphrag_ray.stages.window import funnel_counts

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"])
        return funnel_counts(ev, ["view", "click", "purchase"])

    def lineitem_price_histogram_q(sf_dir):
        # equi-width histogram (24 bins over [0, 120000)): one streaming
        # combiner pass, n_bins rows of driver-visible state
        from mmgraphrag_ray.stages.profile import column_histogram

        li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                   columns=["l_extendedprice"])
        return column_histogram(li, "l_extendedprice", 0.0, 120000.0, 24)

    def events_window_dedup_q(sf_dir):
        # streaming-hygiene windowed dedup: first event per (user, type,
        # 1h tumbling window); argmin rides the shuffle as one string
        from mmgraphrag_ray.stages.window import window_dedup

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return window_dedup(
            ev, keys=["user_id", "event_type"], ts_col="ts",
            id_col="event_id", window_us=3_600_000_000,
        )

    def orders_cdc_diff_q(sf_dir):
        # CDC diff of two table versions by primary key: right version =
        # orders with %13 keys removed, %7 prices bumped, %11 keys
        # re-added under new ids — classify added/removed/changed/same
        from mmgraphrag_ray.stages.join import table_diff

        cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
        left = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

        def make_right(b):
            keep = b[b["o_orderkey"] % 13 != 0].copy()
            bump = keep["o_orderkey"] % 7 == 0
            keep.loc[bump, "o_totalprice"] = keep.loc[bump, "o_totalprice"] + 1.0
            added = b[b["o_orderkey"] % 11 == 0].copy()
            added["o_orderkey"] = added["o_orderkey"] + 10_000_000
            import pandas as pd

            return pd.concat([keep, added], ignore_index=True)

        right = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=cols
        ).map_batches(make_right, batch_format="pandas")
        return table_diff(
            left, right, key_col="o_orderkey",
            compare_cols=["o_totalprice", "o_orderstatus"],
        )

    def orders_cdc_apply_q(sf_dir):
        # MERGE INTO: apply the deterministic change set (delete %13,
        # price-bump upsert %7, insert %11 under +10M keys — the same
        # mutation orders_cdc_diff classifies) onto the base table; exact
        # integer cents so the merged table value-hashes
        from mmgraphrag_ray.stages.join import cdc_apply

        cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
        raw = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

        def to_cents(b):
            import pandas as pd

            return pd.DataFrame({
                "o_orderkey": b["o_orderkey"],
                "price_cents": np.round(
                    b["o_totalprice"].to_numpy() * 100.0).astype("int64"),
                "o_orderstatus": b["o_orderstatus"],
            })

        base = raw.map_batches(to_cents, batch_format="pandas")

        def make_changes(b):
            import pandas as pd

            cents = np.round(
                b["o_totalprice"].to_numpy() * 100.0).astype("int64")
            k = b["o_orderkey"]
            dels = pd.DataFrame({
                "o_orderkey": k[k % 13 == 0],
                "price_cents": cents[(k % 13 == 0).to_numpy()],
                "o_orderstatus": b["o_orderstatus"][k % 13 == 0],
                "op": "delete",
            })
            um = (k % 7 == 0) & (k % 13 != 0)
            ups = pd.DataFrame({
                "o_orderkey": k[um],
                "price_cents": cents[um.to_numpy()] + 100,
                "o_orderstatus": b["o_orderstatus"][um],
                "op": "upsert",
            })
            am = k % 11 == 0
            adds = pd.DataFrame({
                "o_orderkey": k[am] + 10_000_000,
                "price_cents": cents[am.to_numpy()],
                "o_orderstatus": b["o_orderstatus"][am],
                "op": "upsert",
            })
            return pd.concat([dels, ups, adds], ignore_index=True)

        changes = raw.map_batches(make_changes, batch_format="pandas")
        return cdc_apply(base, changes, key_col="o_orderkey",
                         payload_cols=["price_cents", "o_orderstatus"])

    def doc_range_partition_plan_q(sf_dir):
        # range-partitioner boundary planning over doc lengths: exact
        # quantile boundaries + per-partition balance report
        from mmgraphrag_ray.stages.layout import range_partition_plan

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["n_chars"]
        )
        return range_partition_plan(docs, "n_chars", n_parts=4)

    def kg_ktruss_q(sf_dir):
        # fixed-round 3-truss peel over the constructed KG edges
        from mmgraphrag_ray.stages.graphalgo import ktruss_edges

        _, edges = _build_graph_cached(sf_dir)
        return ktruss_edges(edges, k=3, rounds=2)

    def code_secret_scan_q(sf_dir):
        # secret/PII scan + redaction over the code corpus (emails, long
        # hex tokens, long numeric literals -> typed placeholders)
        from mmgraphrag_ray.stages.textstats import secret_scan

        files = ray.data.read_parquet(
            _corpus(sf_dir), columns=["repo", "path", "content"]
        )
        return secret_scan(files)

    def lineitem_corr_components_q(sf_dir):
        # per-returnflag Pearson sufficient statistics in one streaming
        # pass (n, Σx, Σy, Σx², Σy², Σxy), integer-quantized for
        # cross-engine exactness: x=quantity, y=trunc(extendedprice)
        from mmgraphrag_ray.stages.groupagg import grouped_corr_components

        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        return grouped_corr_components(
            li, keys=["l_returnflag"], x_col="l_quantity",
            y_col="l_extendedprice",
        )

    def bpe_pair_counts_q(sf_dir):
        # BPE tokenizer training round 1: top-30 adjacent char pairs
        # weighted by word frequency (vocabulary-bounded work)
        from mmgraphrag_ray.stages.bpe import bpe_pair_counts

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["text"])
        return bpe_pair_counts(docs, k=30)

    def doc_bpe_encode_q(sf_dir):
        # tokenizer application: encode the corpus under the 5 learned
        # merges; per-doc word + BPE-token counts via one vocab join
        from mmgraphrag_ray.stages.bpe import bpe_encode_counts

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return bpe_encode_counts(docs, n_merges=5)

    def bpe_merges_q(sf_dir):
        # the BPE training loop: 5 merge rounds, each ONE vocab-bounded
        # combiner + bucketed sum + 1-row argmax; corpus touched once
        import pandas as pd

        from mmgraphrag_ray.stages.bpe import bpe_learn

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["text"])
        merges, _vocab = bpe_learn(docs, n_merges=5)
        return pd.DataFrame(
            {
                "step": pd.Series(range(1, len(merges) + 1), dtype="int64"),
                "pair": [l + " " + r for l, r, _ in merges],
                "c": pd.Series([n for _, _, n in merges], dtype="int64"),
            }
        )

    def emb_kmeans(sf_dir):
        # distributed Lloyd over quantized embeddings (SemDeDup front half);
        # integer-exact so the unrolled SQL mirror matches bit-for-bit
        from mmgraphrag_ray.stages.cluster import kmeans_assign

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return kmeans_assign(emb, n_clusters=8, refine_rounds=1)

    def emb_semdedup(sf_dir):
        # SemDeDup back half: within-cluster semantic near-dup flags,
        # integer-exact cosine >= 2/5 test (HUGEINT mirror in SQL)
        from mmgraphrag_ray.stages.cluster import semdedup

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return semdedup(emb, n_clusters=8, refine_rounds=1, tau=(2, 5))

    def emb_mutual_knn_q(sf_dir):
        # cluster-bucketed mutual-kNN graph: top-3 cosine neighbors among
        # k-means co-members, signed squared-cosine integer ranking, plus
        # the both-directions mutual flag (resolved inside the cluster)
        from mmgraphrag_ray.stages.cluster import mutual_knn

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return mutual_knn(emb, n_clusters=8, refine_rounds=1, k=3)

    def emb_negatives_q(sf_dir):
        # contrastive hard-negative mining off the Lloyd assignment:
        # k=2 negatives per anchor from other clusters, md5-keyed rank
        from mmgraphrag_ray.stages.cluster import negative_samples

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        return negative_samples(emb, n_clusters=8, refine_rounds=1,
                                per_cluster=4, k=2)

    def emb_pca_component_q(sf_dir):
        # leading principal component: 2 integer power-iteration rounds
        # over the covariance sufficient stats (corpus -> O(dim^2) table;
        # the 64x64 fold runs on the driver where it belongs)
        from mmgraphrag_ray.stages.vecstats import pca_power_component

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        return pca_power_component(emb, scale=100)

    def orders_zorder_q(sf_dir):
        # Morton-curve clustered layout key over (custkey, totalprice):
        # one aggregate pass for bounds + one vectorized key pass; the
        # zbucket is the data-skipping output partition
        from mmgraphrag_ray.stages.layout import zorder_keys

        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        return zorder_keys(
            orders, "o_custkey", "o_totalprice", id_cols=["o_orderkey"],
            bits=16, n_buckets=64,
        )

    def doc_commonness_q(sf_dir):
        # per-doc boilerplate signal: count + summed global df of the
        # doc's distinct tokens (integer pair; consumer divides)
        from mmgraphrag_ray.stages.index import doc_commonness

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return doc_commonness(docs)

    def doc_bigram_lm_q(sf_dir):
        # CCNet/KenLM perplexity-filter analog, integer-exact: corpus
        # bigram LM (two grouped count reduces), per-doc fixed-point
        # conditional-probability sum via two token-bucketed joins
        from mmgraphrag_ray.stages.index import bigram_lm_scores

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return bigram_lm_scores(docs)

    def doc_quality_buckets_q(sf_dir):
        # CCNet head/middle/tail partition by LM fluency: exact type-1
        # p30/p70 boundaries of mean_p via the rank-targeted selector,
        # one classify pass, 3-group fold
        from mmgraphrag_ray.stages.select import lm_quality_buckets

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return lm_quality_buckets(docs)

    def kg_link_predict_q(sf_dir):
        # KG-completion primitive: propose missing edges by the integer
        # resource-allocation index over common neighbors (deg <= 64 by
        # definition; existing-edge anti-join rides the same reduce)
        from mmgraphrag_ray.stages.graphalgo import link_prediction_scores

        _, edges = _build_graph_cached(sf_dir)
        return link_prediction_scores(edges, k=20, deg_cap=64)

    def kg_random_walks_q(sf_dir):
        # DeepWalk corpus generation: one deterministic md5-indexed walk
        # per node, 3 steps; each step = two bucketed joins (degree ->
        # exact 'u#rank' key), never a fan-out join on the node alone
        from mmgraphrag_ray.stages.graphalgo import random_walks

        _, edges = _build_graph_cached(sf_dir)
        return random_walks(edges, length=3)

    def dedup_keep_best_q(sf_dir):
        # quality-aware near-dup collapse: jaccard components -> keep the
        # longest member per component (ties -> smallest doc_id)
        from mmgraphrag_ray.stages.dedup import (
            dedup_jaccard,
            keep_best_representative,
        )

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        import pandas as pd

        labels = dedup_jaccard(docs, threshold=0.8)
        scores = docs.map_batches(
            lambda b: pd.DataFrame(
                {"id": b["doc_id"].astype("int64"),
                 "score": b["text"].str.len().astype("int64")}
            ),
            batch_format="pandas",
        )
        return keep_best_representative(labels, scores)

    def kg_modularity_q(sf_dir):
        # partition-quality scalar for the 4-round label-prop communities:
        # rational Newman modularity q_num / (4 m^2) kept integer
        from mmgraphrag_ray.stages.graphalgo import modularity_int

        nodes, edges = _build_graph_cached(sf_dir)
        return modularity_int(nodes, edges, rounds=4)

    def fk_orphan_audit_q(sf_dir):
        # cross-table referential-integrity gate: fact side reduces to
        # (fk, count) combiner partials, one bucketed left join per
        # relation marks dangling keys
        from mmgraphrag_ray.stages.profile import fk_orphan_audit

        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
        )
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        )
        cust = ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        )
        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id"]
        )
        return fk_orphan_audit([
            ("lineitem.l_orderkey->orders.o_orderkey",
             li, "l_orderkey", orders, "o_orderkey"),
            ("orders.o_custkey->customer.c_custkey",
             orders, "o_custkey", cust, "c_custkey"),
            ("events.user_id->customer.c_custkey",
             ev, "user_id", cust, "c_custkey"),
        ])

    def lineitem_expectations_q(sf_dir):
        # declarative data-quality gate: 5 rules evaluated in ONE
        # streaming pass, rules x batches partial rows folded on the
        # driver (constant state, no shuffle)
        from mmgraphrag_ray.stages.profile import expect, run_expectations

        li = ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_discount", "l_returnflag",
                     "l_linestatus", "l_shipdate"],
        )
        return run_expectations(li, [
            expect("qty_range", "l_quantity", "between", lo=1, hi=50),
            expect("discount_range", "l_discount", "between", lo=0.0, hi=0.1),
            expect("returnflag_set", "l_returnflag", "in_set",
                   values=("A", "N", "R")),
            expect("linestatus_regex", "l_linestatus", "regex_match",
                   pattern="[OF]"),
            expect("shipdate_not_null", "l_shipdate", "not_null"),
        ])

    def events_heavy_hitters_q(sf_dir):
        # exact top-10 users by event count via the Misra-Gries sketch +
        # verify path (full-key shuffle avoided; certified-exact bound,
        # exact-groupby fallback when the bound can't certify)
        from mmgraphrag_ray.stages.sketch import heavy_hitters

        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id"]
        )
        return heavy_hitters(ev, "user_id", k=10, capacity=256)

    def documents_jsonl_roundtrip_q(sf_dir):
        # interchange fidelity: parquet -> partitioned JSONL sink -> JSONL
        # source -> order-independent checksum; the oracle computes the
        # same checksum on the ORIGINAL table, so any escaping/coercion/
        # row-loss bug in the JSON path breaks the value match
        import hashlib

        from mmgraphrag_ray.sources.jsonl import read_jsonl, write_jsonl
        from mmgraphrag_ray.stages.sketch import table_checksum

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        out = write_jsonl(docs, f"/tmp/raykg_jsonl/{tag}")
        cols = ["doc_id", "lang", "source", "n_chars", "text"]
        return table_checksum(read_jsonl(out), cols)

    def emb_covariance_q(sf_dir):
        # PCA/whitening front half: exact quantized covariance sufficient
        # statistics (d, e, n, s_d, s_e, s_de) — one streaming pass, the
        # corpus reduces to dim*(dim+1)/2 integer rows
        from mmgraphrag_ray.stages.vecstats import embedding_covariance_components

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        return embedding_covariance_components(emb)

    def kg_two_hop(sf_dir):
        # 2-hop BFS neighborhood from the CLASS nodes over the constructed
        # KG — the query-side k-hop subgraph primitive (min hop per node)
        from mmgraphrag_ray.stages.graphalgo import k_hop_distances

        nodes, edges = _build_graph_cached(sf_dir)
        seeds = nodes.map_batches(
            lambda b: _dtt(b[b["entity_type"] == '"CLASS"'][["entity_name"]]),
            batch_format="pandas",
        )
        return k_hop_distances(seeds, edges, k=2)

    def kg_ppr_q(sf_dir):
        # personalized PageRank from the CLASS-typed seed set — the
        # GraphRAG-style seed-biased relevance ranking over the KG
        from mmgraphrag_ray.stages.graphalgo import ppr_int

        nodes, edges = _build_graph_cached(sf_dir)
        seeds = nodes.map_batches(
            lambda b: _dtt(b[b["entity_type"] == '"CLASS"'][["entity_name"]]),
            batch_format="pandas",
        )
        ranks = ppr_int(nodes, edges, seeds, iterations=3)
        return ranks.map_batches(
            lambda b: b.rename(columns={"r": "rank"}), batch_format="pandas"
        )

    def kg_path_counts_q(sf_dir):
        # Brandes σ: exact shortest-path counts from the CLASS seed set,
        # hops <= 2 (betweenness forward half; all-integer BFS sums)
        from mmgraphrag_ray.stages.graphalgo import k_hop_path_counts

        nodes, edges = _build_graph_cached(sf_dir)
        seeds = nodes.map_batches(
            lambda b: _dtt(b[b["entity_type"] == '"CLASS"'][["entity_name"]]),
            batch_format="pandas",
        )
        return k_hop_path_counts(seeds, edges, k=2)

    def kg_hyperball_q(sf_dir):
        # HyperBall neighborhood-function sketch: per-node HLL registers
        # max-merged over 2 graph rounds; integer sufficient stats out
        from mmgraphrag_ray.stages.graphalgo import hyperball_registers

        nodes, edges = _build_graph_cached(sf_dir)
        return hyperball_registers(nodes, edges, rounds=2)

    def kg_betweenness_q(sf_dir):
        # Brandes backward half on the same CLASS-seed BFS: fixed-point
        # ppm dependency accumulation over the hop-DAG (per-term floor,
        # order-independent), completing kg_path_counts' sigma
        from mmgraphrag_ray.stages.graphalgo import betweenness_ppm

        nodes, edges = _build_graph_cached(sf_dir)
        seeds = nodes.map_batches(
            lambda b: _dtt(b[b["entity_type"] == '"CLASS"'][["entity_name"]]),
            batch_format="pandas",
        )
        return betweenness_ppm(seeds, edges, k=2)

    def doc_sample(sf_dir):
        # deterministic systematic sample (1-in-10 by id) so the DuckDB
        # oracle matches exactly; Ray's random_sample exists for the
        # statistical variant but has no cross-engine-stable RNG
        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        return docs.map_batches(
            lambda b: b[b["doc_id"] % 10 == 0], batch_format="pandas"
        )

    def doc_boolean_and_q(sf_dir):
        # conjunctive boolean retrieval (posting intersection via counting):
        # docs containing ALL terms of each query
        from mmgraphrag_ray.stages.retrieval import boolean_and_retrieval

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return boolean_and_retrieval(docs, BM25_QUERIES)

    def repo_lang_profile_q(sf_dir):
        # per-repo language composition: file count, distinct langs,
        # dominant lang (ties -> lexicographic min) and its ppm share
        from mmgraphrag_ray.stages.profile import grouped_dominance

        files = ray.data.read_parquet(_corpus(sf_dir),
                                      columns=["repo", "lang"])
        return grouped_dominance(files, keys=["repo"], cat_col="lang")

    def kg_wl_hashes_q(sf_dir):
        # 1-round Weisfeiler-Lehman refinement: md5 of own type + sorted
        # multiset of neighbor types per node (graph-feature primitive)
        from mmgraphrag_ray.stages.graphalgo import wl_neighborhood_hashes

        nodes, edges = _build_graph_cached(sf_dir)
        return wl_neighborhood_hashes(nodes, edges)

    def code_import_hits_q(sf_dir):
        # integer HITS over the directed import graph: 2 rounds of
        # auth<-hub / hub<-auth sums with max-renormalization
        from mmgraphrag_ray.stages.codegraph import hits_scores

        files = ray.data.read_parquet(_corpus(sf_dir), columns=["content"])
        return hits_scores(files, rounds=2)

    def code_dep_depth_q(sf_dir):
        # topological dependency depth (parallel build-order layer) over
        # the import DAG: 4 relaxation sweeps, exact for chains <= 4
        from mmgraphrag_ray.stages.codegraph import dependency_depth

        files = ray.data.read_parquet(_corpus(sf_dir), columns=["content"])
        return dependency_depth(files, rounds=4)

    def code_call_cycles_q(sf_dir):
        # min call-cycle length per module (recursion / circular-call
        # detection) over the unambiguous-symbol-resolved call graph,
        # exact for cycles <= 6 via meet-in-the-middle bounded closure
        from mmgraphrag_ray.stages.codegraph import call_cycles

        files = ray.data.read_parquet(_corpus(sf_dir), columns=["content"])
        return call_cycles(files, max_len=6)

    def code_vendored_files_q(sf_dir):
        # cross-repo vendored-code report: same content_sha256 checked
        # into >= 2 DISTINCT repos, with copy count and the canonical
        # first location (lexicographic min (repo, path, commit))
        from mmgraphrag_ray.sources.files import read_files
        from mmgraphrag_ray.stages.codegraph import vendored_files

        files = read_files(_corpus(sf_dir),
                           columns=["repo", "path", "commit", "content"])
        return vendored_files(files, min_repos=2)

    def kg_square_census_q(sf_dir):
        # 4-cycle (square) census over the KG: per diagonal pair, common
        # neighbors z with deg(z) in [2, 64]; squares = C(cn, 2); top-20
        from mmgraphrag_ray.stages.graphalgo import square_census

        _, edges = _build_graph_cached(sf_dir)
        return square_census(edges, k=20, deg_cap=64)

    def doc_select_maxcover_q(sf_dir):
        # greedy max-coverage selection: the 4 documents that together
        # cover the most distinct word bigrams (one distributed pass per
        # round; covered set is a tiny broadcast)
        from mmgraphrag_ray.stages.select import maxcover_select

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return maxcover_select(docs, k=4)

    def emb_label_scatter_q(sf_dir):
        # class-compactness report: integer within-label scatter numerator
        from mmgraphrag_ray.stages.vecstats import label_scatter

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["label", "embedding"])
        return label_scatter(emb)

    def emb_matryoshka_q(sf_dir):
        # MRL prefix-truncation report: exact kept/dropped squared norm
        # and retained-energy ppm per vector at prefix widths 8/16/32
        from mmgraphrag_ray.stages.vecstats import matryoshka_error

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"])
        return matryoshka_error(emb, prefixes=(8, 16, 32))

    def kg_typed_wedges_q(sf_dir):
        # typed 2-path census: counted from per-center type tallies,
        # never enumerated (hub-safe by construction)
        from mmgraphrag_ray.stages.graphalgo import typed_wedge_census

        nodes, edges = _build_graph_cached(sf_dir)
        return typed_wedge_census(nodes, edges)

    def kg_type_degree_q(sf_dir):
        # node-side ontology profile: per-type node count + degree stats
        from mmgraphrag_ray.stages.graphalgo import type_degree_profile

        nodes, edges = _build_graph_cached(sf_dir)
        return type_degree_profile(nodes, edges)

    def kg_degree_dist_q(sf_dir):
        # log2-bucketed degree distribution (power-law diagnostic)
        from mmgraphrag_ray.stages.graphalgo import degree_distribution

        _, edges = _build_graph_cached(sf_dir)
        return degree_distribution(edges)

    def kg_clustering_q(sf_dir):
        # local clustering coefficient (integer ppm) for degree>=2 nodes:
        # 2·tri·1e6 // (d·(d−1)), composed from triangle counts + degrees
        from mmgraphrag_ray.stages.graphalgo import clustering_coefficients

        nodes, edges = _build_graph_cached(sf_dir)
        return clustering_coefficients(nodes, edges)

    def code_identifier_vocab_q(sf_dir):
        # per-repo identifier-subtoken vocabulary: lowercase identifiers
        # split on '_', combiner-counted, dominant subtoken + ppm share
        from mmgraphrag_ray.stages.codegraph import identifier_vocab

        files = ray.data.read_parquet(_corpus(sf_dir),
                                      columns=["repo", "content"])
        return identifier_vocab(files)

    def kg_assortativity_q(sf_dir):
        # graph-level health metric: degree-assortativity Pearson
        # sufficient stats over bidirected edge endpoint degrees
        from mmgraphrag_ray.stages.graphalgo import (
            degree_assortativity_components,
        )

        _, edges = _build_graph_cached(sf_dir)
        return degree_assortativity_components(edges)

    def emb_ann_recall_q(sf_dir):
        # ANN acceptance: per-query overlap of IVF top-5 vs exact top-5
        from mmgraphrag_ray.stages.similarity import ann_recall, ivf_topk

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
        qdf = emb.filter(expr="vec_id < 8").to_pandas()
        qids = qdf["vec_id"].to_numpy()
        qvecs = np.array(qdf["embedding"].tolist(), dtype=np.float64)
        brute = brute_topk(emb, qids, qvecs, k=5).map_batches(
            lambda b: b[["query_vec_id", "vec_id"]], batch_format="pandas"
        )
        ivf = ivf_topk(emb, qids, qvecs, k=5, n_centroids=16, nprobe=4
                       ).map_batches(
            lambda b: b[["query_vec_id", "vec_id"]], batch_format="pandas"
        )
        return ann_recall(brute.materialize(), ivf.materialize())

    def emb_pq_recall_q(sf_dir):
        # compressed-index acceptance: per-query overlap of the PQ-ADC
        # top-5 vs the exact top-5 (the recall gate a PQ rollout needs)
        from mmgraphrag_ray.stages.cluster import pq_adc_topk
        from mmgraphrag_ray.stages.similarity import ann_recall

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet").materialize()
        qdf = emb.filter(expr="vec_id < 8").to_pandas()
        qids = qdf["vec_id"].to_numpy()
        qvecs = np.array(qdf["embedding"].tolist(), dtype=np.float64)
        brute = brute_topk(emb, qids, qvecs, k=5).map_batches(
            lambda b: b[["query_vec_id", "vec_id"]], batch_format="pandas"
        )
        pq = pq_adc_topk(emb, n_queries=8, k=5, n_subspaces=2,
                         n_clusters=8).map_batches(
            lambda b: b[["query_vec_id", "vec_id"]], batch_format="pandas"
        )
        rec = ann_recall(brute.materialize(), pq.materialize())
        return rec.map_batches(
            lambda b: b.rename(columns={"n_ivf": "n_pq"}),
            batch_format="pandas",
        )

    def events_lateness_q(sf_dir):
        # streaming out-of-orderness diagnostic: per-user watermark
        # lateness in arrival (event_id) order, exact integer µs
        from mmgraphrag_ray.stages.window import lateness_profile

        ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["user_id", "ts", "event_id"])
        return lateness_profile(ev, key="user_id", ts_col="ts",
                                arrival_col="event_id")

    def code_clones_q(sf_dir):
        # type-2 (parameterized) code-clone groups: digit-abstracted
        # function bodies occurring in >= 2 distinct files
        from mmgraphrag_ray.stages.codegraph import function_clones

        files = ray.data.read_parquet(_corpus(sf_dir),
                                      columns=["repo", "path", "content"])
        return function_clones(files, min_files=2)

    def doc_winnow_q(sf_dir):
        # MOSS winnowing fingerprints: rightmost-min-per-window k-gram
        # hash selection, per-doc signature digest
        from mmgraphrag_ray.stages.textstats import winnow_fingerprints

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return winnow_fingerprints(docs, k=4, w=4)

    def kg_type_pairs_q(sf_dir):
        # KG ontology profile: edge count + integer weight sum per
        # unordered entity-type pair
        from mmgraphrag_ray.stages.graphalgo import type_pair_edge_stats

        nodes, edges = _build_graph_cached(sf_dir)
        return type_pair_edge_stats(nodes, edges)

    def doc_scan_prune_q(sf_dir):
        # metadata-only scan planning over a range-clustered partitioned
        # copy of documents: one footer open per file, no data pages read
        import glob as _glob

        from mmgraphrag_ray.stages.layout import (
            ensure_partitioned_docs, parquet_prune_plan,
        )

        d = ensure_partitioned_docs(sf_dir, n_parts=8)
        paths = _glob.glob(f"{d}/part-*.parquet")
        return parquet_prune_plan(paths, col="doc_id", lo=2000, hi=2999)

    def doc_compaction_plan_q(sf_dir):
        # small-file compaction planning from parquet footers only:
        # per-file compressed bytes + cumulative-quota merge bins
        import glob as _glob

        from mmgraphrag_ray.stages.layout import (
            compaction_plan, ensure_partitioned_docs,
        )

        d = ensure_partitioned_docs(sf_dir, n_parts=8)
        paths = _glob.glob(f"{d}/part-*.parquet")
        return compaction_plan(paths, target_bytes=2500)

    def q6_revenue_q(sf_dir):
        # TPC-H Q6 shape: reader-level predicate pushdown + vectorized
        # residual filter + combiner global sum (exact cents)
        return relational.q6_revenue(sf_dir)

    PHRASES = {
        "p_hash_join": ("hash", "join"),
        "p_table_scan": ("table", "scan"),
        "p_key_order": ("key", "order"),
    }

    def doc_phrase_match_q(sf_dir):
        # positional phrase retrieval: adjacent-token phrase occurrences
        # (the positional-index primitive bag-of-words retrieval lacks)
        from mmgraphrag_ray.stages.retrieval import phrase_match

        docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
        return phrase_match(docs, PHRASES)

    def events_rfm_q(sf_dir):
        # RFM segmentation: per-user recency/frequency/monetary + exact
        # rank-quintile scores ((rnk-1)*5//n + 1) without a global sort
        return relational.events_rfm(sf_dir)

    def parts_skyline_q(sf_dir):
        # 2-D Pareto frontier over part (maximize size and price-cents):
        # per-batch local-frontier combiner, tiny final sweep
        from mmgraphrag_ray.stages.select import pareto_skyline

        part = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                     columns=["p_partkey", "p_size",
                                              "p_retailprice"])

        def widen(b):
            out = b[["p_partkey"]].copy()
            out["p_size"] = b["p_size"].astype("int64")
            out["cents"] = np.floor(
                b["p_retailprice"].to_numpy() * 100.0
            ).astype("int64")
            return out

        pts = part.map_batches(widen, batch_format="pandas")
        return pareto_skyline(pts, x_col="p_size", y_col="cents",
                              keep_cols=["p_partkey"])

    def code_complexity_q(sf_dir):
        # cyclomatic proxy per source file: branch keywords + function
        # count (shared regexes with the RE2 mirror)
        from mmgraphrag_ray.stages.codegraph import complexity_scores

        files = ray.data.read_parquet(_corpus(sf_dir),
                                      columns=["repo", "path", "content"])
        return complexity_scores(files)

    def emb_pq_error_q(sf_dir):
        # product quantization: per-subspace integer Lloyd codebooks +
        # exact per-(vector, subspace) squared reconstruction error
        from mmgraphrag_ray.stages.cluster import pq_assign_error

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"])
        return pq_assign_error(emb, n_subspaces=2, n_clusters=8,
                               refine_rounds=1)

    def emb_quantize_error_q(sf_dir):
        # int8-style global scalar quantization acceptance report: exact
        # per-vector reconstruction error on the 1e-6 grid
        from mmgraphrag_ray.stages.vecstats import scalar_quantize_error

        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"])
        return scalar_quantize_error(emb)

    return {
        "kg_files": kg_files,
        "kg_chunks": kg_chunks,
        "kg_mentions": kg_mentions,
        "kg_rel_mentions": kg_rel_mentions,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
        "kg_canonical_nodes": kg_canonical_nodes,
        "kg_alias_table": kg_alias_table,
        "kg_canonicalization_invariants": kg_canonicalization_invariants,
        "kg_entity_vecs": kg_entity_vecs,
        "kg_entity_vec_components": kg_entity_vec_components,
        "kg_entity_vecs_invariants": kg_entity_vecs_invariants,
        "dedup_exact_documents": dedup_exact_documents,
        "dedup_minhash_documents": dedup_minhash_documents,
        "doc_leakage_safe_split": doc_leakage_safe_split,
        "dedup_jaccard_documents": dedup_jaccard_documents,
        "doc_containment": doc_containment_q,
        "dedup_minhash_recall": dedup_minhash_recall_q,
        "code_unused_defs": code_unused_defs_q,
        "dedup_keep_best": dedup_keep_best_q,
        "dedup_simhash_documents": dedup_simhash_documents,
        "embedding_near_dup_pairs": embedding_near_dup_pairs,
        "distinct_lang_source": distinct_lang_source,
        "doc_text_stats": doc_stats,
        "token_count_by_lang": token_count_by_lang,
        "doc_quality": doc_quality,
        "doc_topk_ngrams": doc_topk_ngrams,
        "doc_fingerprint": doc_fingerprint,
        "doc_lang_id": doc_lang_id_q,
        "media_decode": media_decode,
        "orders_cdc_apply": orders_cdc_apply_q,
        "events_sessions_microbatch": relational.events_sessions_microbatch,
        "media_feature_vecs": media_feature_vecs,
        "media_feature_components": media_feature_components,
        "media_feature_vecs_invariants": media_feature_vecs_invariants,
        "dedup_cut_spans": dedup_cut_spans,
        "media_ppm_resize": media_ppm_resize,
        "media_wav_decode": media_wav_decode,
        "media_png_decode": media_png_decode,
        "media_jpeg_decode": media_jpeg_decode,
        "media_jpeg_resize": media_jpeg_resize,
        "kg_query_context": kg_query_context,
        "kg_mm_answer": kg_mm_answer,
        "kg_node_degrees": kg_node_degrees,
        "kg_pagerank": kg_pagerank,
        "kg_ppr": kg_ppr_q,
        "kg_label_prop": kg_label_prop,
        "kg_community_stats": kg_community_stats,
        "kg_triangles": kg_triangles,
        "kg_entity_pmi": kg_entity_pmi,
        "kg_ktruss": kg_ktruss_q,
        "kg_fuzzy_name_pairs": kg_fuzzy_name_pairs,
        "kg_entity_resolution": kg_entity_resolution,
        "kg_kcore": kg_kcore,
        "doc_mixture": doc_mixture_q,
        "doc_skipgrams": doc_skipgrams_q,
        "doc_dup_passages": doc_dup_passages_q,
        "dedup_incremental_minhash": dedup_incremental_minhash_q,
        "kg_two_hop": kg_two_hop,
        "kg_path_counts": kg_path_counts_q,
        "kg_betweenness": kg_betweenness_q,
        "kg_hyperball": kg_hyperball_q,
        "token_postings": token_postings_q,
        "doc_tfidf_topk": doc_tfidf_topk_q,
        "doc_bm25_topk": doc_bm25_topk_q,
        "doc_mmr_topk": doc_mmr_topk_q,
        "doc_curated_bm25": doc_curated_bm25_q,
        "doc_entropy": doc_entropy_q,
        "doc_vocab_setops": doc_vocab_setops_q,
        "doc_lang_confusion": doc_lang_confusion_q,
        "kg_extraction_coverage": kg_extraction_coverage_q,
        "events_decay": relational.events_decay,
        "events_transitions": relational.events_transitions,
        "doc_prf_terms": doc_prf_terms_q,
        "doc_prf_topk": doc_prf_topk_q,
        "doc_rrf_fusion": doc_rrf_fusion_q,
        "doc_repetition": doc_repetition,
        "doc_pack_sequences": doc_pack_sequences,
        "curated_pack_sequences": curated_pack_sequences,
        "doc_pack_manifest": doc_pack_manifest,
        "kg_enhanced_nodes": kg_enhanced_nodes,
        "kg_resolve_refs": kg_resolve_refs,
        "code_strip_comments": code_strip_comments,
        "code_import_indegree": code_import_indegree_q,
        "code_repo_pack": code_repo_pack_q,
        "code_dedup_lines": code_dedup_lines,
        "doc_decontaminate": doc_decontaminate,
        "doc_dsir_weights": doc_dsir_weights_q,
        "doc_dsir_topk": doc_dsir_topk_q,
        "bpe_pair_counts": bpe_pair_counts_q,
        "bpe_merges": bpe_merges_q,
        "doc_bpe_encode": doc_bpe_encode_q,
        "lineitem_corr_components": lineitem_corr_components_q,
        "code_secret_scan": code_secret_scan_q,
        "lineitem_price_histogram": lineitem_price_histogram_q,
        "events_path_trigrams": events_path_trigrams_q,
        "events_gap_stats": events_gap_stats_q,
        "lineitem_salted_part_join": lineitem_salted_part_join_q,
        "lineitem_price_mad": lineitem_price_mad_q,
        "doc_robust_outliers": doc_robust_outliers_q,
        "doc_token_budget": doc_token_budget_q,
        "doc_length_pct_rank": doc_length_pct_rank_q,
        "doc_shuffle_order": doc_shuffle_order_q,
        "doc_weighted_median_len": doc_weighted_median_len_q,
        "doc_split_assign": doc_split_assign_q,
        "doc_exact_stratified_sample": doc_stratified_sample_q,
        "events_strict_funnel": events_funnel_q,
        "join_size_events_customer": join_size_events_customer_q,
        "doc_sample_per_lang": doc_sample_per_lang_q,
        "events_window_dedup": events_window_dedup_q,
        "orders_cdc_diff": orders_cdc_diff_q,
        "media_resize": media_resize,
        "orders_cdc_ivm": relational.orders_cdc_ivm,
        "events_autocorr": relational.events_autocorr,
        "documents_schema_drift": relational.documents_schema_drift,
        "user_event_unpivot": relational.user_event_unpivot,
        "events_late_arrivals": relational.events_late_arrivals,
        "doc_tokenizer_fertility": relational.doc_tokenizer_fertility,
        "orders_cdc_compact": relational.orders_cdc_compact,
        "dedup_minhash_cluster_sizes": dedup_minhash_cluster_sizes,
        "doc_range_partition_plan": doc_range_partition_plan_q,
        "kg_sorted_neighborhood": kg_sorted_neighborhood,
        "emb_kmeans": emb_kmeans,
        "emb_covariance": emb_covariance_q,
        "documents_jsonl_roundtrip": documents_jsonl_roundtrip_q,
        "events_heavy_hitters": events_heavy_hitters_q,
        "lineitem_expectations": lineitem_expectations_q,
        "doc_commonness": doc_commonness_q,
        "doc_bigram_lm": doc_bigram_lm_q,
        "doc_quality_buckets": doc_quality_buckets_q,
        "kg_link_predict": kg_link_predict_q,
        "kg_random_walks": kg_random_walks_q,
        "fk_orphan_audit": fk_orphan_audit_q,
        "kg_modularity": kg_modularity_q,
        "orders_zorder": orders_zorder_q,
        "emb_pca_component": emb_pca_component_q,
        "emb_semdedup": emb_semdedup,
        "emb_mutual_knn": emb_mutual_knn_q,
        "emb_negatives": emb_negatives_q,
        "doc_sample": doc_sample,
        "ann_topk": ann_topk,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_pq_topk": ann_pq_topk_q,
        "knn_label": knn_label,
        "q1_pricing": relational.q1_pricing,
        "basket_part_pairs": relational.basket_part_pairs,
        "q3_shipping": relational.q3_shipping,
        "segment_order_stats": relational.segment_order_stats,
        "topk_orders": relational.topk_orders,
        "events_window": relational.events_window,
        "events_window_users": relational.events_window_users,
        "events_scd2": relational.events_scd2,
        "orders_monthly_share": relational.orders_monthly_share,
        "doc_boolean_and": doc_boolean_and_q,
        "repo_lang_profile": repo_lang_profile_q,
        "kg_wl_hashes": kg_wl_hashes_q,
        "emb_quantize_error": emb_quantize_error_q,
        "parts_skyline": parts_skyline_q,
        "code_complexity": code_complexity_q,
        "emb_pq_error": emb_pq_error_q,
        "doc_phrase_match": doc_phrase_match_q,
        "events_rfm": events_rfm_q,
        "doc_scan_prune": doc_scan_prune_q,
        "q6_revenue": q6_revenue_q,
        "doc_curation_funnel": relational.curation_funnel,
        "region_segment_stats": relational.region_segment_stats,
        "kg_type_pairs": kg_type_pairs_q,
        "code_clones": code_clones_q,
        "doc_winnow": doc_winnow_q,
        "events_lateness": events_lateness_q,
        "emb_ann_recall": emb_ann_recall_q,
        "emb_pq_recall": emb_pq_recall_q,
        "events_dwell": relational.events_dwell,
        "kg_assortativity": kg_assortativity_q,
        "code_import_hits": code_import_hits_q,
        "code_dep_depth": code_dep_depth_q,
        "code_identifier_vocab": code_identifier_vocab_q,
        "kg_clustering_coeff": kg_clustering_q,
        "kg_degree_dist": kg_degree_dist_q,
        "kg_type_degrees": kg_type_degree_q,
        "kg_typed_wedges": kg_typed_wedges_q,
        "emb_matryoshka_error": emb_matryoshka_q,
        "emb_label_scatter": emb_label_scatter_q,
        "events_props_stats": relational.events_props_stats,
        "events_trending": relational.events_trending,
        "q4_late_orders": relational.q4_late_orders,
        "q7_nation_flows": relational.q7_nation_flows,
        "lineitem_winsorized": relational.lineitem_winsorized,
        "customer_revenue_gini": relational.customer_revenue_gini,
        "customer_pareto_80": relational.customer_pareto_80,
        "events_spike_days": relational.events_spike_days,
        "events_type_overlap": relational.events_type_overlap,
        "orders_weekday_profile": relational.orders_weekday_profile,
        "events_sliding_users": relational.events_sliding_users,
        "events_user_span": relational.events_user_span,
        "lineitem_share_of_order": relational.lineitem_share_of_order,
        "doc_compaction_plan": doc_compaction_plan_q,
        "q5_nation_volume": relational.q5_nation_volume,
        "q8_market_share": relational.q8_market_share,
        "q9_profit_by_nation_year": relational.q9_profit_by_nation_year,
        "q10_returned_items": relational.q10_returned_items,
        "q12_priority_lines": relational.q12_priority_lines,
        "q15_top_supplier": relational.q15_top_supplier,
        "q17_small_qty_cents": relational.q17_small_qty_cents,
        "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
        "q21_waiting_supplier": relational.q21_waiting_supplier,
        "q22_idle_customers": relational.q22_idle_customers,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q20_part_share_suppliers": relational.q20_part_share_suppliers,
        "basket_part_triples": relational.basket_part_triples,
        "events_ohlc": relational.events_ohlc,
        "events_drawdown": relational.events_drawdown,
        "events_rolling_7d": relational.events_rolling_7d,
        "lineitem_quantile_cont": relational.lineitem_quantile_cont,
        "ann_filtered_topk": ann_filtered_topk,
        "code_api_surface": code_api_surface_q,
        "q13_order_distribution": relational.q13_order_distribution,
        "q14_promo_share": relational.q14_promo_share,
        "q18_big_orders": relational.q18_big_orders,
        "events_sessions": relational.events_sessions,
        "events_sliding_window": relational.events_sliding_window,
        "events_hll_registers": relational.events_hll_registers,
        "customer_bloom_semi_events": relational.customer_bloom_semi_events,
        "events_cm_registers": relational.events_cm_registers,
        "doc_consistent_sample": relational.doc_consistent_sample,
        "doc_stratified_sample": relational.doc_stratified_sample,
        "events_asof_orders": relational.events_asof_orders,
        "lineitem_ship_range_join": relational.lineitem_ship_range_join,
        "topk_orders_per_segment": relational.topk_orders_per_segment,
        "user_running_stats": relational.user_running_stats,
        "segment_price_quantiles": relational.segment_price_quantiles,
        "orders_ship_lag": relational.orders_ship_lag,
        "events_sessions_in_spikes": relational.events_sessions_in_spikes,
        "price_global_quantiles": relational.price_global_quantiles,
        "user_event_pivot": relational.user_event_pivot,
        "orders_rollup": relational.orders_rollup,
        "doc_weighted_sample": relational.doc_weighted_sample,
        "documents_checksum": relational.documents_checksum,
        "customer_order_counts": relational.customer_order_counts,
        "lineitem_price_decile": relational.lineitem_price_decile,
        "events_user_retention": relational.events_user_retention,
        "events_funnel": relational.events_funnel,
        "documents_profile": relational.documents_profile,
        "doc_curation": relational.doc_curation,
        "user_customer_outer": relational.user_customer_outer,
        "code_call_cycles": code_call_cycles_q,
        "orders_cube": relational.orders_cube,
        "lineitem_regression": relational.lineitem_regression,
        "events_cusum": relational.events_cusum,
        "orders_backlog": relational.orders_backlog,
        "basket_rules": relational.basket_rules,
        "q11_important_parts": relational.q11_important_parts,
        "q16_supplier_counts": relational.q16_supplier_counts,
        "user_top_event": relational.user_top_event,
        "kg_conductance": kg_conductance_q,
        "events_ab_test": relational.events_ab_test,
        "kg_incremental_edges": kg_incremental_edges_q,
        "media_frame_sample": media_frame_sample,
        "code_vendored_files": code_vendored_files_q,
        "kg_square_census": kg_square_census_q,
        "doc_select_maxcover": doc_select_maxcover_q,
    }


# shared CTE chain for the integer Lloyd oracles (emb_kmeans /
# emb_semdedup): quantize -> init centroids = 8 smallest vec_ids ->
# assign -> integer-mean centroids -> final assignment a2(vec_id, cid, dist)
_KMEANS_CTE = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x ->
         CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
),
qe AS (
  SELECT vec_id, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS d
  FROM q
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vec_id
  FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8)
),
ce0 AS (SELECT c0.cid, qe.d, qe.v AS cv FROM c0 JOIN qe USING (vec_id)),
d1 AS (
  SELECT qe.vec_id, ce0.cid,
         sum((qe.v - ce0.cv) * (qe.v - ce0.cv)) AS dist
  FROM qe JOIN ce0 USING (d) GROUP BY qe.vec_id, ce0.cid
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1
  ) WHERE rn = 1
),
-- an EMPTY cluster keeps its round-0 centroid (mirrors cluster.py:
-- "an empty cluster keeps its previous centroid"); without the LEFT JOIN
-- + COALESCE an empty cid would vanish from the argmin candidate set here
-- while the Ray side still considers it
ce1 AS (
  SELECT ce0.cid, ce0.d, COALESCE(m.cv, ce0.cv) AS cv
  FROM ce0 LEFT JOIN (
    SELECT a1.cid, qe.d,
           CAST(floor(CAST(sum(qe.v) AS DOUBLE) / count(*)) AS BIGINT) AS cv
    FROM a1 JOIN qe USING (vec_id) GROUP BY a1.cid, qe.d
  ) m ON m.cid = ce0.cid AND m.d = ce0.d
),
d2 AS (
  SELECT qe.vec_id, ce1.cid,
         sum((qe.v - ce1.cv) * (qe.v - ce1.cv)) AS dist
  FROM qe JOIN ce1 USING (d) GROUP BY qe.vec_id, ce1.cid
),
a2 AS (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2
  ) WHERE rn = 1
)"""




# shared integer bigram-LM scoring CTE (mirror of stages/index.py
# bigram_lm_scores: corpus bigram counts -> fixed-point conditional
# probability sum per doc); used by doc_bigram_lm and doc_quality_buckets
_BIGRAM_LM_CTE = """
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z]+') AS toks
              FROM documents
            ),
            b AS (
              SELECT doc_id, bg[1] || ' ' || bg[2] AS bigram, bg[1] AS lft
              FROM (
                SELECT doc_id, unnest(list_zip(toks[1:-2], toks[2:])) AS bg
                FROM t WHERE len(toks) >= 2
              )
            ),
            c2 AS (
              SELECT bigram, any_value(lft) AS lft, count(*) AS n2
              FROM b GROUP BY bigram
            ),
            c1 AS (
              SELECT lft, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY lft
            ),
            dk AS (
              SELECT doc_id, bigram, count(*) AS k
              FROM b GROUP BY doc_id, bigram
            ),
            lm AS (
              SELECT dk.doc_id,
                     CAST(sum(dk.k) AS BIGINT) AS n_bigrams,
                     CAST(sum(dk.k * ((1000000 * CAST(c2.n2 AS HUGEINT))
                                      // c1.n1)) AS BIGINT) AS lm_score
              FROM dk
              JOIN c2 USING (bigram)
              JOIN c1 ON c1.lft = c2.lft
              GROUP BY dk.doc_id
            )"""


# shared curation-flags SQL (doc_curation and compositions over it)
_CURATION_SQL = """
            WITH base AS (
              SELECT doc_id, lang, md5(text) AS h,
                     len(regexp_extract_all(text, '[A-Za-z]+')) AS nw,
                     len(regexp_extract_all(text, '[A-Za-z0-9]')) AS na,
                     length(text) AS nc
              FROM documents
            ),
            surv AS (SELECT h, min(doc_id) AS keep_id FROM base GROUP BY h),
            w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            idx AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - 3, least(len(ws), 1)) + 1)) AS i
              FROM w
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ws, i, i + 3), ' ') AS s
              FROM idx
            ),
            bset AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS n_hits
              FROM sh JOIN bset USING (s) GROUP BY sh.doc_id
            ),
            flags AS (
              SELECT b.doc_id,
                     CASE WHEN b.doc_id = s.keep_id THEN 1 ELSE 0 END AS keep_exact,
                     CASE WHEN b.lang IN ('en', 'es', 'de') THEN 1 ELSE 0 END AS keep_lang,
                     CASE WHEN b.nw >= 20 AND 100 * b.na >= 82 * b.nc
                          THEN 1 ELSE 0 END AS keep_quality,
                     CASE WHEN b.doc_id % 97 <> 0
                               AND coalesce(h.n_hits, 0) = 0
                          THEN 1 ELSE 0 END AS keep_decon
              FROM base b
              JOIN surv s ON s.h = b.h
              LEFT JOIN hits h ON h.doc_id = b.doc_id
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(keep_exact AS BIGINT) AS keep_exact,
                   CAST(keep_lang AS BIGINT) AS keep_lang,
                   CAST(keep_quality AS BIGINT) AS keep_quality,
                   CAST(keep_decon AS BIGINT) AS keep_decon,
                   CAST(keep_exact * keep_lang * keep_quality * keep_decon
                        AS BIGINT) AS keep
            FROM flags
        """


# Shared CTE prefix for the PRF mirrors: the full BM25 pass (identical to
# the doc_bm25_topk mirror), top-5 feedback docs per query, and the
# non-query-term tf sums over them
_PRF_PREFIX = """
            WITH q(qid, term) AS (VALUES
              ('q_hash','hash'), ('q_hash','join'), ('q_hash','batch'),
              ('q_stream','window'), ('q_stream','stream'), ('q_stream','spark'),
              ('q_vec','vector'), ('q_vec','filter')),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            st AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM toks) AS l),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            sc AS (
              SELECT q.qid, tf.doc_id,
                     ((CAST(st.n AS HUGEINT) * 100000 // df.df)
                      * (44 * CAST(tf.tf AS HUGEINT) * st.l))
                     // (20 * CAST(st.l AS HUGEINT) * tf.tf
                         + 6 * CAST(st.l AS HUGEINT)
                         + 18 * CAST(dl.dl AS HUGEINT) * st.n) AS ts
              FROM q JOIN tf USING (term) JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id, st
            ),
            agg AS (
              SELECT qid, doc_id, CAST(sum(ts) AS BIGINT) AS score
              FROM sc GROUP BY 1, 2
            ),
            fb AS (
              SELECT qid, doc_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY score DESC, doc_id
                ) AS rank FROM agg
              ) WHERE rank <= 5
            ),
            exw AS (
              SELECT f.qid, t.term, count(*) AS w
              FROM fb f JOIN toks t USING (doc_id)
              LEFT JOIN q qo ON qo.qid = f.qid AND qo.term = t.term
              WHERE qo.term IS NULL
              GROUP BY 1, 2
            )
"""


def oracle_sql() -> dict[str, str]:
    from mmgraphrag_ray.stages.textstats import DIGIT_RE, PUNCT_RE, WORD_RE
    from mmgraphrag_ray.tokenizer import TOKEN_PATTERN

    corpus = _corpus(SF001)  # idempotent generation so DuckDB can read it
    # prune fixture follows the target sf (same env contract as the IVF
    # centroid literals) so the mirror reads the footers the planner reads
    import os as _os

    from mmgraphrag_ray.stages.layout import ensure_partitioned_docs

    _prune_dir = ensure_partitioned_docs(
        _os.environ.get("RAYKG_ORACLE_SF", SF001), n_parts=8
    )
    kg = _kg_cte(corpus)
    merge = _kg_merge_cte()
    pat = TOKEN_PATTERN

    from mmgraphrag_ray.stages.layout import zorder_sql_expr

    _zexpr = zorder_sql_expr("o_custkey", "o_totalprice", bits=16)

    out = {
        "kg_files": kg + "\nSELECT * FROM files",
        "kg_chunks": kg + "\nSELECT * FROM chunks",
        "kg_mentions": kg + "\nSELECT * FROM ent_mentions",
        "kg_rel_mentions": kg + "\nSELECT * FROM rel_mentions",
        "kg_nodes": kg + merge + "\nSELECT * FROM nodes",
        "kg_enhanced_nodes": kg + merge + f""",
ren AS (
  SELECT CASE WHEN entity_type = '"UNKNOWN"'
              THEN substr(entity_name, 1, length(entity_name) - 1) || '_R"'
              ELSE entity_name END AS new_name,
         entity_type,
         CASE WHEN entity_type = '"UNKNOWN"'
              THEN '"Enhanced: unresolved reference."'
              ELSE description END AS description,
         source_id
  FROM nodes
),
tmode AS (
  SELECT new_name, entity_type FROM (
    SELECT new_name, entity_type, count(*) AS c,
           row_number() OVER (PARTITION BY new_name ORDER BY count(*) DESC, entity_type ASC) AS rn
    FROM ren GROUP BY new_name, entity_type
  ) WHERE rn = 1
),
dsegs AS (
  SELECT DISTINCT new_name, unnest(string_split(description, '<SEP>')) AS seg FROM ren
),
ssegs AS (
  SELECT DISTINCT new_name, unnest(string_split(source_id, '<SEP>')) AS seg FROM ren
),
dagg AS (
  SELECT new_name, string_agg(seg, '<SEP>' ORDER BY seg) AS description FROM dsegs GROUP BY 1
),
sagg AS (
  SELECT new_name, string_agg(seg, '<SEP>' ORDER BY seg) AS source_id FROM ssegs GROUP BY 1
)
SELECT d.new_name AS entity_name, t.entity_type,
       {_trunc('d.description')} AS description, s.source_id
FROM dagg d JOIN tmode t ON t.new_name = d.new_name
JOIN sagg s ON s.new_name = d.new_name
""",
        "kg_node_degrees": kg + merge + """
            SELECT entity_name, count(*) AS degree FROM (
              SELECT src_id AS entity_name FROM edges
              UNION ALL SELECT tgt_id FROM edges
            ) GROUP BY 1
        """,
        # integer PageRank, 3 unrolled power steps: contribution =
        # (85*r//100)//deg, teleport = ((1e12*15)//100)//N — all-integer, so
        # both engines lose identical floor mass and sums are order-free
        "kg_pagerank": kg + merge + _pagerank_sql(iterations=3),
        "kg_ppr": kg + merge + _ppr_sql(iterations=3),
        # fixed-round min-label propagation (distributed-CC building block):
        # 4 unrolled join+grouped-min iterations
        "kg_label_prop": kg + merge + _label_prop_sql(rounds=4),
        # mirror of stages/graphalgo.community_stats: per-label community
        # size, internal edge count and summed member degree over the
        # 4-round label-prop partition
        "kg_community_stats": kg + merge
        + _label_prop_sql(rounds=4, final=False)
        + """,
            lab AS MATERIALIZED (SELECT node, label FROM lp_r4),
            nn AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1),
            te AS MATERIALIZED (
              SELECT a.label AS lu, b.label AS lv
              FROM edges e
              JOIN lab a ON a.node = e.src_id
              JOIN lab b ON b.node = e.tgt_id
            ),
            ie AS (SELECT lu AS label, count(*) AS internal_edges
                   FROM te WHERE lu = lv GROUP BY 1),
            dg AS (SELECT label, count(*) AS degree_sum FROM (
                     SELECT lu AS label FROM te
                     UNION ALL SELECT lv AS label FROM te
                   ) GROUP BY 1)
            SELECT nn.label, nn.n_nodes,
                   COALESCE(ie.internal_edges, 0) AS internal_edges,
                   COALESCE(dg.degree_sum, 0) AS degree_sum
            FROM nn LEFT JOIN ie USING (label) LEFT JOIN dg USING (label)
        """,
        # rational Newman modularity of the same 4-round partition:
        # q_num = sum_c (4 m e_c - d_c^2), Q = q_num / (4 m^2); products
        # in HUGEINT mirror the Python-int products on the Ray side
        "kg_modularity": kg + merge
        + _label_prop_sql(rounds=4, final=False)
        + """,
            lab AS MATERIALIZED (SELECT node, label FROM lp_r4),
            nn AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1),
            te AS MATERIALIZED (
              SELECT a.label AS lu, b.label AS lv
              FROM edges e
              JOIN lab a ON a.node = e.src_id
              JOIN lab b ON b.node = e.tgt_id
            ),
            ie AS (SELECT lu AS label, count(*) AS internal_edges
                   FROM te WHERE lu = lv GROUP BY 1),
            dg AS (SELECT label, count(*) AS degree_sum FROM (
                     SELECT lu AS label FROM te
                     UNION ALL SELECT lv AS label FROM te
                   ) GROUP BY 1),
            mm AS (SELECT count(*) AS m FROM edges),
            cs AS (
              SELECT nn.label,
                     COALESCE(ie.internal_edges, 0) AS e_c,
                     COALESCE(dg.degree_sum, 0) AS d_c
              FROM nn LEFT JOIN ie USING (label) LEFT JOIN dg USING (label)
            )
            SELECT CAST(sum(4 * CAST(mm.m AS HUGEINT) * cs.e_c
                            - CAST(cs.d_c AS HUGEINT) * cs.d_c) AS BIGINT)
                     AS q_num,
                   CAST(mm.m AS BIGINT) AS m_edges
            FROM cs, mm GROUP BY mm.m
        """,
        # degree-ordered triangle counting: orientation keys kill hub
        # explosion; each triangle counted once from its min-key corner
        "kg_triangles": kg + merge + _triangles_sql(),
        # fixed-round 3-truss peel: two unrolled support-recompute rounds
        # (canonical a<b edges; each triangle a<b<c enumerated once as
        # (a,b)x(b,c)x(a,c) — same triangle SET as the degree-ordered Ray
        # plan, so the per-edge supports agree)
        "kg_ktruss": kg + merge + """,
kt_e0 AS MATERIALIZED (
  SELECT DISTINCT least(src_id, tgt_id) AS a,
                  greatest(src_id, tgt_id) AS b
  FROM edges WHERE src_id <> tgt_id
),
kt_t0 AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM kt_e0 e1
  JOIN kt_e0 e2 ON e2.a = e1.b
  JOIN kt_e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
kt_s0 AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT x AS a, y AS b FROM kt_t0
    UNION ALL SELECT x, z FROM kt_t0
    UNION ALL SELECT y, z FROM kt_t0
  ) GROUP BY 1, 2
),
kt_e1 AS MATERIALIZED (
  SELECT a, b FROM kt_s0 WHERE support >= 1
),
kt_t1 AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM kt_e1 e1
  JOIN kt_e1 e2 ON e2.a = e1.b
  JOIN kt_e1 e3 ON e3.a = e1.a AND e3.b = e2.b
),
kt_s1 AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT x AS a, y AS b FROM kt_t1
    UNION ALL SELECT x, z FROM kt_t1
    UNION ALL SELECT y, z FROM kt_t1
  ) GROUP BY 1, 2
)
SELECT a, b, support FROM kt_s1 WHERE support >= 1
        """,
        # typed wedge census: per-center type tallies -> pair products
        "kg_typed_wedges": kg + merge + """,
eb AS (
  SELECT src_id AS center, tgt_id AS nbr FROM edges
  UNION SELECT tgt_id, src_id FROM edges
),
cnt AS (
  SELECT eb.center, tc.entity_type AS ct, tn.entity_type AS nt,
         CAST(count(*) AS BIGINT) AS n
  FROM eb
  JOIN nodes tc ON tc.entity_name = eb.center
  JOIN nodes tn ON tn.entity_name = eb.nbr
  GROUP BY 1, 2, 3
),
w AS (
  SELECT a.ct AS center_type, a.nt AS type_a, b.nt AS type_b,
         CASE WHEN a.nt = b.nt THEN a.n * (a.n - 1) // 2
              ELSE a.n * b.n END AS w
  FROM cnt a JOIN cnt b ON a.center = b.center AND a.ct = b.ct
                       AND a.nt <= b.nt
)
SELECT center_type, type_a, type_b, CAST(sum(w) AS BIGINT) AS n_wedges
FROM w GROUP BY 1, 2, 3 HAVING sum(w) > 0
        """,
        # extraction recall audit over the kg chain's chunks/mentions
        "kg_extraction_coverage": kg + """,
pc AS (
  SELECT source_id AS chunk_id, CAST(count(*) AS BIGINT) AS nm
  FROM ent_mentions GROUP BY 1
)
SELECT c.repo, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN pc.nm IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered,
       CAST(sum(coalesce(pc.nm, 0)) AS BIGINT) AS n_mentions
FROM chunks c LEFT JOIN pc USING (chunk_id)
GROUP BY 1
        """,
        # node-side ontology profile (degree-0 nodes via left join)
        "kg_type_degrees": kg + merge + """,
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT src_id AS node FROM edges
    UNION ALL SELECT tgt_id FROM edges
  ) GROUP BY 1
)
SELECT n.entity_type, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(coalesce(d.degree, 0)) AS BIGINT) AS total_degree,
       CAST(max(coalesce(d.degree, 0)) AS BIGINT) AS max_degree
FROM nodes n LEFT JOIN deg d ON d.node = n.entity_name
GROUP BY 1
        """,
        # log2-bucketed degree distribution (bucket = length(bin(d)))
        "kg_degree_dist": kg + merge + """,
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT src_id AS node FROM edges
    UNION ALL SELECT tgt_id FROM edges
  ) GROUP BY 1
)
SELECT CAST(length(bin(degree)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(degree) AS BIGINT) AS min_degree,
       CAST(max(degree) AS BIGINT) AS max_degree
FROM deg GROUP BY 1
        """,
        # clustering coefficient composed textually from the triangle
        # mirror (tr_deg doubles as the degree table)
        "kg_clustering_coeff": kg + merge + _triangles_sql().replace(
            """SELECT node, count(*) AS n_triangles FROM tr_corners GROUP BY 1""",
            """, tri AS (SELECT node, count(*) AS n_triangles
        FROM tr_corners GROUP BY 1),
cdeg AS (SELECT u AS node, d AS degree FROM tr_deg WHERE d >= 2)
SELECT c.node AS entity_name, CAST(c.degree AS BIGINT) AS degree,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(2 * coalesce(t.n_triangles, 0) * 1000000
            // (c.degree * (c.degree - 1)) AS BIGINT) AS cc_ppm
FROM cdeg c LEFT JOIN tri t USING (node)"""),
        # fixed-round k-core peel (k=2, 3 rounds), unrolled; UNION ALL
        # bidirection mirrors graphalgo.k_core_peel exactly
        "kg_kcore": kg + merge + """,
eb0 AS (SELECT src_id AS u, tgt_id AS v FROM edges
        UNION ALL SELECT tgt_id, src_id FROM edges),
d1 AS (SELECT u, count(*) AS deg FROM eb0 GROUP BY 1),
kp1 AS (SELECT u FROM d1 WHERE deg >= 2),
e1 AS (SELECT e.u, e.v FROM eb0 e
         JOIN kp1 a ON a.u = e.u JOIN kp1 b ON b.u = e.v),
d2 AS (SELECT u, count(*) AS deg FROM e1 GROUP BY 1),
kp2 AS (SELECT u FROM d2 WHERE deg >= 2),
e2 AS (SELECT e.u, e.v FROM e1 e
         JOIN kp2 a ON a.u = e.u JOIN kp2 b ON b.u = e.v),
d3 AS (SELECT u, count(*) AS deg FROM e2 GROUP BY 1),
kp3 AS (SELECT u FROM d3 WHERE deg >= 2),
e3 AS (SELECT e.u, e.v FROM e2 e
         JOIN kp3 a ON a.u = e.u JOIN kp3 b ON b.u = e.v),
fin AS (SELECT u AS node, count(*) AS deg FROM e3 GROUP BY 1)
SELECT node, deg FROM fin""",
        # sorted-neighborhood blocking: rank by entity_name, pairs with
        # rank distance 1..3 (blocking.sorted_neighborhood_pairs)
        "kg_sorted_neighborhood": kg + merge + """,
rk AS (
  SELECT entity_name, row_number() OVER (ORDER BY entity_name) - 1 AS rank
  FROM nodes
)
SELECT a.entity_name AS ka, a.entity_name AS ida,
       b.entity_name AS kb, b.entity_name AS idb,
       b.rank - a.rank AS dist
FROM rk a JOIN rk b ON b.rank > a.rank AND b.rank <= a.rank + 3""",
        # sorted-neighborhood candidates verified by levenshtein <= 2
        "kg_fuzzy_name_pairs": kg + merge + """,
rk AS (
  SELECT entity_name, row_number() OVER (ORDER BY entity_name) - 1 AS rank
  FROM nodes
)
SELECT ka, ida, kb, idb, dist, edit FROM (
  SELECT a.entity_name AS ka, a.entity_name AS ida,
         b.entity_name AS kb, b.entity_name AS idb,
         b.rank - a.rank AS dist,
         CAST(levenshtein(a.entity_name, b.entity_name) AS BIGINT) AS edit
  FROM rk a JOIN rk b ON b.rank > a.rank AND b.rank <= a.rank + 3
) WHERE edit <= 2""",
        # ER composition mirror: the fuzzy-pair CTE + recursive min-label
        # transitive closure (same closure pattern as the minhash CC
        # oracle), clusters of >= 2 with rep = min member
        "kg_entity_resolution": kg.replace(
            "\nWITH ", "\nWITH RECURSIVE ", 1) + merge + """,
er_names AS MATERIALIZED (
  SELECT entity_name FROM nodes
),
rk AS MATERIALIZED (
  SELECT entity_name, row_number() OVER (ORDER BY entity_name) - 1 AS rank
  FROM er_names
),
fz AS MATERIALIZED (
  SELECT a.entity_name AS ida, b.entity_name AS idb
  FROM rk a JOIN rk b ON b.rank > a.rank AND b.rank <= a.rank + 3
  WHERE levenshtein(a.entity_name, b.entity_name) <= 2
),
er_edges AS MATERIALIZED (
  SELECT ida AS u, idb AS v FROM fz
  UNION ALL SELECT idb, ida FROM fz
),
reach(id, r) AS (
  SELECT entity_name, entity_name FROM er_names
  UNION
  SELECT e.v, reach.r FROM reach JOIN er_edges e ON e.u = reach.id
),
er_lbl AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
SELECT rep, CAST(count(*) AS BIGINT) AS n_members,
       max(id) AS max_member
FROM er_lbl GROUP BY rep HAVING count(*) >= 2
        """,
        # integer PMI surrogate over chunk co-occurrence: one floor, HUGEINT
        # product (graphalgo.entity_cooccurrence_pmi)
        "kg_entity_pmi": kg + """,
em AS (SELECT DISTINCT entity_name AS e, source_id AS c FROM ent_mentions),
nx AS (SELECT e, count(*) AS nx FROM em GROUP BY 1),
nc AS (SELECT count(DISTINCT c) AS n_chunks FROM em),
pr AS (
  SELECT a.e AS ea, b.e AS eb, count(*) AS n_xy
  FROM em a JOIN em b ON a.c = b.c AND a.e < b.e
  GROUP BY 1, 2
),
sc AS (
  SELECT ea, eb, n_xy, xa.nx AS n_x, xb.nx AS n_y,
         CAST((CAST(pr.n_xy AS HUGEINT) * nc.n_chunks * 1000000)
              // (CAST(xa.nx AS HUGEINT) * xb.nx) AS BIGINT) AS pmi
  FROM pr JOIN nx xa ON xa.e = pr.ea JOIN nx xb ON xb.e = pr.eb, nc
  WHERE pr.n_xy >= 2
)
SELECT ea, eb, n_xy, n_x, n_y, pmi, rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, ea, eb) AS rank FROM sc
) WHERE rank <= 20""",
        # link_prediction_scores mirror: resource-allocation index over
        # common neighbors with deg(z) in [2, 64] (part of the statistic's
        # definition, same filter both engines), existing edges excluded
        "kg_link_predict": kg + merge + """,
adjlp AS (
  SELECT src_id AS z, tgt_id AS x FROM edges
  UNION ALL SELECT tgt_id, src_id FROM edges
),
deglp AS (SELECT z, count(*) AS d FROM adjlp GROUP BY z),
candlp AS (
  SELECT a.x AS ea, b.x AS eb, CAST(1000000 AS BIGINT) // d.d AS ra1
  FROM adjlp a
  JOIN adjlp b ON a.z = b.z AND a.x < b.x
  JOIN deglp d ON d.z = a.z
  WHERE d.d <= 64
),
agglp AS (
  SELECT ea, eb, count(*) AS cn, CAST(sum(ra1) AS BIGINT) AS ra
  FROM candlp GROUP BY ea, eb
),
newlp AS (
  SELECT g.* FROM agglp g
  LEFT JOIN edges e ON e.src_id = g.ea AND e.tgt_id = g.eb
  WHERE e.src_id IS NULL
)
SELECT ea, eb, cn, ra, rank FROM (
  SELECT *, row_number() OVER (ORDER BY ra DESC, ea, eb) AS rank FROM newlp
) WHERE rank <= 20""",
        # random_walks mirror (length=3): ranked adjacency via row_number,
        # three unrolled steps picking neighbor 1 + md5int(walk'#'t) % deg
        "kg_random_walks": kg + merge + """,
adjw AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id, src_id FROM edges
),
adjr AS (
  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rnk
  FROM adjw
),
degw AS (SELECT u, count(*) AS deg FROM adjw GROUP BY u),
w0 AS (SELECT u AS walk_id, u AS node FROM degw),
w1 AS (
  SELECT w0.walk_id, a.v AS node
  FROM w0 JOIN degw d ON d.u = w0.node
  JOIN adjr a ON a.u = w0.node AND a.rnk = 1 +
    CAST(('0x' || substr(md5(w0.walk_id || '#1'), 1, 8)) AS UBIGINT) % d.deg
),
w2 AS (
  SELECT w1.walk_id, a.v AS node
  FROM w1 JOIN degw d ON d.u = w1.node
  JOIN adjr a ON a.u = w1.node AND a.rnk = 1 +
    CAST(('0x' || substr(md5(w1.walk_id || '#2'), 1, 8)) AS UBIGINT) % d.deg
),
w3 AS (
  SELECT w2.walk_id, a.v AS node
  FROM w2 JOIN degw d ON d.u = w2.node
  JOIN adjr a ON a.u = w2.node AND a.rnk = 1 +
    CAST(('0x' || substr(md5(w2.walk_id || '#3'), 1, 8)) AS UBIGINT) % d.deg
)
SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
UNION ALL SELECT walk_id, 1, node FROM w1
UNION ALL SELECT walk_id, 2, node FROM w2
UNION ALL SELECT walk_id, 3, node FROM w3
        """,
        # k_hop_distances mirror (k=2, seeds = CLASS nodes): two unrolled
        # frontier joins over the bidirected edges, min hop per node
        "kg_two_hop": kg + merge + """,
seeds AS (SELECT entity_name AS u FROM nodes WHERE entity_type = '"CLASS"'),
eb AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION SELECT tgt_id, src_id FROM edges
),
h1 AS (SELECT DISTINCT eb.v AS u FROM seeds JOIN eb USING (u)),
h2 AS (SELECT DISTINCT eb.v AS u FROM h1 JOIN eb ON eb.u = h1.u),
lab AS (
  SELECT u, 0 AS hop FROM seeds
  UNION ALL SELECT u, 1 FROM h1
  UNION ALL SELECT u, 2 FROM h2
)
SELECT u AS entity_name, CAST(min(hop) AS BIGINT) AS hop FROM lab GROUP BY u
        """,
        # k_hop_path_counts mirror (Brandes σ, k=2): per level, σ(v) =
        # Σ σ(hop−1 predecessors), levels exclude already-visited nodes
        "kg_path_counts": kg + merge + """,
seeds AS (SELECT DISTINCT entity_name AS u FROM nodes
          WHERE entity_type = '"CLASS"'),
eb AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION SELECT tgt_id, src_id FROM edges
),
l0 AS (SELECT u, CAST(1 AS BIGINT) AS sigma FROM seeds),
c1 AS (SELECT eb.v AS u, CAST(sum(l0.sigma) AS BIGINT) AS sigma
       FROM l0 JOIN eb USING (u) GROUP BY 1),
l1 AS (SELECT c1.u, c1.sigma FROM c1
       WHERE c1.u NOT IN (SELECT u FROM l0)),
c2 AS (SELECT eb.v AS u, CAST(sum(l1.sigma) AS BIGINT) AS sigma
       FROM l1 JOIN eb ON eb.u = l1.u GROUP BY 1),
l2 AS (SELECT c2.u, c2.sigma FROM c2
       WHERE c2.u NOT IN (SELECT u FROM l0)
         AND c2.u NOT IN (SELECT u FROM l1))
SELECT u AS entity_name, CAST(0 AS BIGINT) AS hop, sigma FROM l0
UNION ALL SELECT u, CAST(1 AS BIGINT), sigma FROM l1
UNION ALL SELECT u, CAST(2 AS BIGINT), sigma FROM l2
        """,
        # hyperball_registers mirror: the events_hll_registers hash rule
        # seeded per node, then 2 unrolled register-max merge rounds over
        # the undirected edge set; integer sufficient stats out
        "kg_hyperball": kg + merge + """,
nodesu AS (SELECT DISTINCT entity_name AS u FROM nodes),
eb AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION SELECT tgt_id, src_id FROM edges
),
hh AS (
  SELECT u, CAST(('0x' || substr(md5(u), 1, 16)) AS UBIGINT) AS hv
  FROM nodesu
),
r0 AS (
  SELECT u, CAST(hv % 64 AS BIGINT) AS register,
         CAST(CASE WHEN hv // 64 = 0 THEN 59
              ELSE 59 - length(bin(hv // 64)) END AS BIGINT) AS rho
  FROM hh
),
r1 AS (
  SELECT u, register, max(rho) AS rho FROM (
    SELECT u, register, rho FROM r0
    UNION ALL SELECT eb.u, r0.register, r0.rho FROM eb JOIN r0 ON r0.u = eb.v
  ) GROUP BY 1, 2
),
r2 AS (
  SELECT u, register, max(rho) AS rho FROM (
    SELECT u, register, rho FROM r1
    UNION ALL SELECT eb.u, r1.register, r1.rho FROM eb JOIN r1 ON r1.u = eb.v
  ) GROUP BY 1, 2
)
SELECT u AS entity_name, CAST(count(*) AS BIGINT) AS n_registers,
       CAST(sum(rho) AS BIGINT) AS sum_rho
FROM r2 GROUP BY 1
        """,
        # betweenness_ppm mirror: same sigma rounds as kg_path_counts,
        # then the 2 unrolled backward rounds — per-term floored HUGEINT
        # (sigma_u*(1e6+delta_v))//sigma_v summed per predecessor
        "kg_betweenness": kg + merge + """,
seeds AS (SELECT DISTINCT entity_name AS u FROM nodes
          WHERE entity_type = '"CLASS"'),
eb AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION SELECT tgt_id, src_id FROM edges
),
l0 AS (SELECT u, CAST(1 AS BIGINT) AS sigma FROM seeds),
c1 AS (SELECT eb.v AS u, CAST(sum(l0.sigma) AS BIGINT) AS sigma
       FROM l0 JOIN eb USING (u) GROUP BY 1),
l1 AS (SELECT c1.u, c1.sigma FROM c1
       WHERE c1.u NOT IN (SELECT u FROM l0)),
c2 AS (SELECT eb.v AS u, CAST(sum(l1.sigma) AS BIGINT) AS sigma
       FROM l1 JOIN eb ON eb.u = l1.u GROUP BY 1),
l2 AS (SELECT c2.u, c2.sigma FROM c2
       WHERE c2.u NOT IN (SELECT u FROM l0)
         AND c2.u NOT IN (SELECT u FROM l1)),
d1 AS (
  SELECT l1.u,
         CAST(sum((CAST(l1.sigma AS HUGEINT) * (1000000 + 0))
                  // l2.sigma) AS BIGINT) AS delta
  FROM l1 JOIN eb ON eb.u = l1.u
  JOIN l2 ON l2.u = eb.v
  GROUP BY 1
),
d0 AS (
  SELECT l0.u,
         CAST(sum((CAST(l0.sigma AS HUGEINT)
                   * (1000000 + coalesce(d1.delta, 0)))
                  // l1.sigma) AS BIGINT) AS delta
  FROM l0 JOIN eb ON eb.u = l0.u
  JOIN l1 ON l1.u = eb.v
  LEFT JOIN d1 ON d1.u = eb.v
  GROUP BY 1
)
SELECT l0.u AS entity_name, CAST(0 AS BIGINT) AS hop, l0.sigma,
       CAST(coalesce(d0.delta, 0) AS BIGINT) AS delta_ppm
FROM l0 LEFT JOIN d0 ON d0.u = l0.u
UNION ALL
SELECT l1.u, CAST(1 AS BIGINT), l1.sigma,
       CAST(coalesce(d1.delta, 0) AS BIGINT)
FROM l1 LEFT JOIN d1 ON d1.u = l1.u
UNION ALL
SELECT u, CAST(2 AS BIGINT), sigma, CAST(0 AS BIGINT) FROM l2
        """,
        # 1-round Weisfeiler-Lehman refinement: md5(own type || '|' ||
        # sorted comma-joined neighbor types); isolated nodes hash an
        # empty environment (graphalgo.wl_neighborhood_hashes)
        "kg_wl_hashes": kg + merge + """,
bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id, src_id FROM edges
),
nb AS (
  SELECT b.u,
         string_agg(t.entity_type, ',' ORDER BY t.entity_type) AS sig,
         count(*) AS n_nb
  FROM bid b JOIN nodes t ON t.entity_name = b.v
  GROUP BY b.u
)
SELECT n.entity_name, n.entity_type,
       CAST(coalesce(nb.n_nb, 0) AS BIGINT) AS n_neighbors,
       substr(md5(n.entity_type || '|' || coalesce(nb.sig, '')), 1, 16) AS wl1
FROM nodes n LEFT JOIN nb ON nb.u = n.entity_name
        """,
        # degree assortativity: Pearson sufficient stats of endpoint
        # degrees over every directed edge instance — ONE exact row
        "kg_assortativity": kg + merge + """,
bid AS (
  SELECT src_id AS u, tgt_id AS v FROM edges
  UNION ALL SELECT tgt_id, src_id FROM edges
),
dg AS (SELECT u, count(*) AS deg FROM bid GROUP BY 1),
st AS (
  SELECT a.deg AS x, b.deg AS y
  FROM bid JOIN dg a ON a.u = bid.u JOIN dg b ON b.u = bid.v
)
SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
       CAST(sum(y * y) AS BIGINT) AS syy, CAST(sum(x * y) AS BIGINT) AS sxy
FROM st
        """,
        # KG ontology profile: unordered type-pair edge counts + integer
        # weight sums (graphalgo.type_pair_edge_stats)
        "kg_type_pairs": kg + merge + """,
te AS (
  SELECT least(ts.entity_type, tt.entity_type) AS type_a,
         greatest(ts.entity_type, tt.entity_type) AS type_b,
         CAST(e.weight AS BIGINT) AS w
  FROM edges e
  JOIN nodes ts ON ts.entity_name = e.src_id
  JOIN nodes tt ON tt.entity_name = e.tgt_id
)
SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(w) AS BIGINT) AS weight_sum
FROM te GROUP BY 1, 2
        """,
        # inverted index: distinct (token, doc) pairs -> df + the first 16
        # doc ids ascending (capped partials compose exactly, index.py)
        "token_postings": """
            WITH toks AS (
              SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
                FROM documents
              )
            )
            SELECT token, count(*) AS df,
                   array_to_string(
                     list_slice(list(doc_id ORDER BY doc_id), 1, 16), ','
                   ) AS postings
            FROM toks GROUP BY token HAVING count(*) >= 2
        """,
        # integer tf-idf surrogate: score = tf * 1e6 // df, top-3 per doc
        # by (score desc, token asc) — floor division keeps both engines
        # bit-identical (float idf would hash-diverge)
        "doc_tfidf_topk": """
            WITH tf AS (
              SELECT doc_id, token, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
                FROM documents
              ) GROUP BY 1, 2
            ),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            sc AS (
              SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     tf.tf * 1000000 // df.df AS score
              FROM tf JOIN df USING (token)
            )
            SELECT doc_id, token, tf, df, score, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, token
              ) AS rank FROM sc
            ) WHERE rank <= 3
        """,
        # integer BM25 surrogate (stages/retrieval.py): k1=6/5 b=3/4 as
        # rationals, idf_s = N*1e5 // df, one floor per term score; HUGEINT
        # for the idf*num product (exceeds int64), BIGINT back out
        "doc_bm25_topk": """
            WITH q(qid, term) AS (VALUES
              ('q_hash','hash'), ('q_hash','join'), ('q_hash','batch'),
              ('q_stream','window'), ('q_stream','stream'), ('q_stream','spark'),
              ('q_vec','vector'), ('q_vec','filter')),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            st AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM toks) AS l),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            sc AS (
              SELECT q.qid, tf.doc_id,
                     ((CAST(st.n AS HUGEINT) * 100000 // df.df)
                      * (44 * CAST(tf.tf AS HUGEINT) * st.l))
                     // (20 * CAST(st.l AS HUGEINT) * tf.tf
                         + 6 * CAST(st.l AS HUGEINT)
                         + 18 * CAST(dl.dl AS HUGEINT) * st.n) AS ts
              FROM q JOIN tf USING (term) JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id, st
            ),
            agg AS (
              SELECT qid, doc_id, CAST(sum(ts) AS BIGINT) AS score
              FROM sc GROUP BY 1, 2
            )
            SELECT qid, doc_id, score, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY score DESC, doc_id
              ) AS rank FROM agg
            ) WHERE rank <= 10
        """,
        # PRF expansion terms: BM25 top-5 feedback docs per query, top-5
        # non-query terms by summed tf across them
        "doc_prf_terms": _PRF_PREFIX + """
            SELECT qid, term, w, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY w DESC, term
              ) AS rank FROM exw
            ) WHERE rank <= 5
        """,
        # PRF rerank: BM25 re-run with q UNION the top-5 expansion terms
        "doc_prf_topk": _PRF_PREFIX + """,
            exp_top AS (
              SELECT qid, term FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY w DESC, term
                ) AS rank FROM exw
              ) WHERE rank <= 5
            ),
            q2 AS (SELECT qid, term FROM q
                   UNION SELECT qid, term FROM exp_top),
            tf2 AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN (SELECT term FROM q2) GROUP BY 1, 2
            ),
            df2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY 1),
            sc2 AS (
              SELECT q2.qid, tf2.doc_id,
                     ((CAST(st.n AS HUGEINT) * 100000 // df2.df)
                      * (44 * CAST(tf2.tf AS HUGEINT) * st.l))
                     // (20 * CAST(st.l AS HUGEINT) * tf2.tf
                         + 6 * CAST(st.l AS HUGEINT)
                         + 18 * CAST(dl.dl AS HUGEINT) * st.n) AS ts
              FROM q2 JOIN tf2 USING (term) JOIN df2 USING (term)
                   JOIN dl ON dl.doc_id = tf2.doc_id, st
            ),
            agg2 AS (
              SELECT qid, doc_id, CAST(sum(ts) AS BIGINT) AS score
              FROM sc2 GROUP BY 1, 2
            )
            SELECT qid, doc_id, score, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY score DESC, doc_id
              ) AS rank FROM agg2
            ) WHERE rank <= 10
        """,
        # RRF fusion of the BM25 ranking with the plain tf-sum ranking:
        # contribution = 1e6 // (60 + rank), integer sum, top-10
        "doc_rrf_fusion": """
            WITH q(qid, term) AS (VALUES
              ('q_hash','hash'), ('q_hash','join'), ('q_hash','batch'),
              ('q_stream','window'), ('q_stream','stream'), ('q_stream','spark'),
              ('q_vec','vector'), ('q_vec','filter')),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
              FROM documents
            ),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
            st AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT count(*) FROM toks) AS l),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term IN (SELECT term FROM q) GROUP BY 1, 2
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            sc AS (
              SELECT q.qid, tf.doc_id,
                     ((CAST(st.n AS HUGEINT) * 100000 // df.df)
                      * (44 * CAST(tf.tf AS HUGEINT) * st.l))
                     // (20 * CAST(st.l AS HUGEINT) * tf.tf
                         + 6 * CAST(st.l AS HUGEINT)
                         + 18 * CAST(dl.dl AS HUGEINT) * st.n) AS ts,
                     tf.tf
              FROM q JOIN tf USING (term) JOIN df USING (term)
                   JOIN dl ON dl.doc_id = tf.doc_id, st
            ),
            bm AS (
              SELECT qid, doc_id, rank FROM (
                SELECT qid, doc_id, row_number() OVER (
                  PARTITION BY qid
                  ORDER BY CAST(sum(ts) AS BIGINT) DESC, doc_id
                ) AS rank
                FROM sc GROUP BY qid, doc_id
              ) WHERE rank <= 10
            ),
            tfr AS (
              SELECT qid, doc_id, rank FROM (
                SELECT qid, doc_id, row_number() OVER (
                  PARTITION BY qid
                  ORDER BY CAST(sum(tf) AS BIGINT) DESC, doc_id
                ) AS rank
                FROM sc GROUP BY qid, doc_id
              ) WHERE rank <= 10
            ),
            contrib AS (
              SELECT qid, doc_id, 1000000 // (60 + rank) AS c FROM bm
              UNION ALL
              SELECT qid, doc_id, 1000000 // (60 + rank) AS c FROM tfr
            ),
            agg AS (
              SELECT qid, doc_id, CAST(sum(c) AS BIGINT) AS rrf
              FROM contrib GROUP BY 1, 2
            )
            SELECT qid, doc_id, rrf, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY rrf DESC, doc_id
              ) AS rank FROM agg
            ) WHERE rank <= 10
        """,
        # Gopher-style repetition signals: duplicate non-empty lines + the
        # most frequent word bigram (tie -> lexicographic min); all-integer
        # outputs so the table hash-matches exactly
        "doc_repetition": """
            WITH big AS (
              SELECT doc_id,
                     w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] AS bg
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[a-z]+') AS w
                    FROM documents) ws,
                   unnest(generate_series(1, len(w) - 1)) t(i)
              WHERE len(w) >= 2
            ),
            bc AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
            topb AS (
              SELECT doc_id, bg, c FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, bg
                ) AS rn FROM bc
              ) WHERE rn = 1
            ),
            bt AS (SELECT doc_id, count(*) AS n_bigrams FROM big GROUP BY 1),
            ln AS (
              SELECT doc_id, l FROM (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                FROM documents
              )
              WHERE trim(l, ' ' || chr(9) || chr(13) || chr(11) || chr(12)) <> ''
            ),
            lc AS (
              SELECT doc_id, count(*) AS n_lines,
                     count(DISTINCT l) AS nd
              FROM ln GROUP BY 1
            )
            SELECT d.doc_id,
                   COALESCE(lc.n_lines, 0) AS n_lines,
                   COALESCE(lc.n_lines - lc.nd, 0) AS n_dup_lines,
                   COALESCE(bt.n_bigrams, 0) AS n_bigrams,
                   COALESCE(topb.bg, '') AS top_bigram,
                   COALESCE(topb.c, 0) AS top_bigram_cnt
            FROM documents d
            LEFT JOIN lc USING (doc_id)
            LEFT JOIN bt USING (doc_id)
            LEFT JOIN topb USING (doc_id)
        """,
        # sequence packing: exclusive prefix sum over doc_id order is ONE
        # window sum in SQL; the Ray side computes it as a distributed scan
        # (per-range sums -> driver cumsum of range totals -> local cumsum)
        "doc_pack_sequences": """
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
              FROM documents
            ), s AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS start_off
              FROM t
            )
            SELECT doc_id, n_tokens, start_off,
                   start_off + n_tokens AS end_off,
                   start_off // 512 AS first_seq,
                   (CASE WHEN n_tokens = 0 THEN start_off
                         ELSE start_off + n_tokens - 1 END) // 512 AS last_seq
            FROM s
        """,
        # the (sequence, doc) manifest: generate_series over each doc's
        # window span, within-sequence token ranges clamped to the window
        "doc_pack_manifest": """
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
              FROM documents
            ), s AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS start_off
              FROM t
            ), sp AS (
              SELECT doc_id, start_off, start_off + n_tokens AS end_off,
                     start_off // 512 AS first_seq,
                     (start_off + n_tokens - 1) // 512 AS last_seq
              FROM s WHERE n_tokens > 0
            )
            SELECT CAST(seq AS BIGINT) AS seq_id, doc_id,
                   GREATEST(start_off, seq * 512) - seq * 512 AS tok_start,
                   LEAST(end_off, (seq + 1) * 512) - seq * 512 AS tok_end
            FROM sp, unnest(generate_series(first_seq, last_seq)) u(seq)
        """,
        # stratified consistent sample: per-lang md5 hash-threshold
        # (en downsampled to 10%, tail langs kept at 30%)
        "doc_stratified_sample": """
            SELECT * FROM documents
            WHERE CAST(('0x' || substr(
                    md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100
                  < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
        """,
        # entities section of the local query context: integer-exact cosine
        # top-k (threshold 0.2, k=10) + degree rank — see _query_context_sql
        "kg_query_context": kg
        + merge
        + _query_context_sql("parse function for the config module"),
        # multimodal answer fan-out with deterministic seams: payload is the
        # document's utf-8 bytes, so base64+md5 mirror exactly in SQL
        "kg_mm_answer": """
            WITH sel AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 3)
            SELECT CAST(d.doc_id AS VARCHAR) AS mm_entity,
                   'mm:' || md5(base64(encode(d.text))) AS mm_response
            FROM documents d JOIN sel USING (doc_id)
        """,
        # generator-formula mirror of synth_media_table (multimodal.py:39-47)
        # — value-checks the pack->decode roundtrip end-to-end
        "media_decode": """
            SELECT i AS media_id,
                   CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CAST(64 + (i * 7) % 512 AS INT) AS width,
                   CAST(64 + (i * 13) % 512 AS INT) AS height,
                   CAST(CASE WHEN i % 3 = 0 THEN 1
                             ELSE 8 + i % 24 END AS INT) AS n_frames
            FROM range(300) t(i)
        """,
        # resize_media mirror: dims from the generator formula; resized body
        # = every 2nd byte of the 16-block md5 chain, hashed as lowercase hex
        "media_resize": """
            WITH m AS (
              SELECT i AS media_id,
                     CAST(64 + (i * 7) % 512 AS INT) AS w,
                     CAST(64 + (i * 13) % 512 AS INT) AS h
              FROM range(300) t(i)
            ),
            body AS (
              SELECT media_id,
                     string_agg(md5(media_id || '-' || j), '' ORDER BY j) AS hx
              FROM m, range(16) t2(j) GROUP BY media_id
            ),
            stride AS (
              SELECT media_id,
                     string_agg(substr(hx, 4 * i + 1, 2), '' ORDER BY i) AS rhx
              FROM body, range(128) r(i) GROUP BY media_id
            )
            SELECT m.media_id,
                   CAST(m.w // 2 AS INT) AS r_width,
                   CAST(m.h // 2 AS INT) AS r_height,
                   md5(s.rhx) AS r_md5
            FROM m JOIN stride s USING (media_id)
        """,
        # sample_frames mirror: every-4th frame for videos, frame 0 for
        # image/audio — n_frames from the generator formula
        "media_frame_sample": """
            WITH m AS (
              SELECT i AS media_id,
                     CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image'
                          WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 8 + i % 24 END AS f
              FROM range(300) t(i)
            )
            SELECT media_id, kind,
                   CAST(unnest(CASE WHEN kind = 'video'
                        THEN generate_series(0, CAST(f - 1 AS INT), 4)
                        ELSE [0] END) AS INT) AS frame_id
            FROM m
        """,
        # exact mirror of the fake feature extraction (multimodal.py
        # _feature_hits): payload hex = 'FAKE' + kind byte + 3 LE uint16 +
        # 16 chained md5 digests; one hit per 8-byte stride window, window
        # hash = md5 of the window's lowercase hex (md5(BLOB) is unavailable,
        # so both sides hash the hex string), dim = h%64, sign = bit 16
        # REAL WAV decode mirror: all fields and the PCM checksum derive
        # from the generator formulas — v(j) = (id*31 + j*17) % 65536 as
        # little-endian uint16, hashed as lowercase hex like every md5
        # oracle in this module (DuckDB md5 is VARCHAR-only)
        # structural contract of canonicalization (see the query docstring):
        # every violation count is exactly 0 by construction
        "kg_canonicalization_invariants": """
            SELECT invariant, CAST(0 AS BIGINT) AS violations
            FROM (VALUES ('members_not_in_nodes'), ('canonicals_not_in_nodes'),
                         ('canonical_in_members'), ('members_in_canonical'),
                         ('size_mismatch')) t(invariant)
        """,
        # ExactSubstr cut mirror: same tokenization, 16-hex window hash,
        # >= 2 distinct-doc duplication test, BETWEEN coverage join, run
        # counting via lag(), md5 of the space-joined kept tokens
        "dedup_cut_spans": """
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
              FROM documents
            ),
            tok AS (
              SELECT doc_id, u.i AS pos, l[u.i + 1] AS tok
              FROM toks, unnest(generate_series(0, len(l) - 1)) u(i)
            ),
            w AS (
              SELECT doc_id, u.i AS pos,
                     substr(md5(array_to_string(l[u.i + 1 : u.i + 8], ' ')), 1, 16) AS wh
              FROM toks, unnest(generate_series(0, len(l) - 8)) u(i)
            ),
            dup AS (
              SELECT wh FROM (SELECT wh, count(DISTINCT doc_id) AS df
                              FROM w GROUP BY wh) WHERE df >= 2
            ),
            cut AS (
              SELECT DISTINCT t.doc_id, t.pos
              FROM tok t JOIN (SELECT w.* FROM w JOIN dup USING (wh)) d
                ON d.doc_id = t.doc_id AND t.pos BETWEEN d.pos AND d.pos + 7
            ),
            spans AS (
              SELECT doc_id,
                     count(*) FILTER (
                       WHERE prev IS NULL OR prev < pos - 1) AS n_spans,
                     count(*) AS n_cut_tokens
              FROM (SELECT doc_id, pos,
                           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                    FROM cut)
              GROUP BY doc_id
            ),
            kept AS (
              SELECT t.doc_id,
                     coalesce(string_agg(t.tok, ' ' ORDER BY t.pos), '') AS cleaned
              FROM tok t LEFT JOIN cut c ON c.doc_id = t.doc_id AND c.pos = t.pos
              WHERE c.pos IS NULL
              GROUP BY t.doc_id
            )
            SELECT tk.doc_id,
                   len(tk.l) AS n_tokens,
                   coalesce(s.n_spans, 0) AS n_spans,
                   coalesce(s.n_cut_tokens, 0) AS n_cut_tokens,
                   md5(coalesce(k.cleaned, '')) AS clean_md5
            FROM toks tk
            LEFT JOIN spans s USING (doc_id)
            LEFT JOIN kept k USING (doc_id)
        """,
        # REAL PPM resize mirror: small(Y,X,c) = floor-mean of the 2x2
        # source pixels from the generator formula, hex-packed row-major
        "media_ppm_resize": """
            WITH m AS (
              SELECT i AS media_id, 8 + i % 9 AS w, 6 + i % 7 AS h
              FROM range(300) t(i)
            ),
            px AS (
              SELECT media_id, Y.y AS y, X.x AS x, C.c AS c,
                     ((media_id*7 + (2*Y.y)*31   + (2*X.x)*13   + C.c*5) % 256
                    + (media_id*7 + (2*Y.y)*31   + (2*X.x+1)*13 + C.c*5) % 256
                    + (media_id*7 + (2*Y.y+1)*31 + (2*X.x)*13   + C.c*5) % 256
                    + (media_id*7 + (2*Y.y+1)*31 + (2*X.x+1)*13 + C.c*5) % 256
                     ) // 4 AS v
              FROM m, range(8) Y(y), range(8) X(x), range(3) C(c)
              WHERE Y.y < h // 2 AND X.x < w // 2
            ),
            hx AS (
              SELECT media_id,
                     string_agg(printf('%02x', CAST(v AS INT)), ''
                                ORDER BY y, x, c) AS s
              FROM px GROUP BY media_id
            )
            SELECT m.media_id,
                   CAST(m.w // 2 AS BIGINT) AS r_width,
                   CAST(m.h // 2 AS BIGINT) AS r_height,
                   md5(hx.s) AS r_md5
            FROM m JOIN hx USING (media_id)
        """,
        "media_wav_decode": """
            WITH m AS (
              SELECT i AS media_id,
                     1 + i % 2 AS channels,
                     CASE CAST(i % 3 AS INT) WHEN 0 THEN 8000
                          WHEN 1 THEN 16000 ELSE 44100 END AS sample_rate,
                     16 AS bits,
                     (100 + i % 50) * (1 + i % 2) AS n_samples
              FROM range(300) t(i)
            ),
            pcm AS (
              SELECT m.media_id,
                     string_agg(
                       printf('%02x%02x',
                              CAST(((m.media_id * 31 + j.j * 17) % 65536) % 256 AS INT),
                              CAST(((m.media_id * 31 + j.j * 17) % 65536) // 256 AS INT)),
                       '' ORDER BY j.j) AS hx
              FROM m, range(300) j(j)
              WHERE j.j < m.n_samples
              GROUP BY m.media_id
            )
            SELECT m.media_id, m.channels, m.sample_rate, m.bits,
                   m.n_samples,
                   (m.n_samples // m.channels) * 1000 // m.sample_rate AS duration_ms,
                   md5(p.hx) AS pcm_md5
            FROM m JOIN pcm p USING (media_id)
        """,
        # REAL PNG decode mirror: the DECODED raw RGB buffer from the
        # generator pixel formula, hex-packed row-major — the wire bytes
        # are per-row-filtered + deflated, so matching this md5 proves the
        # engine's inflate + unfilter reconstruction
        "media_png_decode": """
            WITH m AS (
              SELECT i AS media_id, 8 + i % 9 AS w, 6 + i % 7 AS h
              FROM range(300) t(i)
            ),
            px AS (
              SELECT media_id, Y.y AS y, X.x AS x, C.c AS c,
                     (media_id*7 + Y.y*31 + X.x*13 + C.c*5) % 256 AS v
              FROM m, range(12) Y(y), range(16) X(x), range(3) C(c)
              WHERE Y.y < h AND X.x < w
            ),
            hx AS (
              SELECT media_id,
                     string_agg(printf('%02x', CAST(v AS INT)), ''
                                ORDER BY y, x, c) AS s
              FROM px GROUP BY media_id
            )
            SELECT m.media_id,
                   CAST(m.w AS BIGINT) AS width,
                   CAST(m.h AS BIGINT) AS height,
                   md5(hx.s) AS px_md5
            FROM m JOIN hx USING (media_id)
        """,
        # REAL baseline-JPEG decode mirror: the corpus blocks are constant
        # YCbCr colors and q_DC = 8, so dequantize->IDCT is integer-exact
        # and the DECODED RGB equals this closed-form conversion of the
        # block formula (floor(x+0.5) rounding, clamp — the decoder's
        # convention) — matching the md5 proves the Huffman + IDCT +
        # color-convert chain ran over the real wire bytes
        "media_jpeg_decode": """
            WITH m AS (
              SELECT i AS media_id, 8*(2 + i % 3) AS w, 8*(1 + i % 4) AS h
              FROM range(300) t(i)
            ),
            px AS (
              SELECT media_id, Y.y AS y, X.x AS x,
                     CAST((media_id*7  + (Y.y//8)*31 + (X.x//8)*13) % 256
                          AS DOUBLE) AS yv,
                     CAST((media_id*11 + (Y.y//8)*17 + (X.x//8)*19) % 256
                          AS DOUBLE) AS cb,
                     CAST((media_id*5  + (Y.y//8)*23 + (X.x//8)*29) % 256
                          AS DOUBLE) AS cr
              FROM m, range(32) Y(y), range(32) X(x)
              WHERE Y.y < h AND X.x < w
            ),
            rgb AS (
              SELECT media_id, y, x,
                     greatest(0, least(255,
                       floor(yv + 1.402*(cr-128) + 0.5))) AS r,
                     greatest(0, least(255,
                       floor(yv - 0.344136*(cb-128)
                                - 0.714136*(cr-128) + 0.5))) AS g,
                     greatest(0, least(255,
                       floor(yv + 1.772*(cb-128) + 0.5))) AS b
              FROM px
            ),
            hx AS (
              SELECT media_id,
                     string_agg(printf('%02x%02x%02x', CAST(r AS INT),
                                       CAST(g AS INT), CAST(b AS INT)), ''
                                ORDER BY y, x) AS s
              FROM rgb GROUP BY media_id
            )
            SELECT m.media_id,
                   CAST(m.w AS BIGINT) AS width,
                   CAST(m.h AS BIGINT) AS height,
                   md5(hx.s) AS px_md5
            FROM m JOIN hx USING (media_id)
        """,
        # REAL JPEG decode->resize mirror: the corpus' 8x8 blocks are
        # constant colors, 2x2 boxes never straddle a block (8 is even),
        # so resized pixel (y,x) = the RGB conversion of block
        # (y//4, x//4) — halved dims, same closed-form color math as
        # media_jpeg_decode
        "media_jpeg_resize": """
            WITH m AS (
              SELECT i AS media_id, 8*(2 + i % 3) AS w, 8*(1 + i % 4) AS h
              FROM range(300) t(i)
            ),
            px AS (
              SELECT media_id, Y.y AS y, X.x AS x,
                     CAST((media_id*7  + (Y.y//4)*31 + (X.x//4)*13) % 256
                          AS DOUBLE) AS yv,
                     CAST((media_id*11 + (Y.y//4)*17 + (X.x//4)*19) % 256
                          AS DOUBLE) AS cb,
                     CAST((media_id*5  + (Y.y//4)*23 + (X.x//4)*29) % 256
                          AS DOUBLE) AS cr
              FROM m, range(16) Y(y), range(16) X(x)
              WHERE Y.y < h // 2 AND X.x < w // 2
            ),
            rgb AS (
              SELECT media_id, y, x,
                     greatest(0, least(255,
                       floor(yv + 1.402*(cr-128) + 0.5))) AS r,
                     greatest(0, least(255,
                       floor(yv - 0.344136*(cb-128)
                                - 0.714136*(cr-128) + 0.5))) AS g,
                     greatest(0, least(255,
                       floor(yv + 1.772*(cb-128) + 0.5))) AS b
              FROM px
            ),
            hx AS (
              SELECT media_id,
                     string_agg(printf('%02x%02x%02x', CAST(r AS INT),
                                       CAST(g AS INT), CAST(b AS INT)), ''
                                ORDER BY y, x) AS s
              FROM rgb GROUP BY media_id
            )
            SELECT m.media_id,
                   CAST(m.w // 2 AS BIGINT) AS r_width,
                   CAST(m.h // 2 AS BIGINT) AS r_height,
                   md5(hx.s) AS r_md5
            FROM m JOIN hx USING (media_id)
        """,
        "media_feature_components": """
            WITH m AS (
              SELECT i AS media_id,
                     CASE CAST(i % 3 AS INT) WHEN 0 THEN '69'
                          WHEN 1 THEN '61' ELSE '76' END AS kind_hex,
                     64 + (i * 7) % 512 AS w,
                     64 + (i * 13) % 512 AS h,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 8 + i % 24 END AS f
              FROM range(300) t(i)
            ),
            body AS (
              SELECT i AS media_id,
                     string_agg(md5(concat(i, '-', j)), '' ORDER BY j) AS body_hex
              FROM range(300) t(i) CROSS JOIN range(16) r(j) GROUP BY 1
            ),
            payload AS (
              SELECT m.media_id,
                     '46414b45' || kind_hex ||
                     printf('%02x%02x', w % 256, w // 256) ||
                     printf('%02x%02x', h % 256, h // 256) ||
                     printf('%02x%02x', f % 256, f // 256) || body_hex AS hex
              FROM m JOIN body USING (media_id)
            ),
            hits AS (
              SELECT media_id,
                     CAST(('0x' || substr(md5(substr(hex, CAST(o.off * 2 + 1 AS INT), 16)),
                                          1, 8)) AS UBIGINT) AS hv
              FROM payload CROSS JOIN range(0, 259, 8) o(off)
            )
            SELECT media_id, CAST(hv % 64 AS BIGINT) AS dim_idx,
                   CAST(SUM(CASE WHEN (hv // 65536) % 2 = 1
                                 THEN 1 ELSE -1 END) AS BIGINT) AS component
            FROM hits GROUP BY 1, 2
        """,
        # structural invariants of the float media feature vectors from the
        # integer hit mirror (same contract as kg_entity_vecs_invariants)
        "media_feature_vecs_invariants": """
            WITH m AS (
              SELECT i AS media_id,
                     CASE CAST(i % 3 AS INT) WHEN 0 THEN '69'
                          WHEN 1 THEN '61' ELSE '76' END AS kind_hex,
                     64 + (i * 7) % 512 AS w,
                     64 + (i * 13) % 512 AS h,
                     CASE WHEN i % 3 = 0 THEN 1 ELSE 8 + i % 24 END AS f
              FROM range(300) t(i)
            ),
            body AS (
              SELECT i AS media_id,
                     string_agg(md5(concat(i, '-', j)), '' ORDER BY j) AS body_hex
              FROM range(300) t(i) CROSS JOIN range(16) r(j) GROUP BY 1
            ),
            payload AS (
              SELECT m.media_id,
                     '46414b45' || kind_hex ||
                     printf('%02x%02x', w % 256, w // 256) ||
                     printf('%02x%02x', h % 256, h // 256) ||
                     printf('%02x%02x', f % 256, f // 256) || body_hex AS hex
              FROM m JOIN body USING (media_id)
            ),
            hits AS (
              SELECT media_id,
                     CAST(('0x' || substr(md5(substr(hex, CAST(o.off * 2 + 1 AS INT), 16)),
                                          1, 8)) AS UBIGINT) AS hv
              FROM payload CROSS JOIN range(0, 259, 8) o(off)
            ),
            comp AS (
              SELECT media_id, CAST(hv % 64 AS BIGINT) AS dim_idx,
                     CAST(SUM(CASE WHEN (hv // 65536) % 2 = 1
                                   THEN 1 ELSE -1 END) AS BIGINT) AS component
              FROM hits GROUP BY 1, 2
            ),
            per_m AS (
              SELECT media_id, SUM(component * component) AS ss,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (WHERE component != 0) AS n_nz
              FROM comp GROUP BY 1
            )
            SELECT CAST(300 AS BIGINT) AS n_vecs,
                   CAST((SELECT count(*) FROM per_m WHERE ss > 0) AS BIGINT)
                     AS n_unit_norm,
                   CAST(300 - (SELECT count(*) FROM per_m WHERE ss > 0)
                        AS BIGINT) AS n_zero_vecs,
                   CAST((SELECT coalesce(sum(n_nz), 0) FROM per_m) AS BIGINT)
                     AS n_nonzero_dims,
                   CAST((SELECT coalesce(sum(n_rows), 0) FROM per_m) AS BIGINT)
                     AS n_comp_rows,
                   CAST((SELECT coalesce(sum(n_nz), 0) FROM per_m) AS BIGINT)
                     AS n_comp_nonzero,
                   CAST(0 AS BIGINT) AS n_sign_mismatch
        """,
        # exact mirror of stages/embed.py HashEmbedder pre-normalization
        # components: content = name || description (fusion.py:133-141),
        # token regex [a-z_]+|[0-9]+ over lower(), md5-derived uint32 hash,
        # coordinate = h % 384, sign = bit 16 of h
        "kg_entity_vec_components": kg + merge + """,
vc AS (
  SELECT 'ent-' || md5(entity_name) AS entity_id, entity_name,
         entity_name || description AS content
  FROM nodes
),
vtok AS (
  SELECT entity_id, entity_name,
         unnest(regexp_extract_all(lower(content), '[a-z_]+|[0-9]+')) AS tok
  FROM vc
),
vh AS (
  SELECT entity_id, entity_name,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS hv
  FROM vtok
)
SELECT entity_id, entity_name,
       CAST(hv % 384 AS BIGINT) AS dim_idx,
       CAST(SUM(CASE WHEN (hv // 65536) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT)
         AS component
FROM vh GROUP BY 1, 2, 3
        """,
        # structural invariants of the float entity-vec table, recomputed
        # entirely from the integer component mirror: the float side is
        # unit-norm exactly where sum(component^2) > 0, nonzero exactly at
        # nonzero components, sign-consistent everywhere
        "kg_entity_vecs_invariants": kg + merge + """,
vc2 AS (
  SELECT 'ent-' || md5(entity_name) AS entity_id,
         entity_name || description AS content
  FROM nodes
),
vh2 AS (
  SELECT entity_id,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) AS hv
  FROM (SELECT entity_id,
               unnest(regexp_extract_all(lower(content), '[a-z_]+|[0-9]+'))
                 AS tok
        FROM vc2)
),
comp AS (
  SELECT entity_id, CAST(hv % 384 AS BIGINT) AS dim_idx,
         CAST(SUM(CASE WHEN (hv // 65536) % 2 = 1 THEN 1 ELSE -1 END)
              AS BIGINT) AS component
  FROM vh2 GROUP BY 1, 2
),
per_ent AS (
  SELECT entity_id, SUM(component * component) AS ss,
         COUNT(*) AS n_rows,
         COUNT(*) FILTER (WHERE component != 0) AS n_nz
  FROM comp GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_vecs,
       CAST((SELECT count(*) FROM per_ent WHERE ss > 0) AS BIGINT)
         AS n_unit_norm,
       CAST((SELECT count(*) FROM nodes)
            - (SELECT count(*) FROM per_ent WHERE ss > 0) AS BIGINT)
         AS n_zero_vecs,
       CAST((SELECT coalesce(sum(n_nz), 0) FROM per_ent) AS BIGINT)
         AS n_nonzero_dims,
       CAST((SELECT coalesce(sum(n_rows), 0) FROM per_ent) AS BIGINT)
         AS n_comp_rows,
       CAST((SELECT coalesce(sum(n_nz), 0) FROM per_ent) AS BIGINT)
         AS n_comp_nonzero,
       CAST(0 AS BIGINT) AS n_sign_mismatch
        """,
        "kg_edges": kg + merge + "\nSELECT * FROM edges",
        "dedup_exact_documents": """
            SELECT doc_id, text, lang, source, n_chars, text_md5 FROM (
              SELECT *, md5(text) AS text_md5,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents
            ) WHERE rn = 1
        """,
        "dedup_minhash_documents": _minhash_cc_sql(threshold=0.8),
        # split mirror: component labels from the same CC SQL, then the
        # md5 bucket assignment
        "doc_leakage_safe_split": (
            "SELECT id, label, CASE WHEN "
            "('0x' || substr(md5(CAST(label AS VARCHAR)), 1, 8))::UBIGINT "
            "% 100 < 10 THEN 'val' ELSE 'train' END AS split FROM ("
            + _minhash_cc_sql(threshold=0.8) + ") t"
        ),
        # component-size histogram composed on the MinHash closure SQL
        "dedup_minhash_cluster_sizes": f"""
            WITH mh AS ({_minhash_cc_sql(threshold=0.8)}),
            sizes AS (
              SELECT label, CAST(count(*) AS BIGINT) AS cluster_size
              FROM mh GROUP BY label)
            SELECT cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM sizes GROUP BY cluster_size
        """,
        # CDC log compaction: last op per key by sequence number (the
        # synthesized %5 delete-after-upsert / %3 stale-then-fresh log)
        "orders_cdc_compact": """
            WITH log AS (
              SELECT o_orderkey, 1 AS seq, 'upsert' AS op,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                         AS price_cents
              FROM orders WHERE o_orderkey % 5 = 0
              UNION ALL
              SELECT o_orderkey, 2, 'delete', 0
              FROM orders WHERE o_orderkey % 5 = 0
              UNION ALL
              SELECT o_orderkey, 1, 'upsert',
                     CAST(round(o_totalprice * 100) AS BIGINT) + 999
              FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
              UNION ALL
              SELECT o_orderkey, 2, 'upsert',
                     CAST(round(o_totalprice * 100) AS BIGINT)
              FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
            )
            SELECT o_orderkey, CAST(seq AS BIGINT) AS seq, op, price_cents
            FROM (
              SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                           ORDER BY seq DESC) AS rn
              FROM log
            ) WHERE rn = 1
        """,
        # cross-side (new-vs-indexed) verified pairs, integer counts out
        "dedup_incremental_minhash": _minhash_cross_sql(threshold=0.8),
        "dedup_jaccard_documents": _jaccard_cc_sql(threshold=0.8),
        # containment_pairs mirror: the same shingle blocking/verify CTEs
        # as the jaccard family, final select = integer containment ppm in
        # both directions, kept when either reaches 800000
        "doc_containment": """
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
shing AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, array_to_string(list_slice(ws, s, s + 2), ' ') AS shingle
    FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(s)
    WHERE len(ws) >= 3
    UNION ALL
    SELECT doc_id, array_to_string(ws, ' ') FROM words WHERE len(ws) BETWEEN 1 AND 2
  )
),
sh AS (SELECT doc_id, substr(md5(shingle), 1, 16) AS sh FROM shing),
df AS (SELECT sh, count(DISTINCT doc_id) AS n FROM sh GROUP BY 1),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a
  JOIN df ON df.sh = a.sh AND df.n <= 64
  JOIN sh b ON b.sh = a.sh AND a.doc_id < b.doc_id
),
counts AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN shing sa ON sa.doc_id = c.id_a
  JOIN shing sb ON sb.doc_id = c.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2
),
scoredc AS (
  SELECT c.id_a, c.id_b,
         CAST(COALESCE(i.i, 0) AS BIGINT) AS n_common,
         CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
         CAST(COALESCE(i.i, 0) * 1000000 // ca.n AS BIGINT) AS cont_ab_ppm,
         CAST(COALESCE(i.i, 0) * 1000000 // cb.n AS BIGINT) AS cont_ba_ppm
  FROM cand c
  JOIN counts ca ON ca.doc_id = c.id_a
  JOIN counts cb ON cb.doc_id = c.id_b
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
)
SELECT * FROM scoredc
WHERE greatest(cont_ab_ppm, cont_ba_ppm) >= 800000
        """,
        # keep_best_representative over the jaccard components: per label
        # keep (max length(text), tie min doc_id) + member count
        "dedup_keep_best": _jaccard_cc_sql(threshold=0.8, final=False) + """,
scores AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS score FROM documents
),
rankedkb AS (
  SELECT l.label, l.id, s.score,
         row_number() OVER (
           PARTITION BY l.label ORDER BY s.score DESC, l.id
         ) AS rn,
         count(*) OVER (PARTITION BY l.label) AS n_members
  FROM labels l JOIN scores s ON s.doc_id = l.id
)
SELECT label, id AS keep_id, score,
       CAST(n_members AS BIGINT) AS n_members
FROM rankedkb WHERE rn = 1
""",
        # LSH recall vs this all-pairs oracle is exact HERE because the only
        # >=0.95 pairs are the planted scaled copies (same LSH bucket by
        # construction: positive scaling preserves hyperplane signs); the
        # corpus's true max cosine is ~0.51 (measured)
        "embedding_near_dup_pairs": """
            WITH planted AS (
              SELECT vec_id + 1000000 AS vec_id,
                     list_transform(embedding, x -> CAST(1.5 * x AS FLOAT)) AS embedding
              FROM embeddings WHERE vec_id < 8
            ),
            allv AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL SELECT vec_id, embedding FROM planted
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM allv a JOIN allv b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        "dedup_simhash_documents": _simhash_pairs_sql(max_hamming=3),
        "dedup_minhash_recall": _lsh_recall_sql(threshold=0.8),
        "distinct_lang_source": """
            SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY 1, 2
        """,
        "doc_text_stats": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '{WORD_RE}')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS BIGINT) AS n_punct,
                   CAST(len(regexp_extract_all(text, '{DIGIT_RE}')) AS BIGINT) AS n_digits,
                   CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_tokens,
                   CASE WHEN length(text) > 0
                        THEN CAST(len(regexp_extract_all(text, '{PUNCT_RE}')) AS DOUBLE) / length(text)
                        ELSE 0.0 END AS punct_ratio
            FROM documents
        """,
        "token_count_by_lang": f"""
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '{pat}'))) AS BIGINT) AS total_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "doc_quality": _doc_quality_sql(),
        # exact mirror of stages/textstats.py doc_topk_ngrams (n=2, k=20):
        # [A-Za-z]+ words lowercased, adjacent pairs, rank (cnt desc, ngram asc)
        "doc_topk_ngrams": """
            WITH words AS (
              SELECT regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents
            ),
            grams AS (
              SELECT w.ws[g.i] || ' ' || w.ws[g.i + 1] AS ngram
              FROM words w, UNNEST(range(1, len(w.ws))) AS g(i)
            ),
            counted AS (SELECT ngram, count(*) AS cnt FROM grams GROUP BY 1)
            SELECT ngram, cnt FROM (
              SELECT *, row_number() OVER (ORDER BY cnt DESC, ngram ASC) AS rn
              FROM counted
            ) WHERE rn <= 20
        """,
        "doc_lang_id": _lang_id_sql(),
        # confusion matrix composed from the lang-id mirror
        "doc_lang_confusion": f"""
            WITH pred AS ({_lang_id_sql()})
            SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY 1, 2
        """,
        "kg_resolve_refs": kg + _resolve_refs_sql(),
        "doc_fingerprint": """
            SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        # mirror of stages/textstats.py secret_scan: patterns applied in
        # SECRET_PATTERNS order, each counting on the previously-redacted
        # text; clean_md5 pins the exact final redaction
        "code_secret_scan": f"""
            WITH s0 AS (
              SELECT repo, path, content AS t
              FROM read_parquet('{corpus}/*.parquet')
            ),
            s1 AS (
              SELECT repo, path,
                     len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
                     regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                       '<EMAIL>', 'g') AS t
              FROM s0
            ),
            s2 AS (
              SELECT repo, path, n_email,
                     len(regexp_extract_all(t, '\\b[a-fA-F0-9]{{16,}}\\b')) AS n_hex,
                     regexp_replace(t, '\\b[a-fA-F0-9]{{16,}}\\b', '<HEX>', 'g') AS t
              FROM s1
            ),
            s3 AS (
              SELECT repo, path, n_email, n_hex,
                     len(regexp_extract_all(t, '\\b[0-9]{{4,}}\\b')) AS n_num,
                     regexp_replace(t, '\\b[0-9]{{4,}}\\b', '<NUM>', 'g') AS t
              FROM s2
            )
            SELECT repo, path, n_email, n_hex, n_num, md5(t) AS clean_md5
            FROM s3
        """,
        "code_strip_comments": f"""
            SELECT repo, path,
                   regexp_replace(
                     regexp_replace(content, '(?m)^[ \\t]*#[^\\n]*\\n?', '', 'g'),
                     '(?s)\"\"\".*?\"\"\"', '', 'g') AS stripped
            FROM read_parquet('{corpus}/*.parquet')
        """,
        # mirror of stages/pack.py repo_context_pack: path-ordered
        # '<<<path>>>\n' headers joined by newline, md5 of the blob
        "code_repo_pack": f"""
            SELECT repo,
                   count(*) AS n_files,
                   CAST(sum(len(content)) AS BIGINT) AS total_chars,
                   md5(string_agg('<<<' || path || '>>>' || chr(10) || content,
                                  chr(10) ORDER BY path)) AS packed_md5
            FROM read_parquet('{corpus}/*.parquet')
            GROUP BY repo
        """,
        # mirror of stages/codegraph.py import_indegree_topk: distinct
        # (src, dst) import edges -> count distinct importers per module
        "code_import_indegree": f"""
            WITH f AS (
              SELECT regexp_extract(content, '(?m)^# module: ([\\w.]+)', 1) AS src,
                     regexp_extract_all(content, '(?m)^import ([\\w.]+)', 1) AS dsts
              FROM read_parquet('{corpus}/*.parquet')
            ),
            e AS (
              SELECT DISTINCT src, unnest(dsts) AS dst
              FROM f WHERE src IS NOT NULL AND src <> ''
            )
            SELECT dst AS module, count(DISTINCT src) AS in_degree
            FROM e GROUP BY 1
            ORDER BY in_degree DESC, module LIMIT 20
        """,
        # SCD2 history from the events changelog: lag() drops no-op
        # updates, lead()/row_number() over the change rows build the
        # version intervals — mirrors stages/window.scd2_intervals
        "events_scd2": """
            WITH ordered AS (
              SELECT user_id, event_type, ts, event_id,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events
            ),
            changes AS (
              SELECT user_id, event_type, ts, event_id FROM ordered
              WHERE prev IS NULL OR event_type <> prev
            )
            SELECT user_id, event_type, valid_from, valid_to,
                   CAST(version AS BIGINT) AS version,
                   CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS is_current
            FROM (
              SELECT user_id, event_type, ts AS valid_from,
                     lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS valid_to,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS version
              FROM changes
            )
        """,
        # exact distinct users per (tumbling hour, event_type) — mirrors
        # the two-phase exact distinct of groupagg.bucketed_count_distinct
        "events_window_users": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2
        """,
        # share-of-total: per (month, priority) exact revenue cents and
        # integer ppm share of the month total
        "orders_monthly_share": """
            WITH fine AS (
              SELECT date_trunc('month', o_orderdate) AS month,
                     o_orderpriority,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS revenue_cents,
                     CAST(count(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY 1, 2
            ),
            tot AS (
              SELECT month, CAST(sum(revenue_cents) AS BIGINT) AS month_cents
              FROM fine GROUP BY 1
            )
            SELECT f.month, f.o_orderpriority, f.revenue_cents, f.n_orders,
                   CAST(f.revenue_cents * 1000000 // t.month_cents
                        AS BIGINT) AS share_ppm
            FROM fine f JOIN tot t USING (month)
        """,
        # conjunctive boolean retrieval: docs containing ALL query terms
        # (intersection via matched-distinct-term counting)
        "doc_boolean_and": """
            WITH q(qid, term) AS (VALUES
              ('q_hash','hash'), ('q_hash','join'), ('q_hash','batch'),
              ('q_stream','window'), ('q_stream','stream'), ('q_stream','spark'),
              ('q_vec','vector'), ('q_vec','filter')),
            toks AS (
              SELECT DISTINCT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                FROM documents)
            ),
            m AS (
              SELECT q.qid, t.doc_id, count(*) AS nm
              FROM q JOIN toks t USING (term) GROUP BY 1, 2
            ),
            need AS (SELECT qid, count(*) AS req FROM q GROUP BY 1)
            SELECT m.qid, m.doc_id, CAST(need.req AS BIGINT) AS n_terms
            FROM m JOIN need USING (qid) WHERE m.nm = need.req
        """,
        # per-repo language composition + dominant language (ties ->
        # lexicographic min) with integer ppm dominance
        "repo_lang_profile": f"""
            WITH c AS (
              SELECT repo, lang, count(*) AS n
              FROM read_parquet('{corpus}/*.parquet') GROUP BY 1, 2
            ),
            r AS (
              SELECT repo, CAST(sum(n) AS BIGINT) AS n_rows,
                     CAST(count(*) AS BIGINT) AS n_cats
              FROM c GROUP BY 1
            ),
            top AS (
              SELECT repo, lang AS top_cat, n FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY repo ORDER BY n DESC, lang
                ) AS rk FROM c
              ) WHERE rk = 1
            )
            SELECT r.repo, r.n_rows, r.n_cats, top.top_cat,
                   CAST(top.n * 1000000 // r.n_rows AS BIGINT) AS top_ppm
            FROM r JOIN top USING (repo)
        """,
        # integer HITS, 2 unrolled rounds: auth = in-sum of hub, hub =
        # out-sum of auth, each max-renormalized to 1e6 by floor division
        # (max is order-insensitive -> bit-deterministic like pagerank)
        "code_import_hits": f"""
            WITH f AS (
              SELECT regexp_extract(content, '(?m)^# module: ([\\w.]+)', 1) AS src,
                     regexp_extract_all(content, '(?m)^import ([\\w.]+)', 1) AS dsts
              FROM read_parquet('{corpus}/*.parquet')
            ),
            e AS (
              SELECT DISTINCT src, unnest(dsts) AS dst
              FROM f WHERE src IS NOT NULL AND src <> ''
            ),
            nodes AS (SELECT src AS module FROM e UNION SELECT dst FROM e),
            h0 AS (SELECT module, CAST(1000000 AS BIGINT) AS hub FROM nodes),
            a1r AS (SELECT e.dst AS module, sum(h0.hub) AS a
                    FROM e JOIN h0 ON h0.module = e.src GROUP BY 1),
            a1f AS (SELECT n.module, coalesce(a1r.a, 0) AS a
                    FROM nodes n LEFT JOIN a1r USING (module)),
            a1m AS (SELECT greatest(max(a), 1) AS mx FROM a1f),
            a1 AS (SELECT module, a * 1000000 // mx AS auth FROM a1f, a1m),
            h1r AS (SELECT e.src AS module, sum(a1.auth) AS h
                    FROM e JOIN a1 ON a1.module = e.dst GROUP BY 1),
            h1f AS (SELECT n.module, coalesce(h1r.h, 0) AS h
                    FROM nodes n LEFT JOIN h1r USING (module)),
            h1m AS (SELECT greatest(max(h), 1) AS mx FROM h1f),
            h1 AS (SELECT module, h * 1000000 // mx AS hub FROM h1f, h1m),
            a2r AS (SELECT e.dst AS module, sum(h1.hub) AS a
                    FROM e JOIN h1 ON h1.module = e.src GROUP BY 1),
            a2f AS (SELECT n.module, coalesce(a2r.a, 0) AS a
                    FROM nodes n LEFT JOIN a2r USING (module)),
            a2m AS (SELECT greatest(max(a), 1) AS mx FROM a2f),
            a2 AS (SELECT module, a * 1000000 // mx AS auth FROM a2f, a2m),
            h2r AS (SELECT e.src AS module, sum(a2.auth) AS h
                    FROM e JOIN a2 ON a2.module = e.dst GROUP BY 1),
            h2f AS (SELECT n.module, coalesce(h2r.h, 0) AS h
                    FROM nodes n LEFT JOIN h2r USING (module)),
            h2m AS (SELECT greatest(max(h), 1) AS mx FROM h2f),
            h2 AS (SELECT module, h * 1000000 // mx AS hub FROM h2f, h2m)
            SELECT h2.module, CAST(h2.hub AS BIGINT) AS hub,
                   CAST(a2.auth AS BIGINT) AS auth
            FROM h2 JOIN a2 USING (module)
        """,
        # dependency_depth mirror: 4 unrolled relaxation sweeps,
        # depth(m) = 1 + max(depth of imports), no-out-edge modules at 0
        "code_dep_depth": f"""
            WITH f AS (
              SELECT regexp_extract(content, '(?m)^# module: ([\\w.]+)', 1) AS src,
                     regexp_extract_all(content, '(?m)^import ([\\w.]+)', 1) AS dsts
              FROM read_parquet('{corpus}/*.parquet')
            ),
            e AS (
              SELECT DISTINCT src, unnest(dsts) AS dst
              FROM f WHERE src IS NOT NULL AND src <> ''
            ),
            nodes AS (SELECT src AS module FROM e UNION SELECT dst FROM e),
            d0 AS (SELECT module, CAST(0 AS BIGINT) AS depth FROM nodes),
            r1 AS (SELECT e.src AS module, 1 + max(d0.depth) AS d
                   FROM e JOIN d0 ON d0.module = e.dst GROUP BY 1),
            d1 AS (SELECT n.module, coalesce(r1.d, 0) AS depth
                   FROM nodes n LEFT JOIN r1 USING (module)),
            r2 AS (SELECT e.src AS module, 1 + max(d1.depth) AS d
                   FROM e JOIN d1 ON d1.module = e.dst GROUP BY 1),
            d2 AS (SELECT n.module, coalesce(r2.d, 0) AS depth
                   FROM nodes n LEFT JOIN r2 USING (module)),
            r3 AS (SELECT e.src AS module, 1 + max(d2.depth) AS d
                   FROM e JOIN d2 ON d2.module = e.dst GROUP BY 1),
            d3 AS (SELECT n.module, coalesce(r3.d, 0) AS depth
                   FROM nodes n LEFT JOIN r3 USING (module)),
            r4 AS (SELECT e.src AS module, 1 + max(d3.depth) AS d
                   FROM e JOIN d3 ON d3.module = e.dst GROUP BY 1),
            d4 AS (SELECT n.module, coalesce(r4.d, 0) AS depth
                   FROM nodes n LEFT JOIN r4 USING (module))
            SELECT module, CAST(depth AS BIGINT) AS depth FROM d4
        """,
        # within-label scatter on the floor(x*1e3) grid, HUGEINT sums
        "emb_label_scatter": """
            WITH q AS (
              SELECT label,
                     unnest(list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS v,
                     unnest(range(1, len(embedding) + 1)) AS d
              FROM embeddings),
            n AS (SELECT label, CAST(count(*) AS BIGINT) AS n
                  FROM embeddings GROUP BY 1),
            agg AS (SELECT label, d, sum(v) AS s, sum(v * v) AS ss
                    FROM q GROUP BY 1, 2)
            SELECT CAST(a.label AS BIGINT) AS label, n.n,
                   CAST(sum(n.n * a.ss - a.s * a.s) AS BIGINT) AS scatter_num
            FROM agg a JOIN n USING (label) GROUP BY 1, 2
        """,
        # Matryoshka prefix-truncation mirror: same floor(x*1e6) grid
        "emb_matryoshka_error": """
            WITH qe AS (
              SELECT vec_id,
                     unnest(list_transform(embedding, x ->
                       CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
                       AS v,
                     unnest(range(1, len(embedding) + 1)) AS d
              FROM embeddings),
            m(m) AS (VALUES (8), (16), (32))
            SELECT vec_id, CAST(m.m AS BIGINT) AS m,
                   CAST(coalesce(sum(v*v) FILTER (d <= m.m), 0) AS BIGINT)
                       AS kept_sq,
                   CAST(coalesce(sum(v*v) FILTER (d > m.m), 0) AS BIGINT)
                       AS dropped_sq,
                   CAST(coalesce(sum(v*v) FILTER (d <= m.m), 0) * 1000000
                        // greatest(coalesce(sum(v*v), 0), 1) AS BIGINT)
                       AS retain_ppm
            FROM qe, m GROUP BY vec_id, m.m
        """,
        # identifier_vocab mirror: same lowercase token model + '_' split
        "code_identifier_vocab": f"""
            WITH occ AS (
              SELECT repo,
                     unnest(regexp_extract_all(content,
                            '[a-z_][a-z0-9_]*')) AS ident
              FROM read_parquet('{corpus}/*.parquet')),
            sub AS (SELECT repo, unnest(string_split(ident, '_')) AS sub
                    FROM occ),
            cnt AS (SELECT repo, sub, CAST(count(*) AS BIGINT) AS n
                    FROM sub WHERE sub <> '' GROUP BY 1, 2),
            agg AS (SELECT repo, CAST(sum(n) AS BIGINT) AS n_rows,
                           CAST(count(*) AS BIGINT) AS n_cats
                    FROM cnt GROUP BY 1),
            top AS (SELECT repo, sub AS top_cat, n FROM (
                      SELECT *, row_number() OVER (
                        PARTITION BY repo ORDER BY n DESC, sub) rn FROM cnt)
                    WHERE rn = 1)
            SELECT a.repo, a.n_rows, a.n_cats, t.top_cat,
                   CAST(t.n * 1000000 // a.n_rows AS BIGINT) AS top_ppm
            FROM agg a JOIN top t USING (repo)
        """,
        # state dwell time: gap to the next event attributed to the
        # current event_type, exact integer µs (lead window mirror)
        "events_dwell": """
            WITH o AS (
              SELECT user_id, event_type, ts,
                     lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS nxt
              FROM events
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_intervals,
                   CAST(sum(epoch_us(nxt) - epoch_us(ts))
                        AS BIGINT) AS total_dwell_us,
                   CAST(max(epoch_us(nxt) - epoch_us(ts))
                        AS BIGINT) AS max_dwell_us
            FROM o WHERE nxt IS NOT NULL GROUP BY 1
        """,
        # watermark-lateness profile: exclusive running max of event time
        # in arrival (event_id) order, exact µs lateness per user
        "events_lateness": """
            WITH o AS (
              SELECT user_id, ts,
                     max(ts) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS wm
              FROM events
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN wm > ts THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_late,
                   CAST(coalesce(max(CASE WHEN wm > ts
                          THEN epoch_us(wm) - epoch_us(ts) ELSE 0 END), 0)
                        AS BIGINT) AS max_lateness_us,
                   CAST(coalesce(sum(CASE WHEN wm > ts
                          THEN epoch_us(wm) - epoch_us(ts) ELSE 0 END), 0)
                        AS BIGINT) AS sum_lateness_us
            FROM o GROUP BY 1
        """,
        # type-2 clone groups: '\ndef '-split segments (shared verbatim
        # with function_clones — RE2 has no lookahead for block regexes),
        # digit-abstracted, md5'd, grouped with a distinct-file gate
        "code_clones": f"""
            WITH parts AS (
              SELECT repo, path,
                     unnest(str_split(content, chr(10) || 'def ')) AS seg,
                     unnest(range(1, len(str_split(content,
                                    chr(10) || 'def ')) + 1)) AS i
              FROM read_parquet('{corpus}/*.parquet')
            ),
            fn AS (
              SELECT repo, path,
                     substr(md5(regexp_replace(seg, '[0-9]+', '#', 'g')),
                            1, 16) AS ch
              FROM parts WHERE i > 1
            )
            SELECT ch AS clone_hash,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(count(DISTINCT repo || '/' || path) AS BIGINT)
                     AS n_files
            FROM fn GROUP BY 1
            HAVING count(DISTINCT repo || '/' || path) >= 2
        """,
        # MOSS winnowing: k=4-gram md5 hashes, w=4 windows, rightmost-min
        # selection (ORDER BY h, pos DESC), per-doc ordered signature md5
        "doc_winnow": """
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            g AS (
              SELECT doc_id, greatest(len(ws) - 3, 0) AS n,
                     unnest(range(1, greatest(len(ws) - 3, 0) + 1)) AS i, ws
              FROM w
            ),
            gh AS (
              SELECT doc_id, n, i - 1 AS pos,
                     CAST(('0x' || substr(md5(array_to_string(
                       list_slice(ws, i, i + 3), ' ')), 1, 8)) AS BIGINT) AS h
              FROM g
            ),
            starts AS (
              SELECT doc_id, unnest(range(0, greatest(n - 4, 0) + 1)) AS s
              FROM (SELECT DISTINCT doc_id, n FROM gh)
            ),
            sel AS (
              SELECT DISTINCT doc_id, pos, h FROM (
                SELECT st.doc_id, st.s, b.pos, b.h,
                       row_number() OVER (PARTITION BY st.doc_id, st.s
                                          ORDER BY b.h, b.pos DESC) AS rn
                FROM starts st JOIN gh b ON b.doc_id = st.doc_id
                     AND b.pos BETWEEN st.s AND st.s + 3
              ) WHERE rn = 1
            ),
            fp AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_selected,
                     substr(md5(string_agg(
                       CAST(pos AS VARCHAR) || ':' || CAST(h AS VARCHAR),
                       ' ' ORDER BY pos)), 1, 16) AS fp16
              FROM sel GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(greatest(len(w.ws) - 3, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(fp.n_selected, 0) AS BIGINT) AS n_selected,
                   coalesce(fp.fp16, substr(md5(''), 1, 16)) AS fp16
            FROM w LEFT JOIN fp ON fp.doc_id = w.doc_id
        """,
        # curation funnel: one scan of the composed curation CTE, then a
        # constant unpivot of the 8 counters (gate order exact->lang->
        # quality->decon)
        "doc_curation_funnel": f"""
            WITH agg AS (
              SELECT CAST(sum(keep_exact) AS BIGINT) AS p1,
                     CAST(sum(keep_lang) AS BIGINT) AS p2,
                     CAST(sum(keep_quality) AS BIGINT) AS p3,
                     CAST(sum(keep_decon) AS BIGINT) AS p4,
                     CAST(sum(keep_exact) AS BIGINT) AS c1,
                     CAST(sum(keep_exact * keep_lang) AS BIGINT) AS c2,
                     CAST(sum(keep_exact * keep_lang * keep_quality)
                          AS BIGINT) AS c3,
                     CAST(sum(keep) AS BIGINT) AS c4
              FROM ({_CURATION_SQL})
            )
            SELECT CAST(1 AS BIGINT) AS rule_idx, 'keep_exact' AS rule,
                   p1 AS n_pass, c1 AS n_cum FROM agg
            UNION ALL SELECT 2, 'keep_lang', p2, c2 FROM agg
            UNION ALL SELECT 3, 'keep_quality', p3, c3 FROM agg
            UNION ALL SELECT 4, 'keep_decon', p4, c4 FROM agg
        """,
        # snowflake dimension chain: customer -> nation -> region flatten,
        # exact per-(region, segment) aggregates
        "region_segment_stats": """
            SELECT r.r_name, c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_customers,
                   CAST(sum(CAST(floor(c.c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS acctbal_cents
            FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1, 2
        """,
        # metadata-only scan plan: DuckDB's parquet_metadata() reads the
        # same footers the Ray planner opens — no data pages on either side
        "doc_scan_prune": f"""
            SELECT regexp_extract(file_name, 'part-[0-9]+\\.parquet')
                     AS file,
                   CAST(row_group_id AS BIGINT) AS row_group,
                   CAST(row_group_num_rows AS BIGINT) AS n_rows,
                   CAST(stats_min_value AS BIGINT) AS min_val,
                   CAST(stats_max_value AS BIGINT) AS max_val,
                   CAST(CASE WHEN CAST(stats_max_value AS BIGINT) < 2000
                             OR CAST(stats_min_value AS BIGINT) > 2999
                        THEN 1 ELSE 0 END AS BIGINT) AS skipped
            FROM parquet_metadata('{_prune_dir}/part-*.parquet')
            WHERE path_in_schema = 'doc_id'
        """,
        # compaction planner mirror: same footers via parquet_metadata,
        # bytes = all column chunks, rows deduped on one column's rows
        "doc_compaction_plan": f"""
            WITH m AS (
              SELECT regexp_extract(file_name, 'part-[0-9]+\\.parquet')
                       AS file,
                     CAST(sum(total_compressed_size) AS BIGINT)
                       AS total_bytes,
                     CAST(coalesce(sum(row_group_num_rows)
                       FILTER (path_in_schema = 'doc_id'), 0) AS BIGINT)
                       AS n_rows
              FROM parquet_metadata('{_prune_dir}/part-*.parquet')
              GROUP BY 1)
            SELECT file, n_rows, total_bytes,
                   CAST(coalesce(sum(total_bytes) OVER (
                          ORDER BY file ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) // 2500 AS BIGINT) AS bin
            FROM m
        """,
        # TPC-H Q6 shape: scan-filter-aggregate, exact integer cents
        "q6_revenue": """
            SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        # vocabulary set algebra between two corpus slices
        "doc_vocab_setops": """
            WITH t AS (
              SELECT DISTINCT source, token FROM (
                SELECT source,
                       unnest(regexp_extract_all(lower(text), '[a-z]+'))
                         AS token
                FROM documents WHERE source IN ('src6', 'src14'))),
            m AS (
              SELECT token,
                     CAST(max(CASE WHEN source = 'src6' THEN 1 ELSE 0 END)
                          AS BIGINT) AS in_a,
                     CAST(max(CASE WHEN source = 'src14' THEN 1 ELSE 0 END)
                          AS BIGINT) AS in_b
              FROM t GROUP BY 1)
            SELECT token, in_a, in_b,
                   CASE WHEN in_a > 0 AND in_b > 0 THEN 'both'
                        WHEN in_a > 0 THEN 'a_only'
                        ELSE 'b_only' END AS status
            FROM m
        """,
        # integer token-entropy surrogate: exact floored log2 via
        # length(bin(x))-1 on both engines (bit_length-1 in Python)
        "doc_entropy": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
              FROM documents),
            tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
            agg AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS s_tf
              FROM tf GROUP BY 1)
            SELECT d.doc_id,
                   CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
                   CAST(CASE WHEN a.n_tokens IS NULL THEN 0
                        ELSE a.n_tokens * (length(bin(a.n_tokens)) - 1)
                             - a.s_tf END AS BIGINT) AS entropy_s
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # power-of-two time-decay (half-life = 1 week), exact integer µs
        "events_decay": """
            WITH w AS (
              SELECT user_id,
                     (CAST(1 AS BIGINT) << CAST(
                        20 - least(greatest(
                          epoch_us(TIMESTAMP '1998-01-01') - epoch_us(ts),
                          0) // 604800000000, 20) AS INTEGER)) AS w
              FROM events)
            SELECT user_id, CAST(sum(w) AS BIGINT) AS decay_score,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1
        """,
        # first-order Markov transitions in (ts, event_id) arrival order,
        # row-normalized to integer ppm
        "events_transitions": """
            WITH o AS (
              SELECT event_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS next_type
              FROM events),
            c AS (SELECT event_type AS prev_type, next_type,
                         CAST(count(*) AS BIGINT) AS n
                  FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT prev_type, sum(n) AS row_total FROM c GROUP BY 1)
            SELECT c.prev_type, c.next_type, c.n,
                   CAST(c.n * 1000000 // t.row_total AS BIGINT) AS ppm
            FROM c JOIN t USING (prev_type)
        """,
        # semi-structured: JSON payload extraction + per-type reduce
        "events_props_stats": """
            WITH p AS (
              SELECT event_type,
                     CASE WHEN json_valid(props)
                          THEN TRY_CAST(json_extract(props, '$.k')
                                        AS BIGINT) END AS kx
              FROM events),
            f AS (
              SELECT event_type, coalesce(kx, 0) AS k,
                     CASE WHEN kx IS NULL THEN 1 ELSE 0 END AS bad
              FROM p)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(bad) AS BIGINT) AS n_bad,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM f GROUP BY 1
        """,
        # trending types per UTC day: exact counts + per-day top-3
        "events_trending": """
            WITH c AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     event_type, CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2)
            SELECT day, event_type, n, CAST(rank AS BIGINT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY day ORDER BY n DESC, event_type) AS rank
              FROM c
            ) WHERE rank <= 3
        """,
        # TPC-H Q4 shape: distributed EXISTS (late-shipment semi-join);
        # exists(l_shipdate > o_orderdate) == max(l_shipdate) > o_orderdate
        "q4_late_orders": """
            SELECT o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_late_orders
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        # first/last-touch attribution per user, exact µs span
        "events_user_span": """
            WITH o AS (
              SELECT user_id, event_type, ts,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                     count(*) OVER (PARTITION BY user_id) AS n,
                     min(ts) OVER (PARTITION BY user_id) AS t0,
                     max(ts) OVER (PARTITION BY user_id) AS t1
              FROM events)
            SELECT f.user_id, f.event_type AS first_type,
                   l.event_type AS last_type,
                   CAST(f.n AS BIGINT) AS n_events,
                   CAST(epoch_us(f.t1) - epoch_us(f.t0) AS BIGINT) AS span_us
            FROM (SELECT * FROM o WHERE rn = 1) f
            JOIN (SELECT * FROM o WHERE rn = n) l USING (user_id)
        """,
        # sliding-window exact distinct users (1h window, 15m hop)
        "events_sliding_users": """
            WITH expanded AS (
              SELECT user_id,
                     ts - to_microseconds(epoch_us(ts) % 900000000)
                        - to_microseconds(k.k * 900000000) AS win_start
              FROM events CROSS JOIN range(4) k(k)
            )
            SELECT win_start,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM expanded GROUP BY 1
        """,
        # ISO-weekday profile (dow 0 = Monday == isodow − 1)
        "orders_weekday_profile": """
            SELECT CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS total_cents
            FROM orders GROUP BY 1
        """,
        # audience-overlap Jaccard (integer ppm) between type pairs
        "events_type_overlap": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
            t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
                  FROM ut GROUP BY 1),
            p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                         CAST(count(*) AS BIGINT) AS n_both
                  FROM ut a JOIN ut b ON a.user_id = b.user_id
                                     AND a.event_type < b.event_type
                  GROUP BY 1, 2)
            SELECT p.type_a, p.type_b, ta.n AS n_a, tb.n AS n_b, p.n_both,
                   CAST(p.n_both * 1000000
                        // (ta.n + tb.n - p.n_both) AS BIGINT) AS jaccard_ppm
            FROM p JOIN t ta ON ta.event_type = p.type_a
                 JOIN t tb ON tb.event_type = p.type_b
        """,
        # integer spike rule: n_day·n_days > 2·type_total (no float avg)
        "events_spike_days": """
            WITH c AS (
              SELECT event_type,
                     CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS type_total,
                         CAST(count(*) AS BIGINT) AS n_days
                  FROM c GROUP BY 1)
            SELECT c.event_type, c.day, c.n, t.type_total, t.n_days,
                   CAST(CASE WHEN c.n * t.n_days > 2 * t.type_total
                        THEN 1 ELSE 0 END AS BIGINT) AS spike
            FROM c JOIN t USING (event_type)
        """,
        # percent-of-parent at fact scale: line ppm of order revenue
        "lineitem_share_of_order": """
            WITH l AS (
              SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS cents
              FROM lineitem),
            o AS (SELECT l_orderkey, CAST(sum(cents) AS BIGINT)
                         AS order_cents
                  FROM l GROUP BY 1)
            SELECT l.l_orderkey, l.l_linenumber, l.cents, o.order_cents,
                   CAST(l.cents * 1000000
                        // greatest(o.order_cents, 1) AS BIGINT) AS share_ppm
            FROM l JOIN o USING (l_orderkey)
        """,
        # exact Pareto 80/20: smallest k with den·cum >= num·total
        "customer_pareto_80": """
            WITH r AS (
              SELECT o_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS v
              FROM orders GROUP BY 1),
            t AS (SELECT CAST(sum(v) AS BIGINT) AS total,
                         CAST(count(*) AS BIGINT) AS n FROM r),
            c AS (SELECT v,
                         row_number() OVER (ORDER BY v DESC, o_custkey DESC)
                           AS k,
                         sum(v) OVER (ORDER BY v DESC, o_custkey DESC
                                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM r),
            sel AS (SELECT c.k, c.cum FROM c, t
                    WHERE 5 * c.cum >= 4 * t.total
                    ORDER BY c.k LIMIT 1)
            SELECT t.n, t.total AS total_cents,
                   CAST(sel.k AS BIGINT) AS k_top,
                   CAST(sel.cum AS BIGINT) AS topk_cents,
                   CAST(sel.k * 1000000 // t.n AS BIGINT) AS k_ppm
            FROM t, sel
        """,
        # exact Gini over per-customer revenue (row_number rank form)
        "customer_revenue_gini": """
            WITH r AS (
              SELECT o_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS v
              FROM orders GROUP BY 1),
            rk AS (
              SELECT v, CAST(row_number() OVER (ORDER BY v, o_custkey)
                             AS HUGEINT) AS rnk,
                     CAST(count(*) OVER () AS HUGEINT) AS n
              FROM r)
            SELECT CAST(max(n) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS total_cents,
                   CAST(sum((2 * rnk - n - 1) * v) AS BIGINT) AS gini_num,
                   CAST(sum((2 * rnk - n - 1) * v) * 1000000
                        // (max(n) * sum(v)) AS BIGINT) AS gini_ppm
            FROM rk
        """,
        # winsorized/trimmed robust aggregates at exact p05/p95 bounds
        # (quantile_disc semantics), clamped on the integer cents grid
        "lineitem_winsorized": """
            WITH b AS (
              SELECT CAST(floor(quantile_disc(l_extendedprice, 0.05) * 100)
                          AS BIGINT) AS lo,
                     CAST(floor(quantile_disc(l_extendedprice, 0.95) * 100)
                          AS BIGINT) AS hi
              FROM lineitem WHERE l_extendedprice IS NOT NULL),
            v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
                  FROM lineitem)
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_below,
                   CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_above,
                   CAST(sum(least(greatest(c, lo), hi)) AS BIGINT)
                       AS winsorized_sum_cents,
                   CAST(coalesce(sum(c) FILTER (c >= lo AND c <= hi), 0)
                        AS BIGINT) AS trimmed_sum_cents,
                   CAST(coalesce(count(*) FILTER (c >= lo AND c <= hi), 0)
                        AS BIGINT) AS trimmed_n,
                   CAST(min(lo) AS BIGINT) AS lo_cents,
                   CAST(min(hi) AS BIGINT) AS hi_cents
            FROM v, b
        """,
        # TPC-H Q7 shape: full nation-pair trade-flow matrix
        "q7_nation_flows": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            GROUP BY 1, 2
        """,
        # TPC-H Q5 shape: local-supplier volume (customer nation ==
        # supplier nation), exact integer cents revenue per nation
        "q5_nation_volume": """
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        # TPC-H Q8 shape: in-region revenue share supplied by one nation,
        # per order year, integer ppm
        "q8_market_share": """
            WITH rn AS (
              SELECT n_nationkey FROM nation
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'),
            tgt AS (
              SELECT s_suppkey FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_name = 'NATION_2'),
            ord AS (
              SELECT o_orderkey,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_nationkey IN (SELECT n_nationkey FROM rn)),
            li AS (
              SELECT l_orderkey,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS cents,
                     l_suppkey IN (SELECT s_suppkey FROM tgt) AS ist
              FROM lineitem)
            SELECT o_year,
                   CAST(coalesce(sum(cents) FILTER (ist), 0) AS BIGINT)
                       AS target_cents,
                   CAST(sum(cents) AS BIGINT) AS total_cents,
                   CAST(coalesce(sum(cents) FILTER (ist), 0) * 1000000
                        // sum(cents) AS BIGINT) AS share_ppm
            FROM li JOIN ord ON l_orderkey = o_orderkey
            GROUP BY o_year
        """,
        # TPC-H Q9 shape: profit per (supplier nation, order year), cost
        # proxied by retail price x quantity (no partsupp in this corpus)
        "q9_profit_by_nation_year": """
            WITH li AS (
              SELECT l_orderkey, CAST(s_nationkey AS BIGINT) AS n_nationkey,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT)
                     - CAST(round(p_retailprice * 100) AS BIGINT)
                       * CAST(l_quantity AS BIGINT) AS profit_cents
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey),
            per_ok AS (
              SELECT l_orderkey, n_nationkey,
                     CAST(sum(profit_cents) AS BIGINT) AS profit_cents
              FROM li GROUP BY 1, 2)
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(profit_cents) AS BIGINT) AS profit_cents,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM per_ok
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation USING (n_nationkey)
            GROUP BY 1, 2
        """,
        # TPC-H Q10 shape: top-20 customers by returned-item revenue on
        # orders in a window (deterministic custkey tie-break)
        "q10_returned_items": """
            SELECT c_custkey, c_name, n_name, revenue_cents
            FROM (
              SELECT o_custkey AS c_custkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                         * 100) AS BIGINT)) AS BIGINT)
                         AS revenue_cents
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              WHERE l_returnflag = 'R'
                AND o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1997-07-01'
              GROUP BY 1
            ) r
            JOIN customer USING (c_custkey)
            JOIN nation ON c_nationkey = n_nationkey
            ORDER BY revenue_cents DESC, c_custkey
            LIMIT 20
        """,
        # TPC-H Q12 shape: high- vs low-priority line counts per
        # linestatus for lines shipped in a window (no shipmode column)
        "q12_priority_lines": """
            SELECT l_linestatus,
                   CAST(coalesce(sum(CASE WHEN o_orderpriority IN
                        ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS high_lines,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(count(*) - coalesce(sum(CASE WHEN o_orderpriority
                        IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS low_lines
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_linestatus
        """,
        # TPC-H Q15 shape: supplier(s) at the global max window revenue
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                         * 100) AS BIGINT)) AS BIGINT)
                         AS total_revenue_cents
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY 1)
            SELECT s_suppkey, s_name, total_revenue_cents
            FROM rev JOIN supplier USING (s_suppkey)
            WHERE total_revenue_cents =
                  (SELECT max(total_revenue_cents) FROM rev)
        """,
        # TPC-H Q17 shape: revenue of below-20%%-of-part-average-quantity
        # lines for one brand, integer cross-multiplied (5*qty*cnt < sum)
        "q17_small_qty_cents": """
            WITH lines AS (
              SELECT l_partkey AS p_partkey,
                     CAST(l_quantity AS BIGINT) AS qty,
                     CAST(floor(l_extendedprice * 100) AS BIGINT)
                         AS price_cents
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#1'),
            folds AS (
              SELECT p_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM lines GROUP BY 1)
            SELECT CAST(coalesce(sum(price_cents)
                        FILTER (5 * qty * cnt < sum_qty), 0) AS BIGINT)
                       AS small_qty_cents,
                   CAST(count(*) FILTER (5 * qty * cnt < sum_qty)
                        AS BIGINT) AS n_small_lines
            FROM lines JOIN folds USING (p_partkey)
        """,
        # TPC-H Q19 shape: three disjunctive (brand, size, qty) predicate
        # arms + the OR-total, one scan, exact cents
        "q19_disjunctive_revenue": """
            WITH f AS (
              SELECT p_brand, CAST(p_size AS BIGINT) AS s,
                     CAST(l_quantity AS BIGINT) AS q,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS cents
              FROM lineitem JOIN part ON l_partkey = p_partkey),
            m AS (
              SELECT cents,
                (p_brand = 'Brand#1' AND s BETWEEN 1 AND 15
                 AND q BETWEEN 1 AND 20) AS a1,
                (p_brand = 'Brand#2' AND s BETWEEN 10 AND 30
                 AND q BETWEEN 5 AND 30) AS a2,
                (p_brand = 'Brand#3' AND s BETWEEN 20 AND 50
                 AND q BETWEEN 10 AND 40) AS a3
              FROM f)
            SELECT 'arm1' AS arm,
                   CAST(coalesce(sum(cents) FILTER (a1), 0) AS BIGINT)
                       AS revenue_cents,
                   CAST(count(*) FILTER (a1) AS BIGINT) AS n_lines FROM m
            UNION ALL
            SELECT 'arm2',
                   CAST(coalesce(sum(cents) FILTER (a2), 0) AS BIGINT),
                   CAST(count(*) FILTER (a2) AS BIGINT) FROM m
            UNION ALL
            SELECT 'arm3',
                   CAST(coalesce(sum(cents) FILTER (a3), 0) AS BIGINT),
                   CAST(count(*) FILTER (a3) AS BIGINT) FROM m
            UNION ALL
            SELECT 'any',
                   CAST(coalesce(sum(cents) FILTER (a1 OR a2 OR a3), 0)
                        AS BIGINT),
                   CAST(count(*) FILTER (a1 OR a2 OR a3) AS BIGINT) FROM m
        """,
        # TPC-H Q21 shape: lone-laggard supplier on finalized
        # multi-supplier orders (max-shipdate holder, alone at the max)
        "q21_waiting_supplier": """
            WITH per_os AS (
              SELECT l_orderkey AS ok, l_suppkey AS sk,
                     max(l_shipdate) AS supp_max
              FROM lineitem GROUP BY 1, 2),
            per_order AS (
              SELECT ok, max(supp_max) AS order_max,
                     count(*) AS n_supp
              FROM per_os GROUP BY 1),
            gated AS (
              SELECT p.* FROM per_order p
              JOIN orders ON ok = o_orderkey
              WHERE o_orderstatus = 'F'),
            at_max AS (
              SELECT p.ok, p.sk FROM per_os p
              JOIN gated g ON p.ok = g.ok
              WHERE p.supp_max = g.order_max AND g.n_supp >= 2),
            lone AS (
              SELECT ok, min(sk) AS s_suppkey
              FROM at_max GROUP BY ok HAVING count(*) = 1)
            SELECT s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS numwait
            FROM lone JOIN supplier USING (s_suppkey)
            GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey
            LIMIT 10
        """,
        # TPC-H Q22 shape: above-average-balance customers idle since a
        # cutoff (global scalar via exact cross-multiplication + left
        # anti pattern), per market segment
        "q22_idle_customers": """
            WITH bal AS (
              SELECT c_custkey, c_mktsegment,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer),
            stats AS (
              SELECT CAST(coalesce(sum(cents) FILTER (cents > 0), 0)
                          AS BIGINT) AS s,
                     CAST(count(*) FILTER (cents > 0) AS BIGINT) AS n
              FROM bal),
            last AS (
              SELECT o_custkey AS c_custkey,
                     max(o_orderdate) AS last_order
              FROM orders GROUP BY 1)
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
                   CAST(sum(cents) AS BIGINT) AS total_bal_cents
            FROM bal LEFT JOIN last USING (c_custkey), stats
            WHERE cents * n > s
              AND (last_order IS NULL
                   OR last_order < TIMESTAMP '2000-01-01')
            GROUP BY c_mktsegment
        """,
        # TPC-H Q2 shape: correlated-MIN equality join (min unit price per
        # part from lineitem — no partsupp table), integer floor division
        "q2_min_cost_supplier": """
            WITH per_ps AS (
              SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                     min(CAST(floor(l_extendedprice * 100) AS BIGINT)
                         // CAST(l_quantity AS BIGINT)) AS unit_cents
              FROM lineitem GROUP BY 1, 2),
            per_p AS (
              SELECT p_partkey, min(unit_cents) AS min_cents
              FROM per_ps GROUP BY 1)
            SELECT p_partkey, p_name, s_suppkey, s_name,
                   CAST(unit_cents AS BIGINT) AS unit_cents
            FROM per_ps
            JOIN per_p USING (p_partkey)
            JOIN supplier USING (s_suppkey)
            JOIN part USING (p_partkey)
            WHERE unit_cents = min_cents
            ORDER BY p_partkey, s_suppkey
            LIMIT 20
        """,
        # TPC-H Q20 shape: suppliers shipping > 1/5 of a part's total
        # quantity (nested aggregate + integer cross-multiplied share)
        "q20_part_share_suppliers": """
            WITH per_ps AS (
              SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS supp_qty
              FROM lineitem GROUP BY 1, 2),
            per_p AS (
              SELECT p_partkey,
                     CAST(sum(supp_qty) AS BIGINT) AS part_qty
              FROM per_ps GROUP BY 1)
            SELECT s_suppkey, s_name,
                   CAST(count(*) AS BIGINT) AS n_dominated_parts
            FROM per_ps
            JOIN per_p USING (p_partkey)
            JOIN supplier USING (s_suppkey)
            WHERE 5 * supp_qty > 1 * part_qty
            GROUP BY 1, 2
        """,
        # A-Priori round 2: frequent triples, candidates pruned to those
        # whose three member pairs are all frequent (support >= 2)
        "basket_part_triples": """
            WITH items AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ),
            sized AS (
              SELECT o FROM items GROUP BY o
              HAVING count(*) BETWEEN 2 AND 64
            ),
            pr AS (
              SELECT a.p AS pa, b.p AS pb, count(*) AS support
              FROM items a
              JOIN sized s ON s.o = a.o
              JOIN items b ON b.o = a.o AND a.p < b.p
              GROUP BY 1, 2
            ),
            freq AS (SELECT pa, pb FROM pr WHERE support >= 2),
            sized3 AS (
              SELECT o FROM items GROUP BY o
              HAVING count(*) BETWEEN 3 AND 64
            ),
            tri AS (
              SELECT a.p AS pa, b.p AS pb, c.p AS pc,
                     CAST(count(*) AS BIGINT) AS support
              FROM items a
              JOIN sized3 s ON s.o = a.o
              JOIN items b ON b.o = a.o AND a.p < b.p
              JOIN items c ON c.o = a.o AND b.p < c.p
              JOIN freq f1 ON f1.pa = a.p AND f1.pb = b.p
              JOIN freq f2 ON f2.pa = b.p AND f2.pb = c.p
              JOIN freq f3 ON f3.pa = a.p AND f3.pb = c.p
              GROUP BY 1, 2, 3
            )
            SELECT pa, pb, pc, support, rank FROM (
              SELECT *, row_number() OVER
                (ORDER BY support DESC, pa, pb, pc) AS rank
              FROM tri
            ) WHERE rank <= 20
        """,
        # daily OHLC candles per event type: deterministic (ts, event_id)
        # open/close, integer cents high/low
        "events_ohlc": """
            WITH e AS (
              SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY ts, event_id) AS rn,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY ts DESC, event_id DESC)
                         AS rrn
              FROM e)
            SELECT event_type, CAST(day AS TIMESTAMP) AS day,
                   CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT)
                       AS open_cents,
                   CAST(max(cents) AS BIGINT) AS high_cents,
                   CAST(min(cents) AS BIGINT) AS low_cents,
                   CAST(max(CASE WHEN rrn = 1 THEN cents END) AS BIGINT)
                       AS close_cents,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM r GROUP BY 1, 2
        """,
        # RANGE-frame rolling window: 7-day revenue per type over the
        # daily series (interval frame, calendar gaps shrink the window)
        "events_rolling_7d": """
            WITH e AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            daily AS (
              SELECT event_type, day,
                     CAST(sum(cents) AS BIGINT) AS day_cents
              FROM e GROUP BY 1, 2)
            SELECT event_type, CAST(day AS TIMESTAMP) AS day, day_cents,
                   CAST(sum(day_cents) OVER (
                     PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS rolling_7d_cents
            FROM daily
        """,
        # max drawdown over the daily close series (running max minus
        # close, global max per type) — composed on the OHLC mirror
        "events_drawdown": """
            WITH e AS (
              SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events),
            r AS (
              SELECT *,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY ts DESC, event_id DESC)
                         AS rrn
              FROM e),
            closes AS (
              SELECT event_type, day, cents AS close_cents
              FROM r WHERE rrn = 1),
            dd AS (
              SELECT event_type,
                     max(close_cents) OVER (PARTITION BY event_type
                                            ORDER BY day) - close_cents
                         AS deficit,
                     close_cents
              FROM closes)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(max(deficit) AS BIGINT) AS max_drawdown_cents,
                   CAST(max(close_cents) AS BIGINT) AS peak_cents
            FROM dd GROUP BY event_type
        """,
        # interpolated global percentiles in exact micro-units
        # (percentile_cont without the float lerp): the mirror sorts, the
        # Ray side histogram-selects the two neighbor order statistics
        "lineitem_quantile_cont": """
            WITH v AS (
              SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
            s AS (SELECT c, row_number() OVER (ORDER BY c) AS r FROM v),
            p(q, pct) AS (VALUES ('p25', 25), ('p50', 50),
                                 ('p75', 75), ('p90', 90)),
            pos AS (
              SELECT q, n, (n - 1) * pct // 100 + 1 AS lo_rank,
                     (n - 1) * pct % 100 AS rem
              FROM p, nn)
            SELECT pos.q, pos.n, CAST(pos.lo_rank AS BIGINT) AS lo_rank,
                   CAST(pos.rem AS BIGINT) AS rem,
                   CAST(l.c AS BIGINT) AS v_lo,
                   CAST(h.c AS BIGINT) AS v_hi,
                   CAST(l.c * 1000000 + (h.c - l.c) * pos.rem * 10000
                        AS BIGINT) AS value_micro
            FROM pos
            JOIN s l ON l.r = pos.lo_rank
            JOIN s h ON h.r = CASE WHEN pos.rem > 0
                                   THEN least(pos.lo_rank + 1, pos.n)
                                   ELSE pos.lo_rank END
        """,
        # filtered ANN: ann_topk restricted to corpus rows sharing the
        # query's label (metadata-predicate vector search)
        "ann_filtered_topk": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qv,
                              label AS ql
                       FROM embeddings WHERE vec_id < 8),
            pairs AS (
              SELECT q.query_vec_id, e.vec_id,
                     list_cosine_similarity(q.qv, e.embedding) AS sim
              FROM q JOIN embeddings e
                ON e.label = q.ql AND e.vec_id <> q.query_vec_id
            ),
            ranked AS (
              SELECT query_vec_id, vec_id,
                     row_number() OVER (PARTITION BY query_vec_id
                                        ORDER BY sim DESC, vec_id ASC)
                         AS rank
              FROM pairs
            )
            SELECT query_vec_id, CAST(rank AS BIGINT) AS rank, vec_id
            FROM ranked WHERE rank <= 5
        """,
        # per-(repo, lang) API surface: def/class counts + distinct
        # def-name vocabulary (mirror of stages/codegraph.api_surface)
        # unused_defs mirror: defs vs call-shaped occurrences per (repo,
        # name); unused iff the counts are equal (each def line is itself
        # a callsite match); first_unused = lexicographic min or ''
        "code_unused_defs": f"""
            WITH src AS (
              SELECT repo, content FROM read_parquet('{corpus}/*.parquet')),
            defs AS (
              SELECT repo, unnest(regexp_extract_all(content,
                '(?m)^[ \\t]*def[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\(',
                1)) AS name
              FROM src),
            dc AS (SELECT repo, name, count(*) AS n_def
                   FROM defs GROUP BY 1, 2),
            calls AS (
              SELECT repo, unnest(regexp_extract_all(content,
                '([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\(', 1)) AS name
              FROM src),
            cc AS (SELECT repo, name, count(*) AS n_call
                   FROM calls GROUP BY 1, 2),
            flag AS (
              SELECT dc.repo, dc.name, dc.n_def,
                     coalesce(cc.n_call, 0) AS n_call
              FROM dc LEFT JOIN cc
                ON cc.repo = dc.repo AND cc.name = dc.name)
            SELECT repo, CAST(count(*) AS BIGINT) AS n_defs,
                   CAST(sum(CASE WHEN n_call = n_def THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unused,
                   coalesce(min(CASE WHEN n_call = n_def THEN name END),
                            '') AS first_unused
            FROM flag GROUP BY 1
        """,
        "code_api_surface": f"""
            WITH src AS (
              SELECT repo, lang, content
              FROM read_parquet('{corpus}/*.parquet')),
            d AS (
              SELECT repo, lang,
                     unnest(regexp_extract_all(content,
                       '(?m)^[ \\t]*def[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\(',
                       1)) AS name
              FROM src),
            tot AS (
              SELECT repo, lang,
                     CAST(sum(len(regexp_extract_all(content,
                       '(?m)^[ \\t]*def[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\('
                       ))) AS BIGINT) AS n_defs,
                     CAST(sum(len(regexp_extract_all(content,
                       '(?m)^[ \\t]*class[ \\t]+([A-Za-z_][A-Za-z0-9_]*)'
                       ))) AS BIGINT) AS n_classes
              FROM src GROUP BY 1, 2),
            v AS (
              SELECT repo, lang,
                     CAST(count(DISTINCT name) AS BIGINT)
                         AS n_distinct_defs
              FROM d GROUP BY 1, 2)
            SELECT tot.repo, tot.lang, tot.n_defs, tot.n_classes,
                   coalesce(v.n_distinct_defs, 0) AS n_distinct_defs
            FROM tot LEFT JOIN v USING (repo, lang)
        """,
        # TPC-H Q13 shape: per-customer order-count distribution including
        # zero-order customers (left outer join, count non-null)
        "q13_order_distribution": """
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM (
              SELECT c_custkey,
                     CAST(count(o_custkey) AS BIGINT) AS c_count
              FROM customer
              LEFT JOIN (SELECT o_custkey FROM orders
                         WHERE o_orderpriority <> '1-URGENT') o
                ON c_custkey = o_custkey
              GROUP BY c_custkey
            )
            GROUP BY c_count
        """,
        # TPC-H Q14 shape: promo revenue share as integer ppm (HUGEINT
        # product before the floor-division, no float ratio)
        "q14_promo_share": """
            WITH f AS (
              SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                          AS BIGINT) AS cents,
                     (p_type = 'PROMO') AS is_promo
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                AND l_shipdate < TIMESTAMP '1997-09-01')
            SELECT CAST(coalesce(sum(cents) FILTER (is_promo), 0) AS BIGINT)
                       AS promo_cents,
                   CAST(coalesce(sum(cents), 0) AS BIGINT) AS total_cents,
                   CAST(CASE WHEN coalesce(sum(cents), 0) = 0 THEN 0
                        ELSE coalesce(sum(cents) FILTER (is_promo), 0)
                             * 1000000 // sum(cents) END AS BIGINT)
                       AS promo_ppm
            FROM f
        """,
        # TPC-H Q18 shape: large-volume orders (HAVING over the fact
        # groupby, join back to the header, deterministic top-k)
        "q18_big_orders": """
            SELECT o_orderkey, o_custkey, o_orderdate, total_qty
            FROM (
              SELECT l_orderkey AS o_orderkey,
                     CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS total_qty
              FROM lineitem GROUP BY 1
            ) q
            JOIN orders USING (o_orderkey)
            WHERE total_qty > 300
            ORDER BY total_qty DESC, o_orderkey
            LIMIT 20
        """,
        # positional phrase retrieval: exact adjacent-token counts via a
        # token/position self-join (same token model as phrase_match; a
        # boundary-regex count would miss overlapping occurrences)
        "doc_phrase_match": """
            WITH p(qid, w1, w2) AS (VALUES
              ('p_hash_join', 'hash', 'join'),
              ('p_table_scan', 'table', 'scan'),
              ('p_key_order', 'key', 'order')),
            tk AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok,
                     unnest(range(1, len(regexp_extract_all(lower(text),
                                                            '[a-z]+')) + 1)) AS i
              FROM documents
            )
            SELECT p.qid, a.doc_id, CAST(count(*) AS BIGINT) AS n_hits
            FROM p
            JOIN tk a ON a.tok = p.w1
            JOIN tk b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                     AND b.tok = p.w2
            GROUP BY 1, 2
        """,
        # RFM scoring: per-user recency(µs)/frequency/monetary(cents) +
        # exact rank quintiles (row_number over (metric, user_id), score =
        # (rnk-1)*5//n + 1) — mirrors relational.events_rfm
        "events_rfm": """
            WITH pu AS (
              SELECT user_id,
                     CAST(max(epoch_us(ts)) AS BIGINT) AS recency_us,
                     CAST(count(*) AS BIGINT) AS frequency,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT))
                          AS BIGINT) AS monetary_cents
              FROM events GROUP BY 1
            ),
            nn AS (SELECT count(*) AS n FROM pu),
            rk AS (
              SELECT user_id,
                     row_number() OVER (ORDER BY recency_us, user_id) AS rr,
                     row_number() OVER (ORDER BY frequency, user_id) AS fr,
                     row_number() OVER (ORDER BY monetary_cents, user_id) AS mr
              FROM pu
            )
            SELECT pu.user_id, pu.recency_us, pu.frequency,
                   pu.monetary_cents,
                   CAST((rk.rr - 1) * 5 // nn.n + 1 AS BIGINT) AS r_score,
                   CAST((rk.fr - 1) * 5 // nn.n + 1 AS BIGINT) AS f_score,
                   CAST((rk.mr - 1) * 5 // nn.n + 1 AS BIGINT) AS m_score,
                   CAST(((rk.rr - 1) * 5 // nn.n + 1) * 100 +
                        ((rk.fr - 1) * 5 // nn.n + 1) * 10 +
                        ((rk.mr - 1) * 5 // nn.n + 1) AS BIGINT) AS rfm
            FROM pu JOIN rk USING (user_id) CROSS JOIN nn
        """,
        # 2-D Pareto skyline (maximize size, price-cents): NOT EXISTS a
        # dominating row (>= both, > at least one)
        "parts_skyline": """
            WITH pts AS (
              SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                     CAST(floor(p_retailprice * 100) AS BIGINT) AS cents
              FROM part
            )
            SELECT b.p_partkey, b.p_size, b.cents FROM pts b
            WHERE NOT EXISTS (
              SELECT 1 FROM pts a
              WHERE a.p_size >= b.p_size AND a.cents >= b.cents
                AND (a.p_size > b.p_size OR a.cents > b.cents)
            )
        """,
        # cyclomatic proxy: branch-keyword + top-level-def counts (regexes
        # shared verbatim with stages/codegraph.py — RE2/`re` agree here)
        "code_complexity": f"""
            SELECT repo, path,
                   CAST(len(regexp_extract_all(content, '(?m)^def '))
                        AS BIGINT) AS n_funcs,
                   CAST(len(regexp_extract_all(content,
                        '\\b(?:if|elif|else|for|while|and|or|except)\\b'))
                        AS BIGINT) AS n_branches,
                   CAST(len(regexp_extract_all(content, '(?m)^def ')) +
                        len(regexp_extract_all(content,
                        '\\b(?:if|elif|else|for|while|and|or|except)\\b'))
                        AS BIGINT) AS complexity
            FROM read_parquet('{corpus}/*.parquet')
        """,
        # product quantization: the emb_kmeans unroll generalized with a
        # subspace grouping column (dims 1-32 -> sub 0, 33-64 -> sub 1);
        # seeds, floor-mean update, argmin-first ties all identical to
        # cluster.pq_assign_error
        "emb_pq_error": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
              FROM embeddings
            ),
            qe AS (
              SELECT vec_id, unnest(qv) AS v,
                     unnest(range(1, len(qv) + 1)) AS d
              FROM q
            ),
            qs AS (
              SELECT vec_id, CAST((d - 1) // 32 AS BIGINT) AS sub, d, v
              FROM qe
            ),
            c0 AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vec_id
              FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8)
            ),
            ce0 AS (
              SELECT c0.cid, qs.sub, qs.d, qs.v AS cv
              FROM c0 JOIN qs USING (vec_id)
            ),
            d1 AS (
              SELECT qs.vec_id, qs.sub, ce0.cid,
                     sum((qs.v - ce0.cv) * (qs.v - ce0.cv)) AS dist
              FROM qs JOIN ce0 ON ce0.d = qs.d AND ce0.sub = qs.sub
              GROUP BY 1, 2, 3
            ),
            a1 AS (
              SELECT vec_id, sub, cid FROM (
                SELECT vec_id, sub, cid, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
                FROM d1
              ) WHERE rn = 1
            ),
            ce1 AS (
              SELECT ce0.cid, ce0.sub, ce0.d, COALESCE(m.cv, ce0.cv) AS cv
              FROM ce0 LEFT JOIN (
                SELECT a1.cid, qs2.sub, qs2.d,
                       CAST(floor(CAST(sum(qs2.v) AS DOUBLE) / count(*))
                            AS BIGINT) AS cv
                FROM a1 JOIN qs qs2
                  ON qs2.vec_id = a1.vec_id AND qs2.sub = a1.sub
                GROUP BY 1, 2, 3
              ) m ON m.cid = ce0.cid AND m.sub = ce0.sub AND m.d = ce0.d
            ),
            d2 AS (
              SELECT qs.vec_id, qs.sub, ce1.cid,
                     sum((qs.v - ce1.cv) * (qs.v - ce1.cv)) AS dist
              FROM qs JOIN ce1 ON ce1.d = qs.d AND ce1.sub = qs.sub
              GROUP BY 1, 2, 3
            )
            SELECT vec_id, sub, CAST(cid AS BIGINT) AS cluster,
                   CAST(dist AS BIGINT) AS err
            FROM (
              SELECT vec_id, sub, cid, dist, row_number() OVER (
                PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
              FROM d2
            ) WHERE rn = 1
        """,
        # global int8-style scalar quantization error per vector, all on
        # the floor(x*1e6) integer grid (vecstats.scalar_quantize_error)
        "emb_quantize_error": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
              FROM embeddings
            ),
            qe AS (
              SELECT vec_id, unnest(qv) AS v,
                     unnest(range(1, len(qv) + 1)) AS d
              FROM q
            ),
            mm AS (SELECT d, min(v) AS mn, max(v) AS mx FROM qe GROUP BY d),
            err AS (
              SELECT vec_id,
                     abs(v - (mn + code * (mx - mn) // 255)) AS e
              FROM (
                SELECT qe.vec_id, qe.v, mm.mn, mm.mx,
                       CASE WHEN mm.mx > mm.mn
                            THEN (qe.v - mm.mn) * 255 // (mm.mx - mm.mn)
                            ELSE 0 END AS code
                FROM qe JOIN mm USING (d)
              )
            )
            SELECT vec_id, CAST(sum(e) AS BIGINT) AS err_sum,
                   CAST(max(e) AS BIGINT) AS err_max,
                   CAST(count(*) AS BIGINT) AS n_dims
            FROM err GROUP BY vec_id
        """,
        "doc_sample": """
            SELECT * FROM documents WHERE doc_id % 10 = 0
        """,
        # exact per-stratum 10% sample: per-lang quantile_disc threshold
        # over the md5-derived id hash (the engine's group_quantiles is
        # the identical type-1 selection)
        "doc_exact_stratified_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang, h,
                     quantile_disc(h, 0.1) OVER (PARTITION BY lang) AS thr
              FROM (SELECT doc_id, lang,
                           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 8)) AS UBIGINT) AS h
                    FROM documents)
            ) WHERE h <= thr
        """,
        # strict-sequence funnel: min-after-previous join chain
        "events_strict_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY 1
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                   CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
            UNION ALL
            SELECT 2, 'click', (SELECT count(*) FROM s2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        """,
        # mirror of stages/dedup.py dedup_lines (min_files=4): non-empty
        # lines in > 4 distinct files are removed from every file
        "code_dedup_lines": f"""
            WITH f AS (
              SELECT repo, path, split(content, chr(10)) AS ls
              FROM read_parquet('{corpus}/*.parquet')
            ),
            l AS (
              SELECT repo, path, unnest(ls) AS line,
                     unnest(range(1, len(ls) + 1)) AS i
              FROM f
            ),
            dup AS (
              SELECT line FROM (
                SELECT line, count(DISTINCT repo || chr(0) || path) AS nf
                FROM l WHERE line <> '' GROUP BY line
              ) WHERE nf > 4
            ),
            kept AS (
              SELECT l.repo, l.path, l.i, l.line
              FROM l LEFT JOIN dup d ON l.line = d.line
              WHERE d.line IS NULL
            ),
            agg AS (
              SELECT repo, path, count(*) AS n_kept,
                     md5(string_agg(line, chr(10) ORDER BY i)) AS clean_md5
              FROM kept GROUP BY repo, path
            )
            SELECT f2.repo, f2.path,
                   CAST(f2.n_lines AS BIGINT) AS n_lines,
                   CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(f2.n_lines - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
                   coalesce(a.clean_md5, md5('')) AS clean_md5
            FROM (SELECT repo, path, len(ls) AS n_lines FROM f) f2
            LEFT JOIN agg a USING (repo, path)
        """,
        # mirror of stages/window.py grouped_sequence_ngrams: per-user
        # event-type trigrams in (ts, event_id) order, global top-20
        "events_path_trigrams": """
            WITH e AS (
              SELECT user_id, event_type,
                     lead(event_type, 1) OVER w AS e1,
                     lead(event_type, 2) OVER w AS e2
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id)
            ),
            tri AS (
              SELECT event_type || '>' || e1 || '>' || e2 AS ngram
              FROM e WHERE e1 IS NOT NULL AND e2 IS NOT NULL
            ),
            agg AS (SELECT ngram, count(*) AS n FROM tri GROUP BY 1)
            SELECT ngram, n, rank FROM (
              SELECT *, row_number() OVER (ORDER BY n DESC, ngram) AS rank
              FROM agg
            ) WHERE rank <= 20
        """,
        # mirror of stages/groupagg.py global_mad: type-1 median, then
        # type-1 median of |x - median| (both actual elements)
        "lineitem_price_mad": """
            WITH v AS (SELECT l_extendedprice AS x FROM lineitem
                       WHERE l_extendedprice IS NOT NULL),
            m AS (SELECT quantile_disc(x, 0.5) AS med FROM v)
            SELECT m.med AS median,
                   (SELECT quantile_disc(abs(v.x - m.med), 0.5)
                    FROM v) AS mad,
                   (SELECT count(*) FROM v) AS n
            FROM m
        """,
        # mirror of stages/join.py join_size_estimate: per-key count
        # product sum = exact inner-join cardinality
        "join_size_events_customer": """
            WITH lc AS (SELECT user_id AS key, count(*) AS nl
                        FROM events GROUP BY 1),
            rc AS (SELECT c_custkey AS key, count(*) AS nr
                   FROM customer GROUP BY 1),
            p AS (SELECT nl * nr AS prod FROM lc JOIN rc USING (key))
            SELECT CAST(sum(prod) AS BIGINT) AS join_rows,
                   count(*) AS n_keys_common,
                   CAST(max(prod) AS BIGINT) AS max_key_rows
            FROM p
        """,
        # deterministic hash split, same md5-prefix idiom as
        # doc_consistent_sample
        "doc_split_assign": """
            SELECT doc_id, lang,
                   CASE
                     WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS UBIGINT) % 100 < 90 THEN 'train'
                     WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS UBIGINT) % 100 < 95 THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM documents
        """,
        # mirror of stages/groupagg.py weighted_global_quantile (p=50):
        # smallest length whose cumulative token weight clears the
        # integer threshold ceil(W/2) = (W*50 + 99) // 100
        "doc_weighted_median_len": f"""
            WITH t AS (
              SELECT n_chars,
                     CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS w
              FROM documents
            ),
            thr AS (
              SELECT CAST(sum(w) AS BIGINT) AS total_weight,
                     CAST((CAST(sum(w) AS BIGINT) * 50 + 99) // 100
                          AS BIGINT) AS threshold,
                     count(*) AS n
              FROM t
            ),
            c AS (
              SELECT n_chars,
                     CAST(sum(w) OVER (ORDER BY n_chars) AS BIGINT) AS cw
              FROM t
            )
            SELECT CAST((SELECT min(n_chars) FROM c, thr
                         WHERE c.cw >= thr.threshold) AS DOUBLE) AS value,
                   threshold, total_weight, n
            FROM thr
        """,
        # mirror of stages/sample.py global_shuffle_order (seed=7):
        # md5 permutation key, exact global row_number
        "doc_shuffle_order": """
            SELECT doc_id,
                   md5('7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
                   row_number() OVER (
                     ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS ord
            FROM documents
        """,
        # mirror of stages/groupagg.py grouped_exact_rank: row_number
        # over the total (n_chars, doc_id) order per lang; pct is one
        # int subtract + one double divide (bit-exact both engines)
        "doc_length_pct_rank": """
            WITH r AS (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars, doc_id) AS rnk,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents
            )
            SELECT doc_id, lang, n_chars, CAST(rnk AS BIGINT) AS rnk,
                   CASE WHEN n > 1
                        THEN (rnk - 1) / CAST(n - 1 AS DOUBLE)
                        ELSE 0.0 END AS pct
            FROM r
        """,
        # mirror of stages/sample.py token_budget_select: per-source
        # greedy quota fill in (n_chars desc, doc_id) order, integer
        # running token sum, keep while cum <= 800
        "doc_token_budget": f"""
            WITH t AS (
              SELECT doc_id, source, n_chars,
                     CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT *,
                     CAST(sum(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
              FROM t
            )
            SELECT doc_id, source, n_chars, n_tokens, cum_weight
            FROM c WHERE cum_weight <= 800
        """,
        # mirror of stages/groupagg.py grouped_robust_outliers: per-lang
        # type-1 median + MAD over the integer length — integer-exact
        "doc_robust_outliers": """
            WITH m AS (
              SELECT lang, quantile_disc(n_chars, 0.5) AS med
              FROM documents GROUP BY 1
            ),
            d AS (
              SELECT doc.doc_id, doc.lang, doc.n_chars, m.med,
                     abs(doc.n_chars - m.med) AS dev
              FROM documents doc JOIN m USING (lang)
            ),
            md AS (SELECT lang, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY 1)
            SELECT d.doc_id, d.lang, d.n_chars, d.med, md.mad,
                   (abs(d.n_chars - d.med) > 3 * md.mad) AS is_outlier
            FROM d JOIN md USING (lang)
        """,
        # mirror of stages/join.py salted_join composed with brand
        # totals — salting never changes join output, so the oracle is
        # the plain join (quantity/price floor-quantized to BIGINT)
        "lineitem_salted_part_join": """
            SELECT p.p_brand, count(*) AS n,
                   CAST(sum(CAST(trunc(l.l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_qty,
                   CAST(sum(CAST(trunc(l.l_extendedprice) AS BIGINT))
                     AS BIGINT) AS sum_price_floor
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY 1
        """,
        # mirror of stages/window.py grouped_gap_stats: consecutive
        # timestamp deltas per user in (ts, event_id) order
        "events_gap_stats": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS tu, event_id FROM events
            ),
            g AS (
              SELECT user_id, tu - lag(tu) OVER (
                PARTITION BY user_id ORDER BY tu, event_id) AS gap
              FROM e
            )
            SELECT user_id, count(*) AS n_events,
                   count(gap) AS n_gaps,
                   min(gap) AS min_gap_us, max(gap) AS max_gap_us,
                   CAST(sum(gap) AS BIGINT) AS sum_gap_us
            FROM g GROUP BY 1
        """,
        # mirror of stages/sample.py grouped_hash_sample: 3 docs per lang
        # by (md5(doc_id), doc_id) order
        "doc_sample_per_lang": """
            SELECT lang, doc_id, rank FROM (
              SELECT lang, doc_id, row_number() OVER (
                PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
              ) AS rank
              FROM documents
            ) WHERE rank <= 3
        """,
        # mirror of stages/profile.py column_histogram (lo=0, hi=120000,
        # 24 bins, w=5000): clamp into [0, 23]; every bin present
        "lineitem_price_histogram": """
            WITH c AS (
              SELECT least(greatest(CAST(floor((l_extendedprice - 0.0)
                       / 5000.0) AS BIGINT), 0), 23) AS bin,
                     count(*) AS n
              FROM lineitem GROUP BY 1
            )
            SELECT g.bin, 0.0 + g.bin * 5000.0 AS lo_edge,
                   0.0 + (g.bin + 1) * 5000.0 AS hi_edge,
                   COALESCE(c.n, 0) AS n
            FROM (SELECT unnest(range(0, 24)) AS bin) g
            LEFT JOIN c USING (bin)
        """,
        # mirror of stages/window.py window_dedup (1 h tumbling windows):
        # first event per (user, type, window) by (ts, event_id)
        "events_window_dedup": """
            WITH e AS (
              SELECT user_id, event_type,
                     epoch_us(ts) // 3600000000 AS w,
                     epoch_us(ts) AS tu, event_id
              FROM events
            ),
            r AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY user_id, event_type, w
                       ORDER BY tu, event_id) AS rn,
                     count(*) OVER (
                       PARTITION BY user_id, event_type, w) AS n
              FROM e
            )
            SELECT user_id, event_type, w, n, event_id AS first_id
            FROM r WHERE rn = 1
        """,
        # mirror of stages/join.py table_diff over the synthesized second
        # orders version (%13 removed, %7 bumped, %11 re-added): status by
        # direct value compare (md5-of-payload equality == value equality)
        "orders_cdc_diff": """
            WITH l AS (
              SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
            ),
            r AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderstatus
              FROM orders WHERE o_orderkey % 13 <> 0
              UNION ALL
              SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
              FROM orders WHERE o_orderkey % 11 = 0
            )
            SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
                   CASE WHEN l.o_orderkey IS NULL THEN 'added'
                        WHEN r.o_orderkey IS NULL THEN 'removed'
                        WHEN l.o_totalprice = r.o_totalprice
                             AND l.o_orderstatus = r.o_orderstatus
                        THEN 'same' ELSE 'changed' END AS status
            FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
        """,
        # MERGE INTO mirror: the merged table IS the mutated version the
        # cdc_diff oracle builds, in exact integer cents
        "orders_cdc_apply": """
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT)
                   + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END
                       AS price_cents,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 13 <> 0
            UNION ALL
            SELECT o_orderkey + 10000000,
                   CAST(round(o_totalprice * 100) AS BIGINT),
                   o_orderstatus
            FROM orders WHERE o_orderkey % 11 = 0
        """,
        # allowed-lateness accounting: late = event-time more than 10 min
        # behind the user's watermark over strictly earlier ARRIVALS,
        # arrival order = (md5(event_id), event_id) — the deterministic
        # reordering that makes late counts non-vacuous on this corpus
        "events_late_arrivals": """
            WITH w AS (
              SELECT event_type,
                     CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, ts,
                     max(ts) OVER (
                       PARTITION BY user_id
                       ORDER BY substr(md5(CAST(event_id AS VARCHAR)), 1, 8),
                                event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS wm
              FROM events
            )
            SELECT event_type, hour,
                   CAST(count(*) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN wm IS NOT NULL
                             AND ts < wm - INTERVAL 10 MINUTE
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM w GROUP BY 1, 2
        """,
        # pivot-inverse check: the melted crosstab must equal the plain
        # grouped count (sparse long form, known 5-category domain)
        "user_event_unpivot": """
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE event_type IN ('click', 'error', 'purchase',
                                 'signup', 'view')
            GROUP BY 1, 2
        """,
        # schema-drift union audit: v1 = even doc_ids (no source), v2 =
        # odd doc_ids (no lang); the Ray side reads two physically
        # different parquet schemas and aligns with typed NULLs
        "documents_schema_drift": """
            SELECT 1 AS gen, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(0 AS BIGINT) AS null_lang,
                   CAST(count(*) AS BIGINT) AS null_source,
                   CAST(sum(length(text)) AS BIGINT) AS sum_len
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT 2, CAST(count(*) AS BIGINT),
                   CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
                   CAST(sum(length(text)) AS BIGINT)
            FROM documents WHERE doc_id % 2 = 1
        """,
        # lag-1 autocorrelation sufficient stats over consecutive-day
        # count pairs (mirror of relational.events_autocorr; days missing
        # from the series contribute no pair)
        "events_autocorr": """
            WITH c AS (
              SELECT event_type,
                     CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            p AS (
              SELECT a.event_type, a.n AS x, b.n AS y
              FROM c a JOIN c b
                ON b.event_type = a.event_type
               AND b.day = a.day + INTERVAL 1 DAY
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM p GROUP BY 1
        """,
        # IVM check: the Ray side maintains the per-status view from the
        # base view + CDC delta ALONE; the oracle recomputes it from the
        # applied snapshot — green = the IVM algebra equals recomputation
        "orders_cdc_ivm": """
            WITH applied AS (
              SELECT o_orderkey,
                     CAST(round(o_totalprice * 100) AS BIGINT)
                     + CASE WHEN o_orderkey % 7 = 0 THEN 100 ELSE 0 END
                         AS price_cents,
                     o_orderstatus
              FROM orders WHERE o_orderkey % 13 <> 0
              UNION ALL
              SELECT o_orderkey + 10000000,
                     CAST(round(o_totalprice * 100) AS BIGINT),
                     o_orderstatus
              FROM orders WHERE o_orderkey % 11 = 0
            )
            SELECT o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(price_cents) AS BIGINT) AS sum_cents
            FROM applied GROUP BY 1
        """,
        # range-partitioner plan: exact quantile boundaries (type-1
        # discrete, same semantics as global_quantiles), partition id =
        # count of boundaries strictly below the value
        "doc_range_partition_plan": """
            WITH b AS (
              SELECT quantile_disc(n_chars, 0.25) AS b1,
                     quantile_disc(n_chars, 0.50) AS b2,
                     quantile_disc(n_chars, 0.75) AS b3
              FROM documents)
            SELECT CAST(CAST(n_chars > b1 AS BIGINT)
                        + CAST(n_chars > b2 AS BIGINT)
                        + CAST(n_chars > b3 AS BIGINT) AS BIGINT)
                       AS part_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(min(n_chars) AS BIGINT) AS min_v,
                   CAST(max(n_chars) AS BIGINT) AS max_v
            FROM documents, b GROUP BY 1
        """,
        # mirror of stages/groupagg.py grouped_corr_components:
        # integer-quantized Pearson sufficient statistics per returnflag
        "lineitem_corr_components": """
            SELECT l_returnflag,
                   count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM (
              SELECT l_returnflag,
                     CAST(trunc(l_quantity) AS BIGINT) AS x,
                     CAST(trunc(l_extendedprice) AS BIGINT) AS y
              FROM lineitem
            ) GROUP BY 1
        """,
        # mirror of stages/bpe.py bpe_pair_counts: adjacent char pairs of
        # every distinct word (overlapping positions), weighted by word
        # frequency; top-30 by (count desc, pair asc)
        "bpe_pair_counts": """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents
            ),
            wc AS (SELECT w, count(*) AS n FROM toks GROUP BY 1),
            pairs AS (
              SELECT substr(w, CAST(i AS INT), 2) AS pair, n
              FROM wc, unnest(range(1, length(w))) AS t(i)
              WHERE length(w) >= 2
            ),
            agg AS (SELECT pair, CAST(sum(n) AS BIGINT) AS n
                    FROM pairs GROUP BY 1)
            SELECT pair, n, rank FROM (
              SELECT *, row_number() OVER (ORDER BY n DESC, pair) AS rank
              FROM agg
            ) WHERE rank <= 30
        """,
        # mirror of stages/bpe.py bpe_learn (5 unrolled merge rounds):
        # count space-joined adjacent symbol pairs (overlapping), argmax
        # by (count desc, pair asc), apply with the double-space replace
        # trick (boundary spaces are never shared, so runs of identical
        # symbols merge greedily left-to-right like the regex apply)
        "bpe_merges": """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
              FROM documents
            ),
            wc AS (SELECT w, count(*) AS n FROM toks GROUP BY 1),
            v0 AS (
              SELECT w, n,
                     array_to_string(regexp_extract_all(w, '.'), ' ') AS s
              FROM wc
            )
            __ROUNDS__
            SELECT * FROM (
              SELECT 1 AS step, pair, c FROM b0 UNION ALL
              SELECT 2, pair, c FROM b1 UNION ALL
              SELECT 3, pair, c FROM b2 UNION ALL
              SELECT 4, pair, c FROM b3 UNION ALL
              SELECT 5, pair, c FROM b4
            ) ORDER BY step
        """.replace(
            "__ROUNDS__",
            "".join(
                """
            , p{k} AS (
              SELECT string_split(s, ' ') AS l, n FROM v{k}
            ), pr{k} AS (
              SELECT l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT) + 1] AS pair, n
              FROM p{k}, unnest(range(1, len(l))) AS t(i)
            ), b{k} AS (
              SELECT pair, CAST(sum(n) AS BIGINT) AS c FROM pr{k} GROUP BY 1
              ORDER BY c DESC, pair LIMIT 1
            ), v{k1} AS (
              SELECT w, n, trim(regexp_replace(
                replace(replace(' ' || s || ' ', ' ', '  '),
                        ' ' || replace((SELECT pair FROM b{k}), ' ', '  ') || ' ',
                        ' ' || replace((SELECT pair FROM b{k}), ' ', '') || ' '),
                ' +', ' ', 'g')) AS s
              FROM v{k}
            )""".format(k=k, k1=k + 1)
                for k in range(5)
            ),
        ),
        # mirror of stages/select.py dsir_weights (hashed-unigram DSIR):
        # feature bucket = md5-derived hash % 256, per-bucket scaled
        # likelihood ratio lr = ((ct+1)*1e6*(R+256)) // ((cr+1)*(T+256))
        # with add-one smoothing; doc weight = sum(c_doc(b) * lr(b));
        # target slice = doc_id % 97 == 0; token-less docs weigh 0
        "doc_dsir_weights": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
              FROM documents
            ),
            feats AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) % 256 AS b,
                     count(*) AS c
              FROM toks GROUP BY 1, 2
            ),
            tot AS (
              SELECT COALESCE(sum(c) FILTER (doc_id % 97 = 0), 0) AS t_tot,
                     sum(c) AS r_tot
              FROM feats
            ),
            rct AS (
              SELECT b, sum(c) AS cr,
                     COALESCE(sum(c) FILTER (doc_id % 97 = 0), 0) AS ct
              FROM feats GROUP BY 1
            ),
            lr AS (
              SELECT rct.b,
                     (CAST(ct + 1 AS HUGEINT) * 1000000 * (tot.r_tot + 256))
                     // (CAST(cr + 1 AS HUGEINT) * (tot.t_tot + 256)) AS lr
              FROM rct, tot
            ),
            agg AS (
              SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_tokens,
                     CAST(sum(f.c * lr.lr) AS BIGINT) AS weight
              FROM feats f JOIN lr USING (b) GROUP BY 1
            )
            SELECT d.doc_id, CAST(d.doc_id % 97 = 0 AS BIGINT) AS is_target,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.weight, 0) AS weight
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        # the DSIR selection step: top-50 NON-target docs by weight
        # (weight desc, doc_id asc)
        "doc_dsir_topk": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
              FROM documents
            ),
            feats AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 8)) AS UBIGINT) % 256 AS b,
                     count(*) AS c
              FROM toks GROUP BY 1, 2
            ),
            tot AS (
              SELECT COALESCE(sum(c) FILTER (doc_id % 97 = 0), 0) AS t_tot,
                     sum(c) AS r_tot
              FROM feats
            ),
            rct AS (
              SELECT b, sum(c) AS cr,
                     COALESCE(sum(c) FILTER (doc_id % 97 = 0), 0) AS ct
              FROM feats GROUP BY 1
            ),
            lr AS (
              SELECT rct.b,
                     (CAST(ct + 1 AS HUGEINT) * 1000000 * (tot.r_tot + 256))
                     // (CAST(cr + 1 AS HUGEINT) * (tot.t_tot + 256)) AS lr
              FROM rct, tot
            ),
            agg AS (
              SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_tokens,
                     CAST(sum(f.c * lr.lr) AS BIGINT) AS weight
              FROM feats f JOIN lr USING (b) GROUP BY 1
            )
            SELECT doc_id, n_tokens, weight, rank FROM (
              SELECT doc_id, n_tokens, weight, row_number() OVER (
                ORDER BY weight DESC, doc_id
              ) AS rank
              FROM agg WHERE doc_id % 97 <> 0
            ) WHERE rank <= 50
        """,
        # mirror of stages/dedup.py decontaminate (k=4, bench_mod=97);
        # shingles = word 4-grams over [a-z0-9]+ of lower(text), <4 words
        # collapse to one shingle, 0 words to none (shingle_set semantics)
        "doc_decontaminate": """
            WITH w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            idx AS (
              SELECT doc_id, ws,
                     unnest(range(1, greatest(len(ws) - 3, least(len(ws), 1)) + 1)) AS i
              FROM w
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(list_slice(ws, i, i + 3), ' ') AS s
              FROM idx
            ),
            bset AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS n_hits
              FROM sh JOIN bset USING (s) GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(CASE WHEN d.doc_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT)
                     AS is_benchmark,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(CASE WHEN d.doc_id % 97 <> 0
                             AND coalesce(h.n_hits, 0) > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
        """,
        # mirror of pipelines/relational.py user_customer_outer: FULL OUTER
        # join of two pre-aggregated sides on derived keys (USING coalesces
        # the key; unmatched counts coalesce to 0)
        "user_customer_outer": """
            WITH e AS (
              SELECT user_id * 2 AS k, count(*) AS n_events
              FROM events GROUP BY 1
            ),
            c AS (
              SELECT c_custkey % 250 AS k, count(*) AS n_customers
              FROM customer GROUP BY 1
            )
            SELECT CAST(k AS BIGINT) AS k,
                   CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
                   CAST(coalesce(n_customers, 0) AS BIGINT) AS n_customers
            FROM e FULL OUTER JOIN c USING (k)
        """,
        # mirror of pipelines/relational.py doc_curation: exact-dup
        # survivorship + lang allowlist + integer quality gates + the
        # doc_decontaminate chain, one keep flag per dimension
        "doc_curation": _CURATION_SQL,
        # composition: sequence-packing over ONLY the curated documents —
        # the curation verdict gates which docs enter the token stream
        "curated_pack_sequences": f"""
            WITH cur AS ({_CURATION_SQL}),
            t AS (
              SELECT d.doc_id,
                     len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS n_tokens
              FROM documents d JOIN cur ON cur.doc_id = d.doc_id
              WHERE cur.keep = 1
            ), s AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS start_off
              FROM t
            )
            SELECT doc_id, n_tokens, start_off,
                   start_off + n_tokens AS end_off,
                   start_off // 512 AS first_seq,
                   (CASE WHEN n_tokens = 0 THEN start_off
                         ELSE start_off + n_tokens - 1 END) // 512 AS last_seq
            FROM s
        """,
        # mirror of stages/vecstats.py pca_power_component (scale=100,
        # 2 rounds): scatter M = n*s_de - s_d*s_e, v0 = ones, sign-split
        # truncating renormalization each round (the one integer-division
        # semantics both engines share)
        "emb_pca_component": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qv
              FROM embeddings
            ),
            qe AS (
              SELECT vec_id, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS d
              FROM q
            ),
            lin AS (SELECT d, CAST(sum(v) AS BIGINT) AS s FROM qe GROUP BY d),
            cr AS (
              SELECT a.d AS d, b.d AS e, CAST(sum(a.v * b.v) AS BIGINT) AS s_de
              FROM qe a JOIN qe b ON a.vec_id = b.vec_id
              GROUP BY 1, 2
            ),
            nn AS (SELECT count(*) AS n FROM q),
            m AS (
              SELECT cr.d, cr.e, nn.n * cr.s_de - la.s * lb.s AS m
              FROM cr CROSS JOIN nn
              JOIN lin la ON la.d = cr.d
              JOIN lin lb ON lb.d = cr.e
            ),
            w1 AS (SELECT d, CAST(sum(m) AS BIGINT) AS w FROM m GROUP BY d),
            mx1 AS (SELECT greatest(1, max(abs(w))) AS mx FROM w1),
            v1 AS (
              SELECT d, CASE WHEN w < 0 THEN -((-w) * 1000000 // mx)
                             ELSE (w * 1000000) // mx END AS v
              FROM w1 CROSS JOIN mx1
            ),
            w2 AS (
              SELECT m.d, CAST(sum(m.m * v1.v) AS BIGINT) AS w
              FROM m JOIN v1 ON v1.d = m.e GROUP BY m.d
            ),
            mx2 AS (SELECT greatest(1, max(abs(w)) // 1000000) AS mx FROM w2)
            SELECT d, CASE WHEN w < 0 THEN -((-w) // mx)
                           ELSE w // mx END AS component
            FROM w2 CROSS JOIN mx2
        """,
        # mirror of stages/vecstats.py embedding_covariance_components:
        # quantize (floor * 1e6), per-dim linear sums + upper-triangle
        # pairwise product sums, n replicated per pair; 1-based dims
        "emb_covariance": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
              FROM embeddings
            ),
            qe AS (
              SELECT vec_id, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS d
              FROM q
            ),
            lin AS (SELECT d, CAST(sum(v) AS BIGINT) AS s FROM qe GROUP BY d),
            cr AS (
              SELECT a.d AS d, b.d AS e, CAST(sum(a.v * b.v) AS BIGINT) AS s_de
              FROM qe a JOIN qe b ON a.vec_id = b.vec_id AND a.d <= b.d
              GROUP BY 1, 2
            ),
            nn AS (SELECT count(*) AS n FROM q)
            SELECT cr.d, cr.e, nn.n, la.s AS s_d, lb.s AS s_e, cr.s_de
            FROM cr
            CROSS JOIN nn
            JOIN lin la ON la.d = cr.d
            JOIN lin lb ON lb.d = cr.e
        """,
        # mirror of stages/cluster.py kmeans_assign (k=8, 1 refine round,
        # scale 1e6): quantize -> assign to init centroids (8 smallest ids)
        # -> integer-mean centroids -> final assignment; all integer math
        "emb_kmeans": _KMEANS_CTE + """
            SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
                   CAST(dist AS BIGINT) AS dist
            FROM a2
        """,
        # negative_samples mirror: per-cluster 4 smallest ids as the pool,
        # md5(anchor || '|' || cand) rank, top-2 per anchor
        "emb_negatives": _KMEANS_CTE + """,
            samp AS (
              SELECT cid, vec_id FROM (
                SELECT cid, vec_id, row_number() OVER (
                  PARTITION BY cid ORDER BY vec_id
                ) AS rn FROM a2
              ) WHERE rn <= 4
            ),
            cand AS (
              SELECT a.vec_id, s.vec_id AS neg_id,
                     md5(CAST(a.vec_id AS VARCHAR) || '|'
                         || CAST(s.vec_id AS VARCHAR)) AS h
              FROM a2 a JOIN samp s ON s.cid <> a.cid
            )
            SELECT vec_id, neg_id, rank FROM (
              SELECT vec_id, neg_id, row_number() OVER (
                PARTITION BY vec_id ORDER BY h, neg_id
              ) AS rank FROM cand
            ) WHERE rank <= 2
        """,
        # mirror of stages/cluster.py semdedup (tau = 2/5): within-cluster
        # pairwise integer cosine test in HUGEINT — cos >= 2/5 iff dot >= 0
        # AND 25*dot^2 >= 4*|u|^2*|v|^2; partner must have a smaller id
        # cluster.mutual_knn mirror: same _KMEANS_CTE assignment, then
        # within-cluster top-3 by the signed squared-cosine surrogate
        # sign(dot) * (dot^2 * 1e6) // (nn_a * nn_b) — all HUGEINT-exact
        # (dot <= dim*scale^2 ~ 4e14; dot^2*1e6 ~ 1.5e35 < 1.7e38), tie
        # broken by ascending neighbor id; mutual = edge in both top-3s
        "emb_mutual_knn": _KMEANS_CTE + """,
            prs AS (
              SELECT a.vec_id AS va, b.vec_id AS vb
              FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id <> b.vec_id
            ),
            dots AS (
              SELECT p.va, p.vb, sum(CAST(qa.v AS HUGEINT) * qb.v) AS dot
              FROM prs p
              JOIN qe qa ON qa.vec_id = p.va
              JOIN qe qb ON qb.vec_id = p.vb AND qb.d = qa.d
              GROUP BY p.va, p.vb
            ),
            nrm AS (
              SELECT vec_id, sum(CAST(v AS HUGEINT) * v) AS nn
              FROM qe GROUP BY vec_id
            ),
            scored AS (
              SELECT d.va, d.vb,
                     CASE WHEN d.dot >= 0
                       THEN (d.dot * d.dot * 1000000) // (na.nn * nb.nn)
                       ELSE -((d.dot * d.dot * 1000000) // (na.nn * nb.nn))
                     END AS score
              FROM dots d
              JOIN nrm na ON na.vec_id = d.va
              JOIN nrm nb ON nb.vec_id = d.vb
            ),
            knn AS (
              SELECT va, vb, rn FROM (
                SELECT va, vb, row_number() OVER
                  (PARTITION BY va ORDER BY score DESC, vb ASC) AS rn
                FROM scored
              ) WHERE rn <= 3
            )
            SELECT k.va AS vec_id, CAST(k.rn AS BIGINT) AS rank,
                   k.vb AS nbr_id,
                   CAST(CASE WHEN r.va IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS mutual
            FROM knn k LEFT JOIN knn r ON r.va = k.vb AND r.vb = k.va
        """,
        "emb_semdedup": _KMEANS_CTE + """,
            pairs AS (
              SELECT a.vec_id AS vb, b.vec_id AS va
              FROM a2 a JOIN a2 b ON a.cid = b.cid AND b.vec_id < a.vec_id
            ),
            dots AS (
              SELECT p.vb, p.va, sum(CAST(qa.v AS HUGEINT) * qb.v) AS dot
              FROM pairs p
              JOIN qe qa ON qa.vec_id = p.va
              JOIN qe qb ON qb.vec_id = p.vb AND qb.d = qa.d
              GROUP BY p.vb, p.va
            ),
            norms AS (
              SELECT vec_id, sum(CAST(v AS HUGEINT) * v) AS nn
              FROM qe GROUP BY vec_id
            ),
            flags AS (
              SELECT d.vb AS vec_id, count(*) AS n_dup
              FROM dots d
              JOIN norms na ON na.vec_id = d.va
              JOIN norms nb ON nb.vec_id = d.vb
              WHERE d.dot >= 0
                AND 25 * d.dot * d.dot >= 4 * na.nn * nb.nn
              GROUP BY d.vb
            )
            SELECT a2.vec_id, CAST(a2.cid AS BIGINT) AS cluster,
                   CAST(coalesce(f.n_dup, 0) AS BIGINT) AS n_dup_partners,
                   CAST(CASE WHEN coalesce(f.n_dup, 0) > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS is_dup
            FROM a2 LEFT JOIN flags f ON f.vec_id = a2.vec_id
        """,
        "ann_ivf_topk": _ivf_sql(),
        # pq_adc_topk mirror: the emb_pq_error PQ unroll (2 subspaces of
        # 32 dims, 8 centroids, one refine round) + per-query LUT join;
        # ADC dist = sum over subspaces of the query->assigned-centroid
        # exact integer squared L2, ties by ascending vec_id
        "ann_pq_topk": """
            WITH q AS (
              SELECT vec_id, list_transform(embedding, x ->
                     CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
              FROM embeddings
            ),
            qe AS (
              SELECT vec_id, unnest(qv) AS v,
                     unnest(range(1, len(qv) + 1)) AS d
              FROM q
            ),
            qs AS (
              SELECT vec_id, CAST((d - 1) // 32 AS BIGINT) AS sub, d, v
              FROM qe
            ),
            c0 AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vec_id
              FROM (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8)
            ),
            ce0 AS (
              SELECT c0.cid, qs.sub, qs.d, qs.v AS cv
              FROM c0 JOIN qs USING (vec_id)
            ),
            d1 AS (
              SELECT qs.vec_id, qs.sub, ce0.cid,
                     sum((qs.v - ce0.cv) * (qs.v - ce0.cv)) AS dist
              FROM qs JOIN ce0 ON ce0.d = qs.d AND ce0.sub = qs.sub
              GROUP BY 1, 2, 3
            ),
            a1 AS (
              SELECT vec_id, sub, cid FROM (
                SELECT vec_id, sub, cid, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
                FROM d1
              ) WHERE rn = 1
            ),
            ce1 AS (
              SELECT ce0.cid, ce0.sub, ce0.d, COALESCE(m.cv, ce0.cv) AS cv
              FROM ce0 LEFT JOIN (
                SELECT a1.cid, qs2.sub, qs2.d,
                       CAST(floor(CAST(sum(qs2.v) AS DOUBLE) / count(*))
                            AS BIGINT) AS cv
                FROM a1 JOIN qs qs2
                  ON qs2.vec_id = a1.vec_id AND qs2.sub = a1.sub
                GROUP BY 1, 2, 3
              ) m ON m.cid = ce0.cid AND m.sub = ce0.sub AND m.d = ce0.d
            ),
            d2 AS (
              SELECT qs.vec_id, qs.sub, ce1.cid,
                     sum((qs.v - ce1.cv) * (qs.v - ce1.cv)) AS dist
              FROM qs JOIN ce1 ON ce1.d = qs.d AND ce1.sub = qs.sub
              GROUP BY 1, 2, 3
            ),
            pqa AS (
              SELECT vec_id, sub, cid FROM (
                SELECT vec_id, sub, cid, row_number() OVER (
                  PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
                FROM d2
              ) WHERE rn = 1
            ),
            qdims AS (
              SELECT vec_id AS qid, sub, d, v FROM qs WHERE vec_id < 8
            ),
            lut AS (
              SELECT qd.qid, ce1.cid, qd.sub,
                     sum((qd.v - ce1.cv) * (qd.v - ce1.cv)) AS pd
              FROM qdims qd
              JOIN ce1 ON ce1.d = qd.d AND ce1.sub = qd.sub
              GROUP BY 1, 2, 3
            ),
            adc AS (
              SELECT l.qid, p.vec_id, CAST(sum(l.pd) AS BIGINT) AS dist
              FROM pqa p JOIN lut l ON l.cid = p.cid AND l.sub = p.sub
              WHERE p.vec_id <> l.qid
              GROUP BY 1, 2
            )
            SELECT qid AS query_vec_id, CAST(rn AS BIGINT) AS rank,
                   vec_id, dist AS adc_dist
            FROM (
              SELECT qid, vec_id, dist, row_number() OVER (
                PARTITION BY qid ORDER BY dist, vec_id) AS rn
              FROM adc
            ) WHERE rn <= 5
        """,
        "knn_label": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            pairs AS (
              SELECT q.query_vec_id, e.vec_id, e.label,
                     list_cosine_similarity(q.qv, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.query_vec_id
            ),
            nearest AS (
              SELECT query_vec_id, label,
                     row_number() OVER (PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC) AS rn
              FROM pairs
            )
            SELECT query_vec_id, CAST(label AS BIGINT) AS label FROM nearest WHERE rn = 1
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            pairs AS (
              SELECT q.query_vec_id, e.vec_id,
                     list_cosine_similarity(q.qv, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.query_vec_id
            ),
            ranked AS (
              SELECT query_vec_id, vec_id,
                     row_number() OVER (PARTITION BY query_vec_id ORDER BY sim DESC, vec_id ASC) AS rank
              FROM pairs
            )
            SELECT query_vec_id, CAST(rank AS BIGINT) AS rank, vec_id FROM ranked WHERE rank <= 5
        """,
        # mirror of relational.basket_part_pairs: per-order distinct-part
        # pairs (baskets over 64 parts excluded by definition), support
        # counts, top-20 by (support desc, pa, pb)
        "basket_part_pairs": """
            WITH items AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ),
            sized AS (
              SELECT o FROM items GROUP BY o
              HAVING count(*) BETWEEN 2 AND 64
            ),
            pr AS (
              SELECT a.p AS pa, b.p AS pb, count(*) AS support
              FROM items a
              JOIN sized s ON s.o = a.o
              JOIN items b ON b.o = a.o AND a.p < b.p
              GROUP BY 1, 2
            )
            SELECT pa, pb, support, rank FROM (
              SELECT *, row_number() OVER
                (ORDER BY support DESC, pa, pb) AS rank
              FROM pr
            ) WHERE rank <= 20
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   count(*) AS count_order,
                   max(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1, 2
        """,
        # mirror of pipelines/relational.py q3_shipping: 3-table star
        # join, exact int64-cents revenue (identical per-row IEEE floor)
        "q3_shipping": """
            SELECT l.l_orderkey,
                   CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                       * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents,
                   o.o_orderdate, o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 3, 4
            ORDER BY revenue_cents DESC, o.o_orderdate, l.l_orderkey
            LIMIT 10
        """,
        "segment_order_stats": """
            SELECT c_mktsegment,
                   count(*) AS n_orders,
                   min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "events_window": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        # HyperLogLog register table (m=64, md5-derived 64-bit hash, 58-bit
        # remainder): register = h % 64, rho = leading-zero count + 1 of the
        # remainder — integer-exact mirror of stages/sketch.py
        "events_hll_registers": """
            WITH h AS (
              SELECT DISTINCT event_type,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                          AS UBIGINT) AS hv
              FROM events
            ),
            r AS (
              SELECT event_type,
                     CAST(hv % 64 AS BIGINT) AS register,
                     CAST(CASE WHEN hv // 64 = 0 THEN 59
                          ELSE 59 - length(bin(hv // 64)) END AS BIGINT) AS rho
              FROM h
            )
            SELECT event_type, register, max(rho) AS max_rho
            FROM r GROUP BY 1, 2
        """,
        # count-min registers (d=4 rows x w=256 cols, the 4 md5 words):
        # counter sums are integers -> order-free, exact mirror
        "events_cm_registers": """
            WITH pos AS (
              SELECT i.i AS row,
                     CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                          CAST(i.i * 8 + 1 AS INT), 8)) AS UBIGINT)
                       % 256 AS col
              FROM events CROSS JOIN range(4) i(i)
            )
            SELECT CAST(row AS BIGINT) AS row, CAST(col AS BIGINT) AS col,
                   count(*) AS cnt
            FROM pos GROUP BY 1, 2
        """,
        # consistent hash-threshold sample: membership = f(key) only
        "doc_consistent_sample": """
            SELECT * FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 100 < 10
        """,
        # Bloom semi-join mirror (m=2^20 bits, k=4 hashes = the 4 8-hex-char
        # words of one md5): a probe key survives iff EVERY word's bit
        # position appears among the build side's distinct positions —
        # reproduces the Ray filter exactly, false positives included
        "customer_bloom_semi_events": """
            WITH bk AS (SELECT DISTINCT user_id AS key FROM events),
            pos AS (
              SELECT DISTINCT
                CAST(('0x' || substr(md5(CAST(key AS VARCHAR)),
                                     CAST(i * 8 + 1 AS INT), 8)) AS UBIGINT)
                  % 1048576 AS p
              FROM bk CROSS JOIN range(4) t(i)
            ),
            cand AS (
              SELECT c_custkey, i,
                CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                     CAST(i * 8 + 1 AS INT), 8)) AS UBIGINT)
                  % 1048576 AS p
              FROM customer CROSS JOIN range(4) t(i)
            ),
            keep AS (
              SELECT c_custkey FROM cand JOIN pos USING (p)
              GROUP BY c_custkey HAVING count(DISTINCT i) = 4
            )
            SELECT c.* FROM customer c JOIN keep USING (c_custkey)
        """,
        # hopping window: 1 h length, 15 min hop — each event joins the 4
        # epoch-aligned windows containing it.  TZ-free arithmetic: a
        # to_timestamp(...)::TIMESTAMP round-trip converts via the session
        # TimeZone and shifts win_start on non-UTC hosts (same portability
        # class as the IVF-oracle fix)
        "events_sliding_window": """
            WITH expanded AS (
              SELECT user_id, value,
                     ts - to_microseconds(epoch_us(ts) % 900000000)
                        - to_microseconds(k.k * 900000000) AS win_start
              FROM events CROSS JOIN range(4) k(k)
            )
            SELECT user_id, win_start,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM expanded GROUP BY 1, 2
        """,
        # as-of join: latest order day at or before each event's timestamp;
        # right side pre-aggregated per (custkey, day) so the pick is unique
        "events_asof_orders": """
            WITH od AS (
              SELECT o_custkey AS od_user, o_orderdate AS last_order_date,
                     count(*) AS last_order_n,
                     max(o_totalprice) AS last_order_max_price
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, e.ts,
                   od.last_order_date,
                   CAST(COALESCE(od.last_order_n, 0) AS BIGINT) AS last_order_n,
                   COALESCE(od.last_order_max_price, 0.0) AS last_order_max_price
            FROM events e ASOF LEFT JOIN od
              ON e.user_id = od.od_user AND e.ts >= od.last_order_date
        """,
        # per-key interval join, half-open window [orderdate, orderdate+30d)
        "lineitem_ship_range_join": """
            SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate,
                   o.o_orderdate + INTERVAL 30 DAY AS win_end
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate >= o.o_orderdate
             AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
        """,
        "topk_orders_per_segment": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment,
                   CAST(rn AS BIGINT) AS rank
            FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment,
                     row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rn <= 3
        """,
        # running aggregates in (ts, event_id) order — the exact columns
        # only (count/min/max pick actual elements; a running float SUM
        # associates differently under DuckDB's segment-tree windows)
        "user_running_stats": """
            SELECT event_id, user_id, ts, value,
                   CAST(row_number() OVER w AS BIGINT) AS n_so_far,
                   min(value) OVER w AS min_so_far,
                   max(value) OVER w AS max_so_far
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        # exact discrete (type-1) quantiles: value = sorted[ceil(q*n)-1],
        # always an actual element, so float-exact across engines
        # mirror of relational.orders_ship_lag: fact-fact join + signed
        # whole-day lag (midnight timestamps -> day arithmetic exact) +
        # per-priority exact discrete quantiles
        "orders_ship_lag": """
            SELECT o_orderpriority,
                   quantile_disc(date_diff('day', o_orderdate, l_shipdate),
                                 0.5) AS p50,
                   quantile_disc(date_diff('day', o_orderdate, l_shipdate),
                                 0.9) AS p90,
                   count(*) AS n_rows
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        """,
        "segment_price_quantiles": """
            SELECT c_mktsegment,
                   quantile_disc(o_totalprice, 0.25) AS p25,
                   quantile_disc(o_totalprice, 0.50) AS p50,
                   quantile_disc(o_totalprice, 0.90) AS p90,
                   count(*) AS n_rows
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        # GLOBAL exact quantiles: the Ray side never sorts or collects the
        # column (histogram refinement); picks are actual elements so the
        # float values are bit-exact against quantile_disc
        "price_global_quantiles": """
            WITH v AS (SELECT l_extendedprice AS x FROM lineitem
                       WHERE l_extendedprice IS NOT NULL),
                 c AS (SELECT count(*) AS n FROM v)
            SELECT t.q, t.value, CAST(ceil(t.qq * c.n) AS BIGINT) AS rank, c.n AS n
            FROM c, (
              SELECT 'p25' AS q, 0.25 AS qq, quantile_disc(x, 0.25) AS value FROM v
              UNION ALL
              SELECT 'p50', 0.50, quantile_disc(x, 0.50) FROM v
              UNION ALL
              SELECT 'p75', 0.75, quantile_disc(x, 0.75) FROM v
              UNION ALL
              SELECT 'p99', 0.99, quantile_disc(x, 0.99) FROM v) t
        """,
        # long->wide pivot: conditional aggregation is the SQL mirror of
        # the indicator-widening + combiner-sum plan
        "user_event_pivot": """
            SELECT user_id,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
            FROM events GROUP BY 1
        """,
        # ROLLUP with subtotal keys COALESCE'd to 'ALL' (the engine emits
        # the sentinel directly so both sides hash identically); min/max
        # price are actual elements -> float-exact
        "orders_rollup": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n_orders,
                   min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        # weighted priority sample: md5_u32(id) // weight, k smallest
        # per-doc duplicated 8-token-window counts; a window is dup when
        # its text occurs in >= 2 distinct docs (dedup.dup_passages)
        "doc_dup_passages": """
            WITH words AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
              FROM documents
            ),
            winp AS (
              SELECT doc_id,
                     substr(md5(array_to_string(
                       list_slice(ws, CAST(i AS INT), CAST(i + 7 AS INT)), ' '
                     )), 1, 16) AS wh
              FROM words, unnest(generate_series(1, len(ws) - 7)) t(i)
              WHERE len(ws) >= 8
            ),
            perdoc AS (
              SELECT doc_id, wh, count(*) AS npos FROM winp GROUP BY 1, 2
            ),
            dfx AS (SELECT wh, count(*) AS df FROM perdoc GROUP BY 1),
            sums AS (
              SELECT p.doc_id,
                     sum(p.npos) AS n_windows,
                     sum(CASE WHEN dfx.df >= 2 THEN p.npos ELSE 0 END)
                       AS n_dup_positions,
                     sum(CASE WHEN dfx.df >= 2 THEN 1 ELSE 0 END)
                       AS n_dup_distinct
              FROM perdoc p JOIN dfx USING (wh) GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(s.n_windows, 0) AS BIGINT) AS n_windows,
                   CAST(COALESCE(s.n_dup_positions, 0) AS BIGINT)
                     AS n_dup_positions,
                   CAST(COALESCE(s.n_dup_distinct, 0) AS BIGINT)
                     AS n_dup_distinct
            FROM documents d LEFT JOIN sums s USING (doc_id)
        """,
        # windowed ordered skip-gram pair counts (distances 1..3), corpus
        # top-30 — mirrors index.skipgram_topk
        "doc_skipgrams": """
            WITH w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents
            ),
            p AS (
              SELECT ws[CAST(i AS INT)] AS l, ws[CAST(i + d AS INT)] AS r
              FROM w,
                   unnest(generate_series(1, len(ws) - 1)) t(i),
                   (VALUES (1), (2), (3)) dd(d)
              WHERE i + d <= len(ws)
            ),
            c AS (
              SELECT l, r, count(*) AS n FROM p GROUP BY 1, 2
              HAVING count(*) >= 2
            )
            SELECT l, r, n, rank FROM (
              SELECT *, row_number() OVER (ORDER BY n DESC, l, r) AS rank
              FROM c
            ) WHERE rank <= 30
        """,
        # Hamilton/largest-remainder apportionment of 100 rows across
        # sources (weight = suffix%5+1), quota rows = smallest doc_ids
        "doc_mixture": """
            WITH src AS (SELECT DISTINCT source FROM documents),
            w AS (SELECT source,
                         (CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 5) + 1 AS wt
                  FROM src),
            tw AS (SELECT sum(wt) AS W FROM w),
            q0 AS (SELECT source, wt, 100 * wt // W AS base,
                          (100 * wt) % W AS frac FROM w, tw),
            r AS (SELECT 100 - sum(base) AS rem FROM q0),
            qa AS (SELECT source,
                          base + CASE WHEN row_number() OVER (
                            ORDER BY frac DESC, source
                          ) <= rem THEN 1 ELSE 0 END AS quota
                   FROM q0, r),
            rk AS (SELECT doc_id, source, row_number() OVER (
                     PARTITION BY source ORDER BY doc_id
                   ) AS rank FROM documents)
            SELECT rk.doc_id, rk.source, rk.rank,
                   CAST(qa.quota AS BIGINT) AS quota
            FROM rk JOIN qa USING (source) WHERE rk.rank <= qa.quota
        """,
        "doc_weighted_sample": """
            SELECT doc_id, n_chars,
                   CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS UBIGINT)
                        // GREATEST(n_chars, 1) AS BIGINT) AS priority
            FROM documents
            ORDER BY priority, doc_id
            LIMIT 50
        """,
        # zero-preserving LEFT join: customers without orders kept
        "customer_order_counts": """
            WITH per_cust AS (
              SELECT o_custkey AS c_custkey, count(*) AS n, max(o_totalprice) AS mp
              FROM orders GROUP BY 1
            )
            SELECT c.c_custkey, c.c_mktsegment,
                   CAST(COALESCE(p.n, 0) AS BIGINT) AS n_orders,
                   COALESCE(p.mp, 0.0) AS max_price
            FROM customer c LEFT JOIN per_cust p USING (c_custkey)
        """,
        # global-decile classification from exact type-1 boundaries:
        # decile = 1 + #boundaries strictly below x
        "lineitem_price_decile": """
            WITH b AS (
              SELECT quantile_disc(l_extendedprice, 0.1) AS b1,
                     quantile_disc(l_extendedprice, 0.2) AS b2,
                     quantile_disc(l_extendedprice, 0.3) AS b3,
                     quantile_disc(l_extendedprice, 0.4) AS b4,
                     quantile_disc(l_extendedprice, 0.5) AS b5,
                     quantile_disc(l_extendedprice, 0.6) AS b6,
                     quantile_disc(l_extendedprice, 0.7) AS b7,
                     quantile_disc(l_extendedprice, 0.8) AS b8,
                     quantile_disc(l_extendedprice, 0.9) AS b9
              FROM lineitem
            ), d AS (
              SELECT CAST(1
                       + (l_extendedprice > b1)::INT + (l_extendedprice > b2)::INT
                       + (l_extendedprice > b3)::INT + (l_extendedprice > b4)::INT
                       + (l_extendedprice > b5)::INT + (l_extendedprice > b6)::INT
                       + (l_extendedprice > b7)::INT + (l_extendedprice > b8)::INT
                       + (l_extendedprice > b9)::INT AS BIGINT) AS decile,
                     l_extendedprice AS x
              FROM lineitem, b
            )
            SELECT decile, count(*) AS n_items,
                   min(x) AS min_price, max(x) AS max_price
            FROM d GROUP BY 1
        """,
        # cohort retention: first-event week x active week, exact distinct
        # users via the (cohort, week, user) pre-group
        "events_user_retention": """
            WITH f AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
              FROM events GROUP BY 1
            ), a AS (
              SELECT f.cohort_week, date_trunc('week', e.ts) AS week, e.user_id,
                     count(*) AS n_events
              FROM events e JOIN f USING (user_id)
              GROUP BY 1, 2, 3
            )
            SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
                   CAST(week AS TIMESTAMP) AS week,
                   count(*) AS n_users, CAST(sum(n_events) AS BIGINT) AS n_events
            FROM a GROUP BY 1, 2
        """,
        # column profiler: one UNION ALL branch per profiled column
        "documents_profile": """
            SELECT 'doc_id' AS col, count(*) AS n,
                   count(*) - count(doc_id) AS n_null,
                   count(DISTINCT doc_id) AS n_distinct,
                   CAST(min(doc_id) AS VARCHAR) AS min_val,
                   CAST(max(doc_id) AS VARCHAR) AS max_val
            FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(*) - count(lang),
                   count(DISTINCT lang),
                   CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', count(*), count(*) - count(source),
                   count(DISTINCT source),
                   CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(*) - count(n_chars),
                   count(DISTINCT n_chars),
                   CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
            FROM documents
        """,
        # ordered funnel on FIRST timestamps per user (min-pivot + stage
        # predicates; NULL comparisons exclude, matching pandas NaT)
        "events_funnel": """
            WITH f AS (
              SELECT user_id,
                     min(ts) FILTER (event_type = 'signup') AS t_signup,
                     min(ts) FILTER (event_type = 'view') AS t_view,
                     min(ts) FILTER (event_type = 'purchase') AS t_purchase
              FROM events GROUP BY 1
            )
            SELECT CAST(count(*) FILTER (t_signup IS NOT NULL) AS BIGINT)
                     AS n_signup,
                   CAST(count(*) FILTER (t_view > t_signup) AS BIGINT)
                     AS n_view_after,
                   CAST(count(*) FILTER (t_view > t_signup
                                         AND t_purchase > t_view) AS BIGINT)
                     AS n_purchase_after
            FROM f
        """,
        # order-independent content checksum: sum mod 2^61-1 of md5_u32
        # row hashes over the stringified projection
        # mirror of stages/layout.py zorder_keys (bits=16, 64 buckets):
        # bounds CTE + the shared unrolled interleave expression
        "orders_zorder": f"""
            WITH st AS (
              SELECT CAST(floor(min(o_custkey)) AS BIGINT) AS lox,
                     CAST(floor(max(o_custkey)) AS BIGINT) AS hix,
                     CAST(floor(min(o_totalprice)) AS BIGINT) AS loy,
                     CAST(floor(max(o_totalprice)) AS BIGINT) AS hiy
              FROM orders
            )
            SELECT o_orderkey, {_zexpr} AS zkey, ({_zexpr} >> 26) AS zbucket
            FROM orders, st
        """,
        # mirror of stages/index.py doc_commonness: distinct lowercase
        # [a-z]+ tokens per doc, global df, per-doc (count, sum df)
        "doc_commonness": """
            WITH toks AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
              FROM documents
            ),
            dft AS (SELECT token, count(*) AS df FROM toks GROUP BY token)
            SELECT t.doc_id,
                   count(*) AS n_distinct_tokens,
                   CAST(sum(dft.df) AS BIGINT) AS sum_df
            FROM toks t JOIN dft USING (token)
            GROUP BY t.doc_id
        """,
        # mirror of stages/profile.py fk_orphan_audit: per relation, fact
        # rows / distinct FKs / dangling keys+rows via LEFT JOIN
        "fk_orphan_audit": """
            SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_distinct_fk,
                   CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                            THEN l.l_orderkey END) AS BIGINT)
                     AS n_orphan_keys,
                   CAST(COALESCE(sum(CASE WHEN o.o_orderkey IS NULL
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                     AS n_orphan_rows
            FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE l.l_orderkey IS NOT NULL
            UNION ALL
            SELECT 'orders.o_custkey->customer.c_custkey',
                   CAST(count(*) AS BIGINT),
                   CAST(count(DISTINCT f.o_custkey) AS BIGINT),
                   CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                            THEN f.o_custkey END) AS BIGINT),
                   CAST(COALESCE(sum(CASE WHEN c.c_custkey IS NULL
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM orders f LEFT JOIN customer c ON c.c_custkey = f.o_custkey
            WHERE f.o_custkey IS NOT NULL
            UNION ALL
            SELECT 'events.user_id->customer.c_custkey',
                   CAST(count(*) AS BIGINT),
                   CAST(count(DISTINCT e.user_id) AS BIGINT),
                   CAST(count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                            THEN e.user_id END) AS BIGINT),
                   CAST(COALESCE(sum(CASE WHEN c.c_custkey IS NULL
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
            FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
            WHERE e.user_id IS NOT NULL
        """,
        # mirror of stages/index.py bigram_lm_scores: corpus bigram counts
        # c2, left-context counts c1, per-doc sum of k * floor(1e6*c2/c1)
        # (product in HUGEINT; the int64 bound is the Ray-side contract)
        "doc_bigram_lm": _BIGRAM_LM_CTE + """
            SELECT doc_id, n_bigrams, lm_score FROM lm
        """,
        # mirror of stages/select.py lm_quality_buckets: the shared LM CTE,
        # per-doc mean_p = lm_score // n_bigrams, exact type-1 boundaries
        # via quantile_disc (== global_quantiles' ceil(q*n) order
        # statistic), then the head/middle/tail fold
        "doc_quality_buckets": _BIGRAM_LM_CTE + """,
            m AS (
              SELECT doc_id, n_bigrams, lm_score // n_bigrams AS mean_p
              FROM lm
            ),
            qq AS (
              SELECT quantile_disc(mean_p, 0.3) AS lo,
                     quantile_disc(mean_p, 0.7) AS hi
              FROM m
            )
            SELECT CASE WHEN m.mean_p >= qq.hi THEN 'head'
                        WHEN m.mean_p < qq.lo THEN 'tail'
                        ELSE 'middle' END AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(m.n_bigrams) AS BIGINT) AS n_bigrams,
                   CAST(min(m.mean_p) AS BIGINT) AS min_mean_p,
                   CAST(max(m.mean_p) AS BIGINT) AS max_mean_p
            FROM m, qq GROUP BY 1
        """,
        # mirror of stages/profile.py run_expectations: per-rule checked/
        # violation counts; nulls violate every rule kind except their own
        "lineitem_expectations": """
            SELECT 'discount_range' AS rule, count(*) AS n_checked,
                   count(*) - CAST(sum(CASE WHEN l_discount IS NOT NULL
                     AND l_discount >= CAST(0.0 AS DOUBLE)
                     AND l_discount <= CAST(0.1 AS DOUBLE)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'linestatus_regex', count(*),
                   count(*) - CAST(sum(CASE WHEN l_linestatus IS NOT NULL
                     AND regexp_full_match(l_linestatus, '[OF]')
                     THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'qty_range', count(*),
                   count(*) - CAST(sum(CASE WHEN l_quantity IS NOT NULL
                     AND l_quantity >= 1 AND l_quantity <= 50
                     THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'returnflag_set', count(*),
                   count(*) - CAST(sum(CASE WHEN l_returnflag IN ('A','N','R')
                     THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'shipdate_not_null', count(*),
                   CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM lineitem
            ORDER BY rule
        """,
        # mirror of stages/sketch.py heavy_hitters (k=10): exact counts,
        # rank (cnt desc, user_id asc) — the sketch+verify path must land
        # on exactly this
        "events_heavy_hitters": """
            SELECT user_id, cnt, rank FROM (
              SELECT user_id, count(*) AS cnt,
                     row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank
              FROM events GROUP BY user_id
            ) WHERE rank <= 10
        """,
        # computed on the ORIGINAL documents table: equality proves the
        # JSONL sink+source round trip is lossless (cols joined with
        # chr(31) in the same order as the Ray-side table_checksum)
        "documents_jsonl_roundtrip": """
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(('0x' || substr(md5(
                         CAST(doc_id AS VARCHAR) || chr(31) || lang || chr(31)
                         || source || chr(31) || CAST(n_chars AS VARCHAR)
                         || chr(31) || text
                       ), 1, 8)) AS UBIGINT))
                     % 2305843009213693951 AS BIGINT) AS checksum
            FROM documents
        """,
        "documents_checksum": """
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(('0x' || substr(md5(
                         CAST(doc_id AS VARCHAR) || chr(31) || lang || chr(31)
                         || source || chr(31) || CAST(n_chars AS VARCHAR)
                       ), 1, 8)) AS UBIGINT))
                     % 2305843009213693951 AS BIGINT) AS checksum
            FROM documents
        """,
        "events_sessions": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
            ), s AS (
              SELECT user_id, ts,
                     1 + sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
              FROM o
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
            FROM s GROUP BY 1, 2
        """,
    }

    # composed mirrors (built from the base mirrors above, so the two
    # definitions can never drift): ANN recall = IVF top-k vs brute top-k
    out["emb_ann_recall"] = f"""
        WITH brute AS ({out['ann_topk']}),
        ivf AS ({out['ann_ivf_topk']}),
        common AS (
          SELECT b.query_vec_id, count(*) AS n_common
          FROM brute b JOIN ivf i
            ON i.query_vec_id = b.query_vec_id AND i.vec_id = b.vec_id
          GROUP BY 1
        ),
        nb AS (SELECT query_vec_id, count(*) AS n_brute FROM brute GROUP BY 1),
        ni AS (SELECT query_vec_id, count(*) AS n_ivf FROM ivf GROUP BY 1)
        SELECT nb.query_vec_id, CAST(nb.n_brute AS BIGINT) AS n_brute,
               CAST(ni.n_ivf AS BIGINT) AS n_ivf,
               CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common
        FROM nb JOIN ni USING (query_vec_id)
        LEFT JOIN common c USING (query_vec_id)
    """

    # PQ recall composes the same way from the PQ-ADC mirror
    out["emb_pq_recall"] = f"""
        WITH brute AS ({out['ann_topk']}),
        pq AS ({out['ann_pq_topk']}),
        common AS (
          SELECT b.query_vec_id, count(*) AS n_common
          FROM brute b JOIN pq p
            ON p.query_vec_id = b.query_vec_id AND p.vec_id = b.vec_id
          GROUP BY 1
        ),
        nb AS (SELECT query_vec_id, count(*) AS n_brute FROM brute GROUP BY 1),
        np AS (SELECT query_vec_id, count(*) AS n_pq FROM pq GROUP BY 1)
        SELECT nb.query_vec_id, CAST(nb.n_brute AS BIGINT) AS n_brute,
               CAST(np.n_pq AS BIGINT) AS n_pq,
               CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common
        FROM nb JOIN np USING (query_vec_id)
        LEFT JOIN common c USING (query_vec_id)
    """

    # curated-BM25 mirror: the BM25 mirror textually rebased onto the
    # curation survivors (corpus stats N/L and df re-derive over the
    # curated set on both engines, so the scores agree by construction)
    _cur_bm25 = out["doc_bm25_topk"].replace("FROM documents", "FROM cur")
    out["doc_curated_bm25"] = _cur_bm25.replace(
        "WITH q(qid, term) AS",
        f"""WITH curflags AS ({_CURATION_SQL}),
            cur AS (
              SELECT d.doc_id, d.text FROM documents d
              JOIN curflags f USING (doc_id) WHERE f.keep = 1
            ),
            q(qid, term) AS""",
        1,
    )

    # BPE-encode mirror composed from the bpe_merges mirror's CTE chain
    # (everything up to its final SELECT, so v5 = the learned vocab): a
    # word's token count under the final vocab is len(split(s, ' '))
    _bpe_sql = out["bpe_merges"]
    _cut = _bpe_sql.index("SELECT * FROM (")
    out["doc_bpe_encode"] = _bpe_sql[:_cut] + """
            , dwc AS (
              SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
                FROM documents)
              GROUP BY 1, 2
            ),
            syms AS (
              SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_syms
              FROM v5
            )
            SELECT dwc.doc_id, CAST(sum(dwc.c) AS BIGINT) AS n_words,
                   CAST(sum(dwc.c * syms.n_syms) AS BIGINT) AS n_tokens_bpe
            FROM dwc JOIN syms USING (w) GROUP BY 1
        """

    # tokenizer fertility composes the encode mirror with the documents
    # dimension: per-lang sums + tokens-per-word in integer ppm
    out["doc_tokenizer_fertility"] = f"""
        WITH enc AS ({out['doc_bpe_encode']})
        SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(enc.n_words) AS BIGINT) AS n_words,
               CAST(sum(enc.n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
               CAST(sum(enc.n_tokens_bpe) * 1000000
                    // sum(enc.n_words) AS BIGINT) AS fertility_ppm
        FROM enc JOIN documents d USING (doc_id)
        GROUP BY 1
    """

    # MMR mirror: candidate CTE derived from the BM25 mirror (k bumped to
    # 20 textually so the scoring definitions cannot drift), pairwise
    # shared-distinct-term sims, then the k greedy rounds unrolled.
    _bm25_20 = out["doc_bm25_topk"].replace("rank <= 10", "rank <= 20")
    _mmr_rounds = []
    for i in range(2, 6):
        p = i - 1
        _mmr_rounds.append(f"""
        m{i} AS MATERIALIZED (
          SELECT c.qid, c.doc_id,
                 max(c.score) - 50000 * max(coalesce(ss.shared, 0)) AS mmr
          FROM r{p} c
          JOIN sel{p} s ON s.qid = c.qid
          LEFT JOIN simsym ss ON ss.qid = c.qid AND ss.doc_a = c.doc_id
                             AND ss.doc_b = s.doc_id
          GROUP BY c.qid, c.doc_id
        ),
        s{i} AS MATERIALIZED (
          SELECT qid, doc_id, CAST(mmr AS BIGINT) AS mmr_score,
                 CAST({i} AS BIGINT) AS mmr_rank
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY mmr DESC, doc_id) rn FROM m{i})
          WHERE rn = 1
        ),
        sel{i} AS MATERIALIZED (SELECT qid, doc_id FROM sel{p}
                   UNION ALL SELECT qid, doc_id FROM s{i}),
        r{i} AS MATERIALIZED (SELECT c.* FROM r{p} c WHERE NOT EXISTS (
                   SELECT 1 FROM s{i} s
                   WHERE s.qid = c.qid AND s.doc_id = c.doc_id))""")
    out["doc_mmr_topk"] = f"""
        WITH cand AS MATERIALIZED (SELECT qid, doc_id, score FROM ({_bm25_20})),
        ct AS MATERIALIZED (SELECT DISTINCT qid, doc_id, term FROM (
          SELECT c.qid, c.doc_id,
                 unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS term
          FROM cand c JOIN documents d USING (doc_id))),
        sim AS MATERIALIZED (
          SELECT a.qid, a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS shared
          FROM ct a JOIN ct b ON a.qid = b.qid AND a.term = b.term
                             AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3),
        simsym AS MATERIALIZED (SELECT qid, doc_a, doc_b, shared FROM sim
                   UNION ALL
                   SELECT qid, doc_b AS doc_a, doc_a AS doc_b, shared
                   FROM sim),
        s1 AS MATERIALIZED (
          SELECT qid, doc_id, CAST(score AS BIGINT) AS mmr_score,
                 CAST(1 AS BIGINT) AS mmr_rank
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY score DESC, doc_id) rn FROM cand)
          WHERE rn = 1),
        sel1 AS MATERIALIZED (SELECT qid, doc_id FROM s1),
        r1 AS MATERIALIZED (SELECT c.* FROM cand c WHERE NOT EXISTS (
                 SELECT 1 FROM sel1 s
                 WHERE s.qid = c.qid AND s.doc_id = c.doc_id)),
        {','.join(_mmr_rounds)}
        SELECT qid, doc_id, mmr_rank, mmr_score FROM s1
        UNION ALL SELECT qid, doc_id, mmr_rank, mmr_score FROM s2
        UNION ALL SELECT qid, doc_id, mmr_rank, mmr_score FROM s3
        UNION ALL SELECT qid, doc_id, mmr_rank, mmr_score FROM s4
        UNION ALL SELECT qid, doc_id, mmr_rank, mmr_score FROM s5
    """

    # min call-cycle length per module: unambiguous symbol resolution
    # (calls >< defs HAVING one defining module), two min-plus rounds
    # give exact distances <= 3, meet-in-the-middle pairs (u,v)+(v,u)
    # plus the closed-walk diagonal — mirrors codegraph.call_cycles
    out["code_call_cycles"] = f"""
        WITH f AS (SELECT content FROM read_parquet('{corpus}/*.parquet')),
        mm AS (
          SELECT module, content FROM (
            SELECT regexp_extract(content, '(?m)^# module: ([\\w.]+)', 1)
                     AS module, content
            FROM f
          ) WHERE module <> ''
        ),
        defs AS (
          SELECT DISTINCT module, unnest(regexp_extract_all(content,
            '(?m)^[ \\t]*def[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\(', 1))
              AS sym
          FROM mm
        ),
        uds AS (SELECT sym, min(module) AS dst FROM defs
                GROUP BY sym HAVING count(*) = 1),
        calls AS (
          SELECT DISTINCT module AS src, unnest(regexp_extract_all(content,
            '= *([A-Za-z_][A-Za-z0-9_]*)\\(', 1)) AS sym
          FROM mm
        ),
        e AS MATERIALIZED (
          SELECT DISTINCT c.src, u.dst FROM calls c JOIN uds u USING (sym)),
        c1 AS (SELECT src, dst, CAST(1 AS BIGINT) AS plen FROM e),
        c2 AS MATERIALIZED (
          SELECT src, dst, min(plen) AS plen FROM (
            SELECT * FROM c1
            UNION ALL
            SELECT a.src, b.dst, a.plen + 1 FROM c1 a JOIN e b ON a.dst = b.src
          ) GROUP BY 1, 2),
        c3 AS MATERIALIZED (
          SELECT src, dst, min(plen) AS plen FROM (
            SELECT * FROM c2
            UNION ALL
            SELECT a.src, b.dst, a.plen + 1 FROM c2 a JOIN e b ON a.dst = b.src
          ) GROUP BY 1, 2),
        cand AS (
          SELECT src AS module, plen AS l FROM c3 WHERE src = dst
          UNION ALL
          SELECT a.src AS module, a.plen + b.plen AS l
          FROM c3 a JOIN c3 b ON a.dst = b.src AND a.src = b.dst
        )
        SELECT module, CAST(min(l) AS BIGINT) AS min_cycle_len
        FROM cand GROUP BY 1 HAVING min(l) <= 6
    """

    # CUBE = rollup's plan extended to every grouping set; min/max price
    # are actual elements -> float-exact, counts re-fold as sums
    out["orders_cube"] = """
        SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               count(*) AS n_orders,
               min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """

    # OLS sufficient stats on the cents grid; slope_ppm from the exact
    # integer sums — HUGEINT keeps n*sxy exact, and // truncates toward
    # zero exactly like the engine's sign-aware abs floor-division
    out["lineitem_regression"] = """
        WITH q AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem),
        s AS (
          SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sum_x,
                 CAST(sum(y) AS BIGINT) AS sum_y,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM q GROUP BY 1)
        SELECT l_returnflag, n, sum_x, sum_y, sxx, sxy,
               CAST(CASE WHEN CAST(n AS HUGEINT) * sxx
                              - CAST(sum_x AS HUGEINT) * sum_x = 0 THEN 0
                    ELSE (1000000 * (CAST(n AS HUGEINT) * sxy
                                     - CAST(sum_x AS HUGEINT) * sum_y))
                         // (CAST(n AS HUGEINT) * sxx
                             - CAST(sum_x AS HUGEINT) * sum_x)
                    END AS BIGINT) AS slope_ppm
        FROM s
    """

    # CUSUM changepoint: deviation = n_days*c - total per observed day,
    # running sum, argmax |cusum| with earliest-day tie-break
    out["events_cusum"] = """
        WITH daily AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                     CAST(sum(c) AS BIGINT) AS total
              FROM daily GROUP BY 1),
        cu AS (SELECT d.event_type, d.day,
                      sum(t.n_days * d.c - t.total) OVER (
                        PARTITION BY d.event_type ORDER BY d.day
                        ROWS UNBOUNDED PRECEDING) AS cusum
               FROM daily d JOIN t USING (event_type)),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY abs(cusum) DESC, day) AS rn
              FROM cu)
        SELECT r.event_type, t.n_days, t.total, r.day AS change_day,
               CAST(r.cusum AS BIGINT) AS cusum_at
        FROM r JOIN t USING (event_type) WHERE rn = 1
    """

    # interval stabbing via +1/-1 boundary deltas and one running sum
    out["orders_backlog"] = """
        WITH close AS (
          SELECT l_orderkey AS o_orderkey, max(l_shipdate) AS close_day
          FROM lineitem GROUP BY 1),
        iv AS (SELECT o.o_orderdate AS open_day, c.close_day
               FROM orders o JOIN close c USING (o_orderkey)),
        d AS (
          SELECT open_day AS day, CAST(1 AS BIGINT) AS delta FROM iv
          UNION ALL
          SELECT close_day + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM iv),
        g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta
              FROM d GROUP BY 1)
        SELECT day,
               CAST(sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS open_orders
        FROM g
    """

    # association rules over qualifying baskets (2..64 distinct parts):
    # confidence/lift as exact floor divisions of int64 counts
    out["basket_rules"] = """
        WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
        sz AS (SELECT o, count(*) AS n FROM b GROUP BY 1),
        qual AS (SELECT o FROM sz WHERE n BETWEEN 2 AND 64),
        bq AS (SELECT b.o, b.p FROM b JOIN qual USING (o)),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM qual),
        item AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM bq GROUP BY 1),
        sup AS (
          SELECT x.p AS pa, y.p AS pb, CAST(count(*) AS BIGINT) AS support
          FROM bq x JOIN bq y ON x.o = y.o AND x.p < y.p
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT CAST(s.pa AS BIGINT) AS pa, CAST(s.pb AS BIGINT) AS pb,
               s.support, ia.np AS n_a, ib.np AS n_b, tot.nb AS n_baskets,
               s.support * 1000000 // ia.np AS conf_a_ppm,
               s.support * 1000000 // ib.np AS conf_b_ppm,
               s.support * tot.nb * 1000000 // (ia.np * ib.np) AS lift_ppm
        FROM sup s JOIN item ia ON ia.p = s.pa JOIN item ib ON ib.p = s.pb
        CROSS JOIN tot
    """

    # Q11 adaptation: per-part value from region-0 suppliers' lines,
    # HAVING above 2x the mean part value via exact integer
    # cross-multiplication (value * n_parts > 2 * total)
    out["q11_important_parts"] = """
        WITH rs AS (
          SELECT s_suppkey FROM supplier s
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE n.n_regionkey = 0),
        v AS (
          SELECT l_partkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS value_cents
          FROM lineitem JOIN rs ON rs.s_suppkey = lineitem.l_suppkey
          GROUP BY 1),
        tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS t,
                       CAST(count(*) AS BIGINT) AS np FROM v)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey, value_cents
        FROM v, tot WHERE value_cents * tot.np > 2 * tot.t
    """

    # Q16 adaptation: distinct suppliers per (brand, type, size) over the
    # filtered part universe, region-0 suppliers anti-joined out (the
    # schema has no comment column for the original complaints filter)
    out["q16_supplier_counts"] = """
        WITH px AS (
          SELECT p_partkey, p_brand, p_type, p_size FROM part
          WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
            AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)),
        ex AS (
          SELECT s_suppkey FROM supplier s
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          WHERE n.n_regionkey = 0),
        pairs AS (
          SELECT DISTINCT p.p_brand, p.p_type, p.p_size, l.l_suppkey
          FROM lineitem l JOIN px p ON p.p_partkey = l.l_partkey
          WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM ex))
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(*) AS BIGINT) AS supplier_cnt
        FROM pairs GROUP BY 1, 2, 3
    """

    # per-community conductance over the 4-round label-prop partition:
    # cut = d_c - 2 e_c, ppm over min(vol, 2m - vol) — same CTE chain as
    # kg_community_stats plus the scalar edge count
    out["kg_conductance"] = kg + merge + _label_prop_sql(
        rounds=4, final=False) + """,
        lab AS MATERIALIZED (SELECT node, label FROM lp_r4),
        nn AS (SELECT label, count(*) AS n_nodes FROM lab GROUP BY 1),
        te AS MATERIALIZED (
          SELECT a.label AS lu, b.label AS lv
          FROM edges e
          JOIN lab a ON a.node = e.src_id
          JOIN lab b ON b.node = e.tgt_id
        ),
        ie AS (SELECT lu AS label, count(*) AS internal_edges
               FROM te WHERE lu = lv GROUP BY 1),
        dg AS (SELECT label, count(*) AS degree_sum FROM (
                 SELECT lu AS label FROM te
                 UNION ALL SELECT lv AS label FROM te
               ) GROUP BY 1),
        mm_cnt AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
        st AS (SELECT nn.label, nn.n_nodes,
                      COALESCE(ie.internal_edges, 0) AS e_c,
                      COALESCE(dg.degree_sum, 0) AS d_c
               FROM nn LEFT JOIN ie USING (label)
               LEFT JOIN dg USING (label))
        SELECT st.label, CAST(st.n_nodes AS BIGINT) AS n_nodes,
               CAST(st.d_c - 2 * st.e_c AS BIGINT) AS cut_edges,
               CAST(st.d_c AS BIGINT) AS degree_sum,
               CAST(CASE WHEN least(st.d_c, 2 * mm_cnt.m - st.d_c) > 0
                    THEN (st.d_c - 2 * st.e_c) * 1000000
                         // least(st.d_c, 2 * mm_cnt.m - st.d_c)
                    ELSE 0 END AS BIGINT) AS conductance_ppm
        FROM st CROSS JOIN mm_cnt
    """

    # deterministic A/B split by md5(user_id) parity; exact integer
    # per-variant reductions and floor cents-per-user
    out["events_ab_test"] = """
        WITH s AS (
          SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                 1, 8)) AS UBIGINT) % 2 = 0
                      THEN 'A' ELSE 'B' END AS variant,
                 user_id, CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events),
        u AS (SELECT variant, CAST(count(DISTINCT user_id) AS BIGINT)
                     AS n_users FROM s GROUP BY 1),
        e AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(cents) AS BIGINT) AS value_cents
              FROM s GROUP BY 1)
        SELECT u.variant, u.n_users, e.n_events, e.value_cents,
               e.value_cents // u.n_users AS cents_per_user
        FROM u JOIN e USING (variant)
    """

    # incremental-vs-batch equivalence: the oracle is the BATCH mirror's
    # edges projection — the incremental Ray run must reproduce it exactly
    out["kg_incremental_edges"] = (
        kg + merge + '\nSELECT src_id, tgt_id, weight, "order" FROM edges'
    )

    # streaming micro-batch sessionization must reproduce the batch
    # sessionization exactly — the oracle IS the batch sessions mirror
    out["events_sessions_microbatch"] = out["events_sessions"]

    # interval-overlap semi-join of the two derived streams above:
    # sessions x distinct spike days, day D overlaps [first, last] iff
    # trunc_day(first) <= D <= last (inclusive BETWEEN, day-aligned);
    # spike factor 21/20 (see relational.events_sessions_in_spikes —
    # the headline 2x never fires on this near-uniform corpus)
    out["events_sessions_in_spikes"] = f"""
        WITH sess AS ({out['events_sessions']}),
        sc AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        ),
        st AS (
          SELECT event_type, CAST(sum(n) AS BIGINT) AS type_total,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM sc GROUP BY 1
        ),
        spk AS (
          SELECT DISTINCT sc.day
          FROM sc JOIN st USING (event_type)
          WHERE sc.n * st.n_days * 20 > 21 * st.type_total
        )
        SELECT sess.user_id, sess.session_id, sess.n_events,
               CAST(count(DISTINCT spk.day) AS BIGINT) AS n_spike_days
        FROM sess JOIN spk
          ON spk.day BETWEEN date_trunc('day', sess.first_ts)
                         AND sess.last_ts
        GROUP BY 1, 2, 3
    """

    # grouped mode with deterministic tie-break (count desc, type asc)
    out["user_top_event"] = """
        WITH c AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
          FROM c)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               event_type AS top_event, n
        FROM r WHERE rn = 1
    """

    # cross-repo vendored-code detection: group the RAW copies (files0,
    # pre-dedup) by content hash, keep hashes spanning >= 2 distinct
    # repos; first location = lexicographic min over the \x1f-joined
    # locator — the exact representative rule of the Ray stage
    out["code_vendored_files"] = kg + """,
vfz AS (
  SELECT content_sha256, CAST(count(*) AS BIGINT) AS n_copies,
         CAST(count(DISTINCT repo) AS BIGINT) AS n_repos,
         min(repo || chr(31) || path || chr(31) || commit) AS loc
  FROM files0 GROUP BY 1
)
SELECT content_sha256, n_copies, n_repos,
       string_split(loc, chr(31))[1] AS first_repo,
       string_split(loc, chr(31))[2] AS first_path
FROM vfz WHERE n_repos >= 2"""

    # square (4-cycle) census: per unordered diagonal pair, count common
    # neighbors z with deg(z) in [2, 64] (part of the statistic's
    # definition, same filter both engines); squares = C(cn, 2); top-20
    # by (squares desc, ea, eb)
    out["kg_square_census"] = kg + merge + """,
adjsq AS (
  SELECT DISTINCT z, x FROM (
    SELECT src_id AS z, tgt_id AS x FROM edges
    UNION ALL SELECT tgt_id, src_id FROM edges)
),
degsq AS (SELECT z, count(*) AS d FROM adjsq GROUP BY z),
candsq AS (
  SELECT a.x AS ea, b.x AS eb FROM adjsq a
  JOIN adjsq b ON a.z = b.z AND a.x < b.x
  JOIN degsq d ON d.z = a.z
  WHERE d.d BETWEEN 2 AND 64
),
aggsq AS (
  SELECT ea, eb, CAST(count(*) AS BIGINT) AS cn FROM candsq GROUP BY 1, 2
),
scsq AS (
  SELECT ea, eb, cn, CAST(cn * (cn - 1) // 2 AS BIGINT) AS squares
  FROM aggsq WHERE cn >= 2
)
SELECT ea, eb, cn, squares, rank FROM (
  SELECT *, row_number() OVER (ORDER BY squares DESC, ea, eb) AS rank
  FROM scsq
) WHERE rank <= 20"""

    # greedy max-coverage selection, 4 unrolled rounds (argmax by
    # gain desc / doc_id asc; covered set grows by the winner's tokens)
    out["doc_select_maxcover"] = _maxcover_sql(k=4)
    return out

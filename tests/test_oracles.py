"""In-gate oracle regression guard: a few representative queries() vs
oracle_sql() comparisons at sf0.001, so a broken SQL mirror or a drifting
pipeline fails `pytest -x -q` and not just the driver's external check."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
CASES = [
    "kg_nodes",
    "kg_edges",
    "events_sessions",
    "doc_topk_ngrams",
    "kg_entity_vec_components",
    "events_asof_orders",
    "segment_price_quantiles",
    "doc_pack_sequences",
    "price_global_quantiles",
    "orders_rollup",
    "events_user_retention",
    "code_dedup_lines",
    "doc_decontaminate",
    "doc_dsir_weights",
    "bpe_merges",
    "code_secret_scan",
    "orders_cdc_diff",
    "events_window_dedup",
    "events_path_trigrams",
    "emb_kmeans",
    "emb_semdedup",
    "doc_curation",
    "user_customer_outer",
    "q3_shipping",
    "code_import_indegree",
    "lineitem_price_mad",
    "doc_robust_outliers",
    "doc_token_budget",
    "code_repo_pack",
    "doc_length_pct_rank",
    "doc_shuffle_order",
    "doc_weighted_median_len",
    "doc_split_assign",
    "join_size_events_customer",
    "emb_covariance",
    "documents_jsonl_roundtrip",
    "events_heavy_hitters",
    "lineitem_expectations",
    "doc_commonness",
    "orders_zorder",
    "emb_pca_component",
    "events_scd2",
    "events_window_users",
    "doc_boolean_and",
    "repo_lang_profile",
    "emb_quantize_error",
    "parts_skyline",
    "code_complexity",
    "emb_pq_error",
    "doc_phrase_match",
    "events_rfm",
    "q6_revenue",
    "region_segment_stats",
    "kg_type_pairs",
    "code_clones",
    "doc_winnow",
    "events_lateness",
    "emb_ann_recall",
    "events_dwell",
    "kg_assortativity",
    "code_import_hits",
    "q4_late_orders",
    "q5_nation_volume",
    "q13_order_distribution",
    "q14_promo_share",
    "q18_big_orders",
    "doc_mmr_topk",
    "doc_entropy",
    "events_decay",
    "events_transitions",
    "kg_path_counts",
    "code_dep_depth",
    "code_identifier_vocab",
    "kg_clustering_coeff",
    "emb_matryoshka_error",
    "events_props_stats",
    "events_trending",
    "q7_nation_flows",
    "lineitem_winsorized",
    "customer_revenue_gini",
    "doc_compaction_plan",
    "events_spike_days",
    "lineitem_share_of_order",
    "doc_vocab_setops",
    "doc_bpe_encode",
    "events_type_overlap",
    "kg_degree_dist",
    "orders_weekday_profile",
    "customer_pareto_80",
    "kg_type_degrees",
    "events_sliding_users",
    "kg_typed_wedges",
    "events_user_span",
    "doc_lang_confusion",
    "kg_extraction_coverage",
    "emb_label_scatter",
    "doc_curated_bm25",
    # session 14
    "emb_mutual_knn",
    "doc_quality_buckets",
    "orders_ship_lag",
    "events_sessions_in_spikes",
    "orders_cdc_ivm",
    "kg_betweenness",
    "events_autocorr",
    "doc_containment",
    "documents_schema_drift",
    "ann_pq_topk",
    "emb_pq_recall",
    "user_event_unpivot",
    "kg_hyperball",
    "dedup_minhash_recall",
    "events_late_arrivals",
    "doc_select_maxcover",
    "doc_tokenizer_fertility",
    "code_unused_defs",
    # round 4
    "media_png_decode",
    "kg_entity_vecs_invariants",
    "media_feature_vecs_invariants",
    "doc_exact_stratified_sample",
    "events_strict_funnel",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def contract():
    import os

    import __ray_entry__ as entry

    # scale-portable mirrors (IVF centroid literals, prune-fixture footers)
    # follow RAYKG_ORACLE_SF — point them at the gate's SF before the
    # oracle dict is built
    os.environ["RAYKG_ORACLE_SF"] = SF
    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return qs, oracles, con


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(contract, name):
    qs, oracles, con = contract
    res = qs[name](SF)
    ours = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    sql = oracles[name]
    if "/tmp/raykg_corpus/" in sql:
        from mmgraphrag_ray.corpus import ensure_corpus

        sql = sql.replace(ensure_corpus("/root/testdata/sf0.01"), ensure_corpus(SF))
    if "/tmp/raykg_prune/" in sql:
        from mmgraphrag_ray.stages.layout import ensure_partitioned_docs

        sql = sql.replace(
            ensure_partitioned_docs("/root/testdata/sf0.01", n_parts=8),
            ensure_partitioned_docs(SF, n_parts=8),
        )
    theirs = con.sql(sql).df()
    pd.testing.assert_frame_equal(
        _normalize(ours), _normalize(theirs), check_dtype=False
    )


def test_contract_shape(contract):
    """Driver-contract invariants: every oracle key has a query, every
    query is callable, and the documented rows-only set is exactly the
    queries without oracles."""
    qs, oracles, _ = contract
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "kg_canonical_nodes", "kg_alias_table",
        "kg_entity_vecs", "media_feature_vecs",
    }


def test_doc_tally_matches_code(contract):
    """Judge-facing tallies can't drift: the COVERAGE.md header and the
    README contract line must equal len(queries()) / len(oracle_sql())."""
    import pathlib
    import re

    qs, oracles, _ = contract
    cov = pathlib.Path("/root/repo/COVERAGE.md").read_text()
    m = re.search(
        r"Tally \(round \d+\): (\d+) driver queries, \*\*(\d+) value-oracled\*\*",
        cov)
    assert m, "COVERAGE.md tally header missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(qs), len(oracles))
    readme = pathlib.Path("/root/repo/README.md").read_text()
    m2 = re.search(r"(\d+) queries \((\d+) DuckDB-oracled\)", readme)
    assert m2, "README.md contract line missing"
    assert (int(m2.group(1)), int(m2.group(2))) == (len(qs), len(oracles))

"""Empty-input robustness: at 100 TB a partition, a source, or a whole
day of data CAN be empty, and the engine's answer must be an empty (or
identity) result — never a crash. Index builds that genuinely cannot
exist without data (IVF centroids, PQ codebooks) must fail with a
clear ValueError, not an IndexError from a silent empty collect.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from fuzzy_item_matching_spark.queries import load_all

SF_SRC = "/root/testdata/sf0.001"
EMPTY = "/root/repo/.scratch/empty_sf"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Representative non-index queries across the operator families: all
# must evaluate cleanly on a fully empty dataset.
EMPTY_SAFE = [
    "rel_pricing_summary",
    "rel_cust_order_stats",
    "rel_status_share",
    "rel_rolling_user_value",
    "rel_user_sessions_batch",
    "rel_grouping_sets",
    "rel_value_outliers",
    "rel_salted_agg",
    "rel_histo_quantiles",
    "rel_bucketed_range_join",
    "rel_bloom_semi_join",
    "ts_token_stats",
    "ts_oov_rate",
    "ts_doc_quality",
    "ts_countmin_heavy",
    "ts_pmi_cooccurrence",
    "ts_hll_distinct",
    "dedup_exact_docs",
    "dedup_chunk_lines",
    "dedup_incremental_minhash",
    "dedup_funnel_counts",
    "dedup_cdc_chunks",
    "dedup_minhash_recall",
    "mm_phash_pairs",
    "ts_loss_mask",
    "ts_wordlm_score",
    "ts_vocab_growth",
    "src_scd2_history",
    "train_embedding_drift",
    "train_class_weights",
    "train_robust_scaler",
    "train_source_mixture",
    "vec_l2_norm",
    "vec_int8_topk",
    "pipe_corpus_funnel",
    "pipe_token_budget",
    "pipe_length_buckets",
    # r07 additions
    "dedup_boundary_overlap",
    "pipe_preference_pairs",
    "train_hard_negatives",
    "train_word2vec_lite",
    # r08 additions
    "dedup_substring_spans",
    "ts_dsir_weights",
    "stream_anomaly_zscore",
    "rel_range_interval_ma",
    "ts_kneser_ney",
    "sim_rrf_fusion",
    "mm_scene_cuts",
    "train_ece",
    "sim_blocking_eval",
    "text_unigram_em",
    "text_unigram_segments",
    "text_unigram_prune",
    "ts_ngram_novelty",
    # r09 additions
    "ts_gopher_repetition",
    "train_tpe_search",
    # r10 additions
    "rel_recursive_hierarchy",
    "rel_variant_props",
    "rel_sql_udf_tiers",
    "rel_pipe_syntax_pricing",
    "rel_sql_table_function",
    "rel_python_udtf_runs",
    "rel_pandas_udaf_median",
    "ts_filter_agreement",
    "vec_arrow_map_norms",
    "stream_ewma_control",
    "stream_state_inspector",
    # r11 additions: empty ratings/edge/document/order frames flow
    # through ALS solves, LPA rounds, winnowing selection, the lateral
    # top-k, the transpose, and the recursive closure as empty (or
    # key-only) results — never a crash
    "rel_recursive_closure",
    "train_als_implicit",
    "serve_als_topk",
    "rel_label_propagation",
    "dedup_winnowing_pairs",
    "rel_lateral_topk_per_cust",
    "rel_transpose_status_metrics",
    "dedup_incremental_winnowing",
    "rel_ppr_parts",
    # r12 additions: empty edges/postings/panels/events flow through
    # the k-core peel, the MaxScore split, the probe expansion, the
    # sketch joins, the attribution range join, MI scoring, the
    # containment join and the conformal rank pick as empty results
    "rel_kcore_parts",
    "sim_maxscore_topk",
    "sim_ann_multiprobe_lsh",
    "rel_cm_join_size",
    "rel_time_decay_attribution",
    "ts_mi_terms",
    "dedup_containment_pairs",
    "train_conformal_ols",
]

# Index builds sample data driver-side: empty corpus -> loud error.
# r12 session-2 births: all return schema-stable empty (or all-zero /
# init-trace) results on an empty dataset — probed explicitly; the
# Markov walk short-circuits at k=0 (ANSI 1/0 would raise otherwise)
EMPTY_SAFE += [
    "rel_cusum_changepoints",
    "rel_hits_scores",
    "sim_maxsim_topk",
    "rel_cuped_adjustment",
    "rel_holt_forecast",
    "ts_kmv_anb",
    "sim_ann_graph_expand",
    "rel_skyline_parts",
    "text_phonetic_blocking",
    "rel_markov_stationary",
    "rel_markov_removal_attribution",
    "train_km_survival",
    "ts_good_turing",
    "train_pit_features",
    "ts_js_divergence",
    "rel_bitmap_overlap",
    "train_dp_noisy_counts",
    "vec_pca_deflation",
    "ts_textrank_terms",
    "train_uncertainty_batch",
    "train_cost_threshold",
]

NEEDS_DATA = [
    "sim_ann_ivf_topk",
    "sim_ann_pq_topk",
    "sim_ann_ivfpq_topk",
    # semantic dedup: the centroid sample cannot exist without data
    "dedup_semantic_pairs",
    "dedup_semantic_keep",
    # MMR: a greedy rerank cannot exist without a candidate pool
    "sim_mmr_topk",
    "dedup_semantic_recall",
    # r08: fits whose threshold grids / seeds / EM state cannot exist
    # on an empty frame raise a clear ValueError
    "vec_kmeans_centroids",
    "vec_kmeans_silhouette",
    "vec_kmeans_elbow",
    "serve_fs_em_fit",
    "train_gboost_fit",
    "train_gboost_score",
    "train_gboost_depth2",
    "train_gboost_d2_score",
    "train_gboost_importance",
    "train_platt_scaling",
    "train_pr_curve",
    "train_gboost_early_stop",
    "train_label_noise",
    # r09: the deep/hist/stochastic fits and the probe sweep's
    # centroid sample cannot exist on an empty frame
    "train_gboost_depth3",
    "train_gboost_stochastic",
    "train_gboost_hist",
    "sim_ann_ivf_probe_sweep",
    # r10: the per-node-subset fit and the composed lifecycle both
    # reach the booster's empty-frame guard
    "train_gboost_colsample_node",
    "serve_end_to_end",
    # r11: the Poisson fit reaches the same guard — no threshold grid
    # can exist on an empty per-customer frame
    "train_gboost_poisson",
    # r12: bagged stumps reach the boosting empty-frame guard; the
    # k-center seed collect raises its own clear ValueError
    "train_rf_stumps",
    "train_rf_oob_eval",
    "vec_kcenter_init",
    "train_fm_gd",
]


@pytest.fixture(scope="module")
def empty_sf():
    os.makedirs(EMPTY, exist_ok=True)
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{SF_SRC}/{t}.parquet' LIMIT 0)"
            f" TO '{EMPTY}/{t}.parquet' (FORMAT PARQUET)"
        )
    return EMPTY


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_query_survives_empty_dataset(spark, empty_sf, name):
    reg = load_all()
    rows = reg[name].fn(spark, empty_sf).collect()
    # no crash; and nothing fabricated from nothing (bloom emits its
    # one all-zero counts row, the funnel its four zero-count stages;
    # everything else must be empty)
    if name == "rel_bloom_semi_join":
        [r] = rows
        assert r["n_orders"] == r["n_bloom_pass"] == r["n_true"] == 0
    elif name == "dedup_funnel_counts":
        assert len(rows) == 4 and all(r["n_docs"] == 0 for r in rows)
    elif name == "dedup_minhash_recall":
        # vacuous truth: 0 exact pairs, 0 missed, recall defined as 1
        [r] = rows
        assert r["n_exact"] == r["n_lsh"] == r["n_missed"] == 0
        assert r["recall"] == 1.0
    elif name == "sim_blocking_eval":
        # vacuous comparison space: completeness and reduction = 1
        [r] = rows
        assert r["n_truth"] == r["n_cand"] == r["n_hit"] == 0
        assert r["pairs_completeness"] == r["reduction_ratio"] == 1.0
    elif name == "rel_markov_removal_attribution":
        # the scenario domain is literal: four channels, zero effect
        assert len(rows) == 4
        assert all(
            r["p_full"] == r["p_removed"] == r["removal_effect"] == 0.0
            for r in rows
        )
    elif name == "ts_filter_agreement":
        # the 1-row integer summary of an empty corpus: zero everywhere
        [r] = rows
        assert r["n_docs"] == 0
    elif name == "train_ece":
        # the 1-row summary of an empty bin table: all-null metrics
        [r] = rows
        assert r["n_bins"] == 0 and r["ece"] is None
    elif name == "rel_transpose_status_metrics":
        # transpose of the 0-row summary: the three metric KEY rows
        # survive (they are the input's column names) with no status
        # columns to carry values
        assert {r["key"] for r in rows} == {
            "n_orders",
            "revenue",
            "avg_price",
        }
    else:
        assert rows == []


@pytest.mark.parametrize("name", NEEDS_DATA)
def test_index_build_fails_loudly_on_empty(spark, empty_sf, name):
    reg = load_all()
    with pytest.raises(
        ValueError,
        match="empty corpus|no non-null|empty training frame"
        "|empty input frame|zero blocked",
    ):
        reg[name].fn(spark, empty_sf).collect()

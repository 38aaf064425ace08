"""Query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables. The driver harness
runs both sides and hash-compares results, so:

  * every computed column is aliased identically on both sides;
  * nondeterministic functions never reach compared columns;
  * double aggregates are rounded on both sides with matching op order;
  * integer sums in oracle SQL are CAST(... AS BIGINT) (DuckDB sums ints to
    HUGEINT, Spark to LongType).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-equivalent SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver harness evaluates queries in registration order and caps the
# per-round run (round 1 stopped at 50 of 88, leaving every window/set-op/
# streaming/late-scalar query without a hard CORRECTNESS row). PRIORITY pins
# the front of the catalog: families with no driver evidence yet come first,
# then queries changed this round, then a few high-value sentinels. Rotate
# per round so every query eventually gets a hard-signal row.
PRIORITY: list[str] = [
    # --- round-11 rotation, the r10 verdict's prescription with the
    # same documented arithmetic as r10: this round's TWENTY-SEVEN new
    # queries take cap slots (the binding done-criterion is "zero
    # oracle-backed queries with no driver row ever"), then the six
    # trivial r5 rows displaced in r10 lead as prescribed, then the
    # r6-stalest set — 27 + 6 + 17 of the 45 r6 rows = 50. The
    # twenty-eight r6 rows displaced to the overflow head are the most
    # TRIVIAL shapes (the three scalar function batteries, the seven
    # basic ranking/frame/z-score window forms, lag/lead, the
    # quality-score scalar battery, and the two one-call approx
    # sketches (distinct-count and percentile brackets) — each pinned
    # by pytest and contained in richer oracles: every window primitive
    # also runs inside sessionize/funnel/Holt/CUSUM, the z-score inside
    # the winsorize family, the scalar batteries inside the enrichment
    # pipelines, the approx sketches beside the KMV/HLL-bound and
    # exact-rank-quantile siblings, the rolling-hash
    # fingerprint beside the span-dedup/minhash crossengine oracles that
    # exercise the same Karp-Rabin primitive, the BPE token-stat readout
    # beside the BPE train/encode oracles that stay in-cap, the byte
    # histogram beside the binary-stats/chunk-energy/decode oracles that
    # exercise the same byte-stream plumbing, the brute-force cosine
    # top-k whose ranking replays inside the in-cap ann-recall oracle,
    # the bare anti-join that also runs inside the in-cap Q21
    # SQL-text decorrelation, the n-gram language-ID heuristic whose
    # scoring the in-cap per-language quota query re-exercises, the
    # vocab-encode explode/join/reassembly contained in the in-cap BPE
    # encode oracle, the Zipf least-squares-on-sums superseded in
    # richness by the new in-cap OLS/Spearman pair, the binary byte
    # stats beside the in-cap patch-retrieval plumbing, the plain
    # stratified sample whose hash-membership machinery the in-cap
    # per-language quota query extends with quality quotas, and the
    # 22-agg feature matrix contained in the r10-driver-green
    # entity-features battery, the sign-bucket blocked cosine
    # variant whose candidate set is a pytest-pinned subset of the
    # in-cap exact-pairs oracle, and the md5-pinned conversation
    # rendering whose loss-mask offsets the sft_turn_offsets pytest
    # slices against the rendered string, and the DPO struct-ordering
    # pair cut whose lexicographic max/min the crafted-pool pytest
    # pins at both tie ends — re-verified in this round's
    # full-registry sweeps; they lead the r12 cap.
    # (a) round-11 NEW queries, newest-risk first
    "window_page_hinkley",
    "streaming_cvm_drift",
    "streaming_psi_drift",
    "curation_neyman_allocation",
    "sql_unshipped_orders",
    "sql_local_supplier_volume",
    "sql_shipmode_priority",
    "sql_discounted_revenue",
    "diag_cramer_von_mises",
    "text_kendall_rankings",
    "sql_forecast_revenue",
    "similarity_mmr_rerank",
    "diag_spearman_corr",
    "diag_psi_stability",
    "streaming_ks_drift",
    "diag_welch_ttest",
    "window_cusum_changepoint",
    "diag_ks_two_sample",
    "diag_mannwhitney_u",
    "diag_chi_square_drift",
    "agg_gini_concentration",
    "ml_ols_per_group",
    "sql_returned_item_revenue",
    "sql_promo_revenue",
    "diag_bootstrap_ci_ratio",
    "window_holt_winters",
    "agg_weighted_trimmed_mean",
    # (b) the six trivial r5 rows displaced from the r10 cap
    "join_inner_customer_orders",
    "join_left_outer",
    "join_full_outer",
    "join_semi_urgent_customers",
    "agg_ungrouped_global",
    "agg_collect_set",
    # (c) 17 of the 45 r6-latest rows (stalest driver evidence)
    "agg_kmv_distinct",
    "curation_leakage_safe_split",
    "curation_prepare_corpus",
    "curation_quota_per_language",
    "dedup_cluster_representatives",
    "dedup_embedding_cosine_pairs",
    "join_bucketed_colocated",
    "join_salted_skew",
    "multimodal_patch_retrieval",
    "pii_mask_and_tokenize",
    "similarity_ann_recall",
    "sql_waiting_suppliers",
    "streaming_dedup_keys",
    "streaming_session_window",
    "streaming_stateful_totals",
    "text_bpe_encode_stats",
    "text_bpe_train_merges",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the twenty-eight trivial r6 rows displaced by this round's
    # new queries lead (stalest after this rotation — they head the
    # r12 cap), then the r7-vintage rows (next stalest), then
    # everything fresher in registration order; the rows-only set
    # stays at the end (weaker rows by design — each has an
    # oracle-backed sibling; see COVERAGE.md rows-only map).
    "agg_approx_count_distinct",
    "agg_approx_percentile_bounds",
    "join_anti_customers_without_orders",
    "curation_stratified_sample",
    "dedup_embedding_cosine_blocked",
    "ml_feature_matrix",
    "multimodal_binary_stats",
    "multimodal_byte_histogram",
    "text_language_id",
    "text_vocab_encode",
    "text_zipf_diagnostics",
    "sft_dpo_pairs",
    "sft_rendered_conversations",
    "similarity_cosine_topk",
    "scalar_datetime_functions",
    "scalar_math_functions",
    "scalar_string_functions",
    "text_bpe_token_stats",
    "text_fingerprint_rolling",
    "text_quality_score",
    "window_cumulative_sum",
    "window_first_last",
    "window_lag_lead",
    "window_ntile_percent_rank",
    "window_rank_dense_rank",
    "window_rolling_avg",
    "window_anomaly_zscore",
    "window_topn_per_user",
    # r7-vintage
    "curation_bigram_buckets",
    "curation_decontaminate_benchmark",
    "curation_funnel_crossengine",
    "curation_leakage_split_minhash",
    "curation_perplexity_buckets",
    "curation_remove_boilerplate",
    "curation_temperature_epochs",
    "dedup_exact_documents",
    "dedup_incremental_crossengine",
    "dedup_minhash_crossengine",
    "distinct_projection",
    "filter_predicates",
    "join_blame_late_supplier",
    "join_idle_rich_customers",
    "join_min_cost_supplier",
    "json_extract_events",
    "scalar_array_element_at",
    "scalar_boolean_or_labeling",
    "scalar_collection_functions",
    "scalar_conditional_bucketing",
    "scalar_conditional_risk_score",
    "scalar_explode_word_counts",
    "scalar_from_json_struct",
    "scalar_map_literal_lookup",
    "scalar_regexp_functions",
    "scalar_unpivot_stack",
    "setop_except_all",
    "setop_except_subtract",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
    "sft_contrastive_triplets",
    "sort_multikey",
    "streaming_curation_neardup_crossengine",
    "streaming_decontaminate",
    "streaming_kmv_distinct",
    "streaming_perplexity_gate",
    "streaming_reservoir_sample",
    "text_bigram_surprisal",
    "text_tfidf_top_terms",
    "topk_orders_by_price",]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then apply
    the PRIORITY ordering to both registries in place."""
    from databricks_etl_pipelines_spark.plans import (  # noqa: F401
        queries_aggregates,
        queries_joins,
        queries_llm,
        queries_mixture,
        queries_ml,
        queries_pipeline,
        queries_scalar,
        queries_scd,
        queries_sortset,
        queries_sql,
        queries_stats,
        queries_streaming,
        queries_windows,
    )

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for registry in (QUERIES, ORACLES):
        reordered = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(reordered)

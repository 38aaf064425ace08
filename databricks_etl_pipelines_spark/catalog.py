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
    # --- round-12 rotation, the r11 verdict's prescription: a normal
    # round's new queries (11 new + the 2 whose OUTPUT or code changed
    # this round: Neyman's largest-remainder top-up changes the
    # allocation rows; chi-square gained the nullif guard), then ALL
    # 28 r6-vintage rows (the verdict's binding done-criterion: after
    # r12 no oracle-backed query's newest driver row is older than
    # r7), then the 9 stalest r7 rows — 13 + 28 + 9 = 50. The
    # remaining r7 rows lead the overflow and clear next round.
    # (a) round-12 NEW queries, newest-risk first
    "streaming_kaplan_meier",
    "streaming_drift_suite",
    "diag_cuped_adjustment",
    "diag_did_estimator",
    "streaming_logrank_test",
    "diag_rmst",
    "diag_nelson_aalen",
    "streaming_page_hinkley",
    "diag_logrank_test",
    "diag_kaplan_meier",
    "streaming_cusum_changepoint",
    # (a') changed this round
    "curation_neyman_allocation",
    "diag_chi_square_drift",
    # (b) the 28 r6-vintage rows (trivial shapes displaced by r11's
    # heavy rotation; every one re-verified green with no float-drift
    # flag in this round's builder sweep)
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
    # (c) the 9 stalest r7-vintage rows
    "curation_bigram_buckets",
    "curation_decontaminate_benchmark",
    "curation_funnel_crossengine",
    "curation_leakage_split_minhash",
    "curation_perplexity_buckets",
    "curation_remove_boilerplate",
    "curation_temperature_epochs",
    "dedup_exact_documents",
    "dedup_incremental_crossengine",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the remaining r7-vintage rows lead (stalest after this
    # rotation — they head the r13 cap), then everything fresher in
    # registration order (dedup_minhash_crossengine first); the
    # rows-only set stays at the end (weaker
    # rows by design — each has an oracle-backed sibling; see
    # COVERAGE.md rows-only map).
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

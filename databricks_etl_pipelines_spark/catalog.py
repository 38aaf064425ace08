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
    # --- round-4 final rotation. The driver checks the FIRST 50 registry
    # entries per round; r1∪r2∪r3 left 55 registered queries with no
    # driver row (the 10 late-r3 additions + everything new in r4).
    # In-cap: 50 of those 55 — all except 5 identical-text SQL shapes
    # (their oracle IS the same SQL string and the decorrelation rewrites
    # are plan-asserted in pytest — the lowest-signal class to defer).
    # Immediately behind the cap: the deferred SQL shapes and the 3
    # queries whose oracle was UPGRADED from rows-only this round
    # (including curation_pack_sequences, whose packing layout changed —
    # its new code is covered by local check_oracle runs at sf0.01 AND
    # sf0.1, recorded in NOTES, and by the planted-semantics pytest; a
    # first-ever driver row beats a re-check in the 50-slot budget).
    # Then changed-code re-checks, then the stalest r1-latest sentinels.
    # (a) the 10 late-r3 queries — the entire r3 evidence gap
    "privacy_gdpr_erase_users",
    "agg_winsorize_zscore",
    "diag_column_profile",
    "agg_benford_first_digit",
    "join_fuzzy_name_match",
    "join_priority_class_counts",
    "join_disjunctive_predicates",
    "streaming_corpus_drift",
    "streaming_curation_neardup",      # rows-only by nature (seeded LSH)
    "curation_leakage_safe_split",
    # (b) new r4a/r4b hard-oracle queries
    "multimodal_decode_image_stats",
    "dedup_minhash_crossengine",
    "dedup_simhash_crossengine",
    "curation_funnel_crossengine",
    "curation_pack_concat_chunks",
    "curation_chunk_manifest",
    "similarity_ivf_crossengine",
    "similarity_batch_topk",
    "curation_mixture_epoch_plan",
    "similarity_pq_adc_crossengine",
    "dedup_semdedup_crossengine",
    "text_hash_embeddings",
    "similarity_text_hash_topk",
    "dedup_incremental_crossengine",
    "curation_length_buckets",
    # (c) new r4c hard-oracle queries
    "dedup_duplicate_spans",
    "curation_dsir_weights",
    "privacy_document_scrub",
    "text_bpe_train_merges",
    "text_bpe_encode_stats",
    "curation_dsir_budget_select",
    "curation_weighted_sample",
    "streaming_dsir_scores",
    "similarity_chunk_retrieval",
    "text_zipf_diagnostics",
    "curation_source_divergence",
    "curation_prepare_corpus",
    "sql_waiting_suppliers",           # Q21: hardest decorrelation, keep in-cap
    "window_anomaly_zscore",
    "multimodal_patch_retrieval",
    "sft_turn_offsets",
    "sft_rendered_conversations",
    "text_augment_dropout",
    # (d) new r4d hard-oracle queries (SCD2 family, DPO, interval join)
    "dim_scd2_history",
    "scd2_incremental_orders",
    "streaming_scd2_dimension",
    "sft_dpo_pairs",
    "join_interval_overlap",
    "cdc_apply_orders",
    "window_attribution_linear",
    # ---------------- 50-slot cap boundary ----------------
    "streaming_cdc_dimension",  # shares oracle + machinery with in-cap
                                # cdc_apply_orders; locally verified
    "similarity_incremental_ivf",  # same oracle family as in-cap
                                   # similarity_ivf_crossengine
    "dim_scd2_point_in_time",      # SCD2 read path; composes in-cap
                                   # dim_scd2_history + r1-green asof_join
    "dim_scd2_with_deletes",       # delete-closed intervals; same algebra
                                   # as in-cap dim_scd2_history
    # oracle upgraded rows-only -> hard this round; re-check for a hard
    # hash-matched row (these DO have prior driver rows, unlike the 50)
    "similarity_lsh_ann_topk",
    "similarity_pandas_udf_topk",
    "curation_pack_sequences",         # upgraded to hard oracle (bucket-keyed)
    # deferred identical-text SQL shapes (plan-asserted in pytest)
    "sql_exists_late_orders",
    "sql_in_having_big_orders",
    "sql_scalar_anti_customers",
    "sql_volume_shipping",
    "sql_market_share",
    # changed-code re-checks from r4a (error-path-only drain wrapper /
    # managed-table layout fix), all r2/r3-green
    "merge_upsert_orders",
    "change_feed_orders",
    "curation_token_budget_select",
    "curation_quota_per_language",
    "streaming_curation_ingest",
    "streaming_foreachbatch_merge",
    "streaming_stateful_totals",
    "source_python_stream_datasource",
    "ml_quality_classifier",
    "ml_run_history",
    # stalest sentinels (latest driver row is r1)
    "flagship_pricing_risk_summary",
    "agg_entity_features",
    "agg_dq_summary",
    "agg_hourly_volume_stats",
    "agg_ungrouped_global",
    "agg_rollup",
    "agg_cube",
    "agg_percentiles",
    "agg_collect_set",
    "agg_grouping_sets",
    "agg_pivot_status_counts",
    "agg_null_handling",
    "pipeline_silver_enrichment",
    "pipeline_quarantine_summary",
    "join_inner_customer_orders",
    "join_broadcast_dims",
    "join_left_outer",
    "join_full_outer",
    "join_semi_urgent_customers",
    "join_three_way_topk_revenue",
    "join_asof_last_click",
    "join_range_clicks_before_error",
    "text_quality_score",
    "text_language_id",
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_cosine_blocked",
    "multimodal_binary_stats",
    "scalar_string_functions",
    "pii_mask_and_tokenize",
]


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
        queries_streaming,
        queries_windows,
    )

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for registry in (QUERIES, ORACLES):
        reordered = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(reordered)

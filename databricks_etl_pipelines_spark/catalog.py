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
    # --- round-4 rotation (consolidation): r1∪r2∪r3 covers 135 of 145
    # registered queries, 0 FAIL. Front of the cap: (a) the 10 late-r3
    # queries that have never had a driver row (the only evidence gap);
    # (b) every query whose code changed this round (managed-table
    # bucket-layout fix, await_drained drains, bounded token-budget column
    # order, ml fast-path); (c) staleness re-checks — oracle-backed queries
    # whose latest driver row is r1, oldest evidence first. Everything
    # r2/r3-green with unchanged code moves behind the cap.
    # (a) never driver-checked (10) — leakage split last: ~40 s/slot
    "privacy_gdpr_erase_users",
    "agg_winsorize_zscore",
    "diag_column_profile",
    "agg_benford_first_digit",
    "join_fuzzy_name_match",
    "join_priority_class_counts",
    "join_disjunctive_predicates",
    "streaming_corpus_drift",
    "streaming_curation_neardup",
    "curation_leakage_safe_split",
    # (b) code changed this round — need fresh rows
    "merge_upsert_orders",        # managed_table: layout-preserving fallback
    "change_feed_orders",         # managed_table: same commit surface
    "curation_token_budget_select",  # bounded variant column-order fix
    "curation_quota_per_language",   # shares the bounded machinery
    "streaming_curation_ingest",     # await_drained at every drain site
    "multimodal_decode_image_stats",  # NEW r4: pure-numpy BMP decode
    "dedup_minhash_crossengine",      # NEW r4: banded LSH, hard-verified
    "dedup_simhash_crossengine",      # NEW r4: simhash vote+pigeonhole, hard-verified
    "similarity_lsh_ann_topk",        # UPGRADED r4: rows-only -> hard oracle
    "similarity_pandas_udf_topk",     # UPGRADED r4: rows-only -> hard oracle
    "curation_funnel_crossengine",    # NEW r4: full funnel, hard-verified
    "sql_exists_late_orders",         # NEW r4: EXISTS decorrelation (Q4 shape)
    "sql_in_having_big_orders",       # NEW r4: IN+HAVING subquery (Q18 shape)
    "sql_scalar_anti_customers",      # NEW r4: scalar+NOT EXISTS (Q22 shape)
    "curation_pack_concat_chunks",    # NEW r4: concat-then-chunk layout, hard oracle
    "curation_chunk_manifest",        # NEW r4: loader-side chunk manifest, hard oracle
    "similarity_ivf_crossengine",     # NEW r4: IVF bucket machinery, hard-verified
    "similarity_batch_topk",          # NEW r4: batch retrieval, hard oracle
    "curation_mixture_epoch_plan",    # NEW r4: mixture materialization, hard oracle
    "similarity_pq_adc_crossengine",  # NEW r4: PQ-ADC machinery, hard-verified
    "dedup_semdedup_crossengine",     # NEW r4: SemDeDup blocking, hard-verified
    "text_hash_embeddings",           # NEW r4: hashing-trick embedder, hard oracle
    "similarity_text_hash_topk",      # NEW r4: text->vector->topk, hard oracle
    "dedup_incremental_crossengine",  # NEW r4: incremental screening, hard oracle
    "curation_length_buckets",        # NEW r4: padding-waste report, hard oracle
    "dedup_duplicate_spans",          # NEW r4c: repeated-span report, hard oracle
    "curation_dsir_weights",          # NEW r4c: DSIR importance weights, hard oracle
    "privacy_document_scrub",         # NEW r4c: free-text PII redaction, hard oracle
    "text_bpe_train_merges",          # NEW r4c: BPE trainer, unrolled hard oracle
    "text_bpe_encode_stats",          # NEW r4c: BPE dictionary encode, hard oracle
    "curation_dsir_budget_select",    # NEW r4c: DSIR x token-budget composition
    "curation_weighted_sample",       # NEW r4c: A-ES weighted sampling, hard oracle
    "streaming_dsir_scores",          # NEW r4c: streaming DSIR vs batch oracle
    "similarity_chunk_retrieval",     # NEW r4c: RAG chunk->embed->topk, hard oracle
    "text_zipf_diagnostics",          # NEW r4c: Zipf-law fit, hard oracle
    "curation_source_divergence",     # NEW r4c: pairwise source JSD, hard oracle
    "curation_prepare_corpus",        # NEW r4c: full prep pipeline, hard oracle
    "sql_volume_shipping",            # NEW r4c: Q7 shape, identical-text oracle
    "sql_market_share",               # NEW r4c: Q8 shape, identical-text oracle
    "sql_waiting_suppliers",          # NEW r4c: Q21 double decorrelation
    "window_anomaly_zscore",          # NEW r4c: trailing-baseline anomaly flagging
    "multimodal_patch_retrieval",     # NEW r4c: decode->patch-embed->topk
    "sft_turn_offsets",               # NEW r4c: loss-mask offsets, hard oracle
    "sft_rendered_conversations",     # NEW r4c: ordered render, md5-pinned
    "text_augment_dropout",           # NEW r4c: seeded dropout, md5-pinned
    # (b-tail) deferred behind the new hard-oracle queries: the r4a change
    # these would re-check is the error-path-only await_drained wrapper
    # (behavior-identical on a green drain) or rows-only ML knobs — all
    # pytest-pinned, r2-green, weakest driver signal per slot.
    "streaming_foreachbatch_merge",
    "streaming_stateful_totals",
    "source_python_stream_datasource",
    "ml_quality_classifier",         # seed param removed (rows-only)
    "ml_run_history",                # driver fast-path (rows-only)
    # (c) staleness re-checks: latest driver row is r1 (3 rounds old),
    # oracle-backed only (rows-only re-checks are the weakest signal —
    # dedup_minhash/simhash, similarity_lsh/ivf, ml_fraud/metrics and
    # curation_funnel_report stay pytest-pinned behind the cap).
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

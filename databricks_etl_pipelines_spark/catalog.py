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
    # --- round-15 rotation, the r14 verdict's prescription: the round's
    # NEW queries first (the confidence sequence, the quantile-lift
    # rank CIs, their streaming flavor, the exposure-time HTE, the
    # BH/FDR correction), then ALL 18 remaining r8-vintage rows (this
    # empties the r8 vintage — the r14 verdict's done-criterion), then
    # the first 25 of the 50 r9-vintage rows alphabetically —
    # 7 + 18 + 25 = 50 exactly. No
    # oracle-backed query's code or oracle changed this round outside
    # the new seven (the create_or_overwrite change adds a parameter and
    # a warning on a path no registered query takes — fold commits pass
    # explicit markers and the repeated-overwrite golds never carry
    # live ones — and the stale streaming managed-table consumers are
    # already in the r8 block). The remaining 22 r9 rows lead the r16
    # overflow.
    # (a) round-15 NEW queries, newest-risk first
    "diag_variance_effect",
    "diag_rank_sum_test",
    "diag_confidence_sequence",
    "streaming_confidence_sequence",
    "diag_quantile_lift_ci",
    "diag_hte_by_exposure",
    "diag_fdr_adjusted",
    # (b) ALL 18 remaining r8-vintage rows (newest driver evidence r8)
    "streaming_sliding_window",
    "streaming_stream_static_join",
    "streaming_stream_stream_join",
    "streaming_tumbling_hourly",
    "text_bm25_incremental",
    "text_bm25_indexed",
    "text_bm25_topk",
    "text_rbo_rankings",
    "text_token_stats",
    "text_unigram_doc_stats",
    "text_unigram_em_pruned",
    "text_unigram_em_segment",
    "text_unigram_segment",
    "window_cohort_retention",
    "window_event_transitions",
    "window_funnel_ordered",
    "window_resample_forward_fill",
    "window_sessionize_events",
    # (c) 25 of the 50 r9-vintage rows (alphabetical)
    "agg_benford_first_digit",
    "agg_winsorize_zscore",
    "curation_chunk_manifest",
    "curation_dsir_budget_select",
    "curation_dsir_weights",
    "curation_length_buckets",
    "curation_mixture_epoch_plan",
    "curation_pack_concat_chunks",
    "curation_source_divergence",
    "dedup_duplicate_spans",
    "dedup_passages",
    "dedup_semdedup_crossengine",
    "dedup_simhash_crossengine",
    "diag_column_profile",
    "diag_join_key_skew",
    "dim_scd2_history",
    "embedding_centroid_per_label",
    "embedding_int8_quantization",
    "join_disjunctive_predicates",
    "join_fuzzy_name_match",
    "join_interval_overlap",
    "join_local_supplier_volume",
    "join_priority_class_counts",
    "join_shipping_priority_topk",
    "join_small_lot_revenue",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the 25 remaining r9-vintage rows lead (stalest after
    # this rotation — they head the r16 cap), then everything fresher
    # in registration order; the rows-only set stays at the end (weaker
    # rows by design — each has an oracle-backed sibling; see
    # COVERAGE.md rows-only map).
    "multimodal_decode_image_stats",
    "multimodal_downsample_stats",
    "privacy_document_scrub",
    "privacy_gdpr_erase_users",
    "privacy_t_closeness_audit",
    "scalar_variant_json",
    "sft_turn_offsets",
    "similarity_batch_topk",
    "similarity_chunk_retrieval",
    "similarity_ivf_crossengine",
    "similarity_pq_adc_crossengine",
    "similarity_rrf_fusion",
    "similarity_text_hash_topk",
    "source_python_datasource",
    "source_python_stream_datasource",
    "sql_avg_yearly_revenue",
    "streaming_corpus_drift",
    "streaming_dsir_scores",
    "text_augment_dropout",
    "text_hash_embeddings",
    "text_lm_surprisal",
    "text_repetition_signals",
    "text_sliding_chunks",
    "window_attribution_linear",
    "window_ema_smoothing",]


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

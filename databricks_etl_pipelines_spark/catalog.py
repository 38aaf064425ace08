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
    # --- round-9 rotation, exactly the r8 verdict's prescription: the
    # 46 stalest oracle-backed driver rows (14 r3-latest + 32
    # r4-latest) fill the cap, the remaining 4 slots go to this round's
    # NEW queries. The r8-touched queries that also changed this round
    # (phash domain filter, containment blocked oracle, BM25 index
    # robustness, pagerank guard) hold fresh r8 rows and re-verify in
    # the full sweep; they rotate back in r10.
    # (a) round-9 NEW queries, newest-risk first
    "similarity_rrf_fusion",
    "privacy_t_closeness_audit",
    "window_ema_smoothing",
    "sql_avg_yearly_revenue",
    # (b) the 14 r3-latest rows
    "dedup_passages",
    "diag_join_key_skew",
    "embedding_centroid_per_label",
    "embedding_int8_quantization",
    "join_local_supplier_volume",
    "join_shipping_priority_topk",
    "join_small_lot_revenue",
    "multimodal_downsample_stats",
    "scalar_variant_json",
    "source_python_datasource",
    "source_python_stream_datasource",
    "text_lm_surprisal",
    "text_repetition_signals",
    "text_sliding_chunks",
    # (c) the 32 r4-latest rows
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
    "dedup_semdedup_crossengine",
    "dedup_simhash_crossengine",
    "diag_column_profile",
    "dim_scd2_history",
    "join_disjunctive_predicates",
    "join_fuzzy_name_match",
    "join_interval_overlap",
    "join_priority_class_counts",
    "multimodal_decode_image_stats",
    "privacy_document_scrub",
    "privacy_gdpr_erase_users",
    "sft_turn_offsets",
    "similarity_batch_topk",
    "similarity_chunk_retrieval",
    "similarity_ivf_crossengine",
    "similarity_pq_adc_crossengine",
    "similarity_text_hash_topk",
    "streaming_corpus_drift",
    "streaming_dsir_scores",
    "text_augment_dropout",
    "text_hash_embeddings",
    "window_attribution_linear",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the fifth r9-new query first (rotates into the cap in
    # r10 — the 46 stale rows outrank it this round per the r8
    # verdict's prescription), then the r9-touched queries with fresh
    # r8 rows (would re-row if the cap ever widens), then the r1-latest
    # rows-only set
    # (weaker rows by design — each has an oracle-backed sibling; see
    # COVERAGE.md rows-only map), then r5-fresh sentinels.
    "streaming_ema_incremental",
    "ml_feature_woe_iv",
    "agg_weighted_median_twophase",
    "multimodal_phash_neardup",
    "dedup_containment_pairs",
    "text_bm25_indexed",
    "text_bm25_incremental",
    "graph_pagerank_bipartite",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "curation_funnel_report",
    "ml_fraud_predictions",
    "ml_model_metrics",
    "similarity_ivf_topk",
    "dedup_incremental_corpus",
    "dedup_exact_documents",
    "dedup_minhash_crossengine",
    "curation_perplexity_buckets",
    "curation_temperature_epochs",
    "sft_contrastive_triplets",
    "join_blame_late_supplier",
    "join_idle_rich_customers",
    "join_min_cost_supplier",
    "text_bigram_surprisal",
    "curation_bigram_buckets",
    "streaming_perplexity_gate",]


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

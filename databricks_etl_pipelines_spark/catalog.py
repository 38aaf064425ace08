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
    # --- round-14 rotation, the r13 verdict's prescription: the round's
    # NEW queries first, then the queries whose CODE or ORACLE changed
    # this round (diag_srm_check now delegates to the shared
    # _srm_enroll_state/_srm_project pair the streaming flavor reads;
    # both 2-variant mSPRT flavors ride the _msprt_cum factoring the
    # O'Brien-Fleming monitor shares; the three r11-vintage drift
    # streams ride the changed incremental_aggregate — eager fold-name
    # validation + the create_or_overwrite fold-marker tombstone — and
    # are the stalest consumers of that infrastructure), then 31 of the
    # 49 r8-vintage rows — 13 + 6 + 31 = 50 exactly. The remaining 18
    # r8 rows lead the r15 overflow and clear next round.
    # (a) round-14 NEW queries, newest-risk first
    "diag_cox_ph_assumption",
    "diag_srm_multiarm",
    "diag_msprt_multiarm",
    "streaming_msprt_multiarm",
    "diag_obrien_fleming",
    "diag_cuped_stratified",
    "diag_km_median_ci",
    "diag_power_mde",
    "diag_hte_by_band",
    "diag_ratio_metric_delta",
    "diag_quantile_lift",
    "streaming_experiment_suite",
    "streaming_srm_check",
    # (a') changed this round (code and/or shared infrastructure)
    "diag_srm_check",
    "diag_msprt_sequential",
    "streaming_msprt_sequential",
    "streaming_ks_drift",
    "streaming_psi_drift",
    "streaming_cvm_drift",
    # (b) 31 of the 49 r8-vintage rows (newest driver evidence r8)
    "agg_bloom_filter_prune",
    "agg_countmin_words",
    "agg_theta_sketch_setops",
    "agg_value_histogram",
    "curation_contamination_ngram",
    "curation_corpus_composition",
    "curation_corpus_drift",
    "curation_curriculum_interleave",
    "curation_mixture_weights",
    "curation_shard_assignment",
    "curation_source_overlap",
    "curation_token_budget_select",
    "dedup_containment_pairs",
    "embedding_jl_projection",
    "graph_pagerank_bipartite",
    "ml_kmeans_lloyd_crossengine",
    "multimodal_phash_neardup",
    "pipeline_gold_cardholder_features",
    "pipeline_gold_hourly_volume",
    "pipeline_gold_merchant_summary",
    "privacy_k_anonymity_audit",
    "privacy_l_diversity_audit",
    "similarity_jl_recall",
    "sql_customer_distribution",
    "sql_excess_share_suppliers",
    "sql_important_parts",
    "sql_parts_supplier_count",
    "sql_text_pricing_summary",
    "sql_top_supplier_quarter",
    "streaming_bloom_dedup",
    "streaming_countmin_heavy_hitters",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the 18 remaining r8-vintage rows lead (stalest after
    # this rotation — they head the r15 cap), then everything fresher
    # in registration order; the rows-only set stays at the end (weaker
    # rows by design — each has an oracle-backed sibling; see
    # COVERAGE.md rows-only map).
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
    "window_sessionize_events",]


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

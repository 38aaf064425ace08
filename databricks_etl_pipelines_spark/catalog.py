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
    # --- round-8 rotation. r7's 50 slots all landed green, so this cap
    # leads with round-8 additions/changes, then drains the staleness
    # tail: the ONE remaining r2-latest row, then the entire r3-latest
    # oracle-backed set (window family, streaming windows, gold
    # pipeline, composition — the rows the r7 verdict named) minus fourteen
    # overflow spills.
    # (a) round-8 NEW queries, newest-risk first: aHash near-dup
    # banding, the streaming Count-Min merge, theta-sketch set algebra,
    # four SQL-text shapes (Q20/Q11/Q15/Q13), BM25 retrieval, the
    # containment near-dup join, the deterministic Bloom prune, the
    # bounded-state streaming Bloom dedup gate, and the curriculum
    # interleave schedule
    "multimodal_phash_neardup",
    "streaming_countmin_heavy_hitters",
    "agg_theta_sketch_setops",
    "sql_excess_share_suppliers",
    "sql_important_parts",
    "sql_top_supplier_quarter",
    "text_bm25_topk",
    "dedup_containment_pairs",
    "agg_bloom_filter_prune",
    "sql_customer_distribution",
    "streaming_bloom_dedup",
    "curation_curriculum_interleave",
    "text_bm25_indexed",
    "text_rbo_rankings",
    "sql_parts_supplier_count",
    "text_bm25_incremental",
    "graph_pagerank_bipartite",
    "privacy_l_diversity_audit",
    # (a') round-8 code changes: Count-Min rebuilt on the vocabulary
    # relation (both engines), the JL ratio gained a NULLIF (both
    # engines), k-means gained an init guard, the unigram helpers a
    # sentinel — every touched query re-rows this round
    "agg_countmin_words",
    "embedding_jl_projection",
    "similarity_jl_recall",
    "ml_kmeans_lloyd_crossengine",
    "text_unigram_segment",
    "text_unigram_em_segment",
    "text_unigram_em_pruned",
    "text_unigram_doc_stats",
    # (b) stalest oracle-backed evidence: the last r2-latest row
    "sql_text_pricing_summary",
    # (c) the r3-latest oracle-backed set. Verdict-named families
    # first (window analytics, streaming windows, gold pipeline,
    # composition), then the rest alphabetical-ish to the cap.
    "window_sessionize_events",
    "window_funnel_ordered",
    "window_cohort_retention",
    "window_resample_forward_fill",
    "window_event_transitions",
    "streaming_tumbling_hourly",
    "streaming_sliding_window",
    "streaming_stream_stream_join",
    "streaming_stream_static_join",
    "pipeline_gold_merchant_summary",
    "pipeline_gold_hourly_volume",
    "pipeline_gold_cardholder_features",
    "curation_corpus_composition",
    "privacy_k_anonymity_audit",
    "text_token_stats",
    "agg_value_histogram",
    "curation_contamination_ngram",
    "curation_corpus_drift",
    "curation_mixture_weights",
    "curation_shard_assignment",
    "curation_source_overlap",
    "curation_token_budget_select",
    "dedup_ngram_jaccard_pairs",
    # ---------------- 50-slot cap boundary ----------------
    # overflow: the fourteen r3 spills, then the r1-latest rows-only set
    # (weaker rows by design — each has an oracle-backed sibling that
    # IS fresh), then round-7-fresh sentinels
    "dedup_passages",
    "embedding_centroid_per_label",
    "embedding_int8_quantization",
    "join_local_supplier_volume",
    "join_shipping_priority_topk",
    "join_small_lot_revenue",
    "multimodal_downsample_stats",
    "source_python_datasource",
    "source_python_stream_datasource",
    "text_lm_surprisal",
    "text_repetition_signals",
    "text_sliding_chunks",
    "diag_join_key_skew",
    "scalar_variant_json",
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

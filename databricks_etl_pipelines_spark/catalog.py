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
    # --- round-7 rotation. r6's 50 slots all landed green, so this cap
    # leads with round-7 code changes, then drains the staleness tail
    # (every remaining r2-latest row, plus the oldest r3 rows).
    # (a) round-7 code changes / additions, newest-risk first:
    # the NEW deterministic Lloyd's k-means (integer-lattice centroid
    # updates, full iterative SQL replay — first driver row ever)
    "ml_kmeans_lloyd_crossengine",
    # the cross-engine MinHash family switched to base-hash + affine
    # permutations (Broder construction) — every query that replays the
    # family must carry a post-change row. (dedup_minhash_lsh_pairs
    # shares the banding machinery but is rows-only by design — its
    # oracle-backed sibling dedup_minhash_crossengine carries the hard
    # signal; it is pinned in the overflow tail.)
    "dedup_minhash_crossengine",
    "dedup_incremental_crossengine",
    "curation_funnel_crossengine",
    "curation_leakage_split_minhash",
    "streaming_curation_neardup_crossengine",
    # decontaminate_report rewritten to a single corpus scan
    "curation_decontaminate_benchmark",
    # reservoir stream: first-delivered-payload anti-join + per-commit
    # vacuum; KMV reads the maintained sample
    "streaming_reservoir_sample",
    "streaming_kmv_distinct",
    # word_frequencies caller the r6 verdict named, last row r3
    "text_tfidf_top_terms",
    # the NEW boilerplate-removal rewrite (clean_text compared verbatim)
    "curation_remove_boilerplate",
    # NEW round-7 session-2 additions, newest-risk first: the unigram
    # Viterbi segmenter (scalar-state recursive DP oracle), the CCNet
    # perplexity terciles, alpha=0.5 temperature epochs, contrastive
    # triplet mining, and the two TPC-H Q21/Q22 shapes
    "text_unigram_segment",
    "text_unigram_em_segment",
    "text_unigram_em_pruned",
    "text_unigram_doc_stats",
    "curation_perplexity_buckets",
    "curation_temperature_epochs",
    "sft_contrastive_triplets",
    "embedding_jl_projection",
    "similarity_jl_recall",
    "agg_countmin_words",
    "join_blame_late_supplier",
    "join_idle_rich_customers",
    "streaming_decontaminate",
    "join_min_cost_supplier",
    "text_bigram_surprisal",
    "curation_bigram_buckets",
    "streaming_perplexity_gate",
    # (b) stalest oracle-backed evidence — the ENTIRE remaining
    # r2-latest set (22 queries: scalar family, set-ops, sort/topk)
    "scalar_conditional_risk_score",
    "scalar_boolean_or_labeling",
    "scalar_array_element_at",
    "scalar_map_literal_lookup",
    "filter_predicates",
    "json_extract_events",
    "scalar_regexp_functions",
    "scalar_explode_word_counts",
    "scalar_unpivot_stack",
    "scalar_collection_functions",
    "scalar_from_json_struct",
    "scalar_conditional_bucketing",
    "topk_orders_by_price",
    "sort_multikey",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except_subtract",
    "setop_except_all",
    "setop_intersect_all",
    "distinct_projection",
    # (c) oldest r3-latest rows to the 50-slot boundary: dedup exact/
    # jaccard/passages, the streaming window family, the window
    # analytics family, gold pipeline, composition/privacy/token stats
    "dedup_exact_documents",
    # ---------------- 50-slot cap boundary ----------------
    "dedup_ngram_jaccard_pairs",
    "dedup_passages",
    "streaming_tumbling_hourly",
    "streaming_sliding_window",
    "streaming_stream_stream_join",
    "streaming_stream_static_join",
    "window_sessionize_events",
    "window_funnel_ordered",
    "window_cohort_retention",
    "window_resample_forward_fill",
    "window_event_transitions",
    # overflow: the rest of the r3-latest set for overflow runs, then
    # the rows-only siblings of round-7-touched machinery (they only
    # get weaker rows anyway)
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
    "dedup_minhash_lsh_pairs",
    "dedup_incremental_corpus",
    "dedup_simhash_pairs",]


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

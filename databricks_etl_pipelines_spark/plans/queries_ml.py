"""ML-lifecycle queries (SURVEY §2.11 / §7 M9): feature export, model
train/compare, distributed batch scoring over the TPC-H entity features.

Non-SQL-expressible (iterative tree ensembles), so these are rows-only
checks per the driver contract — no ``oracle_sql`` entries. The label and
feature matrix themselves ARE oracle-checked upstream via
``agg_entity_features`` (queries_aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.ml.fraud import (
    batch_score,
    ensure_two_classes,
    feature_matrix,
    stratified_split,
    train_compare,
)
from databricks_etl_pipelines_spark.ml.runlog import RunLog
from databricks_etl_pipelines_spark.plans.queries_aggregates import (
    _FEATURES_ORACLE,
    agg_entity_features,
)
from databricks_etl_pipelines_spark.sources.scratch import scratch_dir

FEATURE_COLS = [
    "order_count", "total_spend", "avg_order_value", "stddev_order_value",
    "min_order_value", "max_order_value", "status_diversity",
    "priority_diversity", "active_days", "fulfilled_count", "urgent_count",
    "jumbo_count", "fulfilled_spend", "urgent_ratio", "coeff_variation",
]


def _matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = agg_entity_features(spark, sf_dir)
    mat = feature_matrix(
        feats, FEATURE_COLS, label_col="is_suspicious", id_col="o_custkey"
    )
    return ensure_two_classes(mat, fallback_col="avg_order_value")


# Training is deterministic (seeded classifiers, hash-based split), so the
# fitted models for a given sf_dir are a pure function of the data: memoize
# per-process so the predictions query and the metrics query don't each
# refit both classifiers.
_TRAIN_CACHE: dict[str, tuple] = {}


def _trained(spark: SparkSession, sf_dir: str):
    if sf_dir not in _TRAIN_CACHE:
        import os

        # These queries verify the LIFECYCLE (train→log→champion→score),
        # not the fitted metric values — rows-only in the driver by design —
        # so default to the small ensembles and keep a driver slot cheap.
        # SPARK_GRAFT_FULL_ML=1 restores the reference-parity fit sizes
        # (maxIter=20 / numTrees=100); the parity pytest calls
        # train_compare directly and always fits full-size.
        fast = os.environ.get("SPARK_GRAFT_FULL_ML") != "1"
        mat = _matrix(spark, sf_dir)
        if fast:
            # The per-entity matrix is tiny relative to the cluster (one row
            # per customer); tree fits launch a job per iteration, so 32
            # near-empty partitions are pure scheduling overhead. Shape the
            # fit input to a few partitions in the fast path only.
            mat = mat.coalesce(1)
        mat = mat.cache()
        train, test = stratified_split(mat, id_col="o_custkey")
        run_log = RunLog(scratch_dir("ml_runs_"))
        best, models, metrics = train_compare(
            train, test, FEATURE_COLS, run_log=run_log, fast=fast
        )
        mat.unpersist()
        _TRAIN_CACHE[sf_dir] = (best, models, metrics, run_log)
    return _TRAIN_CACHE[sf_dir]


# M1 is relational (casts + null-drop over the oracled feature table), so
# unlike the learned-model queries it gets a FULL oracle: wrap the entity-
# features SQL with the same double casts and the dropna predicate.
# (ensure_two_classes is a no-op whenever both label classes exist, which
# holds on this data at every sf; the oracle asserts exactly that shape.)
_MATRIX_CASTS = ",\n  ".join(
    f"CAST({c} AS DOUBLE) AS {c}" for c in FEATURE_COLS
)
_MATRIX_NOT_NULL = " AND ".join(f"{c} IS NOT NULL" for c in FEATURE_COLS)
_MATRIX_ORACLE = f"""
WITH base AS ({_FEATURES_ORACLE})
SELECT o_custkey,
  {_MATRIX_CASTS},
  CAST(is_suspicious AS DOUBLE) AS label
FROM base
WHERE {_MATRIX_NOT_NULL}
"""


@query("ml_feature_matrix", _MATRIX_ORACLE)
def ml_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: the model-ready matrix (id + 15 double features + label)."""
    return _matrix(spark, sf_dir)


@query("ml_fraud_predictions")
def ml_fraud_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M7 end to end: split, train GBT + RF, pick champion by F1, score
    the FULL entity population distributed (04:302-325 equivalent)."""
    best, models, _, _ = _trained(spark, sf_dir)
    return batch_score(models[best], _matrix(spark, sf_dir), id_col="o_custkey")


@query("ml_run_history")
def ml_run_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLflow tracking/registry analog (04:131-193, 253-289): one row per
    logged training run with params/metrics JSON and a champion flag from
    the registry pointer (rows-only: learned metric values)."""
    _, _, _, run_log = _trained(spark, sf_dir)
    champ = run_log.champion()
    champ_id = champ["run_id"] if champ else None
    return run_log.runs(spark).select(
        "run_id", "model", "params", "metrics",
        (F.col("run_id") == F.lit(champ_id)).alias("is_champion"),
    )


@query("ml_model_metrics")
def ml_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5+M6: per-model held-out metrics with the F1 champion flagged."""
    best, _, metrics, _ = _trained(spark, sf_dir)
    rows = [
        (name, m["accuracy"], m["precision"], m["recall"], m["f1"], m["auc"],
         name == best)
        for name, m in sorted(metrics.items())
    ]
    return spark.createDataFrame(
        rows, "model string, accuracy double, precision double, "
        "recall double, f1 double, auc double, is_best boolean",
    ).orderBy(F.desc("f1"))


@query("ml_quality_classifier")
def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus quality filtering (ml/quality.py): hashed-BoW +
    LogisticRegression trained on the rubric's weak labels, then the
    whole documents table scored distributed. Rows-only (learned
    probabilities); the training-free pieces are oracle-checked elsewhere
    (the rubric via curation/text queries, the corpus itself everywhere)."""
    from databricks_etl_pipelines_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )
    from databricks_etl_pipelines_spark.sources import table

    docs = table(spark, sf_dir, "documents")
    model = train_quality_classifier(docs)
    return score_quality(model, docs)


# -- deterministic PageRank (graph analytics under a hard oracle) -------------

_PR_ITERS = 3
_PR_SCALE_BITS = 20
_PR_S = 1 << _PR_SCALE_BITS
_PR_DAMP = 85
_PR_BASE = ((100 - _PR_DAMP) * _PR_S) // 100


def _pr_iter_sql(prev: str, cur: str) -> str:
    return f""",
{cur} AS MATERIALIZED (
  SELECT n.node,
    CAST({_PR_BASE} + coalesce(s.in_sum, 0) AS BIGINT) AS r_int
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
      CAST(sum(({_PR_DAMP} * r.r_int) // (100 * d.deg)) AS BIGINT)
        AS in_sum
    FROM edges e
    JOIN {prev} r ON r.node = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""


_PAGERANK_ORACLE = f"""
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey * 2 AS c_node,
                  l.l_suppkey * 2 + 1 AS s_node
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS MATERIALIZED (
  SELECT c_node AS src, s_node AS dst FROM pairs
  UNION ALL
  SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
r0 AS (SELECT node, CAST({_PR_S} AS BIGINT) AS r_int FROM nodes)
{"".join(_pr_iter_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS))}
SELECT node,
  CAST(node % 2 AS BIGINT) AS is_supplier,
  r_int,
  CAST(r_int AS DOUBLE) / {_PR_S} AS rank
FROM r{_PR_ITERS}
"""


@query("graph_pagerank_bipartite", _PAGERANK_ORACLE)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier purchase graph (who buys
    from whom, via orders⋈lineitem; symmetric edges, disjoint node ids
    c·2 / s·2+1) — power iteration made cross-engine EXACT by the
    integer-lattice discipline (operators/components.py::
    pagerank_deterministic): ranks are BIGINTs on the 2^-20 lattice,
    every edge contribution is one exact integer division, so all
    three iterations replay bit-identically in an unrolled CTE chain —
    the graph-analytics sibling of the k-means hard oracle (iterative
    float algorithms become replayable when the cross-row arithmetic
    is integer). The float ``rank`` readout is an exact power-of-two
    division — identical bits on both engines, no rounding needed.

    Scale shape per iteration: one shuffle join of ranks onto edges +
    one map-side-combined integer sum — the standard Pregel-free
    DataFrame PageRank, constant plan size per round."""
    from databricks_etl_pipelines_spark.operators.components import (
        pagerank_deterministic,
    )
    from databricks_etl_pipelines_spark.sources import table

    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("s_node").alias("src"), F.col("c_node").alias("dst")
        )
    )
    pr = pagerank_deterministic(
        edges, iters=_PR_ITERS, scale_bits=_PR_SCALE_BITS,
        damping_pct=_PR_DAMP,
    )
    return pr.select(
        "node",
        (F.col("node") % 2).alias("is_supplier"),
        "r_int",
        "rank",
    )


# -- supervised feature binning: WOE / Information Value ----------------------

# Weight-of-evidence credit-scoring discipline (Siddiqi, "Credit Risk
# Scorecards"): per fixed-width feature bucket, WOE = ln(smoothed event
# share / smoothed non-event share) and IV = Σ (share diff) · WOE — the
# standard supervised pre-screen for which features carry signal before
# any estimator trains. Determinism: all counts are exact integers; the
# four shares are single divisions of exact values; the ln() is the one
# libm-sensitive op and is absorbed by round-6 exactly like tfidf/BM25;
# +0.5 Laplace smoothing keeps empty-side buckets finite on both
# engines identically. Int64/double headroom: count ratios stay exact
# in doubles up to 2^53 rows per class — any real corpus.
_WOE_BUCKET = 10000

_WOE_ORACLE = f"""
WITH l AS (
  SELECT CAST(floor(l_extendedprice / {_WOE_BUCKET}) AS BIGINT) AS bucket,
    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
b AS (
  SELECT bucket,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS n_event
  FROM l GROUP BY bucket
),
t AS (
  SELECT CAST(sum(n_event) AS BIGINT) AS pos_tot,
    CAST(sum(n - n_event) AS BIGINT) AS neg_tot
  FROM b
),
w AS (
  SELECT bucket, n, n_event, (n - n_event) AS n_nonevent,
    ln(((n_event + CAST(0.5 AS DOUBLE)) / (pos_tot + CAST(0.5 AS DOUBLE)))
       / ((n - n_event + CAST(0.5 AS DOUBLE))
          / (neg_tot + CAST(0.5 AS DOUBLE)))) AS woe_raw,
    (CAST(n_event AS DOUBLE) / NULLIF(pos_tot, 0)
     - CAST(n - n_event AS DOUBLE) / NULLIF(neg_tot, 0)) AS share_diff
  FROM b, t
)
SELECT bucket, n, n_event, n_nonevent,
  floor(woe_raw * 1000000 + 0.5) / 1000000 AS woe,
  floor(share_diff * woe_raw * 1000000 + 0.5) / 1000000 AS iv_contrib
FROM w
"""


@query("ml_feature_woe_iv", _WOE_ORACLE)
def ml_feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / Information-Value feature binning for the
    return-risk label (l_returnflag = 'R') over fixed-width price
    buckets — the supervised feature pre-screen that ranks candidate
    features by IV = Σ iv_contrib before any estimator trains, and the
    binning that scorecard models consume directly. Laplace-smoothed
    (+0.5) so single-class buckets stay finite.

    Scale shape: ONE hash aggregate of the fact table to (bucket,
    count, event_count) — ~11 rows here, bounded by range/width — then
    a broadcast of the two class totals; every share, WOE, and IV term
    is computed on that bounded relation. The per-class totals derive
    from the SAME aggregate (no second fact scan)."""
    from databricks_etl_pipelines_spark.functions.numeric import (
        stable_round,
    )
    from databricks_etl_pipelines_spark.sources import table

    li = table(spark, sf_dir, "lineitem")
    b = (
        li.select(
            F.floor(F.col("l_extendedprice") / _WOE_BUCKET)
            .cast("long")
            .alias("bucket"),
            (F.col("l_returnflag") == "R").cast("long").alias("y"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("y").alias("n_event"))
    )
    t = b.agg(
        F.sum("n_event").alias("pos_tot"),
        F.sum(F.col("n") - F.col("n_event")).alias("neg_tot"),
    )
    w = b.crossJoin(F.broadcast(t))
    woe_raw = F.log(
        (
            (F.col("n_event") + F.lit(0.5))
            / (F.col("pos_tot") + F.lit(0.5))
        )
        / (
            (F.col("n") - F.col("n_event") + F.lit(0.5))
            / (F.col("neg_tot") + F.lit(0.5))
        )
    )
    # NULLIF on the RAW class totals (the +0.5-smoothed WOE denominators
    # can never be zero, but these two are): on a degenerate single-class
    # corpus both engines then agree on NULL shares instead of diverging
    # on double division-by-zero semantics (t-closeness precedent)
    share_diff = F.col("n_event").cast("double") / F.nullif(
        F.col("pos_tot"), F.lit(0)
    ) - (F.col("n") - F.col("n_event")).cast("double") / F.nullif(
        F.col("neg_tot"), F.lit(0)
    )
    return w.select(
        "bucket",
        "n",
        "n_event",
        (F.col("n") - F.col("n_event")).alias("n_nonevent"),
        stable_round(woe_raw, 6).alias("woe"),
        stable_round(share_diff * woe_raw, 6).alias("iv_contrib"),
    )

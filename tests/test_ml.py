"""M9 ML tail: feature matrix, split, train/compare, distributed scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.ml.fraud import (
    LABEL_COL,
    ensure_two_classes,
    feature_matrix,
    stratified_split,
)
from databricks_etl_pipelines_spark.plans.queries_ml import (
    FEATURE_COLS,
    _matrix,
    ml_fraud_predictions,
    ml_model_metrics,
)


def test_feature_matrix_shape_and_types(spark, sf_dir):
    mat = _matrix(spark, sf_dir)
    assert set(mat.columns) == {"o_custkey", LABEL_COL, *FEATURE_COLS}
    for c in FEATURE_COLS:
        assert dict(mat.dtypes)[c] == "double"
    # dropna really dropped: no null features remain
    nulls = mat.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in FEATURE_COLS]
    ).first()
    assert all(v == 0 for v in nulls.asDict().values())


def test_stratified_split_deterministic_and_disjoint(spark, sf_dir):
    mat = _matrix(spark, sf_dir)
    tr1, te1 = stratified_split(mat, id_col="o_custkey")
    tr2, te2 = stratified_split(mat.repartition(7), id_col="o_custkey")
    # deterministic across partitionings (hash-based, not Bernoulli)
    assert sorted(r.o_custkey for r in te1.select("o_custkey").collect()) == \
        sorted(r.o_custkey for r in te2.select("o_custkey").collect())
    assert tr1.count() + te1.count() == mat.count()
    overlap = tr1.select("o_custkey").intersect(te1.select("o_custkey"))
    assert overlap.count() == 0


def test_single_class_fallback_median_split(spark, sf_dir):
    feats = _matrix(spark, sf_dir).withColumn(LABEL_COL, F.lit(0.0))
    relabeled = ensure_two_classes(feats, fallback_col="avg_order_value")
    classes = {r[LABEL_COL] for r in relabeled.select(LABEL_COL).distinct().collect()}
    assert classes == {0.0, 1.0}


def test_fraud_predictions_full_population(spark, sf_dir):
    mat = _matrix(spark, sf_dir)
    preds = ml_fraud_predictions(spark, sf_dir)
    assert preds.count() == mat.count()
    bad_prob = preds.filter(
        (F.col("fraud_probability") < 0) | (F.col("fraud_probability") > 1)
    ).count()
    assert bad_prob == 0
    assert set(preds.columns) == {
        "o_custkey", "is_suspicious", "fraud_prediction", "fraud_probability"
    }


def test_model_metrics_champion_by_f1(spark, sf_dir):
    rows = ml_model_metrics(spark, sf_dir).collect()
    assert {r.model for r in rows} == {"gradient_boosting", "random_forest"}
    for r in rows:
        for m in ("accuracy", "precision", "recall", "f1", "auc"):
            assert 0.0 <= r[m] <= 1.0
    best = max(rows, key=lambda r: r.f1)
    assert best.is_best


def test_run_log_tracks_and_registers_champion(spark, sf_dir, tmp_path):
    """MLflow analog: training with a RunLog persists one run per contender
    (params + 5 metrics + model artifact), registers the F1 champion, and
    the champion model loads back and scores."""
    import json

    from databricks_etl_pipelines_spark.ml.fraud import (
        batch_score,
        stratified_split,
        train_compare,
    )
    from databricks_etl_pipelines_spark.ml.runlog import RunLog

    mat = _matrix(spark, sf_dir).cache()
    train, test = stratified_split(mat, id_col="o_custkey")
    log = RunLog(str(tmp_path / "runs"))
    best, models, metrics = train_compare(
        train, test, FEATURE_COLS, run_log=log
    )

    runs = {r.model: r for r in log.runs(spark).collect()}
    assert set(runs) == {"gradient_boosting", "random_forest"}
    for name, r in runs.items():
        logged = json.loads(r.metrics)
        assert logged == metrics[name]
        assert set(logged) == {"accuracy", "precision", "recall", "f1", "auc"}
        assert json.loads(r.params)["seed"] == 42
        assert r.model_path  # artifact saved

    champ = log.champion()
    assert champ is not None and champ["model"] == best
    # registry round-trip: reload the champion artifact and score with it
    reloaded = log.load_champion_model()
    preds = batch_score(reloaded, mat, id_col="o_custkey")
    assert preds.count() == mat.count()
    mat.unpersist()


def test_ml_run_history_query(spark, sf_dir):
    from databricks_etl_pipelines_spark.plans.queries_ml import ml_run_history

    rows = ml_run_history(spark, sf_dir).collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if r.is_champion) == 1


def test_generator_cardholders_end_to_end(spark):
    """Reference-parity path: generator silver → 10 cardholder features →
    train/score (README.md:26,29 — 10 features rows, 10 prediction rows)."""
    from databricks_etl_pipelines_spark.ml.fraud import batch_score, train_compare
    from databricks_etl_pipelines_spark.plans.medallion import (
        gold_cardholder_features,
        silver_transform,
    )
    from databricks_etl_pipelines_spark.sources.generator import batch_transactions

    silver, _ = silver_transform(batch_transactions(spark, 5000))
    feats = gold_cardholder_features(silver)
    cols = [
        "txn_count", "total_spend", "avg_amount", "stddev_amount",
        "min_amount", "max_amount", "unique_merchants", "online_ratio",
        "intl_ratio", "avg_risk_score", "max_risk_score",
    ]
    mat = feature_matrix(
        feats, cols, label_col="is_suspicious", id_col="cardholder_token"
    )
    mat = ensure_two_classes(mat, fallback_col="avg_risk_score").cache()
    n = mat.count()
    assert n == 10  # 10-name × 10-name pools collapse to 10 tokens
    # tiny data: train on all, score all (the reference's own scale)
    best, models, metrics = train_compare(mat, mat, cols)
    preds = batch_score(models[best], mat, id_col="cardholder_token")
    assert preds.count() == n
    assert metrics[best]["f1"] >= 0.0


def test_quality_classifier_separates_planted_docs(spark):
    """The weak-label LR must rank an obviously clean planted doc above an
    obviously junky one, and scoring must be deterministic across refits
    (stateless featurizer + deterministic LBFGS fit)."""
    from databricks_etl_pipelines_spark.ml.quality import (
        score_quality,
        train_quality_classifier,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and that is a fine "
        "thing to see in the morning is it not a good day. " * 4
    )
    junk = "@@@@ 1234 5678 !!!! ???? %%%% " * 3
    rows = [(i, good.replace("fox", w), "en", "web", 1)
            for i, w in enumerate(["fox", "cat", "owl", "elk", "hen"])]
    rows += [(100 + i, junk + str(i) * 7, "en", "web", 1) for i in range(5)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    model = train_quality_classifier(docs, threshold=90)
    scored = {r.doc_id: r for r in score_quality(model, docs).collect()}
    good_p = min(scored[i].p_high_quality for i in range(5))
    junk_p = max(scored[100 + i].p_high_quality for i in range(5))
    assert good_p > junk_p
    assert all(scored[i].weak_label == 1 for i in range(5))
    assert all(scored[100 + i].weak_label == 0 for i in range(5))

    refit = train_quality_classifier(docs, threshold=90)
    again = {r.doc_id: r.p_high_quality
             for r in score_quality(refit, docs).collect()}
    assert again == {d: r.p_high_quality for d, r in scored.items()}


def test_woe_iv_accounting_and_signal_direction(spark, sf_dir):
    """WOE/IV internal consistency at sf0.01: bucket counts partition
    the fact table, event counts partition the positive class, WOE sign
    agrees with the share-difference sign away from the smoothing
    epsilon, and the feature carries positive total IV (price buckets
    do separate returns from non-returns in this data — a dead feature
    would score ~0)."""
    from databricks_etl_pipelines_spark.catalog import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["ml_feature_woe_iv"](spark, sf).collect()
    n_total = spark.read.parquet(f"{sf}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == n_total
    pos_tot = sum(r.n_event for r in rows)
    assert 0 < pos_tot < n_total
    for r in rows:
        assert r.n_event + r.n_nonevent == r.n
        if abs(r.woe) > 1e-3:  # outside smoothing-epsilon territory
            share_diff = r.n_event / pos_tot - r.n_nonevent / (
                n_total - pos_tot
            )
            assert (r.woe > 0) == (share_diff > 0)
    assert sum(r.iv_contrib for r in rows) > 0

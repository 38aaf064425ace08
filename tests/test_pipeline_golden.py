"""Golden end-to-end medallion pipeline test (SURVEY §5 item 2).

Mirrors the reference README's pipeline-summary row counts
(README.md:20-31) with our deterministic generator: exact layer counts,
quarantine split, 10 cardholders / 500 merchants (same cardinalities the
reference reports), and MERGE replay idempotence.
"""

from __future__ import annotations

import pytest

from databricks_etl_pipelines_spark.plans.medallion import MedallionPipeline
from databricks_etl_pipelines_spark.sources.generator import (
    P_BAD_AMOUNT,
    P_BAD_MCC,
    P_NULL_ID,
    P_SHORT_CARD,
    batch_transactions,
)

N = 5000


def expected_quarantine(n: int) -> int:
    bad = set()
    for p in (P_NULL_ID, P_BAD_AMOUNT, P_SHORT_CARD, P_BAD_MCC):
        bad.update(range(0, n, p))
    return len(bad)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("medallion"))
    p = MedallionPipeline(spark, root)
    p.ingest_bronze(batch_transactions(spark, N, stamps=True))
    return p


def test_bronze_counts(spark, pipeline):
    assert pipeline.bronze.read(spark).count() == N


def test_silver_split_and_merge(spark, pipeline):
    counts = pipeline.run_silver()
    q = expected_quarantine(N)
    assert counts["quarantined"] == q
    assert counts["silver"] == N - q
    # silver schema: PII gone, enrichment present
    cols = set(pipeline.silver.read(spark).columns)
    assert "card_number" not in cols and "cardholder_name" not in cols
    assert {
        "card_number_masked",
        "cardholder_token",
        "mcc_category",
        "amount_bucket",
        "risk_score_raw",
    } <= cols


def test_silver_replay_idempotent(spark, pipeline):
    before = pipeline.silver.read(spark).count()
    counts = pipeline.run_silver()  # replay the same batch
    assert counts["silver"] == before
    # history shows both merges
    ops = [r.operation for r in pipeline.silver.history(spark).collect()]
    assert ops.count("merge") >= 1


def test_gold_cardinalities(spark, pipeline):
    counts = pipeline.run_gold()
    # name pools give exactly 10 distinct cardholders; brand×number gives 500
    # merchants (same cardinalities as the reference README)
    assert counts["features"] == 10
    merchants = (
        pipeline.gold_merchant.read(spark)
        .select("merchant_name")
        .distinct()
        .count()
    )
    assert merchants == 500
    assert counts["hourly"] > 0


def test_time_travel(spark, pipeline):
    v0 = pipeline.silver.read(spark, version=0).count()
    latest = pipeline.silver.read(spark).count()
    assert v0 == latest  # replays were idempotent, so every version agrees

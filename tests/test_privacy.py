"""Property tests for the PII operators (SURVEY §5 item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.functions.privacy import (
    mask_card_number,
    tokenize_pii,
)

NAMES = [
    "Ada Lovelace",
    "  ada lovelace ",
    "ADA LOVELACE",
    "Grace Hopper",
    "张伟",
    "José Núñez",
    "a",
    "name with   many   spaces",
]


def test_mask_preserves_last4_and_format(spark):
    df = spark.createDataFrame(
        [(f"4{str(i) * 15}"[:16],) for i in range(1, 8)], "card string"
    )
    rows = df.select(
        "card", mask_card_number("card").alias("masked")
    ).collect()
    for r in rows:
        assert r.masked == f"****-****-****-{r.card[-4:]}"
        assert len(r.masked) == 19


def test_tokenize_deterministic_and_normalizing(spark):
    df = spark.createDataFrame([(n,) for n in NAMES], "name string")
    rows = df.select(
        "name", tokenize_pii("name").alias("tok")
    ).collect()
    toks = {r.name: r.tok for r in rows}
    # case/whitespace-insensitive: the three Ada spellings collide
    assert toks["Ada Lovelace"] == toks["  ada lovelace "] == toks["ADA LOVELACE"]
    # distinct people don't collide
    others = [toks[n] for n in NAMES[3:]]
    assert len(set(others)) == len(others)
    # stable across evaluations
    again = {r.name: r.tok for r in df.select("name", tokenize_pii("name").alias("tok")).collect()}
    assert toks == again
    # 64 hex chars (sha2-256)
    assert all(len(t) == 64 for t in toks.values())


def test_raw_pii_never_survives_masking(spark):
    from databricks_etl_pipelines_spark.plans.medallion import mask_pii
    from databricks_etl_pipelines_spark.sources.generator import batch_transactions

    silver = mask_pii(batch_transactions(spark, 100))
    assert "card_number" not in silver.columns
    assert "cardholder_name" not in silver.columns
    # masked form never leaks more than last 4
    bad = silver.filter(~F.col("card_number_masked").rlike(r"^\*{4}-\*{4}-\*{4}-")).count()
    assert bad == 0

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


def test_document_scrub_removes_all_planted_pii(spark):
    """Every planted email/phone is found, counted, and redacted; no raw
    PII substring survives in the scrubbed text."""
    from databricks_etl_pipelines_spark.functions.privacy import (
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
        pii_match_count,
        scrub_text_pii,
    )

    rows = [
        (1, "reach me at jo.doe+x@sub.example.org today"),
        (2, "call 415-555-0133 or 650-555-0199 now"),
        (3, "mixed a@b.io and 111-222-3333 here"),
        (4, "no pii at all in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            pii_match_count("text", PII_EMAIL_PATTERN).alias("e"),
            pii_match_count("text", PII_PHONE_PATTERN).alias("p"),
            scrub_text_pii("text").alias("s"),
        ).collect()
    }
    assert (out[1].e, out[1].p) == (1, 0)
    assert (out[2].e, out[2].p) == (0, 2)
    assert (out[3].e, out[3].p) == (1, 1)
    assert (out[4].e, out[4].p) == (0, 0)
    assert out[1].s == "reach me at [EMAIL] today"
    assert out[2].s == "call [PHONE] or [PHONE] now"
    assert out[3].s == "mixed [EMAIL] and [PHONE] here"
    assert out[4].s == "no pii at all in this one"
    for r in out.values():
        assert "@" not in r.s.replace("[EMAIL]", "")

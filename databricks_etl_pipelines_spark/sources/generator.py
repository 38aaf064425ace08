"""Deterministic synthetic transaction feed (batch + streaming).

Capability parity with the reference's rate-source generator
(01_Bronze_FinServ_Streaming.py:78-155): an unbounded (timestamp, value)
pair enriched into a ~20-column transaction record by pure column
arithmetic — value-derived pseudo-randomness, no rand(), so every row is
reproducible from its sequence number. Pools, constants, and formulas here
are this engine's own.

Batch mode runs the identical column chain over ``spark.range`` — the
"same code streams or batches" property the reference gets from
availableNow triggers, we get by sharing the expression builder.

DQ edge rows: the reference's quarantine rules are never actually hit by
its generator; ours deliberately emits invalid rows on prime-indexed
sequence numbers so the silver validation path is exercised for real.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.functions.enrich import array_pick
from databricks_etl_pipelines_spark.functions.numeric import stable_round

BASE_EPOCH = 1_704_067_200  # 2024-01-01T00:00:00Z

FIRST_NAMES = (
    "Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Margaret",
    "John", "Katherine", "Dennis",
)
LAST_NAMES = (
    "Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth",
    "Hamilton", "Backus", "Johnson", "Ritchie",
)
# ISO-18245 merchant category codes (public standard)
MCC_CODES = (
    "5411", "5812", "5541", "5912", "4111", "5999", "6011", "4829",
    "7995", "5967",
)
MCC_CATEGORIES = {
    "5411": "grocery",
    "5812": "dining",
    "5541": "fuel",
    "5912": "pharmacy",
    "4111": "transit",
    "5999": "retail",
    "6011": "cash",
    "4829": "wire_transfer",
    "7995": "gambling",
    "5967": "direct_marketing",
}
HIGH_RISK_MCC = ("6011", "4829", "7995")
BRANDS = (
    "Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Wonka",
    "Tyrell", "Cyberdyne", "Aperture", "BlueSun", "Hooli", "Sirius",
    "Vandelay", "Oscorp", "Dunder", "Gringotts", "Monarch", "Nakatomi",
    "Zorg",
)
STATES = (
    "CA", "NY", "TX", "FL", "WA", "IL", "MA", "GA", "NC", "PA", "OH",
    "MI", "AZ", "CO", "OR", "VA", "NJ", "MN", "TN", "MO",
)
CURRENCIES = ("USD", "USD", "USD", "USD", "EUR", "GBP")
NETWORKS = ("VISA", "MASTERCARD", "AMEX", "DISCOVER")
CARD_TYPES = ("CREDIT", "DEBIT", "PREPAID")

# prime-indexed DQ fault injection
P_NULL_ID = 997
P_BAD_AMOUNT = 991
P_SHORT_CARD = 983
P_BAD_MCC = 977


def transaction_columns(value: Column, ts: Column) -> dict[str, Column]:
    """The full enrichment chain as named Column expressions."""
    amount = stable_round(F.abs(F.sin(value * 0.37)) * 480 + 2.25, 2)
    card_number = F.concat(
        F.lit("4"),
        F.lpad(((value * 7919 + 12345) % 999999999999999).cast("string"), 15, "0"),
    )
    cols: dict[str, Column] = {
        "transaction_id": F.when(value % P_NULL_ID == 0, F.lit(None)).otherwise(
            F.concat(
                F.lit("TXN-"),
                F.date_format(ts, "yyyyMMdd"),
                F.lit("-"),
                F.lpad(value.cast("string"), 10, "0"),
            )
        ),
        "card_number": F.when(
            value % P_SHORT_CARD == 0, F.substring(card_number, 1, 12)
        ).otherwise(card_number),
        "cardholder_name": F.concat(
            array_pick(FIRST_NAMES, value * 13),
            F.lit(" "),
            array_pick(LAST_NAMES, value * 17 + 3),
        ),
        "amount": F.when(value % P_BAD_AMOUNT == 0, F.lit(-5.0)).otherwise(amount),
        "currency": array_pick(CURRENCIES, value * 7),
        "mcc_code": F.when(value % P_BAD_MCC == 0, F.lit("0000")).otherwise(
            array_pick(MCC_CODES, value * 11)
        ),
        # brand keys off value mod 20, number off (value div 20) mod 25 —
        # independent cycles, so all 20×25 = 500 merchants occur
        "merchant_name": F.concat(
            array_pick(BRANDS, value * 3 + 1),
            F.lit(" #"),
            (F.floor(value / 20) % 25 + 1).cast("string"),
        ),
        "merchant_state": array_pick(STATES, value * 5 + 2),
        "merchant_country": F.lit("US"),
        "card_network": array_pick(NETWORKS, value),
        "card_type": array_pick(CARD_TYPES, value),
        "auth_code": F.lpad((value * 127 % 999999).cast("string"), 6, "0"),
        "is_online": value % 5 == 0,
        "is_international": value % 25 == 0,
        "velocity_flag": value % 40 == 0,
        "amount_anomaly_flag": amount > 420,
        "event_timestamp": ts,
    }
    return cols


def _apply(df: DataFrame, value: Column, ts: Column, stamps: bool) -> DataFrame:
    cols = transaction_columns(value, ts)
    out = df.select([expr.alias(name) for name, expr in cols.items()])
    if stamps:
        out = out.withColumn("ingestion_timestamp", F.current_timestamp()).withColumn(
            "ingestion_date", F.current_date()
        )
    return out


def batch_transactions(
    spark: SparkSession, n_rows: int, stamps: bool = False
) -> DataFrame:
    """Deterministic bounded feed: sequence numbers 0..n-1, 1 txn/second
    starting at BASE_EPOCH."""
    base = spark.range(n_rows)
    value = F.col("id")
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + value)
    return _apply(base, value, ts, stamps)


def stream_transactions(
    spark: SparkSession, rows_per_second: int = 200, stamps: bool = True
) -> DataFrame:
    """Unbounded feed from the rate source (S1) — same column chain."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return _apply(base, F.col("value"), F.col("timestamp"), stamps)

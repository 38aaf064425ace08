"""Oracle-checked medallion pipeline queries.

The generator (sources/generator.py) is fully value-deterministic, so the
ENTIRE batch pipeline — generate → validate/quarantine → mask/tokenize →
enrich → gold aggregates — can be mirrored in DuckDB SQL over ``range(n)``
and differentially verified cell-by-cell. The SQL below is built
programmatically from the same pool constants the Spark expressions use,
so the two sides cannot drift independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.plans.medallion import (
    gold_cardholder_features,
    gold_hourly_volume,
    gold_merchant_risk_summary,
    silver_transform,
)
from databricks_etl_pipelines_spark.sources.generator import (
    BASE_EPOCH,
    BRANDS,
    CARD_TYPES,
    CURRENCIES,
    FIRST_NAMES,
    HIGH_RISK_MCC,
    LAST_NAMES,
    MCC_CATEGORIES,
    MCC_CODES,
    NETWORKS,
    P_BAD_AMOUNT,
    P_BAD_MCC,
    P_NULL_ID,
    P_SHORT_CARD,
    STATES,
    batch_transactions,
)

N_ROWS = 5000


def _pool(values) -> str:
    return "[" + ", ".join(f"'{v}'" for v in values) + "]"


def _pick(values, idx_expr: str) -> str:
    return f"({_pool(values)})[CAST(({idx_expr}) % {len(values)} + 1 AS INT)]"


def _in(values) -> str:
    return ", ".join(f"'{v}'" for v in values)


def _generator_sql(n: int) -> str:
    """bronze CTE mirroring sources/generator.py exactly."""
    mcc_case = " ".join(
        f"WHEN '{code}' THEN '{cat}'" for code, cat in MCC_CATEGORIES.items()
    )
    return f"""
gen AS (
  SELECT
    "value",
    epoch_ms(({BASE_EPOCH} + "value") * 1000) AS ts,
    floor((abs(sin("value" * 0.37)) * 480 + 2.25) * 100 + 0.5) / 100
      AS amount_pure,
    '4' || lpad(CAST(("value" * 7919 + 12345) % 999999999999999 AS VARCHAR),
                15, '0') AS card_full,
    {_pick(FIRST_NAMES, '"value" * 13')} AS first_n,
    {_pick(LAST_NAMES, '"value" * 17 + 3')} AS last_n
  FROM range({n}) t("value")
),
bronze AS (
  SELECT
    "value",
    amount_pure,
    CASE WHEN "value" % {P_NULL_ID} = 0 THEN NULL
         ELSE 'TXN-' || strftime(ts, '%Y%m%d') || '-'
              || lpad(CAST("value" AS VARCHAR), 10, '0') END AS transaction_id,
    CASE WHEN "value" % {P_SHORT_CARD} = 0 THEN substring(card_full, 1, 12)
         ELSE card_full END AS card_number,
    first_n || ' ' || last_n AS cardholder_name,
    CASE WHEN "value" % {P_BAD_AMOUNT} = 0 THEN -5.0 ELSE amount_pure END
      AS amount,
    {_pick(CURRENCIES, '"value" * 7')} AS currency,
    CASE WHEN "value" % {P_BAD_MCC} = 0 THEN '0000'
         ELSE {_pick(MCC_CODES, '"value" * 11')} END AS mcc_code,
    {_pick(BRANDS, '"value" * 3 + 1')} || ' #'
      || CAST(CAST(floor("value" / 20) AS BIGINT) % 25 + 1 AS VARCHAR)
      AS merchant_name,
    {_pick(STATES, '"value" * 5 + 2')} AS merchant_state,
    'US' AS merchant_country,
    {_pick(NETWORKS, '"value"')} AS card_network,
    {_pick(CARD_TYPES, '"value"')} AS card_type,
    lpad(CAST("value" * 127 % 999999 AS VARCHAR), 6, '0') AS auth_code,
    "value" % 5 = 0 AS is_online,
    "value" % 25 = 0 AS is_international,
    "value" % 40 = 0 AS velocity_flag,
    amount_pure > 420 AS amount_anomaly_flag,
    ts AS event_timestamp
  FROM gen
),
silver AS (
  SELECT
    transaction_id,
    '****-****-****-' || right(card_number, 4) AS card_number_masked,
    sha256(lower(trim(cardholder_name))) AS cardholder_token,
    amount, currency, mcc_code, merchant_name, merchant_state,
    merchant_country, card_network, card_type, auth_code,
    is_online, is_international, velocity_flag, amount_anomaly_flag,
    event_timestamp,
    coalesce(CASE mcc_code {mcc_case} END, 'other') AS mcc_category,
    CAST(CAST(event_timestamp AS DATE) AS TIMESTAMP) AS event_date,
    hour(event_timestamp) AS event_hour,
    CASE WHEN amount < 10.0 THEN 'micro' WHEN amount < 50.0 THEN 'small'
         WHEN amount < 200.0 THEN 'medium' ELSE 'large' END AS amount_bucket,
    mcc_code IN ({_in(HIGH_RISK_MCC)}) AS is_high_risk_mcc,
    (CASE WHEN velocity_flag THEN 30 ELSE 0 END
     + CASE WHEN amount_pure > 420 THEN 25 ELSE 0 END
     + CASE WHEN mcc_code IN ({_in(HIGH_RISK_MCC)}) THEN 20 ELSE 0 END
     + CASE WHEN is_international THEN 15 ELSE 0 END
     + CASE WHEN is_online THEN 10 ELSE 0 END) AS risk_score_raw
  FROM bronze
  WHERE transaction_id IS NOT NULL AND amount > 0
    AND length(card_number) = 16 AND mcc_code IN ({_in(MCC_CODES)})
)
"""


def _silver_df(spark: SparkSession) -> DataFrame:
    bronze = batch_transactions(spark, N_ROWS)
    silver, _ = silver_transform(bronze)
    return silver


_SILVER_COLS = """
  transaction_id, card_number_masked, cardholder_token, amount, currency,
  mcc_code, merchant_name, merchant_state, merchant_country, card_network,
  card_type, auth_code, is_online, is_international, velocity_flag,
  amount_anomaly_flag, event_timestamp, mcc_category, event_date,
  event_hour, amount_bucket, is_high_risk_mcc, risk_score_raw
"""

_SILVER_ORACLE = f"WITH {_generator_sql(N_ROWS)} SELECT {_SILVER_COLS} FROM silver"


@query("pipeline_silver_enrichment", _SILVER_ORACLE)
def pipeline_silver_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = _silver_df(spark)
    return silver.select(
        "transaction_id", "card_number_masked", "cardholder_token", "amount",
        "currency", "mcc_code", "merchant_name", "merchant_state",
        "merchant_country", "card_network", "card_type", "auth_code",
        "is_online", "is_international", "velocity_flag",
        "amount_anomaly_flag", "event_timestamp", "mcc_category",
        F.col("event_date").cast("timestamp").alias("event_date"),
        "event_hour", "amount_bucket", "is_high_risk_mcc", "risk_score_raw",
    )


_QUARANTINE_ORACLE = f"""
WITH {_generator_sql(N_ROWS)}
SELECT
  CASE WHEN transaction_id IS NULL THEN 'null_transaction_id'
       WHEN NOT (amount > 0) THEN 'non_positive_amount'
       WHEN length(card_number) != 16 THEN 'malformed_card_number'
       WHEN mcc_code NOT IN ({_in(MCC_CODES)}) THEN 'invalid_mcc_code'
  END AS quarantine_reason,
  count(*) AS n_rows,
  count(transaction_id) AS n_with_id
FROM bronze
WHERE NOT (transaction_id IS NOT NULL AND amount > 0
           AND length(card_number) = 16 AND mcc_code IN ({_in(MCC_CODES)}))
GROUP BY 1
"""


@query("pipeline_quarantine_summary", _QUARANTINE_ORACLE)
def pipeline_quarantine_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    bronze = batch_transactions(spark, N_ROWS)
    _, quarantined = silver_transform(bronze)
    return quarantined.groupBy("quarantine_reason").agg(
        F.count("*").alias("n_rows"),
        F.count("transaction_id").alias("n_with_id"),
    )


_MERCHANT_ORACLE = f"""
WITH {_generator_sql(N_ROWS)},
agg AS (
  SELECT
    merchant_name, mcc_category, merchant_state, is_high_risk_mcc,
    count(*) AS txn_count,
    floor(sum(amount) * 100 + 0.5) / 100 AS total_volume,
    floor(max(amount) * 100 + 0.5) / 100 AS max_amount,
    count(DISTINCT cardholder_token) AS unique_cardholders,
    CAST(sum(CASE WHEN risk_score_raw >= 50 THEN 1 ELSE 0 END) AS BIGINT)
      AS high_risk_txns,
    CAST(sum(CASE WHEN is_online THEN 1 ELSE 0 END) AS BIGINT) AS online_txns,
    CAST(sum(CASE WHEN is_international THEN 1 ELSE 0 END) AS BIGINT)
      AS intl_txns,
    CAST(sum(CASE WHEN velocity_flag THEN 1 ELSE 0 END) AS BIGINT)
      AS velocity_txns,
    floor(sum(risk_score_raw) * 100 + 0.5) / 100 AS total_risk_score
  FROM silver
  GROUP BY 1, 2, 3, 4
)
SELECT *,
  floor(total_volume / txn_count * 10000 + 0.5) / 10000 AS avg_amount,
  floor(total_risk_score / txn_count * 10000 + 0.5) / 10000 AS avg_risk_score,
  floor(high_risk_txns / txn_count * 100 * 100 + 0.5) / 100 AS high_risk_pct,
  floor(online_txns / txn_count * 100 * 100 + 0.5) / 100 AS online_pct
FROM agg
"""


@query("pipeline_gold_merchant_summary", _MERCHANT_ORACLE)
def pipeline_gold_merchant_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold_merchant_risk_summary(_silver_df(spark))


_FEATURES_ORACLE = f"""
WITH {_generator_sql(N_ROWS)},
feat AS (
  SELECT
    cardholder_token,
    count(*) AS txn_count,
    floor(sum(amount) * 100 + 0.5) / 100 AS total_spend,
    floor(stddev_samp(amount) * 10000 + 0.5) / 10000 AS stddev_amount,
    floor(min(amount) * 100 + 0.5) / 100 AS min_amount,
    floor(max(amount) * 100 + 0.5) / 100 AS max_amount,
    count(DISTINCT merchant_name) AS unique_merchants,
    count(DISTINCT mcc_category) AS unique_categories,
    count(DISTINCT merchant_state) AS unique_states,
    CAST(sum(CASE WHEN is_online THEN 1 ELSE 0 END) AS BIGINT) AS online_txns,
    CAST(sum(CASE WHEN is_international THEN 1 ELSE 0 END) AS BIGINT)
      AS intl_txns,
    CAST(sum(CASE WHEN is_high_risk_mcc THEN 1 ELSE 0 END) AS BIGINT)
      AS high_risk_mcc_txns,
    floor(sum(risk_score_raw) * 100 + 0.5) / 100 AS total_risk_score,
    floor(max(risk_score_raw) * 100 + 0.5) / 100 AS max_risk_score,
    CAST(sum(CASE WHEN velocity_flag THEN 1 ELSE 0 END) AS BIGINT)
      AS velocity_alerts,
    CAST(sum(CASE WHEN amount_anomaly_flag THEN 1 ELSE 0 END) AS BIGINT)
      AS anomaly_alerts,
    count(DISTINCT card_network) AS unique_networks,
    count(DISTINCT card_type) AS unique_card_types,
    min(event_timestamp) AS first_seen,
    max(event_timestamp) AS last_seen
  FROM silver
  GROUP BY cardholder_token
),
ratios AS (
  SELECT *,
    floor(total_spend / txn_count * 10000 + 0.5) / 10000 AS avg_amount,
    floor(total_risk_score / txn_count * 10000 + 0.5) / 10000 AS avg_risk_score,
    floor(online_txns / txn_count * 10000 + 0.5) / 10000 AS online_ratio,
    floor(intl_txns / txn_count * 10000 + 0.5) / 10000 AS intl_ratio,
    floor(total_spend / unique_merchants * 10000 + 0.5) / 10000
      AS avg_amount_per_merchant
  FROM feat
),
cv AS (
  SELECT *,
    floor(stddev_amount / nullif(avg_amount, 0) * 10000 + 0.5) / 10000
      AS coefficient_of_variation
  FROM ratios
)
SELECT *,
  CASE WHEN avg_risk_score >= 40 OR velocity_alerts >= 2 OR anomaly_alerts >= 3
       THEN 1 ELSE 0 END AS is_suspicious
FROM cv
"""


@query("pipeline_gold_cardholder_features", _FEATURES_ORACLE)
def pipeline_gold_cardholder_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = gold_cardholder_features(_silver_df(spark))
    return feat.select(
        "cardholder_token", "txn_count", "total_spend", "stddev_amount",
        "min_amount", "max_amount", "unique_merchants", "unique_categories",
        "unique_states", "online_txns", "intl_txns", "high_risk_mcc_txns",
        "total_risk_score", "max_risk_score", "velocity_alerts",
        "anomaly_alerts", "unique_networks", "unique_card_types",
        "first_seen", "last_seen", "avg_amount", "avg_risk_score",
        "online_ratio", "intl_ratio", "avg_amount_per_merchant",
        "coefficient_of_variation", "is_suspicious",
    )


_HOURLY_ORACLE = f"""
WITH {_generator_sql(N_ROWS)},
agg AS (
  SELECT
    CAST(CAST(event_timestamp AS DATE) AS TIMESTAMP) AS event_date,
    hour(event_timestamp) AS event_hour,
    card_network, mcc_category,
    count(*) AS txn_count,
    floor(sum(amount) * 100 + 0.5) / 100 AS total_volume,
    count(DISTINCT cardholder_token) AS unique_cardholders
  FROM silver
  GROUP BY 1, 2, 3, 4
)
SELECT *,
  floor(total_volume / txn_count * 10000 + 0.5) / 10000 AS avg_amount
FROM agg
"""


@query("pipeline_gold_hourly_volume", _HOURLY_ORACLE)
def pipeline_gold_hourly_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = gold_hourly_volume(_silver_df(spark))
    return hourly.select(
        F.col("event_date").cast("timestamp").alias("event_date"),
        "event_hour", "card_network", "mcc_category",
        "txn_count", "total_volume", "unique_cardholders", "avg_amount",
    )

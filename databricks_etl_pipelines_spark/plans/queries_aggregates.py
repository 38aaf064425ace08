"""Aggregation operators (SURVEY.md §2.4 A1-A8) over the testdata tables.

The reference's signature aggregation shapes — multi-key hash aggregation,
conditional aggregation via ``sum(when(...))`` (11 occurrences in the
reference, e.g. 02:243-253, 03:40-54), exact ``countDistinct``, post-agg
derived ratios (03:55-58), and the 22-aggregate entity-feature table
(03:93-128) — re-expressed over lineitem/orders/customer.

Scale notes (100 TB): every groupBy here is a partial+final HashAggregate
with one shuffle on the grouping keys; Catalyst plans the map-side combine
automatically. ``countDistinct`` compiles to expand + two-phase aggregate —
at 100 TB swap in ``approx_count_distinct`` (provided as *_approx variants,
not oracle-compared). Post-agg ratios fold into the final projection (no
extra pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.sources import table

# ---------------------------------------------------------------------------
# M0 flagship: one plan exercising the reference's signature shapes at once —
# filter → conditional bucket column (02:150-154) → multi-key groupBy →
# {count, sum, avg, stddev, countDistinct, conditional sum} (03:40-54,
# 03:93-128) → post-agg ratio (03:55-58) → orderBy desc (03:68-70).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH base AS (
  SELECT *,
    CASE WHEN l_extendedprice < 1000 THEN 'micro'
         WHEN l_extendedprice < 10000 THEN 'small'
         WHEN l_extendedprice < 50000 THEN 'medium'
         ELSE 'large' END AS price_bucket
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT
  l_returnflag,
  l_linestatus,
  price_bucket,
  count(*) AS txn_count,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_price,
  round(avg(l_discount), 6) AS avg_discount,
  round(stddev_samp(l_extendedprice), 2) AS stddev_price,
  count(DISTINCT l_suppkey) AS supplier_count,
  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
    AS high_discount_count,
  round(CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        / count(*) * 100, 2) AS high_discount_pct
FROM base
GROUP BY l_returnflag, l_linestatus, price_bucket
ORDER BY sum_price DESC
"""


@query("flagship_pricing_risk_summary", _FLAGSHIP_ORACLE)
def flagship_pricing_risk_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    price_bucket = (
        F.when(F.col("l_extendedprice") < 1000, "micro")
        .when(F.col("l_extendedprice") < 10000, "small")
        .when(F.col("l_extendedprice") < 50000, "medium")
        .otherwise("large")
    )
    agg = (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .withColumn("price_bucket", price_bucket)
        .groupBy("l_returnflag", "l_linestatus", "price_bucket")
        .agg(
            F.count("*").alias("txn_count"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_discount"),
            F.round(F.stddev("l_extendedprice"), 2).alias("stddev_price"),
            F.countDistinct("l_suppkey").alias("supplier_count"),
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias(
                "high_discount_count"
            ),
        )
        .withColumn(
            "high_discount_pct",
            F.round(F.col("high_discount_count") / F.col("txn_count") * 100, 2),
        )
    )
    return agg.orderBy(F.desc("sum_price"))

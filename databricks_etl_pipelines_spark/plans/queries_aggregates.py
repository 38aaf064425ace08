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

from databricks_etl_pipelines_spark.session import invocation_pin

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.functions.enrich import any_flag
from databricks_etl_pipelines_spark.functions.numeric import stable_round
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
  floor((floor(sum(l_discount) * 100 + 0.5) / 100) / count(*) * 1000000 + 0.5)
    / 1000000 AS avg_discount,
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
            stable_round(
                stable_round(F.sum("l_discount"), 2) / F.count("*"), 6
            ).alias("avg_discount"),
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


# ---------------------------------------------------------------------------
# A1: DQ-summary shape — single-key group, count/avg/conditional-sum
# (02:243-253) on orders.
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
SELECT
  o_orderpriority,
  count(*) AS order_count,
  floor((floor(sum(o_totalprice) * 100 + 0.5) / 100) / count(*) * 10000 + 0.5)
    / 10000 AS avg_price,
  CAST(sum(CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END) AS BIGINT)
    AS big_ticket_count,
  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_dq_summary", _DQ_ORACLE)
def agg_dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # Averages of fixed-decimal data can land exactly on a rounding-grid
    # midpoint, where engine summation order flips the result — so derive
    # avg from the grid-stabilized sum instead of rounding F.avg directly.
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(F.when(F.col("o_totalprice") > 250000, 1).otherwise(0)).alias(
                "big_ticket_count"
            ),
            stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .withColumn(
            "avg_price",
            stable_round(F.col("total_price") / F.col("order_count"), 4),
        )
        .select(
            "o_orderpriority", "order_count", "avg_price",
            "big_ticket_count", "total_price",
        )
    )


# ---------------------------------------------------------------------------
# A7: time-bucketed 4-key volume stats (03:173-183 hourly_volume_stats) on
# events. The reference buckets with derived date/hour columns; same here —
# one shuffle on the four keys, partial aggregation map-side.
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT
  date_trunc('day', ts) AS event_date,
  hour(ts) AS event_hour,
  event_type,
  count(*) AS event_count,
  floor(sum("value") * 100 + 0.5) / 100 AS total_value,
  floor((floor(sum("value") * 100 + 0.5) / 100) / count(*) * 10000 + 0.5) / 10000
    AS avg_value,
  count(DISTINCT user_id) AS unique_users
FROM events
GROUP BY 1, 2, 3
"""


@query("agg_hourly_volume_stats", _HOURLY_ORACLE)
def agg_hourly_volume_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("event_date", F.date_trunc("day", "ts"))
        .withColumn("event_hour", F.hour("ts").cast("bigint"))
        .groupBy("event_date", "event_hour", "event_type")
        .agg(
            F.count("*").alias("event_count"),
            stable_round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .withColumn(
            "avg_value",
            stable_round(F.col("total_value") / F.col("event_count"), 4),
        )
        .select(
            "event_date", "event_hour", "event_type",
            "event_count", "total_value", "avg_value", "unique_users",
        )
    )


# ---------------------------------------------------------------------------
# A5+A6: the 22-aggregate entity-feature table (03:93-137 cardholder_features)
# re-expressed as per-customer order features: one wide groupBy — count, sum,
# avg, stddev, min, max, countDistinct diversity, conditional channel mix,
# first/last-seen timestamps — then post-agg ratios and the boolean-OR
# is_suspicious label (03:140-147). One shuffle total; ratios fold into the
# final projection.
# ---------------------------------------------------------------------------

_FEATURES_ORACLE = """
WITH feat AS (
  SELECT
    o_custkey,
    count(*) AS order_count,
    floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_spend,
    floor((floor(sum(o_totalprice) * 100 + 0.5) / 100) / count(*) * 10000 + 0.5)
      / 10000 AS avg_order_value,
    floor(stddev_samp(o_totalprice) * 10000 + 0.5) / 10000 AS stddev_order_value,
    floor(min(o_totalprice) * 100 + 0.5) / 100 AS min_order_value,
    floor(max(o_totalprice) * 100 + 0.5) / 100 AS max_order_value,
    count(DISTINCT o_orderstatus) AS status_diversity,
    count(DISTINCT o_orderpriority) AS priority_diversity,
    count(DISTINCT date_trunc('day', o_orderdate)) AS active_days,
    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
      AS fulfilled_count,
    CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
      AS BIGINT) AS urgent_count,
    CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
      AS jumbo_count,
    floor(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) * 100
      + 0.5) / 100 AS fulfilled_spend,
    min(o_orderdate) AS first_seen,
    max(o_orderdate) AS last_seen
  FROM orders
  GROUP BY o_custkey
)
SELECT *,
  floor(urgent_count / order_count * 10000 + 0.5) / 10000 AS urgent_ratio,
  floor(stddev_order_value / nullif(avg_order_value, 0) * 10000 + 0.5) / 10000
    AS coeff_variation,
  CASE WHEN urgent_count >= 5 OR max_order_value >= 400000
            OR jumbo_count >= 3
       THEN 1 ELSE 0 END AS is_suspicious
FROM feat
"""


@query("agg_entity_features", _FEATURES_ORACLE)
def agg_entity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    feat = orders.groupBy("o_custkey").agg(
        F.count("*").alias("order_count"),
        stable_round(F.sum("o_totalprice"), 2).alias("total_spend"),
        stable_round(F.stddev("o_totalprice"), 4).alias("stddev_order_value"),
        stable_round(F.min("o_totalprice"), 2).alias("min_order_value"),
        stable_round(F.max("o_totalprice"), 2).alias("max_order_value"),
        # size(collect_set) == countDistinct (both ignore NULLs) but
        # avoids the 4× Expand three multi-column distincts compile to —
        # single-pass map-side aggregation, 1/4 the shuffled rows (r15).
        # Safe ONLY because every distinct domain here is bounded per
        # group (statuses ≤ 3, priorities ≤ 5, active days ≤ calendar
        # days) — an unbounded-cardinality distinct must keep
        # countDistinct's expand, not hold a set per group.
        F.size(F.collect_set("o_orderstatus")).cast("long").alias(
            "status_diversity"
        ),
        F.size(F.collect_set("o_orderpriority")).cast("long").alias(
            "priority_diversity"
        ),
        F.size(F.collect_set(F.date_trunc("day", "o_orderdate")))
        .cast("long")
        .alias("active_days"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "fulfilled_count"
        ),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        ).alias("urgent_count"),
        F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias(
            "jumbo_count"
        ),
        stable_round(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("fulfilled_spend"),
        F.min("o_orderdate").alias("first_seen"),
        F.max("o_orderdate").alias("last_seen"),
    )
    feat = feat.withColumn(
        "avg_order_value",
        stable_round(F.col("total_spend") / F.col("order_count"), 4),
    )
    result = feat.select(
        "*",
        stable_round(F.col("urgent_count") / F.col("order_count"), 4).alias(
            "urgent_ratio"
        ),
        stable_round(
            F.col("stddev_order_value")
            / F.nullif(F.col("avg_order_value"), F.lit(0)),
            4,
        ).alias("coeff_variation"),
        any_flag(
            F.col("urgent_count") >= 5,
            F.col("max_order_value") >= 400000,
            F.col("jumbo_count") >= 3,
        ).alias("is_suspicious"),
    )
    # Column order must match the oracle's SELECT * expansion.
    return result.select(
        "o_custkey", "order_count", "total_spend", "avg_order_value",
        "stddev_order_value", "min_order_value", "max_order_value",
        "status_diversity", "priority_diversity", "active_days",
        "fulfilled_count", "urgent_count", "jumbo_count", "fulfilled_spend",
        "first_seen", "last_seen", "urgent_ratio", "coeff_variation",
        "is_suspicious",
    )


# ---------------------------------------------------------------------------
# A8: ungrouped aggregation — global counts/sums in one partial+final pass.
# ---------------------------------------------------------------------------

_GLOBAL_ORACLE = """
SELECT
  count(*) AS row_count,
  count(DISTINCT l_orderkey) AS order_count,
  count(DISTINCT l_suppkey) AS supplier_count,
  floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS total_price,
  floor(sum(l_quantity) * 100 + 0.5) / 100 AS total_qty,
  floor((floor(sum(l_quantity) * 100 + 0.5) / 100) / count(*) * 10000 + 0.5)
    / 10000 AS avg_qty
FROM lineitem
"""


@query("agg_ungrouped_global", _GLOBAL_ORACLE)
def agg_ungrouped_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("row_count"),
        F.countDistinct("l_orderkey").alias("order_count"),
        F.countDistinct("l_suppkey").alias("supplier_count"),
        stable_round(F.sum("l_extendedprice"), 2).alias("total_price"),
        stable_round(F.sum("l_quantity"), 2).alias("total_qty"),
    ).withColumn(
        "avg_qty", stable_round(F.col("total_qty") / F.col("row_count"), 4)
    )


# ---------------------------------------------------------------------------
# Rollup / cube (SURVEY §2.4 'absent but built-in' extensions).
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  count(*) AS line_count,
  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("agg_rollup", _ROLLUP_ORACLE)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("line_count"),
        stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_CUBE_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*) AS order_count,
  floor(sum(o_totalprice) * 100 + 0.5) / 100 AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("agg_cube", _CUBE_ORACLE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("order_count"),
        stable_round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median (SURVEY §2.4 'absent' — built-in extension).
# ---------------------------------------------------------------------------

_PCTL_ORACLE = """
SELECT
  l_returnflag,
  floor(median(l_extendedprice) * 10000 + 0.5) / 10000 AS median_price,
  floor(quantile_cont(l_extendedprice, 0.25) * 10000 + 0.5) / 10000 AS p25_price,
  floor(quantile_cont(l_extendedprice, 0.75) * 10000 + 0.5) / 10000 AS p75_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_percentiles", _PCTL_ORACLE)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.median("l_extendedprice"), 4).alias("median_price"),
        stable_round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        stable_round(F.percentile("l_extendedprice", 0.75), 4).alias("p75_price"),
    )


# ---------------------------------------------------------------------------
# collect_set (deterministic: sorted then joined to a string so the
# differential hash is order-stable).
# ---------------------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT
  l_orderkey,
  array_to_string(list_sort(list_distinct(list(l_returnflag))), ',')
    AS return_flags,
  count(*) AS line_count
FROM lineitem
GROUP BY l_orderkey
"""


@query("agg_collect_set", _COLLECT_ORACLE)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias(
            "return_flags"
        ),
        F.count("*").alias("line_count"),
    )


# ---------------------------------------------------------------------------
# approx_count_distinct — the 100 TB swap-in for A3/A5/A7's exact distincts
# (HLL++, no expand, single pass). The sketch value is engine-specific, so
# the oracle pins an error BOUND: exact count + a boolean the sketch must
# satisfy (see the query docstring).
# ---------------------------------------------------------------------------


_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
  TRUE AS approx_within_3pct
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_approx_count_distinct", _APPROX_DISTINCT_ORACLE)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch under a HARD differential check despite the sketch
    value itself being engine-specific: the query computes BOTH the
    rsd=0.01 sketch and the exact distinct count, and exposes the exact
    count plus a boolean asserting the sketch landed within 3% of it.
    DuckDB recomputes the exact count and expects the boolean TRUE — so
    a broken sketch (observed error is ≤0.9% across sf0.001-0.1; 3% is
    >3× headroom over the configured rsd) flips the flag and fails the
    hash compare. The raw approx value stays out of the compared columns
    because no oracle can reproduce another engine's HLL register set.

    Spark-version sensitivity (deliberate, accepted): the boolean pins
    the ACCURACY of whatever HLL++ implementation the running Spark
    ships, so a Spark upgrade that changes sketch internals could in
    principle flip it with no bug in this repo. The >3× headroom over
    the configured rsd is the guard — any implementation honoring
    rsd=0.01 stays far inside 3%; if the driver's Spark version drifts
    and this flag flips, widen the margin here and in the oracle
    together (same note on ``agg_approx_percentile_bounds``)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    within = (
        F.abs(F.col("approx_orders") - F.col("exact_orders"))
        <= 0.03 * F.col("exact_orders")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        within.alias("approx_within_3pct"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch — unlike HLL++ above,
# the DETERMINISTIC cross-engine hash makes the estimate itself exactly
# SQL-replayable: a sketch under a hard value oracle, not an error bound.
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_SEED = 7
_KMV_NUM = (_KMV_K - 1) * 2147483648.0  # (k-1) / u_k with u = (key+1)/2^31

_KMV_HASH = f"""list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(
            md5(CAST(o_custkey AS VARCHAR) || ':{_KMV_SEED}'), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647
    )"""

_KMV_ORACLE = f"""
WITH keyed AS (
  SELECT DISTINCT CAST({_KMV_HASH} AS BIGINT) AS sample_key FROM orders
),
bottom AS (SELECT sample_key FROM keyed ORDER BY sample_key LIMIT {_KMV_K}),
sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         max(sample_key) AS kth_key
  FROM bottom
),
ex AS (
  SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders
)
SELECT exact_distinct, n_keys, kth_key,
  floor((CASE WHEN n_keys < {_KMV_K} THEN CAST(n_keys AS DOUBLE)
         ELSE {_KMV_NUM} / (kth_key + 1) END) * 10000 + 0.5) / 10000
    AS kmv_estimate
FROM sk, ex
"""


@query("agg_kmv_distinct", _KMV_ORACLE)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al., "Counting
    distinct elements in a data stream", RANDOM 2002): hash every value
    with the deterministic cross-engine uniform
    (operators/curation.py::reservoir_key), keep the k smallest distinct
    hashes, estimate distinct = (k-1)/u_k where u_k normalizes the k-th
    smallest key. Because the hash is a pure function of (value, seed),
    the ESTIMATE is bit-replayable in SQL — a hard value oracle where
    HLL++ (`agg_approx_count_distinct`) can only support an error bound.
    If fewer than k distinct hashes exist the sketch IS the distinct set
    and the estimate is exact by convention.

    Scale shape: one hash-distinct shuffle on 8-byte keys + a
    TakeOrderedAndProject cap — mergeable across partitions/streams (the
    same bottom-k fold `reservoir_sample_stream` maintains), sketch size
    k regardless of input size. Relative error ~1/sqrt(k-2) ≈ 6% at
    k=256; pytest pins the observed accuracy."""
    orders = table(spark, sf_dir, "orders")
    from databricks_etl_pipelines_spark.operators.curation import (
        reservoir_key,
    )

    keyed = orders.select(
        reservoir_key("o_custkey", _KMV_SEED).alias("sample_key")
    ).distinct()
    bottom = keyed.orderBy("sample_key").limit(_KMV_K)
    sk = bottom.agg(
        F.count("*").alias("n_keys"),
        F.max("sample_key").alias("kth_key"),
    )
    ex = orders.agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_keys") < _KMV_K, F.col("n_keys").cast("double")
    ).otherwise(F.lit(_KMV_NUM) / (F.col("kth_key") + F.lit(1)))
    return sk.crossJoin(F.broadcast(ex)).select(
        "exact_distinct",
        "n_keys",
        "kth_key",
        stable_round(est, 4).alias("kmv_estimate"),
    )


# ---------------------------------------------------------------------------
# Theta sketch SET OPERATIONS (Dasgupta/Lang/Rhodes, "A framework for
# estimating stream expression cardinalities" — the Apache DataSketches
# theta framework): bottom-k sketches of two populations support
# union/intersection cardinality estimates WITHOUT rescanning either
# population, the property that makes sketch families composable across
# shards and days at 100 TB. The deterministic cross-engine hash makes
# every retained key, both thetas, and all four estimates exactly
# SQL-replayable — a hard value oracle over the full set algebra.
# ---------------------------------------------------------------------------

_THETA_K = 256
_THETA_SEED = 11
_THETA_FULL = 2147483648  # 2^31: theta for an exact-mode (n < k) sketch


def _theta_hash_sql(col: str) -> str:
    return f"""list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(
            md5(CAST({col} AS VARCHAR) || ':{_THETA_SEED}'), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647
    )"""


def _theta_cte(name: str, where: str) -> str:
    """Bottom-k sketch CTE pair: ``{name}`` holds the retained keys,
    ``{name}_t`` its exclusive theta (DataSketches convention: in
    estimation mode theta is the k-th smallest key and only keys < theta
    are retained; in exact mode theta = 2^31 and everything is)."""
    return f"""{name}_keys AS (
  SELECT DISTINCT CAST({_theta_hash_sql('o_custkey')} AS BIGINT) AS hk
  FROM orders WHERE {where}
),
{name}_bk AS (SELECT hk FROM {name}_keys ORDER BY hk LIMIT {_THETA_K}),
{name}_t AS (
  SELECT CASE WHEN count(*) < {_THETA_K} THEN {_THETA_FULL}
         ELSE max(hk) END AS theta
  FROM {name}_bk
),
{name} AS (SELECT hk FROM {name}_bk, {name}_t WHERE hk < theta)"""


_THETA_EST = f"CAST({_THETA_FULL} AS DOUBLE) / CAST(theta AS DOUBLE)"

_THETA_ORACLE = f"""
WITH {_theta_cte('sa', "o_orderpriority = '1-URGENT'")},
{_theta_cte('sb', "year(o_orderdate) = 1995")},
t AS (
  SELECT least((SELECT theta FROM sa_t), (SELECT theta FROM sb_t))
    AS theta
),
sa2 AS (SELECT hk FROM sa, t WHERE hk < theta),
sb2 AS (SELECT hk FROM sb, t WHERE hk < theta),
est AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM sa) AS retained_a,
    (SELECT CAST(count(*) AS BIGINT) FROM sb) AS retained_b,
    floor((SELECT count(*) FROM sa) *
          CAST({_THETA_FULL} AS DOUBLE)
          / (SELECT CAST(theta AS DOUBLE) FROM sa_t) * 10000 + 0.5)
      / 10000 AS est_a,
    floor((SELECT count(*) FROM sb) *
          CAST({_THETA_FULL} AS DOUBLE)
          / (SELECT CAST(theta AS DOUBLE) FROM sb_t) * 10000 + 0.5)
      / 10000 AS est_b,
    floor((SELECT count(*) FROM (
             SELECT hk FROM sa2 UNION SELECT hk FROM sb2)) *
          CAST({_THETA_FULL} AS DOUBLE)
          / (SELECT CAST(theta AS DOUBLE) FROM t) * 10000 + 0.5)
      / 10000 AS est_union,
    floor((SELECT count(*) FROM sa2 JOIN sb2 USING (hk)) *
          CAST({_THETA_FULL} AS DOUBLE)
          / (SELECT CAST(theta AS DOUBLE) FROM t) * 10000 + 0.5)
      / 10000 AS est_intersect
),
ex AS (
  SELECT
    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
     WHERE o_orderpriority = '1-URGENT') AS exact_a,
    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
     WHERE year(o_orderdate) = 1995) AS exact_b,
    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
     WHERE o_orderpriority = '1-URGENT'
        OR year(o_orderdate) = 1995) AS exact_union,
    (SELECT CAST(count(*) AS BIGINT) FROM
      (SELECT DISTINCT o_custkey FROM orders
       WHERE o_orderpriority = '1-URGENT') ia
      JOIN (SELECT DISTINCT o_custkey FROM orders
            WHERE year(o_orderdate) = 1995) ib
      USING (o_custkey)) AS exact_intersect
)
SELECT exact_a, retained_a, est_a, exact_b, retained_b, est_b,
       exact_union, est_union, exact_intersect, est_intersect
FROM est, ex
"""


@query("agg_theta_sketch_setops", _THETA_ORACLE)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra over two customer populations (urgent-
    order customers vs 1995 customers): each side is a bottom-k sketch
    of the deterministic key hash; union and intersection cardinalities
    are then estimated FROM THE SKETCHES ALONE under the min of the two
    thetas (DataSketches a-not-b/union/intersect semantics) — never by
    rescanning the populations. Because the hash is the cross-engine
    Karp-Rabin family, thetas, retained sets and all four estimates
    replay exactly in SQL.

    Scale shape: each sketch is one filter + hash-distinct shuffle +
    TakeOrderedAndProject cap (fixed k rows out, whatever the input
    size); the set algebra then runs on ≤ 2k retained keys — broadcast-
    trivial. Sketches are mergeable (bottom-k of a union = bottom-k of
    the parts' bottom-k), so per-shard/per-day sketches compose at
    100 TB without reshuffling raw keys. Reference parity: extends the
    sketch family (HLL bound / KMV exact / quantile bracket / Count-Min)
    with the set-expression layer; cf. reference test coverage of
    distinct aggregation (03_Gold:118-150)."""
    from databricks_etl_pipelines_spark.operators.curation import (
        reservoir_key,
    )

    orders = table(spark, sf_dir, "orders")
    pop_a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    pop_b = orders.filter(F.year("o_orderdate") == 1995)

    def sketch(pop: DataFrame) -> tuple[DataFrame, DataFrame]:
        keys = pop.select(
            reservoir_key("o_custkey", _THETA_SEED).alias("hk")
        ).distinct()
        bk = keys.orderBy("hk").limit(_THETA_K)
        theta = bk.agg(
            F.when(F.count("*") < _THETA_K, F.lit(_THETA_FULL))
            .otherwise(F.max("hk"))
            .alias("theta")
        )
        retained = bk.crossJoin(F.broadcast(theta)).filter(
            F.col("hk") < F.col("theta")
        ).select("hk")
        return retained, theta

    sa, ta = sketch(pop_a)
    sb, tb = sketch(pop_b)
    t = ta.crossJoin(
        F.broadcast(tb.withColumnRenamed("theta", "theta_b"))
    ).select(F.least("theta", "theta_b").alias("theta"))
    sa2 = sa.crossJoin(F.broadcast(t)).filter(
        F.col("hk") < F.col("theta")
    ).select("hk")
    sb2 = sb.crossJoin(F.broadcast(t)).filter(
        F.col("hk") < F.col("theta")
    ).select("hk")

    full = F.lit(float(_THETA_FULL))

    def est_over(counted: DataFrame, theta: DataFrame, name: str
                 ) -> DataFrame:
        return (
            counted.agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(theta))
            .select(
                F.col("n"),
                stable_round(
                    F.col("n") * full / F.col("theta").cast("double"), 4
                ).alias(name),
            )
        )

    ea = est_over(sa, ta, "est_a").withColumnRenamed("n", "retained_a")
    eb = est_over(sb, tb, "est_b").withColumnRenamed("n", "retained_b")
    eu = est_over(
        sa2.unionByName(sb2).distinct(), t, "est_union"
    ).drop("n")
    ei = est_over(sa2.join(sb2, "hk"), t, "est_intersect").drop("n")

    da = pop_a.select("o_custkey").distinct()
    db = pop_b.select("o_custkey").distinct()
    ex = (
        da.agg(F.count("*").alias("exact_a"))
        .crossJoin(db.agg(F.count("*").alias("exact_b")))
        .crossJoin(
            da.unionByName(db).distinct().agg(
                F.count("*").alias("exact_union")
            )
        )
        .crossJoin(
            da.join(db, "o_custkey").agg(
                F.count("*").alias("exact_intersect")
            )
        )
    )
    return (
        ex.crossJoin(F.broadcast(ea))
        .crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(ei))
        .select(
            "exact_a", "retained_a", "est_a",
            "exact_b", "retained_b", "est_b",
            "exact_union", "est_union",
            "exact_intersect", "est_intersect",
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the classic membership sketch, here in the
# role Spark itself uses it for (runtime join pruning à la
# InjectRuntimeFilter): build a fixed-size bit set over the small side's
# keys, probe the big side, and let "definitely not present" skip rows
# before the join. Hand-rolled on the deterministic cross-engine hash
# family, so every bit, every hit, and the false-positive count replay
# exactly in SQL — where Spark's builtin bloom_filter_agg is
# engine-opaque.
# ---------------------------------------------------------------------------

_BF_K = 3       # hash functions
_BF_M = 4096    # bits


def _bf_pos_sql(key: str, i_expr: str = "i") -> str:
    return f"""list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(
            md5('bf' || {i_expr} || ':' || CAST({key} AS VARCHAR)), '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647) % {_BF_M}"""


_BLOOM_ORACLE = f"""
WITH build AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'
),
hs AS (SELECT unnest(range(0, {_BF_K})) AS i),
bits AS (
  SELECT DISTINCT CAST({_bf_pos_sql('o_custkey')} AS BIGINT) AS pos
  FROM build, hs
),
probe AS (
  SELECT c.c_custkey,
    CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS exact_member,
    CASE WHEN (
      SELECT count(*) FROM hs
      WHERE CAST({_bf_pos_sql('c.c_custkey')} AS BIGINT) IN
        (SELECT pos FROM bits)
    ) = {_BF_K} THEN 1 ELSE 0 END AS bloom_hit
  FROM customer c LEFT JOIN build b ON c.c_custkey = b.o_custkey
)
SELECT
  CAST(count(*) AS BIGINT) AS n_probed,
  (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
  CAST(sum(exact_member) AS BIGINT) AS exact_members,
  CAST(sum(bloom_hit) AS BIGINT) AS bloom_hits,
  CAST(sum(CASE WHEN bloom_hit = 1 AND exact_member = 0
       THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
  CAST(sum(CASE WHEN bloom_hit = 0 AND exact_member = 1
       THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
FROM probe
"""


@query("agg_bloom_filter_prune", _BLOOM_ORACLE)
def agg_bloom_filter_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pruning: a k=3 / m=4096 filter built over
    the urgent-order customer keys, probed by every customer — the
    runtime-filter join-pruning shape (Spark's InjectRuntimeFilter /
    bloom_filter_agg) with a HAND-ROLLED deterministic bit set, so the
    oracle replays the bits, every hit, and the false-positive count
    value-for-value. ``false_negatives`` is compared AND must be 0: the
    one-sided Bloom guarantee as a hard oracle column (the Count-Min
    never-undercounts sibling).

    Scale shape: the build side reduces to ≤ m DISTINCT bit positions
    (broadcast-sized however many keys stream in — bits saturate, they
    don't grow); the probe is k hash expressions per row against the
    broadcast bit set — a map-side filter, no shuffle of the big side.
    At 100 TB this is exactly the semi-join prune you want BEFORE a
    shuffle join; Spark injects the same construct automatically when
    spark.sql.optimizer.runtimeFilter.bloomFilter.enabled is on, but
    opaquely — this keeps the bits auditable."""
    from databricks_etl_pipelines_spark.functions.textfns import (
        fingerprint_rolling,
    )

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    hs = spark.range(_BF_K).select(F.col("id").alias("i"))

    def pos(key: F.Column) -> F.Column:
        return fingerprint_rolling(
            F.md5(
                F.concat(
                    F.lit("bf"),
                    F.col("i").cast("string"),
                    F.lit(":"),
                    key.cast("string"),
                )
            )
        ) % _BF_M

    bits = (
        build.crossJoin(F.broadcast(hs))
        .select(pos(F.col("o_custkey")).alias("pos"))
        .distinct()
    )
    probes = (
        customer.select("c_custkey")
        .crossJoin(F.broadcast(hs))
        .select("c_custkey", pos(F.col("c_custkey")).alias("pos"))
    )
    hit_counts = (
        probes.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("c_custkey")
        .agg(F.count("*").alias("k_hits"))
    )
    probe = (
        customer.select("c_custkey")
        .join(
            hit_counts.filter(F.col("k_hits") == _BF_K)
            .select("c_custkey", F.lit(1).alias("bloom_hit")),
            "c_custkey",
            "left",
        )
        .join(
            build.select(
                F.col("o_custkey").alias("c_custkey"),
                F.lit(1).alias("exact_member"),
            ),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce("bloom_hit", F.lit(0)).alias("bloom_hit"),
            F.coalesce("exact_member", F.lit(0)).alias("exact_member"),
        )
    )
    nbits = bits.agg(F.count("*").alias("bits_set"))
    return (
        probe.agg(
            F.count("*").alias("n_probed"),
            F.sum("exact_member").alias("exact_members"),
            F.sum("bloom_hit").alias("bloom_hits"),
            F.sum(
                F.when(
                    (F.col("bloom_hit") == 1)
                    & (F.col("exact_member") == 0),
                    1,
                ).otherwise(0)
            ).alias("false_positives"),
            F.sum(
                F.when(
                    (F.col("bloom_hit") == 0)
                    & (F.col("exact_member") == 1),
                    1,
                ).otherwise(0)
            ).alias("false_negatives"),
        )
        .crossJoin(F.broadcast(nbits))
        .select(
            "n_probed", "bits_set", "exact_members", "bloom_hits",
            "false_positives", "false_negatives",
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — frequency estimation
# in fixed d×w state. The deterministic cross-engine hash rows make the
# ESTIMATES exactly SQL-replayable (like KMV, unlike HLL), and the
# one-sided guarantee (never undercounts) is asserted as a compared
# column on the exact top-20 heavy hitters.
# ---------------------------------------------------------------------------

_CM_D, _CM_W = 4, 64


def _cm_sql_hash(word_expr: str, r_expr: str = "r") -> str:
    return f"""list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(
          regexp_extract_all(md5('cm' || {r_expr} || ':' || {word_expr}),
                             '.'),
          c -> CAST(ord(c) AS BIGINT))),
      (acc, c) -> (acc * 257 + c) % 2147483647) % {_CM_W}"""


_CM_ORACLE = f"""
WITH w AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
),
rows_r AS (SELECT unnest(range(0, {_CM_D})) AS r),
wc AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY word
),
cm AS (
  SELECT r, b, CAST(sum(n) AS BIGINT) AS c FROM (
    SELECT rr.r AS r, {_cm_sql_hash('wc.word')} AS b, wc.n
    FROM wc, rows_r rr
  ) GROUP BY r, b
),
ex AS (
  SELECT word, n AS exact FROM wc
  ORDER BY exact DESC, word LIMIT 20
),
est AS (
  SELECT ex.word, ex.exact, min(cm.c) AS cm_estimate
  FROM ex CROSS JOIN rows_r rr
  JOIN cm ON cm.r = rr.r AND cm.b = ({_cm_sql_hash('ex.word', 'rr.r')})
  GROUP BY ex.word, ex.exact
)
SELECT word, exact, CAST(cm_estimate AS BIGINT) AS cm_estimate,
  CAST(cm_estimate - exact AS BIGINT) AS overcount,
  cm_estimate >= exact AS never_undercounts
FROM est
"""


def countmin_bucket(word_col: F.Column) -> F.Column:
    """Row-r bucket of ``word_col`` under the deterministic cross-engine
    hash family (expects an ``r`` column in scope, as produced by
    :func:`countmin_cells`' range explode)."""
    from databricks_etl_pipelines_spark.functions.textfns import (
        fingerprint_rolling,
    )

    return fingerprint_rolling(
        F.md5(
            F.concat(
                F.lit("cm"),
                F.col("r").cast("string"),
                F.lit(":"),
                word_col,
            )
        )
    ) % _CM_W


def countmin_cells(word_counts: DataFrame) -> DataFrame:
    """(r, b, c) Count-Min counter cells from a (word, n) vocabulary
    relation — c[r][b] = Σ n over words hashing to b, identical to
    hashing every occurrence but with hash work ∝ distinct words. Cells
    are MERGEABLE BY ADDITION: summing per-shard / per-batch cells gives
    exactly the one-shot counters, which is what lets the streaming
    variant (`streaming_countmin_heavy_hitters`) share this builder and
    the batch oracle."""
    rs = word_counts.sparkSession.range(_CM_D).select(
        F.col("id").alias("r")
    )
    return (
        word_counts.crossJoin(F.broadcast(rs))
        .select("r", countmin_bucket(F.col("word")).alias("b"), "n")
        .groupBy("r", "b")
        .agg(F.sum("n").alias("c"))
    )


def countmin_probe(ex: DataFrame, cm: DataFrame) -> DataFrame:
    """Heavy-hitter probe: estimates for the (word, exact) rows of
    ``ex`` against the ≤ d·w-cell counter relation ``cm`` — min over the
    d row-estimates, plus the one-sided overcount columns."""
    rs = ex.sparkSession.range(_CM_D).select(F.col("id").alias("r"))
    est = (
        ex.crossJoin(F.broadcast(rs))
        .select("word", "exact", "r",
                countmin_bucket(F.col("word")).alias("b"))
        .join(F.broadcast(cm), ["r", "b"])
        .groupBy("word", "exact")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return est.select(
        "word",
        "exact",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("exact")).alias("overcount"),
        (F.col("cm_estimate") >= F.col("exact")).alias(
            "never_undercounts"
        ),
    )


def countmin_merge_probe_words(
    spark: SparkSession, sf_dir: str, cm: DataFrame
) -> DataFrame:
    """Probe an externally built counter relation (e.g. the read-time
    merge of a stream's partial cells) with the exact top-20 words of
    the documents table — the shared tail of the batch and streaming
    Count-Min queries."""
    from databricks_etl_pipelines_spark.functions.textfns import tokens

    wc = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    ex = (
        wc.select("word", F.col("n").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("word"))
        .limit(20)
    )
    return countmin_probe(ex, cm)


@query("agg_countmin_words", _CM_ORACLE)
def agg_countmin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the corpus vocabulary: 4 hash
    rows × 64 counters (fixed 256-cell state however large the stream —
    counters are mergeable by addition, the same property that makes it
    a streaming/distributed heavy-hitter structure). Estimates for the
    exact top-20 words, their one-sided overcount, and the
    never-undercounts guarantee — all exactly replayed in SQL because
    the row hashes are the deterministic cross-engine family.

    Scale shape: counters are built from the (word, count) VOCABULARY
    relation, not raw occurrences — c[r][b] = Σ n(word) over words
    hashing to b is identical to hashing every occurrence, but the 4×
    md5 work scales with distinct words instead of corpus tokens
    (measured ~20× less DuckDB oracle time at sf0.1). One word-count
    shuffle (map-side combined), then a vocab×d explode into the
    256-cell hash aggregate; the heavy-hitter probe is a
    TakeOrderedAndProject cap joined against the broadcast sketch."""
    from databricks_etl_pipelines_spark.functions.textfns import tokens

    docs = table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens("text")).alias("word"))
    wc = words.groupBy("word").agg(F.count("*").alias("n"))
    cm = countmin_cells(wc)
    ex = (
        wc.select("word", F.col("n").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("word"))
        .limit(20)
    )
    return countmin_probe(ex, cm)


# ---------------------------------------------------------------------------
# approx percentile under a rank-error-bound oracle — completes the sketch
# family: KMV (exact replay), HLL++ (error bound), KLL-style quantiles
# (rank-error bracket).
# ---------------------------------------------------------------------------

_APCTL_ACC = 1_000  # rank-error guarantee: 1/accuracy = 0.001

_APCTL_ORACLE = """
SELECT l_returnflag,
  floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000
    AS exact_p50,
  floor(quantile_cont(l_extendedprice, 0.95) * 10000 + 0.5) / 10000
    AS exact_p95,
  TRUE AS p50_in_bracket,
  TRUE AS p95_in_bracket
FROM lineitem GROUP BY l_returnflag
"""


@query("agg_approx_percentile_bounds", _APCTL_ORACLE)
def agg_approx_percentile_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``percentile_approx`` (the single-pass mergeable quantile sketch —
    the 100 TB swap-in for the exact sort-based ``percentile``) under a
    HARD rank-error oracle: the sketch guarantees rank error ≤
    n/accuracy, so the approximate p-quantile must be a value between
    the EXACT quantiles at p ± 10/accuracy (10× headroom). The query
    emits the exact p50/p95 plus booleans asserting the bracket holds;
    DuckDB recomputes the exact quantiles and expects TRUE — a broken
    sketch moves a boolean and fails the hash compare. Same discipline
    as ``agg_approx_count_distinct``: the sketch VALUE is
    engine-specific, its accuracy CONTRACT is not — and the same
    Spark-version sensitivity note applies: the ±10/accuracy bracket is
    10× the documented rank-error guarantee, so any conforming sketch
    implementation passes; if a future Spark's sketch drifts outside
    it, widen the bracket here and in the oracle together."""
    li = table(spark, sf_dir, "lineitem")
    eps = 10.0 / _APCTL_ACC
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(_APCTL_ACC)
        ).alias("a50"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.95), F.lit(_APCTL_ACC)
        ).alias("a95"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("e95"),
        F.percentile("l_extendedprice", F.lit(0.5 - eps)).alias("lo50"),
        F.percentile("l_extendedprice", F.lit(0.5 + eps)).alias("hi50"),
        F.percentile("l_extendedprice", F.lit(0.95 - eps)).alias("lo95"),
        F.percentile("l_extendedprice", F.lit(0.95 + eps)).alias("hi95"),
    )
    return agg.select(
        "l_returnflag",
        stable_round(F.col("e50"), 4).alias("exact_p50"),
        stable_round(F.col("e95"), 4).alias("exact_p95"),
        (
            (F.col("a50") >= F.col("lo50")) & (F.col("a50") <= F.col("hi50"))
        ).alias("p50_in_bracket"),
        (
            (F.col("a95") >= F.col("lo95")) & (F.col("a95") <= F.col("hi95"))
        ).alias("p95_in_bracket"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the explicit multi-grain form (cube/rollup cousins above).
# ---------------------------------------------------------------------------

_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
"""


@query("agg_grouping_sets", _GROUPING_SETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four grains in one pass: Spark expands the sets with a single Expand
    node feeding one hash-aggregate — same plan shape as cube/rollup."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
          count(*) AS n_orders,
          round(sum(o_totalprice), 2) AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
    """)


# ---------------------------------------------------------------------------
# PIVOT — wide-format conditional aggregation.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders
GROUP BY o_orderpriority
"""


@query("agg_pivot_status_counts", _PIVOT_ORACLE)
def agg_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values — explicit values keep
    the plan single-pass (no extra distinct-collect job at scale)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


# ---------------------------------------------------------------------------
# null handling: na.fill / coalesce / null-aware aggregation.
# ---------------------------------------------------------------------------

_NA_ORACLE = """
WITH t AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null,
         o_totalprice
  FROM orders
)
SELECT
  CAST(count(*) AS BIGINT) AS total_rows,
  CAST(count(status_or_null) AS BIGINT) AS non_null_rows,
  CAST(sum(CASE WHEN status_or_null IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS null_rows,
  CAST(count(DISTINCT coalesce(status_or_null, 'OPEN')) AS BIGINT)
    AS distinct_filled
FROM t
"""


@query("agg_null_handling", _NA_ORACLE)
def agg_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    )
    filled = t.na.fill({"status_or_null": "OPEN"})
    return t.agg(
        F.count("*").alias("total_rows"),
        F.count("status_or_null").alias("non_null_rows"),
        F.sum(
            F.when(F.col("status_or_null").isNull(), 1).otherwise(0)
        ).alias("null_rows"),
    ).crossJoin(
        filled.agg(
            F.countDistinct("status_or_null").alias("distinct_filled")
        )
    )


# -- fixed-width value histogram + join-key skew diagnostics ------------------

_HISTOGRAM_ORACLE = """
-- DuckDB has no width_bucket; spell out its semantics over [0, 600000)
-- with 12 buckets (width 50000): underflow -> 0, overflow -> 13.
-- Boundaries are exact multiples of 50000, where both engines' float
-- forms agree exactly.
SELECT CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 13
            ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END
  AS bucket,
  CAST(count(*) AS BIGINT) AS n_orders,
  floor(min(o_totalprice) * 100 + 0.5) / 100 AS bucket_min,
  floor(max(o_totalprice) * 100 + 0.5) / 100 AS bucket_max
FROM orders
GROUP BY bucket
"""


@query("agg_value_histogram", _HISTOGRAM_ORACLE)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram via width_bucket — the one-pass
    distribution profile (map-side partial aggregate on a 12-ary bucket
    key; no sort, no window)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            stable_round(F.min("o_totalprice"), 2).alias("bucket_min"),
            stable_round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


_SKEW_ORACLE = """
WITH k AS (
  SELECT o_custkey, count(*) AS c FROM orders GROUP BY o_custkey
)
SELECT
  CAST(count(*) AS BIGINT) AS n_keys,
  CAST(max(c) AS BIGINT) AS max_per_key,
  floor(avg(c) * 10000 + 0.5) / 10000 AS avg_per_key,
  floor(max(c) / avg(c) * 10000 + 0.5) / 10000 AS skew_factor,
  CAST(count(CASE WHEN c > 2 * (SELECT avg(c) FROM k) THEN 1 END)
       AS BIGINT) AS heavy_keys
FROM k
"""


@query("diag_join_key_skew", _SKEW_ORACLE)
def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the report that decides whether a key
    needs salting (operators/joins.py::salted_join) or AQE skew-join
    handles it: per-key counts reduced to key-count stats + how many keys
    exceed 2× the mean.

    Scale shape: one partial-aggregated key rollup (|keys| rows), then a
    1-row global fold; the heavy-key threshold joins the tiny aggregate
    against its own 1-row mean via broadcast."""
    orders = table(spark, sf_dir, "orders")
    k = orders.groupBy("o_custkey").agg(F.count("*").alias("c"))
    mean = k.agg(F.avg("c").alias("mean_c"))
    return (
        k.crossJoin(F.broadcast(mean))
        .agg(
            F.count("*").alias("n_keys"),
            F.max("c").alias("max_per_key"),
            stable_round(F.avg("c"), 4).alias("avg_per_key"),
            stable_round(F.max("c") / F.first("mean_c"), 4).alias(
                "skew_factor"
            ),
            F.count(
                F.when(F.col("c") > 2 * F.col("mean_c"), 1)
            ).alias("heavy_keys"),
        )
    )


# ---------------------------------------------------------------------------
# winsorize + z-score feature normalization (two-pass: stats → apply)
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH clip AS (
  SELECT event_type,
         quantile_cont("value", 0.05) AS p05,
         quantile_cont("value", 0.95) AS p95
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_id, e.event_type, e."value",
         least(greatest(e."value", c.p05), c.p95) AS w
  FROM events e JOIN clip c USING (event_type)
),
stats AS (
  SELECT event_type, avg(w) AS mu, stddev_samp(w) AS sigma
  FROM clipped GROUP BY event_type
)
SELECT cl.event_id, cl.event_type, cl."value",
  floor(cl.w * 10000 + 0.5) / 10000 AS value_winsorized,
  floor((cl.w - s.mu) / nullif(s.sigma, 0) * 10000 + 0.5) / 10000 AS value_z
FROM clipped cl JOIN stats s USING (event_type)
"""


@query("agg_winsorize_zscore", _WINSORIZE_ORACLE)
def agg_winsorize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization: winsorize values to the exact
    [p05, p95] band, then z-score against the winsorized mean/stddev — the
    outlier-robust scaling step before features feed a model.

    Scale shape: the fact table is never shuffled — plan-verified: every
    Exchange carries only per-group aggregate state (percentile buffers,
    avg/m2), and both stats frames broadcast back onto plain fact scans
    (three cheap columnar scans total; cache the clipped frame to trade
    memory for one). At extreme group counts swap `percentile` for
    `percentile_approx` and re-tolerance. At 100 TB the three fact scans
    dominate — use ``agg_winsorize_zscore_onescan`` below (histogram
    sketch, one scan per stage) and accept bucket-edge clip bounds."""
    ev = table(spark, sf_dir, "events")
    clip = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    clipped = ev.join(F.broadcast(clip), "event_type").withColumn(
        "w", F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    )
    stats = clipped.groupBy("event_type").agg(
        F.avg("w").alias("mu"), F.stddev_samp("w").alias("sigma")
    )
    # nullif guard: a constant group has sigma 0; under ANSI mode the
    # bare division would RAISE (DuckDB returns NULL) — make both engines
    # emit NULL z for degenerate groups
    return clipped.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        stable_round(F.col("w"), 4).alias("value_winsorized"),
        stable_round(
            (F.col("w") - F.col("mu"))
            / F.nullif(F.col("sigma"), F.lit(0.0)),
            4,
        ).alias("value_z"),
    )


# One-scan-per-stage winsorize: the 100 TB form. The exact variant above
# reads the fact table three times (bounds, stats, apply); here ONE
# aggregate scan builds a per-(group, unit-bucket) histogram carrying
# (count, sum, sum²), from which BOTH the clip bounds and the clipped
# moments derive — the trick is snapping bounds to bucket EDGES, which
# makes the clipped sum/sum² EXACT given those bounds (below-bound rows
# contribute count·lo, above contribute count·hi, in-band rows their raw
# sums). The apply stage is then a single fact scan joined to the tiny
# per-group stats. Bounds are a deterministic histogram quantile (first
# bucket whose cumulative count reaches ceil(q·n)), so the whole pipeline
# replays in SQL — approximate vs the exact percentile variant only in
# where the clip lands (within one bucket width), never in arithmetic.
_WINSORIZE_1SCAN_ORACLE = """
WITH h AS (
  SELECT event_type, CAST(floor("value") AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS c,
         sum("value") AS s, sum("value" * "value") AS s2
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cc,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM h
),
bounds AS (
  SELECT event_type,
    CAST(min(CASE WHEN cc >= ceil(0.05 * n) THEN b END) AS DOUBLE) AS lo,
    CAST(min(CASE WHEN cc >= ceil(0.95 * n) THEN b END) + 1 AS DOUBLE) AS hi
  FROM cum GROUP BY event_type
),
stats AS (
  SELECT c.event_type, b.lo, b.hi, CAST(max(c.n) AS BIGINT) AS n,
    sum(CASE WHEN c.b < b.lo THEN c.c ELSE 0 END) * b.lo
      + sum(CASE WHEN c.b >= b.lo AND c.b < b.hi THEN c.s ELSE 0 END)
      + sum(CASE WHEN c.b >= b.hi THEN c.c ELSE 0 END) * b.hi AS sw,
    sum(CASE WHEN c.b < b.lo THEN c.c ELSE 0 END) * b.lo * b.lo
      + sum(CASE WHEN c.b >= b.lo AND c.b < b.hi THEN c.s2 ELSE 0 END)
      + sum(CASE WHEN c.b >= b.hi THEN c.c ELSE 0 END) * b.hi * b.hi AS sw2
  FROM cum c JOIN bounds b USING (event_type)
  GROUP BY c.event_type, b.lo, b.hi
)
SELECT e.event_id, e.event_type, e."value",
  floor(least(greatest(e."value", s.lo), s.hi) * 10000 + 0.5) / 10000
    AS value_winsorized,
  floor((least(greatest(e."value", s.lo), s.hi) - s.sw / s.n)
        / nullif(sqrt((s.sw2 - s.sw * s.sw / s.n) / nullif(s.n - 1, 0)), 0)
        * 10000 + 0.5)
    / 10000 AS value_z
FROM events e JOIN stats s USING (event_type)
"""


def histogram_winsorize_zscore(ev: DataFrame) -> DataFrame:
    """The histogram-sketch winsorize+z-score pipeline over any frame with
    ``(event_id, event_type, value)`` columns — factored out of the
    registered query so the hypothesis property test can drive it with
    adversarial generated groups (n=1, constant, negative, single-bucket)
    and compare against the DuckDB oracle on identical data."""
    from pyspark.sql import Window

    spark = ev.sparkSession
    h = ev.groupBy(
        "event_type", F.floor("value").alias("b")
    ).agg(
        F.count("*").alias("c"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    cum = h.withColumn(
        "cc",
        F.sum("c").over(
            Window.partitionBy("event_type")
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("c").over(Window.partitionBy("event_type")))
    bounds = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cc") >= F.ceil(0.05 * F.col("n")), F.col("b"))
        ).cast("double").alias("lo"),
        (
            F.min(
                F.when(F.col("cc") >= F.ceil(0.95 * F.col("n")), F.col("b"))
            ) + 1
        ).cast("double").alias("hi"),
    )
    below = F.col("b") < F.col("lo")
    above = F.col("b") >= F.col("hi")
    in_band = ~below & ~above
    stats = (
        cum.join(bounds, "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.max("n").alias("n"),
            (
                F.sum(F.when(below, F.col("c")).otherwise(0)) * F.col("lo")
                + F.sum(F.when(in_band, F.col("s")).otherwise(0.0))
                + F.sum(F.when(above, F.col("c")).otherwise(0)) * F.col("hi")
            ).alias("sw"),
            (
                F.sum(F.when(below, F.col("c")).otherwise(0))
                * F.col("lo") * F.col("lo")
                + F.sum(F.when(in_band, F.col("s2")).otherwise(0.0))
                + F.sum(F.when(above, F.col("c")).otherwise(0))
                * F.col("hi") * F.col("hi")
            ).alias("sw2"),
        )
        .collect()
    )
    sdf = spark.createDataFrame(
        stats,
        "event_type string, lo double, hi double, n bigint, "
        "sw double, sw2 double",
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    mu = F.col("sw") / F.col("n")
    # nullif guards: n=1 makes the variance denominator 0 and a constant
    # group makes sigma 0 — both would RAISE under ANSI mode; both
    # engines emit NULL z instead
    sigma = F.nullif(
        F.sqrt(
            (F.col("sw2") - F.col("sw") * F.col("sw") / F.col("n"))
            / F.nullif(F.col("n") - 1, F.lit(0).cast("bigint"))
        ),
        F.lit(0.0),
    )
    return ev.join(F.broadcast(sdf), "event_type").select(
        "event_id",
        "event_type",
        "value",
        stable_round(w, 4).alias("value_winsorized"),
        stable_round((w - mu) / sigma, 4).alias("value_z"),
    )


@query("agg_winsorize_zscore_onescan", _WINSORIZE_1SCAN_ORACLE)
def agg_winsorize_zscore_onescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch winsorize+z-score — one fact scan per stage (see
    the oracle comment for the edge-snapping trick that keeps clipped
    moments exact). Stage 1's group×bucket aggregate is tiny (groups ×
    value-range/width rows) and the per-group stats are collected —
    bounded by the group count, same stance as the BPE dictionary — so
    the RETURNED plan contains exactly ONE scan of the fact table
    (plan-pinned in tests/test_operators.py). At high group cardinality
    keep the stats as a broadcast join instead of collecting (two scans
    in one plan, still one per stage)."""
    return histogram_winsorize_zscore(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# per-column profiling report (Deequ-style DQ summary, one pass)
# ---------------------------------------------------------------------------

# numeric min/max ride in dedicated columns (timestamps as unix_micros) so
# no cross-engine string formatting is ever compared; string columns get
# lexicographic min/max in their own columns.
_PROFILE_ORACLE = """
SELECT 'o_orderkey' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nulls,
  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
  floor(avg(o_orderkey) * 10000 + 0.5) / 10000 AS mean,
  floor(stddev_samp(o_orderkey) * 10000 + 0.5) / 10000 AS stddev,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT o_custkey) AS BIGINT),
  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
  floor(avg(o_custkey) * 10000 + 0.5) / 10000,
  floor(stddev_samp(o_custkey) * 10000 + 0.5) / 10000,
  NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT o_totalprice) AS BIGINT),
  min(o_totalprice), max(o_totalprice),
  floor(avg(o_totalprice) * 10000 + 0.5) / 10000,
  floor(stddev_samp(o_totalprice) * 10000 + 0.5) / 10000,
  NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT o_orderdate) AS BIGINT),
  CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
  CAST(epoch_us(max(o_orderdate)) AS DOUBLE),
  NULL, NULL, NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
  NULL, NULL, NULL, NULL,
  min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
  NULL, NULL, NULL, NULL,
  min(o_orderpriority), max(o_orderpriority)
FROM orders
"""


@query("diag_column_profile", _PROFILE_ORACLE)
def diag_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profiling report over orders (the Deequ/ydata-style DQ
    summary): null count, exact distinct count, numeric min/max/mean/std
    (timestamps profiled as unix_micros), lexicographic min/max for
    strings — one row per column.

    Scale shape: ONE aggregation pass computes every metric for every
    column simultaneously (a single wide agg; the only shuffle carries
    one row of aggregate state per metric), then the 1×N row unpivots to
    the long report via stack — no per-column scans, no driver loops. At
    extreme column counts swap the exact countDistincts for
    approx_count_distinct.
    """
    orders = table(spark, sf_dir, "orders")

    def metrics(c: str, kind: str) -> list:
        num = (
            F.col(c).cast("double")
            if kind == "num"
            # .cast("timestamp") first: the scan yields TIMESTAMP_NTZ, which
            # unix_micros refuses; the UTC session tz makes the cast exact
            else F.unix_micros(F.col(c).cast("timestamp")).cast("double")
            if kind == "ts"
            else F.lit(None).cast("double")
        )
        return [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__n_nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(num).alias(f"{c}__min_num"),
            F.max(num).alias(f"{c}__max_num"),
            (
                stable_round(F.avg(num), 4)
                if kind == "num"
                else F.lit(None).cast("double")
            ).alias(f"{c}__mean"),
            (
                stable_round(F.stddev_samp(num), 4)
                if kind == "num"
                else F.lit(None).cast("double")
            ).alias(f"{c}__stddev"),
            (
                F.min(c) if kind == "str" else F.lit(None).cast("string")
            ).alias(f"{c}__min_str"),
            (
                F.max(c) if kind == "str" else F.lit(None).cast("string")
            ).alias(f"{c}__max_str"),
        ]

    cols = [
        ("o_orderkey", "num"), ("o_custkey", "num"), ("o_totalprice", "num"),
        ("o_orderdate", "ts"), ("o_orderstatus", "str"),
        ("o_orderpriority", "str"),
    ]
    aggs = [m for c, kind in cols for m in metrics(c, kind)]
    wide = orders.agg(*aggs)
    fields = [
        "n_rows", "n_nulls", "n_distinct", "min_num", "max_num",
        "mean", "stddev", "min_str", "max_str",
    ]
    stack_args = [
        arg
        for c, _ in cols
        for arg in (
            [F.lit(c)] + [F.col(f"{c}__{f}") for f in fields]
        )
    ]
    return wide.select(
        F.stack(F.lit(len(cols)), *stack_args).alias("col_name", *fields)
    )


# ---------------------------------------------------------------------------
# Benford first-digit distribution check (expected-distribution DQ)
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  -- floor() explicitly: DuckDB CAST(double AS BIGINT) rounds half-even
  -- while Spark's cast truncates — floor makes both engines agree
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs)
SELECT digit, n,
  floor(n / total * 1000000 + 0.5) / 1000000 AS observed_share,
  floor(log10(1.0 + 1.0 / digit) * 1000000 + 0.5) / 1000000
    AS expected_share,
  floor(power(n / total - log10(1.0 + 1.0 / digit), 2)
        / log10(1.0 + 1.0 / digit) * 1000000 + 0.5) / 1000000 AS chisq_term
FROM obs, tot
"""


@query("agg_benford_first_digit", _BENFORD_ORACLE)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-distribution DQ check: the first-significant-digit histogram
    of order totals against Benford's law, with per-digit chi-square terms —
    the classic fabricated-data / broken-upstream-generator tripwire.
    One hash aggregate on a 1-byte key plus a broadcast of the single-row
    total; the digit extraction is pure string math fused into the scan."""
    orders = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = obs.agg(F.sum("n").alias("total"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    share = F.col("n") / F.col("total")
    return obs.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        stable_round(share, 6).alias("observed_share"),
        stable_round(expected, 6).alias("expected_share"),
        stable_round(
            F.pow(share - expected, F.lit(2.0)) / expected, 6
        ).alias("chisq_term"),
    )


# -- exact WEIGHTED median, bounded-histogram two-phase ------------------------

# The weighted sibling of agg_percentiles (exact but group-sized sort
# state) and agg_winsorize_zscore_onescan (histogram quantile, bucket-
# edge approximate): EXACT weighted median in two bounded passes. Phase
# 1 aggregates the fact table to a (group, price-bucket) weight
# histogram and picks the bucket where the running weight crosses half
# (integer test 2·cw ≥ W — no division, no float). Phase 2 rescans ONLY
# rows in the chosen bucket, aggregates to in-bucket distinct values,
# and finds the smallest value whose cumulative weight (seeded with the
# weight BEFORE the bucket) crosses half — the exact lower weighted
# median, not a bucket edge. All weights/cums are exact integers; the
# reported median is a raw scanned data value, bit-identical on both
# engines. Window state: ≤ #buckets rows per group in phase 1,
# in-bucket distinct values in phase 2 — never a group-sized sort.
_WMEDIAN_BUCKET = 1000

_WMEDIAN_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g,
    CAST(floor(l_extendedprice / {_WMEDIAN_BUCKET}) AS BIGINT) AS b,
    l_extendedprice AS v,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
h AS (
  SELECT g, b, CAST(sum(w) AS BIGINT) AS ws FROM f GROUP BY g, b
),
cum AS (
  SELECT g, b, ws,
    CAST(sum(ws) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cw
  FROM h
),
tot AS (SELECT g, CAST(sum(ws) AS BIGINT) AS tw FROM h GROUP BY g),
pick AS (
  SELECT c.g, min(c.b) AS bstar, CAST(max(t.tw) AS BIGINT) AS tw
  FROM cum c JOIN tot t ON c.g = t.g
  WHERE 2 * c.cw >= t.tw
  GROUP BY c.g
),
pickfull AS (
  SELECT p.g, p.bstar, p.tw,
    CAST(c.cw - c.ws AS BIGINT) AS prev
  FROM pick p JOIN cum c ON c.g = p.g AND c.b = p.bstar
),
vals AS (
  SELECT f.g, f.v, p.prev, p.tw, CAST(sum(f.w) AS BIGINT) AS vw
  FROM f JOIN pickfull p ON f.g = p.g AND f.b = p.bstar
  GROUP BY f.g, f.v, p.prev, p.tw
),
cum2 AS (
  SELECT g, v, tw,
    prev + CAST(sum(vw) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
      AS cw2
  FROM vals
)
SELECT g AS l_returnflag,
  CAST(max(tw) AS BIGINT) AS total_weight,
  min(v) AS weighted_median
FROM cum2 WHERE 2 * cw2 >= tw GROUP BY g
"""


@query("agg_weighted_median_twophase", _WMEDIAN_ORACLE)
def agg_weighted_median_twophase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact quantity-WEIGHTED median price per return flag — the
    robust statistic the unweighted percentile family can't express
    (each line counts by its quantity, the "median unit price paid"
    question), computed at 100 TB shape: two fact scans, bounded
    window state, integer threshold tests (see oracle comment).
    Both phases replay in SQL; the median itself is a raw data value.
    The oracle's 2·cw ≥ W crossing is submitted to the shared
    ``_exact_rank_cut`` machinery as the equivalent rank test
    cw ≥ ⌈W/2⌉ (cw integral — same smallest-v)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    # Pinned (r15): tot (≤ |returnflag| rows) feeds the rank relation
    # AND the final join — invocation-scoped, so each bench run still
    # recomputes from parquet.
    tot = f.groupBy("g").agg(F.sum("w").alias("tw")).transform(invocation_pin)
    ranks = tot.select("g", F.expr("(tw + 1) div 2").alias("r"))
    cuts = _exact_rank_cut(f, ranks, w="w", bucket=_WMEDIAN_BUCKET)
    return (
        F.broadcast(tot)
        .join(cuts, "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("tw").alias("total_weight"),
            F.col("cut").alias("weighted_median"),
        )
    )


# -- exact weighted quantiles (p10/p50/p90) from ONE shared histogram ---------

# Generalization of agg_weighted_median_twophase: the 2·cw ≥ W median
# crossing is the p = 50 instance of the integer test 100·cw ≥ p·W
# (lower weighted p-quantile: smallest v whose cumulative weight
# reaches p% of the total). All three quantiles share the SAME phase-1
# histogram — one fact hash-agg + one bounded per-group cumulative —
# then cross-join the ≤ |groups|·|buckets| cum relation with the
# 3-row quantile literal set to pick each quantile's bucket. Phase 2 is
# again ONE fact rescan, joined to the broadcast (group, p, bucket)
# picks (a bucket picked by several quantiles re-aggregates per p —
# still ≤ 3 bucket-loads of rows per group). Integer headroom:
# 100·cw ≤ 100·Σ l_quantity ≈ 1.5e15 at 100 TB, far under 2^63; every
# threshold test is exact integer arithmetic, and the reported
# quantiles are raw scanned data values — bit-identical cross-engine
# with no rounding lattice. This is the length/quality tail-trim
# primitive (weighted p10/p90 cuts) the text-analysis north star uses.
_WQUANT_PS = (10, 50, 90)

_WQUANT_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g,
    CAST(floor(l_extendedprice / {_WMEDIAN_BUCKET}) AS BIGINT) AS b,
    l_extendedprice AS v,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
h AS (
  SELECT g, b, CAST(sum(w) AS BIGINT) AS ws FROM f GROUP BY g, b
),
cum AS (
  SELECT g, b, ws,
    CAST(sum(ws) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cw
  FROM h
),
tot AS (SELECT g, CAST(sum(ws) AS BIGINT) AS tw FROM h GROUP BY g),
ps AS (
  SELECT CAST(p AS BIGINT) AS p
  FROM (VALUES ({_WQUANT_PS[0]}), ({_WQUANT_PS[1]}), ({_WQUANT_PS[2]}))
    AS t(p)
),
pick AS (
  SELECT c.g, ps.p, min(c.b) AS bstar, CAST(max(t.tw) AS BIGINT) AS tw
  FROM cum c JOIN tot t ON c.g = t.g CROSS JOIN ps
  WHERE 100 * c.cw >= ps.p * t.tw
  GROUP BY c.g, ps.p
),
pickfull AS (
  SELECT p.g, p.p, p.bstar, p.tw,
    CAST(c.cw - c.ws AS BIGINT) AS prev
  FROM pick p JOIN cum c ON c.g = p.g AND c.b = p.bstar
),
vals AS (
  SELECT f.g, pk.p, f.v, pk.prev, pk.tw, CAST(sum(f.w) AS BIGINT) AS vw
  FROM f JOIN pickfull pk ON f.g = pk.g AND f.b = pk.bstar
  GROUP BY f.g, pk.p, f.v, pk.prev, pk.tw
),
cum2 AS (
  SELECT g, p, v, tw,
    prev + CAST(sum(vw) OVER (PARTITION BY g, p ORDER BY v) AS BIGINT)
      AS cw2
  FROM vals
),
qv AS (
  SELECT g, p, min(v) AS v
  FROM cum2 WHERE 100 * cw2 >= p * tw GROUP BY g, p
)
SELECT t.g AS l_returnflag,
  CAST(t.tw AS BIGINT) AS total_weight,
  max(CASE WHEN qv.p = 10 THEN qv.v END) AS p10,
  max(CASE WHEN qv.p = 50 THEN qv.v END) AS p50,
  max(CASE WHEN qv.p = 90 THEN qv.v END) AS p90
FROM qv JOIN tot t ON qv.g = t.g
GROUP BY t.g, t.tw
"""


@query("agg_weighted_quantiles", _WQUANT_ORACLE)
def agg_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted {p10, p50, p90} of price per return
    flag in the SAME two bounded passes as the weighted median — the
    weighted tail-cut primitive for length/quality trims. The oracle's
    integer crossing 100·cw ≥ p·W is submitted to the shared
    ``_exact_rank_cut`` machinery as the equivalent rank test
    cw ≥ ⌈p·W/100⌉ (cw integral, so the two are the same smallest-v;
    colliding ranks at tiny W dedup inside the helper and each p joins
    its cut back by (g, r)). See the oracle comment for the scale
    argument; p50 is definitionally equal to
    agg_weighted_median_twophase (pinned in pytest)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    tot = f.groupBy("g").agg(F.sum("w").alias("tw"))
    ps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(p)) for p in _WQUANT_PS])
        ).alias("p0")
    ).select(F.col("p0").cast("long").alias("p"))
    # Pinned (r15): pr (≤ 3·|returnflag| rows) feeds the rank relation
    # AND the qv join-back — invocation-scoped lazy checkpoint.
    pr = tot.crossJoin(F.broadcast(ps)).select(
        "g", "p", "tw", F.expr("(p * tw + 99) div 100").alias("r")
    ).transform(invocation_pin)
    cuts = _exact_rank_cut(
        f, pr.select("g", "r"), w="w", bucket=_WMEDIAN_BUCKET
    )
    qv = F.broadcast(pr).join(cuts, ["g", "r"]).select(
        "g", "p", "tw", F.col("cut").alias("v")
    )
    return (
        qv.groupBy("g", "tw")
        .agg(
            F.max(F.when(F.col("p") == 10, F.col("v"))).alias("p10"),
            F.max(F.when(F.col("p") == 50, F.col("v"))).alias("p50"),
            F.max(F.when(F.col("p") == 90, F.col("v"))).alias("p90"),
        )
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("tw").alias("total_weight"),
            "p10",
            "p50",
            "p90",
        )
    )


# -- exact 10-90 trimmed mean (order-statistics exact, tie-aware) --------------

# The third member of the bounded-histogram two-phase family (weighted
# median r9, weighted quantiles r10): the exact 10%-each-side TRIMMED
# MEAN per group. Definition (order statistics, n rows per group,
# lo = n div 10): drop ranks 1..lo and n-lo+1..n, average the rest.
# Rank-cut VALUES come from the same two-phase machinery with unit
# weights and ABSOLUTE rank thresholds (cn >= r for r = lo and n-lo —
# per-group ranks from a broadcast 2-row-per-group relation, vs the
# quantile family's global p literals); a third bounded rescan then
# computes the strict-side tail sums, and the tie-aware identity
#
#   trimmed_sum = S - [sum(c < clo) + (lo - cnt(c < clo))*clo]
#               - [sum(c > chi) + (lo - cnt(c > chi))*chi]
#
# charges ties AT the cut values exactly (copies of clo fill ranks
# cnt(<clo)+1.., so exactly lo - cnt(<clo) of them are trimmed; the
# mirrored argument tops out at chi = the rank-(n-lo) value, the
# LARGEST KEPT value, so hi-side works even when lo = 0).
#
# Determinism: everything is int64 — prices become cents via the
# established floor(x*100 + 0.5) lattice, all sums/counts/thresholds
# are exact integers (headroom: cents-sum <= 6e9 rows * 1.1e7 cents
# ~ 6.6e16 << 2^63 at 100 TB), and the ONLY float op is the final
# double division chain (correctly rounded, identical shape both
# engines). kept = n - 2*(n div 10) >= ceil(0.8 n) >= 1 for n >= 1, so
# the ANSI division needs no NULLIF guard. Scale: three fact scans,
# all partial+final hash-aggs; both windows are bounded (per-group
# bucket relation <= ~110 rows; in-bucket distinct cents <=
# _TRIM_BUCKET_C = 100000) and every join-back side is broadcast.
_TRIM_BUCKET_C = 100 * _WMEDIAN_BUCKET

_TRIMMED_MEAN_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
fb AS (
  SELECT g, c, CAST(floor(c / {_TRIM_BUCKET_C}) AS BIGINT) AS b FROM f
),
h AS (
  SELECT g, b, CAST(count(*) AS BIGINT) AS ns,
    CAST(sum(c) AS BIGINT) AS cs
  FROM fb GROUP BY g, b
),
tl AS (
  SELECT g, CAST(sum(ns) AS BIGINT) AS n, CAST(sum(cs) AS BIGINT) AS s,
    CAST(sum(ns) // 10 AS BIGINT) AS lo
  FROM h GROUP BY g
),
ranks AS (
  SELECT g, 'lo' AS side, lo AS r FROM tl
  UNION ALL
  SELECT g, 'hi' AS side, n - lo AS r FROM tl
),
cum AS (
  SELECT g, b, ns,
    CAST(sum(ns) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cn
  FROM h
),
pick AS (
  SELECT c.g, rk.side, rk.r, min(c.b) AS bstar
  FROM cum c JOIN ranks rk ON c.g = rk.g
  WHERE c.cn >= rk.r
  GROUP BY c.g, rk.side, rk.r
),
pickfull AS (
  SELECT p.g, p.side, p.r, p.bstar,
    CAST(c.cn - c.ns AS BIGINT) AS prev
  FROM pick p JOIN cum c ON c.g = p.g AND c.b = p.bstar
),
vals AS (
  SELECT fb.g, pk.side, pk.r, pk.prev, fb.c,
    CAST(count(*) AS BIGINT) AS vc
  FROM fb JOIN pickfull pk ON fb.g = pk.g AND fb.b = pk.bstar
  GROUP BY fb.g, pk.side, pk.r, pk.prev, fb.c
),
cum2 AS (
  SELECT g, side, r, c,
    prev + CAST(sum(vc) OVER (PARTITION BY g, side ORDER BY c)
      AS BIGINT) AS cn2
  FROM vals
),
cuts AS (
  SELECT g, side, min(c) AS cut FROM cum2 WHERE cn2 >= r
  GROUP BY g, side
),
cutrow AS (
  SELECT g,
    max(CASE WHEN side = 'lo' THEN cut END) AS clo,
    max(CASE WHEN side = 'hi' THEN cut END) AS chi
  FROM cuts GROUP BY g
),
tails AS (
  SELECT fb.g,
    CAST(sum(CASE WHEN fb.c < cr.clo THEN fb.c ELSE 0 END)
      AS BIGINT) AS sb,
    CAST(sum(CASE WHEN fb.c < cr.clo THEN 1 ELSE 0 END)
      AS BIGINT) AS nb,
    CAST(sum(CASE WHEN fb.c > cr.chi THEN fb.c ELSE 0 END)
      AS BIGINT) AS sa,
    CAST(sum(CASE WHEN fb.c > cr.chi THEN 1 ELSE 0 END)
      AS BIGINT) AS na,
    max(cr.clo) AS clo, max(cr.chi) AS chi
  FROM fb JOIN cutrow cr ON fb.g = cr.g
  GROUP BY fb.g
)
SELECT t.g AS l_returnflag,
  tl.n AS n_lines,
  tl.n - 2 * tl.lo AS kept_lines,
  t.clo AS low_cut_cents,
  t.chi AS high_cut_cents,
  CAST(tl.s - t.sb - (tl.lo - t.nb) * t.clo
       - t.sa - (tl.lo - t.na) * t.chi AS DOUBLE)
    / CAST(100 AS DOUBLE) / (tl.n - 2 * tl.lo) AS trimmed_mean
FROM tails t JOIN tl ON t.g = tl.g
"""


@query("agg_trimmed_mean_exact", _TRIMMED_MEAN_ORACLE)
def agg_trimmed_mean_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware 10-90 trimmed mean of price per return flag —
    the robust location estimate between the median (100% trim) and
    the mean (0%), at 100 TB shape: four bounded fact hash-aggs
    (group count, shared-machinery histogram + bucket rescan, tail
    sums), all arithmetic in int64 cents. Rank cuts come from the shared
    ``_exact_rank_cut`` machinery (ranks n div 10 and n − n div 10 —
    distinct for every n ≥ 1, since 2·(n div 10) < n, so the rank→side
    mapping below is unambiguous). See the oracle comment for the
    rank-cut identity and the scale/determinism argument."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
    )
    # Pinned (r15): tl feeds the rank relation and the cut join-back —
    # invocation-scoped lazy checkpoint (≤ |returnflag| rows).
    tl = (
        f.groupBy("g")
        .agg(F.count("*").alias("n"))
        .withColumn("lo", F.expr("n div 10"))
    ).transform(invocation_pin)
    # per-group rank thresholds as ONE exploded array (the
    # union-replays-the-plan-twice trap)
    ranks = tl.select(
        "g",
        F.explode(
            F.array(F.col("lo"), F.col("n") - F.col("lo"))
        ).alias("r"),
    )
    cuts = _exact_rank_cut(f, ranks)
    # map ranks back to sides and carry n/lo so the final projection
    # needs NO further join (the group sum rides the tails scan)
    cutrow = (
        F.broadcast(tl)
        .join(cuts, "g")
        .groupBy("g", "n", "lo")
        .agg(
            F.max(
                F.when(F.col("r") == F.col("lo"), F.col("cut"))
            ).alias("clo"),
            F.max(
                F.when(
                    F.col("r") == F.col("n") - F.col("lo"), F.col("cut")
                )
            ).alias("chi"),
        )
    )
    cut2 = cutrow.select(
        F.col("g").alias("cg"), "n", "lo", "clo", "chi"
    )
    tails = (
        f.join(F.broadcast(cut2), F.col("g") == F.col("cg"))
        .groupBy("g", "n", "lo", "clo", "chi")
        .agg(
            F.sum("c").alias("s"),
            F.sum(
                F.when(F.col("c") < F.col("clo"), F.col("c")).otherwise(0)
            ).alias("sb"),
            F.sum(
                F.when(F.col("c") < F.col("clo"), 1).otherwise(0)
            ).alias("nb"),
            F.sum(
                F.when(F.col("c") > F.col("chi"), F.col("c")).otherwise(0)
            ).alias("sa"),
            F.sum(
                F.when(F.col("c") > F.col("chi"), 1).otherwise(0)
            ).alias("na"),
        )
    )
    trimmed_cents = (
        F.col("s")
        - F.col("sb")
        - (F.col("lo") - F.col("nb")) * F.col("clo")
        - F.col("sa")
        - (F.col("lo") - F.col("na")) * F.col("chi")
    )
    kept = F.col("n") - F.lit(2) * F.col("lo")
    return tails.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").alias("n_lines"),
        kept.alias("kept_lines"),
        F.col("clo").alias("low_cut_cents"),
        F.col("chi").alias("high_cut_cents"),
        (
            trimmed_cents.cast("double")
            / F.lit(100).cast("double")
            / kept
        ).alias("trimmed_mean"),
    )


# -- exact MAD + robust z-score outlier count ----------------------------------

def _exact_rank_cut(
    vals: DataFrame,
    ranks: DataFrame,
    w: str | None = None,
    bucket: int = _TRIM_BUCKET_C,
    pin: bool = False,
) -> DataFrame:
    """Exact per-(group, rank) order statistic via the bounded-
    histogram two-phase: for each (g, r) row in ``ranks`` (a
    broadcastable relation — one or SEVERAL distinct ranks per group),
    the smallest ``c`` in ``vals(g, c[, w])`` whose cumulative weight
    reaches r; weight is the row count when ``w`` is None, else
    ``sum(vals[w])``. PRECONDITION (r16, from the r15 ADVICE): every
    per-row weight must be ≥ 1 — the crossing-row filters below are
    unique selectors only while cumulative weights STRICTLY increase
    (a zero-weight histogram row would satisfy neither ``cn ≥ rr AND
    cn − ns < rr`` side consistently and could drop or duplicate a
    (g, r) cut). All current callers pass count(*) or l_quantity
    (integers ≥ 1); a caller with fractional or zero weights must
    filter ``w > 0`` rows out first and use unit-scaled weights.
    Returns (g, r, cut); equal ranks dedup, so
    callers join cuts back by (g, r). The ONE shared implementation of
    the rank machinery behind the weighted median (r = ⌈W/2⌉), the
    weighted quantiles (r = ⌈p·W/100⌉), the trimmed mean (r = n div
    10 and n − n div 10) and MAD's two chained medians. Scale: one
    fact hash-agg histogram, one bucket-pruned rescan; both windows
    bounded (per-group buckets ≤ value-range/``bucket``; in-bucket
    distinct values ≤ bucket width) and the cum2 stream is keyed per
    (g, r) so several ranks never share a crossing.

    Shape (r15 optimization): both phases pick their crossing ROW
    directly — the smallest b with cn ≥ r is the UNIQUE row with
    cn ≥ r AND cn − ns < r (per-group cumulative weights are strictly
    increasing: every histogram row carries ns ≥ 1) — so the old
    min-then-join-back (a groupBy exchange plus a SECOND reference of
    the cumulative relation, which Catalyst re-derives wholesale; the
    MAD consumer compiled to 44 fact scans / 116 exchanges) collapses
    to one filter per phase and each derived relation is referenced
    exactly once. Ranks ≤ 0 (trimmed-mean lo = 0 on sub-10-row
    groups) clamp to 1 for the crossing test only — same first-bucket
    /smallest-value result as the old min-with-cn≥0 — while the
    caller-facing r is carried through untouched. ``pin=True``
    materializes the ≤ |g|·|ranks|-row output once per invocation
    (LAZY localCheckpoint — computed inside the consumer's single
    action) for callers that re-reference the cut relation. A session
    ``.persist()`` is deliberately NOT used anywhere in this helper:
    besides measuring slower here (cache build cost on relations used
    once), a leaked persist lets a LATER invocation of the same query
    read this run's cache through Catalyst plan-fragment matching —
    a bench's warm re-run must recompute from parquet."""
    from pyspark.sql import Window

    def wagg():
        return F.count("*") if w is None else F.sum(w)

    f = vals.withColumn(
        "b", F.floor(F.col("c") / F.lit(bucket)).cast("long")
    )
    h = f.groupBy("g", "b").agg(wagg().alias("ns"))
    cum = h.withColumn(
        "cn", F.sum("ns").over(Window.partitionBy("g").orderBy("b"))
    )
    # equal ranks dedup here (the old groupBy(g, r) pick did it
    # implicitly); rr is the crossing-test rank, r the caller join key
    rset = ranks.dropDuplicates(["g", "r"]).select(
        "g", "r", F.greatest(F.col("r"), F.lit(1)).alias("rr")
    )
    picked = (
        cum.join(F.broadcast(rset), "g")
        .filter(
            (F.col("cn") >= F.col("rr"))
            & (F.col("cn") - F.col("ns") < F.col("rr"))
        )
        .select(
            F.col("g").alias("pg"),
            F.col("r").alias("pr"),
            F.col("rr").alias("prr"),
            F.col("b").alias("pb"),
            (F.col("cn") - F.col("ns")).alias("prev"),
        )
    )
    vcounts = (
        f.join(
            F.broadcast(picked),
            (F.col("g") == F.col("pg")) & (F.col("b") == F.col("pb")),
        )
        .groupBy(
            "g",
            F.col("pr").alias("r"),
            F.col("prr").alias("rr"),
            "prev",
            "c",
        )
        .agg(wagg().alias("vc"))
    )
    cum2 = vcounts.withColumn(
        "cn2",
        F.col("prev")
        + F.sum("vc").over(Window.partitionBy("g", "r").orderBy("c")),
    )
    out = cum2.filter(
        (F.col("cn2") >= F.col("rr"))
        & (F.col("cn2") - F.col("vc") < F.col("rr"))
    ).select("g", "r", F.col("c").alias("cut"))
    return out.transform(invocation_pin) if pin else out


# MAD (median absolute deviation) is THE robust spread statistic — the
# stddev-based z-score family (winsorize/anomaly) breaks down the
# moment outliers inflate the stddev itself; MAD has a 50% breakdown
# point. Two CHAINED exact medians via _exact_rank_cut (the deviation
# median cannot start until the location median is known — 4 bounded
# fact scans + 1 outlier-count scan, all hash-aggs), then the classic
# robust z test |x − med| > 3·1.4826·MAD applied as the EXACT integer
# comparison 10000·d > 44478·mad (d ≤ 1.1e7 cents → 10000·d ≤ 1.1e11
# and 44478·mad ≤ 4.9e11, far inside int64; the 1.4826 normal-
# consistency constant never touches a float). Lower-median rank
# rm = (n+1) div 2 on both passes. The only float op is the reported
# outlier_ratio division (n ≥ 1 provably — it's the group's row
# count). Oracle replays both chained medians in full.
_MAD_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
fb AS (
  SELECT g, c, CAST(floor(c / {_TRIM_BUCKET_C}) AS BIGINT) AS b FROM f
),
h AS (
  SELECT g, b, CAST(count(*) AS BIGINT) AS ns FROM fb GROUP BY g, b
),
tl AS (
  SELECT g, CAST(sum(ns) AS BIGINT) AS n,
    CAST((sum(ns) + 1) // 2 AS BIGINT) AS rm
  FROM h GROUP BY g
),
cum AS (
  SELECT g, b, ns,
    CAST(sum(ns) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cn
  FROM h
),
pick AS (
  SELECT c.g, t.rm, min(c.b) AS bstar
  FROM cum c JOIN tl t ON c.g = t.g
  WHERE c.cn >= t.rm GROUP BY c.g, t.rm
),
pickfull AS (
  SELECT p.g, p.rm, p.bstar, CAST(c.cn - c.ns AS BIGINT) AS prev
  FROM pick p JOIN cum c ON c.g = p.g AND c.b = p.bstar
),
vals AS (
  SELECT fb.g, pk.rm, pk.prev, fb.c, CAST(count(*) AS BIGINT) AS vc
  FROM fb JOIN pickfull pk ON fb.g = pk.g AND fb.b = pk.bstar
  GROUP BY fb.g, pk.rm, pk.prev, fb.c
),
cum2 AS (
  SELECT g, rm, c,
    prev + CAST(sum(vc) OVER (PARTITION BY g ORDER BY c) AS BIGINT)
      AS cn2
  FROM vals
),
med AS (
  SELECT g, min(c) AS medc FROM cum2 WHERE cn2 >= rm GROUP BY g
),
d AS (
  SELECT f.g, abs(f.c - m.medc) AS c
  FROM f JOIN med m ON f.g = m.g
),
db AS (
  SELECT g, c, CAST(floor(c / {_TRIM_BUCKET_C}) AS BIGINT) AS b FROM d
),
dh AS (
  SELECT g, b, CAST(count(*) AS BIGINT) AS ns FROM db GROUP BY g, b
),
dcum AS (
  SELECT g, b, ns,
    CAST(sum(ns) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cn
  FROM dh
),
dpick AS (
  SELECT c.g, t.rm, min(c.b) AS bstar
  FROM dcum c JOIN tl t ON c.g = t.g
  WHERE c.cn >= t.rm GROUP BY c.g, t.rm
),
dpickfull AS (
  SELECT p.g, p.rm, p.bstar, CAST(c.cn - c.ns AS BIGINT) AS prev
  FROM dpick p JOIN dcum c ON c.g = p.g AND c.b = p.bstar
),
dvals AS (
  SELECT db.g, pk.rm, pk.prev, db.c, CAST(count(*) AS BIGINT) AS vc
  FROM db JOIN dpickfull pk ON db.g = pk.g AND db.b = pk.bstar
  GROUP BY db.g, pk.rm, pk.prev, db.c
),
dcum2 AS (
  SELECT g, rm, c,
    prev + CAST(sum(vc) OVER (PARTITION BY g ORDER BY c) AS BIGINT)
      AS cn2
  FROM dvals
),
mad AS (
  SELECT g, min(c) AS madc FROM dcum2 WHERE cn2 >= rm GROUP BY g
),
outl AS (
  SELECT f.g,
    CAST(sum(CASE WHEN 10000 * abs(f.c - m.medc) > 44478 * md.madc
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
    max(m.medc) AS medc, max(md.madc) AS madc
  FROM f JOIN med m ON f.g = m.g JOIN mad md ON f.g = md.g
  GROUP BY f.g
)
SELECT o.g AS l_returnflag, t.n AS n_lines,
  o.medc AS median_cents, o.madc AS mad_cents, o.n_outliers,
  CAST(o.n_outliers AS DOUBLE) / t.n AS outlier_ratio
FROM outl o JOIN tl t ON o.g = t.g
"""


@query("agg_mad_robust_z", _MAD_ORACLE)
def agg_mad_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MAD (median absolute deviation) of price per return flag
    plus the robust-z outlier count |x − med| > 3·1.4826·MAD as an
    exact integer test — the 50%-breakdown spread statistic the
    stddev-based anomaly family can't provide. Two chained exact
    medians through ``_exact_rank_cut``; see the oracle comment for
    the scan count and integer-headroom argument."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
    )
    # Pinned (r15): tl (≤ |returnflag| rows) feeds both chained rank
    # cuts AND the final join, and med feeds the deviation relation
    # (which the MAD cut's two phases each reference) AND the final
    # cuts join — unpinned, Catalyst re-derives each subtree per
    # reference (44 fact scans / 116 exchanges compiled; 6 fact scans
    # after pinning). Lazy localCheckpoint: materialized once inside
    # the consumer's action, invocation-scoped (no session cache for a
    # later bench run to read through plan matching).
    tl = (
        f.groupBy("g")
        .agg(F.count("*").alias("n"))
        .withColumn("r", F.expr("(n + 1) div 2"))
    ).transform(invocation_pin)
    med = _exact_rank_cut(f, tl.select("g", "r"), pin=True).withColumnRenamed(
        "cut", "medc"
    )
    medb = med.select(F.col("g").alias("mg"), "medc")
    d = f.join(F.broadcast(medb), F.col("g") == F.col("mg")).select(
        "g", F.abs(F.col("c") - F.col("medc")).alias("c")
    )
    mad = _exact_rank_cut(d, tl.select("g", "r")).withColumnRenamed(
        "cut", "madc"
    )
    cuts = F.broadcast(medb).join(
        mad.select(F.col("g").alias("mg"), "madc"), "mg"
    )
    outl = (
        f.join(F.broadcast(cuts), F.col("g") == F.col("mg"))
        .groupBy("g")
        .agg(
            F.sum(
                F.when(
                    F.lit(10000) * F.abs(F.col("c") - F.col("medc"))
                    > F.lit(44478) * F.col("madc"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            F.max("medc").alias("medc"),
            F.max("madc").alias("madc"),
        )
    )
    return (
        outl.join(F.broadcast(tl.select("g", "n")), "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n").alias("n_lines"),
            F.col("medc").alias("median_cents"),
            F.col("madc").alias("mad_cents"),
            F.col("n_outliers"),
            (F.col("n_outliers").cast("double") / F.col("n")).alias(
                "outlier_ratio"
            ),
        )
    )


# -- Poisson-bootstrap confidence intervals (one-pass resampling) --------------

# THE distributed bootstrap: per (row, replicate) Poisson(1) weights
# approximate with-replacement resampling without materializing B
# copies of the data in any shuffle — the ONE exploded hash-agg
# combines map-side, so only |groups|·B partial rows ever move. Each
# weight is deterministic: a pure-int64 mix of (row key, replicate,
# seed) — the affine key mix is XORed with rep·2654435761 (the XOR is
# the essential NONLINEARITY: a purely affine chain leaves each key's
# replicate buckets an arithmetic progression mod 1e6 — stride 93 in
# the first cut — which correlates weights across replicates and
# biased a planted CI clean off its mean; Knuth's 2654435761 spreads
# the rep axis, two ·1000003 mod 2^31−1 rounds then mix bits; every
# intermediate < 2.2e15, far inside int64; orderkey reduced mod
# 2^31−1 first so the mix is well-defined at any scale), then
# mod 1e6 through the INTEGER inverse-CDF ladder
# 367879/735758/919698/981011/996340/999405/999916 = the cumulative
# Poisson(1) probabilities ×1e6, tail folded into k=7. Pure integer
# arithmetic keeps the 24M-row (sf0.1·B) weight derivation inside
# whole-stage codegen on the Spark side and vectorized in DuckDB —
# the md5-per-row alternative costs ~100× here — and empirically the
# mix hits the Poisson marginals (p0 .3684 vs e⁻¹ .3679, per-replicate
# mean weights 0.982-1.009 at sf0.01·B = 2.4M draws; a diagnostic op
# needs fair resamples, not cryptographic hashing). Both engines draw
# bit-identical resamples and the oracle replays the ENTIRE
# resampling: explode → mix → weight → replicate means →
# rank-crossing CI. Replicate means are one division of exact int64
# sums; the 90% CI picks the means at ranks ⌈0.05·B'⌉ / ⌈0.95·B'⌉ via
# the tie-safe RANGE-frame cumulative count (B' = replicates with
# positive total weight — a replicate can zero out only on tiny
# groups; groups whose every replicate zeroes out drop identically on
# both engines). The means window is over ≤ B = 40 rows per group
# (bounded, cited). Integer headroom: w ≤ 7, so Σ w·c ≤ 7·(cents sum)
# ≈ 4.6e17 < 2^63 at 100 TB.
_BOOT_B = 40
_BOOT_SEED = 7
_POIS_T = (367879, 735758, 919698, 981011, 996340, 999405, 999916)

_BOOT_CASE = " ".join(
    f"WHEN bkt < {t} THEN {i}" for i, t in enumerate(_POIS_T)
)

_BOOT_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g, l_orderkey AS ok, l_linenumber AS ln,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
e AS (
  SELECT g, c, ok, ln, u.rep
  FROM f, unnest(generate_series(1, {_BOOT_B})) AS u(rep)
),
wts AS (
  SELECT g, c, rep,
    CASE {_BOOT_CASE} ELSE 7 END AS w
  FROM (
    SELECT g, c, rep,
      (xor(((ok % 2147483647) * 1000003 + ln) % 2147483647,
           rep * 2654435761 + {_BOOT_SEED}) % 2147483647
       * 1000003 % 2147483647 * 1000003) % 2147483647 % 1000000 AS bkt
    FROM e
  )
),
reps AS (
  SELECT g, rep, CAST(sum(w) AS BIGINT) AS nw,
    CAST(sum(w * c) AS BIGINT) AS sw
  FROM wts GROUP BY g, rep
),
means AS (
  SELECT g, rep, CAST(sw AS DOUBLE) / nw / CAST(100 AS DOUBLE) AS m
  FROM reps WHERE nw > 0
),
bp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS bprime FROM means GROUP BY g
),
cums AS (
  SELECT g, m, count(*) OVER (PARTITION BY g ORDER BY m) AS cum
  FROM means
),
ci AS (
  SELECT c.g,
    max(b.bprime) AS ci_replicates,
    min(CASE WHEN c.cum >= (5 * b.bprime + 99) // 100 THEN c.m END)
      AS ci_lo,
    min(CASE WHEN c.cum >= (95 * b.bprime + 99) // 100 THEN c.m END)
      AS ci_hi
  FROM cums c JOIN bp b ON c.g = b.g
  GROUP BY c.g
),
tot AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s
  FROM f GROUP BY g
)
SELECT t.g AS l_returnflag, t.n AS n_lines,
  CAST(t.s AS DOUBLE) / t.n / CAST(100 AS DOUBLE) AS mean_price,
  ci.ci_replicates, ci.ci_lo, ci.ci_hi
FROM tot t JOIN ci ON t.g = ci.g
"""


def _boot_weights(f: DataFrame, seed: int) -> DataFrame:
    """Shared resampling core of the diag_bootstrap_* family: explode
    ``f`` (columns g, ok, ln + payload) × B replicates and attach the
    deterministic Poisson(1) weight ``w`` from the pure-int64
    XOR-multiplicative mix (see the diag_bootstrap_ci oracle comment
    for the nonlinearity/headroom arguments). All codegen-friendly
    integer ops — the exploded relation never shuffles; the caller's
    hash-agg combines it map-side."""
    e = f.select(
        "*",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("rep"),
    )
    bkt = F.expr(
        "((((ok % 2147483647) * 1000003 + ln) % 2147483647)"
        f" ^ (rep * 2654435761 + {seed})) % 2147483647"
        " * 1000003 % 2147483647 * 1000003 % 2147483647 % 1000000"
    )
    w = F.lit(7)
    for i, t in reversed(list(enumerate(_POIS_T))):
        w = F.when(F.col("bkt") < t, i).otherwise(w)
    return e.withColumn("bkt", bkt).withColumn("w", w)


def _boot_rank_ci(means: DataFrame) -> DataFrame:
    """Shared 90% rank-crossing CI over per-(g, replicate) statistics
    ``means(g, m)``: tie-safe RANGE-frame cumulative count, endpoints
    at ranks ⌈0.05·B'⌉ / ⌈0.95·B'⌉. The window is over ≤ B = 40
    replicate statistics per group (bounded, cited)."""
    from pyspark.sql import Window

    bp = means.groupBy("g").agg(F.count("*").alias("bprime"))
    # RANGE-frame cumulative count: ties share cum = #(means <= m)
    cums = means.withColumn(
        "cum", F.count("*").over(Window.partitionBy("g").orderBy("m"))
    )
    return (
        cums.join(F.broadcast(bp), "g")
        .groupBy("g")
        .agg(
            F.max("bprime").alias("ci_replicates"),
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr("(5 * bprime + 99) div 100"),
                    F.col("m"),
                )
            ).alias("ci_lo"),
            F.min(
                F.when(
                    F.col("cum")
                    >= F.expr("(95 * bprime + 99) div 100"),
                    F.col("m"),
                )
            ).alias("ci_hi"),
        )
    )


@query("diag_bootstrap_ci", _BOOT_ORACLE)
def diag_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% Poisson-bootstrap confidence interval for the mean price per
    return flag — one-pass distributed resampling (B = 40 deterministic
    hash-seeded Poisson(1) replicates, exact integer weights and sums;
    see the oracle comment). The uncertainty-quantification primitive a
    pipeline needs before acting on a metric shift: a drifted mean
    whose CI still overlaps baseline is noise, not signal."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
    )
    wts = _boot_weights(f, _BOOT_SEED)
    reps = wts.groupBy("g", "rep").agg(
        F.sum("w").alias("nw"),
        F.sum(F.col("w") * F.col("c")).alias("sw"),
    )
    means = reps.filter(F.col("nw") > 0).select(
        "g",
        (
            F.col("sw").cast("double")
            / F.col("nw")
            / F.lit(100).cast("double")
        ).alias("m"),
    )
    ci = _boot_rank_ci(means)
    tot = f.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("c").alias("s")
    )
    return (
        tot.join(F.broadcast(ci), "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n").alias("n_lines"),
            (
                F.col("s").cast("double")
                / F.col("n")
                / F.lit(100).cast("double")
            ).alias("mean_price"),
            "ci_replicates",
            "ci_lo",
            "ci_hi",
        )
    )


# -- exact WEIGHTED 10-90 trimmed mean (weights × rank machinery) --------------

# Composition of the two r10 threads: agg_trimmed_mean_exact's tie-aware
# trim identity with agg_weighted_quantiles' weighted rank cuts, closing
# the robust-location family (median → trimmed mean → mean, each in
# unit- and weighted form). Each row counts by its l_quantity — "trim
# the cheapest/priciest 10% of UNITS sold, average the rest" — so the
# estimate is robust to a few extreme-priced lines however many rows
# they span. Definitions (per group, W = Σw, lo = W div 10):
# drop the bottom lo and top lo weight-units of the value-ordered
# multiset, average the remaining W − 2·lo units. The weighted rank
# cuts come from the SAME _exact_rank_cut machinery (w column, absolute
# ranks lo and W − lo broadcast as an exploded 2-struct relation — lo
# never equals W − lo since 2·(W div 10) < W for W ≥ 1), and the
# tie-aware identity charges partial weight at the cut values exactly:
#
#   trimmed_wsum = S − [Sb + (lo − Wb)·clo] − [Sa + (lo − Wa)·chi]
#
# with S = Σ w·c, (Sb, Wb) = weighted sum/weight strictly below clo,
# (Sa, Wa) strictly above chi. Bottom: cw(pred(clo)) = Wb < lo ≤
# cw(clo), so exactly lo − Wb ∈ [0, weight at clo] units of clo are
# trimmed (lo = 0 degrades: clo = min value, Wb = Sb = 0, zero charge —
# the plain weighted mean). Top: chi is the value at weighted rank
# W − lo (largest KEPT value), Wa = W − cw(chi) ≤ lo, so lo − Wa units
# of chi go; when clo = chi (one distinct kept value c*) the two
# charges still total exactly W − 2·lo units of c* (the identity is
# additive, never double-counts). kept = W − 2·(W div 10) ≥ ⌈0.8·W⌉ ≥ 1
# for W ≥ 1, so the final division needs no NULLIF.
#
# Determinism: all-int64 — cents lattice floor(x·100 + 0.5), integer
# weights, exact integer sums/thresholds; the ONLY float op is the
# final division chain (identical shape both engines). Integer
# headroom at 100 TB: w ≤ 50, c ≤ 1.1e7 cents → Σ w·c ≤ 6e9 rows ×
# 5.5e8 ≈ 3.3e18 < 2^63 (2.8× headroom; the unit version's 6.6e16 ×
# the 50-unit max quantity). Scale: three fact scans (totals histogram
# via the shared machinery + bucket rescan + tails), all partial+final
# hash-aggs; every join-back side broadcast; both windows bounded
# (per-group buckets ≤ value-range/_TRIM_BUCKET_C, in-bucket distinct
# cents ≤ bucket width) — the agg_trimmed_mean_exact shape with w
# riding every aggregate.
_WTRIM_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
    CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
),
fb AS (
  SELECT g, c, w, CAST(floor(c / {_TRIM_BUCKET_C}) AS BIGINT) AS b
  FROM f
),
h AS (
  SELECT g, b, CAST(sum(w) AS BIGINT) AS ns FROM fb GROUP BY g, b
),
tl AS (
  SELECT g, CAST(sum(ns) AS BIGINT) AS tw,
    CAST(sum(ns) // 10 AS BIGINT) AS lo
  FROM h GROUP BY g
),
ranks AS (
  SELECT g, 'lo' AS side, lo AS r FROM tl
  UNION ALL
  SELECT g, 'hi' AS side, tw - lo AS r FROM tl
),
cum AS (
  SELECT g, b, ns,
    CAST(sum(ns) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cn
  FROM h
),
pick AS (
  SELECT c.g, rk.side, rk.r, min(c.b) AS bstar
  FROM cum c JOIN ranks rk ON c.g = rk.g
  WHERE c.cn >= rk.r
  GROUP BY c.g, rk.side, rk.r
),
pickfull AS (
  SELECT p.g, p.side, p.r, p.bstar,
    CAST(c.cn - c.ns AS BIGINT) AS prev
  FROM pick p JOIN cum c ON c.g = p.g AND c.b = p.bstar
),
vals AS (
  SELECT fb.g, pk.side, pk.r, pk.prev, fb.c,
    CAST(sum(fb.w) AS BIGINT) AS vc
  FROM fb JOIN pickfull pk ON fb.g = pk.g AND fb.b = pk.bstar
  GROUP BY fb.g, pk.side, pk.r, pk.prev, fb.c
),
cum2 AS (
  SELECT g, side, r, c,
    prev + CAST(sum(vc) OVER (PARTITION BY g, side ORDER BY c)
      AS BIGINT) AS cn2
  FROM vals
),
cuts AS (
  SELECT g, side, min(c) AS cut FROM cum2 WHERE cn2 >= r
  GROUP BY g, side
),
cutrow AS (
  SELECT g,
    max(CASE WHEN side = 'lo' THEN cut END) AS clo,
    max(CASE WHEN side = 'hi' THEN cut END) AS chi
  FROM cuts GROUP BY g
),
tails AS (
  SELECT fb.g,
    CAST(sum(fb.w * fb.c) AS BIGINT) AS s,
    CAST(sum(CASE WHEN fb.c < cr.clo THEN fb.w * fb.c ELSE 0 END)
      AS BIGINT) AS sb,
    CAST(sum(CASE WHEN fb.c < cr.clo THEN fb.w ELSE 0 END)
      AS BIGINT) AS wb,
    CAST(sum(CASE WHEN fb.c > cr.chi THEN fb.w * fb.c ELSE 0 END)
      AS BIGINT) AS sa,
    CAST(sum(CASE WHEN fb.c > cr.chi THEN fb.w ELSE 0 END)
      AS BIGINT) AS wa,
    max(cr.clo) AS clo, max(cr.chi) AS chi
  FROM fb JOIN cutrow cr ON fb.g = cr.g
  GROUP BY fb.g
)
SELECT t.g AS l_returnflag,
  tl.tw AS total_weight,
  tl.tw - 2 * tl.lo AS kept_weight,
  t.clo AS low_cut_cents,
  t.chi AS high_cut_cents,
  CAST(t.s - t.sb - (tl.lo - t.wb) * t.clo
       - t.sa - (tl.lo - t.wa) * t.chi AS DOUBLE)
    / CAST(100 AS DOUBLE) / (tl.tw - 2 * tl.lo)
    AS weighted_trimmed_mean
FROM tails t JOIN tl ON t.g = tl.g
"""


@query("agg_weighted_trimmed_mean", _WTRIM_ORACLE)
def agg_weighted_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware quantity-WEIGHTED 10-90 trimmed mean of price
    per return flag — trims the cheapest and priciest 10% of units
    sold (cumulative-weight ranks lo = W div 10 and W − lo through the
    shared ``_exact_rank_cut`` machinery with its weight column), then
    charges partial weight at the cut values exactly. Closes the
    robust-location family: weighted median (100% trim) → weighted
    trimmed mean → weighted mean (0%). See the oracle comment for the
    tie identity, the lo = 0 / single-distinct-value degeneracies and
    the int64 headroom argument (Σ w·c ≈ 3.3e18 < 2^63 at 100 TB)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    # Pinned (r15): tl feeds the rank relation and the cut join-back —
    # invocation-scoped lazy checkpoint (≤ |returnflag| rows).
    tl = (
        f.groupBy("g")
        .agg(F.sum("w").alias("tw"))
        .withColumn("lo", F.expr("tw div 10"))
    ).transform(invocation_pin)
    # per-group weighted rank thresholds as ONE exploded array (the
    # union-replays-the-plan-twice trap)
    ranks = tl.select(
        "g",
        F.explode(
            F.array(F.col("lo"), F.col("tw") - F.col("lo"))
        ).alias("r"),
    )
    cuts = _exact_rank_cut(f, ranks, w="w")
    # map ranks back to sides and carry tw/lo so the final projection
    # needs NO further join (the weighted group sum rides the tails
    # scan, the agg_trimmed_mean_exact folding)
    cutrow = (
        F.broadcast(tl)
        .join(cuts, "g")
        .groupBy("g", "tw", "lo")
        .agg(
            F.max(
                F.when(F.col("r") == F.col("lo"), F.col("cut"))
            ).alias("clo"),
            F.max(
                F.when(
                    F.col("r") == F.col("tw") - F.col("lo"), F.col("cut")
                )
            ).alias("chi"),
        )
    )
    cut2 = cutrow.select(
        F.col("g").alias("cg"), "tw", "lo", "clo", "chi"
    )
    tails = (
        f.join(F.broadcast(cut2), F.col("g") == F.col("cg"))
        .groupBy("g", "tw", "lo", "clo", "chi")
        .agg(
            F.sum(F.col("w") * F.col("c")).alias("s"),
            F.sum(
                F.when(
                    F.col("c") < F.col("clo"), F.col("w") * F.col("c")
                ).otherwise(0)
            ).alias("sb"),
            F.sum(
                F.when(F.col("c") < F.col("clo"), F.col("w")).otherwise(0)
            ).alias("wb"),
            F.sum(
                F.when(
                    F.col("c") > F.col("chi"), F.col("w") * F.col("c")
                ).otherwise(0)
            ).alias("sa"),
            F.sum(
                F.when(F.col("c") > F.col("chi"), F.col("w")).otherwise(0)
            ).alias("wa"),
        )
    )
    trimmed_cents = (
        F.col("s")
        - F.col("sb")
        - (F.col("lo") - F.col("wb")) * F.col("clo")
        - F.col("sa")
        - (F.col("lo") - F.col("wa")) * F.col("chi")
    )
    kept = F.col("tw") - F.lit(2) * F.col("lo")
    return tails.select(
        F.col("g").alias("l_returnflag"),
        F.col("tw").alias("total_weight"),
        kept.alias("kept_weight"),
        F.col("clo").alias("low_cut_cents"),
        F.col("chi").alias("high_cut_cents"),
        (
            trimmed_cents.cast("double")
            / F.lit(100).cast("double")
            / kept
        ).alias("weighted_trimmed_mean"),
    )


# -- Poisson-bootstrap CI for a RATIO metric -----------------------------------

# diag_bootstrap_ci brackets a MEAN; real metric triage needs CIs on
# SHARES (flag rates, defect ratios, high-risk fractions), where a
# composition shift can move the share while leaving the mean of some
# other column untouched — the planted-shift case the mean CI can't
# catch (pinned in pytest). Same one-pass machinery (_boot_weights /
# _boot_rank_ci), one extra column: the replicate statistic is the
# QUOTIENT of two exact int64 weighted sums, Σ w·1[bulk] / Σ w — one
# correctly-rounded double division per (group, replicate), so both
# engines compute identical replicate shares. Seed differs from the
# mean CI's (independent resamples across diagnostics). Integer
# headroom trivial: Σ w·i ≤ Σ w ≤ 7n. Scale: identical to
# diag_bootstrap_ci — the ×B explode combines map-side, |groups|·B
# partial rows shuffle, the CI window is over ≤ B = 40 shares/group.
_BOOT_SEED_RATIO = 11

_BOOT_RATIO_ORACLE = f"""
WITH f AS (
  SELECT l_returnflag AS g, l_orderkey AS ok, l_linenumber AS ln,
    CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END AS i
  FROM lineitem
),
e AS (
  SELECT g, i, ok, ln, u.rep
  FROM f, unnest(generate_series(1, {_BOOT_B})) AS u(rep)
),
wts AS (
  SELECT g, i, rep,
    CASE {_BOOT_CASE} ELSE 7 END AS w
  FROM (
    SELECT g, i, rep,
      (xor(((ok % 2147483647) * 1000003 + ln) % 2147483647,
           rep * 2654435761 + {_BOOT_SEED_RATIO}) % 2147483647
       * 1000003 % 2147483647 * 1000003) % 2147483647 % 1000000 AS bkt
    FROM e
  )
),
reps AS (
  SELECT g, rep, CAST(sum(w) AS BIGINT) AS nw,
    CAST(sum(w * i) AS BIGINT) AS sw
  FROM wts GROUP BY g, rep
),
shares AS (
  SELECT g, rep, CAST(sw AS DOUBLE) / nw AS m
  FROM reps WHERE nw > 0
),
bp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS bprime FROM shares GROUP BY g
),
cums AS (
  SELECT g, m, count(*) OVER (PARTITION BY g ORDER BY m) AS cum
  FROM shares
),
ci AS (
  SELECT c.g,
    max(b.bprime) AS ci_replicates,
    min(CASE WHEN c.cum >= (5 * b.bprime + 99) // 100 THEN c.m END)
      AS ci_lo,
    min(CASE WHEN c.cum >= (95 * b.bprime + 99) // 100 THEN c.m END)
      AS ci_hi
  FROM cums c JOIN bp b ON c.g = b.g
  GROUP BY c.g
),
tot AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(i) AS BIGINT) AS s
  FROM f GROUP BY g
)
SELECT t.g AS l_returnflag, t.n AS n_lines,
  CAST(t.s AS DOUBLE) / t.n AS bulk_share,
  ci.ci_replicates, ci.ci_lo, ci.ci_hi
FROM tot t JOIN ci ON t.g = ci.g
"""


@query("diag_bootstrap_ci_ratio", _BOOT_RATIO_ORACLE)
def diag_bootstrap_ci_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90% Poisson-bootstrap confidence interval for a RATIO metric —
    the bulk-line share (l_quantity ≥ 30) per return flag. Same
    one-pass resampling as diag_bootstrap_ci via the shared
    ``_boot_weights`` / ``_boot_rank_ci`` helpers; the replicate
    statistic is one exact-int64 quotient Σ w·1[bulk] / Σ w. Catches
    composition shifts the mean CI is blind to (see the oracle
    comment; planted-shift case pinned in pytest)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").cast("long").alias("ln"),
        F.when(F.col("l_quantity") >= 30, 1)
        .otherwise(0)
        .cast("long")
        .alias("i"),
    )
    wts = _boot_weights(f, _BOOT_SEED_RATIO)
    reps = wts.groupBy("g", "rep").agg(
        F.sum("w").alias("nw"),
        F.sum(F.col("w") * F.col("i")).alias("sw"),
    )
    shares = reps.filter(F.col("nw") > 0).select(
        "g",
        (F.col("sw").cast("double") / F.col("nw")).alias("m"),
    )
    ci = _boot_rank_ci(shares)
    tot = f.groupBy("g").agg(
        F.count("*").alias("n"), F.sum("i").alias("s")
    )
    return (
        tot.join(F.broadcast(ci), "g")
        .select(
            F.col("g").alias("l_returnflag"),
            F.col("n").alias("n_lines"),
            (F.col("s").cast("double") / F.col("n")).alias("bulk_share"),
            "ci_replicates",
            "ci_lo",
            "ci_hi",
        )
    )

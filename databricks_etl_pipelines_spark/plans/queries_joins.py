"""Join queries (SURVEY §2.3): the full equi-join surface the reference
implies but never writes, plus the Delta-MERGE upsert re-expressed on the
managed-table layer.

Plan-shape expectations (checked in tests via .explain):
  * broadcast joins on nation/region — BroadcastHashJoin, fact side unshuffled
  * customer⋈orders⋈lineitem — shuffled joins with AQE; filters pushed to scans
  * semi/anti — Left(Semi|Anti) without right payload materialization
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.functions.numeric import (
    sql_stable_round,
    stable_round,
)
from databricks_etl_pipelines_spark.operators.joins import (
    asof_join,
    range_join,
    anti_join,
    broadcast_dim_join,
    semi_join,
)
from databricks_etl_pipelines_spark.sources import table
from databricks_etl_pipelines_spark.sources.managed_table import ManagedTable
from databricks_etl_pipelines_spark.sources.scratch import scratch_dir

# -- inner equi-join + aggregate --------------------------------------------

_INNER_ORACLE = """
SELECT
  c.c_mktsegment,
  count(*) AS order_count,
  floor(sum(o.o_totalprice) * 100 + 0.5) / 100 AS segment_revenue,
  count(DISTINCT c.c_custkey) AS active_customers
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


@query("join_inner_customer_orders", _INNER_ORACLE)
def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("order_count"),
            stable_round(F.sum("o_totalprice"), 2).alias("segment_revenue"),
            F.countDistinct("c_custkey").alias("active_customers"),
        )
    )


# -- salted skew join: same relational answer as the plain join --------------

_SALTED_ORACLE = """
SELECT
  o.o_orderpriority,
  count(*) AS order_count,
  floor(sum(o.o_totalprice) * 100 + 0.5) / 100 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY o.o_orderpriority
"""


@query("join_salted_skew", _SALTED_ORACLE)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join: the salt columns are internal, so the
    relational answer is the PLAIN join's — which is exactly what the
    oracle computes. Hard evidence that salting changes the shuffle
    layout, not the semantics."""
    from databricks_etl_pipelines_spark.operators.joins import salted_join

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    joined = salted_join(cust, orders, "c_custkey", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count"),
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# -- bucketed co-located join: zero-Exchange plan, plain-join answer ----------

_BUCKETED_Q_TABLES: dict[str, tuple[str, str]] = {}

_BUCKETED_ORACLE = """
SELECT
  n.n_name AS nation_name,
  count(*) AS supplier_count,
  floor(sum(s.s_acctbal) * 100 + 0.5) / 100 AS total_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("join_bucketed_colocated", _BUCKETED_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (the pay-the-shuffle-once layout): both
    sides written bucketBy(8) on the join key, joined with zero Exchange
    above either scan; the oracle is the plain join. The write happens once
    per session into the local warehouse."""
    from databricks_etl_pipelines_spark.operators.joins import (
        bucketed_join,
        write_bucketed,
    )

    # Unique per process: the in-memory catalog is session-scoped, but the
    # warehouse DIRECTORY outlives it — a fixed name in a fresh session
    # fails with LOCATION_ALREADY_EXISTS against the stale dir.
    tables = _BUCKETED_Q_TABLES.get(sf_dir)
    if tables is None:
        import uuid

        suffix = uuid.uuid4().hex[:8]
        tables = (f"bkt_supplier_{suffix}", f"bkt_nation_{suffix}")
        write_bucketed(
            table(spark, sf_dir, "supplier"), tables[0], "s_nationkey", 8
        )
        write_bucketed(
            table(spark, sf_dir, "nation"), tables[1], "n_nationkey", 8
        )
        _BUCKETED_Q_TABLES[sf_dir] = tables
    ta, tb = tables
    joined = bucketed_join(
        ta, tb,
        F.col("s_nationkey") == F.col("n_nationkey"),
        spark=spark,
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count("*").alias("supplier_count"),
        stable_round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
    )


# -- broadcast dim join chain (J2 real-join form) ----------------------------

_BROADCAST_ORACLE = """
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  count(*) AS customer_count,
  floor(sum(c.c_acctbal) * 100 + 0.5) / 100 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


@query("join_broadcast_dims", _BROADCAST_ORACLE)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, nation, region = (
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )
    enriched = broadcast_dim_join(
        cust, nation, cust.c_nationkey == nation.n_nationkey, "inner"
    )
    enriched = broadcast_dim_join(
        enriched, region, enriched.n_regionkey == region.r_regionkey, "inner"
    )
    return enriched.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count("*").alias("customer_count"),
        stable_round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
    )


# -- left outer join (null-producing side aggregated with count(col)) --------

_LEFT_ORACLE = """
SELECT
  c.c_custkey,
  count(o.o_orderkey) AS order_count,
  floor(coalesce(sum(o.o_totalprice), 0) * 100 + 0.5) / 100 AS total_spend
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


@query("join_left_outer", _LEFT_ORACLE)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            stable_round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias(
                "total_spend"
            ),
        )
    )


# -- full outer join ----------------------------------------------------------

_FULL_ORACLE = """
WITH cust_by_nation AS (
  SELECT c_nationkey AS nationkey, count(*) AS customer_count
  FROM customer GROUP BY c_nationkey
),
supp_by_nation AS (
  SELECT s_nationkey AS nationkey, count(*) AS supplier_count
  FROM supplier GROUP BY s_nationkey
)
SELECT
  coalesce(c.nationkey, s.nationkey) AS nationkey,
  coalesce(c.customer_count, 0) AS customer_count,
  coalesce(s.supplier_count, 0) AS supplier_count
FROM cust_by_nation c
FULL OUTER JOIN supp_by_nation s ON c.nationkey = s.nationkey
"""


@query("join_full_outer", _FULL_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("customer_count")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").alias("supplier_count")
    )
    joined = c.alias("c").join(
        s.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full"
    )
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce(F.col("customer_count"), F.lit(0)).alias("customer_count"),
        F.coalesce(F.col("supplier_count"), F.lit(0)).alias("supplier_count"),
    )


# -- semi join (EXISTS) -------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@query("join_semi_urgent_customers", _SEMI_ORACLE)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return semi_join(cust, urgent, cust.c_custkey == urgent.o_custkey).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# -- anti join (NOT EXISTS) — the scalable form of E1's subtract (02:120) ----

_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


@query("join_anti_customers_without_orders", _ANTI_ORACLE)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order. The priority filter keeps the anti
    side non-empty at every sf (every sf0.01 customer has *some* order, so
    the unfiltered form matched vacuously on 0 = 0 rows in round 1)."""
    cust, orders = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return anti_join(cust, urgent, cust.c_custkey == urgent.o_custkey).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# -- three-way join, filter pushdown, group, top-k (TPC-H Q3 shape) -----------

_THREEWAY_ORACLE = """
SELECT
  o.o_orderkey,
  floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
    AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("join_three_way_topk_revenue", _THREEWAY_ORACLE)
def join_three_way_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1995-03-15"))
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# -- MERGE upsert (J1/S8, 02:174-184) on the managed-table layer --------------

_MERGE_ORACLE = """
WITH source AS (
  SELECT
    o_orderkey, o_custkey, 'U' AS o_orderstatus,
    floor(o_totalprice * 1.1 * 100 + 0.5) / 100 AS o_totalprice,
    o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 3
  UNION ALL
  SELECT
    o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus,
    1000.0 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 7
)
SELECT * FROM source
UNION ALL
SELECT t.* FROM orders t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
"""


_MERGED_ORDERS_CACHE: dict[str, ManagedTable] = {}


def _merged_orders_table(spark: SparkSession, sf_dir: str) -> ManagedTable:
    """orders → bucketed ManagedTable (v0) → MERGE an update+insert batch
    (v1). Session-scoped scratch (outlives the call → lazy reads, no
    driver-side collect); cached per sf_dir so the merge-snapshot and
    change-feed queries share one build. The bucketed layout engages the
    partition-pruned MERGE path."""
    mt = _MERGED_ORDERS_CACHE.get(sf_dir)
    if mt is not None:
        return mt
    orders = table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 3).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        stable_round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserts = orders.filter(F.col("o_orderkey") % 100 == 7).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    source = updates.unionByName(inserts)
    mt = ManagedTable(scratch_dir("merge_upsert_orders_"))
    mt.create_or_overwrite(orders, bucket_by=["o_orderkey"])
    mt.merge_upsert(spark, source, ["o_orderkey"])
    _MERGED_ORDERS_CACHE[sf_dir] = mt
    return mt


@query("merge_upsert_orders", _MERGE_ORACLE)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-merge snapshot (the oracle recomputes the merge relationally)."""
    return _merged_orders_table(spark, sf_dir).read(spark)


_CDF_ORACLE = f"""
WITH merged AS ({_MERGE_ORACLE})
SELECT *, 'insert' AS _change_type
FROM (SELECT * FROM merged EXCEPT ALL SELECT * FROM orders)
UNION ALL
SELECT *, 'delete' AS _change_type
FROM (SELECT * FROM orders EXCEPT ALL SELECT * FROM merged)
"""


@query("change_feed_orders", _CDF_ORACLE)
def change_feed_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between the pre- and post-MERGE versions (Delta CDF
    analog): updates surface as delete+insert, inserts as insert. On the
    bucketed layout the diff skips every hardlink-identical bucket — the
    oracle recomputes both exceptAll directions relationally, verifying
    the merge AND the pruned diff in one hash check."""
    from databricks_etl_pipelines_spark.sources.managed_table import ChangeFeed

    mt = _merged_orders_table(spark, sf_dir)
    return ChangeFeed(mt).read_changes(spark, 0, 1)


# ---------------------------------------------------------------------------
# interval-overlap join: range×range via grid binning + anchor-cell dedup
# (operators/joins.py::interval_overlap_join). DuckDB runs the raw
# inequality join natively (IEJoin), so the oracle is the direct form the
# Spark plan deliberately avoids.
# ---------------------------------------------------------------------------

_INTERVAL_OVERLAP_ORACLE = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id,
    ts AS p_start, ts + INTERVAL 1 HOUR AS p_end
  FROM events WHERE event_type = 'purchase'
),
x AS (
  SELECT user_id, event_id AS error_id,
    ts AS x_start, ts + INTERVAL 30 MINUTE AS x_end
  FROM events WHERE event_type = 'error'
)
SELECT p.user_id, p.purchase_id, x.error_id,
  CAST(date_diff('second',
    greatest(p.p_start, x.x_start),
    least(p.p_end, x.x_end)) AS BIGINT) AS overlap_seconds
FROM p JOIN x
  ON p.user_id = x.user_id
 AND p.p_start < x.x_end AND x.x_start < p.p_end
"""


@query("join_interval_overlap", _INTERVAL_OVERLAP_ORACLE)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase attention windows [ts, ts+1h) overlapped with error
    windows [ts, ts+30m) per user. The Spark side never runs an
    inequality join: intervals bin to hour cells, the join is a pure
    equi-join on (user_id, cell), and the anchor-cell filter replaces
    the dedup distinct (plan-asserted: no nested-loop, no cartesian)."""
    from databricks_etl_pipelines_spark.operators.joins import (
        interval_overlap_join,
    )

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
    )
    x = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("x_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("x_end"),
    )
    pairs = interval_overlap_join(
        p, x, ["user_id"], ("p_start", "p_end"), ("x_start", "x_end"), 3600
    )
    return pairs.select(
        "user_id",
        "purchase_id",
        "error_id",
        (
            F.unix_timestamp(F.least("p_end", "x_end"))
            - F.unix_timestamp(F.greatest("p_start", "x_start"))
        ).alias("overlap_seconds"),
    )


# ---------------------------------------------------------------------------
# extension joins: as-of + bounded range (operators/joins.py) — the forms
# SURVEY §2.3 lists as absent from the reference. DuckDB speaks ASOF JOIN
# natively, so both are fully oracle-checked.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH errors AS (
  SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT event_id, ts, value, user_id FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, e.value,
  c.event_id AS matched_event_id,
  c.value AS matched_value
FROM errors e ASOF LEFT JOIN clicks c
  ON e.user_id = c.user_id AND e.ts >= c.ts
"""


@query("join_asof_last_click", _ASOF_ORACLE)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: the same user's most recent preceding click
    (backward as-of). One window shuffle, no pair blowup."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "value", "user_id"
    )
    out = asof_join(
        errors, clicks.select("user_id", "event_id", "ts", "value"),
        key="user_id", left_time="ts", right_time="ts",
    )
    return out.select(
        "event_id", "user_id", "value",
        F.col("matched_event_id"),
        F.col("matched_value"),
    )


# -- multi-touch attribution: range join + credit windows ---------------------
# Marketing-analytics staple the reference's medallion gold layer implies
# but never builds: every purchase credits the user's click/view touches
# in the preceding 3 days — linear credit 1/n plus a last-touch flag.
# The candidate pairing reuses the bucketed range join (≤2 probe buckets
# per conversion); credit needs one window over the purchase id.

_ATTRIBUTION_ORACLE = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id AS touch_id, event_type AS touch_type, ts AS tts
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.user_id, p.purchase_id, t.touch_id, t.touch_type, t.tts
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.tts >= p.pts - INTERVAL 3 DAYS AND t.tts < p.pts
)
SELECT user_id, purchase_id, touch_id, touch_type,
  {sql_stable_round("1.0 / count(*) OVER (PARTITION BY purchase_id)", 6)}
    AS linear_credit,
  row_number() OVER (
    PARTITION BY purchase_id ORDER BY tts DESC, touch_id DESC) = 1
    AS is_last_touch
FROM j
"""


@query("window_attribution_linear", _ATTRIBUTION_ORACLE)
def window_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear + last-touch attribution per purchase over a 3-day lookback
    window (operators/joins.py::range_join for the candidate pairs, one
    window on purchase_id for the credit split)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_id", "event_type", "ts"
    )
    pairs = range_join(
        purchases, touches, "user_id", "ts", "ts", -3 * 86400, 0,
        right_prefix="t_",
    )
    w = Window.partitionBy("event_id")
    w_last = Window.partitionBy("event_id").orderBy(
        F.desc("t_ts"), F.desc("t_event_id")
    )
    return pairs.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("t_event_id").alias("touch_id"),
        F.col("t_event_type").alias("touch_type"),
        stable_round(F.lit(1.0) / F.count("*").over(w), 6).alias(
            "linear_credit"
        ),
        (F.row_number().over(w_last) == 1).alias("is_last_touch"),
    )


_RANGE_ORACLE = """
WITH errors AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT ts, user_id, value FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id,
  CAST(count(*) AS BIGINT) AS clicks_before,
  round(sum(c.value), 2) AS click_value_before
FROM errors e JOIN clicks c
  ON e.user_id = c.user_id
  AND c.ts >= e.ts - INTERVAL 600 SECONDS AND c.ts < e.ts
GROUP BY e.event_id, e.user_id
"""


@query("join_range_clicks_before_error", _RANGE_ORACLE)
def join_range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count + value of the user's clicks in the 10 minutes
    before it. Bucketed equi-join (≤2 probe buckets/row), then exact
    interval filter."""
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    pairs = range_join(
        errors, clicks, key="user_id", left_time="ts", right_time="ts",
        lower_seconds=-600, upper_seconds=0,
    )
    return (
        pairs.groupBy("event_id", "user_id")
        .agg(
            F.count("*").alias("clicks_before"),
            stable_round(F.sum("r_value"), 2).alias("click_value_before"),
        )
    )


# -- TPC-H-shaped multi-way analytics -----------------------------------------

_LOCAL_SUPPLIER_ORACLE = """
SELECT n.n_name,
  floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
    AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@query("join_local_supplier_volume", _LOCAL_SUPPLIER_ORACLE)
def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, restricted to one region and a date window — the 6-table
    star join that exercises join ordering.

    Scale shape: region→nation is filtered FIRST and broadcast (tiny dim),
    the o_orderdate window is pushed to the orders scan, and the three
    fact-side joins (customer⋈orders⋈lineitem⋈supplier) shuffle on their
    keys under AQE. The c_nationkey = s_nationkey 'local' condition rides
    the supplier join as a residual predicate, not an extra shuffle."""
    cust, orders, li, supp, nation, region = (
        table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation",
                  "region")
    )
    asia_nations = F.broadcast(
        nation.join(
            region.filter(F.col("r_name") == "ASIA"),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    window_orders = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    joined = (
        cust.join(window_orders, cust.c_custkey == window_orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(asia_nations, supp.s_nationkey == F.col("n_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


_SMALL_LOT_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT
  CAST(count(*) AS BIGINT) AS small_lot_lines,
  floor(sum(l.l_extendedprice) / 7.0 * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN avg_qty a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#2' AND l.l_quantity < a.threshold
"""


@query("join_small_lot_revenue", _SMALL_LOT_ORACLE)
def join_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is below 20% of the part's
    average — the correlated aggregate subquery, written DECORRELATED: one
    per-part aggregate, joined back to lineitem on partkey (what a good
    optimizer rewrites the subquery into; Catalyst never sees a per-row
    subquery at all).

    Scale shape: the per-part averages reduce lineitem to |part| rows
    before any join; the brand-filtered part side broadcasts."""
    li, part = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("threshold")
    )
    brand = F.broadcast(
        part.filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    )
    small = (
        li.join(brand, li.l_partkey == F.col("p_partkey"))
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("threshold"))
    )
    return small.agg(
        F.count("*").alias("small_lot_lines"),
        stable_round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )


_SHIPPING_PRIORITY_ORACLE = """
SELECT l.l_orderkey,
  floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
    AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01'
  AND l.l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("join_shipping_priority_topk", _SHIPPING_PRIORITY_ORACLE)
def join_shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    filter→join→aggregate→global top-k in one plan.

    Scale shape: both date predicates push to the parquet scans
    (PushedFilters), the segment-filtered customer side broadcasts, the
    orders⋈lineitem join shuffles on orderkey under AQE, and the final
    top-10 is TakeOrderedAndProject (per-partition heaps + driver merge of
    10-row heads), never a global sort."""
    cust, orders, li = (
        table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    building = F.broadcast(
        cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    joined = (
        orders.filter(F.col("o_orderdate") < "1997-06-01")
        .join(building, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            li.filter(F.col("l_shipdate") > "1997-06-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return agg.select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    ).orderBy(F.desc("revenue"), "l_orderkey").limit(10)


_FUZZY_MATCH_ORACLE = """
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
"""


@query("join_fuzzy_name_match", _FUZZY_MATCH_ORACLE)
def join_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching — the entity-resolution join: candidate pairs
    come from an EQUI-join on a blocking key (nation here; phonetic codes /
    sorted-neighborhood windows in production), and the expensive edit
    distance evaluates only inside blocks. The quadratic all-pairs
    comparison never happens: cost is sum of block-size² over blocks, which
    the blocking scheme keeps bounded — the same guardrail shape as the
    LSH-bucketed near-dup joins."""
    cust = table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        "c_nationkey",
    )
    b = cust.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        "c_nationkey",
    )
    # Thresholded levenshtein (Spark 4): banded DP that early-exits once
    # the distance provably exceeds 2 and returns -1 — O(threshold·len)
    # per pair instead of O(len²), same match set.
    dist = F.levenshtein("name_a", "name_b", 2)
    # With only ~25 blocking keys, a hash-shuffle join caps parallelism at
    # 25 tasks; round-robin the probe side and broadcast the build side so
    # every core compares pairs (7.5× at sf0.1). Precondition: the build
    # side fits in the broadcast threshold — at a scale where it doesn't,
    # revert to the shuffle join on a FINER blocking key (nation alone is
    # then too coarse for the block-size² cost bound anyway).
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        a.repartition(n_parts)
        .join(F.broadcast(b), "c_nationkey")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .filter(dist >= 0)
        .select(
            "custkey_a",
            "custkey_b",
            "name_a",
            "name_b",
            dist.cast("bigint").alias("edit_distance"),
        )
    )


_GDPR_ERASE_ORACLE = """
SELECT event_id, ts, user_id, event_type, "value", props
FROM events WHERE user_id % 37 <> 5
"""


@query("privacy_gdpr_erase_users", _GDPR_ERASE_ORACLE)
def privacy_gdpr_erase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten, end to end: events land in a ManagedTable
    bucketed by user_id, a victim key set is erased with
    ``delete_keys`` — which rewrites ONLY the buckets the victims hash
    into and hardlinks every other bucket into the new version — and the
    post-delete snapshot is returned. The oracle recomputes the survivor
    set relationally; prior versions still hold the rows for audit until
    retention drops them (history records op=delete + buckets_rewritten).
    At 100 TB this is the difference between an O(victim-buckets) commit
    and a full table rewrite per erasure request."""
    ev = table(spark, sf_dir, "events")
    victims = ev.select("user_id").filter(
        F.col("user_id") % 37 == 5
    ).distinct()
    mt = ManagedTable(scratch_dir("gdpr_events_"))
    mt.create_or_overwrite(ev, bucket_by=["user_id"])
    mt.delete_keys(spark, victims, ["user_id"])
    return mt.read(spark)


_SHIPMODE_PRIORITY_ORACLE = """
SELECT l.l_returnflag,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
"""


@query("join_priority_class_counts", _SHIPMODE_PRIORITY_ORACLE)
def join_priority_class_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode→returnflag adapted to this schema): join
    the fact to orders and pivot order-priority classes into conditional
    sums per group — join + CASE-aggregation in one exchange on the group
    key, with the date window pushed to the lineitem scan."""
    orders, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = orders.join(
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return joined.groupBy("l_returnflag").agg(
        F.sum(high.cast("bigint")).alias("high_line_count"),
        F.sum((~high).cast("bigint")).alias("low_line_count"),
    )


_DISJUNCTIVE_ORACLE = """
SELECT
  CAST(count(*) AS BIGINT) AS matched_lines,
  floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100
    AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE
  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
   AND l.l_quantity BETWEEN 1 AND 11)
  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
      AND l.l_quantity BETWEEN 10 AND 20)
  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
      AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("join_disjunctive_predicates", _DISJUNCTIVE_ORACLE)
def join_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicates spanning both join sides.
    The optimizer-relevant property: Catalyst extracts the common
    single-side conjuncts from the disjunction (brand/size reach the part
    scan, quantity bounds reach the lineitem scan as an OR-range) so both
    scans pre-filter BEFORE the join, and only the residual cross-side
    disjunction evaluates on joined rows."""
    li, part = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    arm = lambda brand, max_size, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, max_size)
        & F.col("l_quantity").between(qlo, qhi)
    )
    joined = li.join(part, F.col("p_partkey") == F.col("l_partkey")).filter(
        arm("Brand#1", 15, 1, 11)
        | arm("Brand#2", 25, 10, 20)
        | arm("Brand#3", 35, 20, 30)
    )
    return joined.agg(
        F.count("*").alias("matched_lines"),
        stable_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


# -- TPC-H Q21 shape: semi + anti self-joins on supplier-order pairs ----------

# "late" = shipped more than 60 days after the order date (this dataset
# carries no commit/receipt dates, so lateness is defined against
# o_orderdate — the join/exists structure is Q21's, the predicate is not).
_BLAME_LATE_ORACLE = """
WITH pairs AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
    max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
),
blamed AS (
  SELECT p.ok, p.sk FROM pairs p
  WHERE p.late = 1
    AND EXISTS (SELECT 1 FROM pairs q
                WHERE q.ok = p.ok AND q.sk != p.sk)
    AND NOT EXISTS (SELECT 1 FROM pairs q
                    WHERE q.ok = p.ok AND q.sk != p.sk AND q.late = 1)
)
SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blamed b JOIN supplier s ON b.sk = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_name, s.s_suppkey
LIMIT 20
"""


@query("join_blame_late_supplier", _BLAME_LATE_ORACLE)
def join_blame_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's join structure (suppliers who kept orders waiting):
    for multi-supplier orders, count per supplier the orders where it
    was the ONLY late shipper — a semi-join (another supplier exists on
    the order) plus an anti-join (no OTHER supplier was late) over the
    same supplier-order pair aggregate, then a top-20.

    Scale shape — the Spark-first rewrite: Q21's textbook form is a
    semi-join (another supplier exists) plus an anti-join (no other late
    supplier) against the SAME pair set; as an uncached DataFrame that
    re-executes the expensive pair aggregate once per branch (the round-6
    double-execution trap), and even cached it shuffles three times. But
    both EXISTS predicates are functions of per-ORDER counts, so the
    whole blame rule collapses into the next aggregate up: an order
    blames supplier s iff it has ≥ 2 suppliers, EXACTLY ONE late one,
    and that one is s. Two chained hash aggregates, zero self-joins, one
    scan of lineitem — and ONE shuffle for both aggregates: the explicit
    repartition on l_orderkey satisfies the (orderkey, suppkey) grouping
    AND the orderkey grouping (hash partitioning on a subset of the
    grouping keys clusters both), where the naive chain exchanges twice.
    The oracle deliberately keeps the literal EXISTS / NOT EXISTS form,
    so the differential check runs two different algorithms for the same
    semantics. The final top-20 is a TakeOrderedAndProject, never a
    global sort."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
        F.lit(1),
    ).otherwise(F.lit(0))
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    blamed = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("late").alias("n_late"),
            F.max(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).alias("blame_sk"),
        )
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_late") == 1))
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(
            F.broadcast(sup), F.col("blame_sk") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name", "s_suppkey")
        .limit(20)
    )


# -- TPC-H Q22 shape: scalar-subquery filter + anti-join ----------------------

_IDLE_RICH_ORACLE = """
WITH thr AS (
  SELECT avg(c_acctbal) AS cutoff FROM customer WHERE c_acctbal > 0.0
),
idle AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c CROSS JOIN thr
  WHERE c.c_acctbal > thr.cutoff
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
  floor(sum(i.c_acctbal) * 100 + 0.5) / 100 AS total_acctbal
FROM idle i JOIN nation n ON i.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@query("join_idle_rich_customers", _IDLE_RICH_ORACLE)
def join_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape (global-customer potential): customers with an
    above-average positive account balance and NO orders, grouped by
    nation — a scalar-subquery threshold (1-row broadcast, never a
    recompute per row) feeding an anti-join against orders, then a
    broadcast dim join for the nation name.

    The threshold comparison is on raw doubles: the corpus averages are
    far from any individual balance, so the float-sum visit-order ulp in
    avg() cannot flip membership on this data (same accepted-risk class
    as every rounded SUM aggregate in this file)."""
    cust = table(spark, sf_dir, "customer")
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("cutoff"))
    )
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    nation = table(spark, sf_dir, "nation")
    idle = (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("cutoff"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "leftanti")
    )
    return (
        idle.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            stable_round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# -- TPC-H Q2 shape: argmin-row retrieval via decorrelated per-group MIN ------

_MIN_COST_ORACLE = """
WITH up AS (
  SELECT l.l_partkey, l.l_suppkey,
    l.l_extendedprice / l.l_quantity AS unit_price
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_size < 10
),
m AS (
  SELECT l_partkey, min(unit_price) AS min_price FROM up GROUP BY l_partkey
)
SELECT up.l_partkey AS p_partkey, s.s_name, n.n_name,
  floor(up.unit_price * 10000 + 0.5) / 10000 AS unit_price
FROM up
JOIN m ON m.l_partkey = up.l_partkey AND up.unit_price = m.min_price
JOIN supplier s ON s.s_suppkey = up.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
"""


@query("join_min_cost_supplier", _MIN_COST_ORACLE)
def join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's shape (minimum-cost supplier): for every small part,
    the supplier(s) achieving the minimum observed unit price — the
    correlated ``= (SELECT min(...))`` subquery decorrelated into a
    per-group MIN aggregate joined back with an equality select of the
    argmin rows (all ties kept, as Q2 does).

    Float-equality note: the unit price is ONE IEEE division of scanned
    values, computed identically on both engines, and each engine
    compares only its own values — so the argmin row set is engine-
    exact; rounding applies to the OUTPUT only, never the selection.

    Scale shape: the part filter broadcasts and prunes the fact scan
    before anything aggregates; the min relation is (part, double) —
    shuffled once, then an equi-join back on partkey; supplier and
    nation broadcast. No per-row subquery, no window."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    up = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    m = up.groupBy("l_partkey").agg(F.min("unit_price").alias("min_price"))
    return (
        up.withColumnRenamed("l_partkey", "__pk")
        .join(
            m,
            (F.col("__pk") == F.col("l_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey")
        )
        .select(
            F.col("__pk").alias("p_partkey"),
            "s_name",
            "n_name",
            stable_round(F.col("unit_price"), 4).alias("unit_price"),
        )
    )

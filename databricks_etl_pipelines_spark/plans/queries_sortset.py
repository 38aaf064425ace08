"""Sorts / top-k / set operations (SURVEY §2.6-2.7).

Top-k uses orderBy(...).limit(k), which Spark plans as
TakeOrderedAndProject — each partition keeps only its local top-k, the
driver merges k·P rows: no full sort, no shuffle of the data, scale-safe.
Full sorts are range-partitioned (sampled boundaries). Tie-breaking on a
unique key makes top-k deterministic so differential comparison is exact.

Set ops: Spark ``union`` ≡ UNION ALL, ``intersect``/``subtract`` are
DISTINCT semantics (E1 note: the reference's quarantine-via-subtract
silently dedupes; ``exceptAll`` is the multiset-faithful variant, and the
anti-join in queries_joins is the production-scale form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.sources import table

# -- top-k (O1/O2): TakeOrderedAndProject, deterministic via unique tiebreak --

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("topk_orders_by_price", _TOPK_ORACLE)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# -- full multi-key sort (O3) -------------------------------------------------

_SORT_ORACLE = """
SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 350000
ORDER BY o_orderstatus, o_orderpriority DESC, o_orderkey
"""


@query("sort_multikey", _SORT_ORACLE)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 350000)
        .select("o_orderstatus", "o_orderpriority", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", F.desc("o_orderpriority"), "o_orderkey")
    )


# -- union all ----------------------------------------------------------------

_UNION_ALL_ORACLE = """
SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 300000
"""


@query("setop_union_all", _UNION_ALL_ORACLE)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("tag")
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", F.lit("big").alias("tag")
    )
    return urgent.unionByName(big)


# -- union distinct -------------------------------------------------------------

_UNION_DISTINCT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
"""


@query("setop_union_distinct", _UNION_DISTINCT_ORACLE)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.union(b).distinct()


# -- intersect (DISTINCT semantics) --------------------------------------------

_INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


@query("setop_intersect", _INTERSECT_ORACLE)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


# -- except distinct (E1 subtract, 02:120) --------------------------------------

_EXCEPT_ORACLE = """
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
"""


@query("setop_except_subtract", _EXCEPT_ORACLE)
def setop_except_subtract(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    all_cust = orders.select("o_custkey")
    pri = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_custkey")
    return all_cust.subtract(pri)


# -- except all (multiset-faithful variant) --------------------------------------

_EXCEPT_ALL_ORACLE = """
SELECT o_custkey FROM orders
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("setop_except_all", _EXCEPT_ALL_ORACLE)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select("o_custkey").exceptAll(
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


# -- distinct projection ----------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


@query("distinct_projection", _DISTINCT_ORACLE)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


# -- intersect all (multiset semantics) ----------------------------------------

_INTERSECT_ALL_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


@query("setop_intersect_all", _INTERSECT_ALL_ORACLE)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect: each o_custkey keeps min(count_left, count_right)
    copies — duplicate-aware, unlike INTERSECT DISTINCT above."""
    orders = table(spark, sf_dir, "orders")
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    low_cust = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    )
    return open_cust.intersectAll(low_cust)

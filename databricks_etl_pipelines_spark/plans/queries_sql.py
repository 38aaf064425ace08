"""SQL-string entry-point queries (EP4 parity, SURVEY §3).

The query text below is dialect-shared: the exact same string runs on
Spark SQL (via ``run_sql``) and on DuckDB (as its own oracle), so this is
a true differential test of the SQL surface — parser → Catalyst → result
on one side, DuckDB on the other. Rounding is written as
``floor(x * 10^n + 0.5) / 10^n`` because that form is half-up and
bit-identical in both engines (plain ``round`` differs: Spark HALF_UP vs
DuckDB banker's rounding on doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_etl_pipelines_spark.catalog import query
from databricks_etl_pipelines_spark.sql import run_sql

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(count(*) AS BIGINT) AS line_count,
  floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
  floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base,
  floor(avg(l_discount) * 1000000 + 0.5) / 1000000 AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_text_pricing_summary", _PRICING_SQL)
def sql_text_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped summary submitted as a SQL STRING over registered
    views — the identical text is the DuckDB oracle."""
    return run_sql(spark, sf_dir, _PRICING_SQL)


# -- subquery decorrelation shapes (TPC-H Q4 / Q18 / Q22 analogs) -------------
# The one Catalyst surface the catalog didn't exercise: correlated EXISTS,
# IN-with-HAVING, and uncorrelated-scalar + NOT EXISTS subqueries, submitted
# as SQL TEXT so RewritePredicateSubquery / scalar-subquery planning actually
# run (the DataFrame API would pre-decorrelate them by hand). Identical text
# is the DuckDB oracle. Shapes adapted to the testdata schema (lineitem has
# no commitdate/receiptdate, customer no phone): the correlation structure —
# what the optimizer must decorrelate — is the TPC-H one.

_EXISTS_LATE_SHIP_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@query("sql_exists_late_orders", _EXISTS_LATE_SHIP_SQL)
def sql_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS on BOTH the join key and a date
    comparison across tables — Catalyst must decorrelate to a left-semi
    join with a non-equi condition (plan-asserted in pytest)."""
    return run_sql(spark, sf_dir, _EXISTS_LATE_SHIP_SQL)


_IN_HAVING_SQL = """
SELECT c.c_name, o.o_orderkey, o.o_totalprice,
  floor(sum(l.l_quantity) * 100 + 0.5) / 100 AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
"""


@query("sql_in_having_big_orders", _IN_HAVING_SQL)
def sql_in_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over an aggregated-HAVING subquery gating a
    3-way join — the subquery becomes a semi-join against a pre-aggregated
    relation (~top 1% of orders by total quantity at this SF)."""
    return run_sql(spark, sf_dir, _IN_HAVING_SQL)


_SCALAR_ANTI_SQL = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
  floor(sum(c_acctbal) * 100 + 0.5) / 100 AS total_bal
FROM customer c
WHERE c.c_acctbal > (
    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


@query("sql_scalar_anti_customers", _SCALAR_ANTI_SQL)
def sql_scalar_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average,
    executed once and broadcast) + correlated NOT EXISTS (decorrelated to
    a left-anti join) — above-average-balance customers with no urgent
    orders, per market segment (75 rows qualify at sf0.01)."""
    return run_sql(spark, sf_dir, _SCALAR_ANTI_SQL)


# -- harder decorrelation / multi-join SQL-text shapes (Q7 / Q8 / Q21) --------
# Same contract as the Q4/Q18/Q22 trio: the IDENTICAL ANSI text runs on
# both engines, so Catalyst's join reordering and (for Q21) the doubly-
# correlated EXISTS / NOT EXISTS rewrite are exercised exactly as a SQL
# user would hit them. Names adapted to the testdata dimension values.

_VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, l_year,
  floor(sum(volume) * 100 + 0.5) / 100 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
    l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
    AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
    AND c.c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                         AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("sql_volume_shipping", _VOLUME_SHIPPING_SQL)
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape as SQL text: 6-table join with a cross-side nation-
    pair disjunction and a shipdate window — the join-reordering +
    disjunctive-filter workload, identical text on both engines."""
    return run_sql(spark, sf_dir, _VOLUME_SHIPPING_SQL)


_MARKET_SHARE_SQL = """
SELECT o_year,
  floor(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
        / sum(volume) * 1000000 + 0.5) / 1000000 AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    l.l_extendedprice * (1 - l.l_discount) AS volume,
    n2.n_name AS nation
  FROM part p, supplier s, lineitem l, orders o, customer c,
       nation n1, nation n2, region r
  WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
    AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
    AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
    AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                          AND TIMESTAMP '1997-12-31'
    AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""


@query("sql_market_share", _MARKET_SHARE_SQL)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape as SQL text: 8-table star join with a conditional
    national share per year — the widest join-graph in the catalog."""
    return run_sql(spark, sf_dir, _MARKET_SHARE_SQL)


_WAITING_SUPPLIERS_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s, lineitem l1, orders o, nation n
WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
  AND s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_2'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@query("sql_waiting_suppliers", _WAITING_SUPPLIERS_SQL)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape as SQL text — the hardest decorrelation in the
    suite: an EXISTS and a NOT EXISTS both correlated on l1's order AND
    referencing the outer o.o_orderdate ("the only late supplier in a
    multi-supplier order"). Catalyst must rewrite both to left-semi /
    left-anti joins; identical text is the oracle."""
    return run_sql(spark, sf_dir, _WAITING_SUPPLIERS_SQL)

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


# -- round-8 decorrelation shapes (TPC-H Q20 / Q11 / Q15 analogs) -------------
# Three Catalyst rewrite paths the SQL-text surface had not yet exercised:
# a correlated scalar subquery UNDER an Aggregate's HAVING inside a nested
# IN chain (Q20 — RewriteCorrelatedScalarSubquery must pull the per-part
# total up through the grouping), an uncorrelated scalar aggregate gating a
# HAVING (Q11), and a CTE referenced twice with a scalar MAX over one
# instance (Q15). All thresholds compare sums of l_quantity — integers
# stored as doubles, so the sums are EXACT (< 2^53) and visit-order
# independent on both engines; a price-sum threshold would be last-ulp
# order-dependent and could flip a boundary group between engines.
# partsupp does not exist in the testdata; "availqty share" is restated as
# "shipped more than 45% of the part's 1996 volume", which preserves the
# correlation structure (the scalar subquery correlates on the grouping
# column l_partkey) — the part the optimizer must decorrelate.

_EXCESS_SHARE_SQL = """
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
  SELECT l1.l_suppkey FROM lineitem l1
  WHERE l1.l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l1.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l1.l_suppkey, l1.l_partkey
  HAVING sum(l1.l_quantity) > (
    SELECT 0.45 * sum(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
      AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l2.l_shipdate < TIMESTAMP '1997-01-01')
)
ORDER BY s.s_name
"""


@query("sql_excess_share_suppliers", _EXCESS_SHARE_SQL)
def sql_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape as SQL text: suppliers who shipped > 45% of some
    red part's 1996 volume — an IN over a grouped subquery whose HAVING
    references a CORRELATED scalar subquery (correlated on the grouping
    column l_partkey). Catalyst must decorrelate the scalar aggregate to
    a per-part join under the group-by, then the IN to a semi-join; the
    identical text is the oracle. Selective at every SF (68/100
    suppliers at sf0.01, 627/1000 at sf0.1). Reference parity:
    slysik/databricks-etl-pipelines exposes its query surface as SQL
    strings over registered tables; this exercises the same entry
    point on the hardest remaining subquery topology."""
    return run_sql(spark, sf_dir, _EXCESS_SHARE_SQL)


_IMPORTANT_PARTS_SQL = """
SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
FROM lineitem
GROUP BY l_partkey
HAVING sum(l_quantity) > (
  SELECT 0.0008 * sum(l_quantity) FROM lineitem)
ORDER BY total_qty DESC, l_partkey
"""


@query("sql_important_parts", _IMPORTANT_PARTS_SQL)
def sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape as SQL text: parts whose shipped quantity exceeds
    a fixed fraction of the GLOBAL shipped quantity — an uncorrelated
    scalar aggregate subquery inside HAVING. The scalar executes once
    (one extra pass over lineitem, broadcast as a literal into the
    post-aggregation filter), never per-group; the quantity sums are
    exact integers in doubles so the threshold comparison cannot flip
    between engines."""
    return run_sql(spark, sf_dir, _IMPORTANT_PARTS_SQL)


_TOP_SUPPLIER_SQL = """
WITH qty AS (
  SELECT l_suppkey AS supplier_no,
    CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, q.total_qty
FROM supplier s
JOIN qty q ON s.s_suppkey = q.supplier_no
WHERE q.total_qty = (SELECT max(total_qty) FROM qty)
ORDER BY s.s_suppkey
"""


@query("sql_top_supplier_quarter", _TOP_SUPPLIER_SQL)
def sql_top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape as SQL text: the revenue view restated on exact
    quantity sums — a CTE consumed TWICE (once as the join input, once
    under a scalar MAX), with ties kept by the equality. Exercises
    Catalyst's CTE deduplication/inlining decision plus a scalar
    subquery over an aggregated derived table; identical text is the
    oracle."""
    return run_sql(spark, sf_dir, _TOP_SUPPLIER_SQL)


_CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""


@query("sql_customer_distribution", _CUSTOMER_DISTRIBUTION_SQL)
def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape as SQL text: the distribution-of-a-distribution —
    customers grouped by how many qualifying orders they have, then the
    histogram of those counts. Exercises LEFT OUTER JOIN with an extra
    non-key join predicate (the filter must stay IN the join condition:
    pushing it to a WHERE would silently drop zero-order customers) and
    count(column) null semantics (unmatched customers count 0, not 1).
    Identical text is the oracle; the two chained aggregates share no
    key, so the plan is join → agg → agg with one shuffle each — the
    shape AQE coalesces well at scale."""
    return run_sql(spark, sf_dir, _CUSTOMER_DISTRIBUTION_SQL)


_PARTS_SUPPLIER_CNT_SQL = """
SELECT p.p_brand, p.p_type,
  CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 5
  AND l.l_suppkey NOT IN (
    SELECT CASE WHEN s.s_acctbal < -1000000 THEN NULL
           ELSE s.s_suppkey END
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2'))
GROUP BY p.p_brand, p.p_type
"""


@query("sql_parts_supplier_count", _PARTS_SUPPLIER_CNT_SQL)
def sql_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape as SQL text: supplier counts per (brand, type)
    excluding a supplier set via NOT IN — with the subquery column made
    NULLABLE by a CASE the optimizer cannot prove never fires. That
    forces Catalyst down the NULL-AWARE anti-join path (x NOT IN S is
    NULL — row dropped — if S contains any NULL and x unmatched; a
    plain anti-join would silently return wrong rows the moment a NULL
    appeared): the single-key null-aware case plans as a
    BroadcastHashJoin LeftAnti with isNullAware=true, plan-asserted in
    pytest. count(DISTINCT) over the surviving join adds Q16's
    distinct-aggregate. Identical text is the oracle."""
    return run_sql(spark, sf_dir, _PARTS_SUPPLIER_CNT_SQL)


_AVG_YEARLY_SQL = """
SELECT CAST(count(*) AS BIGINT) AS small_lot_lines,
  floor(sum(l.l_extendedprice) / CAST(7 AS DOUBLE) * 100 + 0.5) / 100
    AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT CAST(0.2 AS DOUBLE) * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
"""


_PRODUCT_PROFIT_SQL = """
SELECT nation, o_year,
  floor(sum(amount) * 100 + 0.5) / 100 AS sum_profit
FROM (
  SELECT n.n_name AS nation,
    CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
    l.l_extendedprice * (1 - l.l_discount)
      - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity AS amount
  FROM part p, supplier s, lineitem l, orders o, nation n
  WHERE s.s_suppkey = l.l_suppkey
    AND p.p_partkey = l.l_partkey
    AND o.o_orderkey = l.l_orderkey
    AND s.s_nationkey = n.n_nationkey
    AND p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query("sql_product_type_profit", _PRODUCT_PROFIT_SQL)
def sql_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape as SQL text: the LIKE-filtered multi-table star
    with an ARITHMETIC measure (revenue minus a cost term) grouped by a
    DERIVED year — the one star topology the sql_* family lacked
    (Q7/Q8 group raw dimension values and filter by equality/range; Q9
    filters the part dimension with an infix LIKE and computes profit).
    Exercises (a) pushdown of a non-prefix `LIKE '%red%'` through the
    comma-join graph into the part scan (parquet PushedFilters
    StringContains — prefix LIKEs like Q20's become StartsWith, a
    different pushdown class), (b) Catalyst join ordering from the
    unordered WHERE conjunction (no cartesian may survive), both
    plan-asserted in pytest. partsupp doesn't exist in the testdata, so
    the supplycost term is restated as 0.6·p_retailprice·l_quantity —
    same arithmetic shape (a product of columns from two different
    tables subtracted from the discounted price), identical text on
    both engines. Rounding: the 2dp floor-half-up on the per-(nation,
    year) profit sums, the established Q7/Q8 revenue discipline."""
    return run_sql(spark, sf_dir, _PRODUCT_PROFIT_SQL)


@query("sql_avg_yearly_revenue", _AVG_YEARLY_SQL)
def sql_avg_yearly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape as SQL TEXT: a correlated scalar AVG subquery in
    WHERE, correlated through the JOINED dimension's column
    (l2.l_partkey = p.p_partkey) — the one scalar-decorrelation
    topology the sql_* family didn't exercise (Q20 correlates inside
    HAVING on a grouping column; Q11/Q15 are uncorrelated one-shots).
    Catalyst must pull the per-part average up into an aggregate
    joined on partkey — no per-row subquery, no ExistenceJoin
    (plan-asserted in pytest). join_small_lot_revenue is the
    hand-decorrelated DataFrame twin; this submits the raw correlated
    text a SQL user would write. Determinism: the threshold is one
    division of exact-integer sums times an explicitly-CAST 0.2 (both
    engines fold the identical doubles); the revenue sum rounds at 2dp
    after the /7 annualization, the Q17 discipline the DataFrame twin
    already proved hash-stable."""
    return run_sql(spark, sf_dir, _AVG_YEARLY_SQL)


_MIN_COST_SUPPLIER_SQL = """
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
  l.l_extendedprice AS min_price
FROM part p, lineitem l, supplier s, nation n, region r
WHERE p.p_partkey = l.l_partkey
  AND s.s_suppkey = l.l_suppkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'EUROPE'
  AND p.p_size <= 10
  AND l.l_extendedprice = (
    SELECT min(l2.l_extendedprice)
    FROM lineitem l2, supplier s2, nation n2, region r2
    WHERE l2.l_partkey = p.p_partkey
      AND s2.s_suppkey = l2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey,
  l.l_orderkey, l.l_linenumber
LIMIT 100
"""


@query("sql_min_cost_supplier", _MIN_COST_SUPPLIER_SQL)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape as SQL text: the correlated scalar MIN whose
    subquery is itself a MULTI-JOIN (lineitem⋈supplier⋈nation⋈region,
    correlated on the outer part key) — the one scalar-decorrelation
    topology the family still lacked: Q17 correlates a single-table
    AVG; here Catalyst must pull the aggregate up above an entire
    4-table join subtree (per-part min over the region-filtered join),
    then equi-join it back on (partkey, price). Plan-asserted in
    pytest: no residual scalar-subquery in the optimized plan, no
    cartesian product. partsupp doesn't exist in the testdata, so
    ps_supplycost is restated as the line's l_extendedprice — same
    correlated-min-over-a-join topology, identical text both engines.
    Determinism: no aggregates cross rows except the MIN (exact on
    raw doubles); the ORDER BY suffix (l_orderkey, l_linenumber) is a
    unique key of lineitem, so the ordering is TOTAL and LIMIT 100
    cuts a deterministic multiset on both engines (the Q2 'top 100
    suppliers' report cut, tie-safe). Q2 ref topology per the public
    TPC-H spec; the reference repo has no SQL-text surface (EP4
    extension, see COVERAGE.md)."""
    return run_sql(spark, sf_dir, _MIN_COST_SUPPLIER_SQL)


# -- round-11 report shapes (TPC-H Q10 / Q14 analogs) --------------------------
# The two classic report queries the SQL-text family still lacked: the
# returned-item revenue top-20 (Q10 — a 4-table join grouped on a wide
# customer key with an ORDER BY ... LIMIT cut) and the promotion revenue
# share (Q14 — a conditional-share scalar over a month of shipments).
# Both carry revenue on an EXACT integer lattice instead of the float
# sum(price*(1-disc)) form: per row, cents(price) × (100 − pct(discount))
# is exact int64 (price and discount have two decimals in the testdata,
# so the floor lattice loses nothing), sums stay exact BIGINT, and the
# Q10 ORDER BY therefore cuts a deterministic multiset — a float-sum
# ordering could flip rank near the LIMIT boundary between engines.
# Headroom: revenue_cc per row ≤ 1.1e9 ×100 = 1.1e11; per customer ≤
# ~1e4 lines → 1.1e15; the Q14 month total at 100 TB ≈ 6e7 lines ×
# 1.1e11 ≈ 6.6e18 < 2^63 (cited; a year-scale window would move the
# share to the decimal-sum pattern of ml_ols_per_group).

_RETURNED_ITEM_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
    AS BIGINT) AS revenue_cc,
  floor(c.c_acctbal * 100 + 0.5) / 100 AS acctbal
FROM customer c, orders o, lineitem l, nation n
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND l.l_returnflag = 'R'
  AND c.c_nationkey = n.n_nationkey
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue_cc DESC, c.c_custkey
LIMIT 20
"""


@query("sql_returned_item_revenue", _RETURNED_ITEM_SQL)
def sql_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape as SQL text: top-20 customers by revenue lost to
    returned items in a quarter — customer⋈orders⋈lineitem⋈nation with
    a quarter date window and returnflag filter, grouped on the wide
    customer key. Revenue is the exact cent×discount-percent integer
    lattice (see the section comment), so the ORDER BY revenue DESC is
    an integer ordering and the c_custkey suffix makes it TOTAL —
    LIMIT 20 cuts a deterministic multiset on both engines. Catalyst
    plans the date+flag filters pushed to the scans and a
    TakeOrderedAndProject over the partial-agged join."""
    return run_sql(spark, sf_dir, _RETURNED_ITEM_SQL)


_PROMO_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN promo THEN cc ELSE 0 END) AS BIGINT) AS promo_cc,
  CAST(sum(cc) AS BIGINT) AS total_cc,
  CAST(100 AS DOUBLE)
    * CAST(CAST(sum(CASE WHEN promo THEN cc ELSE 0 END) AS BIGINT)
      AS DOUBLE)
    / nullif(CAST(CAST(sum(cc) AS BIGINT) AS DOUBLE), 0)
    AS promo_share_pct
FROM (
  SELECT p.p_type = 'PROMO' AS promo,
    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
      * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS cc
  FROM lineitem l, part p
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate >= TIMESTAMP '1996-09-01'
    AND l.l_shipdate < TIMESTAMP '1996-10-01'
) x
"""


@query("sql_promo_revenue", _PROMO_REVENUE_SQL)
def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape as SQL text: the promotion revenue share for one
    shipment month — lineitem⋈part with the month window pushed to the
    lineitem scan, a CASE-conditional share over the part type, and the
    exact integer revenue lattice (section comment) so both engines
    compute the identical share from identical BIGINT sums. The
    denominator is nullif-guarded (a month with no shipments yields
    NULL, not an ANSI divide error)."""
    return run_sql(spark, sf_dir, _PROMO_REVENUE_SQL)


_FORECAST_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS revenue_increase_cc
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@query("sql_forecast_revenue", _FORECAST_REVENUE_SQL)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape as SQL text: the what-if revenue increase from
    dropping small-quantity discounts in a shipment year — one
    filtered scan, one aggregate, with the date window pushed to the
    parquet reader. The discount band compares on the exact percent
    lattice (a bare 0.05..0.07 BETWEEN would compare DOUBLE against
    DECIMAL literals in DuckDB — the trap-ledger float-literal rule)
    and revenue accumulates on the cents×percent integer lattice, so
    both engines sum identical BIGINTs."""
    return run_sql(spark, sf_dir, _FORECAST_REVENUE_SQL)


# -- round-11b: the last four TPC-H shapes (Q3 / Q5 / Q12 / Q19) ---------------
# With these the SQL-text surface carries ALL 22 TPC-H query shapes in
# shared-dialect text (schema-adapted where the testdata lacks a column:
# lineitem has no l_shipmode/l_commitdate → Q12 classifies by
# l_linestatus with the late-shipment predicate standing in for the
# commit/receipt comparison; part has no p_container → Q19's disjunctive
# arms combine p_type, p_size and quantity bands — the OR-of-ANDs
# pushdown structure, which is what Q19 exercises, is preserved).
# Revenue everywhere rides the exact cents×(100−pct) lattice of the
# Q10/Q14 section above, so every ORDER BY ... LIMIT cut is an integer
# ordering (deterministic multiset on both engines).

_UNSHIPPED_ORDERS_SQL = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
    AS BIGINT) AS revenue_cc
FROM customer c, orders o, lineitem l
WHERE c.c_mktsegment = 'BUILDING'
  AND c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND o.o_orderdate < TIMESTAMP '1996-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cc DESC, l.l_orderkey
LIMIT 10
"""


@query("sql_unshipped_orders", _UNSHIPPED_ORDERS_SQL)
def sql_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape as SQL text: top-10 highest-value orders booked
    before the cutoff but still shipping after it, for one market
    segment — the classic 3-table join with filters on all three
    tables pushed to their scans and a TakeOrderedAndProject cut made
    deterministic by the integer revenue lattice + orderkey suffix."""
    return run_sql(spark, sf_dir, _UNSHIPPED_ORDERS_SQL)


_LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n.n_name,
  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
    AS BIGINT) AS revenue_cc
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("sql_local_supplier_volume", _LOCAL_SUPPLIER_VOLUME_SQL)
def sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape as SQL text: per-nation revenue where the
    customer and the supplier share a nation inside one region for one
    order year — the 6-table join whose distinguishing feature is the
    NON-tree join condition c_nationkey = s_nationkey closing a cycle
    in the join graph (Catalyst must pick an order that exploits it)."""
    return run_sql(spark, sf_dir, _LOCAL_SUPPLIER_VOLUME_SQL)


_SHIPMODE_PRIORITY_SQL = """
SELECT l.l_linestatus,
  CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                  OR o.o_orderpriority = '2-HIGH'
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
                 AND o.o_orderpriority <> '2-HIGH'
            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o, lineitem l
WHERE o.o_orderkey = l.l_orderkey
  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
"""


@query("sql_shipmode_priority", _SHIPMODE_PRIORITY_SQL)
def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape as SQL text: per line class, how many
    late-shipping lines belonged to high- vs low-priority orders — the
    conditional-CASE double count over an orders⋈lineitem join with a
    cross-table date comparison (testdata has no
    l_shipmode/l_commitdate; l_linestatus classifies and
    shipdate-vs-orderdate+30 stands in for the commit/receipt lag —
    the CASE-pivot structure Q12 exercises is intact). Counts are
    exact integers end to end."""
    return run_sql(spark, sf_dir, _SHIPMODE_PRIORITY_SQL)


_DISCOUNTED_REVENUE_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
       * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
    AS BIGINT) AS revenue_cc
FROM lineitem l, part p
WHERE p.p_partkey = l.l_partkey
  AND ((p.p_type = 'PROMO' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity >= 1 AND l.l_quantity <= 11)
    OR (p.p_type = 'STANDARD' AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity >= 10 AND l.l_quantity <= 20)
    OR (p.p_type = 'ECONOMY' AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity >= 20 AND l.l_quantity <= 30))
"""


@query("sql_discounted_revenue", _DISCOUNTED_REVENUE_SQL)
def sql_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape as SQL text: revenue from three disjunctive
    brand/size/quantity band predicates — the OR-of-ANDs filter whose
    planning test is that the join key equality stays usable as the
    join condition while the disjunction becomes a post-join (or
    partially pushed) filter instead of a fallback to a nested-loop
    join (p_container doesn't exist in the testdata; p_type/p_size
    bands preserve the disjunctive structure). Revenue on the exact
    integer lattice."""
    return run_sql(spark, sf_dir, _DISCOUNTED_REVENUE_SQL)

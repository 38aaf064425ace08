"""As-of and bounded range joins (extension operators beyond the reference)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.operators.joins import asof_join, range_join


def _ts(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)),
         (4, "u3", _ts(30))],
        "lid int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0), ("u1", _ts(15), 2.0), ("u1", _ts(20), 3.0),
         ("u2", _ts(9), 4.0)],
        "k string, t timestamp, v double",
    )
    return left, right


def test_asof_backward_picks_latest_at_or_before(spark):
    left, right = _sides(spark)
    out = asof_join(left, right, key="k", left_time="t", right_time="t")
    got = {r.lid: r.matched_v for r in out.collect()}
    assert got[1] == 1.0     # u1@10 ← click@8
    assert got[2] == 3.0     # u1@20 ← tie matches inclusively
    assert got[3] is None    # u2@5 has nothing earlier
    assert got[4] is None    # u3 has no right rows at all
    assert out.count() == left.count()  # left-preserving


def test_range_join_interval_and_buckets(spark):
    left, right = _sides(spark)
    # clicks in [t-10min, t): u1@10 ← {8}; u1@20 ← {15} (8 too old, 20
    # excluded by the open upper bound); u2@5 ← {}
    out = range_join(
        left, right, key="k", left_time="t", right_time="t",
        lower_seconds=-600, upper_seconds=0,
    )
    got = sorted((r.lid, r.r_v) for r in out.collect())
    assert got == [(1, 1.0), (2, 2.0)]


def test_range_join_boundary_exact_microseconds(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10, 0, 500))], "lid int, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(0, 0, 500), 1.0),   # exactly t-600s → included (>=)
         ("u", _ts(0, 0, 499), 2.0),   # 1µs earlier → excluded
         ("u", _ts(10, 0, 500), 3.0)],  # exactly t → excluded (<)
        "k string, t timestamp, v double",
    )
    out = range_join(
        left, right, key="k", left_time="t", right_time="t",
        lower_seconds=-600, upper_seconds=0,
    )
    assert [r.r_v for r in out.collect()] == [1.0]


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Identically-bucketed tables join with zero Exchange nodes — the
    pay-shuffle-once pattern for recurring large joins."""
    from databricks_etl_pipelines_spark.operators.joins import (
        bucketed_join,
        write_bucketed,
    )
    from databricks_etl_pipelines_spark.sources import table

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    write_bucketed(orders, "b_orders", "o_custkey", buckets=8)
    write_bucketed(customer, "b_customer", "o_custkey", buckets=8)
    try:
        joined = bucketed_join("b_orders", "b_customer", "o_custkey", spark)
        # disable broadcast so the co-location is what's being tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join("b_orders", "b_customer", "o_custkey", spark)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            n = joined.count()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        assert "Exchange" not in plan, plan
        expected = (
            orders.join(customer, "o_custkey").count()
        )
        assert n == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_sql_subqueries_decorrelate_to_joins(spark, sf_dir):
    """The SQL-text subquery shapes must actually decorrelate: EXISTS ->
    left-semi join (with the non-equi date condition intact), NOT EXISTS
    -> left-anti join, and the uncorrelated scalar subquery stays a
    one-shot subquery (not a per-row rewrite)."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_exists_late_orders,
        sql_scalar_anti_customers,
    )

    exists_plan = (
        sql_exists_late_orders(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftSemi" in exists_plan
    assert "ExistenceJoin" not in exists_plan  # fully rewritten, not kept

    anti_plan = (
        sql_scalar_anti_customers(spark, sf_dir)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "LeftAnti" in anti_plan
    assert "scalar-subquery" in anti_plan


def test_sql_q21_double_correlation_decorrelates(spark, sf_dir):
    """The Q21 shape must rewrite BOTH subqueries — the correlated EXISTS
    to a left-semi and the doubly-correlated NOT EXISTS (it references
    l1's keys AND the outer o_orderdate) to a left-anti — with no
    residual ExistenceJoin, and the result must be non-vacuous."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_waiting_suppliers,
    )

    df = sql_waiting_suppliers(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "ExistenceJoin" not in plan
    # non-vacuous at sf0.01 (the smoke-scale sf dir can have zero
    # qualifying multi-supplier late orders)
    rows = sql_waiting_suppliers(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) >= 1 and rows[0].numwait >= 1


def test_sql_q20_correlated_scalar_in_having_decorrelates(spark):
    """The Q20 shape's correlated scalar subquery (per-part 1996 total,
    correlated on the GROUPING column inside HAVING) must decorrelate to
    a plain join carrying the threshold comparison — no scalar-subquery
    expression and no ExistenceJoin may survive — and the nested IN
    chains must both become left-semi joins. Also non-vacuous AND
    selective at sf0.01 (a strict subset of the 100 suppliers)."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_excess_share_suppliers,
    )

    sf = "/root/testdata/sf0.01"
    df = sql_excess_share_suppliers(spark, sf)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 2  # supplier IN + part IN
    assert "scalar-subquery" not in plan  # fully pulled up into a join
    assert "ExistenceJoin" not in plan
    rows = df.collect()
    assert 1 <= len(rows) < 100


def test_sql_q11_q15_scalar_subqueries_stay_one_shot(spark):
    """Q11's global-total HAVING threshold and Q15's MAX over the shared
    CTE are UNCORRELATED scalars: they must remain one-shot subqueries
    (executed once, folded into the filter), not be rewritten into
    per-row joins. Q15 keeps ties by equality — every returned supplier
    carries the same maximal total_qty."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_important_parts,
        sql_top_supplier_quarter,
    )

    sf = "/root/testdata/sf0.01"
    p11 = (
        sql_important_parts(spark, sf)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "scalar-subquery" in p11
    assert "Join" not in p11  # single-table aggregate + filter, no join

    df15 = sql_top_supplier_quarter(spark, sf)
    p15 = df15._jdf.queryExecution().optimizedPlan().toString()
    assert "scalar-subquery" in p15
    rows = df15.collect()
    assert len(rows) >= 1
    assert len({r.total_qty for r in rows}) == 1


def test_interval_overlap_join_semantics_and_plan(spark):
    """Planted intervals: strict overlap only (touching endpoints excluded),
    each pair exactly once even when it shares several grid cells, and the
    plan is a pure equi-join — no nested-loop or cartesian anywhere."""
    from datetime import datetime

    from databricks_etl_pipelines_spark.operators.joins import (
        interval_overlap_join,
    )

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m)

    left = spark.createDataFrame(
        [
            (1, 10, t(1), t(4)),    # 3h span: covers cells 1-4
            (1, 11, t(6), t(7)),
            (2, 20, t(1), t(2)),    # same times, other key
        ],
        "k int, lid int, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 100, t(2), t(5)),   # overlaps 10 across cells 2,3,4 -> once
            (1, 101, t(4), t(5)),   # touches 10's end exactly -> excluded
            (1, 102, t(6, 30), t(8)),  # overlaps 11
            (2, 200, t(3), t(4)),   # no overlap for key 2
        ],
        "k int, rid int, rs timestamp, re timestamp",
    )
    got = interval_overlap_join(
        left, right, ["k"], ("s", "e"), ("rs", "re"), 3600
    )
    pairs = sorted((r.lid, r.rid) for r in got.collect())
    assert pairs == [(10, 100), (11, 102)]

    got.collect()
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_blame_late_supplier_single_shuffle_aggregates(spark, sf_dir):
    """Pins the Q21-shape scale fix: the explicit repartition on
    l_orderkey feeds BOTH chained aggregates (pair-level and order-level)
    from ONE hash partitioning — no second shuffle keyed on
    (l_orderkey, l_suppkey), and no self-join anywhere in the plan."""
    import re

    from databricks_etl_pipelines_spark import catalog

    catalog.load_all()
    df = catalog.QUERIES["join_blame_late_supplier"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the executed-plan string repeats the tree under AQE (final +
    # initial) — dedup the partitioning specs before counting
    shuffles = set(re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan))
    keyed_on_orderkey = [s for s in shuffles if "l_orderkey" in s]
    assert len(keyed_on_orderkey) == 1, shuffles
    assert not any("l_suppkey" in s for s in shuffles), shuffles
    # the blame rule collapsed into aggregates: no semi/anti self-join
    assert "LeftSemi" not in plan and "LeftAnti" not in plan


def test_sql_q16_not_in_plans_null_aware_anti_join(spark):
    """The Q16 shape's NOT IN over a NULLABLE subquery column must plan
    as a NULL-AWARE anti join (BroadcastHashJoin ... LeftAnti, ...,
    true — the isNullAware flag): a plain anti-join would return wrong
    rows the moment the subquery produced a NULL. Non-vacuous at
    sf0.01 (150 groups survive)."""
    import re

    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_parts_supplier_count,
    )

    df = sql_parts_supplier_count(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) == 150
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(
        r"BroadcastHashJoin .*LeftAnti, BuildRight, true", plan
    ), plan[:800]


def test_sql_q17_correlated_scalar_in_where_decorrelates(spark):
    """The Q17 shape's correlated scalar AVG (correlated through the
    JOINED dimension's column, in WHERE not HAVING) must decorrelate to
    a per-part aggregate joined back on partkey — no scalar-subquery
    expression and no ExistenceJoin may survive — and stay non-vacuous
    at sf0.01."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_avg_yearly_revenue,
    )

    df = sql_avg_yearly_revenue(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "scalar-subquery" not in plan
    assert "ExistenceJoin" not in plan
    # the decorrelated per-part average survives as an Aggregate under
    # a join keyed on partkey
    assert "Aggregate [l_partkey" in plan
    rows = df.collect()
    assert rows[0].small_lot_lines > 0


def test_sql_q9_pushes_like_filter_and_plans_no_cartesian(spark):
    """The Q9 shape's infix LIKE '%red%' part filter must reach the
    parquet scan (PushedFilters StringContains — selecting ~13% of
    parts BEFORE any join builds), and Catalyst must order the
    comma-join WHERE conjunction into pure hash joins — no cartesian
    or nested-loop join may survive. Non-vacuous at sf0.01 (every
    (nation, year) cell populated)."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_product_type_profit,
    )

    df = sql_product_type_profit(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) >= 50  # ~10 nations x 7 years
    assert len({r.nation for r in rows}) >= 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    # plan-string rendering is not a stable API; these exact substrings
    # are valid for the pinned Spark 4.1.2 — if the pin ever moves,
    # loosen to case-insensitive "stringcontains" / "p_name" checks
    assert "StringContains(p_name,red)" in plan, plan[:1200]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_q2_correlated_min_over_join_decorrelates(spark):
    """The Q2 shape's correlated scalar MIN — whose subquery is itself
    a 4-table join correlated on the outer part key — must decorrelate
    to a per-part aggregate over the joined subtree (no residual
    scalar-subquery), and no cartesian product may appear anywhere in
    the executed plan. Non-vacuous at sf0.01."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_min_cost_supplier,
    )

    df = sql_min_cost_supplier(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert 0 < len(rows) <= 100
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "scalar-subquery" not in opt
    assert "ExistenceJoin" not in opt
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    # the decorrelated per-part MIN survives as an aggregate
    assert "min(" in opt


def test_sql_round11_report_shapes_plan_clean(spark):
    """The four round-11b TPC-H text shapes plan as pure hash joins:
    Q5's cyclic join graph (c_nationkey = s_nationkey) and Q19's
    OR-of-ANDs disjunction are the two classic nested-loop bait
    shapes — neither may fall back to a cartesian or nested-loop
    join; Q3/Q12 pin the same and non-vacuous outputs."""
    from databricks_etl_pipelines_spark.plans.queries_sql import (
        sql_discounted_revenue,
        sql_local_supplier_volume,
        sql_shipmode_priority,
        sql_unshipped_orders,
    )

    sf = "/root/testdata/sf0.01"
    for fn, min_rows in (
        (sql_unshipped_orders, 1),
        (sql_local_supplier_volume, 1),
        (sql_shipmode_priority, 1),
        (sql_discounted_revenue, 1),
    ):
        df = fn(spark, sf)
        rows = df.collect()
        assert len(rows) >= min_rows, fn.__name__
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
    # Q19's disjunction must not have emptied the result (all three
    # arms match testdata bands) and Q12 pivots both classes
    assert sql_discounted_revenue(spark, sf).collect()[0].n_lines > 0
    q12 = {r.l_linestatus for r in sql_shipmode_priority(spark, sf).collect()}
    assert len(q12) >= 1

"""Driver-contract smoke tests."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema == entry_mod.entry(spark).schema  # stable schema


def test_every_oracle_has_a_query():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_priority_names_all_resolve():
    """Every catalog.PRIORITY name must exist in the registry: load_all()
    silently filters unknown names (``if n in QUERIES``), so a typo'd
    rotation entry would demote a query out of the driver's 50-slot cap
    with no error anywhere. Also pin that the cap region is fully
    oracle-backed — a rows-only query in the first 50 wastes a hard-
    evidence slot on a weaker check."""
    from databricks_etl_pipelines_spark import catalog

    catalog.load_all()
    missing = [n for n in catalog.PRIORITY if n not in catalog.QUERIES]
    assert missing == [], f"PRIORITY names not in registry: {missing}"
    dupes = [n for n in set(catalog.PRIORITY)
             if catalog.PRIORITY.count(n) > 1]
    assert dupes == [], f"duplicate PRIORITY entries: {dupes}"
    cap = list(catalog.QUERIES)[:50]
    rows_only = [n for n in cap if n not in catalog.ORACLES]
    assert rows_only == [], f"rows-only queries inside the cap: {rows_only}"


def test_bench_headline_names_all_resolve():
    """bench.py indexes catalog.QUERIES[name] directly — an unknown
    HEADLINE name KeyErrors only when the DRIVER runs the bench, turning
    a typo into a missing BENCH_r{N}.json. Catch it at pytest time."""
    import bench

    from databricks_etl_pipelines_spark import catalog

    catalog.load_all()
    missing = [n for n in bench.HEADLINE if n not in catalog.QUERIES]
    assert missing == [], f"HEADLINE names not in registry: {missing}"


def test_bench_final_line_fits_driver_tail():
    """The driver parses bench.py's LAST stdout line from a ~2000-char
    tail capture; round 6's single verbose line outgrew that window and
    left BENCH_r06 ``parsed: null``. Pin that the compact final line —
    with every headline timing at a pessimistic 6-char width — stays
    well inside the window, so adding headline queries can't silently
    kill the round's perf evidence again."""
    import bench

    timings = {n: 123.45 for n in bench.HEADLINE}
    timings["scd2_apply_update_batch"] = 123.45
    line = bench.compact_line(99999.999, 0.1, timings)
    assert len(line) < 1900, f"compact bench line {len(line)} chars"
    import json

    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(timings)
    assert "cold" not in parsed

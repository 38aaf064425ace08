"""Round-11b operator scale experiment: the distribution-diagnostics
family (two-sample KS, Mann-Whitney, Welch, CUSUM, per-group OLS, Gini)
runs as its REAL registered queries over a synthetic sf-dir whose fact
tables multiply.

Claims under test:

  * KS / Mann-Whitney / Welch — ONE events scan each into bounded
    aggregates: the two-cohort value histogram is bounded by the cents
    lattice of the VALUE RANGE (same distinct (type, cent) cells under
    replication, counts ×rep), so the cumulative window's input is
    CONSTANT and wall ~linear in fact rows. The statistics themselves
    are replication-invariant (both cohorts scale together), which the
    probe asserts as a correctness cross-check.
  * CUSUM — one user_id shuffle + per-key all-int 4-slot state;
    replication adds DISTINCT users (new-entities axis), so per-key
    work is constant and output rows grow exactly ×rep.
  * per-group OLS — one hash-agg of six sufficient statistics; the
    aggregate relation is |groups| rows at any scale.
  * Gini — orders replicated with remapped o_orderkey over the SAME
    customers: per-customer revenue grows ×rep but the RANKED relation
    stays |customers| rows — the rank window's input is bounded by the
    entity count, not the fact count (the scale story: Gini never
    sorts facts).

Usage: python tools/scale_round11b.py [reps ...]   (default: 1 4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all  # noqa: E402
from databricks_etl_pipelines_spark.session import get_spark  # noqa: E402
from tools.scale_round9 import SF_DIR, replicate, timed  # noqa: E402

FIXED = ("region", "nation", "customer", "supplier", "part", "lineitem",
         "documents", "embeddings")


def build_sf_dir(spark, rep: int, root: str) -> str:
    """A runnable sf-dir: events replicated with remapped (user_id,
    event_id) for the per-key family BUT identical (type, value, ts)
    cells for the cohort family; orders replicated with remapped
    o_orderkey (same customers — the per-entity growth axis); lineitem
    replicated by plain duplication for OLS."""
    d = os.path.join(root, f"sf_x{rep}")
    os.makedirs(d, exist_ok=True)
    for t in FIXED:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    for t, remap in (
        ("events", {"user_id", "event_id"}),
        ("orders", {"o_orderkey"}),
    ):
        src = replicate(spark, t, rep, root, remap)
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)
    # OLS wants a replicated lineitem (value-multiset axis) — overrides
    # the FIXED symlink above for rep > 1
    if rep > 1:
        src = replicate(spark, "lineitem", rep, root, set())
        dst = os.path.join(d, "lineitem.parquet")
        os.unlink(dst)
        os.symlink(src, dst)
    return d


def run_scale(spark, rep: int, root: str) -> dict:
    load_all()
    sf = build_sf_dir(spark, rep, root)
    r: dict = {"rep": rep}
    r["events"] = spark.read.parquet(f"{sf}/events.parquet").count()

    for q in (
        "diag_ks_two_sample",
        "diag_mannwhitney_u",
        "diag_welch_ttest",
        "window_cusum_changepoint",
        "ml_ols_per_group",
        "agg_gini_concentration",
    ):
        r[f"{q}_s"], r[f"{q}_rows"] = timed(
            lambda q=q: QUERIES[q](spark, sf).count()
        )

    # bounded-state assertions ------------------------------------------------
    # the two-cohort histogram the KS/MWU/cumulative window runs over:
    # CONSTANT distinct (type, value-cent) cells under replication
    from databricks_etl_pipelines_spark.plans.queries_stats import (
        _two_cohort_partial,
    )
    from databricks_etl_pipelines_spark.sources.tables import table

    r["hist_s"], r["hist_rows"] = timed(
        lambda: _two_cohort_partial(table(spark, sf, "events")).count()
    )
    # the Gini rank relation: |customers with orders| — constant
    r["gini_ranked_s"], r["gini_ranked_rows"] = timed(
        lambda: spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # replication-invariance cross-check: KS verdict identical at any rep
    ks = {
        row.event_type: (row.ks_num if rep == 1 else None, row.ks_at_cents)
        for row in QUERIES["diag_ks_two_sample"](spark, sf).collect()
    }
    r["ks_locations"] = sorted(v[1] for v in ks.values())
    return r


def main() -> None:
    spark = get_spark("scale_round11b")
    spark.sparkContext.setLogLevel("ERROR")
    reps = [int(a) for a in sys.argv[1:]] or [1, 4]
    root = tempfile.mkdtemp(prefix="scale_r11b_")
    out = [run_scale(spark, rep, root) for rep in reps]
    print(json.dumps(out))
    # the KS argmax locations must be replication-invariant
    assert all(o["ks_locations"] == out[0]["ks_locations"] for o in out)


if __name__ == "__main__":
    main()

"""Round-15 scale probe: confidence sequence, quantile-lift CIs,
exposure-time HTE, and the FDR family.

Replication design (the r12-r14 probes'): copy the events table 4x by
USER — user_id offsets a multiple of 8 (preserves %2 parity, %4 arm
residues AND div-4 cluster parity), event_id offsets keep ids unique —
so per-day / per-variant counts scale exactly x4 while each user's own
event sequence is untouched. Assertions:

* diag_confidence_sequence: the day lattice is constant, na/nb x4
  exact, diff_cents EXACTLY equal ((4a)/(4b) rounds to the identical
  double), and the anytime-valid interval TIGHTENS on every
  defined day (4x evidence shrinks V_k ~x1/4) while still containing
  the (unchanged) point estimate.
* diag_quantile_lift_ci: n_users x4, every quantile POINT exactly
  equal (the rank crossing lands on the same histogram value — counts
  and thresholds both scale x4), and the order-statistic bounds
  tighten monotonically (lo4 >= lo1, hi4 <= hi1; valid whenever
  z*sqrt(U q(1-q)) >= 2, comfortably true here) with lo <= pt <= hi
  preserved.
* diag_hte_by_exposure: per-bucket na/nb x4 exact, lift_cents and
  pooled_lift_cents EXACTLY equal (power-of-two scaling), se_lift
  ratio ~0.5 and trend_z ratio ~2 (n-1 corrections keep it inexact).
* diag_fdr_adjusted: every non-NULL |z| grows by ~2x (same correction
  caveat), NULL z's stay NULL, and BH never rejects FEWER metrics at
  4x on this corpus (more evidence, same effects).
* walls stay in the same band at 4x (cost tracks the bounded lattices
  past the per-user aggregate).

Run: python tools/scale_round15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.catalog import QUERIES, load_all
from databricks_etl_pipelines_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-round15")
    load_all()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    uid_stride = 10 ** 9
    assert uid_stride % 8 == 0
    eid_stride = 10 ** 12
    rep = ev
    for r in range(1, 4):
        rep = rep.unionByName(
            ev.withColumn(
                "user_id", F.col("user_id") + F.lit(r * uid_stride)
            ).withColumn("event_id", F.col("event_id") + F.lit(r * eid_stride))
        )
    rep_dir = f"/tmp/scale_r15_events_x4_{os.getpid()}"
    rep.write.mode("overwrite").parquet(f"{rep_dir}/events.parquet")
    print(f"replicated: {n_events} -> {n_events * 4} events, "
          f"{n_users} -> {n_users * 4} users")

    # -- confidence sequence ----------------------------------------------------
    t0 = time.time()
    c1 = {r.day: r for r in
          QUERIES["diag_confidence_sequence"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    c4 = {r.day: r for r in
          QUERIES["diag_confidence_sequence"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert set(c4) == set(c1)  # day lattice constant
    tightened = 0
    for day, r1 in c1.items():
        r4 = c4[day]
        assert r4.n_control == 4 * r1.n_control, day
        assert r4.n_treated == 4 * r1.n_treated, day
        if r1.diff_cents is not None:
            assert r4.diff_cents == r1.diff_cents, (
                day, r1.diff_cents, r4.diff_cents,
            )
        if r1.ci_lo_cents is not None and r4.ci_lo_cents is not None:
            width1 = r1.ci_hi_cents - r1.ci_lo_cents
            width4 = r4.ci_hi_cents - r4.ci_lo_cents
            assert width4 < width1, (day, width1, width4)
            assert r4.ci_lo_cents <= r4.diff_cents <= r4.ci_hi_cents, day
            tightened += 1
    assert tightened > 0
    print(f"confidence sequence: {len(c1)}-day lattice constant, counts "
          f"x4 exact, diff EXACTLY equal, interval tightened on all "
          f"{tightened} defined days; walls {w1:.1f}s -> {w4:.1f}s")

    # -- quantile-lift order-statistic CIs -------------------------------------
    t0 = time.time()
    q1 = {r.variant: r for r in
          QUERIES["diag_quantile_lift_ci"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    q4 = {r.variant: r for r in
          QUERIES["diag_quantile_lift_ci"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    for v, r1 in q1.items():
        r4 = q4[v]
        assert r4.n_users == 4 * r1.n_users, v
        for p in (25, 50, 75):
            pt1 = getattr(r1, f"p{p}")
            pt4 = getattr(r4, f"p{p}")
            assert pt4 == pt1, (v, p, pt1, pt4)  # points exactly equal
            lo1, hi1 = getattr(r1, f"p{p}_lo"), getattr(r1, f"p{p}_hi")
            lo4, hi4 = getattr(r4, f"p{p}_lo"), getattr(r4, f"p{p}_hi")
            assert lo4 >= lo1 and hi4 <= hi1, (v, p)  # bounds tighten
            assert lo4 <= pt4 <= hi4, (v, p)
    print(f"quantile CIs: points EXACTLY equal at x4, bounds tightened "
          f"for all 3 quantiles x 2 variants; walls {w1:.1f}s -> {w4:.1f}s")

    # -- exposure-time HTE ------------------------------------------------------
    t0 = time.time()
    h1 = {r.bucket: r for r in
          QUERIES["diag_hte_by_exposure"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    h4 = {r.bucket: r for r in
          QUERIES["diag_hte_by_exposure"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert set(h4) == set(h1) == {"wk1", "later"}
    for bucket, r1 in h1.items():
        r4 = h4[bucket]
        assert r4.n_control == 4 * r1.n_control, bucket
        assert r4.n_treated == 4 * r1.n_treated, bucket
        assert r4.lift_cents == r1.lift_cents, bucket  # power-of-two exact
        assert r4.pooled_lift_cents == r1.pooled_lift_cents, bucket
        assert r1.se_lift is not None and r4.se_lift is not None, (
            f"{bucket} bucket degenerate on this corpus: "
            f"se1={r1.se_lift!r} se4={r4.se_lift!r}"
        )
        se_ratio = r4.se_lift / r1.se_lift
        assert 0.45 < se_ratio < 0.55, (bucket, se_ratio)
        if r1.trend_z not in (None, 0.0):
            z_ratio = r4.trend_z / r1.trend_z
            assert 1.85 < z_ratio < 2.15, (bucket, z_ratio)
    print(f"exposure HTE: lifts + pooled EXACTLY equal, SE ratios ~0.5, "
          f"trend z ~2x; walls {w1:.1f}s -> {w4:.1f}s")

    # -- FDR family -------------------------------------------------------------
    t0 = time.time()
    f1 = {r.metric: r for r in
          QUERIES["diag_fdr_adjusted"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    f4 = {r.metric: r for r in
          QUERIES["diag_fdr_adjusted"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert set(f4) == set(f1) and len(f1) == 6
    grew = 0
    for m, r1 in f1.items():
        r4 = f4[m]
        if r1.z is None:
            assert r4.z is None, m
            continue
        assert r4.z is not None, (
            f"{m} degenerate at 4x but not 1x: z1={r1.z!r} z4={r4.z!r}"
        )
        if abs(r1.z) > 0.05:  # ratio meaningless at z ~ 0
            z_ratio = abs(r4.z) / abs(r1.z)
            assert 1.8 < z_ratio < 2.2, (m, r1.z, r4.z, z_ratio)
            grew += 1
    assert grew > 0
    rejected1 = sum(r.bh_reject for r in f1.values())
    rejected4 = sum(r.bh_reject for r in f4.values())
    assert rejected4 >= rejected1, (rejected1, rejected4)
    print(f"FDR family: {grew} non-trivial z's grew ~2x, NULLs stable, "
          f"BH rejections {rejected1} -> {rejected4} (monotone); "
          f"walls {w1:.1f}s -> {w4:.1f}s")

    # -- Mann-Whitney rank-sum test --------------------------------------------
    t0 = time.time()
    m1 = QUERIES["diag_rank_sum_test"](spark, sf_dir).collect()[0]
    w1 = time.time() - t0
    t0 = time.time()
    m4 = QUERIES["diag_rank_sum_test"](spark, rep_dir).collect()[0]
    w4 = time.time() - t0
    assert m4.n_control == 4 * m1.n_control
    assert m4.n_treated == 4 * m1.n_treated
    # pair count scales x16: U x16 exact, rank-biserial EXACTLY equal
    # ((16·U)/(16·na·nb) is the identical double)
    assert m4.u_stat == 16 * m1.u_stat, (m1.u_stat, m4.u_stat)
    assert m4.rank_biserial == m1.rank_biserial, (
        m1.rank_biserial, m4.rank_biserial,
    )
    assert m1.z_stat is not None and m4.z_stat is not None, (
        f"rank-sum degenerate: z1={m1.z_stat!r} z4={m4.z_stat!r}"
    )
    if abs(m1.z_stat) > 0.05:
        z_ratio = abs(m4.z_stat) / abs(m1.z_stat)
        assert 1.85 < z_ratio < 2.15, (m1.z_stat, m4.z_stat, z_ratio)
    print(f"rank-sum: U x16 exact, rank-biserial EXACTLY equal "
          f"({m1.rank_biserial}), z {m1.z_stat} -> {m4.z_stat}; "
          f"walls {w1:.1f}s -> {w4:.1f}s")

    # -- Brown-Forsythe variance-effect test -----------------------------------
    t0 = time.time()
    b1 = QUERIES["diag_variance_effect"](spark, sf_dir).collect()[0]
    w1 = time.time() - t0
    t0 = time.time()
    b4 = QUERIES["diag_variance_effect"](spark, rep_dir).collect()[0]
    w4 = time.time() - t0
    assert b4.n_control == 4 * b1.n_control
    assert b4.n_treated == 4 * b1.n_treated
    # the value histogram replicates: medians and MADs EXACTLY equal
    assert b4.median_control == b1.median_control
    assert b4.median_treated == b1.median_treated
    assert b4.mad_control == b1.mad_control, (
        b1.mad_control, b4.mad_control,
    )
    assert b4.mad_treated == b1.mad_treated
    assert b1.bf_z is not None and b4.bf_z is not None, (
        f"variance test degenerate: z1={b1.bf_z!r} z4={b4.bf_z!r}"
    )
    if abs(b1.bf_z) > 0.05:
        z_ratio = abs(b4.bf_z) / abs(b1.bf_z)
        assert 1.85 < z_ratio < 2.15, (b1.bf_z, b4.bf_z, z_ratio)
    print(f"variance effect: medians + MADs EXACTLY equal, "
          f"z {b1.bf_z} -> {b4.bf_z}; walls {w1:.1f}s -> {w4:.1f}s")

    print("ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()

"""Round-14 scale probe: PH-assumption check + k-arm SRM/mSPRT.

Replication design (the r12/r13 probes'): copy the events table 4x by
USER — user_id offsets a multiple of 8 (preserves %2 parity, %4 arm
residues AND div-4 cluster parity; see scale_round13's stride note),
event_id offsets keep ids unique — so per-day / per-arm counts scale
exactly x4 while each user's own event sequence is untouched.
Assertions:

* diag_cox_ph_assumption: the event-median split day is INVARIANT
  (cumulative events and the ceil-half threshold both scale x4), the
  day-lattice sizes (n_days_early/late) are CONSTANT, events x4 exact,
  both half-fits' beta within the accumulated 1e-9 term lattice of the
  1x fit (every per-day float term is EXACTLY 4x the 1x term — all
  scalings are powers of two — so only the per-day floor can drift),
  and both SEs shrink by ~1/2 (information x4).
* diag_srm_multiarm: the enrollment-day lattice is constant, per-arm
  counts x4 exact, chi2 exactly 4x the 1x statistic up to the q6
  lattice ((16·num)/(4·N) is the same correctly-rounded double as
  4·(num/N), so only the final floor can differ).
* diag_msprt_multiarm: the (day x arm) lattice is constant, per-arm
  counts x4 exact, diff_cents EXACTLY equal ((4a)/(4b) rounds to the
  identical double); log lambda legitimately moves with 4x evidence.
* walls stay in the same band at 4x (cost tracks the bounded lattices).

Run: python tools/scale_round14.py [sf_dir]
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
    spark = get_spark("scale-round14")
    load_all()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    # multiple of 8: %2 / %4 residues survive any multiple of 4, but
    # the div-4 cluster PARITY needs stride/4 even (scale_round13 note)
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
    rep_dir = f"/tmp/scale_r14_events_x4_{os.getpid()}"
    rep.write.mode("overwrite").parquet(f"{rep_dir}/events.parquet")
    print(f"replicated: {n_events} -> {n_events * 4} events, "
          f"{n_users} -> {n_users * 4} users")

    # -- PH-assumption check invariance ----------------------------------------
    t0 = time.time()
    p1 = QUERIES["diag_cox_ph_assumption"](spark, sf_dir).collect()[0]
    w1 = time.time() - t0
    t0 = time.time()
    p4 = QUERIES["diag_cox_ph_assumption"](spark, rep_dir).collect()[0]
    w4 = time.time() - t0
    assert p4.t_split == p1.t_split, (p1.t_split, p4.t_split)
    assert p4.n_days_early == p1.n_days_early  # day lattice constant
    assert p4.n_days_late == p1.n_days_late
    assert p4.events_early == 4 * p1.events_early
    assert p4.events_late == 4 * p1.events_late
    # per-day float terms are exactly x4; only the 1e-9 floors drift
    assert abs(p4.beta_early - p1.beta_early) < 2e-6
    assert abs(p4.beta_late - p1.beta_late) < 2e-6
    for se1, se4, which in (
        (p1.se_early, p4.se_early, "early"),
        (p1.se_late, p4.se_late, "late"),
    ):
        # a degenerate half-fit (zero information) yields NULL SEs; fail
        # with a diagnostic instead of a TypeError on None / None
        assert se1 is not None and se4 is not None, (
            f"{which} half-fit degenerate on this corpus: "
            f"se1={se1!r} se4={se4!r} (zero-information half?)"
        )
        ratio = se4 / se1
        assert 0.45 < ratio < 0.55, (which, se1, se4, ratio)
    print(f"PH check: split day {p1.t_split} INVARIANT, day lattice "
          f"constant ({p1.n_days_early}/{p1.n_days_late}), events x4, "
          f"betas x4-INVARIANT on the lattice "
          f"({p1.beta_early:.6f}/{p1.beta_late:.6f}), SE ratios "
          f"{p4.se_early / p1.se_early:.3f}/"
          f"{p4.se_late / p1.se_late:.3f} (~0.5); "
          f"walls {w1:.1f}s -> {w4:.1f}s")

    # -- k-arm SRM scaling ------------------------------------------------------
    s1 = {r.enroll_day: r
          for r in QUERIES["diag_srm_multiarm"](spark, sf_dir).collect()}
    s4 = {r.enroll_day: r
          for r in QUERIES["diag_srm_multiarm"](spark, rep_dir).collect()}
    assert set(s1) == set(s4), "enrollment-day lattice must not grow"
    for day, a in s1.items():
        b = s4[day]
        for c in ("n_arm0", "n_arm1", "n_arm2", "n_arm3"):
            assert getattr(b, c) == 4 * getattr(a, c), (day, c)
        # (16 num)/(4 N) is the same double as 4*(num/N); only the two
        # independent q6 floors can differ
        assert abs(b.srm_chi2 - 4 * a.srm_chi2) < 4e-6, day
        assert abs(b.overall_chi2 - 4 * a.overall_chi2) < 4e-6, day
    print(f"k-arm SRM: {len(s1)} day rows, per-arm counts exactly x4, "
          f"chi2 exactly 4x on the q6 lattice")

    # -- k-arm mSPRT structural invariance --------------------------------------
    t0 = time.time()
    m1 = {(r.day, r.arm): r
          for r in QUERIES["diag_msprt_multiarm"](spark, sf_dir).collect()}
    mw1 = time.time() - t0
    t0 = time.time()
    m4 = {(r.day, r.arm): r
          for r in QUERIES["diag_msprt_multiarm"](spark, rep_dir).collect()}
    mw4 = time.time() - t0
    assert set(m1) == set(m4), "(day x arm) lattice must not grow"
    for k, a in m1.items():
        b = m4[k]
        assert b.n_control == 4 * a.n_control, k
        assert b.n_treated == 4 * a.n_treated, k
        assert b.diff_cents == a.diff_cents, (k, a.diff_cents, b.diff_cents)
    print(f"k-arm mSPRT: {len(m1)} (day, arm) rows, counts exactly x4, "
          f"running mean diffs x4-INVARIANT; walls {mw1:.1f}s -> {mw4:.1f}s")

    # -- O'Brien-Fleming structural invariance -----------------------------------
    o1 = {r.day: r
          for r in QUERIES["diag_obrien_fleming"](spark, sf_dir).collect()}
    o4 = {r.day: r
          for r in QUERIES["diag_obrien_fleming"](spark, rep_dir).collect()}
    assert set(o1) == set(o4), "look schedule (day lattice) must not grow"
    for day, a in o1.items():
        b = o4[day]
        assert b.n_control == 4 * a.n_control, day
        assert b.n_treated == 4 * a.n_treated, day
        # info fraction is a ratio of x4 ints -> identical double
        assert b.info_frac == a.info_frac, day
        assert b.boundary == a.boundary, day
        # z ~doubles with 4x users (vk ~quarters; the n-2/n-1 pooled
        # corrections keep it from being exact — trap ledger)
        if a.z_stat not in (None, 0.0):
            ratio = b.z_stat / a.z_stat
            assert 1.9 < ratio < 2.1, (day, a.z_stat, b.z_stat)
    print(f"O'Brien-Fleming: {len(o1)} looks, info fractions and "
          f"boundaries x4-INVARIANT (exact), z ratios ~2.0")

    # -- stratified CUPED invariance ----------------------------------------------
    c1 = {(r.band, r.variant): r
          for r in QUERIES["diag_cuped_stratified"](spark, sf_dir).collect()}
    c4 = {(r.band, r.variant): r
          for r in QUERIES["diag_cuped_stratified"](spark, rep_dir).collect()}
    assert set(c1) == set(c4)
    for k, a in c1.items():
        b = c4[k]
        assert b.n_users == 4 * a.n_users, k
        # theta/means: every exact sum scales by 16 or 4 (powers of
        # two) -> the divisions give the identical doubles
        assert b.theta == a.theta, k
        assert b.mean_metric == a.mean_metric, k
        assert b.mean_cuped == a.mean_cuped, k
        # variances carry n-1 corrections: ~invariant, not exact
        assert abs(b.var_metric / a.var_metric - 1.0) < 0.05, k
        assert abs(b.var_cuped / a.var_cuped - 1.0) < 0.05, k
    print(f"stratified CUPED: {len(c1)} (band, variant) rows, users x4, "
          f"thetas/means x4-INVARIANT (exact), variances ~invariant")

    print("scale_round14: ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()

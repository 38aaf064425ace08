"""Round-13 scale probe: stratified survival + mSPRT + cluster-robust DiD.

Replication design (the r12 probe's): copy the events table 4x by USER
(user_id offsets a multiple of 4 so div-4 clusters and their parity are
preserved; event_id offsets keep ids unique) — per-day / per-stratum
counts scale exactly x4 while each user's own sequence is untouched.
Assertions:

* diag_km_stratified: the (cohort, band, day) lattice is CONSTANT at
  4x, survival identical (proportion-scale-free), n_risk exactly x4 —
  the stratified family inherits the KM 100 TB argument unchanged.
* diag_logrank_stratified: per-band O and total events exactly x4,
  per-band E x4 within the 1e-6 quantization lattice (terms quantize
  before the cross-time sum); V deliberately NOT pinned x4 (the n-1
  finite-population correction is not scale-invariant — trap ledger).
* diag_msprt_sequential: the day lattice is constant, per-day
  n_control/n_treated exactly x4, and diff_cents is EXACTLY equal
  ((4a)/(4b) rounds to the same double as a/b) — the running means are
  scale-free; log lambda legitimately moves (more data = more
  evidence), so it is not pinned.
* diag_did_cluster_robust: users and clusters exactly x4, the DiD point
  estimate exactly equal, and both SEs shrink by ~1/2 (x4 clusters) —
  ratio pinned to [0.40, 0.60].
* walls stay in the same band at 4x (cost tracks the bounded lattices).

Run: python tools/scale_round13.py [sf_dir]
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
    spark = get_spark("scale-round13")
    load_all()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    # must be a multiple of 8, not just 4: the shifted cluster id is
    # cluster + stride/4, so stride/4 must be EVEN for the cluster
    # PARITY (the DiD variant) to survive replication
    uid_stride = 10 ** 9
    assert uid_stride % 8 == 0, "stride/4 must be even to keep parity"
    eid_stride = 10 ** 12
    rep = ev
    for r in range(1, 4):
        rep = rep.unionByName(
            ev.withColumn(
                "user_id", F.col("user_id") + F.lit(r * uid_stride)
            ).withColumn("event_id", F.col("event_id") + F.lit(r * eid_stride))
        )
    rep_dir = f"/tmp/scale_r13_events_x4_{os.getpid()}"
    rep.write.mode("overwrite").parquet(f"{rep_dir}/events.parquet")
    print(f"replicated: {n_events} -> {n_events * 4} events, "
          f"{n_users} -> {n_users * 4} users")

    # -- stratified KM invariance --------------------------------------------
    t0 = time.time()
    km1 = {(r.cohort, r.band, r.t): r
           for r in QUERIES["diag_km_stratified"](spark, sf_dir).collect()}
    w1 = time.time() - t0
    t0 = time.time()
    km4 = {(r.cohort, r.band, r.t): r
           for r in QUERIES["diag_km_stratified"](spark, rep_dir).collect()}
    w4 = time.time() - t0
    assert set(km1) == set(km4), "stratified KM lattice must not grow"
    for k, a in km1.items():
        b = km4[k]
        assert b.n_risk == 4 * a.n_risk, (k, a.n_risk, b.n_risk)
        assert b.n_event == 4 * a.n_event
        assert b.survival == a.survival, (k, a.survival, b.survival)
    print(f"stratified KM: {len(km1)} rows over "
          f"{len({(c, b) for c, b, _ in km1})} strata, survival "
          f"x4-INVARIANT, n_risk exactly x4; walls {w1:.1f}s -> {w4:.1f}s")

    # -- stratified log-rank scaling ------------------------------------------
    lr1 = {r.band: r for r in
           QUERIES["diag_logrank_stratified"](spark, sf_dir).collect()}
    lr4 = {r.band: r for r in
           QUERIES["diag_logrank_stratified"](spark, rep_dir).collect()}
    assert set(lr1) == set(lr4) == {"low", "high"}
    for band, a in lr1.items():
        b = lr4[band]
        assert b.obs_events_g1 == 4 * a.obs_events_g1, band
        assert b.obs_events_total == 4 * a.obs_events_total, band
        # E terms quantize per time before the sum: x4 within the
        # accumulated lattice half-ulps (#times * 4e-6 is generous)
        assert abs(b.exp_events_g1 - 4 * a.exp_events_g1) < 0.01, band
    print("stratified log-rank: per-band O x4 exact, E x4 on the "
          "lattice (V carries the n-1 correction, not pinned)")

    # -- mSPRT structural invariance ------------------------------------------
    t0 = time.time()
    ms1 = {r.day: r for r in
           QUERIES["diag_msprt_sequential"](spark, sf_dir).collect()}
    m1 = time.time() - t0
    t0 = time.time()
    ms4 = {r.day: r for r in
           QUERIES["diag_msprt_sequential"](spark, rep_dir).collect()}
    m4 = time.time() - t0
    assert set(ms1) == set(ms4), "mSPRT day lattice must not grow"
    for day, a in ms1.items():
        b = ms4[day]
        assert b.n_control == 4 * a.n_control, day
        assert b.n_treated == 4 * a.n_treated, day
        assert b.diff_cents == a.diff_cents, (day, a.diff_cents,
                                              b.diff_cents)
    print(f"mSPRT: {len(ms1)} day rows, counts exactly x4, running mean "
          f"diff x4-INVARIANT; walls {m1:.1f}s -> {m4:.1f}s")

    # -- cluster-robust DiD scaling -------------------------------------------
    d1 = QUERIES["diag_did_cluster_robust"](spark, sf_dir).collect()[0]
    d4 = QUERIES["diag_did_cluster_robust"](spark, rep_dir).collect()[0]
    assert d4.n_control == 4 * d1.n_control
    assert d4.n_treated == 4 * d1.n_treated
    assert d4.g_control == 4 * d1.g_control
    assert d4.g_treated == 4 * d1.g_treated
    assert d4.did_cents == d1.did_cents, (d1.did_cents, d4.did_cents)
    for se1, se4, which in (
        (d1.se_naive, d4.se_naive, "naive"),
        (d1.se_cluster_robust, d4.se_cluster_robust, "robust"),
    ):
        ratio = se4 / se1
        assert 0.40 < ratio < 0.60, (which, se1, se4, ratio)
    print(f"cluster-robust DiD: users/clusters exactly x4, DiD "
          f"x4-INVARIANT ({d1.did_cents} cents), SE ratios "
          f"naive {d4.se_naive / d1.se_naive:.3f} / robust "
          f"{d4.se_cluster_robust / d1.se_cluster_robust:.3f} (~0.5)")

    print("scale_round13: ALL ASSERTIONS PASSED")


if __name__ == "__main__":
    main()
